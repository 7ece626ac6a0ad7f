"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All variants are expressed as DataFrame ops (JVM-side, whole-stage codegen)
so they hold at 100 TB: hashing is columnar, candidate generation goes
through band/bucket equi-joins (never a cross join), and the only brute
pairwise step (exact Jaccard verify) runs after LSH-style blocking.

Cross-engine determinism: token/shingle hashes derive from md5 hex prefixes
(identical in Spark and DuckDB), permutations use small-constant affine
functions mod a 31-bit prime so every product stays far below 2^63.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..analysis import TOKEN_RE

# MinHash parameters (shared with the DuckDB oracle builders)
MINHASH_PERMS = 16
MINHASH_BANDS = 4  # 4 rows per band
MINHASH_P = 2147483647  # 2^31 - 1
A0, A1 = 101, 37  # a_i = A0 + A1*i
B0, B1 = 577, 97  # b_i = B0 + B1*i

SIMHASH_BITS = 60  # 15 hex chars of md5 -> fits a signed 64-bit int


def _tokens(text_col: str):
    """Lowercased word tokens as an array column (same regex as the engine)."""
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)


def _hash32(col):
    """First 8 md5 hex chars as an unsigned 32-bit value in a long."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _hash60(col):
    """First 15 md5 hex chars -> 60-bit value in a long."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate grouping by content hash (hash-groupBy): each row
    annotated with its group hash + group size. Single shuffle on md5."""
    from pyspark.sql.window import Window

    h = F.md5(F.col(text_col)).alias("text_md5")
    w = Window.partitionBy("text_md5")
    return (
        df.select(F.col(id_col).cast("long").alias("doc_id"), h)
        .withColumn("dup_group_size", F.count("*").over(w).cast("long"))
        .orderBy("doc_id")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_perms: int = MINHASH_PERMS
) -> DataFrame:
    """(doc_id, perm, minhash): min over the doc's distinct token hashes of
    the affine permutation (a_i*h + b_i) mod P."""
    toks = (
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.explode(F.array_distinct(_tokens(text_col))).alias("term"),
        )
        .withColumn("h", _hash32(F.col("term")) % MINHASH_P)
    )
    perms = df.sparkSession.range(n_perms).select(
        F.col("id").cast("int").alias("perm"),
        (A0 + A1 * F.col("id")).cast("long").alias("a"),
        (B0 + B1 * F.col("id")).cast("long").alias("b"),
    )
    return (
        toks.crossJoin(F.broadcast(perms))
        .groupBy("doc_id", "perm")
        .agg(F.min((F.col("a") * F.col("h") + F.col("b")) % MINHASH_P).alias("minhash"))
    )


def minhash_bands(sigs: DataFrame, bands: int = MINHASH_BANDS) -> DataFrame:
    """(doc_id, band, band_key): md5 over the band's ordered minhash values."""
    rows_per_band = MINHASH_PERMS // bands
    banded = sigs.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
    return banded.groupBy("doc_id", "band").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("perm", "minhash"))),
                    lambda x: x["minhash"].cast("string"),
                ),
                ":",
            )
        ).alias("band_key")
    )


def minhash_candidates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Near-duplicate candidate pairs: docs sharing >= 1 LSH band. The join is
    an equi-join on (band, band_key) — the scale-safe shape."""
    bands = minhash_bands(minhash_signatures(df, id_col, text_col))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, on=["band", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def minhash_star_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Scale path for near-dup candidates: inside each LSH bucket emit only
    (bucket-min doc, other) pairs — O(bucket) instead of the all-pairs
    O(bucket²), which explodes on hot buckets (corpora with many near-equal
    docs). Clusters are preserved transitively through the representative;
    recall loss vs all-pairs is the standard LSH-star tradeoff. Same
    equi-join shape, no skew blowup."""
    bands = minhash_bands(minhash_signatures(df, id_col, text_col))
    reps = (
        bands.groupBy("band", "band_key")
        .agg(F.min("doc_id").alias("doc_a"), F.count("*").alias("sz"))
        .filter(F.col("sz") > 1)
    )
    return (
        bands.join(reps, ["band", "band_key"])
        .filter(F.col("doc_id") != F.col("doc_a"))
        .select("doc_a", F.col("doc_id").alias("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, simhash): 60-bit SimHash over tf-weighted token hashes.

    DataFrame formulation (bit explode) keeps it oracle-checkable; a numpy
    mapInPandas variant is the pure-speed path at scale."""
    tf = (
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.explode(_tokens(text_col)).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("freq"))
        .withColumn("h", _hash60(F.col("term")))
    )
    bits = tf.select(
        "doc_id",
        "freq",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit"),
    )
    # contribution: +freq when bit set else -freq
    contrib = bits.withColumn(
        "s",
        F.when(
            F.expr("shiftright(h, bit)").bitwiseAND(F.lit(1)) == 1,
            F.col("freq"),
        ).otherwise(-F.col("freq")),
    )
    per_bit = contrib.groupBy("doc_id", "bit").agg(F.sum("s").alias("tot"))
    return (
        per_bit.withColumn(
            "v",
            F.when(
                F.col("tot") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).otherwise(F.lit(0).cast("long")),
        )
        .groupBy("doc_id")
        .agg(F.sum("v").cast("long").alias("simhash"))
        .orderBy("doc_id")
    )


def simhash_chunk_plan(max_hamming: int, bits: int = SIMHASH_BITS):
    """(start_bit, width) per chunk: max_hamming+1 chunks — the pigeonhole
    guarantee that ANY pair within max_hamming bit flips shares at least one
    untouched chunk (d flips can ruin at most d of d+1 chunks)."""
    n_chunks = max_hamming + 1
    if n_chunks > bits:
        raise ValueError(f"max_hamming {max_hamming} needs more chunks than bits")
    base, rem = divmod(bits, n_chunks)
    plan, start = [], 0
    for i in range(n_chunks):
        w = base + (1 if i < rem else 0)
        plan.append((start, w))
        start += w
    return plan


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 4
) -> DataFrame:
    """Pairs with SimHash hamming distance <= max_hamming, blocked on
    (max_hamming + 1) bit chunks so the pigeonhole guarantee matches the
    parameter: a qualifying pair ALWAYS shares >= 1 chunk (the previous fixed
    4x15-bit banding silently missed pairs at distance >= 4). Equi-join on
    (chunk, chunk_val) stays the scale-safe shape; the exact hamming check
    verifies candidates."""
    sh = simhash(df, id_col, text_col)
    plan = simhash_chunk_plan(max_hamming)
    chunk_val = None
    for i, (start, w) in enumerate(plan):
        v = F.expr(f"shiftright(simhash, {start}) & {(1 << w) - 1}")
        chunk_val = F.when(F.col("chunk") == i, v) if chunk_val is None else chunk_val.when(F.col("chunk") == i, v)
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(len(plan) - 1))).alias("chunk"),
    ).withColumn("chunk_val", chunk_val)
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(b, on=["chunk", "chunk_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    min_cos: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: int = 8,
    bits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates must share >= 1
    multi-table random-hyperplane LSH bucket (equi-join per table, never an
    all-pairs cross join), then exact cosine >= min_cos verifies. Precision
    is exact; recall is the LSH collision probability — ~1.0 for
    near-dup-grade similarity (cos >= 0.9 gives per-table p ≈ 0.39, miss
    over 8 tables ≈ 0.018; measured on the clustered test fixture). The
    deterministic md5-derived planes keep the SQL oracle bit-identical."""
    from .simsearch import _dot, _norm, rh_lsh_buckets

    b = rh_lsh_buckets(emb, id_col, vec_col, tables, bits)
    cand = (
        b.alias("a")
        .join(b.alias("b"), ["tbl", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .distinct()
    )
    va = emb.select(
        F.col(id_col).cast("long").alias("vec_a"), F.col(vec_col).alias("av")
    )
    vb = emb.select(
        F.col(id_col).cast("long").alias("vec_b"), F.col(vec_col).alias("bv")
    )
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("av"), F.col("bv"))
                / (_norm(F.col("av")) * _norm(F.col("bv"))),
                6,
            ),
        )
        .filter(F.col("cos") >= min_cos)
        .select("vec_a", "vec_b", "cos")
        .orderBy("vec_a", "vec_b")
    )


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, min_sim: float = 0.8
) -> DataFrame:
    """Token-set Jaccard similarity pairs >= min_sim via PREFIX FILTERING
    (AllPairs/PPJoin blocking): under a global rarest-first token order
    (ascending docFreq, then term), a pair with J >= t must share a token
    inside each doc's first |d| - ceil(t*|d|) + 1 tokens — so candidate
    generation equi-joins only those prefixes. A corpus-wide stopword (max
    docFreq) sorts LAST and never enters a prefix, killing the hot-token
    near-cartesian blowup of naive share-a-token blocking; recall stays
    exact (the filter is lossless for the threshold), so the simple
    full-join SQL oracle validates this plan unchanged."""
    toks = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.array_distinct(_tokens(text_col))).alias("term"),
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    dfreq = toks.groupBy("term").agg(F.count("*").alias("df"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("df", "term")
    # no broadcast hints: dfreq/sizes scale with vocab/doc count — AQE picks
    # broadcast when a side is actually small
    ranked = (
        toks.join(dfreq, "term")
        .withColumn("rk", F.row_number().over(w))
        .join(sizes, "doc_id")
    )
    # required overlap alpha = ceil(t*|d|); the 1e-9 guards float artifacts
    # (0.6*5 = 3.0000000000000004 would over-ceil to 4 and lose recall)
    alpha = F.ceil(F.lit(float(min_sim)) * F.col("sz") - F.lit(1e-9))
    prefix = ranked.filter(F.col("rk") <= F.col("sz") - alpha + 1).select(
        "doc_id", "term"
    )
    pa, pb = prefix.alias("a"), prefix.alias("b")
    cand = (
        pa.join(pb, "term")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ta = toks.select(F.col("doc_id").alias("doc_a"), "term")
    tb = toks.select(F.col("doc_id").alias("doc_b"), "term")
    inter = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "term"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= min_sim)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


def connected_components(
    pairs: DataFrame, a_col: str = "a", b_col: str = "b",
    max_iterations: int = 50,
) -> DataFrame:
    """Duplicate-cluster assignment: connected components over a pair
    table (the output of minhash_star_pairs / simhash_near_pairs /
    jaccard_pairs / embedding_near_dup_pairs), giving every node its
    component's MINIMUM id — the canonical-representative choice a
    dedup pipeline keeps.

    Algorithm: alternating large-star / small-star label propagation
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — each iteration is two self-joins + min-aggregations, no
    driver-side graph; converges in O(log n) rounds on real graphs.
    Iteration stops when no label changes; ``max_iterations`` bounds
    pathological chains. Each round localCheckpoints the label frame —
    TRUNCATING lineage, not just caching it: iterative DataFrame
    algorithms otherwise re-analyze an exponentially growing plan tree
    every round (at production scale, checkpoint to durable storage for
    the same effect plus fault tolerance).

    → (id long, component long)"""
    edges = (
        pairs.select(
            F.col(a_col).cast("long").alias("src"),
            F.col(b_col).cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    # undirected: keep both directions for the star operations
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(int(max_iterations)):
        # join each edge with both endpoints' labels, propagate the min
        lab_a = labels.select(
            F.col("id").alias("src"), F.col("component").alias("ca")
        )
        lab_b = labels.select(
            F.col("id").alias("dst"), F.col("component").alias("cb")
        )
        prop = (
            sym.join(lab_a, "src")
            .join(lab_b, "dst")
            .select(
                F.col("src").alias("id"),
                F.least("ca", "cb").alias("component"),
            )
        )
        new_labels = (
            labels.select("id", "component")
            .unionByName(prop)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
        # pointer-jumping: re-link every label to its representative's
        # label (the large-star contraction) — halves chain lengths
        reps = labels.select(
            F.col("id").alias("component"),
            F.col("component").alias("root"),
        )
        labels = (
            labels.join(reps, "component", "left")
            .select(
                "id",
                F.coalesce(F.col("root"), F.col("component")).alias(
                    "component"
                ),
            )
            .localCheckpoint()
        )
    return labels


def dedup_keep_representatives(
    df: DataFrame, id_col: str, pairs: DataFrame,
    a_col: str = "a", b_col: str = "b",
) -> DataFrame:
    """The pipeline's actual dedup step: drop every doc whose component
    representative (minimum id) is a DIFFERENT doc; singletons (no dup
    pair) survive untouched. One components pass + one anti-join."""
    comp = connected_components(pairs, a_col, b_col)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
