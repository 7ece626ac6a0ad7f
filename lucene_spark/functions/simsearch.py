"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the correctness baseline. The oracle-checkable
  form uses JVM array expressions; ``cosine_topk_fast`` is the scale path —
  broadcast query matrix x numpy GEMM inside mapInPandas, per-partition
  top-k, then a global TakeOrderedAndProject merge (no full sort).
- sign-LSH bucketed ANN: deterministic hyperplanes = first 8 coordinate
  signs; an equi-join on bucket replaces the all-pairs comparison.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

LSH_BITS = 8


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    emb: DataFrame,
    query_ids: List[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k per query id, excluding the query rows
    themselves. Query side is tiny -> broadcast; candidates never shuffle."""
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).cast("long").alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.filter(~F.col(id_col).isin(query_ids)).select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .withColumn(
            "sim",
            F.round(
                _dot(F.col("qv"), F.col("cv"))
                / (_norm(F.col("qv")) * _norm(F.col("cv"))),
                6,
            ),
        )
        .select("query_id", "vec_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
        .orderBy("query_id", "rank")
    )


def cosine_topk_fast(
    emb: DataFrame,
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path: numpy GEMM per Arrow batch + per-partition top-k.
    query_vecs: (nq, dim) float32, L2-normalized internally."""
    qn = query_vecs / np.linalg.norm(query_vecs, axis=1, keepdims=True)
    qids = np.asarray(query_ids, dtype=np.int64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
            sims = mat @ qn.T  # (n, nq)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            outs = []
            for qi in range(len(qids)):
                s = sims[:, qi]
                top = np.argsort(-s, kind="stable")[: k]
                outs.append(
                    pd.DataFrame(
                        {"query_id": qids[qi], "vec_id": ids[top], "sim": s[top]}
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    partial = emb.filter(~F.col(id_col).isin([int(x) for x in qids])).mapInPandas(
        run, schema="query_id long, vec_id long, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("sim", 6).alias("sim"))
        .orderBy("query_id", "rank")
    )


def rademacher_sign(t: int, b: int, j: int) -> float:
    """Deterministic ±1 hyperplane coordinate: +1 iff the first hex digit of
    md5('t:b:j') is >= 8. Identical in numpy and SQL (DuckDB/Spark md5), so
    the oracle can rebuild the exact planes."""
    import hashlib

    return 1.0 if int(hashlib.md5(f"{t}:{b}:{j}".encode()).hexdigest()[0], 16) >= 8 else -1.0


def rademacher_planes(tables: int, bits: int, dim: int) -> np.ndarray:
    """(tables*bits, dim) ±1 matrix; Rademacher rows are valid random
    hyperplanes for sign-LSH (Achlioptas-style sparse projections)."""
    W = np.empty((tables * bits, dim), dtype=np.float64)
    for t in range(tables):
        for b in range(bits):
            for j in range(dim):
                W[t * bits + b, j] = rademacher_sign(t, b, j)
    return W


def rh_lsh_buckets(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: int = 20,
    bits: int = 4,
) -> DataFrame:
    """(vec_id, tbl, bucket): multi-table random-hyperplane LSH — the real
    ANN replacement for the first-8-coordinates placeholder (reference
    north-star util/hnsw/HnswGraphBuilder.java; we trade graph search for
    table-parallel bucket equi-joins, the shape that scales on Spark).
    One GEMM per Arrow batch; plane count = tables*bits."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        W = None
        bitvals = 1 << np.arange(bits, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if W is None or W.shape[1] != mat.shape[1]:
                W = rademacher_planes(tables, bits, mat.shape[1])
            proj = (mat @ W.T) > 0  # (n, tables*bits)
            bucket = (proj.reshape(len(mat), tables, bits) * bitvals).sum(axis=2)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            outs = [
                pd.DataFrame({"vec_id": ids, "tbl": t, "bucket": bucket[:, t]})
                for t in range(tables)
            ]
            yield pd.concat(outs, ignore_index=True)

    return emb.select(
        F.col(id_col).cast("long").alias(id_col), vec_col
    ).mapInPandas(run, schema="vec_id long, tbl int, bucket long")


def rh_lsh_topk(
    emb: DataFrame,
    query_ids: List[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: int = 20,
    bits: int = 4,
) -> DataFrame:
    """ANN top-k: candidates = docs sharing a bucket with the query in ANY
    table (union of equi-joins, never all-pairs), exact cosine re-rank on
    the candidate set only. Fan-out is bounded by tables x bucket occupancy;
    recall@k is measured in tests (clustered data: ~1.0 at a small candidate
    fraction; near-random data needs tables=20/bits=4 for 0.9)."""
    buckets = rh_lsh_buckets(emb, id_col, vec_col, tables, bits)
    qids = [int(x) for x in query_ids]
    qb = buckets.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "tbl", "bucket"
    )
    cb = buckets.filter(~F.col("vec_id").isin(qids))
    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bucket"])
        .select("query_id", "vec_id")
        .distinct()
    )
    vecs = emb.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("cv")
    )
    qvecs = emb.filter(F.col(id_col).isin(qids)).select(
        F.col(id_col).cast("long").alias("query_id"), F.col(vec_col).alias("qv")
    )
    scored = (
        cand.join(vecs, "vec_id")
        .join(F.broadcast(qvecs), "query_id")
        .withColumn(
            "sim",
            F.round(
                _dot(F.col("qv"), F.col("cv"))
                / (_norm(F.col("qv")) * _norm(F.col("cv"))),
                6,
            ),
        )
        .select("query_id", "vec_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
        .orderBy("query_id", "rank")
    )


def sign_lsh_bucket(vec_col, bits: int = LSH_BITS):
    """Deterministic sign-LSH bucket id from the first ``bits`` coordinates."""
    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out + F.when(
            F.element_at(F.col(vec_col), j + 1).cast("double") > 0,
            F.lit(1 << j).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
    return out


def lsh_cosine_topk(
    emb: DataFrame,
    query_ids: List[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: compare only within the query's sign-LSH bucket (equi-join).
    Deterministic and oracle-checkable; recall bounded by bucket occupancy."""
    with_bucket = emb.withColumn("bucket", sign_lsh_bucket(vec_col))
    q = with_bucket.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).alias("qv"),
        "bucket",
    )
    c = with_bucket.filter(~F.col(id_col).isin(query_ids)).select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("cv"),
        "bucket",
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .withColumn(
            "sim",
            F.round(
                _dot(F.col("qv"), F.col("cv"))
                / (_norm(F.col("qv")) * _norm(F.col("cv"))),
                6,
            ),
        )
        .select("query_id", "vec_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer -> per-centroid posting lists ->
# probe the nprobe nearest centroids only. The 100-TB shape: assignments are
# an equi-join key (partition/bucket by centroid_id on write, so a query
# touches nprobe/n_centroids of the data); no cross join anywhere.
# ---------------------------------------------------------------------------


def kmeans_centroids(
    emb: DataFrame,
    n_centroids: int,
    iters: int = 5,
    sample_mod: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means on a deterministic hash sample (rows with
    hash(id) % sample_mod == 0), refined driver-side in numpy — centroids
    are tiny. Seeds = the sample's first n_centroids rows by id. Returns
    L2-normalized (n_centroids, dim) float64."""
    s = emb.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
    if sample_mod > 1:
        s = s.filter(F.pmod(F.xxhash64(F.col("i")), F.lit(sample_mod)) == 0)
    rows = s.orderBy("i").collect()
    mat = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    cent = mat[:n_centroids].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(n_centroids):
            sel = mat[assign == c]
            if len(sel):
                cent[c] = sel.mean(axis=0)
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-30)
    return cent


def static_centroids(
    emb: DataFrame,
    centroid_ids: List[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Quantizer whose centroids ARE the vectors of fixed ids (k-means with
    zero refinement steps) — fully reproducible in plain SQL, which is what
    the sim_ivf_topk oracle relies on."""
    rows = (
        emb.filter(F.col(id_col).isin(list(centroid_ids)))
        .select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .collect()
    )
    by_id = {int(r["i"]): np.asarray(r["v"], dtype=np.float64) for r in rows}
    cent = np.stack([by_id[i] for i in centroid_ids])
    return cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-30)


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector its nearest centroid (rounded cosine, ties to the
    lower centroid id — the rounding keeps numpy and SQL argmaxes in
    agreement). Arrow-batched GEMM; at scale, write the result partitioned
    by centroid_id so probes prune at the scan."""
    cent = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-30
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
            sims = np.round(mat @ cent.T, 6)
            # argmax with ties to the LOWER centroid id
            cid = sims.shape[1] - 1 - np.argmax(sims[:, ::-1], axis=1)
            out = pdf[[id_col, vec_col]].copy()
            out["centroid_id"] = cid.astype(np.int32)
            yield out

    return emb.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} long, {vec_col} array<float>, centroid_id int"
    )


def ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    query_ids: List[int],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF query: per query, probe the nprobe nearest centroids (rounded
    cosine, ties to lower id — computed driver-side against the tiny
    centroid matrix), then exact cosine ONLY over vectors assigned to the
    probed centroids. The probe table (query_id, centroid_id, qv) is
    broadcast and equi-joined on centroid_id — no cross join; with
    assignments partitioned by centroid_id the probe predicate prunes the
    scan to nprobe/n_centroids of the data."""
    spark = assigned.sparkSession
    qrows = (
        assigned.filter(F.col(id_col).isin(list(query_ids)))
        .select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .collect()
    )
    qby = {int(r["i"]): np.asarray(r["v"], dtype=np.float64) for r in qrows}
    cent = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-30
    )
    probe_rows = []
    for qid in query_ids:
        qv = qby[qid]
        qn = qv / max(np.linalg.norm(qv), 1e-30)
        sims = np.round(qn @ cent.T, 6)
        order = np.lexsort((np.arange(len(sims)), -sims))[:nprobe]
        for cid in order:
            probe_rows.append((int(qid), int(cid), [float(x) for x in qv]))
    probes = spark.createDataFrame(
        probe_rows, "query_id long, centroid_id int, qv array<double>"
    )
    c = assigned.filter(~F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("cv"),
        "centroid_id",
    )
    scored = (
        c.join(F.broadcast(probes), "centroid_id")
        .withColumn(
            "sim",
            F.round(
                _dot(F.col("qv"), F.col("cv"))
                / (_norm(F.col("qv")) * _norm(F.col("cv"))),
                6,
            ),
        )
        .select("query_id", "vec_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# SQ8 scalar quantization (the faiss-style int8 compression scale path:
# at 100 TB the uint8 code table is 1/4 the float32 footprint and becomes
# the resident working set; search is asymmetric — original query against
# dequantized candidates)
# ---------------------------------------------------------------------------


def sq8_bounds(emb: DataFrame, vec_col: str = "embedding"):
    """Per-dimension global (min, max) — one narrow agg over the exploded
    column; the result is dim-sized (tiny) and closure-broadcast."""
    rows = (
        emb.select(F.posexplode(F.col(vec_col)).alias("d", "x"))
        .groupBy("d")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
        .collect()
    )
    rows.sort(key=lambda r: r["d"])
    mn = np.array([r["mn"] for r in rows], dtype=np.float64)
    mx = np.array([r["mx"] for r in rows], dtype=np.float64)
    return mn, mx


def sq8_encode(
    emb: DataFrame,
    bounds=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<smallint>): the persistable compressed table."""
    mn, mx = bounds if bounds is not None else sq8_bounds(emb, vec_col)
    scale = (mx - mn) / 255.0
    mn_arr = F.array(*[F.lit(float(v)) for v in mn])
    sc_arr = F.array(*[F.lit(float(v)) for v in scale])

    def enc(x, i):
        m = F.element_at(mn_arr, i + F.lit(1))
        s = F.element_at(sc_arr, i + F.lit(1))
        code = F.least(
            F.greatest(
                F.round(F.round((x.cast("double") - m) / s, 6)), F.lit(0.0)
            ),
            F.lit(255.0),
        )
        return F.when(s != 0.0, code).otherwise(F.lit(0.0)).cast("smallint")

    return emb.select(
        F.col(id_col).cast("long").alias(id_col),
        F.transform(F.col(vec_col), enc).alias("codes"),
    )


def sq8_topk(
    emb: DataFrame,
    query_ids: List[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bounds=None,
) -> DataFrame:
    """Asymmetric SQ8 search: cosine(original query, dequantized
    candidate). Codes are produced by the exact JVM-side quantizer
    expression (code = clamp(round(round((x-mn)/scale, 6)), 0, 255),
    scale = (mx-mn)/255 — the 6-dp pre-round kills ulp-level .5 boundary
    flips so both engines land on identical codes); scoring is one numpy
    GEMM per Arrow batch with per-partition top-k, the same
    no-candidate-shuffle plan as cosine_topk_fast. Quantization error per
    dim is <= scale/2, so top-k recall vs exact cosine stays near 1 at
    8 bits (recall-tested)."""
    mn, mx = bounds if bounds is not None else sq8_bounds(emb, vec_col)
    scale = (mx - mn) / 255.0
    qids = [int(x) for x in query_ids]
    qrows = (
        emb.filter(F.col(id_col).isin(qids))
        .select(F.col(id_col).cast("long").alias("qid"), F.col(vec_col).alias("qv"))
        .collect()
    )
    if not qrows:
        return emb.sparkSession.createDataFrame(
            [], "query_id long, rank int, vec_id long, sim double"
        )
    qid_arr = np.array([r["qid"] for r in qrows], dtype=np.int64)
    qmat = np.stack([np.asarray(r["qv"], dtype=np.float64) for r in qrows])
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    # codes come from the exact JVM-side quantizer expression (shared with
    # the oracle); dequant in the batch is mn + code*scale — the identical
    # float64 ops, so values match the Column-transform path bit-for-bit
    codes_df = sq8_encode(
        emb.filter(~F.col(id_col).isin(qids)),
        bounds=(mn, mx), id_col=id_col, vec_col=vec_col,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.float64)
            dq = mn + codes * scale  # degenerate dims: code==0 -> mn
            sims = (dq @ qmat.T) / (
                np.sqrt((dq * dq).sum(axis=1, keepdims=True)) * qnorm
            )
            # HALF_UP to 6 dp, matching F.round(sim, 6); the 6-dp grid is
            # what absorbs summation-order ulp drift between engines
            sims = np.sign(sims) * np.floor(np.abs(sims) * 1e6 + 0.5) / 1e6
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            outs = []
            for qi in range(len(qid_arr)):
                s = sims[:, qi]
                top = np.lexsort((ids, -s))[:k]
                outs.append(
                    pd.DataFrame(
                        {"query_id": qid_arr[qi], "vec_id": ids[top], "sim": s[top]}
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    partial = codes_df.mapInPandas(run, schema="query_id long, vec_id long, sim double")
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
        .orderBy("query_id", "rank")
    )
