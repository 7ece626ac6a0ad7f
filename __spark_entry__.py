"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from SURVEY.md §2,
running the lucene_spark engine over the ``documents`` table of the given
sf_dir; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL. Both sides:

- tokenize with the SAME cross-engine regex (lucene_spark.analysis.TOKEN_RE),
- quantize doc lengths through the SAME SmallFloat intToByte4/byte4ToInt math
  (expressed as integer SQL on the oracle side),
- compute BM25 in float64 with the same formula/op order,
- round float outputs to 6 decimals and rank with (score DESC, doc_id ASC).

The engine's Lucene-float32-exact mode is exercised by tests/ (brute-force
oracle); here float64 is used so Spark and DuckDB agree to ~1e-15.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from lucene_spark.analysis import duckdb_token_re
from lucene_spark.build import IndexConfig, build_index, term_vectors
from lucene_spark.query import (
    AtLeastIntervalQuery,
    FunctionRangeQuery,
    standard_parse,
    DisjunctionMaxQuery,
    Occur,
    ExtendedIntervalQuery,
    ConstantScoreQuery,
    BlendedTermQuery,
    CombinedFieldQuery,
    CoveringQuery,
    IndexSortRangeQuery,
    ParentChildrenBlockJoinQuery,
    ToChildBlockJoinQuery,
    ToParentBlockJoinQuery,
    FunctionScoreQuery,
    FuzzyQuery,
    FeatureQuery,
    IntervalFilterQuery,
    IntervalMultiTerm,
    IntervalQuery,
    NoOverlapsIntervalQuery,
    MatchAllDocsQuery,
    MultiPhraseQuery,
    PhraseQuery,
    PointInSetQuery,
    PointRangeQuery,
    FieldMaskedTerm,
    PrefixQuery,
    Query,
    RegexpQuery,
    SpanContainQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanPositionRangeQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    bool_query,
    parse,
    parse_multifield,
)
from lucene_spark.expressions import SCORE
from lucene_spark.complexphrase import complex_phrase_parse
from lucene_spark.simpleparser import simple_parse
from lucene_spark.surround import surround_parse
from lucene_spark.xmlparser import xml_parse
from lucene_spark.search import Searcher
from lucene_spark.functions import dedup as fdedup
from lucene_spark.functions import facets as ffacets
from lucene_spark.functions import geo as fgeo
from lucene_spark.functions import highlight as fhigh
from lucene_spark.functions import dvstats as fdv
from lucene_spark.functions import fvh as ffvh
from lucene_spark.functions import joinutil as fjoin
from lucene_spark.functions import multimodal as fmm
from lucene_spark.functions import simsearch as fsim
from lucene_spark.functions import suggest as fsuggest
from lucene_spark.functions import textstats as ftext

K1, B = 1.2, 0.75
_CACHE: dict[str, Searcher] = {}


def _searcher(spark: SparkSession, sf_dir: str, sim: str = "bm25") -> Searcher:
    key = f"{sf_dir}::{sim}"
    if key not in _CACHE:
        base_key = f"{sf_dir}::bm25"
        if base_key in _CACHE:
            idx = _CACHE[base_key].index
        else:
            docs = spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet")
            ).repartition(spark.sparkContext.defaultParallelism)
            cfg = IndexConfig(
                chain="standard",
                seg_size=1 << 12,
                block_size=128,
                with_positions=True,
                store_cols=("lang", "source", "n_chars"),
            )
            idx = build_index(
                docs, cfg, content_col="text", doc_id_col="doc_id"
            ).persist()
        from lucene_spark.similarities import SIMILARITIES

        _CACHE[key] = Searcher(idx, dtype=np.float64, similarity=SIMILARITIES[sim]())
    return _CACHE[key]


def _sorted_searcher(spark: SparkSession, sf_dir: str) -> Searcher:
    """Index with a DECLARED index sort (IndexWriterConfig.setIndexSort
    analog): order_cols=(n_chars, doc_id) makes the assigned doc_id the
    rank of that sort key, enabling Searcher.search_sorted's sorted-segment
    early termination."""
    key = f"{sf_dir}::sorted"
    if key not in _CACHE:
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).repartition(spark.sparkContext.defaultParallelism)
        cfg = IndexConfig(
            chain="standard",
            seg_size=1 << 10,
            block_size=128,
            with_positions=False,
            store_cols=("n_chars",),
        )
        idx = build_index(
            docs, cfg, content_col="text", order_cols=["n_chars", "doc_id"]
        ).persist()
        _CACHE[key] = Searcher(idx, dtype=np.float64)
    return _CACHE[key]


def _facet_sampled(sp: SparkSession, d: str) -> DataFrame:
    """RandomSamplingFacetsCollector: xorshift bin-sample the 'spark'
    matches (sampleSize 50, seed 42), count by lang, amortize counts by
    the sampling rate."""
    s = _searcher(sp, d)
    m = s.matches(TermQuery(term="spark"))
    sampled, rate = ffacets.random_sampling_matches(m, 50, seed=42)
    cnt = (
        sampled.join(s.index.docs.select("doc_id", "lang"), "doc_id")
        .groupBy(F.col("lang").alias("cat"))
        .agg(F.count("*").alias("c"))
    )
    return cnt.select(
        "cat",
        F.floor(F.col("c") / F.lit(rate)).cast("long").alias("amortized"),
    ).orderBy("cat")


def _dedup_cc_entry(sp: SparkSession, d: str) -> DataFrame:
    """Connected components over a deterministic synthetic pair graph
    (a = doc_id, b = 2*doc_id mod N for every third doc) — the
    dup-cluster canonicalization step downstream of the pair producers."""
    docs = _docs(sp, d)
    n = docs.count()
    pairs = docs.filter("doc_id % 3 = 0").selectExpr(
        "doc_id AS a", f"(doc_id * 2) % {n} AS b"
    )
    return (
        fdedup.connected_components(pairs)
        .select(F.col("id").cast("long"), F.col("component").cast("long"))
        .orderBy("id")
    )


def _fast_any_table_automaton():
    """'fast <ANY> table' — one arbitrary token between (the graph query
    a PhraseQuery cannot express)."""
    from lucene_spark.query import TermAutomatonQuery

    q = TermAutomatonQuery()
    s1, s2, s3 = q.create_state(), q.create_state(), q.create_state()
    q.add_transition(0, s1, "fast")
    q.add_any_transition(s1, s2)
    q.add_transition(s2, s3, "table")
    q.set_accept(s3)
    return q.finish()


def _sweetspot_searcher(sp: SparkSession, d: str) -> Searcher:
    key = f"{d}::sweetspot"
    if key not in _CACHE:
        from lucene_spark.similarities import SweetSpot

        _CACHE[key] = Searcher(
            _searcher(sp, d).index,
            dtype=np.float64,
            similarity=SweetSpot(
                ln_min=3, ln_max=30, steepness=0.5, tf_base=1.5, tf_min=2.0
            ),
        )
    return _CACHE[key]


def _free_text_model(sp: SparkSession, d: str):
    key = f"{d}::freetext"
    if key not in _CACHE:
        from lucene_spark.functions.suggest import build_free_text

        _CACHE[key] = build_free_text(_docs(sp, d), "text", grams=2).persist()
    return _CACHE[key]


def _free_text_entry(sp: SparkSession, d: str, lookup_key: str) -> DataFrame:
    # driver-cached suggester: warm lookups run zero Spark jobs
    from lucene_spark.functions.suggest import FreeTextSuggester

    key = f"{d}::freetext_sugg"
    if key not in _CACHE:
        _CACHE[key] = FreeTextSuggester(_free_text_model(sp, d), grams=2)
    res = _CACHE[key].lookup(lookup_key, num=10)
    return sp.createDataFrame(
        [(i + 1, t, round(s, 9)) for i, (t, s) in enumerate(res)],
        "rank int, text string, score double",
    )


def _block_searcher(spark: SparkSession, sf_dir: str):
    """Block-join corpus: documents rows regrouped into blocks of 4
    children + one 'zzblockparentzz' marker parent, children preceding
    the parent in doc_id (Lucene addDocuments adjacency): child doc_id =
    5*(d//4) + d%4, parent doc_id = 5*(d//4) + 4. Returns (Searcher,
    corpus DF with the construction-side (doc_id, text, parent_id)); the
    ENGINE derives its own parent map from the marker query + doc_id
    adjacency, so the two sides are independent."""
    key = f"{sf_dir}::blocks"
    if key not in _CACHE:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        kids = docs.select(
            (F.floor(F.col("doc_id") / 4) * 5 + F.col("doc_id") % 4).alias(
                "doc_id"
            ),
            "text",
            (F.floor(F.col("doc_id") / 4) * 5 + 4).alias("parent_id"),
        )
        parents = (
            docs.select(F.floor(F.col("doc_id") / 4).alias("blk"))
            .distinct()
            .select(
                (F.col("blk") * 5 + 4).alias("doc_id"),
                F.lit("zzblockparentzz").alias("text"),
                (F.col("blk") * 5 + 4).alias("parent_id"),
            )
        )
        corpus = kids.unionByName(parents).persist()
        cfg = IndexConfig(
            chain="standard", seg_size=1 << 12, block_size=128,
            with_positions=False,
        )
        idx = build_index(
            corpus.select("doc_id", "text"), cfg,
            content_col="text", doc_id_col="doc_id",
        ).persist()
        _CACHE[key] = (Searcher(idx, dtype=np.float64), corpus)
    return _CACHE[key]


def _block_children_of(sp: SparkSession, d: str) -> DataFrame:
    """ParentChildrenBlockJoinQuery entry: expand the parent of the FIRST
    matching child back into its matching children."""
    s, corpus = _block_searcher(sp, d)
    m = s.matches(TermQuery(term="spark")).agg(F.min("doc_id")).collect()[0][0]
    pid = int(
        corpus.filter(F.col("doc_id") == int(m)).select("parent_id").first()[0]
    )
    return _topk_df(
        s,
        ParentChildrenBlockJoinQuery(
            parent_doc_id=pid,
            child=TermQuery(term="spark"),
            parents=TermQuery(term="zzblockparentzz"),
        ),
        10,
    )


def _graph_syn_query(kind: str) -> Query:
    """Query-time multi-word synonym expansion (synonymgraph.py analog of
    SynonymGraphFilter + QueryBuilder's graph decision tree,
    util/QueryBuilder.java:505-583) over the expand rule 'fast table, quick':
    bool   -> SHOULD[ SHOULD[MUST[fast, table], quick], merge ]
    phrase -> SHOULD[ phrase(fast table), term(quick) ]"""
    from lucene_spark.analysis import standard_analyze
    from lucene_spark.synonymgraph import (
        create_boolean_query,
        create_phrase_query,
        parse_solr_synonyms,
    )

    m = parse_solr_synonyms("fast table, quick", standard_analyze)
    if kind == "bool":
        return create_boolean_query("fast table merge", standard_analyze, m)
    return create_phrase_query("fast table", standard_analyze, m)


#: dictionary for the compound-decompounding entries: 'customer' ->
#: custom+mer, 'merge' -> mer (DictionaryCompoundWordTokenFilter brute-force
#: substring scan, reference analysis/compound/DictionaryCompoundWordTokenFilter.java:68-94)
#: inline hunspell dictionary for the oracle: "tabl/S" + SFX S strips "e",
#: so the corpus token "table" stems to "tabl" (longest-only replace).
#: The SQL twin applies the same 1:1 rename; the stemmer itself is pinned
#: by the reference's own .aff/.dic fixtures in tests/test_hunspell.py,
#: and tests assert this map row equals the live stemmer output.
_HUNSPELL_AFF = "SET UTF-8\nSFX S Y 1\nSFX S 0 e .\n"
_HUNSPELL_DIC = "1\ntabl/S\n"
_HUNSPELL_MAP = [("table", "tabl")]


def _hunspell_searcher(spark: SparkSession, sf_dir: str) -> Searcher:
    """Index with HunspellStemFilter (longest-only): each token maps to
    its longest hunspell stem, unknown words unchanged."""
    from lucene_spark.hunspell import (
        HunspellDictionary, HunspellFilter, Stemmer as HStemmer,
    )

    key = f"{sf_dir}::hunspell"
    if key not in _CACHE:
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).repartition(spark.sparkContext.defaultParallelism)
        filt = HunspellFilter(
            stemmer=HStemmer(HunspellDictionary(_HUNSPELL_AFF, [_HUNSPELL_DIC]))
        )
        cfg = IndexConfig(
            chain="standard",
            seg_size=1 << 10,
            block_size=128,
            with_positions=True,
            hunspell=filt,
        )
        idx = build_index(
            docs, cfg, content_col="text", doc_id_col="doc_id"
        ).persist()
        _CACHE[key] = Searcher(idx, dtype=np.float64)
    return _CACHE[key]


def _hunspell_prelude(mapping: list) -> str:
    """_PRELUDE with a 1:1 term rename (HunspellStemFilter longest-only
    replace): lengths/sttf unchanged, df/tf move to the stem."""
    case = " ".join(f"WHEN term = '{a}' THEN '{b}'" for a, b in mapping)
    out = _PRELUDE.replace(
        "tok AS (\n  SELECT doc_id, unnest(toks) AS term FROM tokarr\n)",
        "tok0 AS (\n  SELECT doc_id, unnest(toks) AS term FROM tokarr\n),\n"
        f"tok AS (\n  SELECT doc_id, CASE {case} ELSE term END AS term FROM tok0\n)",
    )
    out = out.replace(
        "tokp AS (\n  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos\n  FROM tokarr\n)",
        "tokp0 AS (\n  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos\n  FROM tokarr\n),\n"
        f"tokp AS (\n  SELECT doc_id, CASE {case} ELSE term END AS term, pos FROM tokp0\n)",
    )
    return out


_COMPOUND_WORDS = ("custom", "mer")


def _compound_searcher(spark: SparkSession, sf_dir: str) -> Searcher:
    """Index with dictionary decompounding: each token's dictionary
    substrings are injected at the token's position (posIncr=0 overlaps,
    norm-discounted like synonyms)."""
    from lucene_spark.compound import DictionaryDecompounder

    key = f"{sf_dir}::compound"
    if key not in _CACHE:
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).repartition(spark.sparkContext.defaultParallelism)
        cfg = IndexConfig(
            chain="standard",
            seg_size=1 << 10,
            block_size=128,
            with_positions=True,
            decompound=DictionaryDecompounder(words=frozenset(_COMPOUND_WORDS)),
        )
        idx = build_index(
            docs, cfg, content_col="text", doc_id_col="doc_id"
        ).persist()
        _CACHE[key] = Searcher(idx, dtype=np.float64)
    return _CACHE[key]


#: DoubleMetaphone(primary, alternate) codes for the corpus's fixed 31-word
#: vocabulary — the oracle twin injects these like index-time synonyms
#: (the PhoneticFilter inject mode IS posIncr=0 synonym injection). Rows
#: are consistency-tested against the encoder in tests/test_phonetic.py;
#: the algorithm itself is pinned by the reference filter vectors there.
_PHONETIC_MAP = [
    ("a", ["A"]), ("agg", ["AK"]), ("batch", ["PX"]), ("big", ["PK"]),
    ("column", ["KLMN"]), ("customer", ["KSTM"]), ("data", ["TT"]),
    ("dup", ["TP"]), ("fast", ["FST"]), ("filter", ["FLTR"]),
    ("group", ["KRP"]), ("hash", ["HX"]), ("join", ["JN", "AN"]),
    ("key", ["K"]), ("line", ["LN"]), ("merge", ["MRJ", "MRK"]),
    ("order", ["ARTR"]), ("part", ["PRT"]), ("query", ["KR"]),
    ("row", ["R", "RF"]), ("scan", ["SKN"]), ("slow", ["SL", "XLF"]),
    ("small", ["SML", "XML"]), ("sort", ["SRT"]), ("spark", ["SPRK"]),
    ("stream", ["STRM"]), ("table", ["TPL"]), ("the", ["0", "T"]),
    ("value", ["FL"]), ("vector", ["FKTR"]), ("window", ["ANT", "FNTF"]),
]


def _phonetic_searcher(spark: SparkSession, sf_dir: str) -> Searcher:
    """Index with DoubleMetaphone inject=True: primary (and differing
    alternate) codes join each token's position as posIncr=0 overlaps."""
    from lucene_spark.phonetic import PhoneticConfig

    key = f"{sf_dir}::phonetic"
    if key not in _CACHE:
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).repartition(spark.sparkContext.defaultParallelism)
        cfg = IndexConfig(
            chain="standard",
            seg_size=1 << 10,
            block_size=128,
            with_positions=True,
            phonetic=PhoneticConfig("doublemetaphone", inject=True),
        )
        idx = build_index(
            docs, cfg, content_col="text", doc_id_col="doc_id"
        ).persist()
        _CACHE[key] = Searcher(idx, dtype=np.float64)
    return _CACHE[key]


def _syn_searcher(spark: SparkSession, sf_dir: str) -> Searcher:
    """Index with index-time synonyms: 'fast' also indexes 'quick' at the
    same position (posIncr=0 overlap); norms discount the injected tokens."""
    key = f"{sf_dir}::syn"
    if key not in _CACHE:
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).repartition(spark.sparkContext.defaultParallelism)
        cfg = IndexConfig(
            chain="standard",
            seg_size=1 << 10,
            block_size=128,
            with_positions=True,
            synonyms=(("fast", ("quick",)),),
        )
        idx = build_index(
            docs, cfg, content_col="text", doc_id_col="doc_id"
        ).persist()
        _CACHE[key] = Searcher(idx, dtype=np.float64)
    return _CACHE[key]


def _sorted_topk(sp: SparkSession, d: str, k: int, ascending: bool) -> DataFrame:
    s = _sorted_searcher(sp, d)
    hits = s.search_sorted(TermQuery(term="vector"), k, ascending=ascending)
    return hits.join(s.index.docs.select("doc_id", "n_chars"), "doc_id").select(
        F.col("doc_id").cast("long"), F.col("n_chars").cast("long")
    )


def _sorted_topk_sql(term: str, k: int, ascending: bool) -> str:
    """Oracle: doc_id on the sorted index = row_number over (n_chars,
    original doc_id); early-terminated sorted top-k = smallest/largest k
    ranks among matching docs."""
    direction = "" if ascending else "DESC"
    return (
        _PRELUDE
        + f"""
, m AS (SELECT DISTINCT doc_id FROM tok WHERE term = '{term}'),
ids AS (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS nid
  FROM documents
)
SELECT ids.nid AS doc_id, ids.n_chars::BIGINT AS n_chars
FROM ids JOIN m ON m.doc_id = ids.doc_id
ORDER BY ids.nid {direction} LIMIT {k}
"""
    )


def _ivf_topk(sp: SparkSession, d: str) -> DataFrame:
    """IVF ANN with the SQL-reproducible static quantizer: centroids are the
    embeddings of vec_ids 0..15 (k-means with zero refinement steps), probes
    = 4 nearest centroids per query, exact cosine within probed lists only.
    The k-means-refined quantizer is exercised by the recall test
    (tests/test_functions.py) instead — iterative training is not
    SQL-expressible."""
    emb = _emb(sp, d)
    import lucene_spark.functions.simsearch as fsim_

    cent = fsim_.static_centroids(emb, list(range(16)))
    assigned = fsim_.ivf_assign(emb, cent)
    return fsim_.ivf_topk(assigned, cent, [20, 21, 22], k=5, nprobe=4)


def _hnsw_topk(sp: SparkSession, d: str) -> DataFrame:
    """Sharded HNSW graph ANN (functions/hnsw.py; the reference's
    util/hnsw/HnswGraphBuilder.java re-expressed as one graph per hash
    shard). The build is fully deterministic (hash levels, ascending-id
    insertion, id tie-breaks), and at this oracle scale ef=256 >= every
    shard's size, so the base-layer expansion is exhaustive over the
    connected graph and the merged top-k equals exact cosine — which is
    what the SQL oracle states. The approximate regime (bounded ef,
    recall@10 >= 0.95) is locked by tests/test_hnsw.py instead, exactly
    like the k-means IVF quantizer split."""
    import lucene_spark.functions.hnsw as fh

    emb = _emb(sp, d)
    graph = fh.build_hnsw(emb, n_shards=4, m=16, ef_construction=64)
    return fh.hnsw_topk(graph, emb, [5, 6, 7], k=5, ef=256, m=16, n_shards=4)


# fixed classification inputs (classification/SimpleNaiveBayesClassifier
# assignClass analog, batched): two token mixes + one empty text (zero
# tokens -> posterior == class prior, the reference's no-token degenerate)
_CLS_INPUTS = [
    (0, "spark fast join vector window group"),
    (1, "merge table batch stream the a row row"),
    (2, ""),
]
_CLS_KNN_DOCS = [0, 5]  # inputs = these docs' own text (like q_mlt_doc0)


def _payload_entry(
    sp: SparkSession, d: str, terms, fn: str, include_span: bool = False,
    slop: int = 0,
) -> DataFrame:
    """End-to-end payload path: attach a deterministic ``|pos%5 + 0.5``
    payload to every whitespace token of documents.text (pure Catalyst
    transform), parse it back through parse_delimited_payloads (the REAL
    DelimitedPayloadTokenFilter path), then PayloadScoreQuery-aggregate.
    The oracle derives (term, pos, payload) independently in SQL."""
    from lucene_spark.functions import payloads as fpay

    docs = _docs(sp, d)
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    delim = docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                toks,
                lambda x, i: F.concat(
                    x, F.lit("|"), (i % 5).cast("string"), F.lit(".5")
                ),
            ),
            " ",
        ).alias("text"),
    )
    tbl = fpay.parse_delimited_payloads(delim, "doc_id", "text")
    span_scores = None
    if include_span:
        span_scores = _searcher(sp, d).search(
            TermQuery(term=terms), 1 << 20, prune=False
        )
    out = fpay.payload_score(tbl, terms, fn, span_scores=span_scores, slop=slop)
    return out.select(
        F.col("doc_id").cast("long"),
        F.round(F.col("score"), 6).alias("score"),
    ).orderBy("doc_id")


# Language-chain fixtures: a deterministic synthetic corpus per language,
# built arithmetically from doc_id so the SQL twin reproduces it exactly
# (the construction is shared; the CHAIN + BM25 are independently derived:
# the oracle's per-word chain outputs come from the REFERENCE'S OWN data —
# elision from FrenchAnalyzer.DEFAULT_ARTICLES, stopwords from the
# snowball stop lists, stems from the {fr,de,es}light.txt VocabularyAssert
# files (composed with the normalization FSM's unit vectors for straße /
# flüsse) — never from lucene_spark.lang).
# Each doc: n = doc_id % 9 + 3 words, word i = W[(doc_id*7 + i*3) % 16].
_LANG_CHAIN_MAP = {
    # (surface word, chain output) — None = stopword (position hole)
    "french": [
        ("les", None), ("chevaux", "cheval"), ("l'église", "eglis"),
        ("éléments", "element"), ("du", None), ("chats", "chat"),
        ("journaux", "journal"), ("généreuse", "genereu"),
        ("nationale", "national"), ("président", "president"),
        ("chanté", "chant"), ("constitution", "constitution"),
        ("maisons", "maison"), ("qu'elle", None), ("animaux", "animal"),
        ("lumière", "lumier"),
    ],
    "german": [
        ("die", None), ("kinder", "kind"), ("regierung", "regierung"),
        ("wasser", "wass"), ("himmel", "himmel"), ("garten", "gart"),
        ("blumen", "blum"), ("stimmen", "stimm"), ("straße", "strass"),
        ("flüsse", "fluss"), ("der", None), ("nacht", "nacht"),
        ("licht", "licht"), ("wald", "wald"), ("vogel", "vogel"),
        ("markt", "markt"),
    ],
    "spanish": [
        ("los", None), ("niños", "niñ"), ("ciudades", "ciudad"),
        ("casas", "cas"), ("libros", "libr"), ("veces", "vez"),
        ("actrices", "actriz"), ("naciones", "nacion"),
        ("españoles", "español"), ("rápidamente", "rapidament"),
        ("aguas", "agu"), ("luces", "luz"), ("de", None),
        ("pequeños", "pequeñ"), ("flores", "flor"), ("grandes", "grand"),
    ],
    "italian": [
        ("il", None), ("montagne", "montagn"), ("dell'acqua", "acqua"),
        ("ragazzi", "ragazz"), ("alberi", "alber"), ("strade", "strad"),
        ("canzoni", "canzon"), ("stelle", "stell"), ("giorni", "giorn"),
        ("città", "città"), ("delle", None), ("notte", "notte"),
        ("case", "case"), ("luce", "luce"), ("vento", "vento"),
        ("tempo", "tempo"),
    ],
    "portuguese": [
        ("as", None), ("cidades", "cidad"), ("livros", "livr"),
        ("casas", "casa"), ("meninos", "menin"), ("flores", "flor"),
        ("noites", "noit"), ("árvores", "arvor"), ("ruas", "rua"),
        ("canções", "canca"), ("amigos", "amig"), ("estrelas", "estrel"),
        ("luzes", "luz"), ("dias", "dia"), ("mulheres", "mulher"),
        ("os", None),
    ],
    # Scandinavian chains stem with the SNOWBALL stemmers; the expected
    # outputs below are (word, output) pairs from the reference's own
    # snowball voc.txt/output.txt test data
    "swedish": [
        ("snyft", "snyft"), ("förnedrade", "förnedr"), ("sffälle", "sffäll"),
        ("anteckningar", "anteckning"), ("förblifva", "förblifv"),
        ("midsommar", "midsomm"), ("brusalavår", "brusalavår"),
        ("brådskan", "brådskan"), ("billigare", "bil"),
        ("jaktlöjtnanten", "jaktlöjtnant"), ("följetongen", "följetong"),
        ("rättan", "rättan"), ("frestats", "frestat"),
        ("skildringen", "skildring"), ("och", None), ("det", None),
    ],
    "danish": [
        ("dygtiggjort", "dygtiggjort"), ("nsker", "nsker"),
        ("takkegave", "takkegav"), ("betales", "betal"), ("sledes", "sled"),
        ("nærmeste", "nærmest"), ("samaritanerlandsby", "samaritanerlandsby"),
        ("ringeagtes", "ringeag"), ("stenet", "sten"), ("tibhat", "tibhat"),
        ("behandlet", "behandl"), ("vognborgen", "vognborg"),
        ("afbrænde", "afbrænd"), ("opfødt", "opfød"), ("og", None),
        ("det", None),
    ],
    "dutch": [
        ("zelfonvoldaanheid", "zelfonvoldan"), ("stortvloed", "stortvloed"),
        ("draden", "drad"), ("verkreukelen", "verkreukel"),
        ("grand", "grand"), ("verziekelijkte", "verziekelijkt"),
        ("tegenovergestelde", "tegenovergesteld"), ("zuster", "zuster"),
        ("karwei", "karwei"), ("aanvankelijke", "aanvank"),
        ("overweging", "overweg"), ("bemòeien", "bemòei"),
        ("bodemsanering", "bodemsaner"), ("verlengd", "verlengd"),
        ("de", None), ("het", None),
    ],
    "russian": [
        ("славная", "славн"), ("чахоточную", "чахоточн"),
        ("докажу", "докаж"), ("горячишься", "горяч"),
        ("значительные", "значительн"), ("обстоятельстве", "обстоятельств"),
        ("стоячею", "стояч"), ("различными", "различн"),
        ("беспокойным", "беспокойн"), ("прислонился", "прислон"),
        ("позади", "позад"), ("открытий", "открыт"),
        ("догоравшего", "догора"), ("строк", "строк"),
        ("и", None), ("на", None),
    ],
    "norwegian": [
        ("drive", "driv"), ("norconsult", "norconsult"), ("egnet", "egn"),
        ("betegnet", "betegn"), ("generalforsamlingane", "generalforsamling"),
        ("merkevarer", "merkevar"), ("klærne", "klærn"),
        ("konkurransevridende", "konkurransevrid"), ("grunna", "grunn"),
        ("industriland", "industriland"), ("bærende", "bær"),
        ("innskota", "innskot"), ("passiv", "passiv"),
        ("bustadorganisasjonane", "bustadorganisasjon"), ("og", None),
        ("det", None),
    ],
    "finnish": [
        ("evakuoidaan", "evakuoid"), ("häivähdyksen", "häivähdyks"),
        ("asuttaminen", "asuttamin"), ("hallitustilannetta", "hallitustilan"),
        ("hurjastella", "hurjast"), ("epäröinyt", "epäröiny"),
        ("haastetta", "haast"), ("grönmanin", "grönman"),
        ("etenevät", "etenev"), ("ajaakseen", "ajaaks"),
        ("aidosti", "aidost"), ("demokraattisen", "demokraattis"),
        ("hankaloittaa", "hankaloit"), ("fagerholmille", "fagerholm"),
        ("ja", None), ("on", None),
    ],
    "hungarian": [
        ("barátaitól", "barát"), ("megerősítése", "megerősítés"),
        ("kilépése", "kilépés"), ("alapozta", "alapozt"),
        ("behatolt", "behatol"), ("lemezekhez", "lemez"),
        ("kutatásában", "kutatás"), ("ablakokon", "ablak"),
        ("kezelőfelületre", "kezelőfelület"), ("megalkuvók", "megalkuvó"),
        ("körülményre", "körülmény"), ("kirobbanása", "kirobbanás"),
        ("asszonyom", "asszony"), ("megvásárlásakor", "megvásárlás"),
        ("a", None), ("és", None),
    ],
    "romanian": [
        ("calchiată", "calchiat"), ("imperativul", "imper"),
        ("comunismului", "comunist"), ("începusem", "încep"),
        ("frăgezimi", "frăgezim"), ("minicalculatoarelor", "minicalcul"),
        ("inovaţiile", "inov"), ("obicinuia", "obicinui"),
        ("mânuţele", "mânuţ"), ("năuceşte", "năuc"),
        ("roadele", "road"), ("categorică", "categor"),
        ("obţine", "obţin"), ("intercalată", "intercal"),
        ("şi", None), ("de", None),
    ],
    "turkish": [
        ("sapiklar", "sapik"), ("donatılmış", "donatıl"),
        ("birikimim", "birik"), ("çelişkiye", "çelişki"),
        ("mehepeliler", "mehepeli"), ("ereceği", "erecek"),
        ("çocukken", "çocuk"), ("araştırırken", "araştırır"),
        ("kuyruğa", "kuyruk"), ("algılandı", "algıla"),
        ("motorlarındaki", "motor"), ("filmlerini", "film"),
        ("yaklaşımla", "yaklaş"), ("gelişini", "geliş"),
        ("ve", None), ("bir", None),
    ],
    # expected outputs from analysis/ar/Test{ArabicStemFilter,
    # ArabicNormalizationFilter}.java vectors; stops from ar/stopwords.txt
    "arabic": [
        ("والحسن", "حسن"), ("بالحسن", "حسن"), ("كالحسن", "حسن"),
        ("فالحسن", "حسن"), ("للاخر", "اخر"), ("زوجها", "زوج"),
        ("ساهدان", "ساهد"), ("ساهدات", "ساهد"), ("ساهدون", "ساهد"),
        ("ساهدين", "ساهد"), ("ساهدهات", "ساهد"), ("الو", "الو"),
        ("أحمد", "احمد"), ("آجن", "اجن"), ("في", None), ("من", None),
    ],
    # expected outputs from analysis/fa/TestPersianNormalizationFilter.java
    # vectors (+ pure-copy words); stops from fa/stopwords.txt (normalized)
    "persian": [
        ("کشاندن", "كشاندن"), ("كتابۀ", "كتابه"), ("زادہ", "زاده"),
        ("کتاب", "كتاب"), ("خوب", "خوب"), ("درخت", "درخت"),
        ("آسمان", "اسمان"), ("ستاره", "ستاره"), ("دریا", "دريا"),
        ("کوه", "كوه"), ("باران", "باران"), ("نور", "نور"),
        ("شهری", "شهري"), ("نامه", "نامه"), ("یا", None), ("ده", None),
    ],
    # expected outputs from analysis/bg/TestBulgarianStemmer.java vectors
    "bulgarian": [
        ("градове", "град"), ("народите", "народ"), ("пътища", "път"),
        ("дядовци", "дяд"), ("мъжете", "мъж"), ("краката", "крак"),
        ("братята", "брат"), ("вестта", "вест"), ("дърветата", "дърв"),
        ("морето", "мор"), ("изключенията", "изключени"),
        ("градовете", "град"), ("красив", "красив"), ("градът", "град"),
        ("и", None), ("на", None),
    ],
    # expected outputs from analysis/cz/TestCzechStemmer.java vectors
    "czech": [
        ("hradu", "hrad"), ("mužích", "muh"), ("předsedů", "předsd"),
        ("soudcem", "soudk"), ("písním", "písn"), ("městem", "měst"),
        ("kuřeti", "kuř"), ("mladých", "mlad"), ("jarním", "jarn"),
        ("kluk", "kluk"), ("pán", "pán"), ("ženu", "žn"),
        ("hradem", "hrad"), ("hrady", "hrad"), ("a", None), ("se", None),
    ],
    # expected outputs from analysis/ckb/TestSoraniStemFilter.java vectors
    # (all re-verified against the full ckbtestdata.zip vocabulary)
    "sorani": [
        ("پیاوەکان", "پیاو"), ("پیاوێک", "پیاو"), ("پیاوان", "پیاو"),
        ("دەرگاکان", "دەرگا"), ("دەرگایەک", "دەرگا"),
        ("هۆتیلێکی", "هۆتیل"), ("هۆتیلانی", "هۆتیل"),
        ("دوورەوە", "دوور"), ("نیوەشەودا", "نیوەشەو"),
        ("پارەمان", "پارە"), ("پارەتان", "پارە"), ("کتاویە", "کتاوی"),
        ("سۆرانا", "سۆران"), ("دەرگایان", "دەرگا"),
        ("بۆ", None), ("ئەم", None),
    ],
    # chain compositions of analysis/hi test vectors (each stage —
    # IndicNormalizer, HindiNormalizer, HindiStemmer — validated against
    # its own reference vectors in tests/test_lang_world.py)
    "hindi": [
        ("लडका", "लडक"), ("लडके", "लडक"), ("लडकों", "लडक"),
        ("गुरुओं", "गुर"), ("गुरु", "गुर"), ("लडकियों", "लडक"),
        ("किताब", "किताब"), ("किताबें", "किताब"), ("किताबों", "किताब"),
        ("खाना", "खा"), ("खाता", "खा"), ("कठिनाइयां", "कठिन"),
        ("खाती", "खात"), ("दोस्तों", "दोसत"), ("के", None), ("और", None),
    ],
    # chain compositions of analysis/bn test vectors (same validation)
    "bengali": [
        ("করেছিলাম", "কর"), ("করিতেছিলে", "কর"), ("খাইতাম", "খাই"),
        ("যাইবে", "যা"), ("করছিলাম", "কর"), ("করতাম", "কর"),
        ("যাব", "যা"), ("করি", "কর"), ("করো", "কর"),
        ("মেয়েরা", "মে"), ("একটি", "এক"), ("মানুষগুলি", "মানুস"),
        ("ছেলেরা", "ছেল"), ("বাড়িতে", "বার"),
        ("এবং", "এবং"), ("করে", None),
    ],
    # expected outputs from analysis/id/TestIndonesianStemmer.java vectors
    "indonesian": [
        ("bukukah", "buku"), ("bukupun", "buku"), ("bukuku", "buku"),
        ("bukunya", "buku"), ("mengukur", "ukur"), ("menyapu", "sapu"),
        ("menduga", "duga"), ("membaca", "baca"), ("merusak", "rusak"),
        ("pengukur", "ukur"), ("diukur", "ukur"), ("tersapu", "sapu"),
        ("kekasih", "kasih"), ("berlari", "lari"),
        ("yang", None), ("dan", None),
    ],
    # expected outputs from analysis/lv/TestLatvianStemmer.java vectors
    "latvian": [
        ("tēvs", "tēv"), ("tēviem", "tēv"), ("tēvus", "tēv"),
        ("tēvos", "tēv"), ("lācis", "lāc"), ("lāčiem", "lāc"),
        ("lāčus", "lāc"), ("lācī", "lāc"), ("tēvam", "tēv"),
        ("lācim", "lāc"), ("tēvā", "tēv"), ("lāča", "lāc"),
        ("tēva", "tēv"), ("lāči", "lāc"), ("un", None), ("ir", None),
    ],
    # expected outputs from analysis/el/TestGreekStemmer.java vectors
    # (full-chain GreekLowerCase + stem)
    "greek": [
        ("άνθρωπος", "ανθρωπ"), ("ανθρώπου", "ανθρωπ"),
        ("άνθρωπε", "ανθρωπ"), ("ανθρώπων", "ανθρωπ"),
        ("ανθρώπους", "ανθρωπ"), ("πελάτης", "πελατ"),
        ("πελάτη", "πελατ"), ("γραμματέα", "γραμματε"),
        ("γραμματείς", "γραμματ"), ("γραμματέων", "γραμματ"),
        ("βιβλίο", "βιβλι"), ("βιβλίου", "βιβλ"), ("βιβλία", "βιβλ"),
        ("άνθρωπο", "ανθρωπ"), ("και", None), ("του", None),
    ],
    # expected outputs from analysis/br/TestBrazilianAnalyzer.java vectors
    "brazilian": [
        ("boataria", "boat"), ("boate", "boat"), ("boates", "boat"),
        ("bôas", "boas"), ("quinzena", "quinzen"), ("bobagem", "bobag"),
        ("meninas", "menin"), ("boatos", "boat"), ("boa", "boa"),
        ("boassu", "boassu"), ("bocadinho", "bocadinh"),
        ("bocado", "boc"), ("bocaiúva", "bocaiuv"), ("boçal", "bocal"),
        ("os", None), ("das", None),
    ],
    # expected outputs from the reference's gltestdata.zip vocabulary
    "galician": [
        ("aceiro", "aceir"), ("aceitosa", "aceit"), ("acelera", "aceler"),
        ("acenaron", "acen"), ("acende", "acend"), ("acenou", "acen"),
        ("acentúa", "acentu"), ("acepta", "acept"),
        ("aceptable", "acept"), ("aceptación", "acept"),
        ("aceptada", "acept"), ("aceptado", "acept"),
        ("acentúanse", "acentuans"), ("aceptadas", "acept"),
        ("os", None), ("unha", None),
    ],
    # expected outputs from the reference's ptrslptestdata.zip vocabulary
    "portuguese_rslp": [
        ("absurdas", "absurd"), ("absurdo", "absurd"),
        ("abuelita", "abuelit"), ("abundância", "abund"),
        ("abundante", "abund"), ("abusando", "abus"), ("abusar", "abus"),
        ("abuse", "abus"), ("abuso", "abus"), ("abusou", "abus"),
        ("acaba", "acab"), ("abusos", "abus"), ("abujamra", "abujamr"),
        ("absurdos", "absurd"), ("as", None), ("uma", None),
    ],
    # expected outputs from the reference's snowball irish.zip vocabulary
    # + ga/TestIrishAnalyzer.java vectors
    "irish": [
        ("siopadóireacht", "siopadóir"), ("síceapatacha", "síceapaite"),
        ("mheidhir", "meidhir"), ("dhísle", "dísle"),
        ("thimpireach", "timpir"), ("dheasós", "deasós"),
        ("mhíneoidh", "míneoidh"), ("b'fhearr", "fearr"),
        ("m'athair", "athair"), ("bhforaois", "foraois"),
        ("maoile", "maoile"), ("seadóg", "seadóg"),
        ("ardchúrsa", "ardchúrsa"), ("rannáin", "rannáin"),
        ("le", None), ("agus", None),
    ],
    # expected outputs generated from the reference snowball ArmenianStemmer
    # run as a dev-time oracle over a synthesized base x suffix vocabulary
    # (all 3,764 pairs match; representative picks embedded)
    "armenian": [
        ("արծիվ", "արծ"), ("արծիվներ", "արծ"), ("աստղարք", "աստղ"),
        ("աստղելուց", "աստղ"), ("աստղիվ", "աստղ"), ("աստղչել", "աստղ"),
        ("արծանիք", "արծ"), ("արծացրինք", "արծ"), ("արծեցիր", "արծ"),
        ("արծու", "արծ"), ("գիրը", "գիրը"), ("գիրական", "գիր"),
        ("քաղաքներ", "քաղ"), ("մարդիկ", "մարդ"),
        ("է", None), ("այս", None),
    ],
    # expected outputs from ca/TestCatalanAnalyzer.java vectors + the
    # reference snowball CatalanStemmer run as a dev-time oracle
    # (8,896 synthesized pairs all match)
    "catalan": [
        ("llengües", "llengu"), ("llengua", "llengu"),
        ("catalans", "catalan"), ("catalanes", "catalan"),
        ("lògiques", "log"), ("crítiques", "crit"),
        ("l'institut", "inst"), ("estudis", "estud"),
        ("formes", "form"), ("m'agrada", "agr"),
        ("barcelonines", "barcelon"), ("gràcies", "grac"),
        ("quíssimes", "quissim"), ("d'estudi", "estud"),
        ("un", None), ("els", None),
    ],
    # expected outputs from eu/TestBasqueAnalyzer.java vectors + the
    # reference snowball BasqueStemmer dev-time oracle (5,661 pairs match)
    "basque": [
        ("zaldiak", "zaldi"), ("mendiari", "mendi"), ("etxeetan", "etxe"),
        ("gizonaren", "gizo"), ("lagunekin", "lagune"),
        ("liburuak", "liburu"), ("ikasleek", "ikasle"),
        ("herriko", "herri"), ("urtean", "urtean"), ("eskolara", "eskol"),
        ("zalantzarik", "zalantza"), ("euskaldunak", "euskal"),
        ("galdera", "gald"), ("behar", "behar"),
        ("eta", None), ("bat", None),
    ],
    # expected outputs from the reference snowball LithuanianStemmer
    # dev-time oracle (3,615 synthesized pairs match)
    "lithuanian": [
        ("vaikų", "vaik"), ("knygos", "knyg"), ("mokyklose", "mokykl"),
        ("namuose", "nam"), ("didelis", "didel"),
        ("lietuviškai", "lietuv"), ("kalbėjo", "kalb"),
        ("žmonės", "žmon"), ("darbams", "darb"), ("augalai", "augal"),
        ("geriausias", "ger"), ("aplinkoje", "aplink"),
        ("vaikais", "vaik"), ("knygomis", "knyg"),
        ("ir", None), ("yra", None),
    ],
    # expected outputs from the reference snowball EstonianStemmer
    # dev-time oracle (1,122 synthesized pairs match)
    "estonian": [
        ("raamatud", "raama"), ("koolides", "kooli"),
        ("majadegi", "maja"), ("lastele", "last"),
        ("õpetajaks", "õpetaja"), ("linnades", "linna"),
        ("seppade", "sepa"), ("kottide", "koti"),
        ("suuremad", "suure"), ("inimestel", "inimes"),
        ("töötas", "tööta"), ("eestlane", "eestlase"),
        ("õppijat", "õppija"), ("talled", "talle"),
        ("ja", None), ("ei", None),
    ],
    # two-char CJK words bigram to themselves (cjk/TestCJKAnalyzer.java
    # semantics); stops from cjk/stopwords.txt
    "cjk": [
        ("学生", "学生"), ("試験", "試験"), ("中国", "中国"),
        ("日本", "日本"), ("東京", "東京"), ("あい", "あい"),
        ("カタ", "カタ"), ("한국", "한국"), ("学校", "学校"),
        ("多く", "多く"), ("落ち", "落ち"), ("電車", "電車"),
        ("新聞", "新聞"), ("映画", "映画"),
        ("the", None), ("www", None),
    ],
    # expected outputs from the reference's rulighttestdata.zip vocabulary
    "russian_light": [
        ("алгебра", "алгебр"), ("англичанах", "англичан"),
        ("ахиллесу", "ахиллес"), ("бараньим", "баран"),
        ("бегающих", "бегающ"), ("безделку", "безделк"),
        ("безобразные", "безобразн"), ("белоснежная", "белоснежн"),
        ("бесплодная", "бесплодн"), ("библия", "библ"),
        ("благолепие", "благолеп"), ("бледнея", "бледн"),
        ("бессловного", "бессловн"), ("аристократическими",
                                      "аристократическ"),
        ("и", None), ("на", None),
    ],
    # expected outputs from the reference's filighttestdata.zip vocabulary
    "finnish_light": [
        ("aapisen", "aapi"), ("aatelisia", "aatelis"),
        ("aavistin", "aavis"), ("afgaaneja", "afgaan"),
        ("aggressiot", "aggress"), ("ahdistusta", "ahdistu"),
        ("ahnehtii", "ahneht"), ("ahtisaareen", "ahtisaar"),
        ("aidosti", "aido"), ("aihepiiriin", "aihepiir"),
        ("aiheutuva", "aiheutuv"), ("aikaisempien", "aikaisemp"),
        ("acre", "acr"), ("aamukahdeksasta", "aamukahdeks"),
        ("ja", None), ("on", None),
    ],
    # expected outputs from the reference's ptminimaltestdata.zip vocabulary
    "portuguese_minimal": [
        ("águas", "água"), ("amassos", "amasso"),
        ("antiarmas", "antiarma"), ("árbitros", "árbitro"),
        ("assassinas", "assassina"), ("autógrafos", "autógrafo"),
        ("banqueiros", "banqueiro"), ("bilhões", "bilhão"),
        ("brigávamos", "brigávamo"), ("calouros", "calouro"),
        ("carinhosas", "carinhosa"), ("centenas", "centena"),
        ("cientistas", "cientista"), ("ades", "ade"),
        ("as", None), ("uma", None),
    ],
    # expected outputs from the reference's frminimaltestdata.zip vocabulary
    "french_minimal": [
        ("accourus", "accouru"), ("adopter", "adopt"),
        ("agrémentées", "agrément"), ("amassée", "amas"),
        ("approuvée", "approuv"), ("arrivons", "arrivon"),
        ("attache", "attach"), ("autorisée", "autoris"),
        ("balustrade", "balustrad"), ("belliqueux", "belliqueu"),
        ("bonheurs", "bonheu"), ("brantôme", "brantôm"),
        ("cabane", "caban"), ("antigénéreuses", "antigénéreus"),
        ("les", None), ("du", None),
    ],
    # expected outputs from en/TestEnglishMinimalStemFilter.java vectors
    "english_minimal": [
        ("queries", "query"), ("phrases", "phrase"), ("corpus", "corpus"),
        ("stress", "stress"), ("kings", "king"), ("panels", "panel"),
        ("aerodynamics", "aerodynamic"), ("congress", "congress"),
        ("serious", "serious"), ("tables", "table"), ("words", "word"),
        ("armies", "army"), ("dies", "dy"), ("shoes", "shoes"),
        ("news", "new"), ("goes", "goes"),
    ],
    # expected outputs from the reference's snowball nepali.zip vocabulary
    "nepali": [
        ("भित्र्याउनेछ्यौ", "भित्र्याउ"), ("भुल्दियो", "भुल्"),
        ("खोसिएका", "खोस"), ("दौडदैछस्", "दौड"),
        ("तङग्रनेछु", "तङग्र"), ("जीत्छ्यौ", "जीत्"),
        ("चम्कलान्", "चम्क"), ("जुट्थ्यौ", "जुट्"),
        ("निस्केछौ", "निस्क"), ("चाख्लान्", "चाख्"),
        ("बास्थ्यौ", "बास्"), ("माझ्थिन्", "माझ्"),
        ("बगाउथिन्", "बगाउ"), ("थुक्थ्यौ", "थुक्"),
        ("गर्छ", "गर्"), ("राम", "राम"),
    ],
    # expected outputs from the reference's snowball german.zip vocabulary
    "german_snowball": [
        ("lernens", "lern"), ("zeichnete", "zeichnet"),
        ("frecher", "frech"), ("erdbeere", "erdbe"),
        ("spazieren", "spazi"), ("gesonnen", "gesonn"),
        ("verwendung", "verwend"), ("jemands", "jemand"),
        ("zuträglichkeit", "zutrag"), ("regimente", "regiment"),
        ("schaudern", "schaud"), ("schenkstuben", "schenkstub"),
        ("blökende", "blokend"), ("dantine", "dantin"),
        ("die", None), ("und", None),
    ],
    # expected outputs from the reference's snowball german2.zip vocabulary
    # (ae/oe/ue folding prelude)
    "german2": [
        ("laert", "lart"), ("feuern", "feu"),
        ("abenteuerliches", "abenteu"), ("zueilten", "zuilt"),
        ("feuerherde", "feuerherd"), ("zerbläuen", "zerblau"),
        ("freilassen", "freilass"), ("heraufkäme", "heraufkam"),
        ("frühleben", "fruhleb"), ("silberbügel", "silberbugel"),
        ("kräuterwust", "krauterwust"),
        ("niederträchtigen", "niedertracht"), ("gelegtes", "gelegt"),
        ("nichtsdestominder", "nichtsdestomind"),
        ("die", None), ("und", None),
    ],
    # expected outputs from the reference's snowball english.zip vocabulary
    # (Porter2; also verified against porter.zip's wordlist via the
    # compiled-reference oracle — 4,000 pairs total)
    "english_snowball": [
        ("hinting", "hint"), ("outlive", "outliv"), ("cares", "care"),
        ("continuing", "continu"), ("malignity", "malign"),
        ("fiance", "fianc"), ("resigns", "resign"),
        ("exhorts", "exhort"), ("offence", "offenc"),
        ("extortion", "extort"), ("plunges", "plung"),
        ("dibabs", "dibab"), ("direcfly", "direcfli"),
        ("abrolhos", "abrolho"), ("dying", "die"), ("skies", "sky"),
    ],
    # expected outputs from the reference's snowball spanish.zip vocabulary
    "spanish_snowball": [
        ("creadores", "creador"), ("templo", "templ"),
        ("complicación", "complic"), ("historia", "histori"),
        ("calabaza", "calabaz"), ("espacio", "espaci"),
        ("partículas", "particul"), ("enjuiciar", "enjuici"),
        ("hundida", "hund"), ("cuidado", "cuid"),
        ("cepillan", "cepill"), ("vitro", "vitr"),
        ("reconducción", "reconduccion"), ("ésta", "esta"),
        ("los", None), ("una", None),
    ],
    # expected outputs from the reference's snowball italian.zip vocabulary
    "italian_snowball": [
        ("pessotto", "pessott"), ("sbagliato", "sbagl"),
        ("sposata", "spos"), ("volerlo", "vol"),
        ("coltivare", "coltiv"), ("esitava", "esit"),
        ("escludono", "esclud"), ("rifiutaste", "rifiutast"),
        ("sapremmo", "sapr"), ("istituzionale", "istituzional"),
        ("riceverla", "ricev"), ("stretti", "strett"),
        ("rassettar", "rassett"), ("raditelevisive", "raditelevis"),
        ("gli", None), ("una", None),
    ],
    # expected outputs from the reference's snowball portuguese.zip
    "portuguese_snowball": [
        ("peluda", "pelud"), ("jazadji", "jazadj"),
        ("motorizados", "motoriz"), ("norte", "nort"),
        ("deixam", "deix"), ("prefixo", "prefix"),
        ("craveiro", "craveir"), ("capitais", "capit"),
        ("confeccionadas", "confeccion"), ("citar", "cit"),
        ("aderiram", "ader"), ("respirava", "respir"),
        ("contido", "cont"), ("amizades", "amizad"),
        ("as", None), ("uma", None),
    ],
    # expected outputs from the reference snowball FrenchStemmer run as a
    # dev-time oracle over the 20,403-word fr vocabulary (all match)
    "french_snowball": [
        ("accoster", "accost"), ("acquerrait", "acquerr"),
        ("adorateur", "ador"), ("affirmait", "affirm"),
        ("aidées", "aid"), ("alarmée", "alarm"), ("amarres", "amarr"),
        ("anciennes", "ancien"), ("antipathie", "antipath"),
        ("applaudissaient", "applaud"), ("aquetta", "aquet"),
        ("arrêtaient", "arrêt"), ("aspirez", "aspir"),
        ("astronomes", "astronom"), ("les", None), ("qu'une", None),
    ],
    # expected outputs from the reference's snowball lovins.zip vocabulary
    "lovins": [
        ("anywhere", "anywhes"), ("ranchos", "rancho"),
        ("deception", "decept"), ("moaned", "moan"),
        ("footfall", "footfal"), ("littoral", "littor"),
        ("arrives", "arriv"), ("misconstruing", "misconstru"),
        ("melancholy", "melancho"), ("inquired", "inquir"),
        ("comforting", "comfort"), ("erased", "eras"),
        ("praised", "prais"), ("requirements", "requirement"),
        ("disinterestedness", "disinterested"), ("believe", "belief"),
    ],
    # stems from the reference SerbianStemmer compiled as a dev oracle,
    # then the SerbianNormalizationFilter's published char map (stem ->
    # bald-latin, the analyzer's filter order); stopwords from
    # sr/stopwords.txt
    "serbian": [
        ("и", None), ("ljubavi", "ljubav"), ("devojka", "devojk"),
        ("девојка", "devojk"), ("pjevati", "pevat"),
        ("okruženju", "okruzenj"), ("vrtovi", "vrtov"), ("prsti", "prst"),
        ("srpski", "srpsk"), ("računari", "racunar"),
        ("gradovi", "gradov"), ("knjige", "knjig"), ("школама", "skol"),
        ("piscima", "pisc"), ("zemljama", "zemlj"), ("su", None),
    ],
    # Thai: dictionary segmentation (each surface is one lexicon word ->
    # one token; JDK-BreakIterator-oracle-validated in tests/test_thai.py)
    # + th/stopwords.txt; no stemming in the reference chain
    "thai": [
        ("ที่", None), ("โศลก", "โศลก"), ("จักรวาต", "จักรวาต"),
        ("ปาฏิบท", "ปาฏิบท"), ("กะทำ", "กะทำ"), ("กีดกัน", "กีดกัน"),
        ("เทพ", "เทพ"), ("ราชทินนาม", "ราชทินนาม"),
        ("ขับถ่าย", "ขับถ่าย"), ("ประทัด", "ประทัด"), ("ภาษา", "ภาษา"),
        ("ไทย", "ไทย"), ("แสดง", "แสดง"), ("งาน", "งาน"), ("ดี", "ดี"),
        ("ได้", None),
    ],
    # Japanese dictionary tier (kuromoji lattice analog over the demo
    # lexicon — kuromoji.py): 1:1 surfaces only (multi-token segmentation
    # is pinned in tests/test_kuromoji.py); particles/aux-verbs are POS
    # stoptag holes; コンピューター exercises unknown-katakana + KatakanaStem
    "japanese": [
        ("東京", "東京"), ("の", None), ("空港", "空港"),
        ("日本語", "日本語"), ("です", None), ("関西", "関西"),
        ("国際", "国際"), ("大阪", "大阪"), ("に", None),
        ("学校", "学校"), ("スパーク", "スパーク"),
        ("コンピューター", "コンピュータ"), ("行く", "行く"),
        ("京都", "京都"), ("は", None), ("東", "東"),
    ],
    # demo-lexicon expectations (korean.py nori analog): COMPOUND surfaces
    # decompound into multiple tokens (DISCARD mode, list outputs), J/E POS
    # tags stop to holes, Hanja surfaces re-term to their Hangul reading
    "korean": [
        ("한국", "한국"), ("서울", "서울"), ("학교", "학교"),
        ("전자", "전자"), ("언어", "언어"), ("사람", "사람"),
        ("은", None), ("는", None), ("를", None), ("에서", None),
        ("삼성전자", ["삼성", "전자"]),
        ("서울대학교", ["서울", "대학교"]),
        ("검색엔진", ["검색", "엔진"]),
        ("漢字", "한자"), ("하는", "하"), ("검색", "검색"),
    ],
    # demo-lexicon expectations (smartcn.py HHMM analog): the bigram
    # lattice segments multi-word runs (list outputs), whole dictionary
    # words survive, non-CJK tokens porter-stem
    "chinese": [
        ("北京大学", "北京大学"), ("搜索引擎", "搜索引擎"),
        ("中华人民共和国", "中华人民共和国"), ("中国", "中国"),
        ("人民", "人民"), ("语言", "语言"), ("我", "我"), ("是", "是"),
        ("的", "的"), ("研究生", "研究生"),
        ("研究生命起源", ["研究", "生命", "起源"]),
        ("running", "run"), ("123", "123"), ("起源", "起源"),
    ],
    # expected outputs from the reference's snowball/kp.zip vocabulary
    # (voc.txt/output.txt pairs) + the dutch_stop.txt stopset
    "dutch_kp": [
        ("de", None), ("lichamelijk", "lichamelijk"),
        ("opheffen", "ophef"), ("kaarten", "kaart"),
        ("gekregen", "kreeg"), ("bomen", "boom"),
        ("gelijkwaardige", "lijkwaar"), ("aandacht", "aandacht"),
        ("een", None), ("mogelijkheid", "molijk"),
        ("verhalen", "verhaal"), ("plaatsen", "plaats"),
        ("wedstrijden", "wedstrijd"), ("miljoen", "miljoen"),
        ("voor", None), ("gebruikt", "bruik"),
    ],
    # expected outputs from the reference's en/kstemTestData.zip vocabulary
    "english_kstem": [
        ("abatement", "abate"), ("abettors", "abet"),
        ("abdicated", "abdicate"), ("announcing", "announce"),
        ("dying", "die"), ("italians", "italy"),
        ("settlements", "settlement"), ("windows", "window"),
        ("computers", "computer"), ("quickly", "quick"),
        ("studies", "study"), ("carrying", "carry"),
        ("americanization", "americanize"), ("diversification", "diversify"),
        ("electronically", "electronic"), ("friendliness", "friendly"),
    ],
}


def _lang_corpus(sp: SparkSession, d: str, lang_name: str) -> DataFrame:
    words = [w for w, _ in _LANG_CHAIN_MAP[lang_name]]
    n_w = len(words)
    arr = F.array(*[F.lit(w) for w in words])
    n = (F.col("doc_id") % 9 + 3).cast("int")
    toks = F.transform(
        F.sequence(F.lit(0), n - F.lit(1)),
        lambda i: F.element_at(
            arr, ((F.col("doc_id") * 7 + i * 3) % n_w + 1).cast("int")
        ),
    )
    return _docs(sp, d).select(
        "doc_id", F.array_join(toks, " ").alias("text")
    )


def _lang_searcher(sp: SparkSession, d: str, lang_name: str) -> Searcher:
    key = f"{d}::lang::{lang_name}"
    if key not in _CACHE:
        idx = build_index(
            _lang_corpus(sp, d, lang_name),
            IndexConfig(chain=lang_name, seg_size=1 << 12),
            content_col="text", doc_id_col="doc_id", eager=True,
        )
        _CACHE[key] = Searcher(idx, dtype=np.float32)
    return _CACHE[key]


def _lang_term_sql(lang_name: str, term: str, k: int = 10) -> str:
    """BM25 top-k twin over the language fixture: the corpus construction
    mirrors _lang_corpus arithmetically; tokens map through the
    reference-data chain table (stem or NULL-stop per surface word), then
    the standard float64 BM25 tail."""
    pairs = _LANG_CHAIN_MAP[lang_name]
    n_w = len(pairs)
    # an output may be None (stop hole), a string, or a list of strings
    # (a decompounding chain emits several tokens for one surface word —
    # repeated i rows make the join yield one tok row per emitted token)
    rows = []
    for i, (_w, out) in enumerate(pairs):
        outs = [None] if out is None else (
            [out] if isinstance(out, str) else list(out)
        )
        for o in outs:
            rows.append(
                "({}, {})".format(
                    i, "NULL" if o is None else "'" + o.replace("'", "''") + "'"
                )
            )
    vals = ", ".join(rows)
    prelude = f"""
WITH w(i, term) AS (VALUES {vals}),
gen AS (
  SELECT doc_id, unnest(range((doc_id % 9) + 3)) AS pos FROM documents
),
tok AS (
  SELECT g.doc_id, w.term
  FROM gen g JOIN w ON w.i = (g.doc_id * 7 + g.pos * 3) % {n_w}
  WHERE w.term IS NOT NULL
),
{_BM25_TAIL}"""
    return prelude + _scored_cte([term]) + _rank_tail("score", "FROM sc", k)


def _cls_nb(sp: SparkSession, d: str) -> DataFrame:
    from lucene_spark.classification import SimpleNaiveBayesClassifier

    clf = SimpleNaiveBayesClassifier(_searcher(sp, d), _docs(sp, d), class_col="lang")
    inputs = sp.createDataFrame(_CLS_INPUTS, "input_id long, text string")
    return clf.classify_df(inputs)


def _cls_knn(sp: SparkSession, d: str) -> DataFrame:
    from lucene_spark.classification import KNearestNeighborClassifier

    docs = _docs(sp, d)
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.filter(F.col("doc_id").isin(_CLS_KNN_DOCS)).collect()
    }
    clf = KNearestNeighborClassifier(
        _searcher(sp, d), docs, class_col="lang", k=5,
        max_query_terms=5, min_doc_freq=2,
    )
    return clf.classify([texts[i] for i in _CLS_KNN_DOCS])


def _topk_df(s: Searcher, q: Query, k: int = 10) -> DataFrame:
    # rank on the ROUNDED score (ties -> doc_id): sums of floats differ by
    # ulps between engines (and across DuckDB's parallel agg orders), so a
    # 6-decimal tie must order deterministically; the +8 margin lets the
    # rounded re-rank pull in boundary docs the unrounded top-k order split
    top = s.search(q, k + 8)
    w = Window.orderBy(F.desc(F.round(F.col("score"), 6)), F.asc("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("rank").cast("int"),
            F.col("doc_id").cast("long"),
            F.round(F.col("score"), 6).alias("score"),
        )
        .orderBy("rank")
    )


def _rank_scored(top: DataFrame, k: int = 10) -> DataFrame:
    """Re-rank an already-scored frame on the ROUNDED score (ties ->
    doc_id) — the _topk_df convention for frames that arrive pre-limited
    (rescorers); pass a frame a few rows wider than k so the rounded
    re-rank can pull in boundary docs."""
    w = Window.orderBy(F.desc(F.round(F.col("score"), 6)), F.asc("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("rank").cast("int"),
            F.col("doc_id").cast("long"),
            F.round(F.col("score"), 6).alias("score"),
        )
        .orderBy("rank")
    )


def _docs_df(s: Searcher, q: Query) -> DataFrame:
    """Constant-score matches: sorted doc_ids."""
    return (
        s.matches(q)
        .select(F.col("doc_id").cast("long"))
        .distinct()
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# DuckDB oracle SQL scaffolding
# --------------------------------------------------------------------------

_TOKRE = duckdb_token_re()
_BPERE = ftext.BPE_RE.replace("'", "''")

# shared CTE prefix: tokens, tf, doc length, SmallFloat norm byte + decoded
# quantized length, collection stats (doc_count = all rows, matching the
# engine), per-term docFreq
# BM25 stats tail shared by every corpus prelude: consumes a `tok`
# (doc_id, term) CTE, produces tf/dl/nrm(SmallFloat)/dlq/stats/dfreq
_BM25_TAIL = """
tf AS (SELECT doc_id, term, count(*)::BIGINT AS freq FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS len FROM tok GROUP BY 1),
nrm AS (
  SELECT doc_id, len,
    CASE WHEN len < 24 THEN len
         WHEN (len - 24) < 8 THEN len
         ELSE 24 + ((((len - 24) >> (length(format('{:b}', len - 24)) - 4)) & 7)
                    | ((length(format('{:b}', len - 24)) - 3) << 3))
    END AS nb
  FROM dl
),
dlq AS (
  SELECT doc_id, nb,
    (CASE WHEN nb < 24 THEN nb
          WHEN ((nb - 24) >> 3) = 0 THEN nb
          ELSE 24 + ((((nb - 24) & 7) | 8) << (((nb - 24) >> 3) - 1))
     END)::DOUBLE AS dlq
  FROM nrm
),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT coalesce(sum(len), 0) FROM dl)::DOUBLE AS sttf
),
dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term)
"""

_PRELUDE = f"""
WITH tokarr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOKRE}') AS toks FROM documents
),
tok AS (
  SELECT doc_id, unnest(toks) AS term FROM tokarr
),
tokp AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos
  FROM tokarr
),
{_BM25_TAIL}"""

# BM25 building blocks (float64, same op order as the engine's f64 mode)
_IDF = "ln(1 + (s.n - {df} + 0.5) / ({df} + 0.5))"
_INV = "(1.0 / ({k1} * ((1 - {b}) + {b} * q.dlq / (s.sttf / s.n))))"


def _scored_cte(terms: list[str], boosts: dict[str, float] | None = None) -> str:
    """CTE `sc`: per-(doc, term) BM25 score for the given query terms."""
    boosts = boosts or {}
    lits = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    boost_case = "1.0"
    if boosts:
        cases = " ".join(
            f"WHEN tf.term = '{t}' THEN {v}" for t, v in boosts.items()
        )
        boost_case = f"CASE {cases} ELSE 1.0 END"
    idf = _IDF.format(df="d.df")
    inv = _INV.format(k1=K1, b=B)
    return f"""
, sc AS (
  SELECT tf.doc_id, tf.term,
         ({boost_case} * {idf}) - ({boost_case} * {idf}) / (1 + tf.freq * {inv}) AS score
  FROM tf
  JOIN dfreq d ON d.term = tf.term
  JOIN dlq q ON q.doc_id = tf.doc_id
  CROSS JOIN stats s
  WHERE tf.term IN ({lits})
)
"""


def _rank_tail(score_expr: str, from_clause: str, k: int = 10) -> str:
    # rank on the ROUNDED score (see _topk_df): 6-decimal ties order by
    # doc_id, immune to float-sum order differences across engines/threads
    return f"""
SELECT rank, doc_id, score FROM (
  SELECT row_number() OVER (ORDER BY round({score_expr}, 6) DESC, doc_id ASC)::INT AS rank,
         doc_id::BIGINT AS doc_id, round({score_expr}, 6) AS score
  {from_clause}
) WHERE rank <= {k} ORDER BY rank
"""


def _term_topk_sql(term: str, k: int = 10, boost: float = 1.0) -> str:
    boosts = {term: boost} if boost != 1.0 else None
    return (
        _PRELUDE
        + _scored_cte([term], boosts)
        + _rank_tail("score", "FROM sc", k)
    )


def _bool_topk_sql(
    must: list[str] = [],
    should: list[str] = [],
    must_not: list[str] = [],
    filters: list[str] = [],
    msm: int = 0,
    k: int = 10,
) -> str:
    scoring = list(dict.fromkeys(must + should))
    sql = _PRELUDE + _scored_cte(scoring)
    must_lits = ", ".join(f"'{t}'" for t in must)
    conds = []
    if must:
        conds.append(
            f"(SELECT count(DISTINCT term) FROM sc m WHERE m.doc_id = g.doc_id AND m.term IN ({must_lits})) = {len(must)}"
        )
    n_should_expr = None
    if should:
        sh_lits = ", ".join(f"'{t}'" for t in should)
        n_should_expr = f"(SELECT count(DISTINCT term) FROM sc m WHERE m.doc_id = g.doc_id AND m.term IN ({sh_lits}))"
        need = msm if must else max(msm, 1)
        if need > 0:
            conds.append(f"{n_should_expr} >= {need}")
    for t in must_not:
        conds.append(
            f"NOT EXISTS (SELECT 1 FROM tf x WHERE x.doc_id = g.doc_id AND x.term = '{t}')"
        )
    for t in filters:
        conds.append(
            f"EXISTS (SELECT 1 FROM tf x WHERE x.doc_id = g.doc_id AND x.term = '{t}')"
        )
    where = (" WHERE " + " AND ".join(conds)) if conds else ""
    sql += f"""
, agg AS (
  SELECT doc_id, sum(score) AS score FROM sc GROUP BY doc_id
),
matched AS (
  SELECT g.doc_id, g.score FROM agg g{where}
)
"""
    return sql + _rank_tail("score", "FROM matched", k)


def _covering_sql() -> str:
    """CoveringQuery oracle: per-doc matching-term count vs the doc-values
    minimum (>= 1 floor); score = sum of matching BM25 scores."""
    return (
        _PRELUDE
        + _scored_cte(["spark", "merge", "vector"])
        + """
, agg AS (
  SELECT doc_id, count(*) AS cnt, sum(score) AS score FROM sc GROUP BY doc_id
),
cov AS (
  SELECT a.doc_id, a.score
  FROM agg a JOIN documents d ON d.doc_id = a.doc_id
  WHERE a.cnt >= greatest(CASE WHEN d.n_chars > 2000 THEN 2 ELSE 1 END, 1)
)
"""
        + _rank_tail("score", "FROM cov", 10)
    )


def _function_score_sql() -> str:
    """FunctionScoreQuery oracle: float64 BM25 OR sum rescored by the
    expression 0.3*score + 0.7*sqrt(n_chars) + (n_chars > 2000 ? 0.5 : 0),
    with the reference's missing/negative/NaN -> 0 guard."""
    return (
        _PRELUDE
        + _scored_cte(["spark", "merge"])
        + """
, agg AS (SELECT doc_id, sum(score) AS score FROM sc GROUP BY doc_id),
fs0 AS (
  SELECT a.doc_id,
         0.3 * a.score + 0.7 * sqrt(d.n_chars)
           + (CASE WHEN d.n_chars > 2000 THEN 0.5 ELSE 0.0 END) AS v
  FROM agg a JOIN documents d ON d.doc_id = a.doc_id
),
fsc AS (SELECT doc_id, CASE WHEN v >= 0 THEN v ELSE 0.0 END AS score FROM fs0)
"""
        + _rank_tail("score", "FROM fsc", 10)
    )


def _function_score_boost_query_sql() -> str:
    """boostByQuery shape: 'spark' BM25 x 1.5 where the doc also matches
    'fast' (the Query binding's score is > 0 exactly when it matches)."""
    return (
        _PRELUDE
        + _scored_cte(["spark"])
        + """
, agg AS (SELECT doc_id, sum(score) AS score FROM sc GROUP BY doc_id),
fsc AS (
  SELECT a.doc_id,
         a.score * (CASE WHEN EXISTS (
             SELECT 1 FROM tf x WHERE x.doc_id = a.doc_id AND x.term = 'fast'
         ) THEN 1.5 ELSE 1.0 END) AS score
  FROM agg a
)
"""
        + _rank_tail("score", "FROM fsc", 10)
    )


def _rescore_query_sql() -> str:
    """QueryRescorer oracle: constant-score (1.0) first pass = the 50
    lowest doc_ids matching 'spark'; combined = 1.0 + 2.0 * bm25('fast')
    where the second query matches (QueryRescorer.rescore combine)."""
    return (
        _PRELUDE
        + _scored_cte(["fast"])
        + """
, fp AS (
  SELECT DISTINCT doc_id FROM tf WHERE term = 'spark' ORDER BY doc_id LIMIT 50
),
agg AS (SELECT doc_id, sum(score) AS score FROM sc GROUP BY doc_id),
fsc AS (
  SELECT f.doc_id, 1.0 + 2.0 * coalesce(a.score, 0.0) AS score
  FROM fp f LEFT JOIN agg a ON a.doc_id = f.doc_id
)
"""
        + _rank_tail("score", "FROM fsc", 10)
    )


def _rescore_expression_sql() -> str:
    """ExpressionRescorer oracle: same deterministic first pass re-sorted
    by sqrt(n_chars) - 50 + 0.1*score (score = the constant 1.0 first-pass
    score; no FunctionScoreQuery guard, negatives rank)."""
    return (
        _PRELUDE
        + """
, fp AS (
  SELECT DISTINCT doc_id FROM tf WHERE term = 'spark' ORDER BY doc_id LIMIT 50
),
fsc AS (
  SELECT f.doc_id, sqrt(d.n_chars) - 50 + 0.1 * 1.0 AS score
  FROM fp f JOIN documents d ON d.doc_id = f.doc_id
)
"""
        + _rank_tail("score", "FROM fsc", 10)
    )


def _const_docs_sql(term_pred: str) -> str:
    """doc_ids containing any term satisfying term_pred (on alias t.term)."""
    return (
        _PRELUDE
        + f"""
SELECT DISTINCT doc_id::BIGINT AS doc_id FROM tf t WHERE {term_pred} ORDER BY doc_id
"""
    )


# --------------------------------------------------------------------------
# Query terms chosen from the documents vocabulary (see TESTDATA.md): common
# terms 'a'/'the'/'table', mid 'spark'/'vector'/'merge', etc.
# --------------------------------------------------------------------------


def _q_filter_cached(sp: SparkSession, d: str) -> DataFrame:
    """q_filter with the filter doc-set served through the LRUQueryCache
    analog (querycache.py): a dedicated Searcher (so the shared memoized
    one stays cache-free), three uses of the same costly PrefixQuery
    filter — the policy caches it at use 2, use 3 reads the persisted
    doc-set. Results must be hash-identical to the uncached SQL twin."""
    from lucene_spark.querycache import LRUQueryCache

    base = _searcher(sp, d)
    s = Searcher(
        base.index,
        dtype=np.float64,
        query_cache=LRUQueryCache(min_docs_to_cache=0),
    )
    q = bool_query(
        must=[TermQuery(term="table")], filter=[PrefixQuery(prefix="sp")]
    )
    _topk_df(s, q, 10).collect()  # use 1: policy records the filter
    _topk_df(s, q, 10).collect()  # use 2: doc-set cached (costly => 2)
    return _topk_df(s, q, 10)  # served from the cached persisted set


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multi-term BM25 disjunction top-10 on sf0.001."""
    s = _searcher(spark, "/root/testdata/sf0.001")
    q = bool_query(should=[TermQuery(term=t) for t in ("spark", "vector", "merge")])
    return _topk_df(s, q, 10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def term(t, k=10, boost=1.0):
        return lambda sp, d: _topk_df(
            _searcher(sp, d), TermQuery(term=t, boost=boost), k
        )

    def booln(must=(), should=(), must_not=(), filters=(), msm=0, k=10):
        q = bool_query(
            must=[TermQuery(term=t) for t in must],
            should=[TermQuery(term=t) for t in should],
            must_not=[TermQuery(term=t) for t in must_not],
            filter=[TermQuery(term=t) for t in filters],
            msm=msm,
        )
        return lambda sp, d: _topk_df(_searcher(sp, d), q, k)

    def const_docs(q):
        return lambda sp, d: _docs_df(_searcher(sp, d), q)

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        # ---- term & boolean scoring family (SURVEY §2.4/§2.5) ----
        "q_term": term("spark"),
        "q_term_common": term("table"),
        "q_term_boost": term("vector", boost=2.5),
        "q_bool_and": booln(must=("spark", "vector")),
        "q_bool_or": booln(should=("spark", "merge", "vector")),
        "q_req_opt": booln(must=("query",), should=("spark", "merge")),
        "q_req_excl": booln(must=("query",), must_not=("spark",)),
        "q_msm": booln(should=("spark", "merge", "vector"), msm=2),
        "q_filter": booln(must=("table",), filters=("spark",)),
        # same result through the LRUQueryCache analog: the costly prefix
        # filter's doc-set is cached on its 2nd use (UsageTracking policy)
        # and the returned frame is served from the cached persisted set —
        # caching must be invisible in the results (querycache.py)
        "q_filter_cached": _q_filter_cached,
        "q_and3_hot": booln(must=("a", "the", "table")),
        # ---- phrase / positional (positions) ----
        "q_phrase": lambda sp, d: _topk_df(
            _searcher(sp, d), PhraseQuery(terms=("fast", "table")), 10
        ),
        "q_multi_phrase": lambda sp, d: _topk_df(
            _searcher(sp, d),
            MultiPhraseQuery(slots=(("fast", "slow"), ("table",))),
            10,
        ),
        "q_phrase_slop2": lambda sp, d: _topk_df(
            _searcher(sp, d), PhraseQuery(terms=("fast", "table"), slop=2), 10
        ),
        "q_phrase_stop_holes": lambda sp, d: _topk_df(
            # StopFilter hole semantics end-to-end: stopwords drop from the
            # index (stats shrink) but positions keep their holes, so the
            # sloppy matcher sees the pre-filter gaps
            _stop_searcher(sp, d), PhraseQuery(terms=("fast", "table"), slop=2), 10
        ),
        "q_phrase_slop_rpts": lambda sp, d: _topk_df(
            # repeated-term sloppy phrase: SloppyPhraseMatcher hasRpts path
            # (repeat groups + collision resolution, matchers.py)
            _searcher(sp, d),
            PhraseQuery(terms=("table", "the", "table"), slop=3),
            10,
        ),
        "q_multi_phrase_slop": lambda sp, d: _topk_df(
            # sloppy MultiPhraseQuery (setSlop): SloppyPhraseMatcher over
            # per-slot UnionPostingsEnum streams, no repeats
            _searcher(sp, d),
            MultiPhraseQuery(slots=(("fast", "slow"), ("table",)), slop=2),
            10,
        ),
        "q_multi_phrase_slop_rpts": lambda sp, d: _topk_df(
            # multi-term repeats (hasMultiTermRpts): slot 0's 'fast'
            # repeats in slot 2 through a multi-term slot — tpPos
            # collisions + the advanceRepeatGroups collide-chase init
            _searcher(sp, d),
            MultiPhraseQuery(
                slots=(("fast", "slow"), ("table",), ("fast",)), slop=3
            ),
            10,
        ),
        "q_span_near_ordered": lambda sp, d: _topk_df(
            _searcher(sp, d),
            SpanNearQuery(terms=("spark", "table"), slop=4, in_order=True),
            10,
        ),
        "q_span_near_ordered3": lambda sp, d: _topk_df(
            _searcher(sp, d),
            SpanNearQuery(terms=("the", "fast", "table"), slop=6, in_order=True),
            10,
        ),
        "q_span_near_unordered": lambda sp, d: _topk_df(
            _searcher(sp, d),
            SpanNearQuery(terms=("spark", "table"), slop=4, in_order=False),
            10,
        ),
        "q_span_near_multiterm": lambda sp, d: _topk_df(
            # SpanMultiTermQueryWrapper: a prefix clause expands to a
            # SpanOr over matching dictionary terms inside the near
            _searcher(sp, d),
            SpanNearQuery(
                terms=(IntervalMultiTerm(kind="prefix", pattern="s"), "table"),
                slop=3,
                in_order=True,
            ),
            10,
        ),
        "q_phrase_wildcard": lambda sp, d: _topk_df(
            # PhraseWildcardQuery (sandbox): exact-adjacent phrase with a
            # wildcard slot = ordered slop-0 span over the expansion
            _searcher(sp, d),
            SpanNearQuery(
                terms=("fast", IntervalMultiTerm(kind="wildcard", pattern="t*e")),
                slop=0,
                in_order=True,
            ),
            10,
        ),
        "q_span_near_or_slot": lambda sp, d: _topk_df(
            # SpanOr nested in SpanNear with explicit alternatives
            _searcher(sp, d),
            SpanNearQuery(
                terms=(("fast", "slow"), "table"), slop=4, in_order=True
            ),
            10,
        ),
        "q_intervals_ordered": lambda sp, d: _topk_df(
            _searcher(sp, d),
            IntervalQuery(terms=("the", "fast", "table"), ordered=True, max_gaps=8),
            10,
        ),
        "q_intervals_unordered": lambda sp, d: _topk_df(
            _searcher(sp, d),
            IntervalQuery(terms=("spark", "table"), ordered=False),
            10,
        ),
        # ---- duplicate-term spans / intervals (RepeatingIntervalsSource
        # dedup + tie-tolerant NearSpansUnordered walk) ----
        "q_span_unordered_dup": lambda sp, d: _topk_df(
            _searcher(sp, d),
            SpanNearQuery(terms=("table", "table"), slop=2, in_order=False),
            10,
        ),
        "q_span_unordered_dup3": lambda sp, d: _topk_df(
            _searcher(sp, d),
            SpanNearQuery(terms=("table", "the", "table"), slop=5, in_order=False),
            10,
        ),
        "q_intervals_unordered_dup": lambda sp, d: _topk_df(
            _searcher(sp, d),
            IntervalQuery(terms=("table", "table"), ordered=False, max_gaps=3),
            10,
        ),
        "q_intervals_unordered_dup3": lambda sp, d: _topk_df(
            _searcher(sp, d),
            IntervalQuery(terms=("table", "the", "table"), ordered=False, max_gaps=6),
            10,
        ),
        "q_intervals_ordered_dup": lambda sp, d: _topk_df(
            _searcher(sp, d),
            IntervalQuery(terms=("table", "the", "table"), ordered=True, max_gaps=8),
            10,
        ),
        # ---- interval filter algebra (containing / overlapping / before…) ----
        "q_intervals_containing": lambda sp, d: _topk_df(
            _searcher(sp, d),
            IntervalFilterQuery(
                kind="containing",
                source=IntervalQuery(terms=("fast", "table"), ordered=False),
                reference=IntervalQuery(terms=("the",)),
            ),
            10,
        ),
        "q_intervals_not_containing": lambda sp, d: _topk_df(
            _searcher(sp, d),
            IntervalFilterQuery(
                kind="not_containing",
                source=IntervalQuery(terms=("fast", "table"), ordered=False),
                reference=IntervalQuery(terms=("the",)),
            ),
            10,
        ),
        "q_intervals_contained_by": lambda sp, d: _topk_df(
            _searcher(sp, d),
            IntervalFilterQuery(
                kind="contained_by",
                source=IntervalQuery(terms=("fast",)),
                reference=IntervalQuery(terms=("the", "table"), ordered=False),
            ),
            10,
        ),
        "q_intervals_not_contained_by": lambda sp, d: _topk_df(
            _searcher(sp, d),
            IntervalFilterQuery(
                kind="not_contained_by",
                source=IntervalQuery(terms=("fast",)),
                reference=IntervalQuery(terms=("the", "table"), ordered=False),
            ),
            10,
        ),
        "q_intervals_overlapping": lambda sp, d: _topk_df(
            _searcher(sp, d),
            IntervalFilterQuery(
                kind="overlapping",
                source=IntervalQuery(terms=("fast", "table"), ordered=False),
                reference=IntervalQuery(terms=("the", "value"), ordered=False),
            ),
            10,
        ),
        "q_intervals_non_overlapping": lambda sp, d: _topk_df(
            _searcher(sp, d),
            IntervalFilterQuery(
                kind="non_overlapping",
                source=IntervalQuery(terms=("fast", "table"), ordered=False),
                reference=IntervalQuery(terms=("the", "value"), ordered=False),
            ),
            10,
        ),
        "q_intervals_before": lambda sp, d: _topk_df(
            _searcher(sp, d),
            IntervalFilterQuery(
                kind="before",
                source=IntervalQuery(terms=("fast",)),
                reference=IntervalQuery(terms=("table",)),
            ),
            10,
        ),
        "q_intervals_after": lambda sp, d: _topk_df(
            _searcher(sp, d),
            IntervalFilterQuery(
                kind="after",
                source=IntervalQuery(terms=("table",)),
                reference=IntervalQuery(terms=("fast",)),
            ),
            10,
        ),
        "q_intervals_or_slot": lambda sp, d: _topk_df(
            # Intervals.or nested in an ordered source: slot 0 matches
            # fast OR slow (union of point positions)
            _searcher(sp, d),
            IntervalQuery(
                terms=(("fast", "slow"), "table"), ordered=True, max_gaps=5
            ),
            10,
        ),
        # ---- multi-term interval sources (Intervals.prefix/wildcard/
        # fuzzyTerm -> MultiTermIntervalsSource, expansion-capped) ----
        "q_intervals_regexp": lambda sp, d: _topk_df(
            # Intervals.multiterm with a Lucene RegExp automaton slot
            _searcher(sp, d),
            IntervalQuery(
                terms=(
                    IntervalMultiTerm(kind="regexp", pattern="t[ae]bles?"),
                    "fast",
                ),
                ordered=False,
                max_gaps=6,
            ),
            10,
        ),
        "q_intervals_prefix": lambda sp, d: _topk_df(
            _searcher(sp, d),
            IntervalQuery(
                terms=("fast", IntervalMultiTerm(kind="prefix", pattern="s")),
                ordered=True,
                max_gaps=6,
            ),
            10,
        ),
        "q_intervals_wildcard": lambda sp, d: _topk_df(
            _searcher(sp, d),
            IntervalQuery(
                terms=(IntervalMultiTerm(kind="wildcard", pattern="*ow"), "table"),
                ordered=False,
                max_gaps=5,
            ),
            10,
        ),
        "q_intervals_fuzzy": lambda sp, d: _topk_df(
            # 'tbale'~1 reaches 'table' only through the OSA transposition
            _searcher(sp, d),
            IntervalQuery(
                terms=(
                    "the",
                    IntervalMultiTerm(kind="fuzzy", pattern="tbale", max_edits=1),
                ),
                ordered=True,
                max_gaps=8,
            ),
            10,
        ),
        # ---- Intervals.extend / Intervals.atLeast ----
        "q_intervals_extend": lambda sp, d: _topk_df(
            _searcher(sp, d),
            ExtendedIntervalQuery(
                source=IntervalQuery(
                    terms=("fast", "table"), ordered=True, max_gaps=4
                ),
                before=1,
                after=2,
            ),
            10,
        ),
        "q_intervals_atleast": lambda sp, d: _topk_df(
            _searcher(sp, d),
            AtLeastIntervalQuery(
                terms=("spark", "table", "fast", "data"),
                min_should_match=3,
                max_gaps=6,
            ),
            10,
        ),
        "q_intervals_atleast_or_slot": lambda sp, d: _topk_df(
            _searcher(sp, d),
            AtLeastIntervalQuery(
                terms=(("fast", "slow"), "table", "merge"),
                min_should_match=2,
            ),
            10,
        ),
        "q_intervals_or_slot_unordered": lambda sp, d: _topk_df(
            _searcher(sp, d),
            IntervalQuery(
                terms=(("fast", "slow"), ("table", "value")),
                ordered=False,
                max_gaps=6,
            ),
            10,
        ),
        # ---- Intervals.maxwidth / within / notWithin / unorderedNoOverlaps ----
        "q_intervals_maxwidth": lambda sp, d: _topk_df(
            _searcher(sp, d),
            IntervalQuery(
                terms=("the", "fast", "table"), ordered=False, max_width=7
            ),
            10,
        ),
        "q_intervals_within": lambda sp, d: _topk_df(
            _searcher(sp, d),
            IntervalFilterQuery(
                kind="within",
                source=IntervalQuery(terms=("fast", "table"), ordered=False),
                reference=IntervalQuery(terms=("the",)),
                positions=2,
            ),
            10,
        ),
        "q_intervals_not_within": lambda sp, d: _topk_df(
            _searcher(sp, d),
            IntervalFilterQuery(
                kind="not_within",
                source=IntervalQuery(terms=("fast", "table"), ordered=False),
                reference=IntervalQuery(terms=("the",)),
                positions=2,
            ),
            10,
        ),
        "q_intervals_no_overlaps": lambda sp, d: _topk_df(
            _searcher(sp, d),
            NoOverlapsIntervalQuery(a="fast", b="table"),
            10,
        ),
        "q_intervals_filter_maxwidth": lambda sp, d: _topk_df(
            # maxwidth-filtered SOURCE operand inside the filter algebra
            _searcher(sp, d),
            IntervalFilterQuery(
                kind="containing",
                source=IntervalQuery(
                    terms=("fast", "table"), ordered=False, max_width=8
                ),
                reference=IntervalQuery(terms=("the",)),
            ),
            10,
        ),
        "q_intervals_containing_or_slot": lambda sp, d: _topk_df(
            # Intervals.or alternation INSIDE a filter operand: the source
            # slot matches fast OR slow
            _searcher(sp, d),
            IntervalFilterQuery(
                kind="containing",
                source=IntervalQuery(
                    terms=(("fast", "slow"), "table"), ordered=False
                ),
                reference=IntervalQuery(terms=("the",)),
            ),
            10,
        ),
        "q_intervals_ordered_dup_adj": lambda sp, d: _topk_df(
            # adjacent repeat collapses to a RepeatingIntervalsSource run:
            # minExtent 2, gaps still count all three positions
            _searcher(sp, d),
            IntervalQuery(terms=("the", "table", "table"), ordered=True, max_gaps=6),
            10,
        ),
        "q_span_containing": lambda sp, d: _topk_df(
            _searcher(sp, d),
            SpanContainQuery(
                kind="containing",
                big=SpanNearQuery(terms=("the", "table"), slop=6, in_order=True),
                little="fast",
            ),
            10,
        ),
        "q_span_within": lambda sp, d: _topk_df(
            _searcher(sp, d),
            SpanContainQuery(
                kind="within",
                big=SpanNearQuery(terms=("the", "table"), slop=8, in_order=False),
                little="fast",
            ),
            10,
        ),
        "q_span_or": lambda sp, d: _topk_df(
            _searcher(sp, d), SpanOrQuery(terms=("spark", "merge")), 10
        ),
        "q_span_not": lambda sp, d: _topk_df(
            _searcher(sp, d),
            SpanNotQuery(include="table", exclude=("fast",), pre=1, post=1),
            10,
        ),
        "q_span_not_span_exclude": lambda sp, d: _topk_df(
            # exclude operand is a SPAN (the ComplexPhrase negative shape)
            _searcher(sp, d),
            SpanNotQuery(
                include="fast",
                exclude=(SpanNearQuery(terms=("slow", "table"), slop=0,
                                       in_order=True),),
                pre=1, post=1,
            ),
            10,
        ),
        "q_span_first": lambda sp, d: _topk_df(
            _searcher(sp, d), SpanFirstQuery(term="spark", end=5), 10
        ),
        "q_span_pos_range": lambda sp, d: _topk_df(
            # SpanPositionRangeQuery: point spans kept iff start <= p and
            # p + 1 <= end (SpanFirst = the start=0 specialization)
            _searcher(sp, d),
            SpanPositionRangeQuery(match="table", start=3, end=25),
            10,
        ),
        "q_span_pos_range_near": lambda sp, d: _topk_df(
            # position-range over NearSpansOrdered match windows
            _searcher(sp, d),
            SpanPositionRangeQuery(
                match=SpanNearQuery(terms=("fast", "table"), slop=4,
                                    in_order=True),
                start=0, end=30,
            ),
            10,
        ),
        "q_span_masked_stop": lambda sp, d: _topk_df(
            # FieldMaskingSpanQuery: the span query runs ON the
            # stop-filtered field (its norms, avgdl, collection stats) but
            # the 'the' clause streams positions from the UNFILTERED text
            # field — the reference's canonical trick for matching
            # stopped-out terms (position holes keep the ordinals aligned)
            _masked_stop_searcher(sp, d),
            SpanNearQuery(
                terms=(FieldMaskedTerm(field="text", term="the"), "fast"),
                slop=1, in_order=True,
            ),
            10,
        ),
        "q_intervals_fixfield": lambda sp, d: _topk_df(
            # Intervals.fixField: the interval query runs on the
            # stop-filtered field but the 'the' slot streams positions from
            # the UNFILTERED text field (hole-preserved ordinals compare
            # directly) — the intervals twin of q_span_masked_stop
            _masked_stop_searcher(sp, d),
            IntervalQuery(
                terms=(FieldMaskedTerm(field="text", term="the"), "fast"),
                ordered=True,
                max_gaps=3,
            ),
            10,
        ),
        "q_intervals_fixfield_or": lambda sp, d: _topk_df(
            # Intervals.or over fixField sources in one slot: the|a stream
            # from the unfiltered text field, 'fast' from the stop field
            _masked_stop_searcher(sp, d),
            IntervalQuery(
                terms=(
                    (
                        FieldMaskedTerm(field="text", term="the"),
                        FieldMaskedTerm(field="text", term="a"),
                    ),
                    "fast",
                ),
                ordered=True,
                max_gaps=4,
            ),
            10,
        ),
        "q_combined_field": lambda sp, d: _topk_df(
            # CombinedFieldQuery (BM25F): 'en' scored against the
            # synthetic text+lang field, lang weighted 2x
            _multifield_searcher(sp, d),
            CombinedFieldQuery(
                term="en", fields=(("text", 1.0), ("lang", 2.0))
            ),
            10,
        ),
        # ---- multi-field (field-qualified) search ----
        "q_multifield": lambda sp, d: _multifield_topk(sp, d),
        "q_multifield_bare": lambda sp, d: _topk_df(
            # MultiFieldQueryParser: a BARE term expands across every field
            _multifield_searcher(sp, d), parse_multifield("en", ["text", "lang"]), 10
        ),
        # ---- snippet highlighting (highlighter module analog) ----
        "text_highlight": lambda sp, d: (
            fhigh.highlight(_docs(sp, d), "doc_id", "text", ["spark", "merge"])
            .orderBy("doc_id")
        ),
        "text_highlight_unified": lambda sp, d: fhigh.unified_highlight(
            _docs(sp, d), "doc_id", "text", ["spark", "merge"], window_tokens=16
        ),
        # ---- feature boosting (static doc signal + relevance) ----
        "q_feature_boost": lambda sp, d: _topk_df(
            _searcher(sp, d),
            bool_query(
                should=[
                    TermQuery(term="spark"),
                    FeatureQuery(feature="n_chars", boost=0.05),
                ]
            ),
            10,
        ),
        "q_covering": lambda sp, d: _topk_df(
            # CoveringQuery: per-doc dynamic minimumShouldMatch — long
            # docs (n_chars > 2000) must match 2 of the 3 terms, short
            # docs 1
            _searcher(sp, d),
            CoveringQuery(
                queries=(
                    TermQuery(term="spark"),
                    TermQuery(term="merge"),
                    TermQuery(term="vector"),
                ),
                min_match_expr="CASE WHEN n_chars > 2000 THEN 2 ELSE 1 END",
            ),
            10,
        ),
        # ---- block join (nested docs: lineitems under their order) ----
        "q_block_join_parent_max": lambda sp, d: _topk_df(
            _block_searcher(sp, d)[0],
            ToParentBlockJoinQuery(
                child=TermQuery(term="spark"),
                parents=TermQuery(term="zzblockparentzz"),
                score_mode="max",
            ),
            10,
        ),
        "q_block_join_parent_avg": lambda sp, d: _topk_df(
            _block_searcher(sp, d)[0],
            ToParentBlockJoinQuery(
                child=TermQuery(term="merge"),
                parents=TermQuery(term="zzblockparentzz"),
                score_mode="avg",
            ),
            10,
        ),
        "q_block_join_child": lambda sp, d: _topk_df(
            _block_searcher(sp, d)[0],
            ToChildBlockJoinQuery(
                parent=ToParentBlockJoinQuery(
                    child=TermQuery(term="spark"),
                    parents=TermQuery(term="zzblockparentzz"),
                    score_mode="max",
                ),
                parents=TermQuery(term="zzblockparentzz"),
                do_scores=True,
            ),
            10,
        ),
        "q_block_join_children_of": _block_children_of,
        # ---- FastVectorHighlighter: offset-driven fragments ----
        "q_fvh_fragments": lambda sp, d: (
            ffvh.fvh_highlight(
                _docs(sp, d), "doc_id", "text", [TermQuery(term="spark")],
                frag_char_size=60, top_n=1000, sort_by_score=False,
            )
            .select("doc_id", F.col("frag_no").cast("long"),
                    "frag_start", "frag_end",
                    F.col("score").cast("long").alias("cnt"))
            .orderBy("doc_id", "frag_no")
        ),
        # ---- RandomSamplingFacetsCollector: xorshift bin sampling ----
        "q_facet_sampled": _facet_sampled,
        # ---- FunctionRangeQuery: expression-valued range + score ----
        "q_function_range": lambda sp, d: _topk_df(
            _searcher(sp, d),
            FunctionRangeQuery(
                value_expr="sqrt(n_chars) * 2", lower=40.0, upper=80.0,
                include_upper=False,
            ),
            10,
        ),
        # ---- StandardQueryParser: PointsConfig numeric ranges ----
        "q_standard_points": lambda sp, d: _topk_df(
            _searcher(sp, d),
            standard_parse(
                "spark AND n_chars:[500 TO 1500}",
                points_config={"n_chars": int},
            ),
            10,
        ),
        # ---- FuzzyLikeThisQuery: fuzzy MLT over misspelled input ----
        "q_fuzzy_like_this": lambda sp, d: _topk_df(
            _searcher(sp, d),
            _searcher(sp, d).fuzzy_like_this(
                "sprak tabel", max_edits=1, max_num_terms=10
            ),
            10,
        ),
        # ---- LM quality: stupid-backoff perplexity over the bigram LM ----
        "text_lm_quality": lambda sp, d: (
            ftext.lm_quality(_docs(sp, d), _free_text_model(sp, d))
            .select(
                "doc_id", "n_bigrams",
                F.round("avg_logprob", 6).alias("avg_logprob"),
                F.round("perplexity", 6).alias("perplexity"),
            )
            .orderBy("doc_id")
        ),
        # ---- dedup clustering: connected components over dup pairs ----
        "dedup_connected_components": _dedup_cc_entry,
        # ---- XML query parser: CoreParser element DSL ----
        "q_xml_parsed": lambda sp, d: _topk_df(
            _searcher(sp, d),
            xml_parse(
                """
                <BooleanQuery>
                  <Clause occurs="must"><TermQuery>spark</TermQuery></Clause>
                  <Clause><SpanNear slop="2" inOrder="true">
                    <SpanTerm>fast</SpanTerm><SpanTerm>table</SpanTerm>
                  </SpanNear></Clause>
                </BooleanQuery>
                """
            ),
            10,
        ),
        # ---- surround parser: W/N proximity language ----
        "q_surround": lambda sp, d: _topk_df(
            _searcher(sp, d),
            surround_parse("3W(scan, OR(fast, slow))"),
            10,
        ),
        # ---- HighFreqTerms (misc): top-k dictionary terms by stats ----
        "q_high_freq_terms": lambda sp, d: _searcher(sp, d).high_freq_terms(
            15, by="total_term_freq"
        ),
        # ---- ComplexPhraseQueryParser: wildcards/alternations in phrases --
        "q_complex_phrase": lambda sp, d: _topk_df(
            _searcher(sp, d),
            complex_phrase_parse('"(fast slow) tab*"~3'),
            10,
        ),
        # ---- TermAutomatonQuery: token-level automaton (fast ? table) ----
        "q_term_automaton": lambda sp, d: _topk_df(
            _searcher(sp, d), _fast_any_table_automaton(), 10
        ),
        # ---- SweetSpotSimilarity / DocValuesStats / distance sort ----
        "q_sim_sweetspot": lambda sp, d: _topk_df(
            _sweetspot_searcher(sp, d), TermQuery(term="spark"), 10
        ),
        "q_dv_stats": lambda sp, d: (
            fdv.doc_values_stats(
                _searcher(sp, d).matches(TermQuery(term="spark")),
                _searcher(sp, d).index.docs,
                "n_chars",
            ).select(
                "cnt", "missing",
                F.col("mn").cast("long"), F.col("mx").cast("long"),
                F.col("total").cast("long"),
                F.round("mean", 6).alias("mean"),
                F.round("variance", 6).alias("variance"),
                F.round("stdev", 6).alias("stdev"),
            )
        ),
        "q_geo_distance_sort": lambda sp, d: (
            fgeo.distance_sort(
                sp.read.parquet(os.path.join(d, "customer.parquet")).select(
                    F.col("c_custkey").cast("long").alias("doc_id"),
                    ((F.col("c_custkey") * 7 % 180) - 90 + 0.5)
                    .cast("double").alias("lat"),
                    ((F.col("c_custkey") * 13 % 360) - 180 + 0.5)
                    .cast("double").alias("lon"),
                ),
                "lat", "lon", 10.0, 20.0, 10,
            ).select("doc_id", F.round("distance_m", 6).alias("distance_m"))
        ),
        # ---- IndexSortSortedNumericDocValuesRangeQuery ----
        "q_index_sort_range": lambda sp, d: _docs_df(
            _sorted_searcher(sp, d),
            IndexSortRangeQuery(field_col="n_chars", lower=500, upper=1500),
        ),
        # ---- FreeTextSuggester: stupid-backoff ngram LM ----
        "q_free_text_next_word": lambda sp, d: _free_text_entry(sp, d, "fast "),
        "q_free_text_backoff": lambda sp, d: _free_text_entry(sp, d, "fast t"),
        # ---- SimpleQueryParser (fail-soft web-search syntax) ----
        "q_simple_parsed": lambda sp, d: _topk_df(
            _searcher(sp, d),
            simple_parse("merge+table -slow", default_operator=Occur.MUST),
            10,
        ),
        "q_simple_parsed_prefix_phrase": lambda sp, d: _topk_df(
            _searcher(sp, d),
            simple_parse('"fast table" | vect*', default_operator=Occur.MUST),
            10,
        ),
        # ---- LongValueFacetCounts + association facets ----
        "q_facet_long_values": lambda sp, d: ffacets.long_value_counts(
            _searcher(sp, d).matches(TermQuery(term="spark")),
            _searcher(sp, d).index.docs,
            "n_chars % 16",
            top_n=10,
        ),
        "q_facet_assoc_sum": lambda sp, d: ffacets.sum_associations(
            _searcher(sp, d).matches(TermQuery(term="spark")),
            _docs(sp, d).select(
                "doc_id",
                F.col("lang").alias("cat"),
                (F.col("n_chars") % 100).alias("value"),
            ),
        ),
        # ---- DiversifiedTopDocsCollector: per-key-capped top-k ----
        "q_diversified_topk": lambda sp, d: _rank_scored(
            _searcher(sp, d).diversified_topk(
                _searcher(sp, d)
                .matches(TermQuery(term="spark"))
                .select("doc_id", F.round(F.col("score"), 6).alias("score")),
                10, 2, key_expr="n_chars % 7",
            ),
            10,
        ),
        # ---- BlendedTermQuery: blended statistics across terms ----
        "q_blended_term": lambda sp, d: _topk_df(
            _searcher(sp, d),
            BlendedTermQuery(
                terms=("spark", "merge"), boosts=(1.0, 2.0),
                tie_breaker=0.1, rewrite="dismax",
            ),
            10,
        ),
        # ---- JoinUtil: query-time term join (self-join on lang) ----
        "q_join_util_avg": lambda sp, d: _rank_scored(
            fjoin.term_join(
                _searcher(sp, d), "lang", TermQuery(term="spark"),
                _searcher(sp, d), "lang", "avg",
            ),
            10,
        ),
        "q_join_util_max": lambda sp, d: _rank_scored(
            fjoin.term_join(
                _searcher(sp, d), "lang", TermQuery(term="merge"),
                _searcher(sp, d), "lang", "max",
            ),
            10,
        ),
        # ---- compiled scoring expressions (expressions/js + FunctionScoreQuery) ----
        "q_function_score": lambda sp, d: _topk_df(
            _searcher(sp, d),
            FunctionScoreQuery(
                query=bool_query(
                    should=[TermQuery(term="spark"), TermQuery(term="merge")]
                ),
                expression="0.3*score + 0.7*sqrt(nc) + (nc > 2000 ? 0.5 : 0.0)",
                bindings=(("score", SCORE), ("nc", "n_chars")),
            ),
            10,
        ),
        "q_function_score_boost_query": lambda sp, d: _topk_df(
            # boostByQuery shape: x1.5 where the boost query matches
            _searcher(sp, d),
            FunctionScoreQuery(
                query=TermQuery(term="spark"),
                expression="score * (b != 0 ? 1.5 : 1.0)",
                bindings=(("score", SCORE), ("b", TermQuery(term="fast"))),
            ),
            10,
        ),
        # QueryRescorer / ExpressionRescorer: constant-score first pass
        # (top-50 = the 50 lowest doc_ids matching 'spark' — tie order
        # deterministic on BOTH engines), second pass re-ranks only those
        "q_rescore_query": lambda sp, d: _rank_scored(
            _searcher(sp, d).rescore_query(
                ConstantScoreQuery(query=TermQuery(term="spark")),
                TermQuery(term="fast"),
                weight=2.0,
                first_pass_k=50,
                k=18,
            )
        ),
        "q_rescore_expression": lambda sp, d: _rank_scored(
            _searcher(sp, d).rescore_expression(
                ConstantScoreQuery(query=TermQuery(term="spark")),
                "sqrt(nc) - 50 + 0.1*score",
                (("score", SCORE), ("nc", "n_chars")),
                first_pass_k=50,
                k=18,
            )
        ),
        # ---- deletes (tombstoned docs never match; stats unchanged) ----
        "q_term_deleted": lambda sp, d: (
            lambda s: _topk_df(
                Searcher(
                    s.index.delete_docs([0, 1, 2]), dtype=np.float64, similarity=s.sim
                ),
                TermQuery(term="table"),
                10,
            )
        )(_searcher(sp, d)),
        # ---- soft deletes (reversible tombstones, retention semantics) ----
        "q_term_soft_deleted": lambda sp, d: (
            lambda s: _topk_df(
                Searcher(
                    s.index.soft_delete_docs([3, 4, 5]),
                    dtype=np.float64,
                    similarity=s.sim,
                ),
                TermQuery(term="table"),
                10,
            )
        )(_searcher(sp, d)),
        # ---- doc-values update (in-place column overwrite, no reindex) ----
        "q_docvalues_update": lambda sp, d: (
            lambda idx2: (
                Searcher(idx2, dtype=np.float64)
                .matches(TermQuery(term="vector"))
                .join(idx2.docs.select("doc_id", "n_chars"), "doc_id")
                .orderBy(F.desc("n_chars"), F.asc("doc_id"))
                .limit(10)
                .select(F.col("doc_id").cast("long"), F.col("n_chars").cast("long"))
            )
        )(
            _searcher(sp, d).index.update_doc_values(
                "n_chars",
                sp.createDataFrame(
                    [(i, 99999) for i in range(5)], "doc_id long, n_chars long"
                ),
            )
        ),
        # ---- term vectors (per-doc forward index) ----
        "q_term_vectors": lambda sp, d: (
            term_vectors(
                _docs(sp, d).filter("doc_id < 3"),
                IndexConfig(chain="standard", with_positions=True),
                content_col="text",
            )
            .select("doc_id", "term", "freq", F.size("positions").alias("n_pos"))
            .orderBy("doc_id", "term")
        ),
        # ---- classic query parser end-to-end ----
        "q_parsed": lambda sp, d: _topk_df(
            _searcher(sp, d), parse("merge AND table"), 10
        ),
        # ---- derived queries (CommonTerms / MoreLikeThis) ----
        "q_common_terms": lambda sp, d: (
            lambda s: _topk_df(
                s, s.common_terms(["the", "a", "spark", "vector"], 0.1), 10
            )
        )(_searcher(sp, d)),
        "q_mlt_doc0": lambda sp, d: (
            lambda s: _topk_df(
                s,
                s.more_like_this(
                    sp.read.parquet(os.path.join(d, "documents.parquet"))
                    .filter("doc_id = 0")
                    .collect()[0]["text"],
                    max_query_terms=5,
                    min_doc_freq=2,
                ),
                10,
            )
        )(_searcher(sp, d)),
        "q_mlt_boosted": lambda sp, d: (
            # MoreLikeThis setBoost(true): per-term interestingness boost
            # score/bestScore on each clause
            lambda s: _topk_df(
                s,
                s.more_like_this(
                    sp.read.parquet(os.path.join(d, "documents.parquet"))
                    .filter("doc_id = 0")
                    .collect()[0]["text"],
                    max_query_terms=5,
                    min_doc_freq=2,
                    boost_terms=True,
                ),
                10,
            )
        )(_searcher(sp, d)),
        # ---- synonym / dismax ----
        "q_synonym": lambda sp, d: _topk_df(
            _searcher(sp, d), SynonymQuery(terms=("spark", "stream")), 10
        ),
        "q_dismax": lambda sp, d: _topk_df(
            _searcher(sp, d),
            DisjunctionMaxQuery(
                disjuncts=(TermQuery(term="spark"), TermQuery(term="vector")),
                tie_breaker=0.1,
            ),
            10,
        ),
        # ---- multi-term constant-score family ----
        "q_prefix": const_docs(PrefixQuery(prefix="s")),
        "q_prefix_broad": lambda sp, d: _customer_prefix_docs(sp, d),
        "q_wildcard": const_docs(WildcardQuery(pattern="*a*k")),
        "q_regexp": const_docs(RegexpQuery(regexp="[sv].*r")),
        # Lucene RegExp syntax: '@' = ANYSTRING, quoted literal segment
        "q_regexp_lucene_syntax": const_docs(RegexpQuery(regexp='"s"@')),
        "q_regexp_intersection": const_docs(
            # top-level automaton intersection: starts with s AND contains a
            RegexpQuery(regexp="s.*&.*a.*")
        ),
        "q_regexp_complement": const_docs(
            # intersection with a complemented operand: s-terms NOT ending k
            RegexpQuery(regexp="s.*&~(.*k)")
        ),
        "q_regexp_interval": lambda sp, d: _docs_df(
            # <n-m> numeric interval (digits=0: any leading zeros) over the
            # customer-name index: matches the zero-padded key tokens 1..20
            _customer_searcher(sp, d), RegexpQuery(regexp="<1-20>")
        ),
        # ---- automaton ops NESTED inside groups: no RE2 equivalent, the
        # Brzozowski-derivative DFA kernel (lucene_spark/regexp.py) runs
        # behind a pushed literal-prefix + length prefilter ----
        "q_regexp_nested_inter": const_docs(
            # s + (contains 'a' AND contains 'r'): spark, stream
            RegexpQuery(regexp="s(.*a.*&.*r.*)")
        ),
        "q_regexp_nested_compl": const_docs(
            # s + (anything except the literal 'low'): s-terms minus 'slow'
            RegexpQuery(regexp="s(~(low)&@)")
        ),
        "q_regexp_nested_interval": lambda sp, d: _docs_df(
            # nested interval & plain-regex conjunction: key tokens 10..19
            _customer_searcher(sp, d), RegexpQuery(regexp="(<1-20>&0*1[0-9])")
        ),
        "q_term_range": const_docs(TermRangeQuery(lower="query", upper="sort")),
        "q_term_range_excl": lambda sp, d: _docs_df(
            # exclusive bounds via the parser's {a TO b} form
            _searcher(sp, d), parse("{query TO sort}")
        ),
        "q_term_in_set": const_docs(TermInSetQuery(terms=("spark", "vector", "nope"))),
        "q_fuzzy": const_docs(
            # classic Levenshtein variant (transpositions=False)
            FuzzyQuery(term="sprk", max_edits=1, transpositions=False)
        ),
        "q_fuzzy_transpositions": const_docs(
            # reference-default OSA metric: 'sprak'~1 reaches 'spark' via one
            # adjacent transposition (classic distance would be 2); at
            # max_edits=1 OSA coincides with unrestricted Damerau, so the
            # oracle's independent damerau_levenshtein is exact parity
            FuzzyQuery(term="sprak", max_edits=1)
        ),
        # ---- geo distance (LatLonPoint.newDistanceQuery analog) ----
        "q_geo_polygon": lambda sp, d: (
            fgeo.geo_polygon(
                sp.read.parquet(os.path.join(d, "customer.parquet")).select(
                    F.col("c_custkey").cast("long").alias("doc_id"),
                    ((F.col("c_custkey") * 7 % 180) - 90 + 0.5)
                    .cast("double").alias("lat"),
                    ((F.col("c_custkey") * 13 % 360) - 180 + 0.5)
                    .cast("double").alias("lon"),
                ),
                "lat", "lon",
                [(0.0, -60.0), (45.0, -10.0), (60.0, -90.0), (10.0, -120.0)],
            )
            .select("doc_id", "lat", "lon")
            .orderBy("doc_id")
        ),
        "q_geo_polygon_holes": lambda sp, d: (
            fgeo.geo_polygon(
                sp.read.parquet(os.path.join(d, "customer.parquet")).select(
                    F.col("c_custkey").cast("long").alias("doc_id"),
                    ((F.col("c_custkey") * 7 % 180) - 90 + 0.5)
                    .cast("double").alias("lat"),
                    ((F.col("c_custkey") * 13 % 360) - 180 + 0.5)
                    .cast("double").alias("lon"),
                ),
                "lat", "lon",
                [(-60.0, -150.0), (60.0, -150.0), (60.0, -30.0),
                 (-60.0, -30.0)],
                holes=[[(-20.0, -120.0), (20.0, -120.0), (20.0, -60.0),
                        (-20.0, -60.0)]],
            )
            .select("doc_id", "lat", "lon")
            .orderBy("doc_id")
        ),
        "q_geo_distance": lambda sp, d: (
            fgeo.geo_distance(
                sp.read.parquet(os.path.join(d, "customer.parquet")).select(
                    F.col("c_custkey").cast("long").alias("doc_id"),
                    ((F.col("c_custkey") * 7 % 180) - 90 + 0.5)
                    .cast("double").alias("lat"),
                    ((F.col("c_custkey") * 13 % 360) - 180 + 0.5)
                    .cast("double").alias("lon"),
                ),
                "lat", "lon", 10.0, 20.0, 2_000_000.0,
            )
            .select("doc_id", "distance_m")
            .orderBy("doc_id")
        ),
        # ---- point (numeric doc-values) queries ----
        "q_point_range": const_docs(
            PointRangeQuery(field_col="n_chars", lower=200, upper=400)
        ),
        "q_point_in_set": const_docs(
            PointInSetQuery(field_col="n_chars", values=(200, 250, 300))
        ),
        # DocValuesTermsQuery (sandbox): string-set membership on a
        # doc-values column — same isin predicate, BYTES instead of points
        "q_docvalues_terms": const_docs(
            PointInSetQuery(field_col="lang", values=("en", "fr"))
        ),
        # MultiRangeQuery (sandbox): match ANY of several ranges on one
        # dimension, constant score (no double count) = ConstantScore over
        # a SHOULD of point ranges
        "q_multi_range": const_docs(
            ConstantScoreQuery(
                query=bool_query(
                    should=[
                        PointRangeQuery(field_col="n_chars", lower=100,
                                        upper=300),
                        PointRangeQuery(field_col="n_chars", lower=2000,
                                        upper=2500),
                    ]
                )
            )
        ),
        # ---- counts / match-all ----
        "q_total_hits": lambda sp, d: sp.createDataFrame(
            [(int(_searcher(sp, d).count(bool_query(must=[TermQuery(term="spark"), TermQuery(term="vector")]))),)],
            "total_hits long",
        ),
        "q_match_all_count": lambda sp, d: sp.createDataFrame(
            [(int(_searcher(sp, d).count(MatchAllDocsQuery())),)], "total_hits long"
        ),
        # ---- index structure tables (terms dict / norms / field stats) ----
        "q_terms_stats": lambda sp, d: (
            _searcher(sp, d)
            .index.terms.select(
                "term",
                F.col("doc_freq").cast("long"),
                F.col("total_term_freq").cast("long"),
            )
            .orderBy(F.desc("doc_freq"), F.asc("term"))
            .limit(20)
        ),
        "q_norms": lambda sp, d: (
            _searcher(sp, d)
            .index.docs.select(
                F.col("doc_id").cast("long"),
                F.col("length").cast("long"),
                F.col("norm").cast("int").alias("norm_byte"),
            )
            .orderBy("doc_id")
        ),
        "q_field_stats": lambda sp, d: (
            sp.createDataFrame(
                [
                    (
                        _searcher(sp, d).index.stats.doc_count,
                        _searcher(sp, d).index.stats.sum_total_term_freq,
                    )
                ],
                "doc_count long, sum_total_term_freq long",
            )
        ),
        # ---- facets / grouping / sort (SURVEY §2.7) ----
        "q_facet_lang": lambda sp, d: (
            _searcher(sp, d)
            .matches(TermQuery(term="spark"))
            .join(_searcher(sp, d).index.docs.select("doc_id", "lang"), "doc_id")
            .groupBy("lang")
            .agg(F.count("*").cast("long").alias("cnt"))
            .orderBy("lang")
        ),
        "q_facet_range_nchars": lambda sp, d: (
            _searcher(sp, d)
            .matches(TermQuery(term="table"))
            .join(_searcher(sp, d).index.docs.select("doc_id", "n_chars"), "doc_id")
            .groupBy((F.floor(F.col("n_chars") / 100) * 100).cast("long").alias("bucket"))
            .agg(F.count("*").cast("long").alias("cnt"))
            .orderBy("bucket")
        ),
        "q_facet_taxonomy": lambda sp, d: (
            lambda s: ffacets.taxonomy_counts(
                s.matches(TermQuery(term="table")),
                s.index.docs.select(
                    "doc_id",
                    F.concat_ws("/", F.col("lang"), F.col("source")).alias("path"),
                ),
                "path",
            )
        )(_searcher(sp, d)),
        "q_facet_taxonomy_deep": lambda sp, d: (
            # 3-level hierarchical rollup (lang/source/size-bucket), then a
            # getTopChildren('en')-style prefix cut
            lambda s: ffacets.taxonomy_counts(
                s.matches(TermQuery(term="table")),
                s.index.docs.select(
                    "doc_id",
                    F.concat_ws(
                        "/",
                        F.col("lang"),
                        F.col("source"),
                        F.when(F.col("n_chars") >= 300, "big").otherwise("small"),
                    ).alias("path"),
                ),
                "path",
            ).filter(F.col("path").startswith("en"))
        )(_searcher(sp, d)),
        "q_drilldown": lambda sp, d: (
            lambda s: ffacets.drill_down(
                s.matches(TermQuery(term="table")),
                s.index.docs.select("doc_id", "lang", "source"),
                {"lang": ["en", "de"], "source": ["src1", "src2", "src3"]},
            )
            .select(F.col("doc_id").cast("long"))
            .distinct()
            .orderBy("doc_id")
        )(_searcher(sp, d)),
        "q_drill_sideways": lambda sp, d: (
            lambda s: ffacets.drill_sideways(
                s.matches(TermQuery(term="table")),
                s.index.docs.select("doc_id", "lang", "source"),
                {"lang": ["en", "de"], "source": ["src1", "src2", "src3"]},
                ["lang", "source"],
            )
        )(_searcher(sp, d)),
        "q_facet_topk": lambda sp, d: (
            # value-sorted facet top-k with a FacetResult-shaped output
            # (facet/.../FacetsCollector.java getTopChildren analog)
            _searcher(sp, d)
            .matches(TermQuery(term="table"))
            .join(_searcher(sp, d).index.docs.select("doc_id", "lang"), "doc_id")
            .groupBy("lang")
            .agg(F.count("*").cast("long").alias("cnt"))
            .select(F.lit("lang").alias("dim"), F.col("lang").alias("label"), "cnt")
            .orderBy(F.desc("cnt"), F.asc("label"))
            .limit(3)
        ),
        "q_group_top2_per_lang": lambda sp, d: (
            # top-N docs per group (grouping/ module: top-k groups + top-n
            # docs per group via window rank)
            _searcher(sp, d)
            .matches(TermQuery(term="data"))
            .join(_searcher(sp, d).index.docs.select("doc_id", "lang"), "doc_id")
            .withColumn(
                "rank_in_group",
                F.row_number().over(
                    Window.partitionBy("lang").orderBy(
                        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id")
                    )
                ).cast("int"),
            )
            .filter(F.col("rank_in_group") <= 2)
            .select(
                "lang", "rank_in_group", F.col("doc_id").cast("long"),
                F.round("score", 6).alias("score"),
            )
            .orderBy("lang", "rank_in_group")
        ),
        "q_suggest_prefix": lambda sp, d: fsuggest.suggest_prefix(
            _searcher(sp, d).index.terms, "s", 5
        ),
        "q_suggest_infix": lambda sp, d: fsuggest.suggest_infix(
            _searcher(sp, d).index.terms, "ar", 5
        ),
        "q_suggest_fuzzy": lambda sp, d: fsuggest.suggest_fuzzy(
            _searcher(sp, d).index.terms, "spark", max_edits=1, k=5
        ),
        "q_word_break": lambda sp, d: fsuggest.word_break_suggest(
            _searcher(sp, d).index.terms, "sparktable", max_suggestions=5
        ),
        "q_word_break_multi": lambda sp, d: fsuggest.word_break_suggest_multi(
            _searcher(sp, d).index.terms, "sparktable", max_changes=2
        ),
        "q_word_combine": lambda sp, d: fsuggest.word_combine_suggest(
            # no concatenated pair is indexed in this corpus -> the gate
            # must yield zero rows on both engines (over-firing detector)
            _searcher(sp, d).index.terms, ["spark", "table", "data"]
        ),
        "q_spell_lucene_lev": lambda sp, d: fsuggest.spell_suggest(
            # pluggable StringDistance: LuceneLevenshteinDistance rescores
            # the same OSA-banded candidates (1 - damerau / min(len))
            _searcher(sp, d).index.terms, "sparkk", num_sug=5, max_edits=1,
            distance="lucene_levenshtein", dtype=np.float64,
        ),
        "q_spell_suggest": lambda sp, d: fsuggest.spell_suggest(
            # DirectSpellChecker: 'sparkk' is not indexed -> suggest mode
            # fires; max_edits=1 keeps the oracle's Damerau==OSA window
            _searcher(sp, d).index.terms, "sparkk", num_sug=5, max_edits=1
        ),
        # grouping-module depth: DistinctValuesCollector (per-group count
        # of distinct values of another field) and AllGroupsCollector
        # (total distinct groups) — grouping/DistinctValuesCollector.java,
        # AllGroupsCollector.java
        "q_group_distinct_values": lambda sp, d: (
            _searcher(sp, d)
            .matches(TermQuery(term="data"))
            .join(
                _searcher(sp, d).index.docs.select("doc_id", "lang", "source"),
                "doc_id",
            )
            .groupBy("lang")
            .agg(F.count_distinct("source").cast("long").alias("n_sources"))
            .orderBy("lang")
        ),
        "q_all_groups_count": lambda sp, d: (
            _searcher(sp, d)
            .matches(TermQuery(term="data"))
            .join(_searcher(sp, d).index.docs.select("doc_id", "lang"), "doc_id")
            .agg(F.count_distinct("lang").cast("long").alias("n_groups"))
        ),
        "q_group_top1_per_lang": lambda sp, d: (
            _searcher(sp, d)
            .matches(TermQuery(term="data"))
            .join(_searcher(sp, d).index.docs.select("doc_id", "lang"), "doc_id")
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("lang").orderBy(
                        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id")
                    )
                ),
            )
            .filter(F.col("rn") == 1)
            .select("lang", F.col("doc_id").cast("long"), F.round("score", 6).alias("score"))
            .orderBy("lang")
        ),
        "q_sort_by_field": lambda sp, d: (
            _searcher(sp, d)
            .matches(TermQuery(term="vector"))
            .join(_searcher(sp, d).index.docs.select("doc_id", "n_chars"), "doc_id")
            .orderBy(F.desc("n_chars"), F.asc("doc_id"))
            .limit(10)
            .select(F.col("doc_id").cast("long"), F.col("n_chars").cast("long"))
        ),
        "q_synonym_index_term": lambda sp, d: _topk_df(
            # 'quick' was injected at every 'fast' position (posIncr=0):
            # matches fast-docs, idf/tf from the expanded postings, norms
            # discounted by numOverlap
            _syn_searcher(sp, d), TermQuery(term="quick"), 10
        ),
        "q_synonym_index_phrase": lambda sp, d: _topk_df(
            # phrase accepts the injected synonym at the base position
            _syn_searcher(sp, d), PhraseQuery(terms=("quick", "table")), 10
        ),
        "q_compound_term": lambda sp, d: _topk_df(
            # DictionaryCompoundWordTokenFilter: 'customer' injects
            # 'custom'+'mer' at its position; the subword is searchable
            _compound_searcher(sp, d), TermQuery(term="custom"), 10
        ),
        "q_term_hunspell": lambda sp, d: _topk_df(
            # HunspellStemFilter (longest-only): 'table' -> 'tabl' via the
            # inline .aff/.dic; the stem term is what's indexed
            _hunspell_searcher(sp, d), TermQuery(term="tabl"), 10
        ),
        "q_phrase_hunspell": lambda sp, d: _topk_df(
            # the stem sits at the original position: phrase through it
            _hunspell_searcher(sp, d), PhraseQuery(terms=("fast", "tabl")), 10
        ),
        "q_compound_phrase": lambda sp, d: _topk_df(
            # subword sits AT the compound's position: phrase through it
            _compound_searcher(sp, d), PhraseQuery(terms=("custom", "query")), 10
        ),
        "q_phonetic_term": lambda sp, d: _topk_df(
            # DoubleMetaphone inject: 'customer' also indexes KSTM at its
            # position; phonetic search hits the code term
            _phonetic_searcher(sp, d), TermQuery(term="KSTM"), 10
        ),
        "q_phonetic_cross_match": lambda sp, d: _topk_df(
            # 'merge' (MRJ|MRK) found via its alternate code — the
            # spelling-variant matching phonetic filters exist for
            _phonetic_searcher(sp, d), TermQuery(term="MRK"), 10
        ),
        "q_synonym_graph_bool": lambda sp, d: _topk_df(
            # query-time SynonymGraphFilter expansion (no reindex): the
            # multi-word segment becomes SHOULD[MUST[fast,table], quick]
            _searcher(sp, d), _graph_syn_query("bool"), 10
        ),
        "q_synonym_graph_phrase": lambda sp, d: _topk_df(
            # analyzeGraphPhrase: every full path as a phrase/term clause
            _searcher(sp, d), _graph_syn_query("phrase"), 10
        ),
        # ---- language analysis chains (fr/de/es default analyzers) ----
        "q_term_fr": lambda sp, d: _topk_df(
            # French chain end-to-end: elision + stop holes + light stem
            # ('chevaux'/'cheval' surfaces both index as 'cheval')
            _lang_searcher(sp, d, "french"), TermQuery(term="cheval"), 10
        ),
        "q_term_de": lambda sp, d: _topk_df(
            # German chain: normalization FSM (straße/flüsse) + light stem
            _lang_searcher(sp, d, "german"), TermQuery(term="stimm"), 10
        ),
        "q_term_es": lambda sp, d: _topk_df(
            _lang_searcher(sp, d, "spanish"), TermQuery(term="niñ"), 10
        ),
        "q_term_it": lambda sp, d: _topk_df(
            # Italian chain: its own elision article set (dell'acqua)
            _lang_searcher(sp, d, "italian"), TermQuery(term="acqua"), 10
        ),
        "q_term_pt": lambda sp, d: _topk_df(
            # Portuguese chain: plural/feminine suffix rules (canções)
            _lang_searcher(sp, d, "portuguese"), TermQuery(term="canca"), 10
        ),
        "q_term_sv": lambda sp, d: _topk_df(
            # Swedish SNOWBALL chain (SwedishStemmer R1 suffix machine)
            _lang_searcher(sp, d, "swedish"), TermQuery(term="anteckning"), 10
        ),
        "q_term_da": lambda sp, d: _topk_df(
            # Danish snowball: s-ending groups + undouble tail
            _lang_searcher(sp, d, "danish"), TermQuery(term="betal"), 10
        ),
        "q_term_no": lambda sp, d: _topk_df(
            _lang_searcher(sp, d, "norwegian"), TermQuery(term="merkevar"), 10
        ),
        "q_term_ru": lambda sp, d: _topk_df(
            # Russian snowball over the Cyrillic-extended tokenizer
            _lang_searcher(sp, d, "russian"), TermQuery(term="славн"), 10
        ),
        "q_term_nl": lambda sp, d: _topk_df(
            # Dutch snowball + the StemmerOverride default dict
            _lang_searcher(sp, d, "dutch"), TermQuery(term="drad"), 10
        ),
        "q_term_fi": lambda sp, d: _topk_df(
            # Finnish snowball: particle/possessive/case cascade + tidy
            _lang_searcher(sp, d, "finnish"), TermQuery(term="haast"), 10
        ),
        "q_term_hu": lambda sp, d: _topk_df(
            # Hungarian snowball: region-free among + R1 gate, v_ending
            _lang_searcher(sp, d, "hungarian"), TermQuery(term="lemez"), 10
        ),
        "q_term_ro": lambda sp, d: _topk_df(
            # Romanian snowball: u/i prelude + combo loop (Latin Ext tokens)
            _lang_searcher(sp, d, "romanian"), TermQuery(term="comunist"), 10
        ),
        "q_term_tr": lambda sp, d: _topk_df(
            # Turkish: apostrophe filter + Turkish-I lowercase + harmony-
            # gated snowball suffix chains
            _lang_searcher(sp, d, "turkish"), TermQuery(term="çelişki"), 10
        ),
        "q_term_ar": lambda sp, d: _topk_df(
            # Arabic: digit fold + pre-norm stop + hamza/teh-marbuta
            # normalization + article/suffix light stem (Arabic-script scan)
            _lang_searcher(sp, d, "arabic"), TermQuery(term="حسن"), 10
        ),
        "q_term_fa": lambda sp, d: _topk_df(
            # Persian: ZWNJ split + Arabic+Persian normalization, post-norm
            # stop, no stemming
            _lang_searcher(sp, d, "persian"), TermQuery(term="كتاب"), 10
        ),
        "q_term_bg": lambda sp, d: _topk_df(
            # Bulgarian: BulStem light stemmer (article + plural + ya/vowel
            # + en/ъ rewrites) over the Cyrillic tokenizer
            _lang_searcher(sp, d, "bulgarian"), TermQuery(term="град"), 10
        ),
        "q_term_cz": lambda sp, d: _topk_df(
            # Czech: Dolamic/Savoy light stemmer (case + possessive +
            # palatalization normalize)
            _lang_searcher(sp, d, "czech"), TermQuery(term="hrad"), 10
        ),
        "q_term_ckb": lambda sp, d: _topk_df(
            # Sorani Kurdish: normalize-before-lowercase chain (ZWNJ-aware)
            # + ezafe/article suffix stemmer
            _lang_searcher(sp, d, "sorani"), TermQuery(term="پیاو"), 10
        ),
        "q_term_hi": lambda sp, d: _topk_df(
            # Hindi: Indic script composition + nukta/virama/vowel-shortening
            # normalization + Ramanathan-Rao suffix stemmer
            _lang_searcher(sp, d, "hindi"), TermQuery(term="लडक"), 10
        ),
        "q_term_bn": lambda sp, d: _topk_df(
            # Bengali: Indic composition + ja/ba-phala + visarga rules +
            # verb-suffix stemmer
            _lang_searcher(sp, d, "bengali"), TermQuery(term="কর"), 10
        ),
        "q_term_id": lambda sp, d: _topk_df(
            # Indonesian: derivational prefix/suffix stemmer with
            # rule-firing interlock flags
            _lang_searcher(sp, d, "indonesian"), TermQuery(term="buku"), 10
        ),
        "q_term_lv": lambda sp, d: _topk_df(
            # Latvian: vowel-gated affix strip + palatalization unwind
            _lang_searcher(sp, d, "latvian"), TermQuery(term="lāc"), 10
        ),
        "q_term_el": lambda sp, d: _topk_df(
            # Greek: diacritic-folding lowercase + the 22-rule Ntais stemmer
            _lang_searcher(sp, d, "greek"), TermQuery(term="ανθρωπ"), 10
        ),
        "q_term_br": lambda sp, d: _topk_df(
            # Brazilian Portuguese: accent-folding RSLP-style step cascade
            # (null stems keep the token)
            _lang_searcher(sp, d, "brazilian"), TermQuery(term="boat"), 10
        ),
        "q_term_gl": lambda sp, d: _topk_df(
            # Galician: RSLP rules engine (plural/unification/adverb/
            # augmentative-loop/noun-or-verb/vowel steps)
            _lang_searcher(sp, d, "galician"), TermQuery(term="acept"), 10
        ),
        "q_term_pt_rslp": lambda sp, d: _topk_df(
            # Portuguese RSLP variant (selectable alternative to the
            # default light stemmer)
            _lang_searcher(sp, d, "portuguese_rslp"),
            TermQuery(term="abus"), 10
        ),
        "q_term_ga": lambda sp, d: _topk_df(
            # Irish: hyphenation stops + elision + Irish lowercase (n/t +
            # capital vowel hyphen insertion) + snowball mutation/suffix
            _lang_searcher(sp, d, "irish"), TermQuery(term="athair"), 10
        ),
        "q_term_hy": lambda sp, d: _topk_df(
            # Armenian: snowball ending/verb/adjective/noun passes over
            # the Armenian-script tokenizer
            _lang_searcher(sp, d, "armenian"), TermQuery(term="արծ"), 10
        ),
        "q_term_ca": lambda sp, d: _topk_df(
            # Catalan: elision + snowball pronoun/standard-or-verb/residual
            # passes + accent cleaning
            _lang_searcher(sp, d, "catalan"), TermQuery(term="llengu"), 10
        ),
        "q_term_eu": lambda sp, d: _topk_df(
            # Basque: snowball repeat(aditzak)/repeat(izenak)/adjetiboak
            # with leftward-continuing cursor semantics
            _lang_searcher(sp, d, "basque"), TermQuery(term="zaldi"), 10
        ),
        "q_term_lt": lambda sp, d: _topk_df(
            # Lithuanian: R1-bounded case endings + conflict/ch-dz/gd fixes
            _lang_searcher(sp, d, "lithuanian"), TermQuery(term="vaik"), 10
        ),
        "q_term_et": lambda sp, d: _topk_df(
            # Estonian: verb-exception short-circuit + gi/ki emphasis +
            # verb/substantive cascades + kpt undoubling
            _lang_searcher(sp, d, "estonian"), TermQuery(term="kooli"), 10
        ),
        "q_term_cjk": lambda sp, d: _topk_df(
            # CJK: width fold + overlapping script-run bigrams (lone char
            # unigrams), Stop after bigramming
            _lang_searcher(sp, d, "cjk"), TermQuery(term="学生"), 10
        ),
        "q_term_ru_light": lambda sp, d: _topk_df(
            # RussianLightStemmer variant chain (zip-validated, 49,673
            # pairs)
            _lang_searcher(sp, d, "russian_light"),
            TermQuery(term="библ"), 10
        ),
        "q_term_fi_light": lambda sp, d: _topk_df(
            # FinnishLightStemmer variant chain (50,000 zip pairs)
            _lang_searcher(sp, d, "finnish_light"),
            TermQuery(term="aapi"), 10
        ),
        "q_term_pt_minimal": lambda sp, d: _topk_df(
            # PortugueseMinimalStemmer (RSLP Plural step only)
            _lang_searcher(sp, d, "portuguese_minimal"),
            TermQuery(term="água"), 10
        ),
        "q_term_fr_minimal": lambda sp, d: _topk_df(
            # FrenchMinimalStemmer variant chain (20,403 zip pairs)
            _lang_searcher(sp, d, "french_minimal"),
            TermQuery(term="amas"), 10
        ),
        "q_term_en_minimal": lambda sp, d: _topk_df(
            # EnglishMinimal (Harman S-stemmer) variant chain
            _lang_searcher(sp, d, "english_minimal"),
            TermQuery(term="query"), 10
        ),
        "q_term_ne": lambda sp, d: _topk_df(
            # Nepali: snowball category-1/2/3 suffix loop over the
            # Devanagari tokenizer (2,000 zip pairs validated)
            _lang_searcher(sp, d, "nepali"), TermQuery(term="भुल्"), 10
        ),
        "q_term_de_snowball": lambda sp, d: _topk_df(
            # German snowball variant (2,000 zip pairs validated)
            _lang_searcher(sp, d, "german_snowball"),
            TermQuery(term="verwend"), 10
        ),
        "q_term_de2": lambda sp, d: _topk_df(
            # German2 variant: ae/oe/ue folding prelude (2,000 zip pairs)
            _lang_searcher(sp, d, "german2"),
            TermQuery(term="feu"), 10
        ),
        "q_term_en_snowball": lambda sp, d: _topk_df(
            # Porter2 variant (4,000 zip/oracle pairs validated)
            _lang_searcher(sp, d, "english_snowball"),
            TermQuery(term="continu"), 10
        ),
        "q_term_es_snowball": lambda sp, d: _topk_df(
            # Spanish snowball variant (2,000 zip pairs)
            _lang_searcher(sp, d, "spanish_snowball"),
            TermQuery(term="creador"), 10
        ),
        "q_term_it_snowball": lambda sp, d: _topk_df(
            # Italian snowball variant (2,000 zip pairs)
            _lang_searcher(sp, d, "italian_snowball"),
            TermQuery(term="coltiv"), 10
        ),
        "q_term_pt_snowball": lambda sp, d: _topk_df(
            # Portuguese snowball variant (2,000 zip pairs)
            _lang_searcher(sp, d, "portuguese_snowball"),
            TermQuery(term="motoriz"), 10
        ),
        "q_term_fr_snowball": lambda sp, d: _topk_df(
            # French snowball variant (20,403 oracle pairs)
            _lang_searcher(sp, d, "french_snowball"),
            TermQuery(term="ador"), 10
        ),
        "q_term_lovins": lambda sp, d: _topk_df(
            # Lovins 1968 stemmer: condition-gated endings with trie
            # backtracking + undouble + respell (2,000 zip pairs)
            _lang_searcher(sp, d, "lovins"), TermQuery(term="decept"), 10
        ),
        "q_term_en_kstem": lambda sp, d: _topk_df(
            # Krovetz dictionary-validated stemmer (12,130 zip pairs)
            _lang_searcher(sp, d, "english_kstem"), TermQuery(term="abate"), 10
        ),
        "q_term_nl_kp": lambda sp, d: _topk_df(
            # Kraaij-Pohlmann Dutch: ge- prefix/infix removal, vowel
            # re-lengthening, 'ij' vowel units (2,000 zip pairs)
            _lang_searcher(sp, d, "dutch_kp"), TermQuery(term="boom"), 10
        ),
        "q_term_sr": lambda sp, d: _topk_df(
            # Serbian: cyr->lat + ije/je prelude + 2,165-suffix tables,
            # then the normalization filter (18,837-word dev-oracle parity)
            _lang_searcher(sp, d, "serbian"), TermQuery(term="devojk"), 10
        ),
        "q_term_th": lambda sp, d: _topk_df(
            # Thai: dictionary word segmentation (31,992-word JDK lexicon,
            # BreakIterator-oracle parity) + digit fold + stopwords
            _lang_searcher(sp, d, "thai"), TermQuery(term="ภาษา"), 10
        ),
        "q_term_ja": lambda sp, d: _topk_df(
            # Japanese dictionary tier: Viterbi lattice (kuromoji analog)
            # + POS stoptags + katakana stem, demo lexicon (kuromoji.py)
            _lang_searcher(sp, d, "japanese"), TermQuery(term="東京"), 10
        ),
        "q_term_ja_katakana": lambda sp, d: _topk_df(
            # unknown-katakana grouping + JapaneseKatakanaStemFilter path
            _lang_searcher(sp, d, "japanese"),
            TermQuery(term="コンピュータ"), 10
        ),
        "q_term_ko": lambda sp, d: _topk_df(
            # Korean dictionary tier (nori analog): Viterbi lattice +
            # DISCARD decompound (삼성전자 -> 삼성+전자) + POS stoptags
            _lang_searcher(sp, d, "korean"), TermQuery(term="전자"), 10
        ),
        "q_term_ko_reading": lambda sp, d: _topk_df(
            # KoreanReadingFormFilter path: 漢字 indexes as its Hangul
            # transcription 한자
            _lang_searcher(sp, d, "korean"), TermQuery(term="한자"), 10
        ),
        "q_term_zh": lambda sp, d: _topk_df(
            # Chinese HMM tier (smartcn analog): bigram-lattice shortest
            # path segments 研究生命起源 -> 研究/生命/起源
            _lang_searcher(sp, d, "chinese"), TermQuery(term="生命"), 10
        ),
        "q_term_zh_word": lambda sp, d: _topk_df(
            # whole dictionary word survives the lattice (北京大学)
            _lang_searcher(sp, d, "chinese"), TermQuery(term="北京大学"), 10
        ),
        "q_index_sorted_topk": lambda sp, d: _sorted_topk(sp, d, 10, True),
        "q_index_sorted_topk_desc": lambda sp, d: _sorted_topk(sp, d, 10, False),
        "q_search_after": lambda sp, d: (
            # page 2 (ranks 11..20) of q_term_common — searchAfter analog
            _topk_df(_searcher(sp, d), TermQuery(term="table"), 20).filter(
                F.col("rank") > 10
            )
        ),
        # ---- monitor / percolator (standing queries over a doc batch) ----
        "q_monitor": lambda sp, d: _monitor_matches(sp, d),
        # ---- stateful streaming dedup (applyInPandasWithState) ----
        "stream_dedup_first_seen": lambda sp, d: _stream_dedup(sp, d),
        # ---- alternate similarities (SURVEY §2.6) ----
        "q_sim_classic": lambda sp, d: _topk_df(
            _searcher(sp, d, sim="classic"), TermQuery(term="spark"), 10
        ),
        "q_sim_boolean": lambda sp, d: _topk_df(
            _searcher(sp, d, sim="boolean"), TermQuery(term="spark"), 10
        ),
        "q_sim_lmdirichlet": lambda sp, d: _topk_df(
            _searcher(sp, d, sim="lmdirichlet"), TermQuery(term="spark"), 10
        ),
        "q_sim_lmjm": lambda sp, d: _topk_df(
            _searcher(sp, d, sim="lmjelinekmercer"), TermQuery(term="spark"), 10
        ),
        "q_sim_dfr": lambda sp, d: _topk_df(
            _searcher(sp, d, sim="dfr"), TermQuery(term="spark"), 10
        ),
        "q_sim_ib": lambda sp, d: _topk_df(
            _searcher(sp, d, sim="ib"), TermQuery(term="spark"), 10
        ),
        "q_sim_dfi": lambda sp, d: _topk_df(
            _searcher(sp, d, sim="dfi"), TermQuery(term="spark"), 10
        ),
        "q_sim_axiomatic": lambda sp, d: _topk_df(
            _searcher(sp, d, sim="axiomatic"), TermQuery(term="spark"), 10
        ),
        # ---- training-data pipeline: deduplication ----
        "dedup_exact": lambda sp, d: fdedup.exact_dedup(_docs(sp, d), "doc_id", "text"),
        "dedup_minhash_star": lambda sp, d: fdedup.minhash_star_pairs(
            _docs(sp, d), "doc_id", "text"
        ),
        "dedup_minhash_lsh": lambda sp, d: fdedup.minhash_candidates(
            _docs(sp, d), "doc_id", "text"
        ),
        "dedup_simhash": lambda sp, d: fdedup.simhash(_docs(sp, d), "doc_id", "text"),
        "dedup_simhash_pairs": lambda sp, d: fdedup.simhash_near_pairs(
            _docs(sp, d), "doc_id", "text", max_hamming=4
        ),
        "dedup_jaccard": lambda sp, d: fdedup.jaccard_pairs(
            _docs(sp, d), "doc_id", "text", min_sim=0.8
        ),
        "dedup_embedding": lambda sp, d: fdedup.embedding_near_dup_pairs(
            _emb(sp, d), min_cos=0.4, tables=8, bits=6
        ),
        # ---- similarity search over embeddings ----
        "sim_cosine_topk": lambda sp, d: fsim.cosine_topk(
            _emb(sp, d), [0, 1, 2], k=5
        ),
        "sim_lsh_topk": lambda sp, d: fsim.lsh_cosine_topk(
            _emb(sp, d), [0, 1, 2], k=3
        ),
        "sim_rh_lsh_topk": lambda sp, d: fsim.rh_lsh_topk(
            _emb(sp, d), [0, 1, 2], k=10, tables=20, bits=4
        ),
        "sim_ivf_topk": lambda sp, d: _ivf_topk(sp, d),
        "sim_sq8_topk": lambda sp, d: fsim.sq8_topk(
            sp.read.parquet(os.path.join(d, "embeddings.parquet")),
            [0, 1, 2],
            k=5,
        ),
        "sim_hnsw_topk": lambda sp, d: _hnsw_topk(sp, d),
        # ---- text analysis ----
        "text_token_counts": lambda sp, d: ftext.token_counts(
            _docs(sp, d), "doc_id", "text"
        ),
        "text_quality": lambda sp, d: ftext.quality_scores(
            _docs(sp, d), "doc_id", "text"
        ),
        "text_lang_id": lambda sp, d: ftext.lang_id(_docs(sp, d), "doc_id", "text"),
        "text_fingerprint": lambda sp, d: ftext.fingerprints(
            _docs(sp, d), "doc_id", "text"
        ),
        # ---- multimodal plumbing (binary payload metadata / frame sampling) ----
        "mm_media_meta": lambda sp, d: fmm.media_meta_sql_expressible(
            _docs(sp, d), "doc_id", "text"
        ),
        "mm_frame_sample": lambda sp, d: fmm.frame_sample(
            _docs(sp, d), "doc_id", "text"
        ),
        # ---- classification over index statistics (reference classification/) ----
        "cls_naive_bayes": lambda sp, d: _cls_nb(sp, d),
        "cls_knn": lambda sp, d: _cls_knn(sp, d),
        # ---- payloads (queries/payloads + DelimitedPayloadTokenFilter) ----
        "payload_sum": lambda sp, d: _payload_entry(sp, d, "spark", "sum"),
        "payload_chain3": lambda sp, d: _payload_entry(
            # 3-term ordered span chain with slop (PayloadScoreQuery over
            # SpanNearQuery ordered — the arbitrary-chain span kernel)
            sp, d, ("the", "fast", "table"), "sum", slop=4
        ),
        "payload_pair_avg": lambda sp, d: _payload_entry(
            sp, d, ("table", "hash"), "avg"
        ),
        "payload_include_span": lambda sp, d: _payload_entry(
            # includeSpanScore: payload aggregate x the wrapped query's
            # BM25 score (span scores from the standard-chain index)
            sp, d, "spark", "sum", include_span=True
        ),
    }
    return out


def _multifield_searcher(sp: SparkSession, d: str):
    """Two-field searcher: text reuses the cached index; lang gets its own
    index (own stats) over the lang column — PerFieldSimilarityWrapper."""
    from lucene_spark.search import MultiFieldSearcher

    key = f"{d}::__langfield"
    if key not in _CACHE:
        docs = _docs(sp, d)
        cfg = IndexConfig(chain="standard", seg_size=1 << 12, block_size=128,
                          with_positions=False)
        lidx = build_index(docs, cfg, content_col="lang", doc_id_col="doc_id",
                           eager=True)
        _CACHE[key] = Searcher(lidx, dtype=np.float64)
    return MultiFieldSearcher(
        {"text": _searcher(sp, d), "lang": _CACHE[key]},
        default_field="text",
        dtype=np.float64,
    )


def _multifield_topk(sp: SparkSession, d: str) -> DataFrame:
    """parse('lang:en AND spark') over the two-field index set."""
    return _topk_df(_multifield_searcher(sp, d), parse("lang:en AND spark"), 10)


def _masked_stop_searcher(sp: SparkSession, d: str):
    """Two positional fields over the SAME documents: 'stop' (StopFilter
    chain, the mask/default field) and 'text' (unfiltered) — the setup for
    FieldMaskingSpanQuery across a filtered/unfiltered field pair."""
    from lucene_spark.search import MultiFieldSearcher

    return MultiFieldSearcher(
        {"stop": _stop_searcher(sp, d), "text": _searcher(sp, d)},
        default_field="stop",
        dtype=np.float64,
    )


def _stop_searcher(sp: SparkSession, d: str) -> Searcher:
    """Documents index with a StopFilter chain (stopwords 'the', 'a'):
    dropped tokens leave position holes; doc lengths/norms/stats shrink."""
    key = f"{d}::__stopchain"
    if key not in _CACHE:
        cfg = IndexConfig(
            chain="standard", seg_size=1 << 12, block_size=128,
            with_positions=True, stopwords=frozenset({"the", "a"}),
        )
        idx = build_index(
            _docs(sp, d), cfg, content_col="text", doc_id_col="doc_id",
            eager=True,
        )
        _CACHE[key] = Searcher(idx, dtype=np.float64)
    return _CACHE[key]


def _customer_searcher(sp: SparkSession, d: str) -> Searcher:
    key = f"{d}::__customer"
    if key not in _CACHE:
        cust = sp.read.parquet(os.path.join(d, "customer.parquet")).repartition(
            sp.sparkContext.defaultParallelism
        )
        cfg = IndexConfig(
            chain="standard", seg_size=1 << 12, block_size=128, with_positions=False
        )
        idx = build_index(
            cust, cfg, content_col="c_name", doc_id_col="c_custkey", eager=True
        )
        _CACHE[key] = Searcher(idx, dtype=np.float64)
    return _CACHE[key]


def _customer_prefix_docs(sp: SparkSession, d: str) -> DataFrame:
    """CONSTANT_SCORE multi-term rewrite at >1024 expanded terms: the
    uncapped distributed semi-join path (search/MultiTermQuery.java
    CONSTANT_SCORE_REWRITE builds a bitset over EVERY matching term; only
    scoring rewrites cap at 1024, where expand_terms raises TooManyClauses).
    PrefixQuery('0') over the customer-name index expands to ~1500 digit
    terms at sf0.01."""
    return _docs_df(_customer_searcher(sp, d), PrefixQuery(prefix="0"))


def _docs(sp: SparkSession, d: str) -> DataFrame:
    # small single-file parquet arrives as 1 partition; spread it or every
    # narrow stage (tokenize/hash) runs on one core
    df = sp.read.parquet(os.path.join(d, "documents.parquet"))
    return df.repartition(sp.sparkContext.defaultParallelism)


def _emb(sp: SparkSession, d: str) -> DataFrame:
    return sp.read.parquet(os.path.join(d, "embeddings.parquet"))


MONITOR_QUERIES = [
    ("mq1", bool_query(must=[TermQuery(term="spark"), TermQuery(term="vector")])),
    ("mq2", TermQuery(term="merge")),
    ("mq3", PhraseQuery(terms=("fast", "table"))),
]


def _stream_dedup(sp: SparkSession, d: str) -> DataFrame:
    """Cross-batch stateful dedup run as a one-batch availableNow stream
    over the documents table (the applyInPandasWithState operator; see
    lucene_spark/streaming/dedup_stream.py). Deterministic: the first-seen
    winner per content hash is the smallest doc_id."""
    import tempfile

    from lucene_spark.streaming.dedup_stream import dedup_stream

    key = f"{d}::__stream_dedup"
    if key not in _CACHE:
        tmp = tempfile.mkdtemp(prefix="ls_stream_dedup_")
        src = os.path.join(tmp, "src")
        outp = os.path.join(tmp, "out")
        ck = os.path.join(tmp, "ck")
        _docs(sp, d).select("doc_id", "text").coalesce(4).write.mode(
            "overwrite"
        ).json(src)
        stream = sp.readStream.schema("doc_id long, text string").json(src)
        q = (
            dedup_stream(stream, shards=8)
            .writeStream.format("parquet")
            .option("path", outp)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        _CACHE[key] = outp
    return sp.read.parquet(_CACHE[key]).orderBy("doc_id")


def _monitor_matches(sp: SparkSession, d: str) -> DataFrame:
    """Percolator analog (reference monitor/ module): every standing query
    matched against the doc batch -> (query_id, doc_id)."""
    s = _searcher(sp, d)
    parts = []
    for qid, q in MONITOR_QUERIES:
        parts.append(
            s.matches(q).select(
                F.lit(qid).alias("query_id"), F.col("doc_id").cast("long")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("query_id", "doc_id")


def oracle_sql() -> dict[str, str]:
    sqls: dict[str, str] = {
        "q_term": _term_topk_sql("spark"),
        "q_term_common": _term_topk_sql("table"),
        "q_term_boost": _term_topk_sql("vector", boost=2.5),
        "q_bool_and": _bool_topk_sql(must=["spark", "vector"]),
        "q_bool_or": _bool_topk_sql(should=["spark", "merge", "vector"]),
        "q_req_opt": _bool_topk_sql(must=["query"], should=["spark", "merge"]),
        "q_req_excl": _bool_topk_sql(must=["query"], must_not=["spark"]),
        "q_msm": _bool_topk_sql(should=["spark", "merge", "vector"], msm=2),
        "q_filter": _bool_topk_sql(must=["table"], filters=["spark"]),
        # cached-filter twin: caching must be invisible — same algebra as
        # q_filter but the non-scoring filter is the prefix sp% doc-set
        "q_filter_cached": _PRELUDE
        + _scored_cte(["table"])
        + """
, agg AS (
  SELECT doc_id, sum(score) AS score FROM sc GROUP BY doc_id
),
matched AS (
  SELECT g.doc_id, g.score FROM agg g
  WHERE EXISTS (SELECT 1 FROM tf x WHERE x.doc_id = g.doc_id AND x.term LIKE 'sp%')
)
"""
        + _rank_tail("score", "FROM matched", 10),
        "q_and3_hot": _bool_topk_sql(must=["a", "the", "table"]),
        "q_phrase": _phrase_sql(["fast", "table"]),
        "q_covering": _covering_sql(),
        "q_function_score": _function_score_sql(),
        "q_function_score_boost_query": _function_score_boost_query_sql(),
        "q_rescore_query": _rescore_query_sql(),
        "q_rescore_expression": _rescore_expression_sql(),
        "q_combined_field": _combined_field_sql("en", 1.0, 2.0),
        "q_block_join_parent_max": _block_join_parent_sql("spark", "max"),
        "q_block_join_parent_avg": _block_join_parent_sql("merge", "avg"),
        "q_block_join_child": _block_join_child_sql("spark"),
        "q_block_join_children_of": _block_join_children_of_sql("spark"),
        "q_fvh_fragments": """
WITH RECURSIVE occ AS (
  -- token occurrences of 'spark' with char offsets (0-based, like the
  -- engine's tokenizer spans); token boundary = non-[A-Za-z0-9_]
  SELECT d.doc_id, i - 1 AS s, i + 4 AS e
  FROM documents d,
       LATERAL unnest(generate_series(1, greatest(length(d.text) - 4, 0))) t(i)
  WHERE lower(substr(d.text, i, 5)) = 'spark'
    AND (i = 1 OR NOT regexp_matches(substr(d.text, i - 1, 1), '[A-Za-z0-9_]'))
    AND (i + 5 > length(d.text)
         OR NOT regexp_matches(substr(d.text, i + 5, 1), '[A-Za-z0-9_]'))
),
frag AS (
  -- BaseFragListBuilder.createFieldFragList: fcs=60, margin=6
  SELECT DISTINCT doc_id, -1::BIGINT AS frag_no, 0::BIGINT AS so,
         0::BIGINT AS fs, 0::BIGINT AS fe, 0::BIGINT AS cnt
  FROM occ
  UNION ALL
  SELECT f.doc_id, f.frag_no + 1,
         (greatest(f.so, a.fst - greatest(0, (60 - (b.pe - a.fst)) // 2))
          + greatest(b.pe - a.fst, 60))::BIGINT,
         greatest(f.so, a.fst - greatest(0, (60 - (b.pe - a.fst)) // 2))::BIGINT,
         (greatest(f.so, a.fst - greatest(0, (60 - (b.pe - a.fst)) // 2))
          + greatest(b.pe - a.fst, 60))::BIGINT,
         b.cnt
  FROM frag f
  JOIN LATERAL (
    SELECT min(s) AS fst FROM occ o
    WHERE o.doc_id = f.doc_id AND o.s >= f.so
  ) a ON a.fst IS NOT NULL
  JOIN LATERAL (
    SELECT max(e) AS pe, count(*)::BIGINT AS cnt FROM occ o
    WHERE o.doc_id = f.doc_id AND o.s >= a.fst
      AND o.e <= greatest(a.fst + 5, greatest(a.fst - 6, f.so) + 60)
  ) b ON true
)
SELECT doc_id, frag_no, fs AS frag_start, fe AS frag_end, cnt
FROM frag WHERE frag_no >= 0 ORDER BY doc_id, frag_no
""",
        "q_function_range": _PRELUDE
        + """
, frq AS (
  SELECT doc_id, sqrt(n_chars) * 2 AS score FROM documents
  WHERE sqrt(n_chars) * 2 >= 40.0 AND sqrt(n_chars) * 2 < 80.0
)
"""
        + _rank_tail("score", "FROM frq", 10),
        "q_standard_points": _PRELUDE
        + _scored_cte(["spark"])
        + """
, stp AS (
  SELECT s.doc_id, s.score + 1.0 AS score
  FROM sc s JOIN documents d ON d.doc_id = s.doc_id
  WHERE d.n_chars BETWEEN 500 AND 1499
)
"""
        + _rank_tail("score", "FROM stp", 10),
        "q_fuzzy_like_this": _fuzzy_like_this_sql(["sprak", "tabel"], 1, 10),
        "text_lm_quality": _PRELUDE
        + _FT_BASE
        + """
, dbg AS (
  SELECT a.doc_id, a.term AS w1, b.term AS w2
  FROM tokp a JOIN tokp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
lp AS (
  SELECT dbg.doc_id,
         log2(CASE WHEN bg.cnt IS NOT NULL
                   THEN bg.cnt::DOUBLE / u1.cnt
                   WHEN u2.cnt IS NOT NULL
                   THEN 0.4 * u2.cnt / tot.n
                   ELSE 0.4 / tot.n END) AS l
  FROM dbg
  LEFT JOIN big bg ON bg.t1 = dbg.w1 AND bg.t2 = dbg.w2
  LEFT JOIN uni u1 ON u1.term = dbg.w1
  LEFT JOIN uni u2 ON u2.term = dbg.w2
  CROSS JOIN tot
)
SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       round(avg(l), 6) AS avg_logprob,
       round(pow(2, -avg(l)), 6) AS perplexity
FROM lp GROUP BY doc_id ORDER BY doc_id
""",
        "dedup_connected_components": """
WITH RECURSIVE prs AS (
  SELECT doc_id AS a,
         (doc_id * 2) % (SELECT count(*) FROM documents) AS b
  FROM documents WHERE doc_id % 3 = 0
),
sym AS (
  SELECT a AS src, b AS dst FROM prs WHERE a <> b
  UNION
  SELECT b, a FROM prs WHERE a <> b
),
reach AS (
  SELECT src AS id, src AS comp FROM sym
  UNION
  SELECT s.dst, r.comp FROM reach r JOIN sym s ON s.src = r.id
)
SELECT id::BIGINT AS id, min(comp)::BIGINT AS component
FROM reach GROUP BY id ORDER BY id
""",
        "q_xml_parsed": _PRELUDE
        + _scored_cte(["spark"])
        + """
, spf AS (
  SELECT p0.doc_id, sum(1.0 / (1.0 + (q.q1 + 1 - p0.pos))) AS freq
  FROM tokp p0, LATERAL (
    SELECT min(p1.pos) AS q1 FROM tokp p1
    WHERE p1.doc_id = p0.doc_id AND p1.term = 'table' AND p1.pos > p0.pos
  ) q
  WHERE p0.term = 'fast' AND q.q1 IS NOT NULL AND q.q1 - p0.pos - 1 <= 2
  GROUP BY p0.doc_id
),
xssc AS (
  SELECT spf.doc_id,
         ((ln(1 + (s.n - (SELECT df FROM dfreq WHERE term = 'fast') + 0.5)
                / ((SELECT df FROM dfreq WHERE term = 'fast') + 0.5))
           + ln(1 + (s.n - (SELECT df FROM dfreq WHERE term = 'table') + 0.5)
                  / ((SELECT df FROM dfreq WHERE term = 'table') + 0.5))))
         - ((ln(1 + (s.n - (SELECT df FROM dfreq WHERE term = 'fast') + 0.5)
                 / ((SELECT df FROM dfreq WHERE term = 'fast') + 0.5))
             + ln(1 + (s.n - (SELECT df FROM dfreq WHERE term = 'table') + 0.5)
                    / ((SELECT df FROM dfreq WHERE term = 'table') + 0.5))))
           / (1 + spf.freq * """
        + _INV.format(k1=K1, b=B)
        + """) AS score
  FROM spf JOIN dlq q ON q.doc_id = spf.doc_id CROSS JOIN stats s
),
xcomb AS (
  SELECT s.doc_id, s.score + coalesce(x.score, 0) AS score
  FROM sc s LEFT JOIN xssc x ON x.doc_id = s.doc_id
)
"""
        + _rank_tail("score", "FROM xcomb", 10),
        "q_facet_sampled": _PRELUDE
        + """
, m AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'spark'),
prm AS (
  SELECT count(*)::BIGINT AS n,
         trunc(1.0 / ((1.0 * 50) / count(*)))::BIGINT AS binsize,
         ((1.0 * 50) / count(*)) AS rate
  FROM m
),
rng AS (
  -- xorshift64 (RandomSamplingFacetsCollector.java:48-70) unrolled as an
  -- iterative state table over HUGEINT mod-2^64 arithmetic
  WITH RECURSIVE st(b, x) AS (
    SELECT -1, 42::HUGEINT
    UNION ALL
    SELECT b + 1,
           xor(y2, (y2 * 16) % 18446744073709551616::HUGEINT)
    FROM (
      SELECT b, xor(y1, y1 // 34359738368) AS y2 FROM (
        SELECT b, xor(x, (x * 2097152) % 18446744073709551616::HUGEINT) AS y1
        FROM st
      )
    ), prm
    WHERE b + 1 <= (prm.n / prm.binsize)
  )
  SELECT b,
         abs(CASE WHEN x >= 9223372036854775808::HUGEINT
                  THEN x - 18446744073709551616::HUGEINT ELSE x END
             % (SELECT binsize FROM prm))::BIGINT AS idx
  FROM st WHERE b >= 0
),
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS r FROM m
),
sampled AS (
  SELECT ranked.doc_id FROM ranked, prm
  JOIN rng ON rng.b = ranked.r // prm.binsize
  WHERE ranked.r % prm.binsize = rng.idx
)
SELECT d.lang AS cat,
       trunc(count(*) / (SELECT rate FROM prm))::BIGINT AS amortized
FROM sampled s JOIN documents d ON d.doc_id = s.doc_id
GROUP BY d.lang ORDER BY cat
""",
        "q_surround": _span_near_slots_sql(
            [["scan"], ["fast", "slow"]], 2
        ),
        "q_high_freq_terms": _PRELUDE
        + """
SELECT term, count(*)::BIGINT AS doc_freq, sum(freq)::BIGINT AS total_term_freq
FROM tf GROUP BY term
ORDER BY total_term_freq DESC, term DESC LIMIT 15
""",
        "q_complex_phrase": _span_near_slots_sql(
            [["fast", "slow"], "term LIKE 'tab%'"], 3
        ),
        "q_term_automaton": _PRELUDE
        + """
, taf AS (
  SELECT p0.doc_id, count(*)::BIGINT AS freq
  FROM tokp p0 JOIN tokp p2 ON p2.doc_id = p0.doc_id AND p2.pos = p0.pos + 2
  WHERE p0.term = 'fast' AND p2.term = 'table'
  GROUP BY p0.doc_id
),
tasc AS (
  SELECT taf.doc_id,
         ((ln(1 + (s.n - (SELECT df FROM dfreq WHERE term = 'fast') + 0.5)
                / ((SELECT df FROM dfreq WHERE term = 'fast') + 0.5))
           + ln(1 + (s.n - (SELECT df FROM dfreq WHERE term = 'table') + 0.5)
                  / ((SELECT df FROM dfreq WHERE term = 'table') + 0.5))))
         - ((ln(1 + (s.n - (SELECT df FROM dfreq WHERE term = 'fast') + 0.5)
                 / ((SELECT df FROM dfreq WHERE term = 'fast') + 0.5))
             + ln(1 + (s.n - (SELECT df FROM dfreq WHERE term = 'table') + 0.5)
                    / ((SELECT df FROM dfreq WHERE term = 'table') + 0.5))))
           / (1 + taf.freq * """
        + _INV.format(k1=K1, b=B)
        + """) AS score
  FROM taf JOIN dlq q ON q.doc_id = taf.doc_id CROSS JOIN stats s
)
"""
        + _rank_tail("score", "FROM tasc", 10),
        "q_sim_sweetspot": _PRELUDE
        + """
, ssc AS (
  SELECT tf.doc_id,
         (CASE WHEN tf.freq <= 2 THEN 1.5
               ELSE sqrt(tf.freq + 1.5 * 1.5 - 2) END)
         * (ln((s.n + 1) / (d.df + 1)) + 1)
         * (1.0 / sqrt(0.5 * (abs(q.dlq - 3) + abs(q.dlq - 30) - (30 - 3)) + 1))
           AS score
  FROM tf JOIN dfreq d ON d.term = tf.term JOIN dlq q ON q.doc_id = tf.doc_id
  CROSS JOIN stats s WHERE tf.term = 'spark'
)
"""
        + _rank_tail("score", "FROM ssc", 10),
        "q_dv_stats": _PRELUDE
        + """
, m AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'spark'),
j AS (SELECT d.n_chars FROM documents d JOIN m ON m.doc_id = d.doc_id)
SELECT count(n_chars)::BIGINT AS cnt,
       (count(*) - count(n_chars))::BIGINT AS missing,
       min(n_chars)::BIGINT AS mn, max(n_chars)::BIGINT AS mx,
       sum(n_chars)::BIGINT AS total,
       round(avg(n_chars::DOUBLE), 6) AS mean,
       round(coalesce(var_pop(n_chars::DOUBLE), 0), 6) AS variance,
       round(sqrt(coalesce(var_pop(n_chars::DOUBLE), 0)), 6) AS stdev
FROM j
""",
        "q_geo_distance_sort": """
WITH pts AS (
  SELECT c_custkey::BIGINT AS doc_id,
         ((c_custkey * 7) % 180 - 90 + 0.5)::DOUBLE AS lat,
         ((c_custkey * 13) % 360 - 180 + 0.5)::DOUBLE AS lon
  FROM customer
),
d AS (
  SELECT doc_id,
         2.0 * 6371008.7714 * asin(least(1.0, sqrt(
           sin(radians(10.0 - lat) / 2) * sin(radians(10.0 - lat) / 2)
           + cos(radians(lat)) * cos(radians(10.0))
             * sin(radians(20.0 - lon) / 2) * sin(radians(20.0 - lon) / 2)
         ))) AS distance_m
  FROM pts
)
SELECT doc_id, round(distance_m, 6) AS distance_m
FROM d ORDER BY distance_m ASC, doc_id ASC LIMIT 10
""",
        "q_index_sort_range": """
WITH nid AS (
  SELECT row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS doc_id, n_chars
  FROM documents
)
SELECT doc_id::BIGINT AS doc_id FROM nid
WHERE n_chars BETWEEN 500 AND 1500 ORDER BY doc_id
""",
        "q_free_text_next_word": _free_text_next_word_sql("fast"),
        "q_free_text_backoff": _free_text_backoff_sql("fast", "t"),
        "q_simple_parsed": _simple_parsed_sql(),
        "q_simple_parsed_prefix_phrase": _simple_parsed_prefix_phrase_sql(),
        "q_facet_long_values": (
            _PRELUDE
            + """
SELECT (d.n_chars % 16)::BIGINT AS value, count(*)::BIGINT AS cnt
FROM documents d
JOIN (SELECT DISTINCT doc_id FROM tf WHERE term = 'spark') m
  ON m.doc_id = d.doc_id
GROUP BY 1 ORDER BY cnt DESC, value ASC LIMIT 10
"""
        ),
        "q_facet_assoc_sum": (
            _PRELUDE
            + """
SELECT d.lang AS cat, sum(d.n_chars % 100)::BIGINT AS total
FROM documents d
JOIN (SELECT DISTINCT doc_id FROM tf WHERE term = 'spark') m
  ON m.doc_id = d.doc_id
GROUP BY 1 ORDER BY total DESC, cat ASC
"""
        ),
        "q_diversified_topk": _diversified_sql("spark", 10, 2),
        "q_blended_term": _blended_term_sql("spark", 1.0, "merge", 2.0, 0.1),
        "q_join_util_avg": _join_util_sql("spark", "avg"),
        "q_join_util_max": _join_util_sql("merge", "max"),
        "q_multifield": _multifield_sql(),
        "q_multi_phrase": _multi_phrase_sql([["fast", "slow"], ["table"]]),
        "q_phrase_slop2": _phrase_slop_sql(["fast", "table"], 2),
        "q_phrase_slop_rpts": _phrase_slop_rpts_sql(["table", "the", "table"], 3),
        "q_multi_phrase_slop": _multi_phrase_slop_sql(
            [["fast", "slow"], ["table"]], 2
        ),
        "q_multi_phrase_slop_rpts": _multi_phrase_slop_sql(
            [["fast", "slow"], ["table"], ["fast"]], 3
        ),
        "q_phrase_stop_holes": _phrase_slop_sql(
            ["fast", "table"], 2, prelude=_stop_prelude(("the", "a"))
        ),
        "q_span_near_ordered": _span_near_sql(["spark", "table"], 4, True),
        "q_span_near_ordered3": _span_near_sql(["the", "fast", "table"], 6, True),
        "q_span_near_unordered": _span_near_sql(["spark", "table"], 4, False),
        "q_span_near_multiterm": _span_near_slots_sql(
            ["term LIKE 's%'", ["table"]], 3
        ),
        "q_span_near_or_slot": _span_near_slots_sql(
            [["fast", "slow"], ["table"]], 4
        ),
        "q_phrase_wildcard": _span_near_slots_sql(
            [["fast"], "{term} LIKE 't%e'"], 0
        ),
        "q_intervals_ordered": _intervals_sql(["the", "fast", "table"], True, 8),
        "q_intervals_unordered": _intervals_sql(["spark", "table"], False, -1),
        "q_span_containing": _span_containing_sql(
            ("near", ("the", "table"), 6, True), ("term", ("fast",), 0, True)
        ),
        "q_span_within": _span_within_sql(
            ("near", ("the", "table"), 8, False), ("term", ("fast",), 0, True)
        ),
        "q_span_unordered_dup": _span_unordered_dup2_sql("table", 2),
        "q_span_unordered_dup3": _span_unordered_machine_sql(
            ["table", "the", "table"], 5
        ),
        "q_intervals_unordered_dup": _intervals_dup_windows_sql("table", 2, 3),
        "q_intervals_unordered_dup3": _intervals_unordered_dups_machine_sql(
            ["table", "the", "table"], 6
        ),
        "q_intervals_or_slot": _intervals_slots_sql(
            [["fast", "slow"], ["table"]], True, 5
        ),
        "q_intervals_or_slot_unordered": _intervals_slots_sql(
            [["fast", "slow"], ["table", "value"]], False, 6
        ),
        "q_intervals_regexp": _intervals_slots_sql(
            ["regexp_full_match({term}, 't[ae]bles?')", ["fast"]], False, 6
        ),
        "q_intervals_prefix": _intervals_slots_sql(
            [["fast"], "{term} LIKE 's%'"], True, 6
        ),
        "q_intervals_wildcard": _intervals_slots_sql(
            ["{term} LIKE '%ow'", ["table"]], False, 5
        ),
        # OSA and true Damerau-Levenshtein coincide at max_edits=1, so
        # DuckDB's damerau_levenshtein is an independent parity metric here
        "q_intervals_fuzzy": _intervals_slots_sql(
            [["the"], "damerau_levenshtein({term}, 'tbale') <= 1"], True, 8
        ),
        "q_intervals_extend": _intervals_ext_sql(
            [["fast"], ["table"]], True, 4, 1, 2
        ),
        "q_intervals_atleast": _intervals_atleast_sql(
            [["spark"], ["table"], ["fast"], ["data"]], 3, 6
        ),
        "q_intervals_atleast_or_slot": _intervals_atleast_sql(
            [["fast", "slow"], ["table"], ["merge"]], 2, -1
        ),
        "q_intervals_ordered_dup": _intervals_sql(
            ["table", "the", "table"], True, 8
        ),
        "q_intervals_ordered_dup_adj": _intervals_sql(
            ["the", "table", "table"], True, 6, min_extent=2
        ),
        "q_intervals_containing": _interval_filter_sql(
            "containing", ["fast", "table"], False, ["the"], True
        ),
        "q_intervals_not_containing": _interval_filter_sql(
            "not_containing", ["fast", "table"], False, ["the"], True
        ),
        "q_intervals_contained_by": _interval_filter_sql(
            "contained_by", ["fast"], True, ["the", "table"], False
        ),
        "q_intervals_not_contained_by": _interval_filter_sql(
            "not_contained_by", ["fast"], True, ["the", "table"], False
        ),
        "q_intervals_overlapping": _interval_filter_sql(
            "overlapping", ["fast", "table"], False, ["the", "value"], False
        ),
        "q_intervals_non_overlapping": _interval_filter_sql(
            "non_overlapping", ["fast", "table"], False, ["the", "value"], False
        ),
        "q_intervals_before": _interval_filter_sql(
            "before", ["fast"], True, ["table"], True
        ),
        "q_intervals_after": _interval_filter_sql(
            "after", ["table"], True, ["fast"], True
        ),
        "q_intervals_maxwidth": _intervals_sql(
            ["the", "fast", "table"], False, -1, max_width=7
        ),
        "q_intervals_within": _interval_filter_sql(
            "within", ["fast", "table"], False, ["the"], True, positions=2
        ),
        "q_intervals_not_within": _interval_filter_sql(
            "not_within", ["fast", "table"], False, ["the"], True, positions=2
        ),
        "q_intervals_no_overlaps": _intervals_no_overlaps_sql("fast", "table"),
        "q_intervals_containing_or_slot": _interval_filter_slots_sql(
            [["fast", "slow"], ["table"]], False, ["the"], True
        ),
        "q_intervals_filter_maxwidth": _interval_filter_sql(
            "containing", ["fast", "table"], False, ["the"], True,
            src_max_width=8,
        ),
        # span algebra: point spans weigh 1/(1+(end-start)) = 0.5 each
        "q_span_or": _freq_rank_sql(
            "  SELECT doc_id, count(*) * 0.5 AS freq\n"
            "  FROM tok WHERE term IN ('spark', 'merge') GROUP BY doc_id",
            ["spark", "merge"],
        ),
        "q_span_not_span_exclude": _freq_rank_sql(
            # exclude is a SPAN: ordered slop-0 'slow table' windows
            # (xs, xs+2); keep 'fast' points with no window satisfying
            # xe > p - pre AND xs < p + 1 + post (pre = post = 1)
            "  SELECT i.doc_id, count(*) * 0.5 AS freq\n"
            "  FROM tokp i WHERE i.term = 'fast' AND NOT EXISTS (\n"
            "    SELECT 1 FROM tokp a JOIN tokp b\n"
            "      ON b.doc_id = a.doc_id AND b.pos = a.pos + 1\n"
            "    WHERE a.doc_id = i.doc_id AND a.term = 'slow'\n"
            "      AND b.term = 'table'\n"
            "      AND a.pos + 2 > i.pos - 1 AND a.pos < i.pos + 1 + 1)\n"
            "  GROUP BY i.doc_id",
            ["fast"],
        ),
        "q_span_not": _freq_rank_sql(
            "  SELECT a.doc_id, count(*) * 0.5 AS freq\n"
            "  FROM tokp a WHERE a.term = 'table' AND NOT EXISTS (\n"
            "    SELECT 1 FROM tokp b WHERE b.doc_id = a.doc_id\n"
            "      AND b.term = 'fast' AND b.pos BETWEEN a.pos - 1 AND a.pos + 1)\n"
            "  GROUP BY a.doc_id",
            ["table"],
        ),
        "q_span_first": _freq_rank_sql(
            "  SELECT doc_id, count(*) * 0.5 AS freq\n"
            "  FROM tokp WHERE term = 'spark' AND pos + 1 <= 5 GROUP BY doc_id",
            ["spark"],
        ),
        "q_span_pos_range": _freq_rank_sql(
            "  SELECT doc_id, count(*) * 0.5 AS freq\n"
            "  FROM tokp WHERE term = 'table' AND pos >= 3 AND pos + 1 <= 25\n"
            "  GROUP BY doc_id",
            ["table"],
        ),
        # ordered greedy chain (as q_span_near_ordered) with the
        # position-range acceptance on the emitted window [p0, q1+1)
        "q_span_pos_range_near": _freq_rank_sql(
            "  SELECT doc_id, sum(1.0 / (q1 + 2 - p0)) AS freq\n"
            "  FROM s1 WHERE q1 - p0 - 1 <= 4 AND p0 >= 0 AND q1 + 1 <= 30\n"
            "  GROUP BY doc_id",
            ["fast", "table"],
            extra=(
                ", s0 AS (SELECT doc_id, pos AS p0, pos AS q0 FROM tokp"
                " WHERE term = 'fast')"
                ", s1 AS (\n"
                "  SELECT s.doc_id, s.p0, min(t.pos) AS q1\n"
                "  FROM s0 s JOIN tokp t ON t.doc_id = s.doc_id"
                " AND t.term = 'table' AND t.pos > s.q0\n"
                "  GROUP BY s.doc_id, s.p0\n)"
            ),
        ),
        "q_span_masked_stop": _span_masked_stop_sql(),
        "q_intervals_fixfield": _intervals_fixfield_sql(),
        "q_intervals_fixfield_or": _intervals_fixfield_sql(
            slot0_pred="term IN ('the', 'a')", max_gaps=4
        ),
        "q_multifield_bare": _multifield_bare_sql("en"),
        "text_highlight": """
WITH m AS (SELECT doc_id, text, lower(text) AS lt FROM documents),
pos AS (
  SELECT doc_id, text,
         NULLIF(position('spark' IN lt), 0) AS p1,
         NULLIF(position('merge' IN lt), 0) AS p2
  FROM m
),
pick AS (
  SELECT doc_id, text,
         CASE WHEN p1 IS NOT NULL AND (p2 IS NULL OR p1 <= p2) THEN p1 ELSE p2 END AS p,
         CASE WHEN p1 IS NOT NULL AND (p2 IS NULL OR p1 <= p2) THEN 5 ELSE 5 END AS tl
  FROM pos WHERE COALESCE(p1, p2) IS NOT NULL
)
SELECT doc_id::BIGINT AS doc_id,
       regexp_replace(
         substr(text, greatest(1, p - 40), (p - greatest(1, p - 40)) + tl + 40),
         '(?i)(spark|merge)', '<b>\\1</b>', 'g') AS snippet
FROM pick ORDER BY doc_id
""",
        "q_feature_boost": _PRELUDE
        + _scored_cte(["spark"])
        + """
, fsc AS (
  SELECT doc_id::BIGINT AS doc_id, 0.05 * ln(1 + n_chars) AS score
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
),
allsc AS (
  SELECT doc_id, score FROM sc
  UNION ALL SELECT doc_id, score FROM fsc
),
agg AS (SELECT doc_id, sum(score) AS score FROM allsc GROUP BY doc_id)
"""
        + _rank_tail("score", "FROM agg", 10),
        "q_term_deleted": _PRELUDE
        + _scored_cte(["table"])
        + _rank_tail("score", "FROM sc WHERE doc_id NOT IN (0, 1, 2)", 10),
        "q_term_soft_deleted": _PRELUDE
        + _scored_cte(["table"])
        + _rank_tail("score", "FROM sc WHERE doc_id NOT IN (3, 4, 5)", 10),
        "q_docvalues_update": _PRELUDE
        + """
SELECT doc_id, n_chars FROM (
  SELECT d.doc_id::BIGINT AS doc_id,
         (CASE WHEN d.doc_id IN (0, 1, 2, 3, 4) THEN 99999
               ELSE d.n_chars END)::BIGINT AS n_chars
  FROM documents d WHERE EXISTS (
    SELECT 1 FROM tf WHERE tf.doc_id = d.doc_id AND tf.term = 'vector')
) ORDER BY n_chars DESC, doc_id ASC LIMIT 10
""",
        "q_term_vectors": _PRELUDE
        + """
SELECT tf.doc_id::BIGINT AS doc_id, tf.term, tf.freq,
       tf.freq::INT AS n_pos
FROM tf WHERE tf.doc_id < 3 ORDER BY doc_id, term
""",
        "q_parsed": _bool_topk_sql(must=["merge", "table"]),
        "q_common_terms": _common_terms_sql(["the", "a", "spark", "vector"], 0.1),
        "q_mlt_doc0": _mlt_sql(0, 5, 2),
        "q_mlt_boosted": _mlt_sql(0, 5, 2, boosted=True),
        "q_synonym": _synonym_sql(["spark", "stream"]),
        "q_dismax": _dismax_sql(["spark", "vector"], 0.1),
        "q_prefix": _const_docs_sql("t.term LIKE 's%'"),
        "q_prefix_broad": f"""
WITH tok AS (
  SELECT c_custkey AS doc_id,
         unnest(regexp_extract_all(lower(c_name), '{_TOKRE}')) AS term
  FROM customer
)
SELECT DISTINCT doc_id::BIGINT AS doc_id FROM tok WHERE term LIKE '0%' ORDER BY doc_id
""",
        "q_wildcard": _const_docs_sql("regexp_matches(t.term, '^(?:.*a.*k)$')"),
        "q_regexp": _const_docs_sql("regexp_matches(t.term, '^(?:[sv].*r)$')"),
        "q_regexp_lucene_syntax": _const_docs_sql(
            "regexp_matches(t.term, '^(?:s.*)$')"
        ),
        "q_regexp_intersection": _const_docs_sql(
            "regexp_matches(t.term, '^(?:s.*)$') AND regexp_matches(t.term, '^(?:.*a.*)$')"
        ),
        "q_regexp_complement": _const_docs_sql(
            "regexp_matches(t.term, '^(?:s.*)$') AND NOT regexp_matches(t.term, '^(?:.*k)$')"
        ),
        "q_regexp_interval": f"""
WITH tok AS (
  SELECT c_custkey AS doc_id,
         unnest(regexp_extract_all(lower(c_name), '{_TOKRE}')) AS term
  FROM customer
)
SELECT DISTINCT doc_id::BIGINT AS doc_id FROM tok
WHERE regexp_matches(term, '^(?:0*(?:[1-9]|1[0-9]|20))$') ORDER BY doc_id
""",
        # nested-automaton-op patterns, hand-derived to plain-regex algebra:
        # s(.*a.*&.*r.*) = 's' then a tail containing both 'a' and 'r'
        "q_regexp_nested_inter": _const_docs_sql(
            "regexp_matches(t.term, '^(?:s.*)$') "
            "AND regexp_matches(substr(t.term, 2), '^(?:.*a.*)$') "
            "AND regexp_matches(substr(t.term, 2), '^(?:.*r.*)$')"
        ),
        # s(~(low)&@) = 's' then any tail that is not the literal 'low'
        "q_regexp_nested_compl": _const_docs_sql(
            "regexp_matches(t.term, '^(?:s.*)$') AND t.term <> 'slow'"
        ),
        # (<1-20>&0*1[0-9]) = zero-paddable values 1..20 that are also
        # 0*1[0-9] — i.e. the key tokens 10..19
        "q_regexp_nested_interval": f"""
WITH tok AS (
  SELECT c_custkey AS doc_id,
         unnest(regexp_extract_all(lower(c_name), '{_TOKRE}')) AS term
  FROM customer
)
SELECT DISTINCT doc_id::BIGINT AS doc_id FROM tok
WHERE regexp_matches(term, '^(?:0*(?:[1-9]|1[0-9]|20))$')
  AND regexp_matches(term, '^(?:0*1[0-9])$') ORDER BY doc_id
""",
        "q_term_range": _const_docs_sql("t.term >= 'query' AND t.term <= 'sort'"),
        "q_term_range_excl": _const_docs_sql(
            "t.term > 'query' AND t.term < 'sort'"
        ),
        "q_term_in_set": _const_docs_sql("t.term IN ('spark', 'vector', 'nope')"),
        "q_fuzzy": _const_docs_sql("levenshtein(t.term, 'sprk') <= 1"),
        "q_fuzzy_transpositions": _const_docs_sql(
            "damerau_levenshtein(t.term, 'sprak') <= 1"
        ),
        # deterministic pseudo-coordinates from c_custkey; same haversine
        # (mean radius 6371008.7714 m) on both engines, rounded to mm
        "q_geo_polygon_holes": """
WITH pts AS (
  SELECT c_custkey::BIGINT AS doc_id,
         ((c_custkey * 7) % 180 - 90 + 0.5)::DOUBLE AS lat,
         ((c_custkey * 13) % 360 - 180 + 0.5)::DOUBLE AS lon
  FROM customer
)
SELECT doc_id, lat, lon FROM pts
WHERE lat >= -60.0 AND lat <= 60.0 AND lon >= -150.0 AND lon <= -30.0
  AND ("""
        + _raycast_sql([(-60.0, -150.0), (60.0, -150.0), (60.0, -30.0),
                        (-60.0, -30.0)])
        + """)
  AND NOT ("""
        + _raycast_sql([(-20.0, -120.0), (20.0, -120.0), (20.0, -60.0),
                        (-20.0, -60.0)])
        + """)
ORDER BY doc_id
""",
        "q_geo_polygon": """
WITH pts AS (
  SELECT c_custkey::BIGINT AS doc_id,
         ((c_custkey * 7) % 180 - 90 + 0.5)::DOUBLE AS lat,
         ((c_custkey * 13) % 360 - 180 + 0.5)::DOUBLE AS lon
  FROM customer
)
SELECT doc_id, lat, lon FROM pts
WHERE lat >= 0.0 AND lat <= 60.0 AND lon >= -120.0 AND lon <= -10.0
  AND ((CASE WHEN ((0.0 > lat) <> (45.0 > lat)) AND (lon < (-10.0 - -60.0) * (lat - 0.0) / (45.0 - 0.0) + -60.0) THEN 1 ELSE 0 END) + (CASE WHEN ((45.0 > lat) <> (60.0 > lat)) AND (lon < (-90.0 - -10.0) * (lat - 45.0) / (60.0 - 45.0) + -10.0) THEN 1 ELSE 0 END) + (CASE WHEN ((60.0 > lat) <> (10.0 > lat)) AND (lon < (-120.0 - -90.0) * (lat - 60.0) / (10.0 - 60.0) + -90.0) THEN 1 ELSE 0 END) + (CASE WHEN ((10.0 > lat) <> (0.0 > lat)) AND (lon < (-60.0 - -120.0) * (lat - 10.0) / (0.0 - 10.0) + -120.0) THEN 1 ELSE 0 END)) % 2 = 1
ORDER BY doc_id
""",
        "q_geo_distance": """
WITH pts AS (
  SELECT c_custkey::BIGINT AS doc_id,
         ((c_custkey * 7) % 180 - 90 + 0.5)::DOUBLE AS lat,
         ((c_custkey * 13) % 360 - 180 + 0.5)::DOUBLE AS lon
  FROM customer
),
dist AS (
  SELECT doc_id,
         round(2.0 * 6371008.7714 * asin(least(1.0, sqrt(
           pow(sin(radians(lat - 10.0) / 2), 2)
           + cos(radians(10.0)) * cos(radians(lat))
             * pow(sin(radians(lon - 20.0) / 2), 2)
         ))), 3) AS distance_m
  FROM pts
)
SELECT doc_id, distance_m FROM dist
WHERE distance_m <= 2000000.0 ORDER BY doc_id
""",
        "q_point_range": """
SELECT DISTINCT doc_id::BIGINT AS doc_id FROM documents
WHERE n_chars IS NOT NULL AND n_chars BETWEEN 200 AND 400 ORDER BY doc_id
""",
        "q_point_in_set": """
SELECT DISTINCT doc_id::BIGINT AS doc_id FROM documents
WHERE n_chars IN (200, 250, 300) ORDER BY doc_id
""",
        "q_docvalues_terms": """
SELECT DISTINCT doc_id::BIGINT AS doc_id FROM documents
WHERE lang IN ('en', 'fr') ORDER BY doc_id
""",
        "q_multi_range": """
SELECT DISTINCT doc_id::BIGINT AS doc_id FROM documents
WHERE (n_chars BETWEEN 100 AND 300) OR (n_chars BETWEEN 2000 AND 2500)
ORDER BY doc_id
""",
        "q_total_hits": _PRELUDE
        + """
SELECT count(*)::BIGINT AS total_hits FROM (
  SELECT doc_id FROM tf WHERE term IN ('spark', 'vector')
  GROUP BY doc_id HAVING count(DISTINCT term) = 2
)
""",
        "q_match_all_count": "SELECT count(*)::BIGINT AS total_hits FROM documents",
        "q_terms_stats": _PRELUDE
        + """
SELECT term, count(*)::BIGINT AS doc_freq, sum(freq)::BIGINT AS total_term_freq
FROM tf GROUP BY term ORDER BY doc_freq DESC, term ASC LIMIT 20
""",
        "q_norms": _PRELUDE
        + """
SELECT d.doc_id::BIGINT AS doc_id, coalesce(n.len, 0)::BIGINT AS length,
       coalesce(n.nb, 0)::INT AS norm_byte
FROM documents d LEFT JOIN nrm n ON n.doc_id = d.doc_id ORDER BY doc_id
""",
        "q_field_stats": _PRELUDE
        + """
SELECT n::BIGINT AS doc_count, sttf::BIGINT AS sum_total_term_freq FROM stats
""",
        "q_facet_lang": _PRELUDE
        + """
SELECT d.lang, count(*)::BIGINT AS cnt
FROM documents d WHERE EXISTS (
  SELECT 1 FROM tf WHERE tf.doc_id = d.doc_id AND tf.term = 'spark')
GROUP BY d.lang ORDER BY d.lang
""",
        "q_facet_range_nchars": _PRELUDE
        + """
SELECT (floor(d.n_chars / 100) * 100)::BIGINT AS bucket, count(*)::BIGINT AS cnt
FROM documents d WHERE EXISTS (
  SELECT 1 FROM tf WHERE tf.doc_id = d.doc_id AND tf.term = 'table')
GROUP BY bucket ORDER BY bucket
""",
        "q_facet_taxonomy": _PRELUDE
        + """
, base AS (
  SELECT d.doc_id, d.lang || '/' || d.source AS path FROM documents d
  WHERE EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = d.doc_id AND tf.term = 'table')
),
pref AS (
  SELECT doc_id, lang AS path FROM (
    SELECT doc_id, string_split(path, '/')[1] AS lang FROM base)
  UNION ALL SELECT doc_id, path FROM base
)
SELECT path, count(*)::BIGINT AS cnt FROM pref GROUP BY path ORDER BY path
""",
        "q_facet_taxonomy_deep": _PRELUDE
        + """
, base AS (
  SELECT d.doc_id,
         d.lang || '/' || d.source || '/' ||
         (CASE WHEN d.n_chars >= 300 THEN 'big' ELSE 'small' END) AS path
  FROM documents d
  WHERE EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = d.doc_id AND tf.term = 'table')
),
pref AS (
  SELECT doc_id, string_split(path, '/')[1] AS path FROM base
  UNION ALL
  SELECT doc_id, string_split(path, '/')[1] || '/' || string_split(path, '/')[2] FROM base
  UNION ALL SELECT doc_id, path FROM base
)
SELECT path, count(*)::BIGINT AS cnt FROM pref
WHERE path LIKE 'en%' GROUP BY path ORDER BY path
""",
        "q_drilldown": _PRELUDE
        + """
SELECT DISTINCT d.doc_id::BIGINT AS doc_id
FROM documents d
WHERE EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = d.doc_id AND tf.term = 'table')
  AND d.lang IN ('en', 'de') AND d.source IN ('src1', 'src2', 'src3')
ORDER BY doc_id
""",
        "q_drill_sideways": _PRELUDE
        + """
, base AS (
  SELECT d.doc_id, d.lang, d.source FROM documents d
  WHERE EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = d.doc_id AND tf.term = 'table')
),
lang_side AS (
  SELECT 'lang' AS dim, lang AS label, count(*)::BIGINT AS cnt
  FROM base WHERE source IN ('src1', 'src2', 'src3') GROUP BY lang
),
src_side AS (
  SELECT 'source' AS dim, source AS label, count(*)::BIGINT AS cnt
  FROM base WHERE lang IN ('en', 'de') GROUP BY source
)
SELECT dim, label, cnt FROM (
  SELECT * FROM lang_side UNION ALL SELECT * FROM src_side
) ORDER BY dim, label
""",
        "q_facet_topk": _PRELUDE
        + """
SELECT 'lang' AS dim, label, cnt FROM (
  SELECT d.lang AS label, count(*)::BIGINT AS cnt
  FROM documents d WHERE EXISTS (
    SELECT 1 FROM tf WHERE tf.doc_id = d.doc_id AND tf.term = 'table')
  GROUP BY d.lang
) ORDER BY cnt DESC, label ASC LIMIT 3
""",
        "q_group_top2_per_lang": _PRELUDE
        + _scored_cte(["data"])
        + """
SELECT lang, rank_in_group, doc_id, score FROM (
  SELECT d.lang, sc.doc_id::BIGINT AS doc_id, round(sc.score, 6) AS score,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY round(sc.score, 6) DESC, sc.doc_id ASC)::INT AS rank_in_group
  FROM sc JOIN documents d ON d.doc_id = sc.doc_id
) WHERE rank_in_group <= 2 ORDER BY lang, rank_in_group
""",
        "q_suggest_prefix": _PRELUDE
        + """
SELECT term AS key, count(*)::BIGINT AS weight
FROM tf WHERE term LIKE 's%'
GROUP BY term ORDER BY weight DESC, key ASC LIMIT 5
""",
        "q_suggest_infix": _PRELUDE
        + """
SELECT term AS key, count(*)::BIGINT AS weight
FROM tf WHERE term LIKE '%ar%'
GROUP BY term ORDER BY weight DESC, key ASC LIMIT 5
""",
        # fuzzy suggest at max_edits=1 where OSA == true Damerau: some
        # PREFIX of the term (length 4..6) within 1 edit of 'spark',
        # first char exact (DEFAULT_NON_FUZZY_PREFIX)
        "q_suggest_fuzzy": _PRELUDE
        + """
SELECT term AS key, count(*)::BIGINT AS weight
FROM tf WHERE term LIKE 's%' AND (
     damerau_levenshtein('spark', substr(term, 1, 4)) <= 1
  OR damerau_levenshtein('spark', substr(term, 1, 5)) <= 1
  OR damerau_levenshtein('spark', substr(term, 1, 6)) <= 1
)
GROUP BY term ORDER BY weight DESC, key ASC LIMIT 5
""",
        "q_word_break": _PRELUDE
        + """
, dfx AS (SELECT term, count(*)::BIGINT AS w FROM tf GROUP BY term),
sp AS (
  SELECT i::INT AS i, substr('sparktable', 1, i::INT) AS l,
         substr('sparktable', i::INT + 1) AS r
  FROM range(1, 10) t(i)
),
j AS (
  SELECT sp.i, sp.l, sp.r, dl.w AS lf, dr.w AS rf
  FROM sp JOIN dfx dl ON dl.term = sp.l JOIN dfx dr ON dr.term = sp.r
  WHERE dl.w >= 1 AND dr.w >= 1
)
SELECT l AS left_term, r AS right_term, lf AS left_freq, rf AS right_freq
FROM j ORDER BY greatest(lf, rf) DESC, i ASC LIMIT 5
""",
        "q_word_break_multi": _PRELUDE
        + """
, dfx AS (SELECT term, count(*)::BIGINT AS w FROM tf GROUP BY term),
s1 AS (
  SELECT 1 AS c, [substr('sparktable', 1, i::INT),
                  substr('sparktable', i::INT + 1)] AS parts
  FROM range(1, 10) t(i)
),
s2 AS (
  SELECT 2 AS c, [substr('sparktable', 1, i::INT),
                  substr('sparktable', i::INT + 1, (j - i)::INT),
                  substr('sparktable', j::INT + 1)] AS parts
  FROM range(1, 10) a(i), range(1, 10) b(j) WHERE j > i
),
cand AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2),
px AS (SELECT c, parts, unnest(parts) AS part FROM cand),
j AS (
  SELECT c, parts, count(d.term) AS matched, min(d.w) AS minf,
         max(d.w) AS maxf
  FROM px LEFT JOIN dfx d ON d.term = px.part GROUP BY c, parts
),
ok AS (
  SELECT array_to_string(parts, ' ') AS parts, c::INT AS num_changes,
         maxf AS max_freq
  FROM j WHERE matched = len(parts) AND minf >= 1
)
SELECT parts, num_changes, max_freq FROM ok
ORDER BY num_changes, max_freq DESC, parts LIMIT 5
""",
        "q_word_combine": _PRELUDE
        + """
, dfx AS (SELECT term, count(*)::BIGINT AS w FROM tf GROUP BY term),
pairs AS (
  SELECT * FROM (VALUES (0, 'spark', 'table', 'sparktable'),
                        (1, 'table', 'data', 'tabledata')) AS v(idx, a, b, combined)
),
j AS (
  SELECT p.idx, p.combined, dc.w AS cf,
         coalesce(da.w, 0) AS af, coalesce(db.w, 0) AS bf
  FROM pairs p JOIN dfx dc ON dc.term = p.combined
  LEFT JOIN dfx da ON da.term = p.a LEFT JOIN dfx db ON db.term = p.b
)
SELECT idx::INT AS idx, combined, cf AS freq FROM j
WHERE cf >= 1 AND cf >= greatest(af, bf) ORDER BY idx
""",
        # DirectSpellChecker: score = 1 - d/min(|word|, |cand|), accuracy
        # 0.5, freq > 0, score desc / freq desc / term asc
        "q_spell_lucene_lev": _PRELUDE
        + """
, dfx AS (SELECT term, count(*)::BIGINT AS weight FROM tf GROUP BY term),
sc AS (
  SELECT term AS key, weight,
         round(1 - damerau_levenshtein('sparkk', term)::DOUBLE
                   / least(length(term), 6), 6) AS score
  FROM dfx
  WHERE term <> 'sparkk' AND term LIKE 's%'
    AND length(term) BETWEEN 5 AND 7
    AND damerau_levenshtein('sparkk', term) <= 1
    AND (1 - damerau_levenshtein('sparkk', term)::DOUBLE
             / least(length(term), 6)) >= 0.5
    AND weight > 0
)
SELECT key, weight, score FROM sc
ORDER BY score DESC, weight DESC, key ASC LIMIT 5
""",
        "q_spell_suggest": _PRELUDE
        + """
, dfx AS (SELECT term, count(*)::BIGINT AS weight FROM tf GROUP BY term),
sc AS (
  SELECT term AS key, weight,
         round(1 - damerau_levenshtein('sparkk', term)::DOUBLE
                   / greatest(least(6, length(term)), 1), 6) AS score
  FROM dfx
  WHERE term <> 'sparkk' AND term LIKE 's%'
    AND length(term) BETWEEN 5 AND 7
    AND damerau_levenshtein('sparkk', term) <= 1
    AND (1 - damerau_levenshtein('sparkk', term)::DOUBLE
             / greatest(least(6, length(term)), 1)) >= 0.5
    AND weight > 0
)
SELECT key, weight, score FROM sc
ORDER BY score DESC, weight DESC, key ASC LIMIT 5
""",
        "text_highlight_unified": _PRELUDE
        + """
, qidf AS (
  SELECT d.term, ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) AS idf
  FROM dfreq d CROSS JOIN stats s WHERE d.term IN ('spark', 'merge')
),
ptok AS (SELECT doc_id, pos, term, (pos // 16)::INT AS passage FROM tokp),
psc AS (
  SELECT doc_id, passage, sum(idf) AS score FROM (
    SELECT DISTINCT p.doc_id, p.passage, p.term, q.idf
    FROM ptok p JOIN qidf q ON q.term = p.term
  ) GROUP BY doc_id, passage
),
best AS (
  SELECT doc_id, passage, score FROM (
    SELECT doc_id, passage, score,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, passage ASC) AS rk
    FROM psc
  ) WHERE rk = 1
)
SELECT p.doc_id::BIGINT AS doc_id, b.passage::INT AS passage,
       round(b.score, 6) AS score,
       string_agg(
         CASE WHEN p.term IN ('spark', 'merge')
              THEN '<b>' || p.term || '</b>' ELSE p.term END,
         ' ' ORDER BY p.pos) AS snippet
FROM ptok p JOIN best b ON b.doc_id = p.doc_id AND b.passage = p.passage
GROUP BY p.doc_id, b.passage, b.score
ORDER BY doc_id
""",
        "q_group_distinct_values": _PRELUDE
        + """
SELECT d.lang, count(DISTINCT d.source)::BIGINT AS n_sources
FROM documents d
JOIN (SELECT DISTINCT doc_id FROM tf WHERE term = 'data') m
  ON m.doc_id = d.doc_id
GROUP BY d.lang ORDER BY d.lang
""",
        "q_all_groups_count": _PRELUDE
        + """
SELECT count(DISTINCT d.lang)::BIGINT AS n_groups
FROM documents d
JOIN (SELECT DISTINCT doc_id FROM tf WHERE term = 'data') m
  ON m.doc_id = d.doc_id
""",
        "q_group_top1_per_lang": _PRELUDE
        + _scored_cte(["data"])
        + """
SELECT lang, doc_id, score FROM (
  SELECT d.lang, sc.doc_id::BIGINT AS doc_id, round(sc.score, 6) AS score,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY round(sc.score, 6) DESC, sc.doc_id ASC) AS rn
  FROM sc JOIN documents d ON d.doc_id = sc.doc_id
) WHERE rn = 1 ORDER BY lang
""",
        "q_sort_by_field": _PRELUDE
        + """
SELECT d.doc_id::BIGINT AS doc_id, d.n_chars::BIGINT AS n_chars
FROM documents d WHERE EXISTS (
  SELECT 1 FROM tf WHERE tf.doc_id = d.doc_id AND tf.term = 'vector')
ORDER BY d.n_chars DESC, d.doc_id ASC LIMIT 10
""",
        "q_term_fr": _lang_term_sql("french", "cheval"),
        "q_term_de": _lang_term_sql("german", "stimm"),
        "q_term_es": _lang_term_sql("spanish", "niñ"),
        "q_term_it": _lang_term_sql("italian", "acqua"),
        "q_term_pt": _lang_term_sql("portuguese", "canca"),
        "q_term_sv": _lang_term_sql("swedish", "anteckning"),
        "q_term_da": _lang_term_sql("danish", "betal"),
        "q_term_no": _lang_term_sql("norwegian", "merkevar"),
        "q_term_ru": _lang_term_sql("russian", "славн"),
        "q_term_nl": _lang_term_sql("dutch", "drad"),
        "q_term_fi": _lang_term_sql("finnish", "haast"),
        "q_term_hu": _lang_term_sql("hungarian", "lemez"),
        "q_term_ro": _lang_term_sql("romanian", "comunist"),
        "q_term_tr": _lang_term_sql("turkish", "çelişki"),
        "q_term_ar": _lang_term_sql("arabic", "حسن"),
        "q_term_fa": _lang_term_sql("persian", "كتاب"),
        "q_term_bg": _lang_term_sql("bulgarian", "град"),
        "q_term_cz": _lang_term_sql("czech", "hrad"),
        "q_term_ckb": _lang_term_sql("sorani", "پیاو"),
        "q_term_hi": _lang_term_sql("hindi", "लडक"),
        "q_term_bn": _lang_term_sql("bengali", "কর"),
        "q_term_id": _lang_term_sql("indonesian", "buku"),
        "q_term_lv": _lang_term_sql("latvian", "lāc"),
        "q_term_el": _lang_term_sql("greek", "ανθρωπ"),
        "q_term_br": _lang_term_sql("brazilian", "boat"),
        "q_term_gl": _lang_term_sql("galician", "acept"),
        "q_term_pt_rslp": _lang_term_sql("portuguese_rslp", "abus"),
        "q_term_ga": _lang_term_sql("irish", "athair"),
        "q_term_hy": _lang_term_sql("armenian", "արծ"),
        "q_term_ca": _lang_term_sql("catalan", "llengu"),
        "q_term_eu": _lang_term_sql("basque", "zaldi"),
        "q_term_lt": _lang_term_sql("lithuanian", "vaik"),
        "q_term_et": _lang_term_sql("estonian", "kooli"),
        "q_term_cjk": _lang_term_sql("cjk", "学生"),
        "q_term_ru_light": _lang_term_sql("russian_light", "библ"),
        "q_term_fi_light": _lang_term_sql("finnish_light", "aapi"),
        "q_term_pt_minimal": _lang_term_sql("portuguese_minimal", "água"),
        "q_term_fr_minimal": _lang_term_sql("french_minimal", "amas"),
        "q_term_en_minimal": _lang_term_sql("english_minimal", "query"),
        "q_term_ne": _lang_term_sql("nepali", "भुल्"),
        "q_term_de_snowball": _lang_term_sql("german_snowball", "verwend"),
        "q_term_de2": _lang_term_sql("german2", "feu"),
        "q_term_en_snowball": _lang_term_sql("english_snowball", "continu"),
        "q_term_es_snowball": _lang_term_sql("spanish_snowball", "creador"),
        "q_term_it_snowball": _lang_term_sql("italian_snowball", "coltiv"),
        "q_term_pt_snowball": _lang_term_sql("portuguese_snowball",
                                             "motoriz"),
        "q_term_fr_snowball": _lang_term_sql("french_snowball", "ador"),
        "q_term_lovins": _lang_term_sql("lovins", "decept"),
        "q_term_en_kstem": _lang_term_sql("english_kstem", "abate"),
        "q_term_nl_kp": _lang_term_sql("dutch_kp", "boom"),
        "q_term_sr": _lang_term_sql("serbian", "devojk"),
        "q_term_th": _lang_term_sql("thai", "ภาษา"),
        "q_term_ja": _lang_term_sql("japanese", "東京"),
        "q_term_ja_katakana": _lang_term_sql("japanese", "コンピュータ"),
        "q_term_ko": _lang_term_sql("korean", "전자"),
        "q_term_ko_reading": _lang_term_sql("korean", "한자"),
        "q_term_zh": _lang_term_sql("chinese", "生命"),
        "q_term_zh_word": _lang_term_sql("chinese", "北京大学"),
        "q_synonym_index_term": _syn_prelude([("fast", ["quick"])])
        + _scored_cte(["quick"])
        + _rank_tail("score", "FROM sc", 10),
        "q_synonym_index_phrase": _phrase_sql(
            ["quick", "table"], prelude=_syn_prelude([("fast", ["quick"])])
        ),
        "q_compound_term": _compound_prelude(_COMPOUND_WORDS)
        + _scored_cte(["custom"])
        + _rank_tail("score", "FROM sc", 10),
        "q_term_hunspell": _hunspell_prelude(_HUNSPELL_MAP)
        + _scored_cte(["tabl"])
        + _rank_tail("score", "FROM sc", 10),
        "q_phrase_hunspell": _phrase_sql(
            ["fast", "tabl"], prelude=_hunspell_prelude(_HUNSPELL_MAP)
        ),
        "q_compound_phrase": _phrase_sql(
            ["custom", "query"], prelude=_compound_prelude(_COMPOUND_WORDS)
        ),
        "q_phonetic_term": _syn_prelude(_PHONETIC_MAP)
        + _scored_cte(["KSTM"])
        + _rank_tail("score", "FROM sc", 10),
        "q_phonetic_cross_match": _syn_prelude(_PHONETIC_MAP)
        + _scored_cte(["MRK"])
        + _rank_tail("score", "FROM sc", 10),
        "q_synonym_graph_bool": _graph_syn_bool_sql(),
        "q_synonym_graph_phrase": _graph_syn_phrase_sql(),
        "q_index_sorted_topk": _sorted_topk_sql("vector", 10, True),
        "q_index_sorted_topk_desc": _sorted_topk_sql("vector", 10, False),
        "q_search_after": _PRELUDE
        + _scored_cte(["table"])
        + """
SELECT rank, doc_id, score FROM (
  SELECT row_number() OVER (ORDER BY round(score, 6) DESC, doc_id ASC)::INT AS rank,
         doc_id::BIGINT AS doc_id, round(score, 6) AS score
  FROM sc
) WHERE rank > 10 AND rank <= 20 ORDER BY rank
""",
        "q_monitor": _monitor_sql(),
        "stream_dedup_first_seen": """
SELECT doc_id, text_md5 FROM (
  SELECT doc_id::BIGINT AS doc_id, md5(text) AS text_md5,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1 ORDER BY doc_id
""",
        # ClassicSimilarity: sqrt(freq) * (ln((N+1)/(df+1)) + 1) * 1/sqrt(dlq)
        # (ClassicSimilarity.java:38-64, TFIDFSimilarity.java:455-474)
        "q_sim_classic": _PRELUDE
        + """
, csc AS (
  SELECT tf.doc_id,
         sqrt(tf.freq) * (ln((s.n + 1) / (d.df + 1)) + 1) * (1.0 / sqrt(q.dlq)) AS score
  FROM tf JOIN dfreq d ON d.term = tf.term JOIN dlq q ON q.doc_id = tf.doc_id
  CROSS JOIN stats s WHERE tf.term = 'spark'
)
"""
        + _rank_tail("score", "FROM csc", 10),
        "q_sim_boolean": _PRELUDE
        + """
, bsc AS (SELECT DISTINCT doc_id, 1.0 AS score FROM tf WHERE term = 'spark')
"""
        + _rank_tail("score", "FROM bsc", 10),
        # LMDirichlet: max(0, ln(1 + freq/(mu*Pc)) + ln(mu/(dl+mu))), mu=2000,
        # Pc=(ttf+1)/(sttf+1) (LMDirichletSimilarity.java, LMSimilarity.java)
        "q_sim_lmdirichlet": _PRELUDE
        + """
, ttf AS (SELECT term, sum(freq)::DOUBLE AS v FROM tf GROUP BY term),
lsc AS (
  SELECT tf.doc_id,
         greatest(0.0,
           ln(1 + tf.freq / (2000.0 * ((t.v + 1) / (s.sttf + 1))))
           + ln(2000.0 / (q.dlq + 2000.0))) AS score
  FROM tf JOIN ttf t ON t.term = tf.term JOIN dlq q ON q.doc_id = tf.doc_id
  CROSS JOIN stats s WHERE tf.term = 'spark'
)
"""
        + _rank_tail("score", "FROM lsc", 10),
        # LMJelinekMercer (lambda=0.1): ln(1 + ((1-l)*freq/dl)/(l*Pc)),
        # Pc=(ttf+1)/(sttf+1) (LMJelinekMercerSimilarity.java:62-68)
        "q_sim_lmjm": _PRELUDE
        + """
, ttf AS (SELECT term, sum(freq)::DOUBLE AS v FROM tf GROUP BY term),
xsc AS (
  SELECT tf.doc_id,
         ln(1 + ((1 - 0.1) * tf.freq / q.dlq)
                / (0.1 * ((t.v + 1) / (s.sttf + 1)))) AS score
  FROM tf JOIN ttf t ON t.term = tf.term JOIN dlq q ON q.doc_id = tf.doc_id
  CROSS JOIN stats s WHERE tf.term = 'spark'
)
"""
        + _rank_tail("score", "FROM xsc", 10),
        # DFR GB2: BasicModelG+AfterEffectB+NormalizationH2(c=1)
        # (DFRSimilarity.java:104-108, BasicModelG.java:36-50,
        #  AfterEffectB.java:32-36, NormalizationH2.java:57-59)
        "q_sim_dfr": _PRELUDE
        + """
, ttf AS (SELECT term, sum(freq)::DOUBLE AS v FROM tf GROUP BY term),
parms AS (
  SELECT t.term,
         (t.v + 1) / (s.n + t.v + 1) AS lam,
         (t.v + 2) / (d.df + 1) AS ae
  FROM ttf t JOIN dfreq d ON d.term = t.term CROSS JOIN stats s
),
xsc AS (
  SELECT tf.doc_id,
         (log2((1 + p.lam) / p.lam)
          - (log2((1 + p.lam) / p.lam) - log2(p.lam + 1))
            / (1 + tf.freq * log2(1 + (s.sttf / s.n) / q.dlq)))
         * p.ae AS score
  FROM tf JOIN parms p ON p.term = tf.term JOIN dlq q ON q.doc_id = tf.doc_id
  CROSS JOIN stats s WHERE tf.term = 'spark'
)
"""
        + _rank_tail("score", "FROM xsc", 10),
        # IB LL-DF-H2: -ln(lam/(tfn+lam)), lam=(float32)((df+1)/(N+1))
        # (IBSimilarity.java:93-96, DistributionLL.java:33-35, LambdaDF.java:32-39)
        "q_sim_ib": _PRELUDE
        + """
, xsc AS (
  SELECT tf.doc_id,
         -ln(CAST((d.df + 1.0) / (s.n + 1.0) AS FLOAT)
             / (tf.freq * log2(1 + (s.sttf / s.n) / q.dlq)
                + CAST((d.df + 1.0) / (s.n + 1.0) AS FLOAT))) AS score
  FROM tf JOIN dfreq d ON d.term = tf.term JOIN dlq q ON q.doc_id = tf.doc_id
  CROSS JOIN stats s WHERE tf.term = 'spark'
)
"""
        + _rank_tail("score", "FROM xsc", 10),
        # DFI chi^2: expected=(ttf+1)*dl/(sttf+1); freq<=expected -> 0 else
        # log2((freq-exp)^2/exp + 1) (DFISimilarity.java:58-69)
        "q_sim_dfi": _PRELUDE
        + """
, ttf AS (SELECT term, sum(freq)::DOUBLE AS v FROM tf GROUP BY term),
xsc AS (
  SELECT tf.doc_id,
         CASE WHEN tf.freq <= (t.v + 1) * q.dlq / (s.sttf + 1) THEN 0.0
              ELSE log2((tf.freq - (t.v + 1) * q.dlq / (s.sttf + 1))
                        * (tf.freq - (t.v + 1) * q.dlq / (s.sttf + 1))
                        / ((t.v + 1) * q.dlq / (s.sttf + 1)) + 1) END AS score
  FROM tf JOIN ttf t ON t.term = tf.term JOIN dlq q ON q.doc_id = tf.doc_id
  CROSS JOIN stats s WHERE tf.term = 'spark'
)
"""
        + _rank_tail("score", "FROM xsc", 10),
        # AxiomaticF2EXP (s=k=0.35): max(0, freq/(freq+s+s*dl/avgfl) *
        # ((N+1)/df)^k) (AxiomaticF2EXP.java:59-85)
        "q_sim_axiomatic": _PRELUDE
        + """
, xsc AS (
  SELECT tf.doc_id,
         greatest(0.0,
           (tf.freq / (tf.freq + 0.35 + 0.35 * q.dlq / (s.sttf / s.n)))
           * pow((s.n + 1.0) / d.df, 0.35)) AS score
  FROM tf JOIN dfreq d ON d.term = tf.term JOIN dlq q ON q.doc_id = tf.doc_id
  CROSS JOIN stats s WHERE tf.term = 'spark'
)
"""
        + _rank_tail("score", "FROM xsc", 10),
    }
    sqls.update(_pipeline_oracles())
    return sqls


def _monitor_sql() -> str:
    return (
        _PRELUDE
        + """
, m1 AS (
  SELECT 'mq1' AS query_id, doc_id FROM tf WHERE term IN ('spark', 'vector')
  GROUP BY doc_id HAVING count(DISTINCT term) = 2
),
m2 AS (SELECT DISTINCT 'mq2' AS query_id, doc_id FROM tf WHERE term = 'merge'),
m3 AS (
  SELECT DISTINCT 'mq3' AS query_id, a.doc_id
  FROM tokp a JOIN tokp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'fast' AND b.term = 'table'
)
SELECT query_id, doc_id::BIGINT AS doc_id FROM (
  SELECT * FROM m1 UNION ALL SELECT * FROM m2 UNION ALL SELECT * FROM m3
) ORDER BY query_id, doc_id
"""
    )


def _pipeline_oracles() -> dict[str, str]:
    """DuckDB SQL mirroring lucene_spark.functions.* arithmetic exactly."""
    P = 2147483647
    FP = 1 << 40
    tok_cte = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOKRE}') AS tk FROM documents
),
dtok AS (SELECT doc_id, unnest(list_distinct(tk)) AS term FROM toks),
atok AS (SELECT doc_id, unnest(tk) AS term FROM toks)
"""
    minhash = (
        tok_cte
        + f"""
, h AS (SELECT doc_id, ('0x' || substr(md5(term), 1, 8))::BIGINT % {P} AS h FROM dtok),
perms AS (SELECT i::INT AS perm, (101 + 37*i)::BIGINT AS a, (577 + 97*i)::BIGINT AS b
          FROM generate_series(0, 15) t(i)),
sig AS (SELECT doc_id, perm, min((a * h + b) % {P}) AS minhash
        FROM h CROSS JOIN perms GROUP BY doc_id, perm),
bands AS (SELECT doc_id, (perm // 4)::INT AS band,
                 md5(string_agg(minhash::VARCHAR, ':' ORDER BY perm)) AS band_key
          FROM sig GROUP BY doc_id, (perm // 4)::INT)
SELECT DISTINCT a.doc_id::BIGINT AS doc_a, b.doc_id::BIGINT AS doc_b
FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
WHERE a.doc_id < b.doc_id ORDER BY doc_a, doc_b
"""
    )
    minhash_star = (
        minhash[: minhash.rindex("SELECT DISTINCT")]
        + f"""
, reps AS (
  SELECT band, band_key, min(doc_id) AS doc_a, count(*) AS sz
  FROM bands GROUP BY band, band_key HAVING count(*) > 1
)
SELECT DISTINCT r.doc_a::BIGINT AS doc_a, b.doc_id::BIGINT AS doc_b
FROM bands b JOIN reps r ON r.band = b.band AND r.band_key = b.band_key
WHERE b.doc_id <> r.doc_a ORDER BY doc_a, doc_b
"""
    )
    simhash_cte = (
        tok_cte
        + """
, tf2 AS (SELECT doc_id, term, count(*)::BIGINT AS freq FROM atok GROUP BY 1, 2),
th AS (SELECT doc_id, freq, ('0x' || substr(md5(term), 1, 15))::BIGINT AS h FROM tf2),
bits AS (
  SELECT doc_id, bit, sum(CASE WHEN (h >> bit) & 1 = 1 THEN freq ELSE -freq END) AS tot
  FROM th CROSS JOIN (SELECT i::INT AS bit FROM generate_series(0, 59) t(i))
  GROUP BY doc_id, bit
),
sh AS (
  SELECT doc_id::BIGINT AS doc_id,
         sum(CASE WHEN tot > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
  FROM bits GROUP BY doc_id
)
"""
    )
    return {
        "dedup_exact": """
SELECT doc_id::BIGINT AS doc_id, md5(text) AS text_md5,
       (count(*) OVER (PARTITION BY md5(text)))::BIGINT AS dup_group_size
FROM documents ORDER BY doc_id
""",
        "dedup_minhash_lsh": minhash,
        "dedup_minhash_star": minhash_star,
        "dedup_simhash": simhash_cte + "SELECT doc_id, simhash FROM sh ORDER BY doc_id",
        "dedup_simhash_pairs": simhash_cte
        + """
, chunks AS (
  -- max_hamming+1 = 5 chunks of 12 bits: pigeonhole-sound for distance <= 4
  SELECT doc_id, simhash, c::INT AS chunk,
         ((simhash >> (c * 12)) & 4095) AS chunk_val
  FROM sh CROSS JOIN (SELECT i AS c FROM generate_series(0, 4) t(i))
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.simhash AS sh_a, b.simhash AS sh_b
  FROM chunks a JOIN chunks b ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, bit_count(xor(sh_a, sh_b))::INT AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 4 ORDER BY doc_a, doc_b
""",
        "dedup_jaccard": tok_cte
        + """
, sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM dtok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS i
  FROM dtok a JOIN dtok b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a::BIGINT AS doc_a, doc_b::BIGINT AS doc_b,
       round(i / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
WHERE i / (sa.sz + sb.sz - i) >= 0.8 ORDER BY doc_a, doc_b
""",
        # embedding near-dup: mirrors the Spark blocking exactly (8 tables x
        # 6 bits of md5-derived Rademacher planes) + exact cosine verify
        "dedup_embedding": """
WITH e AS (SELECT vec_id::BIGINT AS vec_id, embedding::DOUBLE[] AS v FROM embeddings),
planes AS (
  SELECT t.i AS t, b.i AS b, j.i AS j,
         CASE WHEN substr(md5(t.i::VARCHAR || ':' || b.i::VARCHAR || ':' || j.i::VARCHAR), 1, 1) >= '8'
              THEN 1.0 ELSE -1.0 END AS s
  FROM generate_series(0, 7) t(i), generate_series(0, 5) b(i), generate_series(0, 63) j(i)
),
proj AS (
  SELECT e.vec_id, p.t, p.b, sum(p.s * e.v[p.j + 1]) AS pr
  FROM e CROSS JOIN planes p GROUP BY 1, 2, 3
),
buck AS (
  SELECT vec_id, t AS tbl,
         sum(CASE WHEN pr > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS bucket
  FROM proj GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buck a JOIN buck b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cos FROM (
  SELECT cand.vec_a, cand.vec_b,
         round(list_cosine_similarity(ea.v, eb.v), 6) AS cos
  FROM cand JOIN e ea ON ea.vec_id = cand.vec_a JOIN e eb ON eb.vec_id = cand.vec_b
) WHERE cos >= 0.4 ORDER BY vec_a, vec_b
""",
        # IVF: static centroids = embeddings of vec_id 0..15 (centroid_id ==
        # vec_id), assignment/probes by rounded cosine with ties to the lower
        # centroid id, exact cosine within the 4 probed lists per query
        "sim_ivf_topk": """
WITH e AS (SELECT vec_id::BIGINT AS vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id::INT AS centroid_id, v AS cv FROM e WHERE vec_id < 16),
asg AS (
  SELECT e.vec_id, e.v,
         (SELECT c.centroid_id FROM cent c
          ORDER BY round(list_cosine_similarity(e.v, c.cv), 6) DESC, c.centroid_id
          LIMIT 1) AS centroid_id
  FROM e
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (20, 21, 22)),
probes AS (
  SELECT q.query_id, c.centroid_id, q.qv
  FROM q CROSS JOIN cent c
  QUALIFY row_number() OVER (
    PARTITION BY q.query_id
    ORDER BY round(list_cosine_similarity(q.qv, c.cv), 6) DESC, c.centroid_id
  ) <= 4
),
scored AS (
  SELECT p.query_id, a.vec_id, round(list_cosine_similarity(p.qv, a.v), 6) AS sim
  FROM probes p JOIN asg a ON a.centroid_id = p.centroid_id
  WHERE a.vec_id NOT IN (20, 21, 22)
)
SELECT query_id, rank, vec_id, sim FROM (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC)::INT AS rank
  FROM scored
) WHERE rank <= 5 ORDER BY query_id, rank
""",
        # deterministic-exhaustive regime (ef >= shard size): HNSW == exact
        # cosine top-k; see _hnsw_topk and tests/test_hnsw.py
        "sim_hnsw_topk": """
WITH q AS (SELECT vec_id::BIGINT AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id IN (5, 6, 7)),
c AS (SELECT vec_id::BIGINT AS vec_id, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id NOT IN (5, 6, 7)),
scored AS (
  SELECT query_id, vec_id, round(list_cosine_similarity(qv, cv), 6) AS sim
  FROM c CROSS JOIN q
)
SELECT query_id, rank, vec_id, sim FROM (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC)::INT AS rank
  FROM scored
) WHERE rank <= 5 ORDER BY query_id, rank
""",
        "sim_sq8_topk": """
WITH ex AS (
  SELECT vec_id, unnest(embedding) AS x,
         generate_subscripts(embedding, 1) AS ord
  FROM embeddings
),
dims AS (
  SELECT ord, min(x)::DOUBLE AS mn, max(x)::DOUBLE AS mx
  FROM ex GROUP BY ord
),
cd AS (
  SELECT ex.vec_id::BIGINT AS vec_id,
         array_agg(
           CASE WHEN dims.mx = dims.mn THEN dims.mn
                ELSE dims.mn
                   + least(greatest(round(round((ex.x - dims.mn)
                       / ((dims.mx - dims.mn) / 255), 6)), 0), 255)
                   * ((dims.mx - dims.mn) / 255)
           END ORDER BY ex.ord
         ) AS cdq
  FROM ex JOIN dims ON dims.ord = ex.ord
  GROUP BY ex.vec_id
),
q AS (SELECT vec_id::BIGINT AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id IN (0, 1, 2)),
c AS (SELECT vec_id, cdq FROM cd WHERE vec_id NOT IN (0, 1, 2)),
scored AS (
  SELECT query_id, vec_id, round(list_cosine_similarity(qv, cdq), 6) AS sim
  FROM c CROSS JOIN q
)
SELECT query_id, rank, vec_id, sim FROM (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC)::INT AS rank
  FROM scored
) WHERE rank <= 5 ORDER BY query_id, rank
""",
        "sim_cosine_topk": """
WITH q AS (SELECT vec_id::BIGINT AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id IN (0, 1, 2)),
c AS (SELECT vec_id::BIGINT AS vec_id, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id NOT IN (0, 1, 2)),
scored AS (
  SELECT query_id, vec_id, round(list_cosine_similarity(qv, cv), 6) AS sim
  FROM c CROSS JOIN q
)
SELECT query_id, rank, vec_id, sim FROM (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC)::INT AS rank
  FROM scored
) WHERE rank <= 5 ORDER BY query_id, rank
""",
        "sim_lsh_topk": """
WITH wb AS (
  SELECT vec_id::BIGINT AS vec_id, embedding::DOUBLE[] AS v,
         (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
        + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
        + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
        + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END
        + CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END
        + CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END
        + CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END
        + CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END)::BIGINT AS bucket
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM wb WHERE vec_id IN (0, 1, 2)),
c AS (SELECT vec_id, v AS cv, bucket FROM wb WHERE vec_id NOT IN (0, 1, 2)),
scored AS (
  SELECT query_id, vec_id, round(list_cosine_similarity(qv, cv), 6) AS sim
  FROM c JOIN q USING (bucket)
)
SELECT query_id, rank, vec_id, sim FROM (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC)::INT AS rank
  FROM scored
) WHERE rank <= 3 ORDER BY query_id, rank
""",
        # multi-table Rademacher-hyperplane LSH (tables=20, bits=4): plane
        # coordinate = +1 iff first md5('t:b:j') hex digit >= '8'; candidates
        # share a (table, bucket); exact cosine re-rank on candidates only
        "sim_rh_lsh_topk": """
WITH e AS (SELECT vec_id::BIGINT AS vec_id, embedding::DOUBLE[] AS v FROM embeddings),
planes AS (
  SELECT t.i AS t, b.i AS b, j.i AS j,
         CASE WHEN substr(md5(t.i::VARCHAR || ':' || b.i::VARCHAR || ':' || j.i::VARCHAR), 1, 1) >= '8'
              THEN 1.0 ELSE -1.0 END AS s
  FROM generate_series(0, 19) t(i), generate_series(0, 3) b(i), generate_series(0, 63) j(i)
),
proj AS (
  SELECT e.vec_id, p.t, p.b, sum(p.s * e.v[p.j + 1]) AS pr
  FROM e CROSS JOIN planes p GROUP BY 1, 2, 3
),
buck AS (
  SELECT vec_id, t AS tbl,
         sum(CASE WHEN pr > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS bucket
  FROM proj GROUP BY 1, 2
),
q AS (SELECT vec_id AS query_id, tbl, bucket FROM buck WHERE vec_id IN (0, 1, 2)),
c AS (SELECT vec_id, tbl, bucket FROM buck WHERE vec_id NOT IN (0, 1, 2)),
cand AS (SELECT DISTINCT q.query_id, c.vec_id FROM c JOIN q USING (tbl, bucket)),
scored AS (
  SELECT cand.query_id, cand.vec_id,
         round(list_cosine_similarity(qe.v, ce.v), 6) AS sim
  FROM cand JOIN e qe ON qe.vec_id = cand.query_id
            JOIN e ce ON ce.vec_id = cand.vec_id
)
SELECT query_id, rank, vec_id, sim FROM (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC)::INT AS rank
  FROM scored
) WHERE rank <= 10 ORDER BY query_id, rank
""",
        "text_token_counts": f"""
SELECT doc_id::BIGINT AS doc_id,
       len(regexp_extract_all(text, '\\S+'))::BIGINT AS ws_tokens,
       len(regexp_extract_all(lower(text), '{_TOKRE}'))::BIGINT AS re_tokens,
       len(regexp_extract_all(text, '{_BPERE}'))::BIGINT AS bpe_ish_tokens,
       len(list_distinct(regexp_extract_all(lower(text), '{_TOKRE}')))::BIGINT AS uniq_terms
FROM documents ORDER BY doc_id
""",
        "text_quality": f"""
WITH t AS (
  SELECT doc_id, text, regexp_extract_all(lower(text), '{_TOKRE}') AS tk FROM documents
),
m AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[A-Za-z]'))::DOUBLE AS n_alpha,
         length(text)::DOUBLE AS n_chars,
         len(tk)::DOUBLE AS n_tok,
         len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is')))::DOUBLE AS n_stop
  FROM t
)
SELECT doc_id::BIGINT AS doc_id,
       round(n_alpha / greatest(n_chars, 1.0), 6) AS alpha_ratio,
       round(n_stop / greatest(n_tok, 1.0), 6) AS stop_ratio,
       round(0.5 * (n_alpha / greatest(n_chars, 1.0))
           + 0.3 * (1.0 - n_stop / greatest(n_tok, 1.0))
           + 0.2 * least(1.0, n_tok / 100.0), 6) AS quality
FROM m ORDER BY doc_id
""",
        "text_lang_id": f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOKRE}') AS tk FROM documents
),
s AS (
  SELECT doc_id,
         len(list_filter(tk, x -> x IN ('the','a','of','and')))::BIGINT AS score_en,
         len(list_filter(tk, x -> x IN ('el','la','de','que')))::BIGINT AS score_es,
         len(list_filter(tk, x -> x IN ('der','die','und','das')))::BIGINT AS score_de,
         len(list_filter(tk, x -> x IN ('le','la','et','les')))::BIGINT AS score_fr
  FROM t
)
SELECT doc_id::BIGINT AS doc_id, score_en, score_es, score_de, score_fr,
       CASE WHEN score_fr > greatest(score_en, score_es, score_de) THEN 'fr'
            WHEN score_de > greatest(score_en, score_es) THEN 'de'
            WHEN score_es > score_en THEN 'es'
            ELSE 'en' END AS lang_guess
FROM s ORDER BY doc_id
""",
        "text_fingerprint": f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOKRE}') AS tk FROM documents
)
SELECT doc_id::BIGINT AS doc_id,
       list_reduce(
         [0::BIGINT] || list_transform(tk, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT % {FP}),
         (acc, x) -> (acc * 31 + x) % {FP}
       )::BIGINT AS fingerprint
FROM t ORDER BY doc_id
""",
        # NOTE: DuckDB v1.0 sha256/md5/substring only take VARCHAR; the
        # documents corpus is verified pure-ASCII, where VARCHAR ops are
        # byte-equivalent to the engine's binary-payload ops.
        "mm_media_meta": """
SELECT doc_id::BIGINT AS doc_id, strlen(text)::BIGINT AS n_bytes,
       sha256(text) AS sha256,
       (strlen(text) % 640 + 1)::INT AS width,
       ((strlen(text) * 7) % 480 + 1)::INT AS height
FROM documents ORDER BY doc_id
""",
        "mm_frame_sample": """
WITH b AS (
  SELECT doc_id, text, least((strlen(text) // 64)::INT, 4) AS nf FROM documents
),
f AS (
  SELECT doc_id, unnest(generate_series(0, nf - 1)) AS frame_idx, text
  FROM b WHERE nf > 0
)
SELECT doc_id::BIGINT AS doc_id, frame_idx::INT AS frame_idx,
       md5(substring(text, (frame_idx * 64 + 1)::BIGINT, 64::BIGINT)) AS frame_md5
FROM f ORDER BY doc_id, frame_idx
""",
        "cls_naive_bayes": _cls_nb_sql(),
        "cls_knn": _cls_knn_sql(_CLS_KNN_DOCS, k=5, max_terms=5, min_df=2),
        "payload_sum": _payload_sql("term = 'spark'", "sum"),
        "payload_chain3": _payload_chain_sql(("the", "fast", "table"), 4, "sum"),
        "payload_pair_avg": _payload_pair_sql("table", "hash", "avg"),
        "payload_include_span": _payload_span_sql("spark"),
    }


def _phrase_sql(terms: list[str], k: int = 10, prelude: str | None = None) -> str:
    """Exact-phrase BM25: freq = consecutive-position matches; idf = sum of
    per-term idfs."""
    joins, conds = [], []
    for i, t in enumerate(terms):
        a = f"p{i}"
        joins.append(
            f"tokp {a}" if i == 0 else f"JOIN tokp p{i} ON p{i}.doc_id = p0.doc_id AND p{i}.pos = p0.pos + {i}"
        )
        conds.append(f"p{i}.term = '{t}'")
    idf_sum = " + ".join(
        "ln(1 + (s.n - (SELECT df FROM dfreq WHERE term = '%s') + 0.5) / ((SELECT df FROM dfreq WHERE term = '%s') + 0.5))"
        % (t, t)
        for t in terms
    )
    inv = _INV.format(k1=K1, b=B)
    return (
        (prelude if prelude is not None else _PRELUDE)
        + f"""
, pf AS (
  SELECT p0.doc_id, count(*)::BIGINT AS freq
  FROM {joins[0]} {' '.join(joins[1:])}
  WHERE {' AND '.join(conds)}
  GROUP BY p0.doc_id
),
psc AS (
  SELECT pf.doc_id,
         (({idf_sum})) - (({idf_sum})) / (1 + pf.freq * {inv}) AS score
  FROM pf JOIN dlq q ON q.doc_id = pf.doc_id CROSS JOIN stats s
)
"""
        + _rank_tail("score", "FROM psc", k)
    )


def _common_terms_sql(terms: list[str], ratio: float, k: int = 10) -> str:
    """CommonTermsQuery: rare terms (df <= ratio * N) are required, hot terms
    scoring-only; score = sum of per-term BM25 over all present terms."""
    lits = ", ".join(f"'{t}'" for t in terms)
    lowt = (
        f"SELECT term FROM dfreq WHERE term IN ({lits}) "
        f"AND df <= {ratio} * (SELECT n FROM stats)"
    )
    return (
        _PRELUDE
        + _scored_cte(terms)
        + f"""
, agg AS (
  SELECT doc_id, sum(score) AS score,
         count(DISTINCT CASE WHEN term IN ({lowt}) THEN term END) AS nlow
  FROM sc GROUP BY doc_id
)
"""
        + _rank_tail("score", f"FROM agg WHERE nlow = (SELECT count(*) FROM ({lowt}))", k)
    )


def _mlt_sql(
    doc_id: int, max_terms: int, min_df: int, k: int = 10,
    boosted: bool = False,
) -> str:
    """MoreLikeThis: terms of the example doc ranked by tf * idf (ties by
    ascending term), top max_terms become a scored disjunction. With
    ``boosted``, each term's score is multiplied by ms / bestScore
    (MoreLikeThis.createQuery setBoost(true))."""
    idf = _IDF.format(df="d.df")
    inv = _INV.format(k1=K1, b=B)
    boost_mul = (
        " * (qt.ms / (SELECT max(ms) FROM mscore))" if boosted else ""
    )
    return (
        _PRELUDE
        + f"""
, mscore AS (
  SELECT t.term, t.freq * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) AS ms
  FROM tf t JOIN dfreq d ON d.term = t.term CROSS JOIN stats s
  WHERE t.doc_id = {doc_id} AND d.df >= {min_df}
),
qt AS (SELECT term, ms FROM mscore ORDER BY ms DESC, term ASC LIMIT {max_terms}),
sc AS (
  SELECT tf.doc_id,
         (({idf}) - ({idf}) / (1 + tf.freq * {inv})){boost_mul} AS score
  FROM tf
  JOIN qt ON qt.term = tf.term
  JOIN dfreq d ON d.term = tf.term
  JOIN dlq q ON q.doc_id = tf.doc_id
  CROSS JOIN stats s
),
agg AS (SELECT doc_id, sum(score) AS score FROM sc GROUP BY doc_id)
"""
        + _rank_tail("score", "FROM agg", k)
    )


_PAYLOAD_TOKS = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS tok,
         generate_subscripts(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''), 1) - 1 AS pos
  FROM documents
),
p AS (SELECT doc_id, lower(tok) AS term, pos, (pos % 5) + 0.5 AS payload FROM toks)
"""


def _payload_agg_tail(fn: str, src: str) -> str:
    """docScore per PayloadFunction over `m(doc_id, seen, s, mn, mx)`."""
    val = {
        "sum": "CASE WHEN seen > 0 THEN s ELSE 1.0 END",
        "min": "CASE WHEN seen > 0 THEN mn ELSE 1.0 END",
        "max": "CASE WHEN seen > 0 THEN mx ELSE 1.0 END",
        "avg": "CASE WHEN seen > 0 THEN s / seen ELSE 1.0 END",
    }[fn]
    return f"""
, m AS (
  SELECT doc_id, count(payload) AS seen, sum(payload) AS s,
         min(payload) AS mn, max(payload) AS mx
  FROM {src} GROUP BY doc_id
)
SELECT doc_id::BIGINT AS doc_id,
       round(CASE WHEN ({val}) >= 0 THEN ({val}) ELSE 0.0 END, 6) AS score
FROM m ORDER BY doc_id
"""


def _payload_sql(pred: str, fn: str) -> str:
    """Single-term PayloadScoreQuery oracle: whitespace tokens with the
    deterministic (pos % 5) + 0.5 payload, aggregated per doc."""
    return (
        _PAYLOAD_TOKS
        + f", sel AS (SELECT doc_id, payload FROM p WHERE {pred})"
        + _payload_agg_tail(fn, "sel")
    )


def _payload_pair_sql(a: str, b: str, fn: str) -> str:
    """Adjacent-pair PayloadScoreQuery oracle: both positions of each
    matched (a, b) exact-adjacent pair feed the function."""
    return (
        _PAYLOAD_TOKS
        + f"""
, pairs AS (
  SELECT x.doc_id, x.payload AS pla, y.payload AS plb
  FROM p x JOIN p y ON y.doc_id = x.doc_id AND y.pos = x.pos + 1
  WHERE x.term = '{a}' AND y.term = '{b}'
),
sel AS (
  SELECT doc_id, pla AS payload FROM pairs
  UNION ALL SELECT doc_id, plb FROM pairs
)"""
        + _payload_agg_tail(fn, "sel")
    )


def _payload_chain_sql(terms, slop: int, fn: str) -> str:
    """Ordered-chain PayloadScoreQuery oracle: greedy NearSpansOrdered
    chains (per start position, each later clause takes its minimal
    position past the previous; width - (n-1) <= slop), every chain
    position's payload feeding the function — an independent SQL
    re-derivation (iterated min/arg_min CTEs, one per clause)."""
    n = len(terms)
    ctes = [
        f", c0 AS (SELECT doc_id, pos AS q0, payload AS pl0 FROM p "
        f"WHERE term = '{terms[0]}')"
    ]
    for i, t in enumerate(terms[1:], start=1):
        cols = (
            ["x.doc_id"]
            + [f"x.q{j}" for j in range(i)]
            + [f"x.pl{j}" for j in range(i)]
        )
        sel = ", ".join(cols)
        ctes.append(
            f"""
, c{i} AS (
  SELECT {sel}, min(y.pos) AS q{i}, arg_min(y.payload, y.pos) AS pl{i}
  FROM c{i - 1} x JOIN p y
    ON y.doc_id = x.doc_id AND y.term = '{t}' AND y.pos > x.q{i - 1}
  GROUP BY {sel}
)"""
        )
    spans = (
        f", spans AS (SELECT * FROM c{n - 1} "
        f"WHERE q{n - 1} - q0 - {n - 1} <= {slop})"
    )
    sel_u = ", sel AS (" + " UNION ALL ".join(
        f"SELECT doc_id, pl{i} AS payload FROM spans" for i in range(n)
    ) + ")"
    return _PAYLOAD_TOKS + "".join(ctes) + spans + sel_u + _payload_agg_tail(
        fn, "sel"
    )


def _payload_span_sql(term: str) -> str:
    """includeSpanScore oracle: standard-chain float64 BM25 of the wrapped
    term times the whitespace-token payload sum (docs in both frames —
    the inner includeSpanScore join)."""
    return (
        _PRELUDE
        + _scored_cte([term])
        + f"""
, agg AS (SELECT doc_id, sum(score) AS score FROM sc GROUP BY doc_id),
wtoks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS tok,
         generate_subscripts(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''), 1) - 1 AS pos
  FROM documents
),
wp AS (SELECT doc_id, lower(tok) AS term, (pos % 5) + 0.5 AS payload FROM wtoks),
m AS (
  SELECT doc_id, count(payload) AS seen, sum(payload) AS s
  FROM wp WHERE term = '{term}' GROUP BY doc_id
),
psc AS (
  SELECT doc_id,
         CASE WHEN (CASE WHEN seen > 0 THEN s ELSE 1.0 END) >= 0
              THEN (CASE WHEN seen > 0 THEN s ELSE 1.0 END) ELSE 0.0 END AS pscore
  FROM m
)
SELECT p.doc_id::BIGINT AS doc_id, round(a.score * p.pscore, 6) AS score
FROM psc p JOIN agg a ON a.doc_id = p.doc_id ORDER BY doc_id
"""
    )


def _cls_nb_sql() -> str:
    """SimpleNaiveBayesClassifier: per (input, class) log-likelihood
    ln(prior) + sum_w cnt_w * ln(hits(w,c)+1) - n_tokens * ln(avgUnique *
    classDocs + docsWithClass), softmax-normalized per input
    (normClassificationResults), ranked by rounded score then class."""
    vals = ", ".join(f"({i}, '{t}')" for i, t in _CLS_INPUTS)
    return (
        _PRELUDE
        + f"""
, cls AS (
  SELECT lang AS class, count(*)::DOUBLE AS cdocs
  FROM documents WHERE lang IS NOT NULL GROUP BY lang
),
tot AS (SELECT sum(cdocs) AS n_cls FROM cls),
tstat AS (
  SELECT (SELECT count(*) FROM tf)::DOUBLE AS sdf,
         (SELECT count(*) FROM dl WHERE len > 0)::DOUBLE AS dcnt
),
inputs(input_id, itext) AS (VALUES {vals}),
itok AS (
  SELECT input_id, unnest(regexp_extract_all(lower(itext), '{_TOKRE}')) AS word
  FROM inputs
),
icnt AS (SELECT input_id, word, count(*)::DOUBLE AS cnt FROM itok GROUP BY 1, 2),
itot AS (
  SELECT i.input_id::BIGINT AS input_id, coalesce(n.nt, 0)::DOUBLE AS n_tokens
  FROM inputs i
  LEFT JOIN (SELECT input_id, count(*) AS nt FROM itok GROUP BY 1) n
    ON n.input_id = i.input_id
),
hits AS (
  SELECT tf.term AS word, d.lang AS class, count(*)::DOUBLE AS hits
  FROM tf JOIN documents d ON d.doc_id = tf.doc_id
  WHERE d.lang IS NOT NULL GROUP BY 1, 2
),
perword AS (
  SELECT ic.input_id::BIGINT AS input_id, c.class,
         sum(ic.cnt * ln(coalesce(h.hits, 0) + 1.0)) AS lhits
  FROM icnt ic CROSS JOIN cls c
  LEFT JOIN hits h ON h.word = ic.word AND h.class = c.class
  GROUP BY 1, 2
),
scored AS (
  SELECT it.input_id, c.class,
         ln(c.cdocs) - ln(t.n_cls) + coalesce(pw.lhits, 0)
         - it.n_tokens * ln(x.sdf / x.dcnt * c.cdocs + t.n_cls) AS raw
  FROM itot it CROSS JOIN cls c CROSS JOIN tot t CROSS JOIN tstat x
  LEFT JOIN perword pw ON pw.input_id = it.input_id AND pw.class = c.class
),
mx AS (SELECT *, max(raw) OVER (PARTITION BY input_id) AS m FROM scored),
soft AS (
  SELECT input_id, class,
         exp(raw - m) / sum(exp(raw - m)) OVER (PARTITION BY input_id) AS score
  FROM mx
)
SELECT input_id,
       row_number() OVER (
         PARTITION BY input_id ORDER BY round(score, 6) DESC, class ASC
       )::INT AS rank,
       class, round(score, 6) AS score
FROM soft ORDER BY input_id, rank
"""
    )


def _cls_knn_sql(doc_ids: list[int], k: int, max_terms: int, min_df: int) -> str:
    """KNearestNeighborClassifier: per input (= a doc's own text, so its tf
    IS the input's token multiset), MLT term selection + BM25 disjunction
    (the _mlt_sql machinery), rounded top-k neighbors among classed docs,
    then the buildListFromTopDocs vote sum(score/maxScore)/min(found, k)."""
    idf = _IDF.format(df="d.df")
    inv = _INV.format(k1=K1, b=B)
    parts = []
    for i, did in enumerate(doc_ids):
        parts.append(
            f"""
, ms{i} AS (
  SELECT t.term, t.freq * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) AS ms
  FROM tf t JOIN dfreq d ON d.term = t.term CROSS JOIN stats s
  WHERE t.doc_id = {did} AND d.df >= {min_df}
),
qt{i} AS (SELECT term FROM ms{i} ORDER BY ms DESC, term ASC LIMIT {max_terms}),
sc{i} AS (
  SELECT tf.doc_id, ({idf}) - ({idf}) / (1 + tf.freq * {inv}) AS score
  FROM tf
  JOIN qt{i} ON qt{i}.term = tf.term
  JOIN dfreq d ON d.term = tf.term
  JOIN dlq q ON q.doc_id = tf.doc_id
  CROSS JOIN stats s
),
agg{i} AS (
  SELECT {i}::BIGINT AS input_id, doc_id, sum(score) AS score
  FROM sc{i} GROUP BY doc_id
)"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM agg{i}" for i in range(len(doc_ids)))
    return (
        _PRELUDE
        + "".join(parts)
        + f"""
, allsc AS ({union}),
classed AS (
  SELECT a.input_id, a.doc_id, round(a.score, 6) AS score, d.lang AS class
  FROM allsc a JOIN documents d ON d.doc_id = a.doc_id
  WHERE d.lang IS NOT NULL
),
nbr AS (
  SELECT *, row_number() OVER (
    PARTITION BY input_id ORDER BY score DESC, doc_id ASC
  ) AS nrank
  FROM classed
),
topk AS (SELECT * FROM nbr WHERE nrank <= {k}),
wtop AS (
  SELECT *, max(score) OVER (PARTITION BY input_id) AS mxs,
         count(*) OVER (PARTITION BY input_id) AS cnt
  FROM topk
),
vote AS (
  SELECT input_id, class,
         sum(score / mxs) / least(min(cnt), {k}) AS score
  FROM wtop GROUP BY input_id, class
)
SELECT input_id,
       row_number() OVER (
         PARTITION BY input_id ORDER BY round(score, 6) DESC, class ASC
       )::INT AS rank,
       class, round(score, 6) AS score
FROM vote ORDER BY input_id, rank
"""
    )


def _multifield_sql(k: int = 10) -> str:
    """lang:en AND spark — per-field BM25 (each field has its own tf/dl/
    stats over its own column), scores summed, docs must match both. The
    lang-field CTEs are the text prelude with every CTE renamed l* and the
    tokenized column switched to `lang`."""
    import re as _re

    lang_part = _PRELUDE.replace("WITH ", ", ").replace("lower(text)", "lower(lang)")
    lang_part = _re.sub(
        r"\b(tokarr|tokp|tok|dfreq|dlq|dl|nrm|tf|stats)\b", r"l\1", lang_part
    )
    idf_t = _IDF.format(df="d.df")
    inv_t = _INV.format(k1=K1, b=B)
    idf_l = "ln(1 + (ls.n - ld.df + 0.5) / (ld.df + 0.5))"
    inv_l = f"(1.0 / ({K1} * ((1 - {B}) + {B} * lq.ldlq / (ls.sttf / ls.n))))"
    return (
        _PRELUDE
        + lang_part
        + f"""
, tsc AS (
  SELECT tf.doc_id, ({idf_t}) - ({idf_t}) / (1 + tf.freq * {inv_t}) AS score
  FROM tf JOIN dfreq d ON d.term = tf.term
  JOIN dlq q ON q.doc_id = tf.doc_id CROSS JOIN stats s
  WHERE tf.term = 'spark'
),
lsc AS (
  SELECT ltf.doc_id, ({idf_l}) - ({idf_l}) / (1 + ltf.freq * {inv_l}) AS score
  FROM ltf JOIN ldfreq ld ON ld.term = ltf.term
  JOIN ldlq lq ON lq.doc_id = ltf.doc_id CROSS JOIN lstats ls
  WHERE ltf.term = 'en'
),
agg AS (
  SELECT tsc.doc_id, tsc.score + lsc.score AS score
  FROM tsc JOIN lsc ON lsc.doc_id = tsc.doc_id
)
"""
        + _rank_tail("score", "FROM agg", k)
    )


def _iv_ctes(terms: list[str], ordered: bool, max_gaps: int, pfx: str = "") -> str:
    """CTE chain computing `iv{pfx}(doc_id, s, e)` — the minimal-interval
    set of an ordered/unordered point-term source, maxgaps-filtered.
    Ordered: backward greedy chains q_{i-1} = max{pos(t_{i-1}) < q_i} from
    each last-term occurrence give the latest start per end; unordered: per
    candidate end e, start = min over terms of the latest occurrence <= e.
    Minimality = smallest end per start."""
    n = len(terms)
    if ordered:
        ctes = [
            f", {pfx}b{n-1} AS (SELECT doc_id, pos AS e, pos AS q FROM tokp"
            f" WHERE term = '{terms[n-1]}')"
        ]
        for i in range(n - 2, -1, -1):
            ctes.append(
                f", {pfx}b{i} AS (\n"
                f"  SELECT b.doc_id, b.e, max(t.pos) AS q\n"
                f"  FROM {pfx}b{i+1} b JOIN tokp t ON t.doc_id = b.doc_id"
                f" AND t.term = '{terms[i]}' AND t.pos < b.q\n"
                f"  GROUP BY b.doc_id, b.e\n)"
            )
        win = f"SELECT doc_id, e, q AS s FROM {pfx}b0"
    else:
        lits = ", ".join(f"'{t}'" for t in terms)
        ctes = [
            f""", {pfx}ue AS (SELECT DISTINCT doc_id, pos AS e FROM tokp WHERE term IN ({lits})),
{pfx}lt AS (
  SELECT ue.doc_id, ue.e, t.term, max(t.pos) AS mx
  FROM {pfx}ue ue JOIN tokp t ON t.doc_id = ue.doc_id AND t.term IN ({lits})
       AND t.pos <= ue.e
  GROUP BY ue.doc_id, ue.e, t.term
)"""
        ]
        win = (
            f"SELECT doc_id, e, min(mx) AS s FROM {pfx}lt "
            f"GROUP BY doc_id, e HAVING count(*) = {n}"
        )
    gaps_pred = (
        f" WHERE (e - s + 1) - {n} <= {max_gaps}" if max_gaps >= 0 else ""
    )
    return (
        "".join(ctes)
        + f"""
, {pfx}win AS ({win}),
iv{pfx} AS (
  SELECT doc_id, s, e FROM (
    SELECT doc_id, s, min(e) AS e FROM {pfx}win GROUP BY doc_id, s
  ){gaps_pred}
)"""
    )


def _intervals_sql(terms: list[str], ordered: bool, max_gaps: int, k: int = 10,
                   min_extent: int | None = None, max_width: int = -1) -> str:
    """IntervalQuery parity SQL (lucene_spark/matchers.py minimal-interval
    staircases): freq = Σ 1/max(length - minExtent + 1, 1); score =
    1 - 1/(freq + 1) (saturation pivot 1). max_width filters the minimal
    stream on (e - s + 1) <= width (Intervals.maxwidth)."""
    n = len(terms)
    if min_extent is None:
        min_extent = n  # distinct point terms; adjacent-run dedup shrinks it
    width_pred = f"WHERE (e - s + 1) <= {max_width}" if max_width >= 0 else ""
    return (
        _PRELUDE
        + _iv_ctes(terms, ordered, max_gaps)
        + f"""
, pf AS (
  SELECT doc_id, sum(1.0 / greatest((e - s + 1) - {min_extent} + 1, 1)) AS freq
  FROM iv {width_pred} GROUP BY doc_id
),
ivsc AS (SELECT doc_id, 1.0 - 1.0 / (freq + 1.0) AS score FROM pf WHERE freq > 0)
"""
        + _rank_tail("score", "FROM ivsc", k)
    )


def _slot_pred(s, col: str = "term") -> str:
    """Slot spec -> SQL predicate: a list of alternatives becomes an IN
    list; a bare string is a raw predicate template over ``{term}`` (LIKE /
    damerau_levenshtein / regexp) — how the oracle expresses a multi-term
    interval source independently of the engine's dictionary expansion."""
    if isinstance(s, str):
        return s.format(term=col)
    return f"{col} IN (" + ", ".join(f"'{t}'" for t in s) + ")"


def _slots_win_sql(slots: list, ordered: bool) -> tuple[str, str]:
    """Shared CTE chain for slot-based interval sources: returns
    (cte_body, win_select) where win(doc_id, e, s) holds, per candidate
    end, the latest valid start (ordered backward-greedy chain /
    unordered min-of-latest-occurrences)."""
    n = len(slots)
    if ordered:
        ctes = [
            f", b{n-1} AS (SELECT doc_id, pos AS e, pos AS q FROM tokp"
            f" WHERE {_slot_pred(slots[n-1])})"
        ]
        for i in range(n - 2, -1, -1):
            ctes.append(
                f", b{i} AS (\n"
                f"  SELECT b.doc_id, b.e, max(t.pos) AS q\n"
                f"  FROM b{i+1} b JOIN tokp t ON t.doc_id = b.doc_id"
                f" AND {_slot_pred(slots[i], 't.term')} AND t.pos < b.q\n"
                f"  GROUP BY b.doc_id, b.e\n)"
            )
        win = "SELECT doc_id, e, q AS s FROM b0"
    else:
        unions = "\n  UNION ALL ".join(
            f"SELECT doc_id, pos, {i} AS slot FROM tokp WHERE {_slot_pred(s)}"
            for i, s in enumerate(slots)
        )
        ctes = [
            f""", slotp AS (
  {unions}
),
ue AS (SELECT DISTINCT doc_id, pos AS e FROM slotp),
lt AS (
  SELECT ue.doc_id, ue.e, s.slot, max(s.pos) AS mx
  FROM ue JOIN slotp s ON s.doc_id = ue.doc_id AND s.pos <= ue.e
  GROUP BY ue.doc_id, ue.e, s.slot
)"""
        ]
        win = (
            f"SELECT doc_id, e, min(mx) AS s FROM lt "
            f"GROUP BY doc_id, e HAVING count(*) = {n}"
        )
    return "".join(ctes), win


def _intervals_ext_sql(
    slots: list,
    ordered: bool,
    max_gaps: int,
    before: int,
    after: int,
    k: int = 10,
) -> str:
    """Intervals.extend parity SQL: the wrapped source's minimal intervals
    (maxgaps applied FIRST, on unextended widths) stretch to
    (greatest(s - before, 0), e + after) and weigh with
    minExtent + before + after."""
    n = len(slots)
    slots = [s if isinstance(s, (list, tuple, str)) else [s] for s in slots]
    body, win = _slots_win_sql(slots, ordered)
    gaps_pred = f"WHERE (e - s + 1) - {n} <= {max_gaps}" if max_gaps >= 0 else ""
    ext_min = n + before + after
    return (
        _PRELUDE
        + body
        + f"""
, win AS ({win}),
iv0 AS (SELECT doc_id, s, min(e) AS e FROM win GROUP BY doc_id, s),
iv AS (
  SELECT doc_id, greatest(s - {before}, 0) AS s, e + {after} AS e
  FROM iv0 {gaps_pred}
),
pf AS (
  SELECT doc_id, sum(1.0 / greatest((e - s + 1) - {ext_min} + 1, 1)) AS freq
  FROM iv GROUP BY doc_id
),
ivsc AS (SELECT doc_id, 1.0 - 1.0 / (freq + 1.0) AS score FROM pf WHERE freq > 0)
"""
        + _rank_tail("score", "FROM ivsc", k)
    )


def _intervals_atleast_sql(
    slots: list, m: int, max_gaps: int, k: int = 10
) -> str:
    """Intervals.atLeast(m, ...) parity SQL
    (MinimumShouldMatchIntervalsSource): per candidate end e, the tightest
    window covering >= m distinct slots starts at the m-th LARGEST of the
    per-slot latest-occurrence-<= e values (row_number over mx DESC);
    minimality = smallest end per start; minExtent = m."""
    slots = [s if isinstance(s, (list, tuple, str)) else [s] for s in slots]
    unions = "\n  UNION ALL ".join(
        f"SELECT doc_id, pos, {i} AS slot FROM tokp WHERE {_slot_pred(s)}"
        for i, s in enumerate(slots)
    )
    gaps_pred = f"WHERE (e - s + 1) - {m} <= {max_gaps}" if max_gaps >= 0 else ""
    return (
        _PRELUDE
        + f"""
, slotp AS (
  {unions}
),
ue AS (SELECT DISTINCT doc_id, pos AS e FROM slotp),
lt AS (
  SELECT ue.doc_id, ue.e, s.slot, max(s.pos) AS mx
  FROM ue JOIN slotp s ON s.doc_id = ue.doc_id AND s.pos <= ue.e
  GROUP BY ue.doc_id, ue.e, s.slot
),
ranked AS (
  SELECT doc_id, e, mx,
         row_number() OVER (PARTITION BY doc_id, e ORDER BY mx DESC) AS rn
  FROM lt
),
win AS (SELECT doc_id, e, mx AS s FROM ranked WHERE rn = {m}),
iv0 AS (SELECT doc_id, s, min(e) AS e FROM win GROUP BY doc_id, s),
iv AS (SELECT doc_id, s, e FROM iv0 {gaps_pred}),
pf AS (
  SELECT doc_id, sum(1.0 / greatest((e - s + 1) - {m} + 1, 1)) AS freq
  FROM iv GROUP BY doc_id
),
ivsc AS (SELECT doc_id, 1.0 - 1.0 / (freq + 1.0) AS score FROM pf WHERE freq > 0)
"""
        + _rank_tail("score", "FROM ivsc", k)
    )


def _intervals_slots_sql(
    slots: list, ordered: bool, max_gaps: int, k: int = 10
) -> str:
    """IntervalQuery with OR-alternation slots (Intervals.or nested in
    ordered/unordered): each slot's point stream is the union of its
    alternatives' positions; minExtent = slot count. A slot may also be a
    raw SQL predicate string over `term` — the oracle's independent stand-in
    for a multi-term expansion (Intervals.prefix/wildcard/fuzzyTerm)."""
    n = len(slots)
    slots = [s if isinstance(s, (list, tuple, str)) else [s] for s in slots]
    body, win = _slots_win_sql(slots, ordered)
    gaps_pred = f"WHERE (e - s + 1) - {n} <= {max_gaps}" if max_gaps >= 0 else ""
    return (
        _PRELUDE
        + body
        + f"""
, win AS ({win}),
iv AS (SELECT doc_id, s, min(e) AS e FROM win GROUP BY doc_id, s),
pf AS (
  SELECT doc_id, sum(1.0 / greatest((e - s + 1) - {n} + 1, 1)) AS freq
  FROM iv {gaps_pred} GROUP BY doc_id
),
ivsc AS (SELECT doc_id, 1.0 - 1.0 / (freq + 1.0) AS score FROM pf WHERE freq > 0)
"""
        + _rank_tail("score", "FROM ivsc", k)
    )


def _interval_filter_sql(
    kind: str,
    src_terms: list[str],
    src_ordered: bool,
    ref_terms: list[str],
    ref_ordered: bool,
    src_max_gaps: int = -1,
    ref_max_gaps: int = -1,
    k: int = 10,
    positions: int = 0,
    src_max_width: int = -1,
) -> str:
    """Interval filter algebra parity SQL. Each reference streaming loop is
    equivalent to a per-interval predicate on minimal streams (starts AND
    ends strictly increase):

    - containing:      EXISTS b inside a          (Containing...java)
    - contained_by:    EXISTS b containing a      (ContainedBy...java)
    - overlapping:     EXISTS b overlapping a     (Overlapping...java)
    - non_overlapping: NOT overlapping            (NonOverlapping...java)
    - not_contained_by: NOT contained_by          (NotContainedBy...java)
    - not_containing:  the reference's quirk verbatim: the resting b is the
      FIRST with (b.s >= a.s OR b.e >= a.e) = argmin start among such; a is
      emitted iff that b is absent or starts past a.e — an overlapping but
      not contained b still suppresses a (NotContaining...java).
    - before / after:  EXISTS b starting after a.e / ending before a.s
      (Intervals.before/after via containedBy of an extended offset stream).

    Difference kinds emit all source intervals in docs lacking the
    reference; conjunction kinds require both (Difference- vs
    ConjunctionIntervalsSource doc approximations). minExtent = source's."""
    n_src = len(src_terms)
    b = "(SELECT 1 FROM ivr b WHERE b.doc_id = a.doc_id AND {p})"
    preds = {
        "containing": "EXISTS " + b.format(p="b.s >= a.s AND b.e <= a.e"),
        "contained_by": "EXISTS " + b.format(p="b.s <= a.s AND b.e >= a.e"),
        "overlapping": "EXISTS " + b.format(p="b.e >= a.s AND b.s <= a.e"),
        "non_overlapping": "NOT EXISTS "
        + b.format(p="b.e >= a.s AND b.s <= a.e"),
        "not_contained_by": "NOT EXISTS "
        + b.format(p="b.s <= a.s AND b.e >= a.e"),
        "not_containing": (
            "coalesce((SELECT min(b.s) FROM ivr b WHERE b.doc_id = a.doc_id"
            " AND (b.s >= a.s OR b.e >= a.e)), a.e + 1) > a.e"
        ),
        "before": "EXISTS " + b.format(p="b.s > a.e"),
        "after": "EXISTS " + b.format(p="b.e < a.s"),
        # within/not_within: containedBy / nonOverlapping against the
        # reference extended by `positions` both sides, start clipped at 0
        # (Intervals.java within()/notWithin() compositions)
        "within": "EXISTS "
        + b.format(
            p=f"greatest(b.s - {positions}, 0) <= a.s AND b.e + {positions} >= a.e"
        ),
        "not_within": "NOT EXISTS "
        + b.format(
            p=f"b.e + {positions} >= a.s AND greatest(b.s - {positions}, 0) <= a.e"
        ),
    }
    src_cte = "ivs"
    width_cte = ""
    if src_max_width >= 0:
        width_cte = (
            f", ivsw AS (SELECT * FROM ivs WHERE (e - s + 1) <= {src_max_width})"
        )
        src_cte = "ivsw"
    return (
        _PRELUDE
        + _iv_ctes(src_terms, src_ordered, src_max_gaps, pfx="s")
        + _iv_ctes(ref_terms, ref_ordered, ref_max_gaps, pfx="r")
        + width_cte
        + f"""
, keep AS (SELECT a.* FROM {src_cte} a WHERE {preds[kind]}),
pf AS (
  SELECT doc_id, sum(1.0 / greatest((e - s + 1) - {n_src} + 1, 1)) AS freq
  FROM keep GROUP BY doc_id
),
ivsc AS (SELECT doc_id, 1.0 - 1.0 / (freq + 1.0) AS score FROM pf WHERE freq > 0)
"""
        + _rank_tail("score", "FROM ivsc", k)
    )


def _intervals_fixfield_sql(
    k: int = 10, slot0_pred: str = "term = 'the'", max_gaps: int = 3
) -> str:
    """Intervals.fixField oracle: ordered minimal intervals with slot 0's
    positions from the UNFILTERED text field (tokp0, full ordinals — a
    predicate so an Intervals.or union of fixField alternatives is one
    IN-list) and the 'fast' slot from the stop-filtered field (tokp,
    hole-preserved ordinals), maxgaps-filtered, minExtent 2, saturation
    score (interval scoring is similarity-free so no norms/stats join)."""
    return (
        _stop_prelude(("the", "a"))
        + f"""
, fb1 AS (SELECT doc_id, pos AS e FROM tokp WHERE term = 'fast'),
fb0 AS (
  SELECT b.doc_id, b.e, max(t.pos) AS s
  FROM fb1 b JOIN tokp0 t ON t.doc_id = b.doc_id AND ({slot0_pred})
    AND t.pos < b.e
  GROUP BY b.doc_id, b.e
),
iv AS (SELECT doc_id, s, min(e) AS e FROM fb0 GROUP BY doc_id, s),
pf AS (
  SELECT doc_id, sum(1.0 / greatest((e - s + 1) - 2 + 1, 1)) AS freq
  FROM iv WHERE (e - s + 1) - 2 <= {max_gaps} GROUP BY doc_id
),
ivsc AS (SELECT doc_id, 1.0 - 1.0 / (freq + 1.0) AS score FROM pf WHERE freq > 0)
"""
        + _rank_tail("score", "FROM ivsc", k)
    )


def _interval_filter_slots_sql(
    src_slots: list, src_ordered: bool, ref_terms: list[str],
    ref_ordered: bool, k: int = 10,
) -> str:
    """`containing` filter with OR-alternation slots on the SOURCE side:
    the source minimal stream comes from the slot staircase (union of
    alternatives per slot), the reference from the point-term chain;
    minExtent = source slot count."""
    n_src = len(src_slots)
    body, win = _slots_win_sql(src_slots, src_ordered)
    return (
        _PRELUDE
        + body
        + f"""
, swin AS ({win}),
ivs AS (SELECT doc_id, s, min(e) AS e FROM swin GROUP BY doc_id, s)"""
        + _iv_ctes(ref_terms, ref_ordered, -1, pfx="r")
        + f"""
, keep AS (
  SELECT a.* FROM ivs a
  WHERE EXISTS (SELECT 1 FROM ivr b WHERE b.doc_id = a.doc_id
                AND b.s >= a.s AND b.e <= a.e)
),
pf AS (
  SELECT doc_id, sum(1.0 / greatest((e - s + 1) - {n_src} + 1, 1)) AS freq
  FROM keep GROUP BY doc_id
),
ivsc AS (SELECT doc_id, 1.0 - 1.0 / (freq + 1.0) AS score FROM pf WHERE freq > 0)
"""
        + _rank_tail("score", "FROM ivsc", k)
    )


def _intervals_no_overlaps_sql(a: str, b: str, k: int = 10) -> str:
    """Intervals.unorderedNoOverlaps(a, b) parity SQL — the reference's own
    composition or(ordered(a,b), ordered(b,a)) (Intervals.java:285-287):
    both ordered minimal streams, unioned, minus every interval strictly
    containing another (DisjunctionIntervalIterator's containing-pop walk);
    minExtent = min over subs = 2."""
    return (
        _PRELUDE
        + _iv_ctes([a, b], True, -1, pfx="x")
        + _iv_ctes([b, a], True, -1, pfx="y")
        + """
, u AS (SELECT doc_id, s, e FROM ivx UNION SELECT doc_id, s, e FROM ivy),
ivn AS (
  SELECT doc_id, s, e FROM u a
  WHERE NOT EXISTS (
    SELECT 1 FROM u b WHERE b.doc_id = a.doc_id
      AND b.s >= a.s AND b.e <= a.e AND (b.s <> a.s OR b.e <> a.e)
  )
),
pf AS (
  SELECT doc_id, sum(1.0 / greatest((e - s + 1) - 2 + 1, 1)) AS freq
  FROM ivn GROUP BY doc_id
),
ivsc AS (SELECT doc_id, 1.0 - 1.0 / (freq + 1.0) AS score FROM pf WHERE freq > 0)
"""
        + _rank_tail("score", "FROM ivsc", k)
    )


_BLOCK_CORPUS_SQL = """
WITH corpus AS (
  SELECT (doc_id // 4) * 5 + (doc_id % 4) AS doc_id, text FROM documents
  UNION ALL
  SELECT DISTINCT (doc_id // 4) * 5 + 4, 'zzblockparentzz' FROM documents
),
pmap AS (
  SELECT doc_id, (doc_id // 5) * 5 + 4 AS parent_id
  FROM corpus WHERE doc_id % 5 <> 4
)
"""


def _block_prelude() -> str:
    """The BM25 prelude over the block corpus (documents rows in blocks
    of 4 children + a 'zzblockparentzz' marker parent, children preceding
    parent) instead of the raw documents table."""
    return _BLOCK_CORPUS_SQL + _PRELUDE.replace(
        "WITH tokarr", ", tokarr"
    ).replace("FROM documents", "FROM corpus")


def _block_join_parent_sql(term: str, mode: str, k: int = 10) -> str:
    """ToParentBlockJoin oracle: per-block aggregate of child BM25 scores
    (parent = the block's marker doc; children mapped by construction,
    independent of the engine's window-derived parent map)."""
    agg = {"max": "max(score)", "min": "min(score)",
           "total": "sum(score)", "avg": "sum(score) / count(*)",
           "none": "0.0"}[mode]
    return (
        _block_prelude()
        + _scored_cte([term])
        + f"""
, childsc AS (
  SELECT s.doc_id, s.score, p.parent_id
  FROM sc s JOIN pmap p ON p.doc_id = s.doc_id
),
agg AS (
  SELECT parent_id AS doc_id, {agg} AS score FROM childsc GROUP BY parent_id
)
"""
        + _rank_tail("score", "FROM agg", k)
    )


def _block_join_child_sql(term: str, k: int = 10) -> str:
    """ToChildBlockJoin oracle over a ToParentBlockJoin(max) parent query:
    every child of a matched block carries the parent's score."""
    return (
        _block_prelude()
        + _scored_cte([term])
        + """
, childsc AS (
  SELECT s.doc_id, s.score, p.parent_id
  FROM sc s JOIN pmap p ON p.doc_id = s.doc_id
),
pagg AS (SELECT parent_id, max(score) AS pscore FROM childsc GROUP BY parent_id),
kids AS (
  SELECT p.doc_id, g.pscore AS score
  FROM pmap p JOIN pagg g ON g.parent_id = p.parent_id
)
"""
        + _rank_tail("score", "FROM kids", k)
    )


def _block_join_children_of_sql(term: str, k: int = 10) -> str:
    """ParentChildrenBlockJoin oracle: the matching children of the parent
    of the FIRST (min doc_id) matching child."""
    return (
        _block_prelude()
        + _scored_cte([term])
        + """
, childsc AS (
  SELECT s.doc_id, s.score, p.parent_id
  FROM sc s JOIN pmap p ON p.doc_id = s.doc_id
),
sel AS (
  SELECT doc_id, score FROM childsc
  WHERE parent_id = (
    SELECT parent_id FROM childsc
    WHERE doc_id = (SELECT min(doc_id) FROM childsc)
  )
)
"""
        + _rank_tail("score", "FROM sel", k)
    )


_FT_BASE = """
, big AS (
  SELECT a.term AS t1, b.term AS t2, count(*)::BIGINT AS cnt
  FROM tokp a JOIN tokp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2
),
uni AS (SELECT term, count(*)::BIGINT AS cnt FROM tok GROUP BY term),
tot AS (SELECT sum(cnt)::DOUBLE AS n FROM uni)
"""


def _free_text_next_word_sql(ctx_word: str, k: int = 10) -> str:
    """FreeTextSuggester oracle, trailing-space key: single bigram level,
    score = cnt / count(context word)."""
    return (
        _PRELUDE
        + _FT_BASE
        + f"""
, ctx AS (SELECT cnt::DOUBLE AS c FROM uni WHERE term = '{ctx_word}'),
res AS (
  SELECT '{ctx_word} ' || t2 AS text, round(cnt / ctx.c, 9) AS score
  FROM big, ctx WHERE t1 = '{ctx_word}'
)
SELECT rank, text, score FROM (
  SELECT row_number() OVER (ORDER BY score DESC, text ASC)::INT AS rank,
         text, score
  FROM res
) WHERE rank <= {k} ORDER BY rank
"""
    )


def _free_text_backoff_sql(ctx_word: str, prefix: str, k: int = 10) -> str:
    """FreeTextSuggester oracle, two levels: bigram completions of
    '<ctx> <prefix>…' (score cnt/count(ctx)) then 0.4-backed-off unigram
    completions of '<prefix>…' excluding words already suggested, with
    the engine's fetch-window semantics (top k+|seen| candidates, drop
    seen, cap k)."""
    return (
        _PRELUDE
        + _FT_BASE
        + f"""
, ctx AS (SELECT cnt::DOUBLE AS c FROM uni WHERE term = '{ctx_word}'),
l1 AS (
  SELECT t2 AS w, cnt,
         row_number() OVER (ORDER BY cnt DESC, t2 ASC) AS r
  FROM big WHERE t1 = '{ctx_word}' AND t2 LIKE '{prefix}%'
),
l1sel AS (SELECT w, cnt FROM l1 WHERE r <= {k}),
seen_n AS (SELECT count(*)::BIGINT AS n FROM l1sel),
l0 AS (
  SELECT term AS w, cnt,
         row_number() OVER (ORDER BY cnt DESC, term ASC) AS r
  FROM uni WHERE term LIKE '{prefix}%'
),
l0win AS (SELECT w, cnt FROM l0, seen_n WHERE r <= {k} + seen_n.n),
l0new AS (
  SELECT w, cnt, row_number() OVER (ORDER BY cnt DESC, w ASC) AS r2
  FROM l0win WHERE w NOT IN (SELECT w FROM l1sel)
),
res AS (
  SELECT '{ctx_word} ' || w AS text, round(cnt / ctx.c, 9) AS score
  FROM l1sel, ctx
  UNION ALL
  SELECT w AS text, round(0.4 * cnt / tot.n, 9) AS score
  FROM l0new, tot WHERE r2 <= {k}
)
SELECT rank, text, score FROM (
  SELECT row_number() OVER (ORDER BY score DESC, text ASC)::INT AS rank,
         text, score
  FROM res
) WHERE rank <= {k} ORDER BY rank
"""
    )


def _simple_parsed_sql(k: int = 10) -> str:
    """simple_parse('merge+table -slow', MUST): MUST(merge) MUST(table)
    MUST(NOT slow wrapper scoring 1.0 via its SHOULD MatchAll)."""
    return (
        _PRELUDE
        + _scored_cte(["merge", "table"])
        + """
, agg AS (SELECT doc_id, sum(score) AS score FROM sc GROUP BY doc_id),
matched AS (
  SELECT g.doc_id, g.score + 1.0 AS score FROM agg g
  WHERE (SELECT count(DISTINCT term) FROM sc m
         WHERE m.doc_id = g.doc_id AND m.term IN ('merge', 'table')) = 2
    AND NOT EXISTS (SELECT 1 FROM tf x
                    WHERE x.doc_id = g.doc_id AND x.term = 'slow')
)
"""
        + _rank_tail("score", "FROM matched", k)
    )


def _simple_parsed_prefix_phrase_sql(k: int = 10) -> str:
    """simple_parse('"fast table" | vect*'): SHOULD(exact phrase) +
    SHOULD(constant-score 1.0 prefix expansion)."""
    idf_sum = " + ".join(
        "ln(1 + (s.n - (SELECT df FROM dfreq WHERE term = '%s') + 0.5) /"
        " ((SELECT df FROM dfreq WHERE term = '%s') + 0.5))" % (t, t)
        for t in ("fast", "table")
    )
    inv = _INV.format(k1=K1, b=B)
    return (
        _PRELUDE
        + f"""
, pf AS (
  SELECT p0.doc_id, count(*)::BIGINT AS freq
  FROM tokp p0 JOIN tokp p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
  WHERE p0.term = 'fast' AND p1.term = 'table'
  GROUP BY p0.doc_id
),
psc AS (
  SELECT pf.doc_id,
         (({idf_sum})) - (({idf_sum})) / (1 + pf.freq * {inv}) AS score
  FROM pf JOIN dlq q ON q.doc_id = pf.doc_id CROSS JOIN stats s
),
pre AS (SELECT DISTINCT doc_id FROM tf WHERE term LIKE 'vect%'),
comb AS (
  SELECT coalesce(p.doc_id, r.doc_id) AS doc_id,
         coalesce(p.score, 0)
           + (CASE WHEN r.doc_id IS NOT NULL THEN 1.0 ELSE 0.0 END) AS score
  FROM psc p FULL OUTER JOIN pre r ON r.doc_id = p.doc_id
)
"""
        + _rank_tail("score", "FROM comb", k)
    )


def _diversified_sql(term: str, k: int, m: int) -> str:
    """DiversifiedTopDocsCollector oracle: per-key top-m on the ROUNDED
    score (ties -> doc_id), then global top-k in the same order."""
    return (
        _PRELUDE
        + _scored_cte([term])
        + f"""
, dsc AS (
  SELECT s.doc_id, round(s.score, 6) AS score,
         coalesce((d.n_chars % 7)::BIGINT, 0) AS k
  FROM sc s JOIN documents d ON d.doc_id = s.doc_id
),
per AS (
  SELECT doc_id, score,
         row_number() OVER (PARTITION BY k ORDER BY score DESC, doc_id ASC) AS r
  FROM dsc
),
div AS (
  SELECT doc_id, score FROM per WHERE r <= {m}
  ORDER BY score DESC, doc_id ASC LIMIT {k}
)
"""
        + _rank_tail("score", "FROM div", k)
    )


def _blended_term_sql(t1: str, b1: float, t2: str, b2: float,
                      tie: float, k: int = 10) -> str:
    """BlendedTermQuery oracle: both terms scored with the ARTIFICIAL
    df = max(df_1, df_2), per-term boosts, dismax(tie) combination."""
    idf = _IDF.format(df="bd.df")
    inv = _INV.format(k1=K1, b=B)
    return (
        _PRELUDE
        + f"""
, bd AS (SELECT max(df) AS df FROM dfreq WHERE term IN ('{t1}', '{t2}')),
bsc AS (
  SELECT tf.doc_id,
         (CASE WHEN tf.term = '{t1}' THEN {b1} ELSE {b2} END * {idf})
         - (CASE WHEN tf.term = '{t1}' THEN {b1} ELSE {b2} END * {idf})
           / (1 + tf.freq * {inv}) AS score
  FROM tf
  JOIN dlq q ON q.doc_id = tf.doc_id
  CROSS JOIN stats s
  CROSS JOIN bd
  WHERE tf.term IN ('{t1}', '{t2}')
),
bagg AS (
  SELECT doc_id,
         max(score) + {tie} * (sum(score) - max(score)) AS score
  FROM bsc GROUP BY doc_id
)
"""
        + _rank_tail("score", "FROM bagg", k)
    )


def _fuzzy_like_this_sql(words: list, max_edits: int, max_num_terms: int,
                         k: int = 10, cap: int = 50) -> str:
    """FuzzyLikeThisQuery oracle (OSA == Damerau at max_edits 1): per
    word, banded variants scored 1 - d/min(len), top-``cap`` by (sim
    desc, term asc); word df or integer-division avg variant df; variant
    score = sim² · (ln((N+1)/(df+1)) + 1); global top max_num_terms;
    doc score = Σ boosts of present selected terms."""
    parts = []
    for i, w in enumerate(words):
        parts.append(f"""
v{i} AS (
  SELECT term, df,
         1.0 - damerau_levenshtein(term, '{w}')
               / least({len(w)}, length(term))::DOUBLE AS sim
  FROM dfreq
  WHERE length(term) BETWEEN {len(w) - max_edits} AND {len(w) + max_edits}
    AND damerau_levenshtein(term, '{w}') <= {max_edits}
),
v{i}top AS (
  SELECT term, sim, row_number() OVER (ORDER BY sim DESC, term ASC) AS r
  FROM v{i}
),
v{i}df AS (
  SELECT coalesce(
    (SELECT df FROM dfreq WHERE term = '{w}' AND df > 0),
    (SELECT sum(df)::BIGINT // count(*) FROM v{i})
  ) AS dfw
),
v{i}sc AS (
  SELECT t.term,
         t.sim * t.sim
           * (ln((s.n + 1) / ((SELECT dfw FROM v{i}df) + 1)) + 1) AS score
  FROM v{i}top t CROSS JOIN stats s WHERE t.r <= {cap}
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT term, score FROM v{i}sc" for i in range(len(words))
    )
    return (
        _PRELUDE
        + ", " + ",".join(p.strip() for p in parts)
        + f""",
sel AS (
  SELECT term, score,
         row_number() OVER (ORDER BY score DESC, term ASC) AS r
  FROM ({union})
),
fsc AS (
  SELECT tf.doc_id, sum(s.score) AS score
  FROM (SELECT DISTINCT doc_id, term FROM tf) tf
  JOIN sel s ON s.term = tf.term AND s.r <= {max_num_terms}
  GROUP BY tf.doc_id
)
"""
        + _rank_tail("score", "FROM fsc", k)
    )


def _raycast_sql(pts) -> str:
    """Even-odd ray-cast membership over a ring as a SQL predicate
    (mirrors functions/geo.py::_raycast_inside edge by edge)."""
    terms = []
    n = len(pts)
    for i in range(n):
        y1, x1 = pts[i]
        y2, x2 = pts[(i + 1) % n]
        if y1 == y2:
            continue
        terms.append(
            f"(CASE WHEN (({y1} > lat) <> ({y2} > lat)) AND "
            f"(lon < ({x2} - {x1}) * (lat - {y1}) / ({y2} - {y1}) + {x1}) "
            f"THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ") % 2 = 1"


def _join_util_sql(term: str, mode: str, k: int = 10) -> str:
    """JoinUtil self-join oracle: per-lang aggregate of the from-side BM25
    scores, fanned to every doc of that lang (missing values join as '')."""
    agg = {"max": "max(s.score)", "min": "min(s.score)",
           "total": "sum(s.score)", "avg": "avg(s.score)"}[mode]
    return (
        _PRELUDE
        + _scored_cte([term])
        + f"""
, fv AS (SELECT doc_id, coalesce(lang, '') AS v FROM documents),
agg AS (
  SELECT f.v, {agg} AS jscore
  FROM sc s JOIN fv f ON f.doc_id = s.doc_id GROUP BY f.v
),
tosc AS (
  SELECT d.doc_id, a.jscore AS score
  FROM documents d JOIN agg a ON coalesce(d.lang, '') = a.v
)
"""
        + _rank_tail("score", "FROM tosc", k)
    )


def _combined_field_sql(term: str, wt: float, wl: float, k: int = 10) -> str:
    """CombinedFieldQuery (BM25F) oracle: freq = wt*tf_text + wl*tf_lang;
    combined norm = intToByte4(round(wt*dlq_text + wl*dlq_lang)) decoded
    back through byte4ToInt; pseudo stats df = max, sttf = trunc(weighted
    sum), docCount = max — CombinedFieldWeight's merges in SQL."""
    import re as _re

    lang_part = _PRELUDE.replace("WITH ", ", ").replace("lower(text)", "lower(lang)")
    lang_part = _re.sub(
        r"\b(tokarr|tokp|tok|dfreq|dlq|dl|nrm|tf|stats)\b", r"l\1", lang_part
    )
    return (
        _PRELUDE
        + lang_part
        + f"""
, cs AS (
  SELECT greatest(s.n, ls.n) AS n,
         trunc({wt} * s.sttf + {wl} * ls.sttf) AS sttf
  FROM stats s, lstats ls
),
cdf AS (
  SELECT greatest(
    coalesce((SELECT df FROM dfreq WHERE term = '{term}'), 0),
    coalesce((SELECT df FROM ldfreq WHERE term = '{term}'), 0)
  ) AS df
),
cfreq AS (
  SELECT doc_id, sum(wf) AS freq FROM (
    SELECT doc_id, {wt} * freq AS wf FROM tf WHERE term = '{term}'
    UNION ALL
    SELECT doc_id, {wl} * freq FROM ltf WHERE term = '{term}'
  ) GROUP BY doc_id
),
craw AS (
  SELECT q.doc_id, round({wt} * q.dlq + {wl} * lq.ldlq)::BIGINT AS cl
  FROM dlq q JOIN ldlq lq ON lq.doc_id = q.doc_id
),
cnbx AS (
  SELECT doc_id,
    CASE WHEN cl < 24 THEN cl
         WHEN (cl - 24) < 8 THEN cl
         ELSE 24 + ((((cl - 24) >> (length(format('{{:b}}', cl - 24)) - 4)) & 7)
                    | ((length(format('{{:b}}', cl - 24)) - 3) << 3))
    END AS nb
  FROM craw
),
cdlq AS (
  SELECT doc_id,
    (CASE WHEN nb < 24 THEN nb
          WHEN ((nb - 24) >> 3) = 0 THEN nb
          ELSE 24 + ((((nb - 24) & 7) | 8) << (((nb - 24) >> 3) - 1))
     END)::DOUBLE AS cdl
  FROM cnbx
),
csc AS (
  SELECT f.doc_id,
         (ln(1 + (cs.n - cdf.df + 0.5) / (cdf.df + 0.5)))
         - (ln(1 + (cs.n - cdf.df + 0.5) / (cdf.df + 0.5)))
           / (1 + f.freq * (1.0 / ({K1} * ((1 - {B})
                + {B} * d.cdl / (cs.sttf / cs.n))))) AS score
  FROM cfreq f JOIN cdlq d ON d.doc_id = f.doc_id
  CROSS JOIN cs CROSS JOIN cdf
)
"""
        + _rank_tail("score", "FROM csc", k)
    )


def _multifield_bare_sql(term: str, k: int = 10) -> str:
    """MultiFieldQueryParser bare-term expansion: SHOULD over (text, lang)
    fields, per-field BM25 with per-field stats, per-doc scores summed;
    a doc matches if ANY field matches."""
    import re as _re

    lang_part = _PRELUDE.replace("WITH ", ", ").replace("lower(text)", "lower(lang)")
    lang_part = _re.sub(
        r"\b(tokarr|tokp|tok|dfreq|dlq|dl|nrm|tf|stats)\b", r"l\1", lang_part
    )
    idf_t = _IDF.format(df="d.df")
    inv_t = _INV.format(k1=K1, b=B)
    idf_l = "ln(1 + (ls.n - ld.df + 0.5) / (ld.df + 0.5))"
    inv_l = f"(1.0 / ({K1} * ((1 - {B}) + {B} * lq.ldlq / (ls.sttf / ls.n))))"
    return (
        _PRELUDE
        + lang_part
        + f"""
, tsc AS (
  SELECT tf.doc_id, ({idf_t}) - ({idf_t}) / (1 + tf.freq * {inv_t}) AS score
  FROM tf JOIN dfreq d ON d.term = tf.term
  JOIN dlq q ON q.doc_id = tf.doc_id CROSS JOIN stats s
  WHERE tf.term = '{term}'
),
lsc AS (
  SELECT ltf.doc_id, ({idf_l}) - ({idf_l}) / (1 + ltf.freq * {inv_l}) AS score
  FROM ltf JOIN ldfreq ld ON ld.term = ltf.term
  JOIN ldlq lq ON lq.doc_id = ltf.doc_id CROSS JOIN lstats ls
  WHERE ltf.term = '{term}'
),
agg AS (
  SELECT doc_id, sum(score) AS score FROM (
    SELECT * FROM tsc UNION ALL SELECT * FROM lsc
  ) GROUP BY doc_id
)
"""
        + _rank_tail("score", "FROM agg", k)
    )


def _freq_rank_sql(match_cte: str, idf_terms: list[str], k: int = 10,
                   extra: str = "", prelude: str | None = None) -> str:
    """Shared tail for positional queries: `pf(doc_id, freq)` -> BM25 with
    idf summed over the PRESENT query terms (docFreq-0 terms contribute
    nothing, like Lucene's Weight skipping null termStatistics). ``extra``
    injects additional CTEs (each starting with ', ') before pf.

    idf counts term MULTIPLICITY: a phrase's termStats array has one entry
    per position (PhraseWeight), so a repeated term contributes its idf
    once per occurrence in the query."""
    counts: dict[str, int] = {}
    for t in idf_terms:
        counts[t] = counts.get(t, 0) + 1
    if any(c > 1 for c in counts.values()):
        vals = ", ".join(f"('{t}', {c})" for t, c in counts.items())
        idf_sum = (
            f"(SELECT sum(m.cnt * ln(1 + (s.n - df + 0.5) / (df + 0.5))) "
            f"FROM dfreq JOIN (VALUES {vals}) AS m(term, cnt) "
            f"ON m.term = dfreq.term)"
        )
    else:
        in_list = ", ".join(f"'{t}'" for t in counts)
        idf_sum = (
            f"(SELECT sum(ln(1 + (s.n - df + 0.5) / (df + 0.5))) "
            f"FROM dfreq WHERE term IN ({in_list}))"
        )
    inv = _INV.format(k1=K1, b=B)
    return (
        (prelude if prelude is not None else _PRELUDE)
        + extra
        + f"""
, pf AS (
{match_cte}
),
psc AS (
  SELECT pf.doc_id,
         (({idf_sum})) - (({idf_sum})) / (1 + pf.freq * {inv}) AS score
  FROM pf JOIN dlq q ON q.doc_id = pf.doc_id CROSS JOIN stats s
  WHERE pf.freq > 0
)
"""
        + _rank_tail("score", "FROM psc", k)
    )


def _multi_phrase_sql(slots: list[list[str]], k: int = 10) -> str:
    """MultiPhraseQuery: slot i matches any alternative at start+i; freq =
    COUNT(DISTINCT start position)."""
    joins, conds = [], []
    for i, alts in enumerate(slots):
        if i == 0:
            joins.append("tokp p0")
        else:
            joins.append(
                f"JOIN tokp p{i} ON p{i}.doc_id = p0.doc_id AND p{i}.pos = p0.pos + {i}"
            )
        conds.append(
            f"p{i}.term IN ({', '.join(repr(t) for t in alts)})"
        )
    match = (
        f"  SELECT p0.doc_id, count(DISTINCT p0.pos)::BIGINT AS freq\n"
        f"  FROM {joins[0]} {' '.join(joins[1:])}\n"
        f"  WHERE {' AND '.join(conds)}\n"
        f"  GROUP BY p0.doc_id"
    )
    return _freq_rank_sql(match, [t for s in slots for t in s], k)


def _span_near_sql(terms: list[str], slop: int, in_order: bool, k: int = 10) -> str:
    """SpanNearQuery parity SQL (lucene_spark/matchers.py semantics).

    Ordered (NearSpansOrdered.java): for each position p0 of clause 0 the
    greedy monotone chain q_i = min{pos(t_i) > q_{i-1}} (stretchToOrder with
    forward-only iterators); match iff q_last - p0 - (n-1) <= slop; weight =
    1/(1 + matchLength), matchLength = (q_last + 1) - p0
    (SpanScorer.setFreqCurrentDoc).

    Unordered (NearSpansUnordered.java, 2 clauses): the advance-min walk's
    visited states are exactly {(x, m = min{other clause > x})}; match iff
    (m + 1 - x) - 2 <= slop; weight 1/(1 + (m + 1 - x))."""
    n = len(terms)
    if in_order:
        ctes = [
            f", s0 AS (SELECT doc_id, pos AS p0, pos AS q0 FROM tokp WHERE term = '{terms[0]}')"
        ]
        for i in range(1, n):
            ctes.append(
                f", s{i} AS (\n"
                f"  SELECT s.doc_id, s.p0, min(t.pos) AS q{i}\n"
                f"  FROM s{i-1} s JOIN tokp t ON t.doc_id = s.doc_id"
                f" AND t.term = '{terms[i]}' AND t.pos > s.q{i-1}\n"
                f"  GROUP BY s.doc_id, s.p0\n)"
            )
        match = (
            f"  SELECT doc_id, sum(1.0 / (q{n-1} + 2 - p0)) AS freq\n"
            f"  FROM s{n-1} WHERE q{n-1} - p0 - {n-1} <= {slop}\n"
            f"  GROUP BY doc_id"
        )
        return _freq_rank_sql(match, terms, k, extra="".join(ctes))
    assert n == 2, "unordered span oracle SQL is derived for 2 clauses"
    t0, t1 = terms
    extra = f"""
, ux AS (
  SELECT a.doc_id, a.pos AS x, min(b.pos) AS m
  FROM tokp a JOIN tokp b ON b.doc_id = a.doc_id AND b.term = '{t1}' AND b.pos > a.pos
  WHERE a.term = '{t0}' GROUP BY a.doc_id, a.pos
),
uy AS (
  SELECT a.doc_id, a.pos AS x, min(b.pos) AS m
  FROM tokp a JOIN tokp b ON b.doc_id = a.doc_id AND b.term = '{t0}' AND b.pos > a.pos
  WHERE a.term = '{t1}' GROUP BY a.doc_id, a.pos
),
uu AS (SELECT * FROM ux UNION ALL SELECT * FROM uy)
"""
    match = (
        f"  SELECT doc_id, sum(1.0 / (m + 2 - x)) AS freq\n"
        f"  FROM uu WHERE m - x - 1 <= {slop} GROUP BY doc_id"
    )
    return _freq_rank_sql(match, terms, k, extra=extra)


def _span_near_slots_sql(slots: list, slop: int, k: int = 10) -> str:
    """Ordered SpanNear with slot clauses (SpanMultiTermQueryWrapper /
    SpanOr-in-SpanNear): the greedy forward chain runs over each slot's
    position union (a slot = an IN-list or a raw predicate over `term`);
    idf sums over the DISTINCT dictionary terms matching ANY slot
    (SpanWeight's per-term states map)."""
    n = len(slots)
    slots = [s if isinstance(s, (list, tuple, str)) else [s] for s in slots]
    ctes = [
        f", s0 AS (SELECT doc_id, pos AS p0, pos AS q0 FROM tokp"
        f" WHERE {_slot_pred(slots[0])})"
    ]
    for i in range(1, n):
        ctes.append(
            f", s{i} AS (\n"
            f"  SELECT s.doc_id, s.p0, min(t.pos) AS q{i}\n"
            f"  FROM s{i-1} s JOIN tokp t ON t.doc_id = s.doc_id"
            f" AND {_slot_pred(slots[i], 't.term')} AND t.pos > s.q{i-1}\n"
            f"  GROUP BY s.doc_id, s.p0\n)"
        )
    idf_pred = " OR ".join(f"({_slot_pred(s, 'dfreq.term')})" for s in slots)
    idf = (
        f"(SELECT sum(ln(1 + (s.n - df + 0.5) / (df + 0.5)))"
        f" FROM dfreq WHERE {idf_pred})"
    )
    inv = _INV.format(k1=K1, b=B)
    return (
        _PRELUDE
        + "".join(ctes)
        + f"""
, pf AS (
  SELECT doc_id, sum(1.0 / (q{n-1} + 2 - p0)) AS freq
  FROM s{n-1} WHERE q{n-1} - p0 - {n-1} <= {slop} GROUP BY doc_id
),
psc AS (
  SELECT pf.doc_id,
         ({idf}) - ({idf}) / (1 + pf.freq * {inv}) AS score
  FROM pf JOIN dlq q ON q.doc_id = pf.doc_id CROSS JOIN stats s
  WHERE pf.freq > 0
)
"""
        + _rank_tail("score", "FROM psc", k)
    )


def _span_masked_stop_sql(k: int = 10) -> str:
    """FieldMaskingSpanQuery oracle: SpanNear(ordered, slop 1) ON the
    stop-filtered field with the 'the' clause masked from the unfiltered
    text field. Positions: 'the' from tokp0 (full ordinals), 'fast' from
    tokp (stop-filtered, hole-preserved ordinals — directly comparable).
    Scoring: norms/avgdl/collection stats from the STOP field (dlq/stats
    of the stop prelude), idf('the') from the FULL-text docFreq (the
    term's own TermStates), idf('fast') from the stop field's docFreq."""
    idf = (
        "((SELECT ln(1 + (s.n - df + 0.5) / (df + 0.5)) FROM dfreq0"
        " WHERE term = 'the')"
        " + (SELECT ln(1 + (s.n - df + 0.5) / (df + 0.5)) FROM dfreq"
        " WHERE term = 'fast'))"
    )
    inv = _INV.format(k1=K1, b=B)
    return (
        _stop_prelude(("the", "a"))
        + f"""
, dfreq0 AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok0 GROUP BY term
),
s0 AS (SELECT doc_id, pos AS p0, pos AS q0 FROM tokp0 WHERE term = 'the'),
s1 AS (
  SELECT s.doc_id, s.p0, min(t.pos) AS q1
  FROM s0 s JOIN tokp t ON t.doc_id = s.doc_id AND t.term = 'fast'
    AND t.pos > s.q0
  GROUP BY s.doc_id, s.p0
),
pf AS (
  SELECT doc_id, sum(1.0 / (q1 + 2 - p0)) AS freq
  FROM s1 WHERE q1 - p0 - 1 <= 1 GROUP BY doc_id
),
psc AS (
  SELECT pf.doc_id,
         ({idf}) - ({idf}) / (1 + pf.freq * {inv}) AS score
  FROM pf JOIN dlq q ON q.doc_id = pf.doc_id CROSS JOIN stats s
  WHERE pf.freq > 0
)
"""
        + _rank_tail("score", "FROM psc", k)
    )


def _stop_prelude(stopset: tuple) -> str:
    """_PRELUDE with StopFilter hole semantics: stopwords are dropped from
    tok/tokp (so tf/dl/norms shrink) but positions keep their PRE-filter
    ordinals — dropped tokens leave holes, exactly the engine's
    FilteringTokenFilter position-increment behavior."""
    lits = ", ".join(f"'{t}'" for t in stopset)
    out = _PRELUDE.replace(
        "tok AS (\n  SELECT doc_id, unnest(toks) AS term FROM tokarr\n)",
        "tok0 AS (\n  SELECT doc_id, unnest(toks) AS term FROM tokarr\n),\n"
        f"tok AS (SELECT * FROM tok0 WHERE term NOT IN ({lits}))",
    )
    out = out.replace(
        "tokp AS (\n  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos\n  FROM tokarr\n)",
        "tokp0 AS (\n  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos\n  FROM tokarr\n),\n"
        f"tokp AS (SELECT * FROM tokp0 WHERE term NOT IN ({lits}))",
    )
    return out


def _compound_prelude(
    words: tuple[str, ...],
    min_word: int = 5,
    min_sub: int = 2,
    max_sub: int = 15,
) -> str:
    """_PRELUDE with dictionary-decompounding (posIncr=0) semantics,
    re-deriving the brute-force substring scan of
    DictionaryCompoundWordTokenFilter.decompose INDEPENDENTLY in SQL: for
    every token of length >= min_word, every dictionary word of length in
    [min_sub, max_sub] occurring at any start offset is injected at the
    token's position. tf/df/sttf count the injections; the norm-length
    chain counts only base tokens (numOverlap discount)."""
    lits = ", ".join(f"('{w}')" for w in words)
    adds = f"""  UNION ALL
  SELECT t.doc_id, d.w AS term{{pos_sel}}
  FROM {{src}} t, (VALUES {lits}) d(w), generate_series(1, 64) g(i)
  WHERE length(t.term) >= {min_word}
    AND length(d.w) BETWEEN {min_sub} AND {max_sub}
    AND g.i + length(d.w) - 1 <= length(t.term)
    AND substring(t.term, g.i, length(d.w)) = d.w"""
    adds_tok = adds.format(src="tok0", pos_sel="")
    adds_tokp = adds.format(src="tokp0", pos_sel=", t.pos")
    out = _PRELUDE.replace(
        "tok AS (\n  SELECT doc_id, unnest(toks) AS term FROM tokarr\n)",
        "tok0 AS (\n  SELECT doc_id, unnest(toks) AS term FROM tokarr\n),\n"
        "tok AS (\n  SELECT * FROM tok0\n" + adds_tok + "\n)",
    )
    out = out.replace(
        "tokp AS (\n  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos\n  FROM tokarr\n)",
        "tokp0 AS (\n  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos\n  FROM tokarr\n),\n"
        "tokp AS (\n  SELECT * FROM tokp0\n" + adds_tokp + "\n)",
    )
    out = out.replace(
        "dl AS (SELECT doc_id, count(*)::BIGINT AS len FROM tok GROUP BY 1)",
        "dl AS (SELECT doc_id, count(*)::BIGINT AS len FROM tok0 GROUP BY 1)",
    )
    out = out.replace(
        "(SELECT coalesce(sum(len), 0) FROM dl)::DOUBLE AS sttf",
        "(SELECT count(*) FROM tok)::DOUBLE AS sttf",
    )
    return out


def _syn_prelude(synonyms: list[tuple[str, list[str]]]) -> str:
    """_PRELUDE with index-time synonym (posIncr=0) semantics: injected
    tokens join tok/tokp at the SAME position (tf/df/sttf grow) while the
    norm-length chain (dl -> nrm -> dlq) counts only BASE tokens — the
    numOverlap discount (IndexingChain.java:1196; BM25 discountOverlaps)."""
    adds_tok = "\n".join(
        f"  UNION ALL SELECT doc_id, '{extra}' AS term FROM tok0 WHERE term = '{base}'"
        for base, extras in synonyms
        for extra in extras
    )
    adds_tokp = "\n".join(
        f"  UNION ALL SELECT doc_id, '{extra}' AS term, pos FROM tokp0 WHERE term = '{base}'"
        for base, extras in synonyms
        for extra in extras
    )
    out = _PRELUDE.replace(
        "tok AS (\n  SELECT doc_id, unnest(toks) AS term FROM tokarr\n)",
        "tok0 AS (\n  SELECT doc_id, unnest(toks) AS term FROM tokarr\n),\n"
        "tok AS (\n  SELECT * FROM tok0\n" + adds_tok + "\n)",
    )
    out = out.replace(
        "tokp AS (\n  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos\n  FROM tokarr\n)",
        "tokp0 AS (\n  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos\n  FROM tokarr\n),\n"
        "tokp AS (\n  SELECT * FROM tokp0\n" + adds_tokp + "\n)",
    )
    out = out.replace(
        "dl AS (SELECT doc_id, count(*)::BIGINT AS len FROM tok GROUP BY 1)",
        "dl AS (SELECT doc_id, count(*)::BIGINT AS len FROM tok0 GROUP BY 1)",
    )
    out = out.replace(
        "(SELECT coalesce(sum(len), 0) FROM dl)::DOUBLE AS sttf",
        "(SELECT count(*) FROM tok)::DOUBLE AS sttf",
    )
    return out


def _phrase_slop_sql(terms: list[str], slop: int, k: int = 10,
                     prelude: str | None = None) -> str:
    """Sloppy PhraseQuery parity SQL (2 distinct terms): the recursive
    crossing chain equivalent to SloppyPhraseMatcher's PQ walk (proven in
    tests/test_matchers.py::test_sloppy2_crossing_chain_equals_pq_walk):
    adjusted positions (pos - slot); t0 = max of the two first elements
    (ties: the slot-0 element is popped first per PhraseQueue, so the slot-1
    element is the target); t_{k+1} = min{opposite side > t_k}; every target
    t emits one match with matchLength = t - max{opposite side <= t}, weight
    1/(1 + matchLength); docs must contain both terms."""
    assert len(terms) == 2
    t0, t1 = terms
    extra = f"""
, ap AS (
  SELECT doc_id, pos AS p, 0 AS side FROM tokp WHERE term = '{t0}'
  UNION ALL
  SELECT doc_id, pos - 1 AS p, 1 AS side FROM tokp WHERE term = '{t1}'
),
firsts AS (
  SELECT doc_id,
         min(CASE WHEN side = 0 THEN p END) AS a0,
         min(CASE WHEN side = 1 THEN p END) AS b0
  FROM ap GROUP BY doc_id
  HAVING count(DISTINCT side) = 2
),
chain(doc_id, t, side) AS (
  SELECT doc_id, greatest(a0, b0),
         CASE WHEN b0 >= a0 THEN 1 ELSE 0 END
  FROM firsts
  UNION ALL
  SELECT c.doc_id,
         (SELECT min(p) FROM ap WHERE ap.doc_id = c.doc_id
            AND ap.side = 1 - c.side AND ap.p > c.t),
         1 - c.side
  FROM chain c
  WHERE EXISTS (SELECT 1 FROM ap WHERE ap.doc_id = c.doc_id
                  AND ap.side = 1 - c.side AND ap.p > c.t)
),
gaps AS (
  SELECT c.doc_id,
         c.t - (SELECT max(p) FROM ap WHERE ap.doc_id = c.doc_id
                  AND ap.side = 1 - c.side AND ap.p <= c.t) AS gap
  FROM chain c
)
"""
    match = (
        f"  SELECT doc_id, sum(1.0 / (1 + gap)) AS freq\n"
        f"  FROM gaps WHERE gap <= {slop} GROUP BY doc_id"
    )
    sql = _freq_rank_sql(match, terms, k, extra=extra, prelude=prelude)
    return sql.replace("WITH ", "WITH RECURSIVE ", 1)


def _span_unordered_dup2_sql(term: str, slop: int, k: int = 10) -> str:
    """Unordered SpanNearQuery with the SAME term twice ("x x"~slop):
    closed form of the NearSpansUnordered advance-min walk over two
    interchangeable iterators on one positions list. Visited states are the
    m self-states (p_i, p_i) — matchLength 1, always within slop (the
    overlap quirk: a single occurrence matches) — and the m-1
    consecutive-pair states (p_i, p_{i+1}) with matchLength d+1 (d the
    position delta), matching iff (d+1)-2 <= slop, each weighing
    1/(1+matchLength)."""
    extra = f"""
, occ AS (
  SELECT doc_id, pos, lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM tokp WHERE term = '{term}'
),
selfst AS (SELECT doc_id, count(*) * 0.5 AS f FROM occ GROUP BY doc_id),
pairst AS (
  SELECT doc_id, sum(1.0 / (nxt - pos + 2)) AS f
  FROM occ WHERE nxt IS NOT NULL AND nxt - pos <= {slop} + 1
  GROUP BY doc_id
)
"""
    match = (
        "  SELECT s.doc_id, s.f + coalesce(p.f, 0.0) AS freq\n"
        "  FROM selfst s LEFT JOIN pairst p ON p.doc_id = s.doc_id"
    )
    return _freq_rank_sql(match, [term, term], k, extra=extra)


def _span_unordered_machine_sql(terms: list[str], slop: int, k: int = 10) -> str:
    """Unordered SpanNearQuery for any clause count / multiset — a
    small-step recursive-CTE transcription of the NearSpansUnordered walk
    (NearSpansUnordered.java SpanTotalLengthEndPositionWindow): check the
    state (matchLength = maxEnd - minStart; match iff matchLength - n <=
    slop, weight 1/(1+matchLength)), advance the min-start clause, repeat
    until one clause exhausts. Duplicate clauses are interchangeable
    iterators over one list, so min-tie order cannot change the visited
    multiset; maxEnd = current max (positions are monotone per clause)."""
    n = len(terms)
    uniq = list(dict.fromkeys(terms))
    tord = {t: j for j, t in enumerate(uniq)}
    J = list(range(1, n + 1))
    lits = ", ".join(f"'{t}'" for t in uniq)
    first_cols = ",\n    ".join(
        f"first(ps) FILTER (term = '{t}') AS u{j}" for j, t in enumerate(uniq)
    )
    lsel = ",\n    ".join(f"u{tord[terms[i]]} AS l{i+1}" for i in range(n))
    lcols = ", ".join(f"l{j}" for j in J)
    icols = ", ".join(f"i{j}" for j in J)
    icols0 = ", ".join(f"0::BIGINT AS i{j}" for j in J)
    pexprs = ", ".join(f"(l{j})[(i{j}+1)::INT] AS p{j}" for j in J)
    pmax = "greatest(" + ", ".join(f"p{j}" for j in J) + ")"
    pmin = "least(" + ", ".join(f"p{j}" for j in J) + ")"
    srt = "list_sort([" + ", ".join(f"[p{j}, {j}::BIGINT]" for j in J) + "])"
    exh = (
        "CASE amin "
        + " ".join(f"WHEN {j} THEN i{j} + 1 >= len(l{j})" for j in J)
        + " END"
    )
    i_next = ", ".join(
        f"i{j} + (CASE WHEN amin = {j} THEN 1 ELSE 0 END) AS i{j}" for j in J
    )
    extra = f"""
, pl AS (
  SELECT doc_id, term, list_sort(list(pos)) AS ps
  FROM tokp WHERE term IN ({lits}) GROUP BY doc_id, term
),
cand AS (
  SELECT doc_id,
    {first_cols}
  FROM pl GROUP BY doc_id
  HAVING count(*) = {len(uniq)}
),
ini AS (
  SELECT doc_id,
    {lsel}
  FROM cand
),
machine(doc_id, {lcols}, {icols}, freq, ph) AS (
  SELECT doc_id, {lcols}, {icols0}, 0.0::DOUBLE, 'st' FROM ini
  UNION ALL
  SELECT doc_id, {lcols},
    {i_next},
    freq + (CASE WHEN ml - {n} <= {slop} THEN 1.0 / (1 + ml) ELSE 0.0 END),
    CASE WHEN {exh} THEN 'fin' ELSE 'st' END
  FROM (
    SELECT *, ({srt}[1])[2] AS amin FROM (
      SELECT *, {pmax} + 1 - {pmin} AS ml FROM (
        SELECT m.*, {pexprs}
        FROM machine m WHERE m.ph <> 'fin'
      ) sa
    ) sb
  ) sc
)
"""
    match = "  SELECT doc_id, freq FROM machine WHERE ph = 'fin' AND freq > 0"
    sql = _freq_rank_sql(match, terms, k, extra=extra)
    return sql.replace("WITH ", "WITH RECURSIVE ", 1)


def _span_set_ctes(spec, pfx: str) -> str:
    """CTEs computing `sp{pfx}(doc_id, s, e)` — an operand's actual span
    stream: term points (pos, pos+1), NearSpansOrdered greedy chains, or
    NearSpansUnordered matching states (2 distinct clauses)."""
    mode, terms, slop, in_order = spec
    if mode == "term":
        return (
            f", sp{pfx} AS (SELECT doc_id, pos AS s, pos + 1 AS e FROM tokp"
            f" WHERE term = '{terms[0]}')"
        )
    n = len(terms)
    if in_order:
        ctes = [
            f", {pfx}s0 AS (SELECT doc_id, pos AS p0, pos AS q0 FROM tokp"
            f" WHERE term = '{terms[0]}')"
        ]
        for i in range(1, n):
            ctes.append(
                f", {pfx}s{i} AS (\n"
                f"  SELECT s.doc_id, s.p0, min(t.pos) AS q{i}\n"
                f"  FROM {pfx}s{i-1} s JOIN tokp t ON t.doc_id = s.doc_id"
                f" AND t.term = '{terms[i]}' AND t.pos > s.q{i-1}\n"
                f"  GROUP BY s.doc_id, s.p0\n)"
            )
        return "".join(ctes) + (
            f", sp{pfx} AS (SELECT doc_id, p0 AS s, q{n-1} + 1 AS e"
            f" FROM {pfx}s{n-1} WHERE q{n-1} - p0 - {n-1} <= {slop})"
        )
    assert n == 2, "unordered span-set oracle derived for 2 distinct clauses"
    t0, t1 = terms
    return f"""
, {pfx}ux AS (
  SELECT a.doc_id, a.pos AS x, min(b.pos) AS m
  FROM tokp a JOIN tokp b ON b.doc_id = a.doc_id AND b.term = '{t1}' AND b.pos > a.pos
  WHERE a.term = '{t0}' GROUP BY a.doc_id, a.pos
),
{pfx}uy AS (
  SELECT a.doc_id, a.pos AS x, min(b.pos) AS m
  FROM tokp a JOIN tokp b ON b.doc_id = a.doc_id AND b.term = '{t0}' AND b.pos > a.pos
  WHERE a.term = '{t1}' GROUP BY a.doc_id, a.pos
),
sp{pfx} AS (
  SELECT doc_id, x AS s, m + 1 AS e
  FROM (SELECT * FROM {pfx}ux UNION ALL SELECT * FROM {pfx}uy)
  WHERE m - x - 1 <= {slop}
)"""


def _span_containing_sql(big_spec, little_spec, k: int = 10) -> str:
    """SpanContainingQuery parity SQL: the reference's little cursor only
    advances on start (monotone in big.start), so its resting position per
    big span is independent — the first little with start >= big.start in
    (s, e) order; emit big iff its end >= that little's end
    (SpanContainingQuery.java:92-130). freq = Σ 1/(1+(e-s)) over emitted
    big spans; idf over the distinct operand terms."""
    all_terms = sorted({t for sp in (big_spec, little_spec) for t in sp[1]})
    extra = (
        _span_set_ctes(big_spec, "b")
        + _span_set_ctes(little_spec, "l")
    )
    match = """  SELECT doc_id, sum(1.0 / (1 + (e - s))) AS freq FROM (
    SELECT b.doc_id, b.s, b.e FROM spb b
    WHERE (SELECT l.e FROM spl l WHERE l.doc_id = b.doc_id AND l.s >= b.s
           ORDER BY l.s, l.e LIMIT 1) <= b.e
  ) GROUP BY doc_id"""
    return _freq_rank_sql(match, all_terms, k, extra=extra)


def _span_within_sql(big_spec, little_spec, k: int = 10) -> str:
    """SpanWithinQuery parity SQL: the big cursor advances while
    big.end < little.end, and near-span ends are NOT monotone, so the
    cursor is stateful — a small recursive-CTE two-pointer machine
    transcribing SpanWithinQuery.java:93-131. Emits little spans with
    big.start <= little.start at the resting cursor; big exhaustion ends
    the doc."""
    all_terms = sorted({t for sp in (big_spec, little_spec) for t in sp[1]})
    extra = (
        _span_set_ctes(big_spec, "b")
        + _span_set_ctes(little_spec, "l")
        + """
, barr AS (
  SELECT doc_id, list_sort(list([s, e])) AS bp FROM spb GROUP BY doc_id
),
larr AS (
  SELECT doc_id, list_sort(list([s, e])) AS lp FROM spl GROUP BY doc_id
),
wini AS (
  SELECT b.doc_id, b.bp, l.lp FROM barr b JOIN larr l ON l.doc_id = b.doc_id
),
wmach(doc_id, bp, lp, bi, li, freq, ph) AS (
  SELECT doc_id, bp, lp, 1::BIGINT, 1::BIGINT, 0.0::DOUBLE, 'st' FROM wini
  UNION ALL
  SELECT doc_id, bp, lp,
    CASE WHEN adv THEN bi + 1 ELSE bi END,
    CASE WHEN adv THEN li ELSE li + 1 END,
    freq + (CASE WHEN NOT adv AND (bp[bi::INT])[1] <= ls
                 THEN 1.0 / (1 + (le - ls)) ELSE 0.0 END),
    CASE WHEN (adv AND bi + 1 > len(bp)) OR (NOT adv AND li + 1 > len(lp))
         THEN 'fin' ELSE 'st' END
  FROM (
    SELECT *, (bp[bi::INT])[2] < le AS adv FROM (
      SELECT m.*, (lp[li::INT])[1] AS ls, (lp[li::INT])[2] AS le
      FROM wmach m WHERE m.ph <> 'fin'
    ) wa
  ) wb
)
"""
    )
    match = (
        "  SELECT doc_id, freq FROM wmach WHERE ph = 'fin' AND freq > 0"
    )
    sql = _freq_rank_sql(match, all_terms, k, extra=extra)
    return sql.replace("WITH ", "WITH RECURSIVE ", 1)


def _intervals_dup_windows_sql(term: str, count: int, max_gaps: int, k: int = 10) -> str:
    """Unordered IntervalQuery with one term repeated `count` times: the
    reference deduplicates it into a single RepeatingIntervalsSource
    (UnorderedIntervalsSource.build unwraps a lone sub), whose stream is
    the sliding window of `count` consecutive occurrences; minExtent is the
    CHILD's 1, gaps = width - count. freq = Σ 1/max(length - 1 + 1, 1) =
    Σ 1/length over windows passing maxgaps."""
    gaps_pred = (
        f"AND (e - s + 1) - {count} <= {max_gaps}" if max_gaps >= 0 else ""
    )
    return (
        _PRELUDE
        + f"""
, occ AS (
  SELECT doc_id, pos AS s,
         lead(pos, {count - 1}) OVER (PARTITION BY doc_id ORDER BY pos) AS e
  FROM tokp WHERE term = '{term}'
),
pf AS (
  SELECT doc_id, sum(1.0 / (e - s + 1)) AS freq
  FROM occ WHERE e IS NOT NULL {gaps_pred} GROUP BY doc_id
),
ivsc AS (SELECT doc_id, 1.0 - 1.0 / (freq + 1.0) AS score FROM pf WHERE freq > 0)
"""
        + _rank_tail("score", "FROM ivsc", k)
    )


def _intervals_unordered_dups_machine_sql(
    terms: list[str], max_gaps: int, k: int = 10
) -> str:
    """Unordered IntervalQuery with duplicate terms among distinct ones: a
    recursive-CTE transcription of UnorderedIntervalIterator over the
    deduplicated sub streams (each repeated term becomes a
    RepeatingIntervalsSource sliding window of `count` consecutive
    occurrences). Queue order (start asc, end desc); per emission: skip
    past the previous start, minimize until the top's end reaches the
    running queueEnd, emit on reach / queueEnd growth / sub exhaustion.
    minExtent = sub count (each Repeating contributes its child's 1);
    gaps = width - Σ counts."""
    counts: dict[str, int] = {}
    for t in terms:
        counts[t] = counts.get(t, 0) + 1
    subs = list(counts.items())  # (term, count) in first-appearance order
    M = len(subs)
    minext = M
    total_w = sum(counts.values())
    J = list(range(1, M + 1))
    lits = ", ".join(f"'{t}'" for t, _ in subs)
    first_cols = ",\n    ".join(
        f"first(ps) FILTER (term = '{t}') AS u{j}" for j, (t, _) in enumerate(subs)
    )
    sl = []
    for j, (_t, c) in enumerate(subs, start=1):
        if c == 1:
            sl.append(f"u{j-1} AS ss{j}, u{j-1} AS se{j}")
        else:
            sl.append(
                f"u{j-1}[1:len(u{j-1})-{c-1}] AS ss{j}, "
                f"u{j-1}[{c}:len(u{j-1})] AS se{j}"
            )
    subsel = ",\n    ".join(sl)
    scols = ", ".join(f"ss{j}, se{j}" for j in J)
    icols = ", ".join(f"i{j}" for j in J)
    icols0 = ", ".join(f"0::BIGINT AS i{j}" for j in J)
    nonempty = " AND ".join(f"len(ss{j}) > 0" for j in J)
    qend0 = "greatest(" + ", ".join(f"(se{j})[1]" for j in J) + ")"
    cur = ", ".join(
        f"(ss{j})[(i{j}+1)::INT] AS s{j}, (se{j})[(i{j}+1)::INT] AS e{j}"
        for j in J
    )
    srt = (
        "list_sort(["
        + ", ".join(f"[s{j}, -e{j}, {j}::BIGINT]" for j in J)
        + "])"
    )
    exh_top = (
        "CASE topj "
        + " ".join(f"WHEN {j} THEN i{j} + 1 >= len(ss{j})" for j in J)
        + " END"
    )
    ne_top = (
        "CASE topj "
        + " ".join(f"WHEN {j} THEN (se{j})[(i{j}+2)::INT]" for j in J)
        + " END"
    )
    i_next = ", ".join(
        f"i{j} + (CASE WHEN adv AND topj = {j} THEN 1 ELSE 0 END) AS i{j}"
        for j in J
    )
    gaps_ok = (
        "TRUE" if max_gaps < 0 else f"(sve - svs + 1) - {total_w} <= {max_gaps}"
    )
    extra = f"""
, pl AS (
  SELECT doc_id, term, list_sort(list(pos)) AS ps
  FROM tokp WHERE term IN ({lits}) GROUP BY doc_id, term
),
cand AS (
  SELECT doc_id,
    {first_cols}
  FROM pl GROUP BY doc_id
  HAVING count(*) = {M}
),
ini AS (
  SELECT doc_id,
    {subsel}
  FROM cand
),
ini2 AS (SELECT * FROM ini WHERE {nonempty}),
machine(doc_id, {scols}, {icols}, qend, prev, freq, ph) AS (
  SELECT doc_id, {scols}, {icols0}, {qend0}, -1::BIGINT, 0.0::DOUBLE, 'skip'
  FROM ini2
  UNION ALL
  SELECT doc_id, {scols},
    {i_next},
    CASE WHEN adv AND NOT exh THEN greatest(qend, netop) ELSE qend END,
    CASE WHEN emit AND NOT exh THEN svs ELSE prev END,
    freq + (CASE WHEN emit THEN w ELSE 0.0 END),
    CASE WHEN exh THEN 'fin'
         WHEN ph = 'skip' THEN (CASE WHEN adv THEN 'skip' ELSE 'min' END)
         WHEN emit THEN 'skip'
         ELSE 'min' END
  FROM (
    SELECT *,
      ph = 'min'
        AND (tope = sve OR exh
             OR (adv AND NOT exh AND greatest(qend, netop) <> sve)) AS emit
    FROM (
      SELECT *,
        adv AND {exh_top} AS exh,
        CASE WHEN adv THEN {ne_top} END AS netop,
        CASE WHEN {gaps_ok}
             THEN 1.0 / greatest((sve - svs + 1) - {minext} + 1, 1)
             ELSE 0.0 END AS w
      FROM (
        SELECT *,
          CASE WHEN ph = 'skip' THEN tops = prev
               ELSE tope <> sve END AS adv
        FROM (
          SELECT *,
            ({srt}[1])[1] AS tops,
            -(({srt}[1])[2]) AS tope,
            ({srt}[1])[3] AS topj,
            ({srt}[1])[1] AS svs, qend AS sve
          FROM (
            SELECT m.*, {cur}
            FROM machine m WHERE m.ph <> 'fin'
          ) sa
        ) sb
      ) sc
    ) sd
  ) se
)
"""
    match_tail = f"""
, pf AS (
  SELECT doc_id, freq FROM machine WHERE ph = 'fin' AND freq > 0
),
ivsc AS (SELECT doc_id, 1.0 - 1.0 / (freq + 1.0) AS score FROM pf)
"""
    sql = _PRELUDE + extra + match_tail + _rank_tail("score", "FROM ivsc", k)
    return sql.replace("WITH ", "WITH RECURSIVE ", 1)


def _phrase_slop_rpts_sql(terms: list[str], slop: int, k: int = 10) -> str:
    """Sloppy PhraseQuery with REPEATED terms: singleton-slot case of the
    generalized multi-phrase machine below."""
    return _multi_phrase_slop_sql([[t] for t in terms], slop, k)


def _multi_phrase_slop_sql(slots: list[list[str]], slop: int, k: int = 10) -> str:
    """Sloppy (Multi)PhraseQuery machine: a small-step recursive-CTE
    transcription of SloppyPhraseMatcher's repeat-aware walk
    (search/SloppyPhraseMatcher.java:174-206 nextMatch,
    286-344 advanceRpts/collide/lesser, 435-467 advanceRepeatGroups).
    PP i's position list is the sorted union of slot i's present
    alternatives (MultiPhraseQuery.UnionPostingsEnum); collision is equal
    ACTUAL position (tpPos = adjusted + offset), which on singleton slots
    degenerates to the shared-list index equality of the plain-phrase
    machine.

    State row per doc: per-PP pointer i_j into its offset-adjusted union
    list l_j, the PP in hand, the collision-chase pointer, current `end`,
    matchLength, the (deliberately stale, like the reference's cached
    `next`) queue-top position, accumulated freq, and a phase: 'adv'
    (advance hand), 'res' (resolve repeater collisions by advancing the
    (position, offset)-lesser = higher-offset group member), 'chk'
    (minimize or emit + re-pop), 'fin'. The PQ is a sorted set keyed by
    (adjusted position, offset) — offsets are distinct, so list_sort of
    [pos, pp] pairs gives pops. Init: single-term groups advance the j-th
    member (offset order) j times; with multi-term repeats
    (hasMultiTermRpts) the advanceRepeatGroups collide-chase reduces, for
    the 2-member groups this oracle supports, to one conditional advance
    of the higher-offset member iff the first actual positions collide.
    Cross-checked against matchers.sloppy_phrase_freqs_rpts /
    sloppy_multi_phrase_freqs on randomized corpora in
    tests/test_matchers.py."""
    n = len(slots)
    slot_sets = [list(dict.fromkeys(s)) for s in slots]
    uniq = list(dict.fromkeys(t for s in slot_sets for t in s))
    tord = {t: j for j, t in enumerate(uniq)}
    # repeat structure — mirrors matchers.sloppy_multi_phrase_freqs
    tcnt: dict[str, int] = {}
    for s in slot_sets:
        for t in s:
            tcnt[t] = tcnt.get(t, 0) + 1
    rpt = {t for t, c in tcnt.items() if c >= 2}
    rpt_pps = [i for i in range(n) if any(t in rpt for t in slot_sets[i])]
    multi = any(len(slot_sets[i]) > 1 for i in rpt_pps)
    parent = {t: t for t in rpt}

    def find(t):
        while parent[t] != t:
            parent[t] = parent[parent[t]]
            t = parent[t]
        return t

    for i in rpt_pps:
        ts = [t for t in slot_sets[i] if t in rpt]
        for t in ts[1:]:
            parent[find(t)] = find(ts[0])
    by_root: dict[str, list[int]] = {}
    for i in rpt_pps:
        r = find(next(t for t in slot_sets[i] if t in rpt))
        by_root.setdefault(r, []).append(i)
    groups = [sorted(g) for g in by_root.values() if len(g) > 1]
    if multi:
        # the collide-chase init is closed-form only for pairs; the
        # engine kernel has no such limit
        assert all(len(g) == 2 for g in groups), (
            "multi-term-repeat oracle machine supports 2-member groups only"
        )
    rank = [0] * n
    group_of: list = [None] * n
    for g in groups:
        for j, i in enumerate(g):
            rank[i] = j
            group_of[i] = g
    J = list(range(1, n + 1))

    lits = ", ".join(f"'{t}'" for t in uniq)
    first_cols = ",\n    ".join(
        f"first(ps) FILTER (term = '{t}') AS u{j}" for j, t in enumerate(uniq)
    )

    def union_expr(i: int) -> str:
        parts = " || ".join(f"coalesce(u{tord[t]}, [])" for t in slot_sets[i])
        return f"list_sort(list_transform({parts}, p -> p - {i})) AS l{i+1}"

    llists = ",\n    ".join(union_expr(i) for i in range(n))
    init_exprs = []
    for i in range(n):
        if group_of[i] is None or rank[i] == 0:
            init_exprs.append(f"0::BIGINT AS i{i+1}")
        elif not multi:
            init_exprs.append(f"{rank[i]}::BIGINT AS i{i+1}")
        else:
            a = group_of[i][0]
            init_exprs.append(
                f"(CASE WHEN len(l{a+1}) > 0 AND len(l{i+1}) > 0 AND "
                f"(l{a+1})[1] + {a} = (l{i+1})[1] + {i} "
                f"THEN 1 ELSE 0 END)::BIGINT AS i{i+1}"
            )
    icols0 = ", ".join(init_exprs)
    lcols = ", ".join(f"l{j}" for j in J)
    icols = ", ".join(f"i{j}" for j in J)

    def case_by(var: str, exprs: dict) -> str:
        arms = " ".join(f"WHEN {j} THEN {e}" for j, e in exprs.items())
        return f"CASE {var} {arms} END"

    srt_list = ", ".join(f"[p{j}, {j}::BIGINT]" for j in J)
    kcol_arms = {}
    for i in range(n):
        g = group_of[i]
        if g is None:
            continue
        # collide: equal tpPos — actual position = adjusted + offset
        inner = " ".join(
            f"WHEN p{m+1} + {m} = p{i+1} + {i} THEN {m+1}::BIGINT"
            for m in g
            if m != i
        )
        kcol_arms[i + 1] = f"(CASE {inner} END)"
    kcol = case_by("chase", kcol_arms) if kcol_arms else "NULL::BIGINT"
    init_exh = " OR ".join(f"i{j} >= len(l{j})" for j in J)
    init_ps = ", ".join(f"(l{j})[(i{j}+1)::INT] AS p{j}" for j in J)
    end0 = "greatest(" + ", ".join(f"p{j}" for j in J) + ")"
    i_next = ", ".join(
        f"i{j} + (CASE WHEN (ph = 'adv' AND hand = {j}) OR "
        f"(ph = 'res' AND kcol IS NOT NULL AND lsr = {j}) "
        f"THEN 1 ELSE 0 END) AS i{j}"
        for j in J
    )
    exh_hand = case_by("hand", {j: f"i{j} + 1 >= len(l{j})" for j in J})
    exh_lsr = case_by("lsr", {j: f"i{j} + 1 >= len(l{j})" for j in J})
    q_hand = case_by("hand", {j: f"(l{j})[(i{j}+2)::INT]" for j in J})
    q_lsr = case_by("lsr", {j: f"(l{j})[(i{j}+2)::INT]" for j in J})
    p_hand = case_by("hand", {j: f"p{j}" for j in J})
    p_cur = ", ".join(f"(l{j})[(i{j}+1)::INT] AS p{j}" for j in J)

    extra = f"""
, pl AS (
  SELECT doc_id, term, list_sort(list(pos)) AS ps
  FROM tokp WHERE term IN ({lits}) GROUP BY doc_id, term
),
cand AS (
  SELECT doc_id,
    {first_cols}
  FROM pl GROUP BY doc_id
),
ini AS (
  SELECT doc_id,
    {llists}
  FROM cand
),
st0 AS (SELECT doc_id, {lcols}, {icols0} FROM ini),
stA AS (SELECT *, {init_ps} FROM st0 WHERE NOT ({init_exh})),
stB AS (SELECT *, list_sort([{srt_list}]) AS srt, {end0} AS end0 FROM stA),
machine(doc_id, {lcols}, {icols}, hand, chase, end_, ml, nxt, freq, ph) AS (
  SELECT doc_id, {lcols}, {icols},
         (srt[1])[2], 0::BIGINT, end0,
         end0 - (srt[1])[1], (srt[2])[1], 0.0::DOUBLE, 'adv'
  FROM stB
  UNION ALL
  SELECT doc_id, {lcols},
    {i_next},
    CASE WHEN pop THEN (srt[1])[2] ELSE hand END,
    CASE WHEN ph = 'adv' THEN hand
         WHEN ph = 'res' AND kcol IS NOT NULL THEN lsr
         ELSE chase END,
    CASE WHEN exh THEN end_
         WHEN ph = 'adv' THEN greatest(end_, qhand)
         WHEN ph = 'res' AND kcol IS NOT NULL THEN greatest(end_, qlsr)
         ELSE end_ END,
    CASE WHEN pop THEN end_ - (srt[1])[1]
         WHEN ph = 'chk' THEN least(ml, end_ - phand)
         ELSE ml END,
    CASE WHEN pop THEN (srt[2])[1] ELSE nxt END,
    freq + (CASE WHEN (exh OR pop) AND ml <= {slop} THEN 1.0 / (1 + ml) ELSE 0.0 END),
    CASE WHEN exh THEN 'fin'
         WHEN ph = 'adv' THEN 'res'
         WHEN ph = 'res' THEN (CASE WHEN kcol IS NULL THEN 'chk' ELSE 'res' END)
         ELSE 'adv' END
  FROM (
    SELECT *,
      (ph = 'adv' AND {exh_hand})
        OR (ph = 'res' AND kcol IS NOT NULL AND {exh_lsr}) AS exh,
      ph = 'chk' AND phand > nxt AS pop,
      {q_hand} AS qhand,
      {q_lsr} AS qlsr
    FROM (
      SELECT *,
        greatest(chase, kcol) AS lsr,
        {p_hand} AS phand,
        list_sort([{srt_list}]) AS srt
      FROM (
        SELECT m.*, {p_cur}
        FROM machine m WHERE m.ph <> 'fin'
      ) sa
      CROSS JOIN LATERAL (SELECT {kcol} AS kcol) sk
    ) sb
  ) sc
)"""
    match = "  SELECT doc_id, freq FROM machine WHERE ph = 'fin' AND freq > 0"
    sql = _freq_rank_sql(match, [t for s in slot_sets for t in s], k, extra=extra)
    return sql.replace("WITH ", "WITH RECURSIVE ", 1)


def _synonym_sql(terms: list[str], k: int = 10) -> str:
    lits = ", ".join(f"'{t}'" for t in terms)
    idf = f"ln(1 + (s.n - (SELECT max(df) FROM dfreq WHERE term IN ({lits})) + 0.5) / ((SELECT max(df) FROM dfreq WHERE term IN ({lits})) + 0.5))"
    inv = _INV.format(k1=K1, b=B)
    return (
        _PRELUDE
        + f"""
, syn AS (
  SELECT doc_id, sum(freq)::BIGINT AS freq FROM tf WHERE term IN ({lits}) GROUP BY doc_id
),
ssc AS (
  SELECT syn.doc_id, ({idf}) - ({idf}) / (1 + syn.freq * {inv}) AS score
  FROM syn JOIN dlq q ON q.doc_id = syn.doc_id CROSS JOIN stats s
)
"""
        + _rank_tail("score", "FROM ssc", k)
    )


def _graph_syn_bool_sql(k: int = 10) -> str:
    """Oracle for q_synonym_graph_bool: outer SHOULD sums the graph-segment
    clause (itself a SHOULD over MUST[fast,table] and quick) with merge;
    pure-SHOULD boolean requires >= 1 matching clause at every level."""
    sql = _PRELUDE + _scored_cte(["fast", "table", "quick", "merge"])
    sql += """
, conj AS (
  SELECT doc_id, sum(score) AS score FROM sc WHERE term IN ('fast', 'table')
  GROUP BY doc_id HAVING count(DISTINCT term) = 2
),
qk AS (SELECT doc_id, score FROM sc WHERE term = 'quick'),
gseg AS (
  SELECT coalesce(c.doc_id, k.doc_id) AS doc_id,
         coalesce(c.score, 0) + coalesce(k.score, 0) AS score
  FROM conj c FULL OUTER JOIN qk k ON k.doc_id = c.doc_id
),
mg AS (SELECT doc_id, score FROM sc WHERE term = 'merge'),
outq AS (
  SELECT coalesce(g.doc_id, m.doc_id) AS doc_id,
         coalesce(g.score, 0) + coalesce(m.score, 0) AS score
  FROM gseg g FULL OUTER JOIN mg m ON m.doc_id = g.doc_id
)
"""
    return sql + _rank_tail("score", "FROM outq", k)


def _graph_syn_phrase_sql(k: int = 10) -> str:
    """Oracle for q_synonym_graph_phrase: SHOULD[phrase(fast table),
    term(quick)] — exact-phrase BM25 (idf sum, consecutive positions)
    summed with the term clause where either matches."""
    inv = _INV.format(k1=K1, b=B)
    idf = (
        "ln(1 + (s.n - (SELECT df FROM dfreq WHERE term = '{t}') + 0.5)"
        " / ((SELECT df FROM dfreq WHERE term = '{t}') + 0.5))"
    )
    idf_sum = idf.format(t="fast") + " + " + idf.format(t="table")
    sql = _PRELUDE + _scored_cte(["quick"])
    sql += f"""
, pf AS (
  SELECT p0.doc_id, count(*)::BIGINT AS freq
  FROM tokp p0 JOIN tokp p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
  WHERE p0.term = 'fast' AND p1.term = 'table'
  GROUP BY p0.doc_id
),
psc AS (
  SELECT pf.doc_id,
         (({idf_sum})) - (({idf_sum})) / (1 + pf.freq * {inv}) AS score
  FROM pf JOIN dlq q ON q.doc_id = pf.doc_id CROSS JOIN stats s
),
outq AS (
  SELECT coalesce(p.doc_id, qk.doc_id) AS doc_id,
         coalesce(p.score, 0) + coalesce(qk.score, 0) AS score
  FROM psc p FULL OUTER JOIN sc qk ON qk.doc_id = p.doc_id
)
"""
    return sql + _rank_tail("score", "FROM outq", k)


def _dismax_sql(terms: list[str], tie: float, k: int = 10) -> str:
    return (
        _PRELUDE
        + _scored_cte(terms)
        + f"""
, dm AS (
  SELECT doc_id, max(score) + {tie} * (sum(score) - max(score)) AS score
  FROM sc GROUP BY doc_id
)
"""
        + _rank_tail("score", "FROM dm", k)
    )
