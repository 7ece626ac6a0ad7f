"""Block-max (WAND-style) score pruning — the set-at-a-time re-expression of
the reference's impact machinery (SURVEY.md §4.3):

- per-block upper bound ub(t, block) = max score over the block's competitive
  impacts — MaxScoreCache.computeMaxScore (search/MaxScoreCache.java:58-64)
- θ = a valid lower bound on the k-th best score, from exactly scoring the
  most promising block per term — plays setMinCompetitiveScore
  (search/TopScoreDocCollector.java:320-339)
- prune rule: keep block b of term t iff
      ub(t, b) + Σ_{t' ≠ t} global_max(t') ≥ θ
  (the WAND condition, search/WANDScorer.java:30-53); every block containing
  a doc whose exact score ≥ θ necessarily survives for every contributing
  term, so all true top-k docs are scored exactly; pruned-away docs can only
  be under-scored and their exact score is < θ ≤ k-th — soundness does not
  depend on θ quality, only speed does.

Applies to: single terms, flat OR-of-terms (WANDScorer case), flat
AND-of-terms (BlockMaxConjunctionScorer case, Boolean2ScorerSupplier.java:202-207).
Equivalence with the unpruned path is asserted by tests on every query shape
(SearchEquivalenceTestBase style).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from . import codec
from .bm25 import BM25Scorer
from .query import BooleanQuery, Occur, Query, TermQuery


def _flat_term_clauses(q: Query) -> Optional[Tuple[str, List[TermQuery], int]]:
    """Recognize shapes the pruned executor handles:
    ('or', terms, msm) | ('and', terms, 0) | single term."""
    if isinstance(q, TermQuery):
        return ("or", [q], 1)
    if isinstance(q, BooleanQuery):
        occurs = {c.occur for c in q.clauses}
        if q.boost != 1.0:
            return None
        if not all(isinstance(c.query, TermQuery) for c in q.clauses):
            return None
        if occurs == {Occur.SHOULD} and q.minimum_should_match <= 1:
            return ("or", [c.query for c in q.clauses], 1)
        if occurs == {Occur.MUST} and q.minimum_should_match == 0:
            return ("and", [c.query for c in q.clauses], 0)
    return None


_MIN_PRUNABLE = 100_000


def min_prunable_postings() -> int:
    import os

    return int(os.environ.get("LUCENE_SPARK_MIN_PRUNABLE", _MIN_PRUNABLE))


def try_pruned_topk(searcher, q: Query, k: int) -> Optional[DataFrame]:
    shape = _flat_term_clauses(q)
    if shape is None:
        return None
    mode, term_qs, _ = shape
    terms = [tq.term for tq in term_qs]
    if len(set(terms)) != len(terms):
        return None
    stats = searcher.term_stats(terms)
    present = {t: s for t, s in stats.items() if t in stats}
    if mode == "and" and len(present) < len(terms):
        return searcher._empty()
    if not present:
        return searcher._empty()
    # pruning pays only when there is enough postings volume to skip; below
    # ~64 blocks per term the extra theta/bounds jobs cost more than decoding
    # everything (ImpactsDISI has the same "too small to bother" shape)
    total_df = sum(s.doc_freq for s in present.values())
    if total_df < min_prunable_postings():
        return None

    scorers: Dict[str, BM25Scorer] = {}
    boosts: Dict[str, float] = {}
    for tq in term_qs:
        st = stats.get(tq.term)
        if st is None:
            continue
        scorers[tq.term] = searcher.scorer_for(tq.boost, st)
        boosts[tq.term] = float(tq.boost)

    driver = _topk_driver_wand(searcher, scorers, boosts, k, mode, terms)
    if driver is not None:
        return driver

    meta = _block_bounds(searcher, scorers)  # + ub column
    meta.persist()
    try:
        gmax = {
            r["term"]: r["mx"]
            for r in meta.groupBy("term").agg(F.max("ub").alias("mx")).collect()
        }
        sum_gmax = sum(gmax.values())
        theta = _estimate_theta(searcher, meta, scorers, k, mode, terms)

        # WAND condition per block
        rest = {t: sum_gmax - gmax[t] for t in gmax}
        rest_df = searcher.spark.createDataFrame(
            [(t, float(v)) for t, v in rest.items()], "term string, rest double"
        )
        surviving = meta.join(F.broadcast(rest_df), "term").filter(
            F.col("ub") + F.col("rest") >= F.lit(float(theta))
        )
        scored = _decode_blocks_scored(searcher, surviving, scorers)
        if mode == "or":
            matches = scored.groupBy("doc_id").agg(F.sum("score").alias("score"))
        else:
            matches = (
                scored.groupBy("doc_id")
                .agg(F.sum("score").alias("score"), F.count("*").alias("nt"))
                .filter(F.col("nt") == len(terms))
                .select("doc_id", "score")
            )
        matches = searcher._apply_deletes(matches)
        # materialize the tiny top-k before unpersisting the bounds table
        rows = matches.orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
        return searcher.spark.createDataFrame(
            [(int(r["doc_id"]), float(r["score"])) for r in rows],
            "doc_id long, score double",
        )
    finally:
        meta.unpersist()


_DRIVER_META_MAX = 2_000_000  # block rows; above this keep the bounds distributed
_BOUNDS_CACHE_MAX = 512       # cached (term, boost) bound tables per searcher


def _driver_meta_max() -> int:
    import os

    return int(os.environ.get("LUCENE_SPARK_DRIVER_META_MAX", _DRIVER_META_MAX))


def _topk_driver_wand(
    searcher, scorers: Dict[str, BM25Scorer], boosts: Dict[str, float],
    k: int, mode: str, terms: List[str],
) -> Optional[DataFrame]:
    """Driver-resident WAND: the per-block upper bounds for the queried terms
    are small (one row per 128-posting block), so — exactly like Lucene keeps
    skip/impact data memory-resident — we pull them to the driver once
    (cached per term), run the WAND block selection locally, and spend Spark
    jobs only on decoding the surviving blocks. 2 jobs/query (probe + final)
    instead of ~5. Returns None if the bounds are too large to collect —
    the distributed path in try_pruned_topk then handles it."""
    cap = _driver_meta_max()
    if cap <= 0:
        return None
    cache = searcher._bounds_cache
    missing = [t for t in scorers if (t, boosts[t]) not in cache]
    bulk = getattr(searcher, "_bounds_bulk", None)
    if bulk is not None and missing:
        # serve boost-1.0 lookups from the preloaded term-sorted bulk frame
        terms_arr, frame = bulk
        still = []
        for t in missing:
            if boosts[t] != 1.0:
                still.append(t)
                continue
            lo = np.searchsorted(terms_arr, t, side="left")
            hi = np.searchsorted(terms_arr, t, side="right")
            if len(cache) >= _BOUNDS_CACHE_MAX:
                cache.pop(next(iter(cache)))
            cache[(t, 1.0)] = frame.iloc[lo:hi].reset_index(drop=True)
        missing = still
    if missing:
        fetched = _block_bounds(searcher, {t: scorers[t] for t in missing}).toPandas()
        if len(fetched) > cap:
            return None
        for t, grp in fetched.groupby("term"):
            if len(cache) >= _BOUNDS_CACHE_MAX:
                cache.pop(next(iter(cache)))
            cache[(t, boosts[t])] = grp.reset_index(drop=True)
        for t in missing:  # terms with no blocks (shouldn't happen, but pin)
            cache.setdefault((t, boosts[t]), fetched.iloc[0:0])
    meta = pd.concat(
        [cache[(t, boosts[t])] for t in scorers], ignore_index=True
    )
    if len(meta) == 0:
        return searcher._empty()
    if len(meta) > cap:
        return None

    gmax = meta.groupby("term")["ub"].max().to_dict()
    sum_gmax = sum(gmax.values())

    if mode == "and" and len(scorers) > 1:
        # BlockMaxConjunctionScorer analog: a block of t can only contribute
        # if its doc range overlaps a block of EVERY other term. Block doc
        # ranges are (base_doc, last_doc], disjoint and sorted within a term.
        metas = {t: g for t, g in meta.groupby("term")}
        keep_parts = []
        for t, g in metas.items():
            lo = g["base_doc"].to_numpy() + 1
            hi = g["last_doc"].to_numpy()
            keep = np.ones(len(g), dtype=bool)
            for t2, g2 in metas.items():
                if t2 == t:
                    continue
                order2 = np.argsort(g2["last_doc"].to_numpy())
                hi2 = g2["last_doc"].to_numpy()[order2]
                lo2 = (g2["base_doc"].to_numpy() + 1)[order2]
                idx = np.searchsorted(hi2, lo, side="left")
                ok = idx < len(hi2)
                ok[ok] = lo2[idx[ok]] <= hi[ok]
                keep &= ok
            keep_parts.append(g[keep])
        meta = pd.concat(keep_parts, ignore_index=True)
        if len(meta) == 0:
            return searcher._empty()

    # theta: a repeated identical query reuses its previous exact k-th score
    # (scores are immutable given the index — still a valid lower bound),
    # skipping the probe job entirely.
    tkey = (mode, k, tuple(sorted(boosts.items())))
    theta = searcher._theta_cache.get(tkey)
    if theta is None:
        # probe: exactly score the single highest-ub block per term
        probe_idx = (
            meta.sort_values(["ub", "segment_id", "block_id"],
                             ascending=[False, True, True])
            .groupby("term", sort=False)
            .head(1)
        )
        probe_rows = _agg_block_keys(searcher, probe_idx, scorers, mode, terms, k)
        theta = float(probe_rows[-1]["score"]) if len(probe_rows) >= k else 0.0

    rest = {t: sum_gmax - gmax[t] for t in gmax}
    surviving = meta[
        meta["ub"].to_numpy() + np.array([rest[t] for t in meta["term"]]) >= theta
    ]
    rows = _agg_block_keys(searcher, surviving, scorers, mode, terms, k)
    if len(rows) >= k:
        if len(searcher._theta_cache) >= _BOUNDS_CACHE_MAX:
            searcher._theta_cache.pop(next(iter(searcher._theta_cache)))
        searcher._theta_cache[tkey] = float(rows[-1]["score"])
    return searcher.spark.createDataFrame(
        [(int(r["doc_id"]), float(r["score"])) for r in rows],
        "doc_id long, score double",
    )


def _agg_block_keys(
    searcher, keys: pd.DataFrame, scorers: Dict[str, BM25Scorer],
    mode: str, terms: List[str], k: int,
) -> list:
    """Decode + score the blocks named by a (term, segment_id, block_id)
    pandas key set, aggregate per doc IN SPARK, and collect only the top-k
    (ties by ascending doc_id, TopScoreDocCollector.java:27-29). One job."""
    keys_df = searcher.spark.createDataFrame(
        keys[["term", "segment_id", "block_id"]]
    )
    scored = _decode_blocks_scored(searcher, keys_df, scorers)
    agg = scored.groupBy("doc_id").agg(
        F.sum("score").alias("score"), F.count("*").alias("nt")
    )
    if mode == "and":
        agg = agg.filter(F.col("nt") == len(terms))
    agg = searcher._apply_deletes(agg)  # deleted docs never match (or set θ)
    return (
        agg.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .collect()
    )


def _block_bounds(
    searcher, scorers: Dict[str, BM25Scorer], filter_terms: bool = True
) -> DataFrame:
    """Postings block metadata + ub column (one vectorized pass over impacts)."""
    scorer_map = scorers

    # every BM25Scorer of one similarity shares the SAME inverse-norm cache;
    # only the scalar weight differs per term. When that holds (the default
    # BM25 case), a whole batch of bounds is one vectorized expression.
    from .bm25 import BM25Scorer

    shared_cache = None
    weights = None
    scs = list(scorer_map.values())
    if scs and all(isinstance(s, BM25Scorer) for s in scs) and all(
        s.cache is scs[0].cache or np.array_equal(s.cache, scs[0].cache)
        for s in scs[1:]
    ):
        shared_cache = np.asarray(scs[0].cache, dtype=np.float64)
        weights = {t: float(s.weight) for t, s in scorer_map.items()}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ubs = np.empty(len(pdf), dtype=np.float64)
            impf_col = pdf["imp_freqs"]
            impn_col = pdf["imp_norms"]
            if shared_cache is not None:
                lens = np.fromiter((len(x) for x in impf_col), dtype=np.int64,
                                   count=len(pdf))
                flat_f = np.concatenate(list(impf_col)).astype(np.float64)
                flat_n = np.concatenate(list(impn_col)).astype(np.int64)
                w = pdf["term"].map(weights).to_numpy(dtype=np.float64)
                w_flat = np.repeat(w, lens)
                inv = shared_cache[flat_n & 0xFF]
                scores = w_flat - w_flat / (1.0 + flat_f * inv)
                starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
                # f64 formula vs the query path's f32 scores: inflate a hair
                # so the bound stays an upper bound across rounding modes
                ubs = np.maximum.reduceat(scores, starts) * (1.0 + 1e-6) + 1e-12
            else:
                for i, (term, impf, impn) in enumerate(
                    zip(pdf["term"], impf_col, impn_col)
                ):
                    ubs[i] = scorer_map[term].max_score(
                        np.asarray(impf, dtype=np.int64),
                        np.asarray(impn, dtype=np.int64),
                    )
            out = pdf[["term", "segment_id", "block_id", "base_doc", "last_doc"]].copy()
            out["ub"] = ubs
            yield out

    src = searcher.index.postings
    if filter_terms:
        src = src.filter(F.col("term").isin(list(scorers)))
    return (
        src
        .select("term", "segment_id", "block_id", "base_doc", "last_doc",
                "imp_freqs", "imp_norms")
        .mapInPandas(
            run,
            schema="term string, segment_id int, block_id int, "
                   "base_doc long, last_doc long, ub double",
        )
    )


def _estimate_theta(
    searcher, meta: DataFrame, scorers, k: int, mode: str, terms: List[str]
) -> float:
    """Exactly score only the best block per term; the k-th best per-doc
    partial sum is a valid lower bound of the true k-th score (partial ≤ full).
    For AND mode, only docs matching all terms within the probe are usable."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("term").orderBy(F.desc("ub"), "segment_id", "block_id")
    probe = meta.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    scored = _decode_blocks_scored(searcher, probe, scorers)
    agg = scored.groupBy("doc_id").agg(
        F.sum("score").alias("score"), F.count("*").alias("nt")
    )
    if mode == "and":
        agg = agg.filter(F.col("nt") == len(terms))
    agg = searcher._apply_deletes(agg)  # deleted doc partials must not raise θ
    rows = agg.orderBy(F.desc("score")).limit(k).collect()
    if len(rows) < k:
        return 0.0
    return float(rows[-1]["score"])


def _decode_blocks_scored(
    searcher, block_keys: DataFrame, scorers: Dict[str, BM25Scorer]
) -> DataFrame:
    """Join surviving block keys back to postings and decode+score them."""
    scorer_map = scorers
    blocks = searcher.index.postings.filter(F.col("term").isin(list(scorers))).join(
        F.broadcast(block_keys.select("term", "segment_id", "block_id")),
        ["term", "segment_id", "block_id"],
        "left_semi",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for row in pdf.itertuples(index=False):
                n = int(row.count)
                docs, freqs, norms = codec.decode_block_row(row)
                sc = scorer_map[row.term].score(freqs, norms).astype(np.float64)
                outs.append(pd.DataFrame({"term": np.repeat(row.term, n), "doc_id": docs, "score": sc}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return blocks.mapInPandas(run, schema="term string, doc_id long, score double")
