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
    for tq in term_qs:
        st = stats.get(tq.term)
        if st is None:
            continue
        scorers[tq.term] = searcher.scorer_for(tq.boost, st)

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
        # materialize the tiny top-k before unpersisting the bounds table
        rows = matches.orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
        return searcher.spark.createDataFrame(
            [(int(r["doc_id"]), float(r["score"])) for r in rows],
            "doc_id long, score double",
        )
    finally:
        meta.unpersist()


def _block_bounds(searcher, scorers: Dict[str, BM25Scorer]) -> DataFrame:
    """Postings block metadata + ub column (one vectorized pass over impacts)."""
    scorer_map = scorers

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ubs = np.empty(len(pdf), dtype=np.float64)
            for i, (term, impf, impn) in enumerate(
                zip(pdf["term"], pdf["imp_freqs"], pdf["imp_norms"])
            ):
                ubs[i] = scorer_map[term].max_score(
                    np.asarray(impf, dtype=np.int64), np.asarray(impn, dtype=np.int64)
                )
            out = pdf[["term", "segment_id", "block_id"]].copy()
            out["ub"] = ubs
            yield out

    return (
        searcher.index.postings.filter(F.col("term").isin(list(scorers)))
        .select("term", "segment_id", "block_id", "imp_freqs", "imp_norms")
        .mapInPandas(run, schema="term string, segment_id int, block_id int, ub double")
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
