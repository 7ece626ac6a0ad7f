"""Autocomplete suggester — the suggest/Lookup.java contract
(Lookup.lookup(key, num) -> ranked (key, weight) completions): a prefix scan
of the index terms table with weight = docFreq, ranked weight desc then key
asc. The terms Parquet is written term-sorted, so the prefix predicate
prunes row groups at scan time — the role of the suggester FST's prefix
seek (suggest/.../suggest/fst/FSTCompletionLookup.java), re-expressed as
predicate pushdown."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def suggest_prefix(terms: DataFrame, prefix: str, k: int = 10) -> DataFrame:
    """Top-k completions of ``prefix`` from an Index.terms table."""
    return (
        terms.filter(F.col("term").startswith(prefix))
        .select(
            F.col("term").alias("key"),
            F.col("doc_freq").cast("long").alias("weight"),
        )
        .orderBy(F.desc("weight"), F.asc("key"))
        .limit(k)
    )


def suggest_infix(terms: DataFrame, query: str, k: int = 10) -> DataFrame:
    """AnalyzingInfixSuggester.lookup analog: suggestions CONTAINING the
    analyzed query as a substring (the reference matches any token
    position in the suggestion text, not just the start), weight-ranked.
    A substring predicate can't prune row groups like the prefix seek,
    which mirrors the reference's separate infix index structure — here
    it's a plain scan filter."""
    return (
        terms.filter(F.col("term").contains(query))
        .select(
            F.col("term").alias("key"),
            F.col("doc_freq").cast("long").alias("weight"),
        )
        .orderBy(F.desc("weight"), F.asc("key"))
        .limit(k)
    )


def suggest_fuzzy(
    terms: DataFrame,
    key: str,
    max_edits: int = 1,
    non_fuzzy_prefix: int = 1,
    min_fuzzy_length: int = 3,
    k: int = 10,
) -> DataFrame:
    """FuzzySuggester analog (suggest/analyzing/FuzzySuggester.java): a
    suggestion matches when SOME PREFIX of it lies within ``max_edits``
    OSA edits (transpositions, the reference default) of the key — the
    fuzzy automaton concatenated with the anything-suffix. Reference
    defaults kept: the first ``non_fuzzy_prefix`` chars are exact (pushed
    to the scan), keys shorter than ``min_fuzzy_length`` fall back to the
    exact prefix lookup. The prefix check is vectorized per Arrow batch
    (2*max_edits+1 banded OSA rows)."""
    if len(key) < min_fuzzy_length:
        return suggest_prefix(terms, key, k)
    cand = terms.filter(F.col("term").startswith(key[:non_fuzzy_prefix]))
    n, d = len(key), int(max_edits)

    @F.pandas_udf("boolean")
    def _match(col: pd.Series) -> pd.Series:
        import numpy as np

        from ..editdist import osa_distances

        vals = col.to_numpy(dtype=object)
        ok = np.zeros(len(vals), dtype=bool)
        for L in range(max(0, n - d), n + d + 1):
            prefixes = [t[:L] for t in vals]
            ok |= osa_distances(prefixes, key) <= d
        return pd.Series(ok)

    return (
        cand.filter(_match(F.col("term")))
        .select(
            F.col("term").alias("key"),
            F.col("doc_freq").cast("long").alias("weight"),
        )
        .orderBy(F.desc("weight"), F.asc("key"))
        .limit(k)
    )
