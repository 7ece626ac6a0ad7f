"""Autocomplete suggester — the suggest/Lookup.java contract
(Lookup.lookup(key, num) -> ranked (key, weight) completions): a prefix scan
of the index terms table with weight = docFreq, ranked weight desc then key
asc. The terms Parquet is written term-sorted, so the prefix predicate
prunes row groups at scan time — the role of the suggester FST's prefix
seek (suggest/.../suggest/fst/FSTCompletionLookup.java), re-expressed as
predicate pushdown."""

from __future__ import annotations

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
