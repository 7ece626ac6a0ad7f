"""DocValuesStatsCollector (misc/search/DocValuesStats.java:31-160,
DocValuesStatsCollector.java): single-pass numeric doc-values statistics
over a match set — count (docs with a value), missing, min, max, sum,
mean, population variance (the reference's Welford ``variance/count``)
and stdev. One relational aggregation; var_pop IS the Welford result."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def doc_values_stats(
    matches: DataFrame, docs: DataFrame, field: str
) -> DataFrame:
    """→ single row (cnt, missing, mn, mx, total, mean, variance, stdev).
    ``missing`` counts matching docs whose field is NULL (advanceExact
    false, DocValuesStats.java:63-74); min/max/mean/variance are over the
    docs with a value."""
    if field not in docs.columns:
        raise ValueError(f"{field!r} not stored on the docs table")
    col = F.col(field)
    joined = matches.select("doc_id").join(
        docs.select("doc_id", field), "doc_id"
    )
    return joined.agg(
        F.count(F.when(col.isNotNull(), 1)).cast("long").alias("cnt"),
        F.count(F.when(col.isNull(), 1)).cast("long").alias("missing"),
        F.min(col).alias("mn"),
        F.max(col).alias("mx"),
        F.sum(col).alias("total"),
        F.avg(col.cast("double")).alias("mean"),
        F.coalesce(
            F.var_pop(col.cast("double")), F.lit(0.0)
        ).alias("variance"),
        F.sqrt(
            F.coalesce(F.var_pop(col.cast("double")), F.lit(0.0))
        ).alias("stdev"),
    )
