"""JoinUtil: query-time term join across indexes
(join/JoinUtil.java:90-139, TermsWithScoreCollector.java:100-176,
TermsIncludingScoreQuery.java).

``term_join(from_searcher, from_field, from_query, to_searcher,
to_field, score_mode)`` re-expresses Lucene's two-phase join as the
DataFrame join it fundamentally is:

1. FROM phase (the TermsWithScoreCollector role): run ``from_query`` on
   the from index, join each match to its ``from_field`` doc value
   (missing values collect as the EMPTY string, the BytesRef.EMPTY_BYTES
   analog, TermsWithScoreCollector.java:109-113), and aggregate scores
   per VALUE across from-docs in doc_id order — Total sums, Min/Max
   fold, Avg sums + divides by occurrences, all in the searcher's score
   dtype (the reference folds in float; the float64 oracle mode folds in
   double).
2. TO phase (the TermsIncludingScoreQuery role): every to-doc whose
   ``to_field`` value is in the collected set matches, scored with the
   value's aggregated score (ScoreMode.None scores ``boost``, the
   constant-score TermsQuery path).

Multi-valued FROM fields (array columns) explode — the
``multipleValuesPerDocument`` flag is inferred from the column type.
Multi-valued TO fields raise (the reference's last-term-wins overwrite
in fillDocsAndScores is a quirk we refuse to replicate silently).

Scale shape: one shuffle to aggregate per-value scores (bounded by the
distinct-value count), then one equi-join on the value — both AQE-
planned; nothing collects to the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType

MODES = ("none", "avg", "max", "total", "min")


def _from_values(from_searcher, from_field: str) -> DataFrame:
    docs = from_searcher.index.docs
    if from_field not in docs.columns:
        raise ValueError(f"from_field {from_field!r} not stored on the index")
    col = F.col(from_field)
    if isinstance(docs.schema[from_field].dataType, ArrayType):
        # multipleValuesPerDocument = true: explode; docs with an empty
        # or missing array contribute the empty value once (MV collector
        # still collects EMPTY_BYTES when advanceExact fails)
        return docs.select(
            "doc_id",
            F.explode(
                F.when(
                    col.isNull() | (F.size(col) == 0),
                    F.array(F.lit("")),
                ).otherwise(col)
            ).alias("__jv"),
        ).withColumn("__jv", F.coalesce(F.col("__jv").cast("string"), F.lit("")))
    return docs.select(
        "doc_id", F.coalesce(col.cast("string"), F.lit("")).alias("__jv")
    )


def term_join(
    from_searcher,
    from_field: str,
    from_query,
    to_searcher,
    to_field: str,
    score_mode: str = "none",
    boost: float = 1.0,
) -> DataFrame:
    """(doc_id, score) on the TO index: docs whose ``to_field`` joins a
    value collected from the from-side matches, scored per
    ``score_mode``."""
    mode = score_mode.lower()
    if mode not in MODES:
        raise ValueError(f"unknown ScoreMode {score_mode!r}")
    to_docs = to_searcher.index.docs
    if to_field not in to_docs.columns:
        raise ValueError(f"to_field {to_field!r} not stored on the index")
    if isinstance(to_docs.schema[to_field].dataType, ArrayType):
        raise NotImplementedError(
            "multi-valued TO fields: the reference's last-term-wins "
            "overwrite (TermsIncludingScoreQuery.fillDocsAndScores) is "
            "not replicated"
        )
    matches = from_searcher.matches(from_query)
    fv = _from_values(from_searcher, from_field)
    joined = matches.join(fv, "doc_id").select("doc_id", "score", "__jv")
    if mode == "none":
        vals = joined.select("__jv").distinct().withColumn(
            "__jscore", F.lit(float(np.float32(boost)))
        )
    else:
        dt = from_searcher.dtype

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("doc_id")
            sc = pdf["score"].to_numpy(np.float64)
            if mode in ("total", "avg"):
                s = dt(0.0)
                for v in sc:  # sequential adds in the score dtype
                    s = dt(s + dt(v))
                if mode == "avg":
                    s = dt(s / dt(len(sc)))
            elif mode == "min":
                s = dt(sc.min())
            else:
                s = dt(sc.max())
            return pd.DataFrame(
                {"__jv": [pdf["__jv"].iloc[0]], "__jscore": [float(s)]}
            )

        vals = joined.groupBy("__jv").applyInPandas(
            fold, "__jv string, __jscore double"
        )
    out = (
        to_docs.select(
            "doc_id",
            F.coalesce(F.col(to_field).cast("string"), F.lit("")).alias("__tv"),
        )
        .join(vals, F.col("__tv") == F.col("__jv"))
        .select("doc_id", F.col("__jscore").alias("score"))
    )
    return to_searcher._apply_deletes(out)
