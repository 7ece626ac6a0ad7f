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
