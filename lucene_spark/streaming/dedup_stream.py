"""Cross-batch streaming deduplication — the custom STATEFUL streaming
operator of the ingest pipeline (Structured Streaming
applyInPandasWithState): a document is emitted only if its content hash was
never seen in any earlier micro-batch (or earlier in the same batch).

Scale shape: state is sharded by a hash of the content digest into
``shards`` groups, so each GroupState holds ~distinct_hashes/shards md5
strings and state updates parallelize across shards; the state store is the
streaming checkpoint (survives restarts — the test reruns availableNow
against the same checkpoint and the second run still dedups against the
first run's hashes). At 100-TB scale the same operator runs with a RocksDB
state store provider and more shards; the per-row work is Arrow-batched
pandas, never row-at-a-time Python.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text_md5", StringType())]
)
_STATE_SCHEMA = StructType([StructField("seen", ArrayType(StringType()))])


def dedup_stream(
    stream_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shards: int = 64,
):
    """(doc_id, text_md5) of first-seen documents, across micro-batches."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    hashed = stream_df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.col(text_col)).alias("text_md5"),
    ).withColumn("shard", (F.abs(F.hash("text_md5")) % shards).cast("int"))

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            # deterministic within-batch winner: smallest doc_id per hash
            batch = pd.concat(chunks, ignore_index=True).sort_values(
                "doc_id", kind="mergesort"
            )
            fresh = batch[~batch["text_md5"].isin(seen)].drop_duplicates(
                "text_md5"
            )
            seen.update(fresh["text_md5"].tolist())
            state.update((sorted(seen),))
            yield fresh[["doc_id", "text_md5"]]
        else:
            state.update((sorted(seen),))

    return hashed.groupBy("shard").applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
