"""Distributed inverted-index build.

Spark-first re-expression of the reference's indexing chain
(index/IndexingChain.java PerField.invert + FreqProxTermsWriter flush +
Lucene90PostingsWriter block encode — see SURVEY.md §3.1):

  corpus --mapInPandas (invert: per-doc tf + positions + norm)-->
         --ONE shuffle: groupBy(segment_id).applyInPandas (segment writer:
           sort terms, 128-posting blocks, delta/FOR/PFOR encode, impacts)-->
         postings blocks    (+ separate cheap aggs for terms stats / docs)

Scale design notes (100 TB / 1000 executors):
- doc_id assignment is the only global coordination: a two-pass
  range-partition + per-partition offset scheme (no single-partition window,
  no monotonically_increasing_id nondeterminism).
- the invert step does per-doc aggregation inside the Arrow batch (map-side
  combine), so the only full shuffle is the segment grouping; its key
  (segment_id) is uniform by construction — segments are fixed-size doc_id
  ranges, which is also the hot-term salting story: a term with docFreq 10^9
  lands in ~10^9/seg_size independently-encoded groups.
- term statistics use partial aggregation (groupBy(term).agg) — Catalyst
  map-side combines; no skew because values are tiny counters.
- postings are written sorted by term so Parquet row-group min/max prune
  term lookups at query time (the role of Lucene's term-dictionary seek).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import codec
from .analysis import flat_tokenize
from .bm25 import CollectionStats
from .config import IndexConfig
from .smallfloat import int_to_byte4

TF_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("segment_id", IntegerType()),
        StructField("term", StringType()),
        StructField("freq", IntegerType()),
        StructField("norm", IntegerType()),
        StructField("positions", ArrayType(IntegerType())),
    ]
)

POSTINGS_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("segment_id", IntegerType()),
        StructField("block_id", IntegerType()),
        StructField("base_doc", LongType()),
        StructField("count", IntegerType()),
        StructField("last_doc", LongType()),
        StructField("docs_enc", BinaryType()),
        StructField("freqs_enc", BinaryType()),
        StructField("norms_enc", BinaryType()),
        StructField("imp_freqs", ArrayType(IntegerType())),
        StructField("imp_norms", ArrayType(IntegerType())),
        StructField("pos_enc", BinaryType()),
    ]
)


def assign_doc_ids(
    df: DataFrame, order_cols: List[str], num_partitions: int = 32
) -> DataFrame:
    """Deterministic dense doc_id by global (order_cols) order, without a
    single-partition window (scales to arbitrary row counts).

    Equivalent to Lucene's ingest-order docID assignment
    (index/DocumentsWriterPerThread.java:239) when ingest order is the
    canonical sort order. order_cols must be a unique non-null key.

    Range boundaries are sampled ONCE and collected to the driver, so bucket
    assignment is a pure function of the row — unlike ``repartitionByRange``,
    whose boundary sampling is re-run (with a fresh seed) per job and can
    hand different rows to different partitions across the counts job and
    the row_number job, corrupting the offsets.
    """
    from pyspark.sql.window import Window

    key = F.concat_ws("\x01", *[F.col(c) for c in order_cols])
    n = df.count()
    buckets = max(1, min(num_partitions, n))
    if buckets > 1:
        fraction = min(1.0, (buckets * 200.0) / max(n, 1))
        sampled = sorted(
            r["_k"]
            for r in df.select(key.alias("_k")).sample(fraction, seed=42).collect()
        )
        cuts = sorted(
            {
                sampled[(i * len(sampled)) // buckets]
                for i in range(1, buckets)
            }
        ) if sampled else []
    else:
        cuts = []
    if cuts:
        bounds = F.array(*[F.lit(c) for c in cuts])
        bucket = F.size(F.filter(bounds, lambda b: key >= b))
    else:
        bucket = F.lit(0)
    with_bucket = df.withColumn("_bk", bucket)
    counts = {
        r["_bk"]: r["cnt"]
        for r in with_bucket.groupBy("_bk").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(int(b), int(o)) for b, o in offsets.items()], "_bk int, _offset long"
    )
    w = Window.partitionBy("_bk").orderBy(*[F.col(c) for c in order_cols])
    return (
        with_bucket.join(F.broadcast(off_df), "_bk")
        .withColumn("doc_id", F.row_number().over(w) + F.col("_offset") - 1)
        .drop("_bk", "_offset")
    )


def _invert_fn(config: IndexConfig, content_col: str):
    """mapInPandas fn: corpus batches -> per-(doc, term) tf rows.

    This is PerField.invert (IndexingChain.java:1121-1260) re-expressed
    batch-at-a-time: token stream -> positions -> per-doc term freqs + norm
    (norm byte = intToByte4(length), IndexingChain.java:1096-1112)."""
    chain, stopwords = config.chain, config.stopwords
    seg_size, with_pos = config.seg_size, config.with_positions

    def invert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat, counts = flat_tokenize(pdf[content_col], chain=chain)
            batch_docs = pdf["doc_id"].to_numpy(dtype=np.int64)
            total = int(counts.sum())
            if total == 0:
                continue
            row_idx = np.repeat(np.arange(len(pdf)), counts)
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            pos = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
            if stopwords:
                keep = ~np.isin(flat, list(stopwords))
                flat, row_idx, pos = flat[keep], row_idx[keep], pos[keep]
                # per-row effective lengths shrink; holes keep advancing pos
                counts = np.bincount(row_idx, minlength=len(pdf)).astype(np.int64)
                total = len(flat)
                if total == 0:
                    continue
            # one vectorized (row, term) aggregation for the whole batch:
            codes, _ = pd.factorize(pd.Series(flat), sort=False)
            key = row_idx.astype(np.int64) * (codes.max() + 1) + codes
            order = np.argsort(key, kind="stable")  # pos stays ascending
            key_s = key[order]
            bounds = np.concatenate(
                ([0], np.nonzero(np.diff(key_s))[0] + 1, [total])
            )
            first = order[bounds[:-1]]
            freqs = np.diff(bounds).astype(np.int32)
            g_rows = row_idx[first]
            doc_ids = batch_docs[g_rows]
            norms = int_to_byte4(counts).astype(np.int32)[g_rows]
            pos_sorted = pos[order]
            out = {
                "doc_id": doc_ids,
                "segment_id": (doc_ids // seg_size).astype(np.int32),
                "term": flat[first],
                "freq": freqs,
                "norm": norms,
                "positions": (
                    [a.astype(np.int32) for a in np.split(pos_sorted, bounds[1:-1])]
                    if with_pos
                    else [None] * len(first)
                ),
            }
            yield pd.DataFrame(out)

    return invert


def _segment_writer_fn(config: IndexConfig):
    """applyInPandas fn over one segment's tf rows -> encoded postings blocks.

    The Spark analog of FreqProxTermsWriter.flush + Lucene90PostingsWriter
    (sorted term replay, 128-int blocks, skip/impact metadata per block).

    Source-code corpora are singleton-heavy (most terms have docFreq 1 in a
    segment — the observation behind Lucene's singleton pulsing,
    Lucene90PostingsWriter.java:377-380), so single-posting terms take a
    direct bytes fast path instead of the generic numpy encoders."""
    block_size, with_pos = config.block_size, config.with_positions

    def write_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(columns=[f.name for f in POSTINGS_SCHEMA.fields])
        seg = int(pdf["segment_id"].iloc[0])
        codes, uniques = pd.factorize(pdf["term"], sort=True)
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((doc_ids, codes))
        codes_s = codes[order]
        docs_s = doc_ids[order]
        freqs_s = pdf["freq"].to_numpy(dtype=np.int64)[order]
        norms_s = pdf["norm"].to_numpy(dtype=np.int64)[order]
        pos_s = pdf["positions"].to_numpy()[order] if with_pos else None
        bounds = np.concatenate(
            ([0], np.nonzero(np.diff(codes_s))[0] + 1, [len(codes_s)])
        )
        sizes = np.diff(bounds)
        terms_arr = uniques.to_numpy() if hasattr(uniques, "to_numpy") else np.asarray(uniques)

        rows = []
        norms_u8 = norms_s.astype(np.uint8)
        for gi in range(len(sizes)):
            b0g, b1g = int(bounds[gi]), int(bounds[gi + 1])
            term = terms_arr[codes_s[b0g]]
            n_docs = b1g - b0g
            if n_docs == 1:
                d = int(docs_s[b0g])
                f = int(freqs_s[b0g])
                delta = d + 1  # base_doc = -1
                w = (delta - 1).bit_length()
                docs_enc = bytes([w]) + (delta - 1).to_bytes((w + 7) // 8, "little")
                fw = f.bit_length()
                freqs_enc = bytes([fw, 0]) + f.to_bytes((fw + 7) // 8, "little")
                if with_pos:
                    pos_enc = codec.vbyte_encode(
                        np.diff(np.asarray(pos_s[b0g], dtype=np.int64), prepend=0)
                        .astype(np.uint64)
                    )
                else:
                    pos_enc = None
                rows.append(
                    (term, seg, 0, -1, 1, d, docs_enc, freqs_enc,
                     norms_u8[b0g : b0g + 1].tobytes(),
                     [f], [int(norms_s[b0g])], pos_enc)
                )
                continue
            for b0 in range(b0g, b1g, block_size):
                b1 = min(b0 + block_size, b1g)
                d = docs_s[b0:b1]
                f = freqs_s[b0:b1]
                n = norms_s[b0:b1]
                base = int(docs_s[b0 - 1]) if b0 > b0g else -1
                imp_f, imp_n = codec.pareto_impacts(f, n)
                if with_pos:
                    pcat = np.concatenate(
                        [np.asarray(p, dtype=np.int64) for p in pos_s[b0:b1]]
                    )
                    pos_enc = codec.encode_positions(pcat, f)
                else:
                    pos_enc = None
                rows.append(
                    (
                        term,
                        seg,
                        (b0 - b0g) // block_size,
                        base,
                        int(b1 - b0),
                        int(d[-1]),
                        codec.delta_encode_docs(d, base),
                        codec.pfor_encode(f.astype(np.uint32)),
                        n.astype(np.uint8).tobytes(),
                        imp_f.astype(np.int32).tolist(),
                        imp_n.astype(np.int32).tolist(),
                        pos_enc,
                    )
                )
        return pd.DataFrame(
            rows,
            columns=[f.name for f in POSTINGS_SCHEMA.fields],
        )

    return write_segment


@dataclass
class Index:
    """A built index: the reader-side view (SURVEY.md §1.1 table mapping)."""

    docs: DataFrame  # doc_id, length, norm, <store_cols>
    terms: DataFrame  # term, doc_freq, total_term_freq, singleton_*
    postings: DataFrame  # POSTINGS_SCHEMA
    stats: CollectionStats
    config: IndexConfig

    def persist(self) -> "Index":
        self.docs.persist()
        self.terms.persist()
        self.postings.persist()
        return self

    def unpersist(self) -> "Index":
        for df in (self.docs, self.terms, self.postings):
            df.unpersist()
        return self


def build_index(
    corpus: DataFrame,
    config: IndexConfig = IndexConfig(),
    content_col: Optional[str] = None,
    doc_id_col: Optional[str] = None,
    order_cols: Optional[List[str]] = None,
    num_partitions: Optional[int] = None,
    auto_seg_size: bool = True,
) -> Index:
    """Build the full index from a corpus DataFrame.

    Either ``doc_id_col`` names an existing dense unique long column, or
    ``order_cols`` defines the canonical ingest order for doc_id assignment.
    """
    spark = corpus.sparkSession
    content_col = content_col or config.field
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 4)

    if doc_id_col is not None:
        df = corpus.withColumn("doc_id", F.col(doc_id_col).cast("long"))
    else:
        assert order_cols, "need doc_id_col or order_cols"
        df = assign_doc_ids(corpus, order_cols, num_partitions)

    if auto_seg_size:
        # enough segments to keep every core busy in the segment writer
        # (the DWPT-count analog); never larger than the configured cap
        n = corpus.count()
        eff = min(config.seg_size, max(1024, n // (num_partitions * 2) + 1))
        if eff != config.seg_size:
            import dataclasses

            config = dataclasses.replace(config, seg_size=eff)

    tf = df.select("doc_id", content_col).mapInPandas(
        _invert_fn(config, content_col), schema=TF_SCHEMA
    )

    # ONE wide shuffle: group whole segments for the block writer
    postings = tf.groupBy("segment_id").applyInPandas(
        _segment_writer_fn(config), schema=POSTINGS_SCHEMA
    )

    # term stats: partial-agg-friendly; singleton (pulsing) info captured via
    # min/max trick — only meaningful when doc_freq == 1
    terms = tf.groupBy("term").agg(
        F.count("*").alias("doc_freq"),
        F.sum("freq").alias("total_term_freq"),
        F.min("doc_id").alias("singleton_doc_id"),
        F.max("freq").alias("singleton_freq"),
        F.max("norm").alias("singleton_norm"),
    )

    # docs / norms: lightweight second analysis-free pass is avoided by
    # deriving length from tf (sum of freqs); docs with zero tokens keep norm 0
    lengths = tf.groupBy("doc_id").agg(F.sum("freq").alias("length"))
    docs = (
        df.select("doc_id", *config.store_cols)
        .join(lengths, "doc_id", "left")
        .fillna({"length": 0})
    )
    norm_udf = F.pandas_udf(
        lambda s: pd.Series(int_to_byte4(s.to_numpy(dtype=np.int64))), "int"
    )
    docs = docs.withColumn("norm", norm_udf(F.col("length")))

    row = docs.agg(
        F.count("*").alias("n"), F.sum("length").alias("sttf")
    ).collect()[0]
    stats = CollectionStats(doc_count=int(row["n"]), sum_total_term_freq=int(row["sttf"] or 0))
    return Index(docs=docs, terms=terms, postings=postings, stats=stats, config=config)


def write_index(index: Index, path: str) -> dict:
    """Persist index tables as Parquet + manifest (commit point: the analog of
    SegmentInfos/segments_N — SURVEY.md §2.1). Returns manifest dict.

    Postings are sorted by (term) within segment partitions so Parquet
    row-group stats prune term seeks."""
    t0 = time.time()
    (
        index.postings.repartition("segment_id")
        .sortWithinPartitions("term", "block_id")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "postings"))
    )
    index.terms.write.mode("overwrite").parquet(os.path.join(path, "terms"))
    index.docs.write.mode("overwrite").parquet(os.path.join(path, "docs"))
    manifest = {
        "generation": int(time.time()),
        "doc_count": index.stats.doc_count,
        "sum_total_term_freq": index.stats.sum_total_term_freq,
        "config": {
            "chain": index.config.chain,
            "seg_size": index.config.seg_size,
            "block_size": index.config.block_size,
            "with_positions": index.config.with_positions,
            "k1": index.config.k1,
            "b": index.config.b,
        },
        "build_wall_sec": round(time.time() - t0, 3),
    }
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)
    return manifest


def read_index(spark: SparkSession, path: str) -> Index:
    """Open a written index (DirectoryReader.open analog)."""
    with open(os.path.join(path, "manifest.json")) as fh:
        manifest = json.load(fh)
    cfg = IndexConfig(**{k: v for k, v in manifest["config"].items()})
    return Index(
        docs=spark.read.parquet(os.path.join(path, "docs")),
        terms=spark.read.parquet(os.path.join(path, "terms")),
        postings=spark.read.parquet(os.path.join(path, "postings")),
        stats=CollectionStats(
            doc_count=manifest["doc_count"],
            sum_total_term_freq=manifest["sum_total_term_freq"],
        ),
        config=cfg,
    )
