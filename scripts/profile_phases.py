"""Per-phase wall times of the exact build the scaling bench measures
(order_cols path, eager), to locate the non-scaling (serial) fraction.
Usage: python scripts/profile_phases.py [cores] [n_docs]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000

    import dataclasses

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from lucene_spark.build import (
        IndexConfig,
        POSTINGS_SCHEMA,
        TF_SCHEMA,
        _assign_invert_fn,
        _range_partition_with_offsets,
        _segment_writer_fn,
    )
    from lucene_spark.corpus import generate_corpus
    from lucene_spark.session import get_spark

    spark = get_spark(app=f"prof_{cores}", cores=cores, shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    num_partitions = cores * 2

    corpus = generate_corpus(spark, n_docs, num_partitions=cores * 4).persist()
    corpus.count()

    def run_once(tag: str) -> None:
        times = {}
        t0 = time.time()
        parted, offsets, n = _range_partition_with_offsets(
            corpus, ["repo", "path"], num_partitions
        )
        times["range_partition+offsets"] = time.time() - t0

        cfg = IndexConfig(chain="code", seg_size=1 << 13, block_size=128,
                          with_positions=False)
        eff = min(cfg.seg_size, max(1024, n // (num_partitions * 2) + 1))
        cfg = dataclasses.replace(cfg, seg_size=eff)

        t0 = time.time()
        tf = parted.withColumn("_pid", F.spark_partition_id()).mapInPandas(
            _assign_invert_fn(cfg, "content", offsets), schema=TF_SCHEMA
        ).persist(StorageLevel.MEMORY_AND_DISK)
        tf.count()
        times["invert(tf persist+count)"] = time.time() - t0

        t0 = time.time()
        postings = (
            tf.groupBy("segment_id").applyInPandas(
                _segment_writer_fn(cfg), schema=POSTINGS_SCHEMA
            )
            .repartitionByRange(num_partitions, "term")
            .sortWithinPartitions("term", "segment_id", "block_id")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        postings.count()
        times["postings(write+range+count)"] = time.time() - t0

        t0 = time.time()
        terms = postings.groupBy("term").agg(
            F.sum("count").cast("long").alias("doc_freq"),
            F.sum("sum_freq").alias("total_term_freq"),
            F.min("last_doc").alias("singleton_doc_id"),
            F.max(F.array_max("imp_freqs")).cast("int").alias("singleton_freq"),
            F.max(F.array_max("imp_norms")).cast("int").alias("singleton_norm"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        lengths = tf.groupBy("doc_id").agg(
            F.sum("freq").alias("length"),
            F.max("norm").alias("_tf_norm"),
            F.max("dlen").alias("_tf_dlen"),
        )
        docs = (
            spark.range(0, n).withColumnRenamed("id", "doc_id")
            .join(lengths, "doc_id", "left").fillna({"length": 0})
            .withColumn("norm", F.coalesce(F.col("_tf_norm"), F.lit(0)).cast("int"))
            .withColumn("num_overlap",
                        (F.col("length") - F.coalesce(F.col("_tf_dlen"), F.lit(0))).cast("long"))
            .drop("_tf_norm", "_tf_dlen")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as ex:
            ft, fd = ex.submit(terms.count), ex.submit(docs.count)
            ft.result(), fd.result()
        times["terms+docs (concurrent)"] = time.time() - t0

        t0 = time.time()
        sttf = terms.agg(F.sum("total_term_freq").alias("s")).collect()[0]["s"]
        times["sttf agg"] = time.time() - t0

        total = sum(times.values())
        print(f"--- {tag} cores={cores} total={total:.2f}s (sttf={sttf})")
        for k, v in times.items():
            print(f"  {k:32s} {v:7.2f}s")
        for df in (tf, postings, terms, docs):
            df.unpersist()
        parted.unpersist()

    run_once("warmup")
    run_once("measured")
    run_once("measured2")
    spark.stop()


if __name__ == "__main__":
    main()
