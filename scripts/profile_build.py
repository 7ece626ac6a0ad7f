"""Stage-by-stage profile of the (eager) index build to locate serial
bottlenecks.  Usage: python scripts/profile_build.py [cores] [n_docs]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from lucene_spark.build import (
        IndexConfig, TF_SCHEMA, POSTINGS_SCHEMA, _invert_fn,
        _segment_writer_fn, assign_doc_ids,
    )
    from lucene_spark.corpus import generate_corpus, sha256_sidecar, verify_sha256
    from lucene_spark.session import get_spark

    spark = get_spark(app=f"profile_{cores}", cores=cores, shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    corpus = generate_corpus(spark, n_docs, num_partitions=cores * 4).persist()
    corpus.count()
    print(f"gen           {time.time()-t0:7.2f}s", flush=True)

    t0 = time.time()
    sidecar = sha256_sidecar(corpus).persist()
    sidecar.count()
    print(f"sha_sidecar   {time.time()-t0:7.2f}s", flush=True)

    t0 = time.time()
    verify_sha256(corpus, sidecar)
    print(f"sha_verify    {time.time()-t0:7.2f}s", flush=True)

    t0 = time.time()
    df = assign_doc_ids(corpus, ["repo", "path"], cores * 2).persist(
        StorageLevel.MEMORY_AND_DISK)
    df.count()
    print(f"doc_ids       {time.time()-t0:7.2f}s", flush=True)

    import dataclasses
    cfg = IndexConfig(chain="code", seg_size=1 << 13, block_size=128,
                      with_positions=False)
    eff = min(cfg.seg_size, max(1024, n_docs // (cores * 2 * 2) + 1))
    cfg = dataclasses.replace(cfg, seg_size=eff)
    print(f"  seg_size={cfg.seg_size} -> {n_docs // cfg.seg_size + 1} segments", flush=True)

    t0 = time.time()
    tf = df.select("doc_id", "content").mapInPandas(
        _invert_fn(cfg, "content"), schema=TF_SCHEMA
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_tf = tf.count()
    print(f"invert(tf)    {time.time()-t0:7.2f}s  ({n_tf:,} tf rows)", flush=True)

    t0 = time.time()
    postings = tf.groupBy("segment_id").applyInPandas(
        _segment_writer_fn(cfg), schema=POSTINGS_SCHEMA
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_post = postings.count()
    print(f"seg_writer    {time.time()-t0:7.2f}s  ({n_post:,} block rows)", flush=True)

    t0 = time.time()
    terms = postings.groupBy("term").agg(
        F.sum("count").cast("long").alias("doc_freq"),
        F.sum("sum_freq").alias("total_term_freq"),
        F.min("last_doc").alias("singleton_doc_id"),
        F.max(F.array_max("imp_freqs")).cast("int").alias("singleton_freq"),
        F.max(F.array_max("imp_norms")).cast("int").alias("singleton_norm"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_terms = terms.count()
    print(f"terms_agg     {time.time()-t0:7.2f}s  ({n_terms:,} terms)", flush=True)

    t0 = time.time()
    lengths = tf.groupBy("doc_id").agg(F.sum("freq").alias("length"))
    docs = (
        df.select("doc_id")
        .join(lengths, "doc_id", "left")
        .fillna({"length": 0})
    ).persist(StorageLevel.MEMORY_AND_DISK)
    docs.count()
    print(f"docs_tbl      {time.time()-t0:7.2f}s", flush=True)

    t0 = time.time()
    docs.agg(F.count("*"), F.sum("length")).collect()
    print(f"stats         {time.time()-t0:7.2f}s", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
