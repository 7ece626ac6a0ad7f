"""Cluster entrypoint: checkpoint-resumable index build, launched via

    spark-submit --master <cluster> --py-files dist/lucene_spark.zip \
        scripts/submit_build.py --corpus <parquet-or-iceberg-table-path> \
        --out <index-dir> --shards 64

(BASELINE.json north rule: "run via spark-submit --py-files on a
multi-executor cluster"). With --n-docs instead of --corpus it builds over
the deterministic synthetic source-code corpus (sandbox mode). The build is
resumable: re-submitting with the same --out continues from committed
shards. Prints the final MANIFEST as the last stdout line.
"""
from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", help="parquet path of (repo,path,commit,lang,content)")
    ap.add_argument("--n-docs", type=int, default=0,
                    help="generate a synthetic corpus of this size instead")
    ap.add_argument("--out", required=True)
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--chain", default="code", choices=["code", "standard"])
    ap.add_argument("--seg-size", type=int, default=1 << 13)
    ap.add_argument("--positions", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("lucene_spark_build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from lucene_spark.checkpoint import build_checkpointed
    from lucene_spark.config import IndexConfig
    from lucene_spark.corpus import generate_corpus

    if args.corpus:
        corpus = spark.read.parquet(args.corpus)
    elif args.n_docs:
        corpus = generate_corpus(
            spark, args.n_docs,
            num_partitions=max(spark.sparkContext.defaultParallelism * 2, 8),
        ).persist()
        corpus.count()
    else:
        raise SystemExit("need --corpus or --n-docs")

    cfg = IndexConfig(chain=args.chain, seg_size=args.seg_size,
                      block_size=128, with_positions=args.positions)
    manifest = build_checkpointed(
        corpus, cfg, args.out, order_cols=["repo", "path"], n_shards=args.shards
    )
    print(json.dumps(manifest))
    spark.stop()


if __name__ == "__main__":
    main()
