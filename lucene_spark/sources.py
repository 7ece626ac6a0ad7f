"""Corpus source adapters — the Directory-opening role for ingest
(SURVEY.md §2.1; the north-star ingest surface is "the `content` column
of the Iceberg source-code table").

`read_code_table` opens the corpus from whichever container holds it:

- an Iceberg table (catalog name like ``db.code_repos`` or a path with
  ``format='iceberg'``) when the Iceberg Spark runtime is on the
  classpath — table-format pruning (partition + file skipping on the
  manifest trees) then composes with the same predicate/column pushdown
  every downstream build and query plan already relies on;
- a Parquet path (this sandbox's testdata layout and the default for
  `write_index` output).

The sandbox image ships no Iceberg runtime JARs, so the Iceberg branch
is import-gated with an actionable error instead of a stub success —
the calling code (`build_index` takes any DataFrame) is already
container-agnostic, which is the point: the engine never assumes a
storage layout beyond "a DataFrame with an id column and a content
column"."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_code_table(
    spark: SparkSession,
    source: str,
    fmt: str | None = None,
    columns: tuple = (),
) -> DataFrame:
    """Open a corpus table: ``fmt`` one of 'parquet', 'iceberg', or None
    to infer (existing path -> parquet; otherwise an Iceberg table name).
    ``columns`` optionally prunes the projection at the scan."""
    if fmt is None:
        fmt = "parquet" if os.path.exists(source) else "iceberg"
    if fmt == "parquet":
        df = spark.read.parquet(source)
    elif fmt == "iceberg":
        try:
            # catalog table name ("db.table") or a metadata path via the
            # iceberg datasource; either needs iceberg-spark-runtime JARs
            df = (
                spark.table(source)
                if not source.startswith(("/", "s3://", "hdfs://"))
                else spark.read.format("iceberg").load(source)
            )
        except Exception as e:  # AnalysisException / ClassNotFound via py4j
            raise ImportError(
                "Iceberg source requested but the Iceberg Spark runtime is "
                "not on this cluster's classpath (add "
                "org.apache.iceberg:iceberg-spark-runtime and a catalog "
                f"config); underlying error: {e}"
            ) from e
    else:
        raise ValueError(f"unknown corpus format {fmt!r}")
    if columns:
        df = df.select(*columns)
    return df
