"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entry
from lucene_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_df(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main():
    spark = get_spark(app="oracle_check", cores=4, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP {name}: rows-only ({len(got)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        g, e = norm_df(got), norm_df(exp)
        ok_cols = list(g.columns) == list(e.columns)
        ok_rows = len(g) == len(e)
        ok_vals = False
        if ok_cols and ok_rows:
            try:
                pd.testing.assert_frame_equal(
                    g, e, check_dtype=False, check_exact=True
                )
                ok_vals = True
            except AssertionError as ae:
                ok_vals = False
                detail = str(ae).splitlines()[:6]
        if ok_cols and ok_rows and ok_vals:
            print(f"PASS {name} ({len(g)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(
                f"FAIL {name}: cols_match={ok_cols} rows {len(g)} vs {len(e)} vals={ok_vals}"
            )
            if ok_cols and ok_rows and not ok_vals:
                print("  " + "\n  ".join(detail))
            else:
                print(f"  spark cols={list(g.columns)} duck cols={list(e.columns)}")
                print("  spark head:\n", g.head(3))
                print("  duck head:\n", e.head(3))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
