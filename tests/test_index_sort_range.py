"""IndexSortRangeQuery: doc_id-interval evaluation on a declared index
sort (sandbox/search/IndexSortSortedNumericDocValuesRangeQuery.java),
equivalence with the doc-values range, fallback, and the scan-pruning
plan claim."""

import numpy as np
import pytest

from lucene_spark.build import IndexConfig, build_index
from lucene_spark.query import IndexSortRangeQuery, PointRangeQuery
from lucene_spark.search import Searcher


@pytest.fixture(scope="module")
def sorted_idx(spark):
    rows = [(i, f"doc {i % 13} text", (i * 37) % 500) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string, nval long")
    idx = build_index(
        df,
        IndexConfig(seg_size=64, with_positions=False, store_cols=("nval",)),
        content_col="text",
        order_cols=["nval", "doc_id"],
        auto_seg_size=False,
        eager=True,
    )
    yield Searcher(idx, dtype=np.float32)
    idx.unpersist()


@pytest.fixture(scope="module")
def unsorted_idx(spark):
    rows = [(i, f"doc {i % 13} text", (i * 37) % 500) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, nval long")
    idx = build_index(
        df,
        IndexConfig(seg_size=64, with_positions=False, store_cols=("nval",)),
        content_col="text",
        doc_id_col="doc_id",
        auto_seg_size=False,
        eager=True,
    )
    yield Searcher(idx, dtype=np.float32)
    idx.unpersist()


def _ids(df):
    return sorted(int(r["doc_id"]) for r in df.collect())


@pytest.mark.parametrize("lo,hi", [(100, 300), (0, 499), (250, 250), (600, 700)])
def test_equivalent_to_doc_values_range(sorted_idx, lo, hi):
    fast = sorted_idx.matches(
        IndexSortRangeQuery(field_col="nval", lower=lo, upper=hi)
    )
    slow = sorted_idx.matches(
        PointRangeQuery(field_col="nval", lower=lo, upper=hi)
    )
    assert _ids(fast) == _ids(slow)


def test_open_bounds(sorted_idx):
    fast = sorted_idx.matches(IndexSortRangeQuery(field_col="nval", lower=400))
    slow = sorted_idx.matches(PointRangeQuery(field_col="nval", lower=400))
    assert _ids(fast) == _ids(slow)


def test_fallback_on_unsorted_index(unsorted_idx):
    q = IndexSortRangeQuery(
        field_col="nval", lower=100, upper=300,
        fallback=PointRangeQuery(field_col="nval", lower=100, upper=300),
    )
    got = unsorted_idx.matches(q)
    exp = unsorted_idx.matches(PointRangeQuery(field_col="nval", lower=100, upper=300))
    assert _ids(got) == _ids(exp)


def test_no_fallback_raises(unsorted_idx):
    with pytest.raises(ValueError, match="no fallback"):
        unsorted_idx.matches(IndexSortRangeQuery(field_col="nval", lower=1))


def test_result_plan_is_docid_range_only(spark, sorted_idx, tmp_path_factory):
    """The match set must be a doc_id-interval filter over the PARQUET
    docs: the value column is absent from the result scan (ReadSchema)
    and the doc_id range is a pushed filter — downstream consumers prune
    purely on doc_id."""
    from lucene_spark.build import read_index, write_index

    path = str(tmp_path_factory.mktemp("isridx"))
    write_index(sorted_idx.index, path)
    s = Searcher(read_index(spark, path), dtype=np.float32)
    df = s._eval(
        IndexSortRangeQuery(field_col="nval", lower=100, upper=300), False
    )
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and all("nval" not in ln for ln in rs), plan[:2000]
    assert "GreaterThanOrEqual(doc_id" in plan
