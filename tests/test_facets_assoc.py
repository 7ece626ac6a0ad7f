"""LongValueFacetCounts + association facets vs Python brute force
(facet/LongValueFacetCounts.java, taxonomy/TaxonomyFacetSumIntAssociations
.java)."""

from collections import Counter, defaultdict

import pytest

from lucene_spark.functions.facets import long_value_counts, sum_associations


@pytest.fixture(scope="module")
def fx(spark):
    rows = [(i, i % 7 if i % 11 else None, [i % 3, i % 5]) for i in range(120)]
    dims = spark.createDataFrame(
        rows, "doc_id long, nval long, mvals array<long>"
    )
    matches = spark.createDataFrame(
        [(i, 1.0) for i in range(0, 120, 2)], "doc_id long, score double"
    )
    assoc = spark.createDataFrame(
        [(i, f"c{i % 4}", i % 9) for i in range(120)]
        + [(i, f"c{(i + 1) % 4}", 3) for i in range(0, 120, 3)],
        "doc_id long, cat string, value long",
    )
    return {"dims": dims, "matches": matches, "assoc": assoc}


def test_long_value_counts_top_sorted_by_count(fx):
    exp = Counter(
        i % 7 for i in range(0, 120, 2) if i % 11
    )
    top = long_value_counts(fx["matches"], fx["dims"], "nval", top_n=3).collect()
    expected = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(r["value"], r["cnt"]) for r in top] == expected


def test_long_value_counts_all_sorted_by_value(fx):
    exp = Counter(i % 7 for i in range(0, 120, 2) if i % 11)
    got = long_value_counts(fx["matches"], fx["dims"], "nval").collect()
    assert [(r["value"], r["cnt"]) for r in got] == sorted(exp.items())


def test_long_value_counts_null_skipped(fx):
    got = long_value_counts(fx["matches"], fx["dims"], "nval").collect()
    assert sum(r["cnt"] for r in got) == sum(1 for i in range(0, 120, 2) if i % 11)


def test_long_value_counts_multivalued_explodes(fx):
    exp = Counter()
    for i in range(0, 120, 2):
        exp[i % 3] += 1
        exp[i % 5] += 1
    got = long_value_counts(fx["matches"], fx["dims"], "mvals").collect()
    assert [(r["value"], r["cnt"]) for r in got] == sorted(exp.items())


def test_long_value_counts_expression(fx):
    exp = Counter((i % 7) * 2 for i in range(0, 120, 2) if i % 11)
    got = long_value_counts(fx["matches"], fx["dims"], "nval * 2").collect()
    assert [(r["value"], r["cnt"]) for r in got] == sorted(exp.items())


def test_sum_associations_int(fx):
    exp = defaultdict(int)
    for i in range(0, 120, 2):
        exp[f"c{i % 4}"] += i % 9
        if i % 3 == 0:
            exp[f"c{(i + 1) % 4}"] += 3
    got = sum_associations(fx["matches"], fx["assoc"]).collect()
    expected = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r["cat"], r["total"]) for r in got] == expected


def test_sum_associations_top_n_and_float(fx):
    got = sum_associations(fx["matches"], fx["assoc"], top_n=2,
                           float_values=True).collect()
    assert len(got) == 2
    assert isinstance(got[0]["total"], float)
    assert got[0]["total"] >= got[1]["total"]
