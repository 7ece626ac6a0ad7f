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


def test_xorshift_matches_java_semantics():
    from lucene_spark.functions.facets import XORShift64Random

    # literal transcription check: Java long ops simulated independently
    def java_rng(seed):
        M = 1 << 64
        x = 0xDEADBEEF if seed == 0 else seed % M
        while True:
            x = (x ^ (x << 21)) % M
            x = x ^ (x >> 35)
            x = (x ^ (x << 4)) % M
            signed = x - M if x >= (1 << 63) else x
            yield signed

    rng = XORShift64Random(42)
    it = java_rng(42)
    for _ in range(50):
        s = next(it)
        r = s % 97 if s >= 0 else -((-s) % 97)
        assert rng.next_int(97) == abs(r)


def test_random_sampling_matches_literal_transcription(spark):
    from lucene_spark.functions.facets import (
        XORShift64Random,
        random_sampling_matches,
    )

    n = 500
    matches = spark.createDataFrame(
        [(i * 3, 1.0) for i in range(n)], "doc_id long, score double"
    )
    sampled, rate = random_sampling_matches(matches, 40, seed=7)
    got = sorted(int(r["doc_id"]) for r in sampled.collect())

    # literal port of createSample's counter/limit loop over the stream
    bin_size = int(1.0 / ((1.0 * 40) / n))
    rng = XORShift64Random(7)
    counter, limit, random_index = 0, bin_size, rng.next_int(bin_size)
    exp = []
    for d in sorted(i * 3 for i in range(n)):
        if counter == random_index:
            exp.append(d)
        counter += 1
        if counter >= limit:
            counter, limit, random_index = 0, bin_size, rng.next_int(bin_size)
    assert got == exp
    assert rate == pytest.approx(40 / n)
    # one doc per full bin
    assert len(got) in (n // bin_size, n // bin_size + 1)


def test_random_sampling_small_resultset_keeps_all(spark):
    from lucene_spark.functions.facets import random_sampling_matches

    m = spark.createDataFrame([(i, 1.0) for i in range(10)],
                              "doc_id long, score double")
    sampled, rate = random_sampling_matches(m, 50, seed=1)
    assert rate == 1.0 and sampled.count() == 10
