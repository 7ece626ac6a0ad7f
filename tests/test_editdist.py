"""OSA (restricted Damerau-Levenshtein) edit distance — FuzzyQuery
transpositions=true parity (search/FuzzyQuery.java:30-31,61-81)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_spark.editdist import osa_distance, osa_distances

WORD = st.text(alphabet="abcd", min_size=0, max_size=7)


def test_canonical_pairs():
    # transposition is ONE edit
    assert osa_distance("form", "from") == 1
    assert osa_distance("sprak", "spark") == 1
    # OSA never edits a transposed pair again: differs from unrestricted
    # Damerau-Levenshtein (DL("ca","abc") = 2)
    assert osa_distance("ca", "abc") == 3
    assert osa_distance("abc", "ca") == 3
    # classic sanity
    assert osa_distance("", "abc") == 3
    assert osa_distance("kitten", "sitting") == 3
    assert osa_distance("abc", "abc") == 0


@given(st.lists(WORD, min_size=0, max_size=30), WORD)
@settings(max_examples=150, deadline=None)
def test_vectorized_equals_scalar(cands, term):
    got = osa_distances(cands, term)
    want = np.array([osa_distance(c, term) for c in cands], dtype=np.int64)
    assert np.array_equal(got, want)


@given(WORD, WORD)
@settings(max_examples=300, deadline=None)
def test_osa_bounded_by_classic_levenshtein(a, b):
    # Damerau <= classic, so the classic length band prefilter stays exact
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, lb + 1):
            cur = min(
                dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
            prev, dp[j] = dp[j], cur
    classic = dp[lb]
    osa = osa_distance(a, b)
    assert abs(la - lb) <= osa <= classic


@given(WORD, WORD)
@settings(max_examples=200, deadline=None)
def test_osa_agrees_with_duckdb_damerau_at_distance_1(a, b):
    # the q_fuzzy_transpositions oracle relies on OSA == unrestricted DL at
    # threshold 1 (a single primitive op is the same op in both metrics)
    import duckdb

    dl = duckdb.connect().execute(
        "SELECT damerau_levenshtein(?, ?)", [a, b]
    ).fetchone()[0]
    assert (dl <= 1) == (osa_distance(a, b) <= 1)
