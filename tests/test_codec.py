"""Block codec round-trip property tests (reference test style:
test-framework/.../index/BasePostingsFormatTestCase.java /
RandomPostingsTester.java:824 — random postings, encode, decode, compare;
FIXTURES.md §5 shapes)."""

import numpy as np
import pytest

from lucene_spark.codec import (
    BLOCK_SIZE,
    decode_positions,
    delta_decode_docs,
    delta_encode_docs,
    encode_positions,
    for_decode,
    for_encode,
    pareto_impacts,
    pfor_decode,
    pfor_encode,
    vbyte_decode,
    vbyte_encode,
)

RNG = np.random.default_rng(42)


@pytest.mark.parametrize("n", [1, 2, 127, 128])
@pytest.mark.parametrize("max_val", [0, 1, 7, 255, 2**20])
def test_for_round_trip(n, max_val):
    vals = RNG.integers(0, max_val + 1, size=n).astype(np.uint32)
    assert np.array_equal(for_decode(for_encode(vals), n), vals)


def test_for_dense_one_byte():
    # all-zero block (all-deltas-1 dense case) collapses to width byte only
    assert for_encode(np.zeros(BLOCK_SIZE, dtype=np.uint32)) == b"\x00"


@pytest.mark.parametrize("n", [1, 5, 128])
def test_pfor_round_trip_with_outliers(n):
    vals = RNG.integers(1, 4, size=n).astype(np.uint32)
    # up to 7 outliers patched out (PForUtil.java:45-79)
    n_out = min(7, n)
    idx = RNG.choice(n, size=n_out, replace=False)
    vals[idx] = RNG.integers(1000, 10**6, size=n_out)
    enc = pfor_encode(vals)
    assert np.array_equal(pfor_decode(enc, n), vals)
    # body packs small: with <=7 outliers the body width stays low
    assert enc[0] <= 2


def test_pfor_eight_outliers_widens():
    vals = np.ones(128, dtype=np.uint32)
    vals[:8] = 10**6
    enc = pfor_encode(vals)
    assert np.array_equal(pfor_decode(enc, 128), vals)


@pytest.mark.parametrize(
    "doc_freq", [1, 2, 127, 128, 129, 1000, 50_000]
)
def test_delta_docs_round_trip(doc_freq):
    docs = np.sort(RNG.choice(10**7, size=doc_freq, replace=False)).astype(np.int64)
    base = -1 if docs[0] == 0 else int(RNG.integers(0, docs[0]))
    enc = delta_encode_docs(docs, base)
    assert np.array_equal(delta_decode_docs(enc, doc_freq, base), docs)


def test_delta_docs_dense_run_single_byte():
    docs = np.arange(100, 100 + BLOCK_SIZE, dtype=np.int64)
    enc = delta_encode_docs(docs, 99)
    assert enc == b"\x00"  # ForDeltaUtil.java:55-56 analog


def test_delta_docs_rejects_non_increasing():
    with pytest.raises(ValueError):
        delta_encode_docs(np.array([5, 5]), 0)


@pytest.mark.parametrize("n", [0, 1, 1000])
def test_vbyte_round_trip(n):
    vals = RNG.integers(0, 2**40, size=n).astype(np.uint64)
    assert np.array_equal(vbyte_decode(vbyte_encode(vals), n), vals)


def test_positions_round_trip():
    freqs = np.array([3, 1, 5, 2])
    pos = np.concatenate([np.sort(RNG.choice(1000, size=f, replace=False)) for f in freqs])
    enc = encode_positions(pos, freqs)
    assert np.array_equal(decode_positions(enc, freqs), pos)


def test_pareto_impacts():
    # (freq, norm) pairs; dominated pairs dropped
    freqs = np.array([3, 5, 2, 5, 7, 1])
    norms = np.array([10, 10, 4, 12, 20, 4])
    f, n = pareto_impacts(freqs, norms)
    # frontier: (2,4) then (5,10) then (7,20); (3,10) dominated by (5,10),
    # (5,12) dominated by (5,10), (1,4) dominated by (2,4)
    assert list(zip(f.tolist(), n.tolist())) == [(2, 4), (5, 10), (7, 20)]
    # invariant: strictly increasing in both coordinates
    assert np.all(np.diff(f) > 0) and np.all(np.diff(n) > 0)


def test_pareto_impacts_single():
    f, n = pareto_impacts(np.array([4]), np.array([9]))
    assert f.tolist() == [4] and n.tolist() == [9]
