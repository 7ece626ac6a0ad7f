"""Alternate similarity parity vs independent float32 references
(BaseSimilarityTestCase style: finite, >= 0 for LMD/Boolean, monotonicity)."""

import math

import numpy as np
import pytest

from lucene_spark.bm25 import CollectionStats
from lucene_spark.similarities import BM25, Boolean, Classic, LMDirichlet, TermStatsIn
from lucene_spark.smallfloat import byte4_to_int

STATS = CollectionStats(doc_count=1000, sum_total_term_freq=50_000)
TS = TermStatsIn(doc_freq=30, total_term_freq=120)

FREQS = np.array([1, 2, 3, 10, 100], dtype=np.int64)
NORMS = np.array([5, 24, 40, 100, 255], dtype=np.int64)


def test_classic_reference_f32():
    s = Classic().scorer(2.0, TS, STATS, dtype=np.float32)
    got = s.score(FREQS, NORMS)
    idf = np.float32(math.log((1000 + 1) / (30 + 1.0)) + 1.0)
    w = np.float32(2.0) * idf
    for i, (f, n) in enumerate(zip(FREQS, NORMS)):
        dl = byte4_to_int(int(n))
        nv = np.float32(1.0 / math.sqrt(dl))
        exp = np.float32(np.float32(math.sqrt(f)) * w) * nv
        assert got[i] == exp


def test_classic_norm_zero_quirk():
    s = Classic().scorer(1.0, TS, STATS, dtype=np.float64)
    # normTable[0] = 1/normTable[255] (TFIDFSimilarity.java:473)
    v0 = s.score(np.array([1]), np.array([0]))[0]
    v255 = s.score(np.array([1]), np.array([255]))[0]
    idf = math.log(1001 / 31.0) + 1.0
    assert v0 == pytest.approx(idf * math.sqrt(byte4_to_int(255)), rel=1e-12)
    assert v255 == pytest.approx(idf / math.sqrt(byte4_to_int(255)), rel=1e-12)


def test_boolean_constant():
    s = Boolean().scorer(3.5, TS, STATS)
    assert np.all(s.score(FREQS, NORMS) == np.float32(3.5))
    assert s.max_score(np.array([9]), np.array([4])) == 3.5


def test_lmdirichlet_reference():
    s = LMDirichlet().scorer(1.0, TS, STATS, dtype=np.float64)
    got = s.score(FREQS, NORMS)
    pc = (120 + 1.0) / (50_000 + 1.0)
    for i, (f, n) in enumerate(zip(FREQS, NORMS)):
        dl = float(byte4_to_int(int(n)))
        exp = max(0.0, math.log(1 + f / (2000.0 * pc)) + math.log(2000.0 / (dl + 2000.0)))
        assert got[i] == pytest.approx(exp, rel=1e-12)
    assert np.all(got >= 0)


@pytest.mark.parametrize("sim", [BM25(), Classic(), LMDirichlet()])
def test_monotonicity_properties(sim):
    """score increases with freq (fixed norm), decreases with norm (fixed
    freq) — BaseSimilarityTestCase.java:72-160 analog."""
    s = sim.scorer(1.0, TS, STATS, dtype=np.float32)
    freqs = np.arange(1, 200)
    by_freq = s.score(freqs, np.full(len(freqs), 60))
    assert np.all(np.diff(by_freq) >= 0)
    norms = np.arange(1, 256)
    by_norm = s.score(np.full(len(norms), 5), norms)
    assert np.all(np.diff(by_norm.astype(np.float64)) <= 1e-9)
    assert np.all(np.isfinite(by_freq)) and np.all(np.isfinite(by_norm))


def test_multi_scorer_sums_idf():
    ts2 = TermStatsIn(doc_freq=5, total_term_freq=9)
    for sim in (BM25(), Classic()):
        single = sim.scorer(1.0, TS, STATS, dtype=np.float64)
        multi = sim.multi_scorer(1.0, [TS, ts2], STATS, dtype=np.float64)
        a = single.score(np.array([3]), np.array([50]))[0]
        b = multi.score(np.array([3]), np.array([50]))[0]
        assert b > a  # summed idf weight is larger
