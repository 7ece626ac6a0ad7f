"""Alternate similarity parity vs independent float32 references
(BaseSimilarityTestCase style: finite, >= 0 for LMD/Boolean, monotonicity)."""

import math

import numpy as np
import pytest

from lucene_spark.bm25 import CollectionStats
from lucene_spark.similarities import (
    BM25,
    DFI,
    DFR,
    IB,
    AxiomaticF2EXP,
    Boolean,
    Classic,
    LMDirichlet,
    LMJelinekMercer,
    MultiSimilarity,
    TermStatsIn,
)
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


def _dl(n):
    """Decoded length through Lucene's float32 LENGTH_TABLE
    (SimilarityBase.java LENGTH_TABLE is float[]; large lengths round)."""
    return float(np.float32(byte4_to_int(int(n))))


def test_lmjelinekmercer_reference():
    s = LMJelinekMercer(0.1).scorer(1.0, TS, STATS, dtype=np.float64)
    got = s.score(FREQS, NORMS)
    pc = (120 + 1.0) / (50_000 + 1.0)
    for i, (f, n) in enumerate(zip(FREQS, NORMS)):
        dl = _dl(n)
        exp = math.log(1 + ((1 - 0.1) * f / dl) / (0.1 * pc))
        assert got[i] == pytest.approx(exp, rel=1e-12)
    assert np.all(got >= 0)


def test_dfr_gb2_reference():
    s = DFR().scorer(1.0, TS, STATS, dtype=np.float64)
    got = s.score(FREQS, NORMS)
    F_, N = 120 + 1.0, 1000.0
    lam = F_ / (N + F_)
    A, B = math.log2(lam + 1), math.log2((1 + lam) / lam)
    ae = (F_ + 1.0) / (30 + 1.0)
    avgfl = 50_000 / 1000.0
    for i, (f, n) in enumerate(zip(FREQS, NORMS)):
        dl = _dl(n)
        tfn = f * math.log2(1 + avgfl / dl)
        exp = (B - (B - A) / (1 + tfn)) * ae
        assert got[i] == pytest.approx(exp, rel=1e-12)
    assert np.all(got >= 0)


def test_ib_lldfh2_reference():
    s = IB().scorer(1.0, TS, STATS, dtype=np.float64)
    got = s.score(FREQS, NORMS)
    lam = float(np.float32((30 + 1.0) / (1000 + 1.0)))
    avgfl = 50.0
    for i, (f, n) in enumerate(zip(FREQS, NORMS)):
        dl = _dl(n)
        tfn = f * math.log2(1 + avgfl / dl)
        exp = -math.log(lam / (tfn + lam))
        assert got[i] == pytest.approx(exp, rel=1e-12)
    assert np.all(got >= 0)


def test_dfi_zero_below_expected():
    s = DFI().scorer(1.0, TS, STATS, dtype=np.float64)
    # giant doc (norm 255 -> huge length): expected >> freq -> score 0
    assert s.score(np.array([1]), np.array([255]))[0] == 0.0
    # tiny doc, freq above expected -> positive chi^2 score
    v = s.score(np.array([10]), np.array([5]))[0]
    dl = _dl(5)
    expected = (120 + 1.0) * dl / (50_000 + 1.0)
    chi2 = (10 - expected) ** 2 / expected
    assert v == pytest.approx(math.log2(chi2 + 1), rel=1e-12)


def test_axiomatic_reference():
    s = AxiomaticF2EXP().scorer(1.0, TS, STATS, dtype=np.float64)
    got = s.score(FREQS, NORMS)
    for i, (f, n) in enumerate(zip(FREQS, NORMS)):
        dl = _dl(n)
        tfln = f / (f + 0.35 + 0.35 * dl / 50.0)
        exp = max(0.0, tfln * ((1000 + 1.0) / 30) ** 0.35)
        assert got[i] == pytest.approx(exp, rel=1e-12)
    assert np.all(got >= 0)


def test_multi_similarity_sums_subscores():
    m = MultiSimilarity([BM25(), Classic()]).scorer(1.0, TS, STATS, dtype=np.float32)
    a = BM25().scorer(1.0, TS, STATS, dtype=np.float32).score(FREQS, NORMS)
    b = Classic().scorer(1.0, TS, STATS, dtype=np.float32).score(FREQS, NORMS)
    got = m.score(FREQS, NORMS)
    assert np.array_equal(got, (a + b).astype(np.float32))


@pytest.mark.parametrize(
    "sim",
    [BM25(), Classic(), LMDirichlet(), LMJelinekMercer(), DFR(), IB(), DFI(),
     AxiomaticF2EXP(), MultiSimilarity([BM25(), DFR()])],
)
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


@pytest.mark.parametrize(
    "sim",
    [
        DFR(basic_model="if"), DFR(basic_model="in"), DFR(basic_model="ine"),
        DFR(after_effect="l"), DFR(normalization="h1"),
        DFR(normalization="h3"), DFR(normalization="z"),
        IB(distribution="spl"), IB(lam="ttf"), IB(normalization="h1"),
        DFI(independence="standardized"), DFI(independence="saturated"),
    ],
)
def test_component_variants_properties(sim):
    """Every configurable DFR/IB/DFI component combination keeps the
    BaseSimilarityTestCase contract: finite, >= 0, freq-monotone."""
    s = sim.scorer(1.0, TS, STATS, dtype=np.float32)
    freqs = np.arange(1, 200)
    by_freq = s.score(freqs, np.full(len(freqs), 60))
    assert np.all(np.isfinite(by_freq)) and np.all(by_freq >= 0)
    assert np.all(np.diff(by_freq) >= -1e-6)


def test_dfr_basic_model_in_reference():
    s = DFR(basic_model="in").scorer(1.0, TS, STATS, dtype=np.float64)
    got = s.score(FREQS, NORMS)
    A = math.log2((1000 + 1) / (30 + 0.5))
    ae = (120 + 2.0) / (30 + 1.0)
    for i, (f, n) in enumerate(zip(FREQS, NORMS)):
        dl = _dl(n)
        tfn = f * math.log2(1 + 50.0 / dl)
        exp = A * ae * (1 - 1 / (1 + tfn))
        assert got[i] == pytest.approx(exp, rel=1e-12)


def test_ib_spl_reference():
    s = IB(distribution="spl").scorer(1.0, TS, STATS, dtype=np.float64)
    got = s.score(FREQS, NORMS)
    lam = float(np.float32((30 + 1.0) / (1000 + 1.0)))
    for i, (f, n) in enumerate(zip(FREQS, NORMS)):
        dl = _dl(n)
        tfn = f * math.log2(1 + 50.0 / dl)
        q = 1 - 1 / (tfn + 1)
        exp = -math.log((lam ** q - lam) / (1 - lam))
        assert got[i] == pytest.approx(exp, rel=1e-10)
    assert np.all(np.isfinite(got))
