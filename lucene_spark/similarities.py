"""Pluggable similarities (SURVEY.md §2.6): BM25 (default), ClassicSimilarity
(TF-IDF), BooleanSimilarity, LMDirichletSimilarity — each a vectorized
scorer factory over (freq, norm_byte) arrays.

Formula parity (float32 mode mirrors the reference float op order):
- Classic: idf = (float)(log((N+1)/(df+1)) + 1)  [ClassicSimilarity.java:60-64]
  normTable[i] = 1/sqrt(byte4ToInt(i)), normTable[0] = 1/normTable[255]
  [TFIDFSimilarity.java:455-474]; score = tf(freq)*queryWeight*normTable[n]
  with tf = (float)sqrt(freq) [TFIDFScorer.score, ClassicSimilarity.java:42-46]
- Boolean: score = boost, norms ignored [BooleanSimilarity.java]
- LMDirichlet: score = max(0, boost*(ln(1 + freq/(mu*Pc)) + ln(mu/(dl+mu)))),
  Pc = (ttf+1)/(sumTotalTermFreq+1), dl = byte4ToInt(norm), mu = 2000
  [LMDirichletSimilarity.java score(), LMSimilarity.DefaultCollectionModel]
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np

from . import bm25
from .bm25 import CollectionStats
from .smallfloat import LENGTH_TABLE


@dataclass(frozen=True)
class TermStatsIn:
    doc_freq: int
    total_term_freq: int


class Similarity:
    """Factory: per-query-term vectorized scorer."""

    name = "base"

    def scorer(self, boost, ts: TermStatsIn, stats: CollectionStats, dtype=np.float32):
        raise NotImplementedError

    def multi_scorer(
        self, boost, ts_list: Sequence[TermStatsIn], stats: CollectionStats, dtype=np.float32
    ):
        """Blended scorer for phrase/synonym-style groups (sum of idfs where
        the notion applies)."""
        raise NotImplementedError(f"{self.name} has no multi-term blending")


class BM25(Similarity):
    name = "bm25"

    def __init__(self, k1: float = 1.2, b: float = 0.75):
        self.k1, self.b = k1, b

    def scorer(self, boost, ts, stats, dtype=np.float32):
        return bm25.make_scorer(
            boost,
            float(bm25.idf(ts.doc_freq, stats.doc_count, dtype=dtype)),
            stats,
            k1=self.k1,
            b=self.b,
            dtype=dtype,
        )

    def multi_scorer(self, boost, ts_list, stats, dtype=np.float32):
        return bm25.make_scorer(
            boost,
            float(
                bm25.idf_sum([t.doc_freq for t in ts_list], stats.doc_count, dtype=dtype)
            ),
            stats,
            k1=self.k1,
            b=self.b,
            dtype=dtype,
        )


@dataclass(frozen=True)
class _TableScorer:
    """score = tf_fn(freq) * weight * table[norm]."""

    weight: float
    table: np.ndarray
    dtype: type

    def score(self, freq, norm_bytes):
        dt = self.dtype
        f = np.sqrt(np.asarray(freq).astype(dt)).astype(dt)
        nv = self.table[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        return ((f * dt(self.weight)).astype(dt) * nv).astype(dt)

    def max_score(self, impact_freqs, impact_norms):
        if len(impact_freqs) == 0:
            return float("inf")
        return float(self.score(impact_freqs, impact_norms).max())


class Classic(Similarity):
    name = "classic"

    def _idf(self, df: int, n: int, dtype):
        return dtype(np.log((n + 1) / float(df + 1)) + 1.0)

    def _table(self, dtype):
        # built from EXACT decoded ints (TFIDFSimilarity.java:467-471 passes
        # the int length to lengthNorm), unlike BM25/SimilarityBase whose
        # LENGTH_TABLE is float32
        from .smallfloat import byte4_to_int

        lt = byte4_to_int(np.arange(256)).astype(np.float64)
        with np.errstate(divide="ignore"):
            t = (1.0 / np.sqrt(lt)).astype(dtype)
        t[0] = dtype(1.0) / t[255]  # TFIDFSimilarity.java:473
        return t

    def scorer(self, boost, ts, stats, dtype=np.float32):
        idf = self._idf(ts.doc_freq, stats.doc_count, dtype)
        return _TableScorer(
            weight=float(dtype(boost) * idf), table=self._table(dtype), dtype=dtype
        )

    def multi_scorer(self, boost, ts_list, stats, dtype=np.float32):
        total = 0.0
        for t in ts_list:
            total += float(self._idf(t.doc_freq, stats.doc_count, dtype))
        return _TableScorer(
            weight=float(dtype(boost) * dtype(total)),
            table=self._table(dtype),
            dtype=dtype,
        )


@dataclass(frozen=True)
class _ConstScorer:
    weight: float
    dtype: type

    def score(self, freq, norm_bytes):
        return np.full(len(np.asarray(freq)), self.dtype(self.weight), dtype=self.dtype)

    def max_score(self, impact_freqs, impact_norms):
        return float(self.weight)


class Boolean(Similarity):
    name = "boolean"

    def scorer(self, boost, ts, stats, dtype=np.float32):
        return _ConstScorer(weight=float(boost), dtype=dtype)

    def multi_scorer(self, boost, ts_list, stats, dtype=np.float32):
        return _ConstScorer(weight=float(boost), dtype=dtype)


@dataclass(frozen=True)
class _LMDScorer:
    boost: float
    mu: float
    pc: float
    dtype: type

    def score(self, freq, norm_bytes):
        dt = self.dtype
        f = np.asarray(freq).astype(np.float64)
        dl = LENGTH_TABLE.astype(np.float64)[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        s = self.boost * (
            np.log(1.0 + f / (self.mu * self.pc)) + np.log(self.mu / (dl + self.mu))
        )
        return np.maximum(s, 0.0).astype(dt)

    def max_score(self, impact_freqs, impact_norms):
        if len(impact_freqs) == 0:
            return float("inf")
        return float(self.score(impact_freqs, impact_norms).max())


class LMDirichlet(Similarity):
    name = "lmdirichlet"

    def __init__(self, mu: float = 2000.0):
        self.mu = mu

    def scorer(self, boost, ts, stats, dtype=np.float32):
        pc = (ts.total_term_freq + 1.0) / (stats.sum_total_term_freq + 1.0)
        return _LMDScorer(boost=float(boost), mu=self.mu, pc=pc, dtype=dtype)


SIMILARITIES = {
    "bm25": BM25,
    "classic": Classic,
    "boolean": Boolean,
    "lmdirichlet": LMDirichlet,
}
