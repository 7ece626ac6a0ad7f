"""Brute-force reference scorer for tests: independent, doc-at-a-time,
pure-pandas implementation of Lucene's BM25 top-k semantics
(CheckHits-style re-derivation — test-framework/.../CheckHits.java:76-300).

Deliberately NOT using the engine's decode/join machinery: only the analyzer
(validated against reference test expectations) and SmallFloat (validated
against the spec table) are shared.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from lucene_spark.analysis import code_analyze, standard_analyze
from lucene_spark.smallfloat import byte4_to_int, int_to_byte4


def f32(x) -> np.float32:
    return np.float32(x)


class BruteForceIndex:
    def __init__(self, contents: Sequence[str], chain: str = "standard",
                 k1: float = 1.2, b: float = 0.75):
        analyze = standard_analyze if chain == "standard" else code_analyze
        self.k1, self.b = k1, b
        self.tfs: List[Counter] = []
        self.norms: List[int] = []
        self.positions: List[Dict[str, List[int]]] = []
        total = 0
        for text in contents:
            toks = analyze(text)
            self.tfs.append(Counter(toks))
            self.norms.append(int(int_to_byte4(len(toks))))
            pos: Dict[str, List[int]] = {}
            for i, t in enumerate(toks):
                pos.setdefault(t, []).append(i)
            self.positions.append(pos)
            total += len(toks)
        self.doc_count = len(contents)
        self.sum_ttf = total
        self.avgdl = f32(self.sum_ttf / float(self.doc_count))
        self.cache = self._norm_cache()

    def _norm_cache(self) -> np.ndarray:
        lt = byte4_to_int(np.arange(256)).astype(np.float32)
        k1, b = f32(self.k1), f32(self.b)
        return (f32(1.0) / (k1 * ((f32(1.0) - b) + b * lt / self.avgdl))).astype(np.float32)

    def idf(self, term: str) -> np.float32:
        n = sum(1 for tf in self.tfs if term in tf)
        return f32(math.log(1.0 + (self.doc_count - n + 0.5) / (n + 0.5)))

    def doc_freq(self, term: str) -> int:
        return sum(1 for tf in self.tfs if term in tf)

    def score_term(self, term: str, boost: float = 1.0) -> Dict[int, np.float32]:
        w = f32(boost) * self.idf(term)
        out = {}
        for d, tf in enumerate(self.tfs):
            if term in tf:
                inv = self.cache[self.norms[d]]
                out[d] = w - w / (f32(1.0) + f32(tf[term]) * inv)
        return out

    def score_bool(
        self,
        must: Sequence[str] = (),
        should: Sequence[str] = (),
        must_not: Sequence[str] = (),
        filters: Sequence[str] = (),
        msm: int = 0,
    ) -> Dict[int, np.float32]:
        """Sum per-clause float scores in double, cast f32 at the end
        (DisjunctionSumScorer semantics)."""
        m_scores = [self.score_term(t) for t in must]
        s_scores = [self.score_term(t) for t in should]
        out: Dict[int, np.float32] = {}
        for d in range(self.doc_count):
            if any(d not in sc for sc in m_scores):
                continue
            n_should = sum(1 for sc in s_scores if d in sc)
            if must:
                if msm > 0 and n_should < msm:
                    continue
            else:
                if n_should < max(msm, 1):
                    continue
            if any(t in self.tfs[d] for t in must_not):
                continue
            if any(t not in self.tfs[d] for t in filters):
                continue
            total = 0.0
            for sc in m_scores + s_scores:
                if d in sc:
                    total += float(sc[d])
            out[d] = f32(total)
        return out

    def score_phrase(self, terms: Sequence[str], boost: float = 1.0,
                     slop: int = 0) -> Dict[int, np.float32]:
        idf_total = 0.0
        for t in terms:
            idf_total += float(self.idf(t))
        w = f32(boost) * f32(idf_total)
        out = {}
        for d in range(self.doc_count):
            pos = self.positions[d]
            if any(t not in pos for t in terms):
                continue
            if slop == 0:
                cands = set(pos[terms[0]])
                for i, t in enumerate(terms[1:], 1):
                    cands &= {p - i for p in pos[t]}
                freq = float(len(cands))
            else:
                adj = [[p - i for p in pos[t]] for i, t in enumerate(terms)]
                freq = _sloppy_phrase_freq(adj, slop)
            if freq:
                inv = self.cache[self.norms[d]]
                out[d] = w - w / (f32(1.0) + f32(freq) * inv)
        return out

    def _freq_score(self, freqs: Dict[int, int], idf_terms, boost: float):
        w = f32(boost) * f32(sum(float(self.idf(t)) for t in idf_terms))
        out = {}
        for d, freq in freqs.items():
            if freq:
                inv = self.cache[self.norms[d]]
                out[d] = w - w / (f32(1.0) + f32(freq) * inv)
        return out

    def score_multi_phrase(self, slots, boost: float = 1.0) -> Dict[int, np.float32]:
        freqs = {}
        for d in range(self.doc_count):
            pos = self.positions[d]
            cands = None
            ok = True
            for off, alts in enumerate(slots):
                slot_pos = set()
                for t in alts:
                    slot_pos |= {p - off for p in pos.get(t, ())}
                if not slot_pos:
                    ok = False
                    break
                cands = slot_pos if cands is None else cands & slot_pos
            if ok and cands:
                freqs[d] = len([c for c in cands if c >= 0])
        # Lucene's Weight skips docFreq-0 terms (termStatistics returns null)
        idf_terms = [t for s in slots for t in s if self.doc_freq(t) > 0]
        return self._freq_score(freqs, idf_terms, boost)

    def score_span_near(self, terms, slop: int, in_order: bool,
                        boost: float = 1.0) -> Dict[int, np.float32]:
        freqs = {}
        for d in range(self.doc_count):
            pos = self.positions[d]
            if any(t not in pos for t in terms):
                continue
            lists = [pos[t] for t in terms]
            f = (
                _near_spans_ordered_freq(lists, slop)
                if in_order
                else _near_spans_unordered_freq(lists, slop)
            )
            if f:
                freqs[d] = f
        return self._freq_score(freqs, terms, boost)

    @staticmethod
    def topk(scores: Dict[int, np.float32], k: int) -> List[Tuple[int, float]]:
        """ties broken by ascending doc_id (TopScoreDocCollector.java:27-29)."""
        items = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(d, float(s)) for d, s in items[:k]]


def _sloppy_phrase_freq(adj_lists, slop: int) -> float:
    """Literal transcription of SloppyPhraseMatcher.nextMatch for the
    no-repeats case (search/SloppyPhraseMatcher.java): a priority queue of
    adjusted positions (pos - slot), ties by slot (PhraseQueue's offset
    order); each emitted match adds sloppyWeight = 1/(1+matchLength)."""
    import heapq

    iters = [list(a) for a in adj_lists]
    at = [0] * len(iters)
    pq = [(arr[0], i) for i, arr in enumerate(iters)]
    end = max(p for p, _ in pq)
    heapq.heapify(pq)
    freq = 0.0
    pp_pos, pp_i = heapq.heappop(pq)
    match_length = end - pp_pos
    next_pos = pq[0][0]
    while True:
        at[pp_i] += 1
        if at[pp_i] >= len(iters[pp_i]):  # advancePP failed: final check
            if match_length <= slop:
                freq += 1.0 / (1.0 + match_length)
            return freq
        pp_pos = iters[pp_i][at[pp_i]]
        end = max(end, pp_pos)
        if pp_pos > next_pos:
            heapq.heappush(pq, (pp_pos, pp_i))
            if match_length <= slop:
                freq += 1.0 / (1.0 + match_length)
            pp_pos, pp_i = heapq.heappop(pq)
            next_pos = pq[0][0]
            match_length = end - pp_pos
        else:
            match_length = min(match_length, end - pp_pos)


def _near_spans_ordered_freq(lists, slop: int) -> float:
    """Literal NearSpansOrdered (search/spans/NearSpansOrdered.java):
    advance clause 0 one position at a time; stretchToOrder with monotone
    forward-only sub-iterators; match iff accumulated gap width <= slop;
    SpanScorer adds 1/(1 + (endPosition - startPosition)) per match."""
    n = len(lists)
    ptr = [0] * n
    freq = 0.0
    while ptr[0] < len(lists[0]):
        start = lists[0][ptr[0]]
        prev_end = start + 1
        width = 0
        for i in range(1, n):
            while ptr[i] < len(lists[i]) and lists[i][ptr[i]] < prev_end:
                ptr[i] += 1
            if ptr[i] >= len(lists[i]):
                return freq  # oneExhaustedInCurrentDoc: enumeration over
            width += lists[i][ptr[i]] - prev_end
            prev_end = lists[i][ptr[i]] + 1
        if width <= slop:
            freq += 1.0 / (1.0 + (prev_end - start))
        ptr[0] += 1
    return freq


def _near_spans_unordered_freq(lists, slop: int) -> float:
    """Literal NearSpansUnordered: check the current state (min start vs max
    end over all clause iterators), then advance the min-start clause;
    repeat until one clause exhausts. totalSpanLength = n for term spans."""
    n = len(lists)
    ptr = [0] * n
    cur = [lists[i][0] for i in range(n)]
    max_end = max(cur) + 1
    freq = 0.0
    while True:
        mi = min(range(n), key=lambda i: (cur[i], i))
        ml = max_end - cur[mi]
        if ml - n <= slop:
            freq += 1.0 / (1.0 + ml)
        ptr[mi] += 1
        if ptr[mi] >= len(lists[mi]):
            return freq
        cur[mi] = lists[mi][ptr[mi]]
        max_end = max(max_end, cur[mi] + 1)


def make_corpus(n_docs: int, vocab: Sequence[str], seed: int = 42,
                min_len: int = 1, max_len: int = 60) -> List[str]:
    """Seeded random corpus with Zipf-ish term frequencies (RandomIndexWriter
    style)."""
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    p = 1.0 / ranks**1.1
    p /= p.sum()
    docs = []
    for _ in range(n_docs):
        L = int(rng.integers(min_len, max_len + 1))
        words = rng.choice(len(vocab), size=L, p=p)
        docs.append(" ".join(vocab[w] for w in words))
    return docs
