"""MemoryIndex — the reference's single-document in-RAM index
(memory/src/java/org/apache/lucene/index/memory/MemoryIndex.java): index
ONE document on the driver, score queries against it with zero Spark jobs.
The reference uses it for percolation and one-off explain/match checks;
the streaming Monitor covers percolation at scale, this covers the
standalone API.

Parity contract: ``MemoryIndex(text).search(q)`` equals the score a
``Searcher`` over a one-document index assigns that doc (and 0.0 when the
doc does not match) — the collection stats are the single doc's
(docCount=1, avgdl=doc length), exactly like the reference's
MemoryIndexReader. The scoring reuses the engine's own similarity objects
and the matchers kernels with n_docs=1, so f32 op order is identical by
construction; equality is pinned by tests/test_memoryindex.py against a
real one-doc Searcher.

Supported operators: Term, Boolean (all occurs + minimum_should_match),
Phrase (exact/slop/repeats), MultiPhrase (+slop), Synonym, DisMax,
ConstantScore, Boost via each query's boost, MatchAll/MatchNone, and the
MultiTermQuery family (Prefix/Wildcard/Regexp/Fuzzy/TermRange/TermInSet,
constant-score like the engine). Span/interval/feature queries raise
NotImplementedError (use a Searcher)."""

from __future__ import annotations

import re
from typing import Dict, List, Optional

import numpy as np

from .analysis import LANG_CHAINS, _chain_fn, _resolve_chain
from .bm25 import B_DEFAULT, K1_DEFAULT, CollectionStats
from .query import (
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    MultiPhraseQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    rewrite,
)
from .smallfloat import int_to_byte4


class MemoryIndex:
    def __init__(
        self,
        text: str,
        chain: str = "standard",
        similarity=None,
        k1: float = K1_DEFAULT,
        b: float = B_DEFAULT,
        dtype=np.float32,
    ):
        from .similarities import BM25

        fn = _chain_fn(_resolve_chain(chain)[0])
        toks = fn(text or "")
        if _resolve_chain(chain)[0] in LANG_CHAINS:
            from .lang import STOP_HOLE

            pairs = [(t, p) for p, t in enumerate(toks) if t != STOP_HOLE]
        else:
            pairs = list(enumerate(toks))
            pairs = [(t, p) for p, t in pairs]
        self.positions: Dict[str, np.ndarray] = {}
        for t, p in pairs:
            self.positions.setdefault(t, []).append(p)  # type: ignore[arg-type]
        self.positions = {
            t: np.asarray(ps, dtype=np.int64) for t, ps in self.positions.items()
        }
        self.length = len(pairs)
        self.norm = int(int_to_byte4(np.array([self.length]))[0])
        self.stats = CollectionStats(
            doc_count=1, sum_total_term_freq=self.length
        )
        self.sim = similarity or BM25(k1=k1, b=b)
        self.dtype = dtype

    # ---------------- public API ----------------

    def search(self, q: Query) -> float:
        """The one doc's score for ``q`` (0.0 when it does not match) —
        IndexSearcher.search over the reference MemoryIndex."""
        score = self._eval(rewrite(q))
        return float(score) if score is not None else 0.0

    def matches(self, q: Query) -> bool:
        return self._eval(rewrite(q)) is not None

    # ---------------- internals ----------------

    def _freq(self, term: str) -> int:
        ps = self.positions.get(term)
        return 0 if ps is None else len(ps)

    def _scorer(self, boost: float, doc_freq: int, ttf: int):
        from .similarities import TermStatsIn

        return self.sim.scorer(
            boost, TermStatsIn(doc_freq, ttf), self.stats, self.dtype
        )

    def _multi_scorer(self, boost: float, terms: List[str]):
        from .similarities import TermStatsIn

        return self.sim.multi_scorer(
            boost,
            [TermStatsIn(1, self._freq(t)) for t in terms],
            self.stats,
            self.dtype,
        )

    def _score1(self, scorer, freq: float) -> float:
        return float(
            scorer.score(
                np.asarray([freq], np.float64), np.asarray([self.norm], np.int64)
            )[0]
        )

    def _eval(self, q: Query) -> Optional[float]:
        """Score or None (no match) — mirrors Searcher._eval semantics."""
        if isinstance(q, TermQuery):
            f = self._freq(q.term)
            if f == 0:
                return None
            return self._score1(self._scorer(q.boost, 1, f), f)
        if isinstance(q, BooleanQuery):
            return self._eval_bool(q)
        if isinstance(q, PhraseQuery):
            return self._eval_phrase(list(q.terms), int(q.slop), q.boost)
        if isinstance(q, MultiPhraseQuery):
            return self._eval_multi_phrase(q)
        if isinstance(q, SynonymQuery):
            present = [t for t in q.terms if self._freq(t)]
            if not present:
                return None
            # one pseudo-term: max docFreq for idf, summed tf
            # (search/SynonymQuery.java) — single doc: df 1, ttf max
            f = sum(self._freq(t) for t in present)
            scorer = self._scorer(
                q.boost, 1, max(self._freq(t) for t in present)
            )
            return self._score1(scorer, f)
        if isinstance(q, DisjunctionMaxQuery):
            scores = [self._eval(d) for d in q.disjuncts]
            scores = [s for s in scores if s is not None]
            if not scores:
                return None
            mx, sm = max(scores), sum(scores)
            return (mx + float(q.tie_breaker) * (sm - mx)) * float(q.boost)
        if isinstance(q, ConstantScoreQuery):
            if self._eval(q.query) is None:
                return None
            return float(np.float32(q.boost))
        if isinstance(q, MatchAllDocsQuery):
            return float(np.float32(q.boost))
        if isinstance(q, MatchNoDocsQuery):
            return None
        if isinstance(
            q,
            (PrefixQuery, WildcardQuery, RegexpQuery, FuzzyQuery,
             TermRangeQuery, TermInSetQuery),
        ):
            # CONSTANT_SCORE_REWRITE over the doc's own vocabulary
            if any(self._multi_term_match(q, t) for t in self.positions):
                return float(np.float32(q.boost))
            return None
        raise NotImplementedError(
            f"MemoryIndex does not evaluate {type(q).__name__}; use a Searcher"
        )

    def _eval_bool(self, q: BooleanQuery) -> Optional[float]:
        must = [c.query for c in q.clauses if c.occur == Occur.MUST]
        should = [c.query for c in q.clauses if c.occur == Occur.SHOULD]
        filters = [c.query for c in q.clauses if c.occur == Occur.FILTER]
        must_not = [c.query for c in q.clauses if c.occur == Occur.MUST_NOT]
        total = 0.0
        for sq in must:
            s = self._eval(sq)
            if s is None:
                return None
            total += s
        n_should = 0
        for sq in should:
            s = self._eval(sq)
            if s is not None:
                total += s
                n_should += 1
        msm = q.minimum_should_match
        if must:
            if msm > 0 and n_should < msm:
                return None
        elif should:
            if n_should < max(msm, 1):
                return None
        elif filters:
            total = 1.0  # filter-only boolean: constant score
        else:
            return None
        for sq in filters:
            if self._eval(sq) is None:
                return None
        for nq in must_not:
            if self._eval(nq) is not None:
                return None
        return total * float(q.boost)

    def _eval_phrase(
        self, terms: List[str], slop: int, boost: float
    ) -> Optional[float]:
        from . import matchers

        if any(self._freq(t) == 0 for t in terms):
            return None
        pbt = {t: [self.positions[t]] for t in set(terms)}
        if slop == 0:
            freq = float(matchers.exact_phrase_freqs(pbt, terms, 1)[0])
        else:
            freq = float(matchers.sloppy_phrase_freqs(pbt, terms, slop, 1)[0])
        if freq <= 0:
            return None
        return self._score1(self._multi_scorer(boost, terms), freq)

    def _eval_multi_phrase(self, q: MultiPhraseQuery) -> Optional[float]:
        from . import matchers

        slots = [tuple(s) for s in q.slots]
        all_terms = [t for s in slots for t in s]
        present_slots = [
            tuple(t for t in s if self._freq(t)) for s in slots
        ]
        if any(not s for s in present_slots):
            return None
        pbt = {
            t: [self.positions.get(t)] for t in set(all_terms)
        }
        if int(q.slop) == 0:
            # slot-union offset intersection (Searcher._eval_multi_phrase)
            cands: Optional[np.ndarray] = None
            for off, alts in enumerate(slots):
                ps = [self.positions[t] for t in alts if self._freq(t)]
                slot_pos = np.unique(np.concatenate(ps)) - off
                cands = (
                    slot_pos if cands is None else np.intersect1d(cands, slot_pos)
                )
            freq = float((cands >= 0).sum()) if cands is not None else 0.0
        else:
            freq = float(
                matchers.sloppy_multi_phrase_freqs(pbt, slots, int(q.slop), 1)[0]
            )
        if freq <= 0:
            return None
        # idf over every alternative of every slot (allTermStats), present
        # terms only — mirrors Searcher._eval_multi_phrase
        present_terms = [t for t in all_terms if self._freq(t)]
        return self._score1(self._multi_scorer(q.boost, present_terms), freq)

    def _multi_term_match(self, q: Query, t: str) -> bool:
        if isinstance(q, PrefixQuery):
            return t.startswith(q.prefix)
        if isinstance(q, WildcardQuery):
            pat, i = "", 0
            while i < len(q.pattern):
                ch = q.pattern[i]
                if ch == "\\" and i + 1 < len(q.pattern):
                    pat += re.escape(q.pattern[i + 1])
                    i += 2
                    continue
                pat += ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
                i += 1
            return re.fullmatch(pat, t) is not None
        if isinstance(q, RegexpQuery):
            from .regexp import compile_lucene_regexp

            return bool(compile_lucene_regexp(q.regexp).match_batch([t])[0])
        if isinstance(q, TermRangeQuery):
            if q.lower is not None:
                if t < q.lower or (t == q.lower and not q.include_lower):
                    return False
            if q.upper is not None:
                if t > q.upper or (t == q.upper and not q.include_upper):
                    return False
            return True
        if isinstance(q, TermInSetQuery):
            return t in q.terms
        if isinstance(q, FuzzyQuery):
            pl = int(getattr(q, "prefix_length", 0) or 0)
            if abs(len(t) - len(q.term)) > q.max_edits:
                return False
            if pl > 0 and not t.startswith(q.term[:pl]):
                return False
            if getattr(q, "transpositions", True):
                from .editdist import osa_distances

                return bool(osa_distances([t], q.term)[0] <= q.max_edits)
            return _levenshtein(t, q.term) <= q.max_edits
        raise NotImplementedError(type(q).__name__)


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]
