"""TermAutomatonQuery vs equivalent queries and a brute-force token-scan
oracle (sandbox/search/TermAutomatonQuery.java, TermAutomatonScorer.java:
221-345)."""

import numpy as np
import pytest

from lucene_spark.build import IndexConfig, build_index
from lucene_spark.query import (
    MultiPhraseQuery,
    PhraseQuery,
    TermAutomatonQuery,
)
from lucene_spark.search import Searcher

import os, sys
sys.path.insert(0, os.path.dirname(__file__))
from oracle import BruteForceIndex, make_corpus

f32 = np.float32


@pytest.fixture(scope="module")
def ta(spark):
    texts = make_corpus(200, ["fast", "slow", "table", "scan", "the"],
                        seed=81, min_len=2, max_len=30)
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    idx = build_index(
        df, IndexConfig(seg_size=64, with_positions=True),
        content_col="text", doc_id_col="doc_id",
        auto_seg_size=False, eager=True,
    )
    yield {"texts": texts, "s": Searcher(idx, dtype=np.float32),
           "o": BruteForceIndex(texts)}
    idx.unpersist()


def _got(df):
    return [(int(r["doc_id"]), np.float32(r["score"])) for r in df.collect()]


def test_linear_automaton_equals_phrase(ta):
    s = ta["s"]
    q = TermAutomatonQuery()
    s1 = q.create_state()
    s2 = q.create_state()
    q.add_transition(0, s1, "fast")
    q.add_transition(s1, s2, "table")
    q.set_accept(s2)
    q.finish()
    got = _got(s.search(q, 10))
    exp = _got(s.search(PhraseQuery(terms=("fast", "table")), 10, prune=False))
    assert got == exp and got


def test_synonym_slot_equals_multiphrase(ta):
    s = ta["s"]
    q = TermAutomatonQuery()
    s1 = q.create_state()
    s2 = q.create_state()
    q.add_transition(0, s1, "fast")
    q.add_transition(0, s1, "slow")
    q.add_transition(s1, s2, "table")
    q.set_accept(s2)
    q.finish()
    got = _got(s.search(q, 10))
    exp = _got(s.search(
        MultiPhraseQuery(slots=(("fast", "slow"), ("table",))), 10,
        prune=False,
    ))
    assert got == exp and got


def test_any_gap_automaton_vs_brute_force(ta):
    """fast <ANY> table — one arbitrary token between."""
    s, o = ta["s"], ta["o"]
    q = TermAutomatonQuery()
    s1 = q.create_state()
    s2 = q.create_state()
    s3 = q.create_state()
    q.add_transition(0, s1, "fast")
    q.add_any_transition(s1, s2)
    q.add_transition(s2, s3, "table")
    q.set_accept(s3)
    q.finish()
    got = _got(s.search(q, 200))
    from lucene_spark.analysis import standard_analyze

    idf = np.float64(o.idf("fast")) + np.float64(o.idf("table"))
    w = f32(idf)
    exp = {}
    for d, text in enumerate(ta["texts"]):
        toks = standard_analyze(text)
        freq = sum(
            1 for p in range(len(toks) - 2)
            if toks[p] == "fast" and toks[p + 2] == "table"
        )
        if freq:
            inv = o.cache[o.norms[d]]
            exp[d] = f32(w - w / (f32(1.0) + f32(freq) * inv))
    expected = BruteForceIndex.topk(exp, 200)
    assert got == [(d, f32(v)) for d, v in expected]
    assert got  # non-trivial


def test_leading_any_never_matches(ta):
    """Reference quirk: matches only START on a real term arc from state
    0; an automaton whose first arc is ANY matches nothing."""
    q = TermAutomatonQuery()
    s1 = q.create_state()
    s2 = q.create_state()
    q.add_any_transition(0, s1)
    q.add_transition(s1, s2, "fast")
    q.set_accept(s2)
    q.finish()
    assert ta["s"].search(q, 10).count() == 0


def test_unfinished_raises(ta):
    q = TermAutomatonQuery()
    q.add_transition(0, 1, "fast")
    q.set_accept(1)
    with pytest.raises(ValueError, match="finish"):
        ta["s"].search(q, 10).collect()


def test_token_stream_to_automaton_graph(spark):
    """'ny' with posLength 2 over 'new york' — the sausage accepts either
    path (TokenStreamToTermAutomatonQuery.java)."""
    from lucene_spark.query import token_stream_to_term_automaton

    texts = [
        "i love new york pizza",
        "ny pizza is great",
        "new pizza york",
        "york new pizza",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    idx = build_index(
        df, IndexConfig(seg_size=8, with_positions=True),
        content_col="text", doc_id_col="doc_id",
        auto_seg_size=False, eager=True,
    )
    s = Searcher(idx, dtype=np.float32)
    q = token_stream_to_term_automaton(
        [("ny", 1, 2), ("new", 0, 1), ("york", 1, 1), ("pizza", 1, 1)]
    )
    got = sorted(int(r["doc_id"]) for r in s.search(q, 10).collect())
    # doc 0 matches via the two-term path 'new york' + 'pizza'; doc 1 via
    # the posLength-2 'ny' arc (spans two positions) + 'pizza'
    assert got == [0, 1]
    idx.unpersist()


def test_token_stream_holes_raise():
    from lucene_spark.query import token_stream_to_term_automaton

    with pytest.raises(ValueError, match="holes"):
        token_stream_to_term_automaton([("a", 1, 1), ("b", 2, 1)])
    # preserve_position_increments=False collapses the hole instead
    q = token_stream_to_term_automaton(
        [("a", 1, 1), ("b", 2, 1)], preserve_position_increments=False
    )
    assert q.dfa is not None


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_sausage_equals_multiphrase(ta, seed):
    """Property: automatons built from random 2-3 slot sausages score
    identically to the equivalent MultiPhraseQuery on the shared
    corpus (terms globally distinct — see the idf note below)."""
    import random

    rng = random.Random(seed)
    # globally DISTINCT terms across slots: TermAutomatonQuery sums idf
    # over the automaton's distinct terms (TermAutomatonQuery.java:
    # 378-391) while MultiPhraseQuery counts slot multiplicity — the
    # equivalence only holds without repeats
    vocab = ["fast", "slow", "table", "scan", "the"]
    rng.shuffle(vocab)
    n_slots = rng.choice([2, 3])
    slots = []
    for _ in range(n_slots):
        k = rng.choice([1, 2])
        k = min(k, len(vocab) - (n_slots - len(slots) - 1))
        slots.append(tuple(vocab.pop() for _ in range(max(k, 1))))
    q = TermAutomatonQuery()
    state = 0
    for slot in slots:
        nxt = q.create_state()
        for t in slot:
            q.add_transition(state, nxt, t)
        state = nxt
    q.set_accept(state)
    q.finish()
    got = _got(ta["s"].search(q, 20))
    exp = _got(ta["s"].search(
        MultiPhraseQuery(slots=tuple(slots)), 20, prune=False
    ))
    assert got == exp
