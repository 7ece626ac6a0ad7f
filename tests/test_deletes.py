"""Delete (tombstone) semantics: deleted docs never match, stats unchanged
until expunge (Lucene PendingDeletes / SegmentMerger behavior)."""

import numpy as np
import pytest

from lucene_spark.build import IndexConfig, build_index
from lucene_spark.query import PhraseQuery, TermQuery, bool_query
from lucene_spark.search import Searcher

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from oracle import BruteForceIndex, make_corpus


@pytest.fixture(scope="module")
def corpus():
    return make_corpus(300, ["the", "spark", "merge", "red", "blue"], seed=7)


@pytest.fixture(scope="module")
def built(spark, corpus):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    idx = build_index(
        df, IndexConfig(seg_size=64, with_positions=True),
        content_col="text", doc_id_col="doc_id", auto_seg_size=False, eager=True,
    )
    yield idx
    idx.unpersist()


def _ids(df):
    return [int(r["doc_id"]) for r in df.collect()]


def test_deleted_docs_never_match_all_paths(spark, built, corpus, monkeypatch):
    base = Searcher(built, dtype=np.float32)
    top = base.search(TermQuery(term="spark"), 5, prune=False).collect()
    victim = int(top[0]["doc_id"])

    deleted = built.delete_docs([victim])
    s = Searcher(deleted, dtype=np.float32)

    # unpruned
    got = _ids(s.search(TermQuery(term="spark"), 5, prune=False))
    assert victim not in got
    # scores of surviving docs unchanged (stats still include the deleted doc)
    exp_rest = [
        (int(r["doc_id"]), np.float32(r["score"])) for r in top if int(r["doc_id"]) != victim
    ]
    got_sc = [
        (int(r["doc_id"]), np.float32(r["score"]))
        for r in s.search(TermQuery(term="spark"), 4, prune=False).collect()
    ]
    assert got_sc == exp_rest[:4]
    # pruned (WAND) path
    assert victim not in _ids(s.search(TermQuery(term="spark"), 5, prune=True))
    # hot driver path
    monkeypatch.setenv("LUCENE_SPARK_HOT_CACHE_POSTINGS", "1000000")
    s2 = Searcher(deleted, dtype=np.float32)
    rows = s2.top_docs(TermQuery(term="spark"), 5)
    assert victim not in [d for d, _ in rows]
    assert rows[:4] == [(d, pytest.approx(float(v))) for d, v in got_sc]
    # phrase + boolean
    q = bool_query(should=[TermQuery(term="spark"), TermQuery(term="merge")])
    assert victim not in _ids(s.search(q, 10, prune=False))
    assert s.count(TermQuery(term="spark")) == base.count(TermQuery(term="spark")) - 1


def test_expunge_rebuilds_stats(spark, built, corpus):
    victims = [0, 1, 2]
    deleted = built.delete_docs(victims)
    ex = deleted.expunge_deletes()
    ex.postings.persist()
    assert ex.stats.doc_count == built.stats.doc_count - 3
    assert ex.deletes is None
    # equals a fresh build over the surviving corpus
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus) if i not in victims],
        "doc_id long, text string",
    )
    fresh = build_index(
        df, IndexConfig(seg_size=64 * 8, with_positions=True),
        content_col="text", doc_id_col="doc_id", auto_seg_size=False,
    )
    t_ex = {r["term"]: (r["doc_freq"], r["total_term_freq"]) for r in ex.terms.collect()}
    t_fr = {r["term"]: (r["doc_freq"], r["total_term_freq"]) for r in fresh.terms.collect()}
    assert t_ex == t_fr
    assert ex.stats.sum_total_term_freq == fresh.stats.sum_total_term_freq
    # post-expunge scoring equals the fresh index's scoring
    s_ex, s_fr = Searcher(ex, dtype=np.float32), Searcher(fresh, dtype=np.float32)
    for q in (TermQuery(term="spark"), PhraseQuery(terms=("red", "blue"))):
        a = [(int(r["doc_id"]), np.float32(r["score"])) for r in s_ex.search(q, 10, prune=False).collect()]
        b = [(int(r["doc_id"]), np.float32(r["score"])) for r in s_fr.search(q, 10, prune=False).collect()]
        assert a == b
    ex.postings.unpersist()


def test_delete_accumulates_and_accepts_dataframe(spark, built):
    d1 = built.delete_docs([5])
    d2 = d1.delete_docs(spark.createDataFrame([(6,)], "doc_id long"))
    assert sorted(r["doc_id"] for r in d2.deletes.collect()) == [5, 6]
