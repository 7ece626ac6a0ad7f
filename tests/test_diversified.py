"""Diversified top-k vs (a) a literal transcription of the reference's
greedy PQ algorithm (misc/search/DiversifiedTopDocsCollector.java:101-157)
run over the brute-force scores, and (b) the batch per-key-top-M rule —
proving the documented equivalence on randomized inputs."""

import numpy as np
import pytest

from lucene_spark.build import IndexConfig, build_index
from lucene_spark.query import TermQuery
from lucene_spark.search import Searcher

import os, sys
sys.path.insert(0, os.path.dirname(__file__))
from oracle import BruteForceIndex, make_corpus

f32 = np.float32


def greedy_reference(stream, n, m):
    """Literal port of DiversifiedTopDocsCollector.insert: stream of
    (doc, score, key) in doc order; PQ weakest = (lower score, higher
    doc)."""

    def weaker(a, b):  # a weaker than b
        if a[1] == b[1]:
            return a[0] > b[0]
        return a[1] < b[1]

    glob: list = []  # plain list; smallness is fine for tests
    perkey: dict = {}

    def gmin():
        return min(glob, key=lambda x: (x[1], -x[0]))

    for doc, score, key in stream:
        add = (doc, float(score), key)
        if len(glob) >= n and weaker(add, gmin()):
            continue
        kq = perkey.setdefault(key, [])
        if len(kq) >= m:
            weakest = min(kq, key=lambda x: (x[1], -x[0]))
            if weaker(add, weakest):
                continue
            kq.remove(weakest)
            glob.remove(weakest)
            kq.append(add)
            glob.append(add)
            continue
        kq.append(add)
        glob.append(add)
        if len(glob) > n:
            w = gmin()
            glob.remove(w)
            perkey[w[2]].remove(w)
    return sorted(glob, key=lambda x: (-x[1], x[0]))


def batch_rule(stream, n, m):
    perkey: dict = {}
    for doc, score, key in stream:
        perkey.setdefault(key, []).append((doc, float(score)))
    pool = []
    for key, lst in perkey.items():
        lst.sort(key=lambda x: (-x[1], x[0]))
        pool.extend(lst[:m])
    pool.sort(key=lambda x: (-x[1], x[0]))
    return pool[:n]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("n,m", [(5, 1), (8, 2), (10, 3)])
def test_greedy_equals_batch_rule(seed, n, m):
    rng = np.random.default_rng(seed)
    docs = np.arange(200)
    scores = rng.choice([0.5, 1.0, 1.5, 2.0, 2.5], size=200)  # many ties
    keys = rng.integers(0, 9, size=200)
    stream = list(zip(docs.tolist(), scores.tolist(), keys.tolist()))
    g = [(d, s) for d, s, _k in greedy_reference(stream, n, m)]
    assert g == batch_rule(stream, n, m)


@pytest.fixture(scope="module")
def div(spark):
    texts = make_corpus(150, ["red", "blue", "spark", "the"], seed=61)
    df = spark.createDataFrame(
        [(i, t, i % 6) for i, t in enumerate(texts)],
        "doc_id long, text string, grp long",
    )
    idx = build_index(
        df, IndexConfig(seg_size=64, with_positions=False,
                        store_cols=("grp",)),
        content_col="text", doc_id_col="doc_id",
        auto_seg_size=False, eager=True,
    )
    yield {"s": Searcher(idx, dtype=np.float32), "o": BruteForceIndex(texts)}
    idx.unpersist()


@pytest.mark.parametrize("m", [1, 2])
def test_diversified_matches_greedy_reference(div, m):
    s, o = div["s"], div["o"]
    child = o.score_term("red")
    stream = [(d, float(child[d]), d % 6) for d in sorted(child)]
    exp = [(d, f32(sc)) for d, sc, _k in greedy_reference(stream, 10, m)]
    got = [
        (int(r["doc_id"]), f32(r["score"]))
        for r in s.diversified_topk(
            TermQuery(term="red"), 10, m, key_expr="grp"
        ).collect()
    ]
    assert got == exp


def test_diversified_null_key_collects_under_zero(div, spark):
    s = div["s"]
    got = s.diversified_topk(
        TermQuery(term="red"), 10, 1, key_expr="CASE WHEN grp < 3 THEN NULL ELSE grp END"
    ).collect()
    # keys {0(null-merged),3,4,5} -> at most 4 rows with max_per_key=1
    assert 0 < len(got) <= 4
