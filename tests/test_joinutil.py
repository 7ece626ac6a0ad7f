"""JoinUtil term join vs a brute-force oracle (join/JoinUtil.java:90-139,
TermsWithScoreCollector.java, TermsIncludingScoreQuery.java)."""

import numpy as np
import pytest

from lucene_spark.build import IndexConfig, build_index
from lucene_spark.functions.joinutil import term_join
from lucene_spark.query import TermQuery
from lucene_spark.search import Searcher

import os, sys
sys.path.insert(0, os.path.dirname(__file__))
from oracle import BruteForceIndex, make_corpus

f32 = np.float32


@pytest.fixture(scope="module")
def idxs(spark):
    n = 150
    texts = make_corpus(n, ["red", "blue", "green", "spark"], seed=41)
    cats = [None if i % 17 == 0 else f"c{i % 7}" for i in range(n)]
    tags = [[f"c{i % 7}", f"c{(i + 1) % 7}"] if i % 3 else [] for i in range(n)]
    df = spark.createDataFrame(
        [(i, t, c, g) for i, (t, c, g) in enumerate(zip(texts, cats, tags))],
        "doc_id long, text string, cat string, tags array<string>",
    )
    idx = build_index(
        df, IndexConfig(seg_size=64, store_cols=("cat", "tags")),
        content_col="text", doc_id_col="doc_id",
        auto_seg_size=False, eager=True,
    )
    yield {
        "s": Searcher(idx, dtype=np.float32),
        "o": BruteForceIndex(texts),
        "cats": cats, "tags": tags, "n": n,
    }
    idx.unpersist()


def brute_join(oracle, cats, mode, term="red"):
    child = oracle.score_term(term)
    per_val = {}
    for d in sorted(child):
        v = cats[d] if cats[d] is not None else ""
        sc = f32(child[d])
        if v not in per_val:
            per_val[v] = (sc, 1)
        else:
            cur, cnt = per_val[v]
            if mode in ("total", "avg"):
                cur = f32(cur + sc)
            elif mode == "min":
                cur = min(cur, sc)
            elif mode == "max":
                cur = max(cur, sc)
            per_val[v] = (cur, cnt + 1)
    out = {}
    for v, (s, c) in per_val.items():
        if mode == "avg":
            s = f32(s / f32(c))
        out[v] = f32(1.0) if mode == "none" else s
    return out


def _got(df):
    return {int(r["doc_id"]): np.float32(r["score"]) for r in df.collect()}


@pytest.mark.parametrize("mode", ["none", "avg", "max", "total", "min"])
def test_self_join_on_cat(idxs, mode):
    s, o, cats = idxs["s"], idxs["o"], idxs["cats"]
    per_val = brute_join(o, cats, mode)
    exp = {
        d: per_val[cats[d] if cats[d] is not None else ""]
        for d in range(idxs["n"])
        if (cats[d] if cats[d] is not None else "") in per_val
    }
    got = _got(term_join(s, "cat", TermQuery(term="red"), s, "cat", mode))
    assert got == exp


def test_multivalued_from_field(idxs):
    s, o, tags, cats = idxs["s"], idxs["o"], idxs["tags"], idxs["cats"]
    child = o.score_term("blue")
    per_val = {}
    for d in sorted(child):
        vs = tags[d] if tags[d] else [""]
        for v in vs:
            sc = f32(child[d])
            per_val[v] = max(per_val.get(v, f32(-np.inf)), sc)
    exp = {
        d: per_val[cats[d] if cats[d] is not None else ""]
        for d in range(idxs["n"])
        if (cats[d] if cats[d] is not None else "") in per_val
    }
    got = _got(term_join(s, "tags", TermQuery(term="blue"), s, "cat", "max"))
    assert got == exp


def test_multivalued_to_field_raises(idxs):
    with pytest.raises(NotImplementedError):
        term_join(idxs["s"], "cat", TermQuery(term="red"), idxs["s"], "tags")


def test_unknown_mode_raises(idxs):
    with pytest.raises(ValueError):
        term_join(idxs["s"], "cat", TermQuery(term="red"), idxs["s"], "cat",
                  "median")
