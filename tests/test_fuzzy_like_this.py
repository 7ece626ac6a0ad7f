"""FuzzyLikeThisQuery vs a literal Python transcription of the
reference's variant selection and scoring
(sandbox/queries/FuzzyLikeThisQuery.java:191-335)."""

import math

import numpy as np
import pytest

from lucene_spark.build import IndexConfig, build_index
from lucene_spark.query import BooleanQuery, ConstantScoreQuery
from lucene_spark.search import Searcher

import os, sys
sys.path.insert(0, os.path.dirname(__file__))
from oracle import make_corpus

f32 = np.float32


def osa(a: str, b: str) -> int:
    from lucene_spark.editdist import osa_distances

    return int(osa_distances([a], b)[0])


@pytest.fixture(scope="module")
def flt(spark):
    vocab = ["spark", "sparks", "sprak", "shark", "table", "tible",
             "cable", "zzz"]
    texts = make_corpus(120, vocab, seed=121)
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    idx = build_index(
        df, IndexConfig(seg_size=32, with_positions=False),
        content_col="text", doc_id_col="doc_id",
        auto_seg_size=False, eager=True,
    )
    s = Searcher(idx, dtype=np.float32)
    terms = {
        r["term"]: int(r["doc_freq"]) for r in idx.terms.collect()
    }
    yield {"s": s, "terms": terms, "n": 120}
    idx.unpersist()


def literal_flt(terms, n_docs, words, max_edits, max_num_terms, cap=50):
    selected = []
    for w in dict.fromkeys(words):
        variants = []
        total_df = 0
        for t, df_t in terms.items():
            d = osa(t, w)
            if d <= max_edits and abs(len(t) - len(w)) <= max_edits:
                sim = f32(1.0) - f32(d) / f32(min(len(w), len(t)))
                variants.append((float(sim), t, df_t))
                total_df += df_t
        if not variants:
            continue
        variants.sort(key=lambda v: (-v[0], v[1]))
        variants = variants[:cap]
        df_w = terms.get(w, 0)
        if df_w == 0:
            df_w = total_df // len([
                t for t, dfx in terms.items()
                if osa(t, w) <= max_edits and abs(len(t) - len(w)) <= max_edits
            ])
        idf = f32(math.log((n_docs + 1) / float(df_w + 1)) + 1.0)
        for sim, t, _df in variants:
            selected.append((float(f32(f32(f32(sim) * f32(sim)) * idf)), t, w))
    selected.sort(key=lambda v: (-v[0], v[1]))
    return selected[:max_num_terms]


def test_variant_selection_and_boosts(flt):
    s = flt["s"]
    q = s.fuzzy_like_this("sprak tible", max_edits=1, max_num_terms=6)
    # flatten the produced clause tree into (boost, term) pairs
    got = []

    def walk(node):
        if isinstance(node, ConstantScoreQuery):
            got.append((node.boost, node.query.term))
        elif isinstance(node, BooleanQuery):
            for c in node.clauses:
                walk(c.query)

    walk(q)
    exp = literal_flt(flt["terms"], flt["n"], ["sprak", "tible"], 1, 6)
    assert sorted(got) == sorted((sc, t) for sc, t, _w in exp)


def test_scores_sum_constant_boosts(flt):
    s = flt["s"]
    q = s.fuzzy_like_this("sprak", max_edits=1, max_num_terms=4)
    hits = {int(r["doc_id"]): f32(r["score"])
            for r in s.matches(q).collect()}
    assert hits
    # every hit's score is a sum of the selected variants' boosts
    boosts = []

    def walk(node):
        if isinstance(node, ConstantScoreQuery):
            boosts.append(f32(node.boost))
        elif isinstance(node, BooleanQuery):
            for c in node.clauses:
                walk(c.query)

    walk(q)
    import itertools

    sums = set()
    for r in range(1, len(boosts) + 1):
        for combo in itertools.combinations(boosts, r):
            sums.add(f32(sum(float(x) for x in combo)))
    assert all(any(abs(float(v) - float(x)) < 1e-5 for x in sums)
               for v in hits.values())


def test_no_variants_matches_nothing(flt):
    from lucene_spark.query import MatchNoDocsQuery

    q = flt["s"].fuzzy_like_this("qqqqqqqqqq", max_edits=1)
    assert isinstance(q, MatchNoDocsQuery)
