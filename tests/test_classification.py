"""Classification (reference classification/ module analogs).

SimpleNaiveBayesClassifier is checked against an independent pure-Python
transcription of the reference math (SimpleNaiveBayesClassifier.java:
assignClass / calculateLogPrior / calculateLogLikelihood /
normClassificationResults); KNearestNeighborClassifier against a pandas
re-computation of the vote (KNearestNeighborClassifier.java:
buildListFromTopDocs) over the engine's own neighbor scores.
"""

import math

import numpy as np
import pandas as pd
import pytest

from lucene_spark.build import IndexConfig, build_index
from lucene_spark.classification import (
    KNearestNeighborClassifier,
    SimpleNaiveBayesClassifier,
)
from lucene_spark.search import Searcher
from oracle import make_corpus

VOCAB = [
    "the", "a", "spark", "merge", "table", "vector", "stream", "batch",
    "query", "index", "join", "window", "group", "fast", "slow", "row",
]
CLASSES = ["en", "de", "fr"]


@pytest.fixture(scope="module")
def corpus():
    docs = make_corpus(90, VOCAB, seed=11, min_len=2, max_len=30)
    docs[3] = "rareclasstoken rareclasstoken spark"
    docs[4] = "rareclasstoken merge"
    return docs


@pytest.fixture(scope="module")
def classes(corpus):
    # deterministic but non-uniform class assignment; one unclassed doc
    out = [CLASSES[(i * 7) % 10 % 3] if i != 50 else None for i in range(len(corpus))]
    return out


@pytest.fixture(scope="module")
def built(spark, corpus):
    cfg = IndexConfig(seg_size=32, block_size=16, with_positions=True)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, content string"
    )
    idx = build_index(df, cfg, doc_id_col="doc_id").persist()
    yield idx
    idx.unpersist()


@pytest.fixture(scope="module")
def searcher(built):
    return Searcher(built, dtype=np.float64)


@pytest.fixture(scope="module")
def classes_df(spark, classes):
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(classes)], "doc_id long, lang string"
    )


def _tokenize(text):
    from lucene_spark.analysis import flat_tokenize

    flat, _ = flat_tokenize(pd.Series([text]), chain="standard")
    return list(flat)


def _nb_reference(corpus, classes, text):
    """Independent multinomial-NB transcription of the reference formula."""
    toks = [_tokenize(t) for t in corpus]
    in_toks = _tokenize(text)
    class_docs = {}
    for c in classes:
        if c is not None:
            class_docs[c] = class_docs.get(c, 0) + 1
    n_cls = float(sum(class_docs.values()))
    # Terms.getSumDocFreq / getDocCount of the text field (ALL docs,
    # classed or not — the reference reads field-level stats)
    sum_doc_freq = sum(len(set(t)) for t in toks)
    doc_count = sum(1 for t in toks if t)
    avg_unique = sum_doc_freq / doc_count
    raw = {}
    for c, cd in class_docs.items():
        s = math.log(cd) - math.log(n_cls)
        den = math.log(avg_unique * cd + n_cls)
        for w in in_toks:
            hits = sum(
                1 for i, t in enumerate(toks) if classes[i] == c and w in t
            )
            s += math.log(hits + 1) - den
        raw[c] = s
    mx = max(raw.values())
    exps = {c: math.exp(v - mx) for c, v in raw.items()}
    z = sum(exps.values())
    return {c: v / z for c, v in exps.items()}


@pytest.mark.parametrize(
    "text",
    [
        "spark merge table fast",
        "the the a window group",
        "rareclasstoken stream",
        "unindexedword spark",
        "",
    ],
)
def test_naive_bayes_matches_reference(spark, searcher, classes_df, corpus, classes, text):
    clf = SimpleNaiveBayesClassifier(searcher, classes_df, class_col="lang")
    inputs = spark.createDataFrame([(0, text)], "input_id long, text string")
    got = {
        r["class"]: r["score"] for r in clf.classify_df(inputs).collect()
    }
    exp = _nb_reference(corpus, classes, text)
    assert set(got) == set(exp)
    for c in exp:
        assert got[c] == pytest.approx(exp[c], abs=2e-6)
    # softmax-normalized (normClassificationResults): probabilities sum to 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-5)


def test_naive_bayes_empty_input_is_prior(spark, searcher, classes_df, classes):
    clf = SimpleNaiveBayesClassifier(searcher, classes_df, class_col="lang")
    inputs = spark.createDataFrame([(0, "")], "input_id long, text string")
    got = {r["class"]: r["score"] for r in clf.classify_df(inputs).collect()}
    n = sum(1 for c in classes if c is not None)
    for c in set(c for c in classes if c is not None):
        prior = sum(1 for x in classes if x == c) / n
        assert got[c] == pytest.approx(prior, abs=1e-6)


def test_naive_bayes_batch_matches_single(spark, searcher, classes_df):
    """A batched classify_df equals per-input runs (the DataFrame batching
    is pure plumbing)."""
    clf = SimpleNaiveBayesClassifier(searcher, classes_df, class_col="lang")
    texts = ["spark merge", "window group fast", ""]
    batch = clf.classify_df(
        spark.createDataFrame(
            list(enumerate(texts)), "input_id long, text string"
        )
    ).toPandas()
    for i, t in enumerate(texts):
        single = clf.classify_df(
            spark.createDataFrame([(0, t)], "input_id long, text string")
        ).toPandas()
        sub = batch[batch.input_id == i].reset_index(drop=True)
        assert list(sub["class"]) == list(single["class"])
        assert np.allclose(sub["score"], single["score"], atol=1e-9)


def _knn_reference(searcher, classes, text, k, max_terms, min_df):
    """Vote recomputed in pandas from the engine's own neighbor scores —
    KNearestNeighborClassifier.java buildListFromTopDocs semantics."""
    q = searcher.more_like_this(text, max_query_terms=max_terms, min_doc_freq=min_df)
    top = searcher.search(q, k + 8, prune=False).toPandas()
    top["score"] = top["score"].round(6)
    top["cls"] = top["doc_id"].map(lambda d: classes[int(d)])
    top = top[top["cls"].notna()]
    top = top.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)
    if top.empty:
        return {}
    mx = top["score"].max()
    sumdoc = len(top)
    out = {}
    for c, grp in top.groupby("cls"):
        out[c] = float((grp["score"] / mx).sum() / min(sumdoc, k))
    return out


@pytest.mark.parametrize("text,k", [
    ("spark merge table fast", 5),
    ("the a window", 7),
    # rare term: fewer than k classed neighbors -> the k/sumdoc correction
    ("rareclasstoken", 10),
])
def test_knn_matches_reference_vote(searcher, classes_df, classes, text, k):
    clf = KNearestNeighborClassifier(
        searcher, classes_df, class_col="lang", k=k,
        max_query_terms=5, min_doc_freq=1,
    )
    got = {r["class"]: r["score"] for r in clf.classify(["%s" % text]).collect()}
    exp = _knn_reference(searcher, classes, text, k, 5, 1)
    assert set(got) == set(exp)
    for c in exp:
        assert got[c] == pytest.approx(round(exp[c], 6), abs=2e-6)


def test_knn_small_result_correction(searcher, classes_df, classes):
    """rareclasstoken appears in exactly 2 docs -> sumdoc=2 < k=10, and the
    reference divides by sumdoc, so the votes sum to sum(score/max)/2 >= 1/2."""
    clf = KNearestNeighborClassifier(
        searcher, classes_df, class_col="lang", k=10,
        max_query_terms=2, min_doc_freq=1,
    )
    rows = clf.classify(["rareclasstoken"]).collect()
    total = sum(r["score"] for r in rows)
    # 2 neighbors: score/max == 1 for the best, <= 1 for the other; /2
    assert 0.5 <= total <= 1.0 + 1e-9


def test_ranked_output_protocol(spark, searcher, classes_df):
    """(input_id, rank, class, score), rank 1 = argmax, contiguous ranks."""
    clf = SimpleNaiveBayesClassifier(searcher, classes_df, class_col="lang")
    pdf = clf.classify_df(
        spark.createDataFrame(
            [(0, "spark"), (1, "merge table")], "input_id long, text string"
        )
    ).toPandas()
    assert list(pdf.columns) == ["input_id", "rank", "class", "score"]
    for _i, grp in pdf.groupby("input_id"):
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert list(grp["score"]) == sorted(grp["score"], reverse=True)
