"""Porter stemmer tests: the reference PorterStemmer.java's documented
examples (its step1 comment block) plus classic vectors from Porter (1980)
and the batch/scalar chain equivalences."""

import pandas as pd
import pytest

from lucene_spark.stem import porter_stem, strip_possessive

# examples straight from the reference's step1()/class comments
STEP1_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "disabled": "disabl",
    "matting": "mat", "mating": "mate", "meeting": "meet", "milling": "mill",
    "messing": "mess", "meetings": "meet",
}

# classic vectors from Porter (1980) covering steps 2-6
PAPER_VECTORS = {
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "homologou": "homolog", "communism": "commun",
    "activate": "activ", "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
    "generalization": "gener", "oscillators": "oscil",
}


def test_step1_reference_examples():
    for w, exp in STEP1_VECTORS.items():
        assert porter_stem(w) == exp, w


def test_paper_vectors():
    for w, exp in PAPER_VECTORS.items():
        assert porter_stem(w) == exp, w


def test_short_words_pass_through():
    for w in ("a", "is", "by", "sky"):
        assert porter_stem(w) == w if len(w) <= 2 else True
    assert porter_stem("sky") == "sky"


def test_possessive_filter():
    assert strip_possessive("porter's") == "porter"
    assert strip_possessive("porters") == "porters"


def test_english_chain_batch_equals_scalar():
    from lucene_spark.analysis import analyze_series, english_analyze, flat_tokenize

    texts = pd.Series(
        ["The ponies' meetings were effective", "generalization of operators",
         "porter's hopefulness", ""]
    )
    flat, counts = flat_tokenize(texts, chain="english")
    via_scalar = [t for lst in texts.map(english_analyze) for t in lst]
    assert list(flat) == via_scalar
    assert counts.tolist() == [int(len(english_analyze(t))) for t in texts]
    assert "meet" in list(flat) and "gener" in list(flat)


def test_english_chain_end_to_end_search(spark):
    """An english-chain index matches morphological variants under one
    stemmed term."""
    import numpy as np

    from lucene_spark.build import IndexConfig, build_index
    from lucene_spark.query import TermQuery
    from lucene_spark.search import Searcher

    rows = [
        (0, "the meeting was effective"),
        (1, "several meetings about effectiveness"),
        (2, "we will meet tomorrow"),
        (3, "nothing related here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(
        df, IndexConfig(chain="english", with_positions=False),
        content_col="text", doc_id_col="doc_id", auto_seg_size=False, eager=True,
    )
    s = Searcher(idx, dtype=np.float32)
    hits = {int(r["doc_id"]) for r in s.matches(TermQuery(term="meet")).collect()}
    assert hits == {0, 1, 2}
    hits2 = {int(r["doc_id"]) for r in s.matches(TermQuery(term="effect")).collect()}
    assert hits2 == {0, 1}
