"""ComplexPhraseQueryParser: phrase strings with embedded wildcards /
fuzzy / alternations parse into the span machinery and score identically
to the hand-built equivalents (queryparser/complexPhrase/
ComplexPhraseQueryParser.java)."""

import numpy as np
import pytest

from lucene_spark.build import IndexConfig, build_index
from lucene_spark.complexphrase import complex_phrase, complex_phrase_parse
from lucene_spark.query import (
    FuzzyQuery,
    IntervalMultiTerm,
    PrefixQuery,
    SpanNearQuery,
    SynonymQuery,
    TermQuery,
    WildcardQuery,
    bool_query,
)
from lucene_spark.search import Searcher

import os, sys
sys.path.insert(0, os.path.dirname(__file__))
from oracle import make_corpus


def test_ast_shapes():
    q = complex_phrase("(john jon) peters*", slop=2)
    assert q == SpanNearQuery(
        terms=(
            ("john", "jon"),
            IntervalMultiTerm(kind="prefix", pattern="peters"),
        ),
        slop=2,
        in_order=True,
    )
    q2 = complex_phrase("john peters~1", slop=0)
    assert q2 == SpanNearQuery(
        terms=("john",
               IntervalMultiTerm(kind="fuzzy", pattern="peters",
                                 max_edits=1)),
        slop=0, in_order=True,
    )


def test_group_with_multiterm_raises():
    with pytest.raises(NotImplementedError, match="multi-term"):
        complex_phrase("(jon jonathan~) peters", slop=1)


def test_single_element_passthrough():
    assert complex_phrase("peters*") == PrefixQuery(prefix="peters")
    assert complex_phrase("pet*rs") == WildcardQuery(pattern="pet*rs")
    assert complex_phrase("peters~1") == FuzzyQuery(term="peters", max_edits=1)
    assert complex_phrase("peters") == TermQuery(term="peters")
    assert complex_phrase("(jon john)") == SynonymQuery(terms=("jon", "john"))


def test_negatives_build_span_not():
    from lucene_spark.query import SpanNotQuery

    q = complex_phrase("john -peters smith", slop=1)
    assert isinstance(q, SpanNotQuery)
    # include = SpanNear(positives, slop + numNegatives)
    assert q.include == SpanNearQuery(terms=("john", "smith"), slop=2,
                                      in_order=True)
    assert q.exclude == (SpanNearQuery(terms=("john", "peters", "smith"),
                                       slop=1, in_order=True),)
    # single positive: include degrades to the bare term
    q2 = complex_phrase("john -peters")
    assert q2.include == "john"
    with pytest.raises(NotImplementedError, match="multi-term"):
        complex_phrase("john -peters tab*")


def test_full_parse_combines_with_classic_syntax():
    q = complex_phrase_parse('lang:en AND "(fast slow) tab*"~3')
    from lucene_spark.query import BooleanQuery

    assert isinstance(q, BooleanQuery)
    kinds = {type(c.query).__name__ for c in q.clauses}
    assert "SpanNearQuery" in kinds and "TermQuery" in kinds


@pytest.fixture(scope="module")
def cp(spark):
    texts = make_corpus(150, ["fast", "slow", "table", "tablet", "scan"],
                        seed=91, min_len=2, max_len=25)
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    idx = build_index(
        df, IndexConfig(seg_size=64, with_positions=True),
        content_col="text", doc_id_col="doc_id",
        auto_seg_size=False, eager=True,
    )
    yield Searcher(idx, dtype=np.float32)
    idx.unpersist()


def _got(df):
    return [(int(r["doc_id"]), np.float32(r["score"])) for r in df.collect()]


def test_parsed_phrase_equals_hand_built(cp):
    got = _got(cp.search(complex_phrase("(fast slow) tab*", slop=3), 10))
    exp = _got(cp.search(
        SpanNearQuery(
            terms=(("fast", "slow"),
                   IntervalMultiTerm(kind="prefix", pattern="tab")),
            slop=3, in_order=True,
        ),
        10,
    ))
    assert got == exp and got


def test_parsed_fuzzy_slot(cp):
    got = _got(cp.search(complex_phrase("fasd~1 table", slop=1), 10))
    exp = _got(cp.search(
        SpanNearQuery(
            terms=(IntervalMultiTerm(kind="fuzzy", pattern="fasd",
                                     max_edits=1), "table"),
            slop=1, in_order=True,
        ),
        10,
    ))
    assert got == exp and got


def test_negative_phrase_end_to_end(spark):
    """'fast -slow table'~1: 'fast … table' windows survive unless the
    full 'fast slow table' window matches at the tighter slop."""
    import numpy as np

    texts = [
        "fast table now",          # match: no 'slow' between
        "fast slow table",         # excluded: the negative chain matches
        "fast quick table",        # match: gap token is not 'slow'
        "slow fast table",         # match: 'slow' before, chain needs order
        "fast table slow",         # match
        "nothing here",
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
    q = complex_phrase("fast -slow table", slop=0)
    got = sorted(int(r["doc_id"]) for r in s.matches(q).collect())
    assert got == [0, 2, 3, 4]
    idx.unpersist()
