"""Surround parser: AST shapes + scoring equivalence with hand-built
span queries (queryparser/surround/parser/QueryParser.jj,
query/DistanceQuery.java:97 — slop = distance - 1)."""

import numpy as np
import pytest

from lucene_spark.build import IndexConfig, build_index
from lucene_spark.query import (
    BooleanClause,
    BooleanQuery,
    IntervalMultiTerm,
    Occur,
    PrefixQuery,
    SpanNearQuery,
    TermQuery,
)
from lucene_spark.search import Searcher
from lucene_spark.surround import surround_parse

import os, sys
sys.path.insert(0, os.path.dirname(__file__))
from oracle import make_corpus


def bq(*pairs):
    return BooleanQuery(clauses=tuple(BooleanClause(q, o) for q, o in pairs))


def test_infix_distance():
    assert surround_parse("fast W table") == SpanNearQuery(
        terms=("fast", "table"), slop=0, in_order=True
    )
    assert surround_parse("fast 3N table") == SpanNearQuery(
        terms=("fast", "table"), slop=2, in_order=False
    )
    # infix chains fold into ONE distance query
    assert surround_parse("a 2W b 2W c") == SpanNearQuery(
        terms=("a", "b", "c"), slop=1, in_order=True
    )


def test_prefix_distance_and_case():
    assert surround_parse("3w(fast, table)") == SpanNearQuery(
        terms=("fast", "table"), slop=2, in_order=True
    )
    assert surround_parse("n(fast, table)") == SpanNearQuery(
        terms=("fast", "table"), slop=0, in_order=False
    )


def test_or_group_slot_and_truncation():
    got = surround_parse("W(OR(fast, slow), tab*)")
    assert got == SpanNearQuery(
        terms=(("fast", "slow"),
               IntervalMultiTerm(kind="prefix", pattern="tab")),
        slop=0, in_order=True,
    )


def test_booleans_infix_and_prefix():
    assert surround_parse("fast AND table") == bq(
        (TermQuery(term="fast"), Occur.MUST),
        (TermQuery(term="table"), Occur.MUST),
    )
    assert surround_parse("or(fast, slow)") == bq(
        (TermQuery(term="fast"), Occur.SHOULD),
        (TermQuery(term="slow"), Occur.SHOULD),
    )
    assert surround_parse("fast NOT slow") == bq(
        (TermQuery(term="fast"), Occur.MUST),
        (TermQuery(term="slow"), Occur.MUST_NOT),
    )


def test_boost_and_parens():
    q = surround_parse("(fast W table)^2.5")
    assert isinstance(q, SpanNearQuery) and q.boost == 2.5
    t = surround_parse("tab*^3")
    assert t == PrefixQuery(prefix="tab", boost=3.0)


def test_illegal_distance_subquery():
    with pytest.raises(ValueError, match="does not allow subquery"):
        surround_parse("W(AND(a, b), c)")
    with pytest.raises(ValueError, match="mixed distance"):
        surround_parse("a W b N c")


@pytest.fixture(scope="module")
def sr(spark):
    texts = make_corpus(120, ["fast", "slow", "table", "scan"], seed=101,
                        min_len=2, max_len=20)
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


def test_parsed_equals_hand_built_end_to_end(sr):
    a = [(int(r["doc_id"]), np.float32(r["score"]))
         for r in sr.search(surround_parse("3W(OR(fast, slow), table)"), 10).collect()]
    b = [(int(r["doc_id"]), np.float32(r["score"]))
         for r in sr.search(
             SpanNearQuery(terms=(("fast", "slow"), "table"), slop=2,
                           in_order=True), 10).collect()]
    assert a == b and a
