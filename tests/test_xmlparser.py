"""XML query parser (queryparser/xml/CoreParser.java element DSL): AST
shapes and end-to-end equivalence. No Spark for shape tests."""

import numpy as np
import pytest

from lucene_spark.query import (
    BooleanClause,
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    Occur,
    PointRangeQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    TermQuery,
    TermRangeQuery,
)
from lucene_spark.xmlparser import XmlParserError, xml_parse


def test_term_and_boost():
    assert xml_parse("<TermQuery>Spark</TermQuery>") == TermQuery(term="spark")
    assert xml_parse('<TermQuery boost="2.5">spark</TermQuery>') == TermQuery(
        term="spark", boost=2.5
    )


def test_boolean_with_clauses_and_msm():
    got = xml_parse(
        """
        <BooleanQuery minimumNumberShouldMatch="1" boost="1.5">
          <Clause occurs="must"><TermQuery>spark</TermQuery></Clause>
          <Clause occurs="mustNot"><TermQuery>slow</TermQuery></Clause>
          <Clause><TermQuery>merge</TermQuery></Clause>
          <Clause occurs="filter"><MatchAllDocsQuery/></Clause>
        </BooleanQuery>
        """
    )
    assert got == BooleanQuery(
        boost=1.5,
        minimum_should_match=1,
        clauses=(
            BooleanClause(TermQuery(term="spark"), Occur.MUST),
            BooleanClause(TermQuery(term="slow"), Occur.MUST_NOT),
            BooleanClause(TermQuery(term="merge"), Occur.SHOULD),
            BooleanClause(MatchAllDocsQuery(), Occur.FILTER),
        ),
    )


def test_ranges_and_dismax_and_constant():
    assert xml_parse(
        '<RangeQuery lowerTerm="m" upperTerm="t" includeUpper="false"/>'
    ) == TermRangeQuery(lower="m", upper="t", include_upper=False)
    assert xml_parse(
        '<PointRangeQuery fieldName="n_chars" lowerTerm="100" upperTerm="900"/>'
    ) == PointRangeQuery(field_col="n_chars", lower=100.0, upper=900.0)
    got = xml_parse(
        """
        <DisjunctionMaxQuery tieBreaker="0.3">
          <TermQuery>spark</TermQuery><TermQuery>merge</TermQuery>
        </DisjunctionMaxQuery>
        """
    )
    assert got == DisjunctionMaxQuery(
        disjuncts=(TermQuery(term="spark"), TermQuery(term="merge")),
        tie_breaker=0.3,
    )
    got2 = xml_parse(
        "<ConstantScoreQuery><TermQuery>spark</TermQuery></ConstantScoreQuery>"
    )
    assert got2 == ConstantScoreQuery(query=TermQuery(term="spark"))


def test_span_family():
    got = xml_parse(
        """
        <SpanNear slop="3" inOrder="true">
          <SpanTerm>fast</SpanTerm>
          <SpanOrTerms>slow quick</SpanOrTerms>
        </SpanNear>
        """
    )
    assert got == SpanNearQuery(
        terms=("fast", ("slow", "quick")), slop=3, in_order=True
    )
    assert xml_parse(
        '<SpanFirst end="5"><SpanTerm>spark</SpanTerm></SpanFirst>'
    ) == SpanFirstQuery(term="spark", end=5)
    assert xml_parse(
        "<SpanOr><SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm></SpanOr>"
    ) == SpanOrQuery(terms=("a", "b"))
    got3 = xml_parse(
        """
        <SpanNot>
          <Include><SpanTerm>fast</SpanTerm></Include>
          <Exclude><SpanNear slop="0" inOrder="true">
            <SpanTerm>slow</SpanTerm><SpanTerm>table</SpanTerm>
          </SpanNear></Exclude>
        </SpanNot>
        """
    )
    assert got3 == SpanNotQuery(
        include="fast",
        exclude=(SpanNearQuery(terms=("slow", "table"), slop=0,
                               in_order=True),),
    )


def test_user_query_delegates_to_classic():
    from lucene_spark.query import parse

    assert xml_parse("<UserQuery>spark AND merge</UserQuery>") == parse(
        "spark AND merge"
    )


def test_errors():
    with pytest.raises(XmlParserError, match="No QueryObjectBuilder"):
        xml_parse("<NopeQuery>x</NopeQuery>")
    with pytest.raises(XmlParserError, match="malformed"):
        xml_parse("<TermQuery>unclosed")
    with pytest.raises(XmlParserError, match="non-blank"):
        xml_parse("<TermQuery>  </TermQuery>")
    with pytest.raises(XmlParserError, match="Invalid value for occurs"):
        xml_parse(
            '<BooleanQuery><Clause occurs="perhaps">'
            "<TermQuery>x</TermQuery></Clause></BooleanQuery>"
        )


def test_end_to_end_equivalence(spark):
    from lucene_spark.build import IndexConfig, build_index
    from lucene_spark.search import Searcher

    import os, sys
    sys.path.insert(0, os.path.dirname(__file__))
    from oracle import make_corpus

    texts = make_corpus(100, ["fast", "slow", "table", "spark"], seed=111)
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    idx = build_index(df, IndexConfig(seg_size=32, with_positions=True),
                      content_col="text", doc_id_col="doc_id",
                      auto_seg_size=False, eager=True)
    s = Searcher(idx, dtype=np.float32)
    xml_q = xml_parse(
        """
        <BooleanQuery>
          <Clause occurs="must"><TermQuery>spark</TermQuery></Clause>
          <Clause><SpanNear slop="2" inOrder="true">
            <SpanTerm>fast</SpanTerm><SpanTerm>table</SpanTerm>
          </SpanNear></Clause>
        </BooleanQuery>
        """
    )
    from lucene_spark.query import bool_query

    hand = bool_query(
        must=[TermQuery(term="spark")],
        should=[SpanNearQuery(terms=("fast", "table"), slop=2,
                              in_order=True)],
    )
    a = [(int(r["doc_id"]), np.float32(r["score"]))
         for r in s.search(xml_q, 10).collect()]
    b = [(int(r["doc_id"]), np.float32(r["score"]))
         for r in s.search(hand, 10).collect()]
    assert a == b and a
    idx.unpersist()
