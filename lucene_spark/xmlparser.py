"""XML query parser — CoreParser's element DSL
(queryparser/xml/CoreParser.java:72-110 and builders/): an XML document
like

    <BooleanQuery minimumNumberShouldMatch="1">
      <Clause occurs="must"><TermQuery>spark</TermQuery></Clause>
      <Clause><SpanNear slop="3" inOrder="true">
        <SpanTerm>fast</SpanTerm>
        <SpanOrTerms>slow quick</SpanOrTerms>
      </SpanNear></Clause>
    </BooleanQuery>

parses into the engine's Query AST. Element coverage mirrors the
reference's builder registry: TermQuery, TermsQuery (analyzed SHOULD
expansion), MatchAllDocsQuery, BooleanQuery/Clause
(should|must|mustNot|filter + minimumNumberShouldMatch),
RangeQuery (TermRange with includeLower/includeUpper), PointRangeQuery,
DisjunctionMaxQuery (tieBreaker), ConstantScoreQuery, UserQuery (the
classic parser), and the span family: SpanTerm, SpanOr, SpanOrTerms,
SpanNear (slop + inOrder), SpanFirst (end), SpanNot (Include/Exclude —
span operands), SpanPositionRange. ``boost`` attributes apply to every
element (the BoostQuery wrap). Unknown elements raise, like
QueryBuilderFactory.getQueryBuilder → ParserException. ``fieldName``
attributes are accepted and attached where the AST carries a field
(multi-field routing via MultiFieldSearcher); the single-field engine
ignores absent ones."""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import replace
from typing import List, Optional

from .query import (
    BooleanClause,
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    Occur,
    PointRangeQuery,
    Query,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanPositionRangeQuery,
    TermQuery,
    TermRangeQuery,
    parse as classic_parse,
)


class XmlParserError(ValueError):
    pass


def _boost(q: Query, e: ET.Element) -> Query:
    b = float(e.get("boost", "1.0"))
    if b != 1.0:
        q = replace(q, boost=q.boost * b)
    return q


def _text(e: ET.Element) -> str:
    t = (e.text or "").strip()
    if not t:
        raise XmlParserError(f"<{e.tag}> requires non-blank text")
    return t


def _occurs(e: ET.Element) -> Occur:
    occ = (e.get("occurs") or "should").lower()
    try:
        return {
            "should": Occur.SHOULD,
            "must": Occur.MUST,
            "mustnot": Occur.MUST_NOT,
            "filter": Occur.FILTER,
        }[occ]
    except KeyError:
        raise XmlParserError(f"Invalid value for occurs {occ!r}")


def _children(e: ET.Element) -> List[ET.Element]:
    return [c for c in e]


class XmlQueryParser:
    def __init__(self, analyze=None):
        if analyze is None:
            from .analysis import standard_analyze

            analyze = standard_analyze
        self.analyze = analyze

    def parse(self, xml: str) -> Query:
        try:
            root = ET.fromstring(xml)
        except ET.ParseError as exc:
            raise XmlParserError(f"malformed XML: {exc}") from exc
        return self._query(root)

    # ---------------- query elements ----------------

    def _query(self, e: ET.Element) -> Query:
        fn = getattr(self, f"_q_{e.tag}", None)
        if fn is None:
            raise XmlParserError(f"No QueryObjectBuilder defined for {e.tag}")
        return fn(e)

    def _q_TermQuery(self, e):
        return _boost(
            TermQuery(term=self.analyze(_text(e))[0], field=e.get("fieldName")), e
        )

    def _q_TermsQuery(self, e):
        terms = self.analyze(_text(e))
        return _boost(
            BooleanQuery(
                clauses=tuple(
                    BooleanClause(
                        TermQuery(term=t, field=e.get("fieldName")), Occur.SHOULD
                    )
                    for t in terms
                )
            ),
            e,
        )

    def _q_MatchAllDocsQuery(self, e):
        return MatchAllDocsQuery()

    def _q_BooleanQuery(self, e):
        clauses = []
        for c in _children(e):
            if c.tag != "Clause":
                continue
            sub = _children(c)
            if not sub:
                raise XmlParserError("<Clause> requires a child query")
            clauses.append(BooleanClause(self._query(sub[0]), _occurs(c)))
        return _boost(
            BooleanQuery(
                clauses=tuple(clauses),
                minimum_should_match=int(
                    e.get("minimumNumberShouldMatch", "0")
                ),
            ),
            e,
        )

    def _q_RangeQuery(self, e):
        return _boost(
            TermRangeQuery(
                lower=e.get("lowerTerm"),
                upper=e.get("upperTerm"),
                include_lower=e.get("includeLower", "true").lower() == "true",
                include_upper=e.get("includeUpper", "true").lower() == "true",
            ),
            e,
        )

    def _q_PointRangeQuery(self, e):
        lo, hi = e.get("lowerTerm"), e.get("upperTerm")
        return _boost(
            PointRangeQuery(
                field_col=e.get("fieldName", ""),
                lower=float(lo) if lo is not None else None,
                upper=float(hi) if hi is not None else None,
            ),
            e,
        )

    def _q_DisjunctionMaxQuery(self, e):
        return _boost(
            DisjunctionMaxQuery(
                disjuncts=tuple(self._query(c) for c in _children(e)),
                tie_breaker=float(e.get("tieBreaker", "0.0")),
            ),
            e,
        )

    def _q_ConstantScoreQuery(self, e):
        sub = _children(e)
        if not sub:
            raise XmlParserError("<ConstantScoreQuery> requires a child")
        return _boost(ConstantScoreQuery(query=self._query(sub[0])), e)

    def _q_UserQuery(self, e):
        return _boost(classic_parse(_text(e), analyze=self.analyze), e)

    # ---------------- span elements ----------------

    def _span_clause(self, e: ET.Element):
        """A SpanNear slot: SpanTerm -> point term, SpanOr/SpanOrTerms ->
        alternation tuple."""
        if e.tag == "SpanTerm":
            return self.analyze(_text(e))[0]
        if e.tag == "SpanOrTerms":
            return tuple(self.analyze(_text(e)))
        if e.tag == "SpanOr":
            return tuple(
                self.analyze(_text(c))[0]
                for c in _children(e)
                if c.tag == "SpanTerm"
            )
        raise XmlParserError(f"No SpanQueryObjectBuilder defined for {e.tag}")

    def _span_operand(self, e: ET.Element):
        """A SpanNot Include/Exclude operand: term or nested SpanNear."""
        if e.tag == "SpanNear":
            return self._q_SpanNear(e)
        return self._span_clause(e)

    def _q_SpanTerm(self, e):
        return _boost(SpanOrQuery(terms=(self.analyze(_text(e))[0],)), e)

    def _q_SpanOr(self, e):
        return _boost(
            SpanOrQuery(
                terms=tuple(
                    self.analyze(_text(c))[0]
                    for c in _children(e)
                    if c.tag == "SpanTerm"
                )
            ),
            e,
        )

    def _q_SpanOrTerms(self, e):
        return _boost(SpanOrQuery(terms=tuple(self.analyze(_text(e)))), e)

    def _q_SpanNear(self, e):
        return _boost(
            SpanNearQuery(
                terms=tuple(self._span_clause(c) for c in _children(e)),
                slop=int(e.get("slop", "0")),
                in_order=e.get("inOrder", "true").lower() == "true",
            ),
            e,
        )

    def _q_SpanFirst(self, e):
        sub = _children(e)
        if not sub or sub[0].tag != "SpanTerm":
            raise XmlParserError("<SpanFirst> requires a SpanTerm child")
        return _boost(
            SpanFirstQuery(
                term=self.analyze(_text(sub[0]))[0], end=int(e.get("end", "1"))
            ),
            e,
        )

    def _q_SpanPositionRange(self, e):
        sub = _children(e)
        if not sub:
            raise XmlParserError("<SpanPositionRange> requires a child")
        return _boost(
            SpanPositionRangeQuery(
                match=self._span_operand(sub[0]),
                start=int(e.get("start", "0")),
                end=int(e.get("end", "1")),
            ),
            e,
        )

    def _q_SpanNot(self, e):
        inc = exc = None
        for c in _children(e):
            if c.tag == "Include":
                inc = self._span_operand(_children(c)[0])
            elif c.tag == "Exclude":
                exc = self._span_operand(_children(c)[0])
        if inc is None or exc is None:
            raise XmlParserError("<SpanNot> requires Include and Exclude")
        if isinstance(inc, tuple) or isinstance(exc, tuple):
            raise XmlParserError(
                "SpanNot over SpanOr alternations is not supported"
            )
        return _boost(
            SpanNotQuery(
                include=inc,
                exclude=(exc,) if not isinstance(exc, tuple) else exc,
            ),
            e,
        )


def xml_parse(xml: str, analyze=None) -> Query:
    return XmlQueryParser(analyze).parse(xml)
