"""Surround query parser (queryparser/surround/parser/QueryParser.jj,
query/DistanceQuery.java): the span-oriented proximity language —
W (ordered) / N (unordered) distance operators with an optional numeric
prefix (``3W(a, b)`` = within 3 positions in order; slop =
distance - 1, DistanceQuery.java:97), AND / OR / NOT booleans, all in
both infix (``a W b``) and prefix (``W(a, b)``) form, case-insensitive;
``*``/``?`` truncation terms expand like SpanMultiTermQueryWrapper.

Distance operands may be terms, truncations, or OR groups (alternation
slots); AND / NOT / W / N inside a distance operator raise — the
reference's distanceSubQueryNotAllowed contract
(DistanceQuery.java:55-66). ``field:`` prefixes and ``^boost`` apply to
any primary. Single-field (the FieldsQuery role collapses)."""

from __future__ import annotations

import re
from dataclasses import replace
from typing import List, Optional

from .query import (
    BooleanClause,
    BooleanQuery,
    IntervalMultiTerm,
    Occur,
    PrefixQuery,
    Query,
    SpanNearQuery,
    SynonymQuery,
    TermQuery,
    WildcardQuery,
)

_TOKEN = re.compile(r"\(|\)|,|\^[0-9.]+|[^\s(),^]+")
_DIST = re.compile(r"([1-9][0-9]?)?([WwNn])$")


class _P:
    def __init__(self, text: str, analyze):
        self.toks = _TOKEN.findall(text)
        self.i = 0
        self.analyze = analyze

    def peek(self) -> Optional[str]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def pop(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    # ---- grammar ----

    def parse(self) -> Query:
        q = self.or_expr()
        if self.peek() is not None:
            raise ValueError(f"unexpected token {self.peek()!r}")
        return q

    def or_expr(self) -> Query:
        parts = [self.and_expr()]
        while self._is_kw("OR"):
            self.pop()
            parts.append(self.and_expr())
        if len(parts) == 1:
            return parts[0]
        return BooleanQuery(
            clauses=tuple(BooleanClause(p, Occur.SHOULD) for p in parts)
        )

    def and_expr(self) -> Query:
        parts = [self.not_expr()]
        while self._is_kw("AND"):
            self.pop()
            parts.append(self.not_expr())
        if len(parts) == 1:
            return parts[0]
        return BooleanQuery(
            clauses=tuple(BooleanClause(p, Occur.MUST) for p in parts)
        )

    def not_expr(self) -> Query:
        first = self.dist_expr()
        negs = []
        while self._is_kw("NOT"):
            self.pop()
            negs.append(self.dist_expr())
        if not negs:
            return first
        return BooleanQuery(
            clauses=(BooleanClause(first, Occur.MUST),)
            + tuple(BooleanClause(n, Occur.MUST_NOT) for n in negs)
        )

    def dist_expr(self) -> Query:
        first = self.primary()
        op = None
        operands = [first]
        while True:
            t = self.peek()
            m = _DIST.match(t) if t else None
            if not m:
                break
            this_op = (int(m.group(1) or 1), m.group(2).upper())
            if op is not None and this_op != op:
                raise ValueError(
                    "mixed distance operators in one infix chain"
                )
            op = this_op
            self.pop()
            operands.append(self.primary())
        if op is None:
            return first
        return self._distance(op, operands)

    def primary(self) -> Query:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of query")
        if t == "(":
            self.pop()
            q = self.or_expr()
            if self.peek() != ")":
                raise ValueError("expected ')'")
            self.pop()
            return self._boost(q)
        kw = t.upper()
        m = _DIST.match(t)
        if kw in ("AND", "OR", "NOT") or m:
            # prefix operator form requires '('
            if self.i + 1 < len(self.toks) and self.toks[self.i + 1] == "(":
                self.pop()
                args = self._arg_list()
                if kw == "AND":
                    q = BooleanQuery(clauses=tuple(
                        BooleanClause(a, Occur.MUST) for a in args))
                elif kw == "OR":
                    q = BooleanQuery(clauses=tuple(
                        BooleanClause(a, Occur.SHOULD) for a in args))
                elif kw == "NOT":
                    q = BooleanQuery(
                        clauses=(BooleanClause(args[0], Occur.MUST),)
                        + tuple(BooleanClause(a, Occur.MUST_NOT)
                                for a in args[1:])
                    )
                else:
                    q = self._distance(
                        (int(m.group(1) or 1), m.group(2).upper()), args
                    )
                return self._boost(q)
        return self._boost(self._term(self.pop()))

    def _arg_list(self) -> List[Query]:
        assert self.pop() == "("
        args = [self.or_expr()]
        while self.peek() == ",":
            self.pop()
            args.append(self.or_expr())
        if self.peek() != ")":
            raise ValueError("expected ')'")
        self.pop()
        return args

    # ---- leaves / combination ----

    def _term(self, tok: str) -> Query:
        if "*" in tok or "?" in tok:
            pat = tok.lower()
            if "?" not in pat and pat.endswith("*") and "*" not in pat[:-1]:
                return PrefixQuery(prefix=pat[:-1])
            return WildcardQuery(pattern=pat)
        toks = self.analyze(tok)
        if len(toks) != 1:
            raise ValueError(f"term {tok!r} analyzes to {toks}")
        return TermQuery(term=toks[0])

    def _boost(self, q: Query) -> Query:
        t = self.peek()
        if t and t.startswith("^"):
            self.pop()
            q = replace(q, boost=q.boost * float(t[1:]))
        return q

    def _slot(self, q: Query):
        """Distance operand -> SpanNear slot (DistanceQuery
        .distanceSubQueryNotAllowed: only terms, truncations and OR
        groups are legal)."""
        if isinstance(q, TermQuery):
            return q.term
        if isinstance(q, PrefixQuery):
            return IntervalMultiTerm(kind="prefix", pattern=q.prefix)
        if isinstance(q, WildcardQuery):
            return IntervalMultiTerm(kind="wildcard", pattern=q.pattern)
        if isinstance(q, SynonymQuery):
            return tuple(q.terms)
        if isinstance(q, BooleanQuery) and all(
            c.occur == Occur.SHOULD and isinstance(c.query, TermQuery)
            for c in q.clauses
        ):
            return tuple(c.query.term for c in q.clauses)
        raise ValueError(
            f"Operator W/N does not allow subquery {type(q).__name__}"
        )

    def _distance(self, op, operands: List[Query]) -> Query:
        dist, name = op
        return SpanNearQuery(
            terms=tuple(self._slot(q) for q in operands),
            slop=dist - 1,  # DistanceQuery.java:97
            in_order=(name == "W"),
        )

    def _is_kw(self, kw: str) -> bool:
        t = self.peek()
        return t is not None and t.upper() == kw


def surround_parse(text: str, analyze=None) -> Query:
    if analyze is None:
        from .analysis import standard_analyze

        analyze = standard_analyze
    return _P(text, analyze).parse()
