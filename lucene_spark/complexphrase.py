"""ComplexPhraseQueryParser (queryparser/complexPhrase/
ComplexPhraseQueryParser.java): classic syntax where QUOTED PHRASES may
embed wildcards, prefixes, fuzzy terms and (a b c) alternations —
'"(john jon jonathan~) peters*"~2'. Each phrase element becomes one
SpanNearQuery slot (ComplexPhraseQuery.rewrite, :260-365): a plain term
stays a point slot, a multi-term pattern becomes a
SpanMultiTermQueryWrapper expansion slot (IntervalMultiTerm), a
parenthesized group becomes a SpanOr alternation slot (tuple); the slots
combine as SpanNearQuery(slop, in_order). A single-element phrase
degrades to the element's plain query (rewrite's TermQuery/MultiTermQuery
passthrough, :262-266).

MUST_NOT elements inside a phrase build the reference's
SpanNot(include, exclude) composition (:341-364): include =
SpanNear(positives, slop + numNegatives), exclude = SpanNear(ALL
elements in order, slop) — supported when every element is a plain
term (multi-term patterns mixed with negatives raise loudly)."""

from __future__ import annotations

import re
from typing import List, Optional

from .query import (
    FuzzyQuery,
    IntervalMultiTerm,
    PrefixQuery,
    Query,
    SpanNearQuery,
    SynonymQuery,
    TermQuery,
    WildcardQuery,
    parse,
)

_ELEM_RE = re.compile(r"\(|\)|[^\s()]+")


def _classify(tok: str, analyze):
    """One phrase element -> slot (str | IntervalMultiTerm) or ('fuzzy'...)."""
    m = re.fullmatch(r"(.+?)~(\d*)", tok)
    if m and "*" not in tok and "?" not in tok:
        base = analyze(m.group(1))
        if len(base) != 1:
            raise ValueError(f"fuzzy element {tok!r} analyzes to {base}")
        edits = int(m.group(2)) if m.group(2) else 2
        return IntervalMultiTerm(kind="fuzzy", pattern=base[0], max_edits=edits)
    if "*" in tok or "?" in tok:
        pat = tok.lower()
        if "?" not in pat and pat.endswith("*") and "*" not in pat[:-1]:
            return IntervalMultiTerm(kind="prefix", pattern=pat[:-1])
        return IntervalMultiTerm(kind="wildcard", pattern=pat)
    toks = analyze(tok)
    if len(toks) != 1:
        raise ValueError(f"phrase element {tok!r} analyzes to {toks}")
    return toks[0]


def complex_phrase(body: str, slop: int = 0, in_order: bool = True,
                   analyze=None) -> Query:
    """Build the span query for one complex phrase's contents."""
    if analyze is None:
        from .analysis import standard_analyze

        analyze = standard_analyze
    slots: List[object] = []
    negated: List[bool] = []
    toks = _ELEM_RE.findall(body)
    group: Optional[list] = None
    for tok in toks:
        if tok == "(":
            if group is not None:
                raise ValueError("nested groups in a complex phrase")
            group = []
        elif tok == ")":
            if group is None:
                raise ValueError("unbalanced ')' in complex phrase")
            if group:
                slots.append(tuple(group))
                negated.append(False)
            group = None
        else:
            neg = tok.startswith("-")
            el = _classify(tok.lstrip("+-"), analyze)
            if group is not None:
                if neg:
                    raise NotImplementedError(
                        "negated elements inside a (…) group of a complex "
                        "phrase"
                    )
                if isinstance(el, IntervalMultiTerm):
                    raise NotImplementedError(
                        "multi-term patterns inside a (…) group of a "
                        "complex phrase"
                    )
                group.append(el)
            else:
                slots.append(el)
                negated.append(neg)
    if group is not None:
        raise ValueError("unbalanced '(' in complex phrase")
    if not slots:
        raise ValueError(f"empty complex phrase {body!r}")
    n_neg = sum(negated)
    if n_neg:
        # ComplexPhraseQueryParser.java:341-364: SpanNot(include, exclude)
        if not all(isinstance(s, str) for s in slots):
            raise NotImplementedError(
                "negatives mixed with multi-term/group elements in a "
                "complex phrase"
            )
        positives = [s for s, n in zip(slots, negated) if not n]
        if not positives:
            raise ValueError("complex phrase with only negative elements")
        from .query import SpanNotQuery

        include: object = (
            positives[0]
            if len(positives) == 1
            else SpanNearQuery(
                terms=tuple(positives), slop=int(slop) + n_neg,
                in_order=in_order,
            )
        )
        exclude = SpanNearQuery(
            terms=tuple(slots), slop=int(slop), in_order=in_order
        )
        return SpanNotQuery(include=include, exclude=(exclude,))
    if len(slots) == 1:
        el = slots[0]
        # single element: rewrite's passthrough (:262-266)
        if isinstance(el, str):
            return TermQuery(term=el)
        if isinstance(el, tuple):
            return SynonymQuery(terms=el)
        if el.kind == "prefix":
            return PrefixQuery(prefix=el.pattern)
        if el.kind == "wildcard":
            return WildcardQuery(pattern=el.pattern)
        return FuzzyQuery(term=el.pattern, max_edits=el.max_edits)
    return SpanNearQuery(terms=tuple(slots), slop=int(slop),
                         in_order=in_order)


def complex_phrase_parse(query: str, analyze=None,
                         in_order: bool = True) -> Query:
    """Full classic syntax with complex quoted phrases — the
    ComplexPhraseQueryParser entry point."""
    if analyze is None:
        from .analysis import standard_analyze

        analyze = standard_analyze
    return parse(
        query,
        analyze=analyze,
        phrase_builder=lambda body, slop: complex_phrase(
            body, slop, in_order=in_order, analyze=analyze
        ),
    )
