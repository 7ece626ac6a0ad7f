"""SimpleQueryParser — a literal port of the reference's fail-soft state
machine (queryparser/simple/SimpleQueryParser.java:150-542): `+` AND,
`|` OR, `-` NOT, `"..."` phrase (`"..."~N` slop with NEAR), `term*`
prefix, `term~N` fuzzy (bare `~` = 2, capped at 2, junk = 0 → plain
term), `(...)` precedence, `\\` escape, whitespace as the implicit
delimiter. The parser NEVER raises on malformed input: unclosed quotes /
parens degrade to literal text, stray `)` is skipped, empty `()`/`""`
reset the pending operator — each branch mirrors the reference line for
line. Features toggle with the same bit flags; ``default_operator`` is
SHOULD or MUST.

Query factories (SimpleQueryParser.java:545-625): default terms and
phrases run the analysis chain (createBooleanQuery / createPhraseQuery —
multi-token text expands to a BooleanQuery of the default operator, a
one-token phrase simplifies to a TermQuery); fuzzy and prefix only
NORMALIZE (lowercase; Analyzer.normalize). Multi-field ``weights`` expand
each produced leaf into a SHOULD of per-field boosted copies. A negated
branch wraps as (SHOULD MatchAll, MUST_NOT branch)."""

from __future__ import annotations

from dataclasses import replace
from typing import Dict, Optional

from .query import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
)

AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9
ALL_OPERATORS = -1

_WS = (" ", "\t", "\n", "\r")


class _State:
    __slots__ = ("data", "index", "length", "top", "cur_op", "prev_op", "not_")

    def __init__(self, data: str, start: int, end: int):
        self.data = data
        self.index = start
        self.length = end
        self.top: Optional[Query] = None
        self.cur_op: Optional[Occur] = None
        self.prev_op: Optional[Occur] = None
        self.not_ = 0


class SimpleQueryParser:
    def __init__(
        self,
        analyze=None,
        weights: Optional[Dict[Optional[str], float]] = None,
        flags: int = ALL_OPERATORS,
        default_operator: Occur = Occur.SHOULD,
    ):
        if analyze is None:
            from .analysis import standard_analyze

            analyze = standard_analyze
        self.analyze = analyze
        self.weights = weights or {None: 1.0}
        self.flags = flags
        if default_operator not in (Occur.SHOULD, Occur.MUST):
            raise ValueError("default operator must be SHOULD or MUST")
        self.default_operator = default_operator

    # ---------------- entry ----------------

    def parse(self, text: str) -> Query:
        if text.strip() == "*":
            return MatchAllDocsQuery()
        state = _State(text, 0, len(text))
        self._parse_sub(state)
        if state.top is None:
            return MatchNoDocsQuery(reason="empty string passed to query parser")
        return state.top

    # ---------------- state machine (java:167-228) ----------------

    def _parse_sub(self, state: _State) -> None:
        f, d = self.flags, state.data
        while state.index < state.length:
            c = d[state.index]
            if c == "(" and f & PRECEDENCE_OPERATORS:
                self._consume_subquery(state)
            elif c == ")" and f & PRECEDENCE_OPERATORS:
                state.index += 1  # extraneous ')' ignored
            elif c == '"' and f & PHRASE_OPERATOR:
                self._consume_phrase(state)
            elif c == "+" and f & AND_OPERATOR:
                if state.cur_op is None and state.top is not None:
                    state.cur_op = Occur.MUST
                state.index += 1
            elif c == "|" and f & OR_OPERATOR:
                if state.cur_op is None and state.top is not None:
                    state.cur_op = Occur.SHOULD
                state.index += 1
            elif c == "-" and f & NOT_OPERATOR:
                state.not_ += 1
                state.index += 1
                continue  # keep the not count for the next char
            elif c in _WS and f & WHITESPACE_OPERATOR:
                state.index += 1
            else:
                self._consume_token(state)
            state.not_ = 0

    def _consume_subquery(self, state: _State) -> None:  # java:230-286
        d = state.data
        state.index += 1
        start = state.index
        precedence = 1
        escaped = False
        while state.index < state.length:
            if not escaped:
                c = d[state.index]
                if c == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    state.index += 1
                    continue
                elif c == "(":
                    precedence += 1
                elif c == ")":
                    precedence -= 1
                    if precedence == 0:
                        break
            escaped = False
            state.index += 1
        if state.index == state.length:
            state.index = start  # no ')': '(' is extraneous
        elif state.index == start:
            state.cur_op = None  # '()': reset pending op
            state.index += 1
        else:
            sub = _State(d, start, state.index)
            self._parse_sub(sub)
            self._build_tree(state, sub.top)
            state.index += 1

    def _consume_phrase(self, state: _State) -> None:  # java:288-356
        d = state.data
        state.index += 1
        start = state.index
        buf = []
        escaped = False
        has_slop = False
        while state.index < state.length:
            if not escaped:
                c = d[state.index]
                if c == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    state.index += 1
                    continue
                elif c == '"':
                    if (
                        state.length > state.index + 1
                        and d[state.index + 1] == "~"
                        and self.flags & NEAR_OPERATOR
                    ):
                        state.index += 1
                        if state.length > state.index + 1:
                            has_slop = True
                        break
                    break
            escaped = False
            buf.append(d[state.index])
            state.index += 1
        if state.index == state.length:
            state.index = start  # no closing '"'
        elif state.index == start:
            state.cur_op = None  # '""': reset pending op
            state.index += 1
        else:
            phrase = "".join(buf)
            slop = self._parse_fuzziness(state) if has_slop else 0
            self._build_tree(state, self._new_phrase(phrase, slop))
            state.index += 1

    def _consume_token(self, state: _State) -> None:  # java:358-425
        d = state.data
        buf = []
        escaped = False
        prefix = False
        fuzzy = False
        while state.index < state.length:
            if not escaped:
                c = d[state.index]
                if c == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    prefix = False
                    state.index += 1
                    continue
                elif self._token_finished(state):
                    break
                elif buf and c == "~" and self.flags & FUZZY_OPERATOR:
                    fuzzy = True
                    break
                prefix = (
                    bool(buf) and c == "*" and bool(self.flags & PREFIX_OPERATOR)
                )
            escaped = False
            buf.append(d[state.index])
            state.index += 1
        if buf:
            if fuzzy and self.flags & FUZZY_OPERATOR:
                token = "".join(buf)
                fz = min(self._parse_fuzziness(state), 2)  # MAXIMUM_SUPPORTED
                branch = (
                    self._new_default(token)
                    if fz == 0
                    else self._new_fuzzy(token, fz)
                )
            elif prefix:
                branch = self._new_prefix("".join(buf[:-1]))
            else:
                branch = self._new_default("".join(buf))
            self._build_tree(state, branch)

    def _parse_fuzziness(self, state: _State) -> int:  # java:487-525
        d = state.data
        if state.index >= state.length or d[state.index] != "~":
            return 0
        chars = []
        while state.index < state.length:
            state.index += 1
            if state.index < state.length:
                if self._token_finished(state):
                    break
                chars.append(d[state.index])
        try:
            s = "".join(chars)
            fz = 2 if s == "" else int(s)
        except ValueError:
            fz = 0  # swallow parse failures
        return max(fz, 0)

    def _token_finished(self, state: _State) -> bool:  # java:528-542
        c = state.data[state.index]
        f = self.flags
        return bool(
            (c == '"' and f & PHRASE_OPERATOR)
            or (c == "|" and f & OR_OPERATOR)
            or (c == "+" and f & AND_OPERATOR)
            or (c == "(" and f & PRECEDENCE_OPERATORS)
            or (c == ")" and f & PRECEDENCE_OPERATORS)
            or (c in _WS and f & WHITESPACE_OPERATOR)
        )

    # ---------------- tree building (java:427-481) ----------------

    def _build_tree(self, state: _State, branch: Optional[Query]) -> None:
        if branch is None:
            return
        if state.not_ % 2 == 1:
            branch = BooleanQuery(
                clauses=(
                    BooleanClause(branch, Occur.MUST_NOT),
                    BooleanClause(MatchAllDocsQuery(), Occur.SHOULD),
                )
            )
        if state.top is None:
            state.top = branch
        else:
            if state.cur_op is None:
                state.cur_op = self.default_operator
            if state.prev_op != state.cur_op:
                state.top = BooleanQuery(
                    clauses=(BooleanClause(state.top, state.cur_op),)
                )
            assert isinstance(state.top, BooleanQuery)
            state.top = BooleanQuery(
                clauses=state.top.clauses
                + (BooleanClause(branch, state.cur_op),),
                minimum_should_match=state.top.minimum_should_match,
            )
            state.prev_op = state.cur_op
        state.cur_op = None

    # ---------------- query factories (java:545-625) ----------------

    def _normalize(self, text: str) -> str:
        # Analyzer.normalize analog: the chain's char-level normalization
        # (lowercase) without tokenization
        return text.lower()

    def _per_field(self, make) -> Optional[Query]:
        subs = []
        for field, boost in self.weights.items():
            q = make(field)
            if q is None:
                continue
            if boost != 1.0:
                q = replace(q, boost=float(boost))
            subs.append(q)
        if not subs:
            return None
        if len(subs) == 1:
            return subs[0]
        return BooleanQuery(
            clauses=tuple(BooleanClause(q, Occur.SHOULD) for q in subs)
        )

    def _new_default(self, text: str) -> Optional[Query]:
        terms = self.analyze(text)

        def make(field):
            if not terms:
                return None
            if len(terms) == 1:
                return TermQuery(term=terms[0], field=field)
            occur = self.default_operator
            return BooleanQuery(
                clauses=tuple(
                    BooleanClause(TermQuery(term=t, field=field), occur)
                    for t in terms
                )
            )

        return self._per_field(make)

    def _new_phrase(self, text: str, slop: int) -> Optional[Query]:
        terms = self.analyze(text)

        def make(field):
            if not terms:
                return None
            if len(terms) == 1:
                return TermQuery(term=terms[0], field=field)
            return PhraseQuery(terms=tuple(terms), slop=int(slop), field=field)

        return self._per_field(make)

    def _new_fuzzy(self, text: str, fuzziness: int) -> Optional[Query]:
        t = self._normalize(text)
        return self._per_field(
            lambda field: FuzzyQuery(term=t, max_edits=int(fuzziness), field=field)
        )

    def _new_prefix(self, text: str) -> Optional[Query]:
        t = self._normalize(text)
        return self._per_field(lambda field: PrefixQuery(prefix=t, field=field))


def simple_parse(
    text: str,
    analyze=None,
    weights: Optional[Dict[Optional[str], float]] = None,
    flags: int = ALL_OPERATORS,
    default_operator: Occur = Occur.SHOULD,
) -> Query:
    return SimpleQueryParser(analyze, weights, flags, default_operator).parse(text)
