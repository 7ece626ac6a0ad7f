"""Full Lucene RegExp semantics via regular-expression derivatives.

The parser mirrors the reference grammar exactly
(util/automaton/RegExp.java:1167-1341 — precedence union < intersection <
concatenation < repeat < complement < charclass/simple, `~` binding to the
single following complement-expression, negated classes as
anychar & ~classes, predefined \\d \\s \\w classes, quoted literals, `()`
as the empty string, `<n-m>` numeric intervals with the digits=0
leading-zero rule of Automata.makeDecimalInterval).

Matching uses Brzozowski derivatives (Brzozowski 1964, "Derivatives of
regular expressions", JACM 11(4); Owens, Reppy & Turon 2009,
"Regular-expression derivatives re-examined", JFP 19(2)) with weak
canonicalization, memoized into a lazily materialized DFA.  Intersection
(`&`), complement (`~`), the empty language (`#`) and numeric intervals are
NATIVE operations of the derivative algebra — no translation envelope, any
nesting depth.  The reference compiles the same grammar to an explicit
automaton (RegExp.toAutomaton → Operations.determinize); derivatives reach
the identical language with the determinization done lazily per observed
character, which is the right shape for a terms-dictionary scan: the DFA
only ever grows along characters that actually occur in the corpus
vocabulary.

Scale notes: `DerivativeMatcher.match_batch` walks a whole Arrow batch of
terms through the DFA position-by-position as numpy gather operations
(state vector indexed by a dense transition matrix over the batch
alphabet), so the per-term Python cost is O(1) regardless of term length;
state explosion — the analog of the reference's
TooComplexToDeterminizeException (Operations.DEFAULT_DETERMINIZE_WORK_LIMIT)
— is capped at MAX_STATES.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import numpy as np

# syntax flags — identical values to util/automaton/RegExp.java:408-429
INTERSECTION = 0x0001
COMPLEMENT = 0x0002
EMPTY = 0x0004
ANYSTRING = 0x0008
AUTOMATON = 0x0010
INTERVAL = 0x0020
ALL = 0xFF
NONE = 0x0000

MAX_STATES = 10_000  # DFA-state analog of DEFAULT_DETERMINIZE_WORK_LIMIT

# ---------------------------------------------------------------------------
# AST: hashable nested tuples with canonicalizing smart constructors
# (the weak-equivalence rules of Owens/Reppy/Turon §4.1 — enough to keep
# the derivative state space finite)
# ---------------------------------------------------------------------------

NULL = ("0",)  # the empty language  (Lucene '#')
EPS = ("e",)  # the empty string    (Lucene '()' / "")
ANY1 = ("any",)  # any single character (Lucene '.')
SIGMA = ("not", NULL)  # all strings         (Lucene '@' = anystring)


def _ch(c: str):
    return ("ch", c)


def _rg(lo: str, hi: str):
    if lo == hi:
        return _ch(lo)
    if lo > hi:
        # reference makeCharRange keeps an empty range as the empty language
        return NULL
    return ("rg", lo, hi)


def _cat(parts) -> tuple:
    flat: List[tuple] = []
    for p in parts:
        if p == NULL:
            return NULL
        if p == EPS:
            continue
        if p[0] == "cat":
            flat.extend(p[1])
        else:
            flat.append(p)
    if not flat:
        return EPS
    if len(flat) == 1:
        return flat[0]
    return ("cat", tuple(flat))


def _alt(parts) -> tuple:
    flat = set()
    for p in parts:
        if p == NULL:
            continue
        if p == SIGMA:
            return SIGMA
        if p[0] == "or":
            flat.update(p[1])
        else:
            flat.add(p)
    if not flat:
        return NULL
    if len(flat) == 1:
        return next(iter(flat))
    return ("or", tuple(sorted(flat, key=repr)))


def _and(parts) -> tuple:
    flat = set()
    for p in parts:
        if p == NULL:
            return NULL
        if p == SIGMA:
            continue
        if p[0] == "and":
            flat.update(p[1])
        else:
            flat.add(p)
    if not flat:
        return SIGMA
    if len(flat) == 1:
        return next(iter(flat))
    return ("and", tuple(sorted(flat, key=repr)))


def _not(r: tuple) -> tuple:
    if r[0] == "not":
        return r[1]
    return ("not", r)


def _rep(r: tuple, n: int, m) -> tuple:
    """r{n,m}; m=None is unbounded (Operations.repeat semantics: min > max
    is the empty language, r{0,0} is the empty string)."""
    if m is not None and m < n:
        return NULL
    if r == EPS:
        return EPS
    if r == NULL:
        return EPS if n == 0 else NULL
    if m == 0:
        return EPS
    if n == 1 and m == 1:
        return r
    if r == SIGMA and n == 0 and m is None:
        return SIGMA
    return ("rep", r, n, m)


def _string(s: str) -> tuple:
    return _cat([_ch(c) for c in s])


# ---------------------------------------------------------------------------
# nullable / derivative
# ---------------------------------------------------------------------------


@lru_cache(maxsize=65536)
def _nullable(r: tuple) -> bool:
    k = r[0]
    if k == "e":
        return True
    if k in ("0", "ch", "rg", "any"):
        return False
    if k == "cat":
        return all(_nullable(p) for p in r[1])
    if k == "or":
        return any(_nullable(p) for p in r[1])
    if k == "and":
        return all(_nullable(p) for p in r[1])
    if k == "not":
        return not _nullable(r[1])
    if k == "rep":
        return r[2] == 0 or _nullable(r[1])
    raise AssertionError(k)


@lru_cache(maxsize=262144)
def _deriv(r: tuple, c: str) -> tuple:
    k = r[0]
    if k in ("0", "e"):
        return NULL
    if k == "ch":
        return EPS if r[1] == c else NULL
    if k == "rg":
        return EPS if r[1] <= c <= r[2] else NULL
    if k == "any":
        return EPS
    if k == "cat":
        parts = r[1]
        head, rest = parts[0], parts[1:]
        d = _cat([_deriv(head, c), *rest])
        if _nullable(head):
            return _alt([d, _deriv(_cat(rest), c)])
        return d
    if k == "or":
        return _alt([_deriv(p, c) for p in r[1]])
    if k == "and":
        return _and([_deriv(p, c) for p in r[1]])
    if k == "not":
        return _not(_deriv(r[1], c))
    if k == "rep":
        _, body, n, m = r
        return _cat(
            [_deriv(body, c), _rep(body, max(n - 1, 0), None if m is None else m - 1)]
        )
    raise AssertionError(k)


# ---------------------------------------------------------------------------
# structural bounds for scan-side prefilters
# ---------------------------------------------------------------------------

_UNBOUNDED = 1 << 30


def min_len(r: tuple) -> int:
    """Sound lower bound on matched-string length (complement contributes
    0 — unknown)."""
    k = r[0]
    if k == "0":
        return _UNBOUNDED  # matches nothing; any bound is sound
    if k == "e":
        return 0
    if k in ("ch", "rg", "any"):
        return 1
    if k == "cat":
        return min(sum(min_len(p) for p in r[1]), _UNBOUNDED)
    if k == "or":
        return min(min_len(p) for p in r[1])
    if k == "and":
        return max(min_len(p) for p in r[1])
    if k == "not":
        return 0
    if k == "rep":
        return min(r[2] * min_len(r[1]), _UNBOUNDED)
    raise AssertionError(k)


def max_len(r: tuple):
    """Sound upper bound on matched-string length, or None if unbounded."""
    k = r[0]
    if k == "0":
        return 0
    if k == "e":
        return 0
    if k in ("ch", "rg", "any"):
        return 1
    if k == "cat":
        tot = 0
        for p in r[1]:
            m = max_len(p)
            if m is None:
                return None
            tot += m
        return tot
    if k == "or":
        out = 0
        for p in r[1]:
            m = max_len(p)
            if m is None:
                return None
            out = max(out, m)
        return out
    if k == "and":
        best = None
        for p in r[1]:
            m = max_len(p)
            if m is not None:
                best = m if best is None else min(best, m)
        return best
    if k == "not":
        return None
    if k == "rep":
        if r[3] is None:
            return None
        m = max_len(r[1])
        return None if m is None else r[3] * m
    raise AssertionError(k)


def literal_prefix(r: tuple) -> str:
    """Longest forced literal prefix, derived structurally: only the chain
    of single-char heads of a top-level concatenation counts (sound — any
    match must spell them first)."""
    out = []
    node = r
    while True:
        if node[0] == "ch":
            out.append(node[1])
            return "".join(out)
        if node[0] != "cat":
            return "".join(out)
        head = node[1][0]
        if head[0] != "ch":
            return "".join(out)
        out.append(head[1])
        node = _cat(node[1][1:])


# ---------------------------------------------------------------------------
# parser (grammar transcription of RegExp.java:1167-1341)
# ---------------------------------------------------------------------------


class _Parser:
    def __init__(self, s: str, flags: int):
        self.s = s
        self.pos = 0
        self.flags = flags

    def check(self, flag: int) -> bool:
        return (self.flags & flag) != 0

    def more(self) -> bool:
        return self.pos < len(self.s)

    def peek(self, chars: str) -> bool:
        return self.more() and self.s[self.pos] in chars

    def match(self, c: str) -> bool:
        if self.more() and self.s[self.pos] == c:
            self.pos += 1
            return True
        return False

    def next(self) -> str:
        if not self.more():
            raise ValueError("unexpected end of string")
        c = self.s[self.pos]
        self.pos += 1
        return c

    # grammar, outermost first

    def parse_union(self) -> tuple:
        e = self.parse_inter()
        if self.match("|"):
            return _alt([e, self.parse_union()])
        return e

    def parse_inter(self) -> tuple:
        e = self.parse_concat()
        if self.check(INTERSECTION) and self.match("&"):
            return _and([e, self.parse_inter()])
        return e

    def parse_concat(self) -> tuple:
        e = self.parse_repeat()
        if self.more() and not self.peek(")|") and not (
            self.check(INTERSECTION) and self.peek("&")
        ):
            return _cat([e, self.parse_concat()])
        return e

    def parse_repeat(self) -> tuple:
        e = self.parse_compl()
        while self.peek("?*+{"):
            if self.match("?"):
                e = _alt([e, EPS])
            elif self.match("*"):
                e = _rep(e, 0, None)
            elif self.match("+"):
                e = _rep(e, 1, None)
            elif self.match("{"):
                start = self.pos
                while self.peek("0123456789"):
                    self.next()
                if start == self.pos:
                    raise ValueError(f"integer expected at position {self.pos}")
                n = int(self.s[start : self.pos])
                m = None
                if self.match(","):
                    start = self.pos
                    while self.peek("0123456789"):
                        self.next()
                    if start != self.pos:
                        m = int(self.s[start : self.pos])
                else:
                    m = n
                if not self.match("}"):
                    raise ValueError(f"expected '}}' at position {self.pos}")
                e = _rep(e, n, m)
        return e

    def parse_compl(self) -> tuple:
        if self.check(COMPLEMENT) and self.match("~"):
            return _not(self.parse_compl())
        return self.parse_charclass_exp()

    def parse_charclass_exp(self) -> tuple:
        if self.match("["):
            negate = bool(self.match("^"))
            e = self.parse_charclasses()
            if negate:
                # RegExp.java:1221 — anychar & ~classes (single non-member)
                e = _and([ANY1, _not(e)])
            if not self.match("]"):
                raise ValueError(f"expected ']' at position {self.pos}")
            return e
        return self.parse_simple()

    def parse_charclasses(self) -> tuple:
        e = self.parse_charclass()
        while self.more() and not self.peek("]"):
            e = _alt([e, self.parse_charclass()])
        return e

    def parse_charclass(self) -> tuple:
        pre = self.match_predefined_class()
        if pre is not None:
            return pre
        c = self.parse_char_exp()
        if self.match("-"):
            return _rg(c, self.parse_char_exp())
        return _ch(c)

    # RegExp.expandPredefined (RegExp.java:1244-1262)
    _PRE = {
        "d": _rg("0", "9"),
        "D": _and([ANY1, _not(_rg("0", "9"))]),
        "s": _alt([_ch(" "), _ch("\t"), _ch("\n"), _ch("\r")]),
        "S": _and(
            [ANY1, _not(_alt([_ch(" "), _ch("\t"), _ch("\n"), _ch("\r")]))]
        ),
        "w": _alt([_rg("a", "z"), _rg("A", "Z"), _ch("_"), _rg("0", "9")]),
        "W": _and(
            [
                ANY1,
                _not(
                    _alt([_rg("a", "z"), _rg("A", "Z"), _ch("_"), _rg("0", "9")])
                ),
            ]
        ),
    }

    def match_predefined_class(self):
        if self.match("\\"):
            if self.peek("dDwWsS"):
                return self._PRE[self.next()]
            if self.peek("\\"):
                return _ch(self.next())
            if self.more() and self.s[self.pos].isalpha():
                # RegExp.java:1279 — backslash before a non-construct letter
                raise ValueError(f"invalid character class \\{self.next()}")
            # backslash before a non-letter: rewind, parse_char_exp eats it
            self.pos -= 1
        return None

    def parse_char_exp(self) -> str:
        self.match("\\")
        return self.next()

    def parse_simple(self) -> tuple:
        if self.match("."):
            return ANY1
        if self.check(EMPTY) and self.match("#"):
            return NULL
        if self.check(ANYSTRING) and self.match("@"):
            return SIGMA
        if self.match('"'):
            start = self.pos
            while self.more() and not self.peek('"'):
                self.next()
            if not self.match('"'):
                raise ValueError(f"expected '\"' at position {self.pos}")
            return _string(self.s[start : self.pos - 1])
        if self.match("("):
            if self.match(")"):
                return EPS
            e = self.parse_union()
            if not self.match(")"):
                raise ValueError(f"expected ')' at position {self.pos}")
            return e
        if (self.check(AUTOMATON) or self.check(INTERVAL)) and self.match("<"):
            start = self.pos
            while self.more() and not self.peek(">"):
                self.next()
            if not self.match(">"):
                raise ValueError(f"expected '>' at position {self.pos}")
            body = self.s[start : self.pos - 1]
            i = body.find("-")
            if i == -1:
                if not self.check(AUTOMATON):
                    raise ValueError(
                        f"interval syntax error at position {self.pos - 1}"
                    )
                raise NotImplementedError(
                    "named automata <identifier> require an AutomatonProvider "
                    "(util/automaton/RegExp.java makeAutomaton)"
                )
            if not self.check(INTERVAL):
                raise ValueError(
                    f"illegal identifier at position {self.pos - 1}"
                )
            if i == 0 or i == len(body) - 1 or i != body.rfind("-"):
                raise ValueError(
                    f"interval syntax error at position {self.pos - 1}"
                )
            smin, smax = body[:i], body[i + 1 :]
            if not (smin.isdigit() and smax.isdigit()):
                raise ValueError(
                    f"interval syntax error at position {self.pos - 1}"
                )
            imin, imax = int(smin), int(smax)
            digits = len(smin) if len(smin) == len(smax) else 0
            if imin > imax:
                imin, imax = imax, imin
            return _interval(imin, imax, digits)
        pre = self.match_predefined_class()
        if pre is not None:
            return pre
        return _ch(self.parse_char_exp())


def _fixed_interval(lo: str, hi: str) -> tuple:
    """AST for zero-padded decimal strings of width len(lo) in [lo, hi] —
    the classic digit-range decomposition (same recursion the regex
    translation in search.py uses, emitting AST nodes)."""
    if lo == hi:
        return _string(lo)
    if len(lo) == 1:
        return _rg(lo, hi)
    if lo[0] == hi[0]:
        return _cat([_ch(lo[0]), _fixed_interval(lo[1:], hi[1:])])
    d = len(lo) - 1
    parts = [_cat([_ch(lo[0]), _fixed_interval(lo[1:], "9" * d)])]
    if int(hi[0]) - int(lo[0]) >= 2:
        a, b = str(int(lo[0]) + 1), str(int(hi[0]) - 1)
        parts.append(_cat([_rg(a, b), _rep(_rg("0", "9"), d, d)]))
    parts.append(_cat([_ch(hi[0]), _fixed_interval("0" * d, hi[1:])]))
    return _alt(parts)


def _interval(mn: int, mx: int, digits: int) -> tuple:
    """Automata.makeDecimalInterval semantics (util/automaton/
    Automata.java:457): digits > 0 = exactly that width, zero-padded;
    digits == 0 = any number of leading zeros before the canonical form."""
    if digits > 0:
        return _fixed_interval(str(mn).zfill(digits), str(mx).zfill(digits))
    parts = []
    if mn == 0:
        parts.append(_ch("0"))
        mn = 1
    for L in range(len(str(max(mn, 1))), len(str(mx)) + 1):
        lo = max(mn, 1 if L == 1 else 10 ** (L - 1))
        hi = min(mx, 10**L - 1)
        if lo <= hi:
            parts.append(_fixed_interval(str(lo), str(hi)))
    if not parts:
        return NULL
    return _cat([_rep(_ch("0"), 0, None), _alt(parts)])


def parse_lucene_regexp(pattern: str, flags: int = ALL) -> tuple:
    p = _Parser(pattern, flags)
    e = p.parse_union()
    if p.more():
        raise ValueError(f"end-of-string expected at position {p.pos}")
    return e


# ---------------------------------------------------------------------------
# lazily materialized DFA over derivative states
# ---------------------------------------------------------------------------


class DerivativeMatcher:
    """Anchored full-string matcher for one parsed pattern.  States are
    canonical derivative ASTs; transitions materialize on demand per
    observed character and persist across batches (the matcher is cached
    per worker by compile_lucene_regexp)."""

    def __init__(self, root: tuple):
        self.nodes: List[tuple] = [root]
        self.ids = {root: 0}
        self.trans = {}  # (state_id, char) -> state_id
        self.accept = [_nullable(root)]
        self.root = root
        if NULL not in self.ids:  # guarantee an absorbing dead state
            self.ids[NULL] = len(self.nodes)
            self.nodes.append(NULL)
            self.accept.append(False)

    def _step(self, sid: int, c: str) -> int:
        key = (sid, c)
        nxt = self.trans.get(key)
        if nxt is None:
            node = _deriv(self.nodes[sid], c)
            nxt = self.ids.get(node)
            if nxt is None:
                nxt = len(self.nodes)
                if nxt >= MAX_STATES:
                    raise ValueError(
                        "RegExp too complex to determinize "
                        "(state cap, Operations.DEFAULT_DETERMINIZE_WORK_LIMIT "
                        "analog)"
                    )
                self.ids[node] = nxt
                self.nodes.append(node)
                self.accept.append(_nullable(node))
            self.trans[key] = nxt
        return nxt

    def match(self, s: str) -> bool:
        sid = 0
        for c in s:
            sid = self._step(sid, c)
            if self.nodes[sid] == NULL:
                return False
        return self.accept[sid]

    def match_batch(self, terms: List[str]) -> np.ndarray:
        """Vectorized anchored match over a batch: materialize the DFA
        closure over the batch's alphabet, then walk all terms
        position-by-position with numpy gathers — O(total chars) with
        constant per-character cost, no per-term Python loop."""
        n = len(terms)
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return out
        lens = np.fromiter((len(t) for t in terms), np.int64, n)
        L = int(lens.max()) if n else 0
        if L == 0:
            out[:] = self.accept[0]
            return out
        arr = np.zeros((n, L), dtype=np.uint32)
        for i, t in enumerate(terms):
            if t:
                arr[i, : len(t)] = np.frombuffer(
                    t.encode("utf-32-le"), dtype=np.uint32
                )
        alphabet = np.unique(arr)
        alphabet = alphabet[alphabet != 0]
        chars = [chr(c) for c in alphabet.tolist()]
        # close the DFA over this alphabet (BFS; cached across batches)
        frontier = list(range(len(self.nodes)))
        while frontier:
            nxt_frontier = []
            for sid in frontier:
                if self.nodes[sid] == NULL:
                    continue
                for c in chars:
                    before = len(self.nodes)
                    t = self._step(sid, c)
                    if t >= before:
                        nxt_frontier.append(t)
            frontier = nxt_frontier
        dead = self.ids[NULL]
        n_states = len(self.nodes)
        # dense transition matrix over the batch alphabet
        T = np.full((n_states, len(chars) + 1), dead, dtype=np.int64)
        col = {c: j + 1 for j, c in enumerate(chars)}
        for (sid, c), t in self.trans.items():
            j = col.get(c)
            if j is not None:
                T[sid, j] = t
        if dead >= 0:
            T[dead, :] = dead
        # column index per cell: 0 = padding (stays put via mask)
        cidx = np.searchsorted(alphabet, arr)
        cidx = np.where(
            (cidx < len(alphabet)) & (alphabet[np.minimum(cidx, len(alphabet) - 1)] == arr),
            cidx + 1,
            0,
        )
        state = np.zeros(n, dtype=np.int64)
        for j in range(L):
            active = lens > j
            if not active.any():
                break
            state[active] = T[state[active], cidx[active, j]]
        acc = np.asarray(self.accept, dtype=bool)
        return acc[state]


@lru_cache(maxsize=256)
def compile_lucene_regexp(pattern: str, flags: int = ALL) -> DerivativeMatcher:
    return DerivativeMatcher(parse_lucene_regexp(pattern, flags))
