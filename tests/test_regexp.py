"""Derivative-based Lucene RegExp engine (lucene_spark/regexp.py).

Three independent cross-checks:
 - the shared operator subset against Python re.fullmatch,
 - automaton-only operators (& ~ # <n-m>) against a brute-force recursive
   substring-membership evaluator (an independent semantics transcription),
 - the vectorized batch walk against the scalar walk.
"""

import re

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_spark.regexp import (
    ALL,
    DerivativeMatcher,
    compile_lucene_regexp,
    literal_prefix,
    max_len,
    min_len,
    parse_lucene_regexp,
)


def brute_match(r: tuple, s: str, memo=None) -> bool:
    """Independent membership evaluator: memoized recursion over substring
    splits — the textbook definition of each operator, no derivatives."""
    if memo is None:
        memo = {}
    key = (r, s)
    if key in memo:
        return memo[key]
    memo[key] = False  # cycle guard (rep with nullable body)
    k = r[0]
    if k == "0":
        res = False
    elif k == "e":
        res = s == ""
    elif k == "ch":
        res = s == r[1]
    elif k == "rg":
        res = len(s) == 1 and r[1] <= s <= r[2]
    elif k == "any":
        res = len(s) == 1
    elif k == "cat":
        parts = r[1]
        head = parts[0]
        rest = parts[1] if len(parts) == 2 else ("cat", parts[1:])
        res = any(
            brute_match(head, s[:i], memo) and brute_match(rest, s[i:], memo)
            for i in range(len(s) + 1)
        )
    elif k == "or":
        res = any(brute_match(p, s, memo) for p in r[1])
    elif k == "and":
        res = all(brute_match(p, s, memo) for p in r[1])
    elif k == "not":
        res = not brute_match(r[1], s, memo)
    elif k == "rep":
        body, n, m = r[1], r[2], r[3]
        if s == "":
            res = n == 0 or brute_match(body, "", memo)
        elif m is not None and m == 0:
            res = False
        else:
            nxt = ("rep", body, max(n - 1, 0), None if m is None else m - 1)
            res = any(
                brute_match(body, s[:i], memo) and brute_match(nxt, s[i:], memo)
                for i in range(1, len(s) + 1)
            )
            if not res and n > 0 and brute_match(body, "", memo):
                res = brute_match(nxt, s, memo)
    else:
        raise AssertionError(k)
    memo[key] = res
    return res


# ---------------------------------------------------------------------------
# shared subset vs Python re
# ---------------------------------------------------------------------------

SHARED = [
    # (lucene pattern, equivalent python regex)
    ("abc", "abc"),
    ("a|bc", "a|bc"),
    ("a|()", "a|"),  # the empty alternative is spelled '()' in RegExp
    ("(a|b)*c", "(a|b)*c"),
    ("[sv].*r", "[sv].*r"),
    ("[a-c]+[0-9]?", "[a-c]+[0-9]?"),
    ("[^ab]c", "[^ab]c"),
    ("a{2,3}b{0,1}", "a{2,3}b{0,1}"),
    ("a{2}", "a{2}"),
    ("a{2,}", "a{2,}"),
    (".a.", ".a."),
    ("()", ""),
    ("(())a", "a"),
    ('"lit.eral"x', re.escape("lit.eral") + "x"),
    ("\\.a\\*", re.escape(".") + "a" + re.escape("*")),
    ("\\d+", "[0-9]+"),
    ("\\w\\W", "[a-zA-Z_0-9][^a-zA-Z_0-9]"),
    ("\\s?x", "[ \t\n\r]?x"),
    ("a>b", "a>b"),  # bare '>' is a legal literal (RegExp.parseSimpleExp)
    ("a\\&b", "a&b"),
]

STRINGS = st.text(alphabet="abcsvr019_xz .>&", max_size=6)


@pytest.mark.parametrize("lpat,pypat", SHARED)
@settings(max_examples=60, deadline=None)
@given(s=STRINGS)
def test_shared_subset_matches_python_re(lpat, pypat, s):
    m = compile_lucene_regexp(lpat)
    assert m.match(s) == bool(re.fullmatch(pypat, s)), (lpat, s)


# ---------------------------------------------------------------------------
# automaton-only operators vs brute evaluator
# ---------------------------------------------------------------------------

AUTOMATON_PATTERNS = [
    "ab&a.b",  # empty intersection
    "(se.*&.*ed)",
    "s.*&~(.*k)",
    "s~(.*e)",  # concat with a complemented group
    "~ab",  # '~' binds to the single following expr: (~a)·b
    "~(a|b)c",
    "(a&#)b|c",  # '#' annihilates its intersection branch
    "#",
    "(~#)x",  # ~# = any string, then literal
    "a(~(bc))d",
    "(ab.*&.*cd)e",
    "(.*a.*&.*b.*&.*c.*)",
    "~(~(ab))",
    "[ab]*&~(aa.*)",
    "(a+&.{2,3})b",
    "<1-20>",
    "<05-10>",
    "x<7-11>y",
    "<1-20>&~(0.*)",
]

SHORT = st.text(alphabet="abcdesk01257", max_size=5)


@pytest.mark.parametrize("lpat", AUTOMATON_PATTERNS)
@settings(max_examples=60, deadline=None)
@given(s=SHORT)
def test_automaton_ops_match_brute(lpat, s):
    ast = parse_lucene_regexp(lpat)
    m = compile_lucene_regexp(lpat)
    assert m.match(s) == brute_match(ast, s), (lpat, s)


def test_hand_cases():
    m = compile_lucene_regexp("~ab")
    assert m.match("xb") and m.match("b") and m.match("aab")
    assert not m.match("ab")
    m = compile_lucene_regexp("ab&a.b")
    for s in ("ab", "axb", "aab", ""):
        assert not m.match(s)
    m = compile_lucene_regexp("s~(.*e)")
    assert m.match("spark") and m.match("s")
    assert not m.match("sure") and not m.match("table")
    m = compile_lucene_regexp("(se.*&.*ed)")
    assert m.match("seed") and m.match("searched")
    assert not m.match("sed".replace("s", "t")) and not m.match("se")
    assert m.match("sed")


def test_interval_semantics():
    m = compile_lucene_regexp("<1-20>")  # digits=0: any leading zeros
    for s in ("1", "7", "07", "007", "20", "020"):
        assert m.match(s), s
    for s in ("0", "21", "007x", "", "00"):
        assert not m.match(s), s
    m = compile_lucene_regexp("<05-10>")  # digits=2: exactly two chars
    for s in ("05", "07", "10"):
        assert m.match(s), s
    for s in ("5", "010", "11", "04"):
        assert not m.match(s), s
    m = compile_lucene_regexp("<0-3>")  # equal widths: digits=1, no padding
    assert m.match("0") and m.match("3")
    assert not m.match("4") and not m.match("00")
    m = compile_lucene_regexp("<0-10>")  # widths differ: digits=0
    assert m.match("0") and m.match("000") and m.match("010") and m.match("10")
    assert not m.match("11") and not m.match("")


def test_parse_errors_match_reference_contract():
    with pytest.raises(ValueError):
        parse_lucene_regexp("a{b")
    with pytest.raises(ValueError):
        parse_lucene_regexp("(a")
    with pytest.raises(ValueError):
        parse_lucene_regexp('"unterminated')
    with pytest.raises(ValueError):
        parse_lucene_regexp("\\a")  # invalid escape (RegExp.java:1279)
    with pytest.raises(NotImplementedError):
        parse_lucene_regexp("<myautomaton>")  # named automata need a provider
    with pytest.raises(ValueError):
        parse_lucene_regexp("<1-2-3>")


def test_flags_gate_operators():
    from lucene_spark.regexp import COMPLEMENT, INTERSECTION, NONE

    # with NONE, '&' '~' '#' '@' '<' are plain literal characters
    m = DerivativeMatcher(parse_lucene_regexp("a&b", NONE))
    assert m.match("a&b") and not m.match("ab")
    m = DerivativeMatcher(parse_lucene_regexp("~a", NONE))
    assert m.match("~a")
    m = DerivativeMatcher(parse_lucene_regexp("a&b", INTERSECTION))
    assert not m.match("a&b")
    m = DerivativeMatcher(parse_lucene_regexp("~a", COMPLEMENT))
    assert m.match("zz") and not m.match("a")


@settings(max_examples=40, deadline=None)
@given(st.lists(SHORT, max_size=30), st.sampled_from(AUTOMATON_PATTERNS))
def test_match_batch_equals_scalar(terms, lpat):
    m = DerivativeMatcher(parse_lucene_regexp(lpat))
    got = m.match_batch(terms)
    exp = np.array([m.match(t) for t in terms], dtype=bool)
    assert (got == exp).all()


def test_structural_bounds():
    ast = parse_lucene_regexp("s(.*&.*ed)")
    assert literal_prefix(ast) == "s"
    assert min_len(ast) == 3
    assert max_len(ast) is None
    ast = parse_lucene_regexp("ab{2,3}c")
    assert min_len(ast) == 4 and max_len(ast) == 5
    assert literal_prefix(ast) == "a"
    ast = parse_lucene_regexp("~(ab)")
    assert min_len(ast) == 0 and max_len(ast) is None
    ast = parse_lucene_regexp("(abc|abd)e")
    assert min_len(ast) == 4 and max_len(ast) == 4


def test_state_cap_raises():
    # exponential-state pattern family: (a|b)*a(a|b)^n needs 2^n DFA states
    pat = "(a|b)*a" + "(a|b)" * 16
    with pytest.raises(ValueError, match="too complex"):
        m = DerivativeMatcher(parse_lucene_regexp(pat))
        m.match_batch(["ab" * 40] * 4)
