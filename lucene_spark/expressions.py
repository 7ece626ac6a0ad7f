"""Compiled scoring expressions — the reference's ``expressions`` module
(expressions/src/java/org/apache/lucene/expressions/js/, grammar documented
in its package-info.java) re-expressed for Catalyst.

The reference compiles a JavaScript-like numeric expression to JVM
bytecode with ASM (JavascriptCompiler.java) and evaluates it per doc
against bound DoubleValuesSources. The Spark-first analog compiles the
same grammar to a Catalyst Column tree — which whole-stage codegen then
compiles to JVM bytecode, so the execution story is the same
(expression -> JVM bytecode) with Catalyst standing in for ASM, and the
evaluation is vectorized over every matching doc instead of one callback
per doc.

Supported grammar (package-info.java of expressions/js):

- integer / floating point / hex (0x..) / octal (0..) literals
- arithmetic ``+ - * / %``, comparisons ``< <= > >= == !=`` (→ 1.0/0.0),
  boolean ``&& || !`` (operand truthiness = value != 0) and the ternary
  ``?:``
- bitwise ``| & ^ ~ << >> >>>`` on the long cast of the double operands
  (JavascriptCompiler pushes D2L / op / L2D); shift amounts must fold to
  a constant (Catalyst's shift functions take a literal count) — a
  non-constant shift raises
- the default function table (JavascriptCompiler.properties): abs acos
  acosh asin asinh atan atan2 atanh ceil cos cosh exp floor haversin ln
  log10 logn max min pow sin sinh sqrt tan tanh
- free variables, resolved through bindings at query time

Documented envelope: NaN ordering — Catalyst orders NaN above every
double, so comparisons (and min/max via least/greatest) involving NaN
differ from Java's always-false NaN comparisons and NaN-propagating
Math.min/max (FunctionScoreQuery's top-level NaN->0 guard is replicated
exactly, search.py); haversin is the exact haversine in kilometers (mean
earth radius), not SloppyMath's table approximation — consistent with
this repo's geo module; bitwise ops assume operands within long range
(Java's D2L saturation at the extremes is not replicated by Catalyst's
cast).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, Tuple

from pyspark.sql import Column, functions as F

#: bindings sentinel for the relevance score of the wrapped query
#: (DoubleValuesSource.SCORES)
SCORE = "__score__"

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>0[xX][0-9a-fA-F]+|(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)"
    r"|(?P<name>[A-Za-z_][A-Za-z0-9_.]*)"
    r"|(?P<op><<|>>>|>>|<=|>=|==|!=|&&|\|\||[-+*/%()?:,<>!~&|^])"
    r")"
)


def _tokenize(text: str):
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None or m.end() == pos:
            if text[pos:].strip() == "":
                break
            raise ValueError(f"bad token at {text[pos:pos+10]!r}")
        if m.group("num") is not None:
            t = m.group("num")
            if t[:2].lower() == "0x":
                v = float(int(t, 16))
            elif re.fullmatch(r"0[0-7]+", t):
                v = float(int(t, 8))  # octal literal, like the JS grammar
            else:
                v = float(t)
            out.append(("num", v))
        elif m.group("name") is not None:
            out.append(("name", m.group("name")))
        else:
            out.append(("op", m.group("op")))
        pos = m.end()
    out.append(("end", None))
    return out


class _Parser:
    """Recursive-descent over the JS precedence ladder
    (JavascriptParser.java's grammar, lowest to highest):
    ?: || && | ^ & (== !=) (< <= > >=) (<< >> >>>) (+ -) (* / %) unary."""

    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def eat(self, kind, val=None):
        k, v = self.toks[self.i]
        if k != kind or (val is not None and v != val):
            raise ValueError(f"expected {val or kind}, got {v!r}")
        self.i += 1
        return v

    def parse(self):
        ast = self.ternary()
        if self.peek()[0] != "end":
            raise ValueError(f"trailing input at {self.peek()[1]!r}")
        return ast

    def ternary(self):
        cond = self.binary(0)
        if self.peek() == ("op", "?"):
            self.eat("op", "?")
            a = self.ternary()
            self.eat("op", ":")
            b = self.ternary()
            return ("cond", cond, a, b)
        return cond

    _LEVELS = [
        ("||",),
        ("&&",),
        ("|",),
        ("^",),
        ("&",),
        ("==", "!="),
        ("<", "<=", ">", ">="),
        ("<<", ">>", ">>>"),
        ("+", "-"),
        ("*", "/", "%"),
    ]

    def binary(self, lvl):
        if lvl == len(self._LEVELS):
            return self.unary()
        node = self.binary(lvl + 1)
        while self.peek()[0] == "op" and self.peek()[1] in self._LEVELS[lvl]:
            op = self.eat("op")
            rhs = self.binary(lvl + 1)
            node = ("bin", op, node, rhs)
        return node

    def unary(self):
        k, v = self.peek()
        if k == "op" and v in ("-", "+", "!", "~"):
            self.eat("op")
            return ("un", v, self.unary())
        return self.primary()

    def primary(self):
        k, v = self.peek()
        if k == "num":
            self.eat("num")
            return ("num", v)
        if k == "name":
            self.eat("name")
            if self.peek() == ("op", "("):
                self.eat("op", "(")
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.ternary())
                    while self.peek() == ("op", ","):
                        self.eat("op", ",")
                        args.append(self.ternary())
                self.eat("op", ")")
                return ("call", v, tuple(args))
            return ("var", v)
        if k == "op" and v == "(":
            self.eat("op", "(")
            node = self.ternary()
            self.eat("op", ")")
            return node
        raise ValueError(f"unexpected {v!r}")


def _dbl(c: Column) -> Column:
    return c.cast("double")


def _haversin_km(lat1, lon1, lat2, lon2) -> Column:
    # exact haversine, mean earth radius in km (SloppyMath.haversinKilometers
    # role; the reference's table-driven approximation is out of scope, like
    # the geo module's envelope)
    r = F.radians
    h = (
        F.pow(F.sin((r(lat2) - r(lat1)) / 2), 2)
        + F.cos(r(lat1)) * F.cos(r(lat2)) * F.pow(F.sin((r(lon2) - r(lon1)) / 2), 2)
    )
    return F.lit(2.0 * 6371.0087714) * F.asin(F.sqrt(h))


#: name -> (arity, Column builder) — JavascriptCompiler.properties table
FUNCTIONS = {
    "abs": (1, F.abs),
    "acos": (1, F.acos),
    "acosh": (1, F.acosh),
    "asin": (1, F.asin),
    "asinh": (1, F.asinh),
    "atan": (1, F.atan),
    "atan2": (2, F.atan2),
    "atanh": (1, F.atanh),
    "ceil": (1, lambda c: _dbl(F.ceil(c))),
    "cos": (1, F.cos),
    "cosh": (1, F.cosh),
    "exp": (1, F.exp),
    "floor": (1, lambda c: _dbl(F.floor(c))),
    "haversin": (4, _haversin_km),
    "ln": (1, F.log),
    "log10": (1, F.log10),
    # MathUtil.log(base, x) = ln(x) / ln(base)
    "logn": (2, lambda base, x: F.log(x) / F.log(base)),
    "max": (2, F.greatest),
    "min": (2, F.least),
    "pow": (2, F.pow),
    "sin": (1, F.sin),
    "sinh": (1, F.sinh),
    "sqrt": (1, F.sqrt),
    "tan": (1, F.tan),
    "tanh": (1, F.tanh),
}


def _const_fold(ast):
    """Fold a pure-literal subtree to its float value, else None (used for
    shift amounts, which Catalyst takes as literals)."""
    if ast[0] == "num":
        return ast[1]
    if ast[0] == "un" and ast[1] in ("-", "+"):
        v = _const_fold(ast[2])
        return None if v is None else (-v if ast[1] == "-" else v)
    return None


def _variables(ast, out):
    if ast[0] == "var":
        out.add(ast[1])
    elif ast[0] == "bin":
        _variables(ast[2], out)
        _variables(ast[3], out)
    elif ast[0] == "un":
        _variables(ast[2], out)
    elif ast[0] == "cond":
        for a in ast[1:]:
            _variables(a, out)
    elif ast[0] == "call":
        for a in ast[2]:
            _variables(a, out)


def _bool01(c: Column) -> Column:
    return F.when(c, F.lit(1.0)).otherwise(F.lit(0.0))


def _truthy(c: Column) -> Column:
    return c != F.lit(0.0)


def _to_column(ast, resolve: Callable[[str], Column]) -> Column:
    kind = ast[0]
    if kind == "num":
        return F.lit(float(ast[1]))
    if kind == "var":
        return _dbl(resolve(ast[1]))
    if kind == "cond":
        return F.when(
            _truthy(_to_column(ast[1], resolve)), _to_column(ast[2], resolve)
        ).otherwise(_to_column(ast[3], resolve))
    if kind == "un":
        op, a = ast[1], _to_column(ast[2], resolve)
        if op == "-":
            return -a
        if op == "+":
            return a
        if op == "!":
            return _bool01(a == F.lit(0.0))
        return _dbl(F.bitwise_not(a.cast("long")))  # ~
    if kind == "call":
        name, args = ast[1], ast[2]
        if name not in FUNCTIONS:
            raise ValueError(f"unknown function {name!r}")
        arity, fn = FUNCTIONS[name]
        if len(args) != arity:
            raise ValueError(f"{name} takes {arity} args, got {len(args)}")
        return fn(*[_to_column(a, resolve) for a in args])
    op = ast[1]
    if op in ("<<", ">>", ">>>"):
        n = _const_fold(ast[3])
        if n is None:
            raise NotImplementedError(
                "shift amounts must be constant expressions"
            )
        a = _to_column(ast[2], resolve).cast("long")
        n = int(n) & 63  # Java long shifts mask the count with 0x3f
        sh = {"<<": F.shiftleft, ">>": F.shiftright, ">>>": F.shiftrightunsigned}
        return _dbl(sh[op](a, n))
    a = _to_column(ast[2], resolve)
    b = _to_column(ast[3], resolve)
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        return a / b
    if op == "%":
        return a % b
    if op in ("&", "|", "^"):
        al, bl = a.cast("long"), b.cast("long")
        return _dbl(
            al.bitwiseAND(bl) if op == "&"
            else al.bitwiseOR(bl) if op == "|"
            else al.bitwiseXOR(bl)
        )
    if op == "&&":
        return _bool01(_truthy(a) & _truthy(b))
    if op == "||":
        return _bool01(_truthy(a) | _truthy(b))
    cmps = {
        "<": lambda: a < b, "<=": lambda: a <= b, ">": lambda: a > b,
        ">=": lambda: a >= b, "==": lambda: a == b, "!=": lambda: a != b,
    }
    return _bool01(cmps[op]())


@dataclass(frozen=True)
class Expression:
    """A compiled expression (expressions/Expression.java): ``source`` text,
    free ``variables``, and ``to_column(resolver)`` in place of
    evaluate(DoubleValues[])."""

    source: str
    ast: tuple
    variables: Tuple[str, ...]

    def to_column(self, resolve: Callable[[str], Column]) -> Column:
        return _to_column(self.ast, resolve)


def _check_calls(ast):
    if ast[0] == "call":
        name, args = ast[1], ast[2]
        if name not in FUNCTIONS:
            raise ValueError(f"unknown function {name!r}")
        if len(args) != FUNCTIONS[name][0]:
            raise ValueError(
                f"{name} takes {FUNCTIONS[name][0]} args, got {len(args)}"
            )
        for a in args:
            _check_calls(a)
    elif ast[0] in ("bin", "un", "cond"):
        for a in ast[2:] if ast[0] != "cond" else ast[1:]:
            _check_calls(a)


def compile_expression(text: str) -> Expression:
    """JavascriptCompiler.compile analog: parse + validate the function
    table once (compile-time errors, like the reference's ParseException),
    reuse per query."""
    ast = _Parser(_tokenize(text)).parse()
    _check_calls(ast)
    out: set = set()
    _variables(ast, out)
    return Expression(source=text, ast=ast, variables=tuple(sorted(out)))
