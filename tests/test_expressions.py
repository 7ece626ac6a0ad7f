"""Compiled scoring expressions (expressions/js/JavascriptCompiler.java
grammar) and FunctionScoreQuery
(queries/function/FunctionScoreQuery.java): the Catalyst compilation is
checked against an independent pure-Python evaluator of the same grammar,
and the query semantics (score guard, bindings, boostByQuery shape)
against hand-computed scores."""

import math

import numpy as np
import pytest

from lucene_spark.build import IndexConfig, build_index
from lucene_spark.expressions import SCORE, compile_expression
from lucene_spark.query import FunctionScoreQuery, TermQuery
from lucene_spark.search import Searcher

from oracle import make_corpus


def _py_eval(text, env):
    """Independent evaluator: translate the JS grammar to Python eval with
    a math namespace (the test's reference semantics)."""
    t = text.replace("&&", " and ").replace("||", " or ")
    # 'c ? a : b' -> 'c and [a] or [b]' + a closing bracket per ternary;
    # list wrapping keeps falsy branches truthy for the and/or trick
    n_ternary = t.count("?")
    t = t.replace("?", " and [").replace(":", "] or [") + "]" * n_ternary

    class _Env(dict):
        def __missing__(self, k):
            raise KeyError(k)

    ns = _Env(
        abs=abs, sqrt=math.sqrt, ln=math.log, log10=math.log10,
        pow=math.pow, exp=math.exp, floor=lambda x: float(math.floor(x)),
        ceil=lambda x: float(math.ceil(x)), min=min, max=max,
        sin=math.sin, cos=math.cos, tan=math.tan, atan2=math.atan2,
        logn=lambda b, x: math.log(x) / math.log(b),
        **env,
    )
    v = eval(t, {"__builtins__": {}}, ns)
    while isinstance(v, list):
        v = v[0]
    return float(v)


CASES = [
    ("1 + 2 * 3", {}),
    ("(0.3*popularity)/10.0 + 0.7*score", {"popularity": 42.0, "score": 1.5}),
    ("sqrt(x) + ln(y)", {"x": 9.0, "y": math.e}),
    ("max(a, b) - min(a, b)", {"a": 3.5, "b": -2.0}),
    ("a > 2 ? a * 10 : a / 10", {"a": 3.0}),
    ("a > 2 ? a * 10 : a / 10", {"a": 1.0}),
    ("x >= 1 && y < 5", {"x": 1.0, "y": 3.0}),
    ("x >= 1 || y < 5", {"x": 0.0, "y": 9.0}),
    ("-x + +y", {"x": 4.0, "y": 2.0}),
    ("pow(2, 10) % 7", {}),
    ("logn(2, 8)", {}),
    ("atan2(1, 1) * 4", {}),
    ("floor(2.7) + ceil(2.1)", {}),
    ("x != 0 ? 1.5 : 1.0", {"x": 0.7}),
]


@pytest.mark.parametrize("text,env", CASES)
def test_expression_matches_python_eval(spark, text, env):
    expr = compile_expression(text)
    assert set(expr.variables) == set(env)
    df = spark.range(1)
    from pyspark.sql import functions as F

    col = expr.to_column(lambda v: F.lit(env[v]))
    got = df.select(col.alias("v")).collect()[0]["v"]
    assert got == pytest.approx(_py_eval(text, env), rel=1e-12)


def test_expression_bitwise_and_shifts(spark):
    from pyspark.sql import functions as F

    for text, exp in [
        ("(12 & 10) + (12 | 10) + (12 ^ 10)", float((12 & 10) + (12 | 10) + (12 ^ 10))),
        ("~5 + 1", float(~5 + 1)),
        ("1 << 10", 1024.0),
        ("256 >> 2", 64.0),
        ("256 >>> 2", 64.0),
        ("1 << 66", 4.0),  # Java masks long shift counts with 0x3f
    ]:
        col = compile_expression(text).to_column(lambda v: F.lit(0.0))
        got = spark.range(1).select(col.alias("v")).collect()[0]["v"]
        assert got == exp, text


def test_expression_literals(spark):
    # hex 16 + octal 8 + 150 (the JS grammar's literal forms)
    from pyspark.sql import functions as F

    col = compile_expression("0x10 + 010 + 1.5e2").to_column(
        lambda v: F.lit(0.0)
    )
    assert spark.range(1).select(col.alias("v")).collect()[0]["v"] == 174.0


def test_expression_errors():
    from pyspark.sql import functions as F

    with pytest.raises(ValueError):
        compile_expression("nosuchfn(1)")  # compile-time, like ParseException
    with pytest.raises(ValueError):
        compile_expression("pow(2)")  # wrong arity
    with pytest.raises(ValueError):
        compile_expression("1 +")
    with pytest.raises(ValueError):
        compile_expression("(1")
    with pytest.raises(NotImplementedError):
        compile_expression("1 << x").to_column(lambda v: F.lit(2.0))


@pytest.fixture(scope="module")
def built(spark):
    docs = make_corpus(60, ["red", "green", "blue", "fast"], seed=5)
    df = spark.createDataFrame(
        [(i, t, float(10 + i)) for i, t in enumerate(docs)],
        "doc_id long, content string, pop double",
    )
    cfg = IndexConfig(seg_size=16, store_cols=("pop",))
    idx = build_index(df, cfg, doc_id_col="doc_id").persist()
    yield idx
    idx.unpersist()


def test_function_score_rescore(spark, built):
    s = Searcher(built, dtype=np.float64)
    inner = TermQuery(term="red")
    base = {
        int(r["doc_id"]): float(r["score"])
        for r in s.search(inner, 100, prune=False).collect()
    }
    q = FunctionScoreQuery(
        query=inner,
        expression="0.3*score + 0.7*sqrt(pop)",
        bindings=(("score", SCORE), ("pop", "pop")),
    )
    got = {
        int(r["doc_id"]): float(r["score"])
        for r in s.search(q, 100, prune=False).collect()
    }
    assert set(got) == set(base)
    for d, v in got.items():
        assert v == pytest.approx(
            0.3 * base[d] + 0.7 * math.sqrt(10.0 + d), rel=1e-9
        )


def test_function_score_negative_is_zero(spark, built):
    s = Searcher(built, dtype=np.float64)
    q = FunctionScoreQuery(
        query=TermQuery(term="red"),
        expression="0 - pop",
        bindings=(("pop", "pop"),),
    )
    rows = s.search(q, 100, prune=False).collect()
    assert rows and all(float(r["score"]) == 0.0 for r in rows)


def test_function_score_boost_by_query_shape(spark, built):
    """boostByQuery as a Query binding: score * 2 where the boost query
    matches, preserved elsewhere (FunctionScoreQuery.boostByQuery)."""
    s = Searcher(built, dtype=np.float64)
    inner = TermQuery(term="red")
    base = {
        int(r["doc_id"]): float(r["score"])
        for r in s.search(inner, 100, prune=False).collect()
    }
    fast_docs = {
        int(r["doc_id"])
        for r in s.search(TermQuery(term="fast"), 100, prune=False).collect()
    }
    q = FunctionScoreQuery(
        query=inner,
        expression="score * (b != 0 ? 2.0 : 1.0)",
        bindings=(("score", SCORE), ("b", TermQuery(term="fast"))),
    )
    got = {
        int(r["doc_id"]): float(r["score"])
        for r in s.search(q, 100, prune=False).collect()
    }
    assert set(got) == set(base)
    for d, v in got.items():
        factor = 2.0 if d in fast_docs else 1.0
        assert v == pytest.approx(base[d] * factor, rel=1e-9)


def test_function_score_unbound_variable_raises(built):
    s = Searcher(built, dtype=np.float64)
    q = FunctionScoreQuery(
        query=TermQuery(term="red"), expression="score + 1", bindings=()
    )
    with pytest.raises(ValueError):
        s.search(q, 10)


def test_rescore_query_combines(spark, built):
    """QueryRescorer.rescore: firstPass + weight*second where matched,
    restricted to the first pass's top-N."""
    s = Searcher(built, dtype=np.float64)
    first, second, w, n = TermQuery(term="red"), TermQuery(term="fast"), 2.5, 8
    base = [
        (int(r["doc_id"]), float(r["score"]))
        for r in s.search(first, n, prune=False).collect()
    ]
    sec = {
        int(r["doc_id"]): float(r["score"])
        for r in s.search(second, 1000, prune=False).collect()
    }
    exp = sorted(
        ((d, b + w * sec.get(d, 0.0)) for d, b in base),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in s.rescore_query(first, second, w, first_pass_k=n, k=5).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (gd, gv), (_, ev) in zip(got, exp):
        assert gv == pytest.approx(ev, rel=1e-9)
    # docs outside the first-pass top-N never enter the rescored list
    assert {d for d, _ in got} <= {d for d, _ in base}


def test_rescore_expression_sorts_by_value(spark, built):
    """ExpressionRescorer: top-N re-sorted by the expression value (no
    FunctionScoreQuery guard — negative values rank, not zero out)."""
    s = Searcher(built, dtype=np.float64)
    first, n = TermQuery(term="red"), 8
    base = {
        int(r["doc_id"]): float(r["score"])
        for r in s.search(first, n, prune=False).collect()
    }
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in s.rescore_expression(
            first, "0 - pop + 0.001*score",
            (("score", SCORE), ("pop", "pop")),
            first_pass_k=n, k=5,
        ).collect()
    ]
    exp = sorted(
        ((d, -(10.0 + d) + 0.001 * b) for d, b in base.items()),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (gd, gv), (_, ev) in zip(got, exp):
        assert gv == pytest.approx(ev, rel=1e-9)
    assert all(v < 0 for _, v in got)  # unguarded negatives survive
