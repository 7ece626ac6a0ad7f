"""SimpleQueryParser vs the reference's own test vectors
(queryparser/simple/TestSimpleQueryParser.java) — AST structural equality
with default operator MUST (the reference harness's setting), plus the
fail-soft garbage cases. No Spark needed."""

import pytest

from lucene_spark.query import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)
from lucene_spark.simpleparser import (
    AND_OPERATOR,
    NOT_OPERATOR,
    OR_OPERATOR,
    PHRASE_OPERATOR,
    PRECEDENCE_OPERATORS,
    WHITESPACE_OPERATOR,
    simple_parse,
)


def parse(text, flags=-1):
    return simple_parse(text, flags=flags, default_operator=Occur.MUST)


def bq(*pairs, msm=0):
    return BooleanQuery(
        clauses=tuple(BooleanClause(q, o) for q, o in pairs),
        minimum_should_match=msm,
    )


T = lambda t: TermQuery(term=t)
MUST, SHOULD, MUST_NOT = Occur.MUST, Occur.SHOULD, Occur.MUST_NOT


def test_term():
    assert parse("foobar") == T("foobar")


def test_fuzzy():
    expected = FuzzyQuery(term="foobar", max_edits=2)
    assert parse("foobar~2") == expected
    assert parse("foobar~") == expected
    assert parse("foobar~a") == T("foobar")
    assert parse("foobar~1a") == T("foobar")
    # over-max fuzziness capped at 2 (LevenshteinAutomata max)
    assert parse("foo~3 bar") == bq(
        (FuzzyQuery(term="foo", max_edits=2), MUST), (T("bar"), MUST)
    )


def test_phrase_and_slop():
    p = PhraseQuery(terms=("foo", "bar"))
    assert parse('"foo bar"') == p
    assert parse('"foo bar"~2') == PhraseQuery(terms=("foo", "bar"), slop=2)
    assert parse('"foo bar"~10') == PhraseQuery(terms=("foo", "bar"), slop=10)
    # trailing tilde / junk / negative slop all ignored
    assert parse('"foo bar"~') == p
    assert parse('"foo bar"~a') == p
    assert parse('"foo bar"~1a') == p
    assert parse('"foo bar"~-1') == p
    assert parse('"foo bar"~12 baz') == bq(
        (PhraseQuery(terms=("foo", "bar"), slop=12), MUST), (T("baz"), MUST)
    )


def test_prefix():
    assert parse("foobar*") == PrefixQuery(prefix="foobar")
    assert parse("st*ar*") == PrefixQuery(prefix="st*ar")
    # escaped '*' stays literal; final unescaped '*' is the operator
    assert parse("st*ar\\**") == PrefixQuery(prefix="st*ar*")


def test_and_or_not():
    assert parse("foo+bar") == bq((T("foo"), MUST), (T("bar"), MUST))
    assert parse("foo bar") == bq((T("foo"), MUST), (T("bar"), MUST))
    assert parse("foo|bar") == bq((T("foo"), SHOULD), (T("bar"), SHOULD))
    assert parse("foo||bar") == bq((T("foo"), SHOULD), (T("bar"), SHOULD))
    assert parse('"foo bar"+"star wars"') == bq(
        (PhraseQuery(terms=("foo", "bar")), MUST),
        (PhraseQuery(terms=("star", "wars")), MUST),
    )
    neg = bq((T("foo"), MUST_NOT), (MatchAllDocsQuery(), SHOULD))
    assert parse("-foo") == neg
    assert parse("-(foo)") == neg
    assert parse("---foo") == neg
    assert parse("--foo") == T("foo")  # double negation cancels


def test_garbage_fail_soft():
    star = T("star")
    for s in ["star", "star\n", "star\r", "star\t", "star(", "star)",
              'star"', "\t \r\n\nstar   \n \r \t ", '- + "" - star \\']:
        assert parse(s) == star, s
    none = MatchNoDocsQuery(reason="empty string passed to query parser")
    for s in ["", "  ", "\\ ", "\\ \\ ", '""', '" "', '" "|" "',
              '(" "|" ")', '" " " "', '(" " " ")']:
        assert parse(s) == none, repr(s)


def test_garbage_operators():
    exp_and = bq((T("star"), MUST), (T("wars"), MUST))
    for s in ["star wars", "star+wars", "     star     wars   ",
              "     star +    wars   ", "  |     star + + |   wars   ",
              "  |     star + + |   wars   \\"]:
        assert parse(s) == exp_and, s
    exp_or = bq((T("star"), SHOULD), (T("wars"), SHOULD))
    for s in ["star|wars", "     star |    wars   ",
              "  |     star | + |   wars   ",
              "  +     star | + +   wars   \\"]:
        assert parse(s) == exp_or, s


def test_precedence_groups():
    got = parse("(foo|bar) (baz|qux)")
    exp = bq(
        (bq((T("foo"), SHOULD), (T("bar"), SHOULD)), MUST),
        (bq((T("baz"), SHOULD), (T("qux"), SHOULD)), MUST),
    )
    assert got == exp
    # unclosed paren degrades to literal text
    assert parse("(star wars") == bq((T("star"), MUST), (T("wars"), MUST))


def test_operator_change_renests():
    # a|b c -> MUST( SHOULD(a,b)... ) per buildQueryTree's re-parenting
    got = parse("foo|bar baz")
    exp = bq(
        (bq((T("foo"), SHOULD), (T("bar"), SHOULD)), MUST),
        (T("baz"), MUST),
    )
    assert got == exp


def test_match_all_star():
    assert parse("*") == MatchAllDocsQuery()
    assert parse("  *  ") == MatchAllDocsQuery()


def test_flags_disable_features():
    # NOT disabled: '-' is literal text, analyzer strips it
    assert parse("-star", flags=AND_OPERATOR | WHITESPACE_OPERATOR) == T("star")
    # PHRASE disabled: quotes are token chars, analyzer splits
    got = parse('"foo bar"', flags=WHITESPACE_OPERATOR | AND_OPERATOR)
    assert got == bq((T("foo"), MUST), (T("bar"), MUST))
    # PREFIX disabled: trailing '*' analyzed away
    assert parse("foobar*", flags=WHITESPACE_OPERATOR) == T("foobar")


def test_multifield_weights():
    got = simple_parse("foo", weights={"a": 1.0, "b": 2.0})
    assert got == bq(
        (TermQuery(term="foo", field="a"), SHOULD),
        (TermQuery(term="foo", field="b", boost=2.0), SHOULD),
    )


def test_default_operator_validation():
    with pytest.raises(ValueError):
        simple_parse("x", default_operator=Occur.MUST_NOT)
