"""String distances vs the reference's own test vectors
(TestJaroWinklerDistance.java, TestNGramDistance.java,
TestLevenshteinDistance.java-style checks) + the DirectSpellChecker
distance plug-in."""

import pytest

from lucene_spark.strdist import jaro_winkler, lucene_levenshtein, ngram_distance

approx = lambda v: pytest.approx(v, abs=0.001)


def test_jaro_winkler_reference_vectors():
    assert jaro_winkler("al", "al") == 1.0
    assert 0.961 < jaro_winkler("martha", "marhta") < 0.962
    assert 0.832 < jaro_winkler("jones", "johnson") < 0.833
    assert 0.958 < jaro_winkler("abcvwxyz", "cabvwxyz") < 0.959
    assert 0.84 < jaro_winkler("dwayne", "duane") < 0.841
    assert 0.813 < jaro_winkler("dixon", "dicksonx") < 0.814
    assert jaro_winkler("fvie", "ten") == 0.0
    assert jaro_winkler("zac ephron", "zac efron") > jaro_winkler(
        "zac ephron", "kai ephron"
    )
    assert jaro_winkler("brittney spears", "britney spears") > jaro_winkler(
        "brittney spears", "brittney startzman"
    )


def test_ngram1_reference_vectors():
    n = 1
    assert ngram_distance("al", "al", n) == approx(1.0)
    assert ngram_distance("b", "a", n) == approx(0.0)
    assert ngram_distance("martha", "marhta", n) == approx(0.6666)
    assert ngram_distance("jones", "johnson", n) == approx(0.4285)
    assert ngram_distance("natural", "contrary", n) == approx(0.25)
    assert ngram_distance("abcvwxyz", "cabvwxyz", n) == approx(0.75)
    assert ngram_distance("dwayne", "duane", n) == approx(0.666)
    assert ngram_distance("dixon", "dicksonx", n) == approx(0.5)
    assert ngram_distance("six", "ten", n) == approx(0.0)


def test_ngram2_reference_vectors():
    assert ngram_distance("al", "al") == approx(1.0)
    assert ngram_distance("a", "aa") == approx(0.5)
    assert ngram_distance("martha", "marhta") == approx(0.6666)
    assert ngram_distance("jones", "johnson") == approx(0.4285)
    assert ngram_distance("natural", "contrary") == approx(0.25)
    assert ngram_distance("abcvwxyz", "cabvwxyz") == approx(0.625)
    assert ngram_distance("dwayne", "duane") == approx(0.5833)
    assert ngram_distance("dixon", "dicksonx") == approx(0.5)
    assert ngram_distance("0012345678", "0012890678") == approx(
        ngram_distance("0012345678", "0072385698")
    )


def test_ngram3_reference_vectors():
    assert ngram_distance("martha", "marhta", 3) == approx(0.7222)


def test_lucene_levenshtein():
    # transposition counts as ONE edit; normalized by min length
    assert lucene_levenshtein("form", "from") == approx(1.0 - 1 / 4)
    assert lucene_levenshtein("abc", "abc") == approx(1.0)
    assert lucene_levenshtein("abc", "abd") == approx(1.0 - 1 / 3)
    assert lucene_levenshtein("", "") == 0.0
    assert lucene_levenshtein("", "ab") == 2.0  # max(n, m), reference quirk


def test_spell_suggest_distance_plugin(spark):
    from lucene_spark.functions.suggest import spell_suggest

    terms = spark.createDataFrame(
        [("martha", 5), ("marhta", 4), ("marsha", 3), ("zebra", 2)],
        "term string, doc_freq long",
    )
    got = spell_suggest(
        terms, "martta", num_sug=3, suggest_mode="always",
        distance="jaro_winkler", accuracy=0.5,
    ).collect()
    keys = [r["key"] for r in got]
    assert keys[0] in ("martha", "marhta")
    assert all(r["score"] >= 0.5 for r in got)
    # candidates stay OSA-banded: zebra never appears
    assert "zebra" not in keys
    with pytest.raises(ValueError):
        spell_suggest(terms, "martta", distance="bogus").collect()
