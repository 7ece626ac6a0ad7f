"""Hunspell stemming parity, validated on the reference's OWN fixtures
(analysis/common/src/test/.../hunspell/*.aff|*.dic) with the expected
stems transcribed verbatim from the corresponding reference tests
(StemmerTestBase.assertStemsTo — sorted multiset comparison). Each class
below names its reference test file."""

import os

import pytest

from lucene_spark.hunspell import (
    HunspellDictionary,
    Stemmer,
    load_dictionary,
    word_case,
)

FIXTURES = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
    "analysis/hunspell"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not available"
)


def make(aff, *dics, ignore_case=False):
    return Stemmer(
        load_dictionary(
            os.path.join(FIXTURES, aff),
            [os.path.join(FIXTURES, d) for d in dics],
            ignore_case=ignore_case,
        )
    )


def assert_stems(stemmer, word, *expected):
    # StemmerTestBase.assertStemsTo: sorted arrays must be equal
    assert sorted(stemmer.stem(word)) == sorted(expected), word


# ---------------- TestStemmer.java (simple.aff/simple.dic) ----------------


@pytest.fixture(scope="module")
def simple():
    return make("simple.aff", "simple.dic")


def test_simple_suffix(simple):
    assert_stems(simple, "lucene", "lucene", "lucen")
    assert_stems(simple, "mahoute", "mahout")


def test_simple_prefix(simple):
    assert_stems(simple, "solr", "olr")


def test_recursive_suffix(simple):
    assert_stems(simple, "abcd")


def test_stemming(simple):
    assert_stems(simple, "ab", "ab")
    assert_stems(simple, "abc", "ab")
    assert_stems(simple, "apach", "apach")
    assert_stems(simple, "apache", "apach")
    assert_stems(simple, "foo", "foo", "foo")
    assert_stems(simple, "food", "foo")
    assert_stems(simple, "foos", "foo")
    assert_stems(simple, "lucen", "lucen")
    assert_stems(simple, "lucene", "lucen", "lucene")
    assert_stems(simple, "mahout", "mahout")
    assert_stems(simple, "moo", "moo")
    assert_stems(simple, "mood", "moo")
    assert_stems(simple, "olr", "olr")
    # false positives must NOT stem
    for bogus in (
        "abs", "abe", "sab", "sapach", "sapache", "apachee", "sfoo",
        "sfoos", "fooss", "lucenee", "solre",
    ):
        assert_stems(simple, bogus)


# ------------- TestCaseInsensitive.java (simple.aff/mixedcase.dic) -------


def test_case_insensitive():
    s = make("simple.aff", "mixedcase.dic", ignore_case=True)
    assert_stems(s, "lucene", "lucene", "lucen")
    assert_stems(s, "LuCeNe", "lucene", "lucen")
    assert_stems(s, "mahoute", "mahout")
    assert_stems(s, "MaHoUte", "mahout")
    assert_stems(s, "solr", "olr")
    assert_stems(s, "abcd")
    assert_stems(s, "ab", "ab")
    assert_stems(s, "abc", "ab")
    assert_stems(s, "foo", "foo", "foo")
    assert_stems(s, "food", "foo")
    assert_stems(s, "lucen", "lucen")
    for bogus in ("sab", "sapach", "apachee", "fooss", "lucenee", "solre"):
        assert_stems(s, bogus)


# ---------------- TestCaseSensitive.java ----------------


@pytest.fixture(scope="module")
def casesens():
    return make("casesensitive.aff", "casesensitive.dic")


def test_case_sensitive_all(casesens):
    s = casesens
    assert_stems(s, "drink", "drink")
    assert_stems(s, "drinks", "drink")
    assert_stems(s, "drinkS", "drink")
    assert_stems(s, "gooddrinks", "drink")
    assert_stems(s, "Gooddrinks", "drink", "drink")
    assert_stems(s, "GOODdrinks", "drink")
    assert_stems(s, "gooddrinkS", "drink")
    assert_stems(s, "GooddrinkS", "drink")
    assert_stems(s, "gooddrink", "drink")
    assert_stems(s, "Gooddrink", "drink", "drink")
    assert_stems(s, "GOODdrink", "drink")
    assert_stems(s, "Drink", "drink", "Drink")
    assert_stems(s, "Drinks", "drink", "Drink")
    assert_stems(s, "DrinkS", "Drink")
    assert_stems(s, "goodDrinks", "Drink")
    assert_stems(s, "GoodDrinks", "Drink")
    assert_stems(s, "GOODDrinks", "Drink")
    assert_stems(s, "goodDrinkS", "Drink")
    assert_stems(s, "GoodDrinkS", "Drink")
    assert_stems(s, "GOODDrinkS", "Drink")
    assert_stems(s, "goodDrink", "Drink")
    assert_stems(s, "GoodDrink", "Drink")
    assert_stems(s, "GOODDrink", "Drink")
    assert_stems(s, "DRINK", "DRINK", "drink", "Drink")
    assert_stems(s, "DRINKs", "DRINK")
    assert_stems(s, "DRINKS", "DRINK", "drink", "Drink")
    assert_stems(s, "goodDRINKs", "DRINK")
    assert_stems(s, "GoodDRINKs", "DRINK")
    assert_stems(s, "GOODDRINKs", "DRINK")
    assert_stems(s, "goodDRINKS", "DRINK")
    assert_stems(s, "GoodDRINKS", "DRINK")
    assert_stems(s, "GOODDRINKS", "DRINK", "drink", "drink")
    assert_stems(s, "goodDRINK", "DRINK")
    assert_stems(s, "GoodDRINK", "DRINK")
    assert_stems(s, "GOODDRINK", "DRINK", "drink", "drink")


# ---------------- TestCondition / TestOptionalCondition / TestCondition2 --


@pytest.mark.parametrize("aff", ["condition.aff", "optional-condition.aff"])
def test_condition(aff):
    s = make(aff, "condition.dic")
    assert_stems(s, "hello", "hello")
    assert_stems(s, "try", "try")
    assert_stems(s, "tried", "try")
    assert_stems(s, "work", "work")
    assert_stems(s, "worked", "work")
    assert_stems(s, "rework", "work")
    assert_stems(s, "reworked", "work")
    for bogus in ("retried", "workied", "tryed", "tryied", "helloed"):
        assert_stems(s, bogus)


def test_condition2_iso8859():
    s = make("condition2.aff", "condition2.dic")
    assert_stems(s, "monopolies", "monopoly")


# ---------------- escapes / flags / strips ----------------


def test_escaped():
    s = make("escaped.aff", "escaped.dic")
    assert_stems(s, "/", "/")
    assert_stems(s, "works", "work")
    assert_stems(s, "work", "work")
    assert_stems(s, "R2/D2", "R2/D2", "R2/d2")
    assert_stems(s, "R2/D2s", "R2/D2")
    assert_stems(s, "N/A", "N/A")
    assert_stems(s, "N/As")
    assert_stems(s, "/a", "/a")
    assert_stems(s, "//")


def test_double_escape():
    s = make("double-escaped.aff", "double-escaped.dic")
    assert_stems(s, "adubo", "adubar")


def test_flag_long():
    s = make("flaglong.aff", "flaglong.dic")
    assert_stems(s, "foo", "foo")
    assert_stems(s, "foos", "foo")
    assert_stems(s, "fooss")
    assert_stems(s, "foobogus")


def test_flag_num():
    s = make("flagnum.aff", "flagnum.dic")
    assert_stems(s, "foo", "foo")
    assert_stems(s, "foos", "foo")
    assert_stems(s, "fooss")


def test_full_strip():
    s = make("fullstrip.aff", "fullstrip.dic")
    assert_stems(s, "tasty", "beer")
    assert_stems(s, "as", "a")
    assert_stems(s, "s")


def test_zero_affix():
    s = make("zeroaffix.aff", "zeroaffix.dic")
    assert_stems(s, "drink", "drinksierranevada")


# ---------------- IGNORE / NEEDAFFIX / CIRCUMFIX / COMPLEXPREFIXES -------


def test_ignore():
    s = make("ignore.aff", "ignore.dic")
    assert_stems(s, "drink", "drink")
    assert_stems(s, "drinkable", "drink")
    assert_stems(s, "dr'ink-able", "drink")
    assert_stems(s, "drank-able", "drank")
    assert_stems(s, "'-'-'-")


def test_needaffix():
    s = make("needaffix.aff", "needaffix.dic")
    assert_stems(s, "drink", "drink")
    assert_stems(s, "drinks", "drink")
    assert_stems(s, "walk")
    assert_stems(s, "walks", "walk")
    assert_stems(s, "prewalk", "walk")
    assert_stems(s, "prewalks", "walk")
    assert_stems(s, "test")
    assert_stems(s, "pretest")
    assert_stems(s, "tests")
    assert_stems(s, "pretests")


def test_circumfix():
    s = make("circumfix.aff", "circumfix.dic")
    assert_stems(s, "nagy", "nagy")
    assert_stems(s, "nagyobb", "nagy")
    assert_stems(s, "legnagyobb", "nagy")
    assert_stems(s, "legeslegnagyobb", "nagy")
    assert_stems(s, "nagyobbobb")
    assert_stems(s, "legnagy")
    assert_stems(s, "legeslegnagy")


def test_complex_prefixes():
    s = make("complexprefix.aff", "complexprefix.dic")
    assert_stems(s, "ptwofoo", "foo")
    assert_stems(s, "poneptwofoo", "foo")
    assert_stems(s, "foosuf", "foo")
    assert_stems(s, "ptwofoosuf", "foo")
    assert_stems(s, "poneptwofoosuf", "foo")
    for bogus in ("ponefoo", "ponefoosuf", "ptwoponefoo", "ptwoponefoosuf"):
        assert_stems(s, bogus)


# ---------------- homonyms / morph data / conversions ----------------


def test_homonyms():
    s = make("homonyms.aff", "homonyms.dic")
    assert_stems(s, "works", "work", "work")


def test_morph():
    s = make("morph.aff", "morph.dic")
    assert_stems(s, "drink", "drink")
    assert_stems(s, "drinkable", "drink")
    assert_stems(s, "drinkableable")


def test_morph_alias():
    s = make("morphalias.aff", "morphalias.dic")
    assert_stems(s, "feet", "foot")
    assert_stems(s, "feetscratcher", "foot")
    assert_stems(s, "work", "workverb", "worknoun")
    assert_stems(s, "works", "workverb", "worknoun")
    assert_stems(s, "notspecial", "notspecial")
    assert_stems(s, "simplenoun", "simplenoun")
    assert_stems(s, "simplenouns", "simplenoun")
    assert_stems(s, "simplenounscratcher")


def test_conv():
    s = make("conv.aff", "conv.dic")
    assert_stems(s, "drink", "drInk")
    assert_stems(s, "drInk", "drInk")
    assert_stems(s, "drInkAble", "drInk")
    assert_stems(s, "drInkABle", "drInk")
    assert_stems(s, "drinkABle", "drInk")


# ---------------- casing regimes ----------------


def test_dutch_ij():
    s = make("IJ.aff", "IJ.dic")
    assert_stems(s, "ijs", "ijs")
    assert_stems(s, "IJs", "ijs")


def test_alternate_casing_turkish():
    s = make("alternate-casing.aff", "alternate-casing.dic")
    assert_stems(s, "drink", "drink")
    assert_stems(s, "DRİNK", "drink")
    assert_stems(s, "DRINK")
    assert_stems(s, "drinki", "drink")
    assert_stems(s, "DRİNKİ", "drink")
    assert_stems(s, "DRİNKI")
    assert_stems(s, "DRINKI")
    assert_stems(s, "DRINKİ")
    assert_stems(s, "idrink", "drink")
    assert_stems(s, "İDRİNK", "drink")
    assert_stems(s, "IDRİNK")
    assert_stems(s, "IDRINK")
    assert_stems(s, "İDRINK")
    assert_stems(s, "idrinki", "drink")
    assert_stems(s, "İDRİNKİ", "drink")
    assert_stems(s, "rıver", "rıver")
    assert_stems(s, "RIVER", "rıver")
    assert_stems(s, "RİVER")
    assert_stems(s, "rıverı", "rıver")
    assert_stems(s, "RIVERI", "rıver")
    assert_stems(s, "RİVERI")
    assert_stems(s, "RİVERİ")
    assert_stems(s, "RIVERİ")
    assert_stems(s, "ırıver", "rıver")
    assert_stems(s, "IRIVER", "rıver")
    assert_stems(s, "IRİVER")
    assert_stems(s, "İRİVER")
    assert_stems(s, "İRIVER")
    assert_stems(s, "ırıverı", "rıver")


def test_check_sharps():
    s = make("checksharps.aff", "checksharps.dic")
    assert_stems(s, "Müßig", "müßig")
    assert_stems(s, "MÜSSIG", "müßig")
    assert_stems(s, "Müssig")
    assert_stems(s, "PROZESSIONSSTRASSE", "Prozessionsstraße")


def test_keepcase_stemming():
    # TestKeepCase: keepcase affects spell-checking, not stemming
    s = make("keepcase.aff", "keepcase.dic")
    assert_stems(s, "drink", "drink")
    assert_stems(s, "Drink", "drink")
    assert_stems(s, "DRINK", "drink")
    assert_stems(s, "drinks", "drink")
    assert_stems(s, "Drinks", "drink")
    assert_stems(s, "DRINKS", "drink")
    assert_stems(s, "walk", "walk")
    assert_stems(s, "walks", "walk")
    assert_stems(s, "Walk", "walk")
    assert_stems(s, "Walks", "walk")
    assert_stems(s, "WALKS", "walk")
    assert_stems(s, "test", "test")
    assert_stems(s, "Test", "test")
    assert_stems(s, "TEST", "test")
    assert_stems(s, "baz.", "baz.")
    assert_stems(s, "Baz.", "baz.")
    assert_stems(s, "Quux.", "Quux.")
    assert_stems(s, "QUUX.", "Quux.")
    assert_stems(s, "Ways", "way", "ways")
    assert_stems(s, "WAYS", "way", "ways")


# ---------------- unit-level ----------------


def test_word_case():
    assert word_case("WORD") == "UPPER"
    assert word_case("Word") == "TITLE"
    assert word_case("word") == "LOWER"
    assert word_case("WoRd") == "MIXED"
    assert word_case("wOrd") == "MIXED"
    assert word_case("-") == "NEUTRAL"


def test_unique_stems():
    s = make("homonyms.aff", "homonyms.dic")
    assert s.unique_stems("works") == ["work"]


def test_inline_dictionary_text():
    d = HunspellDictionary(
        "SET UTF-8\nSFX A Y 1\nSFX A 0 s .\n", ["2\ncat/A\ndog\n"]
    )
    s = Stemmer(d)
    assert s.stem("cats") == ["cat"]
    assert s.stem("dogs") == []
    assert s.stem("dog") == ["dog"]


# ---------------- analyzer-chain integration ----------------


def test_register_chain_analyze_series():
    import pandas as pd

    from lucene_spark.analysis import analyze_series
    from lucene_spark.hunspell import register_chain

    register_chain(
        "hunspell_test_cond",
        os.path.join(FIXTURES, "condition.aff"),
        [os.path.join(FIXTURES, "condition.dic")],
    )
    out = list(
        analyze_series(
            pd.Series(["reworked tried hello unknownword", "Work tryed"]),
            chain="hunspell_test_cond",
        )
    )
    # tryed fails the [^y] condition -> passes through unchanged;
    # Work title-folds through the stemmer's case variation
    assert out == [["work", "try", "hello", "unknownword"], ["work", "tryed"]]


def test_filter_token_longest_only():
    s = make("simple.aff", "simple.dic")
    # "lucene" stems to {lucene, lucen}: longest wins (lengthComparator)
    assert s.d is not None
    assert s.filter_token("lucene") == "lucene"
    assert s.filter_token("unknown") == "unknown"


def test_filter_index_end_to_end(spark):
    # the worker-safe integration: the HunspellFilter ships to executors
    # inside the pickled IndexConfig (dynamic chain names registered via
    # register_chain are driver-side only — analyze_series, MemoryIndex)
    from lucene_spark.build import IndexConfig, build_index
    from lucene_spark.hunspell import HunspellFilter
    from lucene_spark.query import TermQuery
    from lucene_spark.search import Searcher

    filt = HunspellFilter.load(
        os.path.join(FIXTURES, "condition.aff"),
        [os.path.join(FIXTURES, "condition.dic")],
    )
    df = spark.createDataFrame(
        [(0, "reworked hello"), (1, "tried work"), (2, "hello tryed")],
        "doc_id long, content string",
    )
    cfg = IndexConfig(chain="standard", seg_size=4, block_size=16,
                      with_positions=False, hunspell=filt)
    idx = build_index(df, cfg, doc_id_col="doc_id")
    s = Searcher(idx)
    hits = sorted(r["doc_id"] for r in s.search(TermQuery(term="work"), 10).collect())
    assert hits == [0, 1]
    hits = sorted(r["doc_id"] for r in s.search(TermQuery(term="try"), 10).collect())
    assert hits == [1]
    # tryed failed the [^y] condition -> indexed unchanged
    hits = sorted(r["doc_id"] for r in s.search(TermQuery(term="tryed"), 10).collect())
    assert hits == [2]
    idx.unpersist()


def test_filter_overlap_mode_and_manifest_roundtrip(spark, tmp_path):
    # dedup mode: multiple stems overlap at one position (posIncr=0) and
    # discount from the norm like synonyms; manifest round-trips by path
    import numpy as np

    from lucene_spark.build import (
        IndexConfig, build_index, read_index, write_index,
    )
    from lucene_spark.hunspell import HunspellFilter
    from lucene_spark.query import TermQuery
    from lucene_spark.search import Searcher

    filt = HunspellFilter.load(
        os.path.join(FIXTURES, "simple.aff"),
        [os.path.join(FIXTURES, "simple.dic")],
        longest_only=False,
    )
    df = spark.createDataFrame(
        [(0, "lucene apache"), (1, "mahoute moo")],
        "doc_id long, content string",
    )
    cfg = IndexConfig(chain="standard", seg_size=4, block_size=16,
                      with_positions=False, hunspell=filt)
    idx = build_index(df, cfg, doc_id_col="doc_id")
    s = Searcher(idx)
    # "lucene" expands to {lucene, lucen}: both terms hit doc 0
    for t in ("lucene", "lucen"):
        assert [r["doc_id"] for r in s.search(TermQuery(term=t), 10).collect()] == [0]
    # overlaps norm-discount: doc 0 has 2 source tokens + 1 overlap
    # (length counts all indexed tokens; the norm uses the discounted count)
    row = {r["doc_id"]: r for r in idx.docs.collect()}
    assert (row[0]["length"], row[0]["num_overlap"], row[0]["norm"]) == (3, 1, 2)
    out = str(tmp_path / "hunspell_idx")
    write_index(idx, out)
    reopened = read_index(idx.docs.sparkSession, out)
    assert reopened.config.hunspell is not None
    assert reopened.config.hunspell.longest_only is False
    s2 = Searcher(reopened)
    assert [r["doc_id"] for r in s2.search(TermQuery(term="lucen"), 10).collect()] == [0]
    idx.unpersist()


def test_oracle_map_consistency():
    # the q_term_hunspell oracle's rename map must equal the live stemmer
    # (the consistency rule the language-chain oracle maps follow)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    s = Stemmer(HunspellDictionary(m._HUNSPELL_AFF, [m._HUNSPELL_DIC]))
    for surface, stem in m._HUNSPELL_MAP:
        assert s.filter_token(surface) == stem, surface
    # and nothing else in the corpus's fixed vocabulary stems
    for w in ("fast", "customer", "query", "vector", "spark", "merge"):
        assert s.filter_token(w) == w, w


# ---------------- additional reference suites ----------------


def test_all_caps():
    # TestAllCaps: apostrophe capitalization + hidden twins for UPPER/MIXED
    s = make("allcaps.aff", "allcaps.dic")
    assert_stems(s, "OpenOffice.org", "OpenOffice.org")
    assert_stems(s, "UNICEF's", "UNICEF")
    assert_stems(s, "L'Afrique", "Afrique")
    assert_stems(s, "L'AFRIQUE", "Afrique")
    assert_stems(s, "OPENOFFICE.ORG", "Openoffice.org")
    assert_stems(s, "UNICEF'S", "Unicef")
    assert_stems(s, "Openoffice.org", "Openoffice.org")
    assert_stems(s, "Unicef", "Unicef")
    assert_stems(s, "Unicef's", "Unicef")


def test_dependencies():
    # TestDependencies: twofold suffixes + prefix flags carried by the
    # inner suffix's continuation classes
    s = make("dependencies.aff", "dependencies.dic")
    assert_stems(s, "drink", "drink", "drink")
    assert_stems(s, "drinks", "drink", "drink")
    assert_stems(s, "drinkable", "drink")
    assert_stems(s, "drinkables", "drink")
    assert_stems(s, "undrinkable", "drink")
    assert_stems(s, "undrinkables", "drink")
    assert_stems(s, "undrink")
    assert_stems(s, "undrinks")
    assert_stems(s, "hydration", "hydrate")
    assert_stems(s, "dehydrate", "hydrate")
    assert_stems(s, "dehydration", "hydrate")
    assert_stems(s, "calorie", "calorie", "calorie")
    assert_stems(s, "calories", "calorie")


def test_base_utf():
    # TestBaseUtf: the dotted-I case-change guard for non-tr dictionaries
    s = make("base_utf.aff", "base_utf.dic")
    assert_stems(s, "imply", "imply")
    assert_stems(s, "Imply", "imply")
    assert_stems(s, "IMPLY", "imply")
    assert_stems(s, "İZMİR", "İzmir")
    assert_stems(s, "İmply")
    assert_stems(s, "İMPLY")


def test_two_suffixes():
    s = make("twosuffixes.aff", "twosuffixes.dic")
    assert_stems(s, "drink", "drink")
    assert_stems(s, "drinkable", "drink")
    assert_stems(s, "drinks", "drink")
    assert_stems(s, "drinkableable")
    assert_stems(s, "drinkss")


def test_two_fold():
    # twofold suffix: plural strips only through the able/Y continuation
    s = make("twofold.aff", "morph.dic")
    assert_stems(s, "drink", "drink")
    assert_stems(s, "drinkable", "drink")
    assert_stems(s, "drinkables", "drink")
    assert_stems(s, "drinksable")
    assert_stems(s, "drinkableable")
    assert_stems(s, "drinks")


def test_only_in_compound():
    # ONLYINCOMPOUND roots/affixes never match as simple words
    s = make("onlyincompound.aff", "onlyincompound.dic")
    assert_stems(s, "drink", "drink")
    assert_stems(s, "drinks", "drink")
    assert_stems(s, "drinked")
    assert_stems(s, "predrink")
    assert_stems(s, "predrinked")
    assert_stems(s, "walk")


def test_spaces():
    # TestSpaces: dictionary words containing spaces (morphBoundary only
    # splits before tabs or xx: morph fields) + st: exceptions
    s = make("spaces.aff", "spaces.dic")
    assert_stems(s, "four", "four")
    assert_stems(s, "fours", "four")
    assert_stems(s, "five", "five")
    assert_stems(s, "forty four", "forty four")
    assert_stems(s, "forty fours", "forty four")
    assert_stems(s, "forty five", "forty five")
    assert_stems(s, "fifty", "50")
    assert_stems(s, "fiftys", "50")
    assert_stems(s, "sixty", "60")
    assert_stems(s, "sixty four", "64")
    assert_stems(s, "fifty four", "54")
    assert_stems(s, "fifty fours", "54")
