"""Compound-word decompounding vs the reference's own test vectors
(analysis/compound/TestCompoundWordTokenFilter.java) plus the index
integration (posIncr=0 subword injection, norm discount, commit
round-trip)."""

import os

import pytest

from lucene_spark.compound import (
    DictionaryDecompounder,
    HyphenationDecompounder,
    HyphenationTree,
    decompounder_from_json,
)

_REF = "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/analysis/compound"
_DA_XML = os.path.join(_REF, "da_UTF8.xml")
_8124_XML = os.path.join(_REF, "hyphenation-LUCENE-8124.xml")

needs_ref = pytest.mark.skipif(
    not os.path.exists(_DA_XML), reason="reference checkout not present"
)

_SE_DICT = frozenset(
    ["Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar", "Pelar", "Glas",
     "Ögon", "Fodral", "Bas", "Fiol", "Makare", "Gesäll", "Sko", "Vind",
     "Rute", "Torkare", "Blad"]
)


def _da(**kw):
    with open(_DA_XML, encoding="utf-8") as f:
        return HyphenationDecompounder(grammar_xml=f.read(), **kw)


# -- DictionaryCompoundWordTokenFilter vectors ------------------------------


def test_dumb_compound_words_se():
    """testDumbCompoundWordsSE: the full Swedish battery."""
    d = DictionaryDecompounder(words=_SE_DICT)
    expected = {
        "Bildörr": ["Bil", "dörr"],
        "Bilmotor": ["Bil", "motor"],
        "Biltak": ["Bil", "tak"],
        "Slagborr": ["Slag", "borr"],
        "Hammarborr": ["Hammar", "borr"],
        "Pelarborr": ["Pelar", "borr"],
        "Glasögonfodral": ["Glas", "ögon", "fodral"],
        "Basfiolsfodral": ["Bas", "fiol", "fodral"],
        "Basfiolsfodralmakaregesäll": ["Bas", "fiol", "fodral", "makare", "gesäll"],
        "Skomakare": ["Sko", "makare"],
        "Vindrutetorkare": ["Vind", "rute", "torkare"],
        "Vindrutetorkarblad": ["Vind", "rute", "blad"],
        "abba": [],
    }
    for word, subs in expected.items():
        assert d.decompose(word) == subs, word


def test_dumb_compound_words_se_longest_match():
    """testDumbCompoundWordsSELongestMatch."""
    d = DictionaryDecompounder(
        words=_SE_DICT - {"Fiol"} | {"Fiols", "Fiolsfodral"},
        only_longest_match=True,
    )
    assert d.decompose("Basfiolsfodralmakaregesäll") == [
        "Bas", "fiolsfodral", "fodral", "makare", "gesäll"
    ]


def test_token_ending_with_min_length_component():
    """testTokenEndingWithWordComponentOfMinimumLength."""
    d = DictionaryDecompounder(words=frozenset(["ab", "cd", "ef"]))
    assert d.decompose("abcdef") == ["ab", "cd", "ef"]


def test_component_below_min_subword_size_skipped():
    """testWordComponentWithLessThanMinimumLength: 'd' < minSubwordSize."""
    d = DictionaryDecompounder(words=frozenset(["abc", "d", "efg"]))
    assert d.decompose("abcdefg") == ["abc", "efg"]


def test_min_word_size_gate():
    """CompoundWordTokenFilterBase.incrementToken: words shorter than
    minWordSize never decompose."""
    d = DictionaryDecompounder(words=frozenset(["ab", "cd"]))
    assert d.decompose("abcd") == []  # len 4 < DEFAULT_MIN_WORD_SIZE 5
    assert d.decompose("abcdx") == ["ab", "cd"]


# -- HyphenationCompoundWordTokenFilter vectors -----------------------------


@needs_ref
def test_hyphenation_compound_words_da():
    """testHyphenationCompoundWordsDA: læsehest -> læse, hest."""
    d = _da(words=frozenset(["læse", "hest"]))
    assert d.decompose("læsehest") == ["læse", "hest"]
    for w in ["min", "veninde", "som", "er", "lidt", "af", "en"]:
        assert d.decompose(w) == []


@needs_ref
def test_hyphenation_compound_words_de_longest_match():
    """testHyphenationCompoundWordsDELongestMatch: basket dropped."""
    d = _da(
        words=frozenset(["basketball", "basket", "ball", "kurv"]),
        max_subword_size=40,
        only_longest_match=True,
    )
    assert d.decompose("basketballkurv") == ["basketball", "ball", "kurv"]


@needs_ref
def test_hyphenation_only_min_max_windows():
    """testHyphenationOnly: no dictionary, three min/max windows."""
    assert _da(no_dictionary=True, min_subword_size=2, max_subword_size=4).decompose(
        "basketballkurv"
    ) == ["ba", "sket", "bal", "ball", "kurv"]
    assert _da(no_dictionary=True, min_subword_size=4, max_subword_size=6).decompose(
        "basketballkurv"
    ) == ["basket", "sket", "ball", "lkurv", "kurv"]
    assert _da(no_dictionary=True, min_subword_size=4, max_subword_size=10).decompose(
        "basketballkurv"
    ) == [
        "basket", "basketbal", "basketball", "sket", "sketbal", "sketball",
        "ball", "ballkurv", "lkurv", "kurv",
    ]


@needs_ref
def test_lucene_8124_quirk_parity():
    """testLucene8124: the reference emits the whole word again as a part
    ('Rindfleisch' -> Rind, Rindfleisch, fleisch) — bug-compatible."""
    with open(_8124_XML, encoding="utf-8") as f:
        d = HyphenationDecompounder(grammar_xml=f.read(), no_dictionary=True)
    assert d.decompose("Rindfleisch") == ["Rind", "Rindfleisch", "fleisch"]


@needs_ref
def test_hyphenation_points_java_parity():
    """HyphenationTree.hyphenate returns letter-index points with the 0/len
    sentinels (HyphenationTree.java:355-361)."""
    t = HyphenationTree.from_xml_file(_DA_XML)
    assert t.hyphenate("basketballkurv", 1, 1) == (0, 2, 6, 9, 10, 14)
    assert t.hyphenate("ab", 1, 1) is None  # len < remain+push
    assert t.hyphenate("læse4hest", 1, 1) is None  # non-letter mid-word


def test_genitive_s_recheck():
    """decompose's partLength-1 dictionary re-check (binding 's')."""
    # grammar with a single break between 'bils' and 'dör' analog: use a
    # synthetic two-pattern grammar forcing a break after position 4
    xml = """<hyphenation-info>
<classes>
aA bB cC dD eE fF gG hH iI jJ kK lL mM nN oO pP qQ rR sS tT uU vV wW xX yY zZ öÖ
</classes>
<patterns>
ls1d
</patterns>
</hyphenation-info>"""
    d = HyphenationDecompounder(
        grammar_xml=xml, words=frozenset(["bil", "dörr", "fodral"])
    )
    # 'bilsdörr' hyphenates after 'bils'; 'bils' not in dict but 'bil' is
    assert "bil" in d.decompose("bilsdörr")


def test_decompounder_json_round_trip():
    d = DictionaryDecompounder(words=frozenset(["ab", "cd"]), only_longest_match=True)
    assert decompounder_from_json(d.to_json()) == d
    h = HyphenationDecompounder(
        grammar_xml="<hyphenation-info><classes>aA</classes></hyphenation-info>",
        no_dictionary=True,
        min_subword_size=3,
    )
    assert decompounder_from_json(h.to_json()) == h
    assert decompounder_from_json(None) is None


# -- index integration ------------------------------------------------------


def test_decompound_index_overlaps_and_norm_discount(spark):
    """Subwords are injected at the compound's position (posIncr=0):
    length/tf/sttf count them, the norm discounts them, phrase queries see
    the subword at the compound's position, and the commit point
    round-trips the decompounder."""
    import numpy as np

    from lucene_spark.build import IndexConfig, build_index, read_index, write_index
    from lucene_spark.check import check_index
    from lucene_spark.query import PhraseQuery, TermQuery
    from lucene_spark.search import Searcher

    # ASCII dictionary: the standard chain's tokenizer is ASCII-scoped, so
    # the non-ASCII reference vectors are covered by the pure decompose
    # tests above; the decompounder sees post-chain tokens
    dec = DictionaryDecompounder(words=frozenset(["basket", "ball", "kurv"]))
    rows = [
        (0, "nytt basketballkurv idag"),
        (1, "ett kurv till"),
        (2, "ball och vatten"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = IndexConfig(
        chain="standard", with_positions=True, seg_size=64, decompound=dec
    )
    idx = build_index(df, cfg, content_col="text", doc_id_col="doc_id",
                      auto_seg_size=False, eager=True)
    got = {
        int(r["doc_id"]): (int(r["length"]), int(r["num_overlap"]), int(r["norm"]))
        for r in idx.docs.collect()
    }
    # doc0: 3 base + 3 injected subwords -> length 6, overlaps 3, norm byte4(3)
    assert got == {0: (6, 3, 3), 1: (3, 0, 3), 2: (3, 0, 3)}
    assert idx.stats.sum_total_term_freq == 12  # 9 base + 3 injected
    s = Searcher(idx, dtype=np.float64)
    assert sorted(
        int(r["doc_id"]) for r in s.matches(TermQuery(term="kurv")).collect()
    ) == [0, 1]
    # subword sits AT the compound's position: "nytt basket" phrase matches
    assert [
        int(r["doc_id"])
        for r in s.matches(PhraseQuery(terms=("nytt", "basket"))).collect()
    ] == [0]
    check_index(idx)
    path = str(__import__("tempfile").mkdtemp()) + "/decidx"
    write_index(idx, path)
    r = read_index(spark, path)
    assert r.config.decompound == dec
    check_index(r)
    idx.unpersist()
