"""Serbian analysis chain: snowball Serbian stemmer (pinned pairs verified
against the reference stemmer compiled and run as a dev-time oracle over
an 18,837-word battery — suffix-table words, Cyrillic, ije/je/dj/syllabic-r
patterns — 0 mismatches), the SerbianNormalizationFilter vectors from
TestSerbianNormalizationFilter.java, and the full chain."""

import pytest

from lucene_spark.lang import CHAINS, STOP_HOLE
from lucene_spark.serbian import serbian_normalize, serbian_stem

# (word, stem) pinned from the compiled-reference oracle
_VECTORS = [
    ("ljubavi", "ljubav"),
    ("devojka", "devojk"),
    ("девојка", "devojk"),          # Cyrillic -> Latin prelude
    ("pjevati", "pevat"),           # C'je'C -> e
    ("nijesam", "nesa"),            # C'ije'C -> e
    ("okruženju", "okruženj"),
    ("vrtovi", "vrtov"),
    ("prsti", "prst"),              # syllabic r
    ("srpski", "srpsk"),
    ("računari", "računar"),
    ("najjači", "najjač"),
    ("aa", "a"),                    # vowel-only word keeps provisional p1
    ("adjektiv", "adektiv"),        # C'je'C -> e fires before dj -> đ
    ("gradovi", "gradov"),
    ("djevojkama", "devojk"),       # dj -> đ then stem to devojk
]


@pytest.mark.parametrize("word,want", _VECTORS)
def test_serbian_stem_pinned(word, want):
    assert serbian_stem(word) == want


def test_serbian_normalization_reference_vectors():
    # TestSerbianNormalizationFilter.java testCyrillic / testLatin
    assert (
        serbian_normalize("абвгдђежзијклљмнњопрстћуфхцчџш")
        == "abvgddjezzijklljmnnjoprstcufhccdzs"
    )
    assert (
        serbian_normalize("abcčćddžđefghijklljmnnjoprsštuvzž")
        == "abcccddzdjefghijklljmnnjoprsstuvzz"
    )
    assert serbian_normalize("") == ""


def test_serbian_chain():
    fn = CHAINS["serbian"].token_fn
    # stem THEN normalize (SerbianAnalyzer filter order)
    assert fn("Девојкама") == "devojk"
    assert fn("okruženju") == "okruzenj"
    assert fn("i") == STOP_HOLE
    assert fn("jesu") == STOP_HOLE
    # Cyrillic tokens must survive the tokenizer pattern
    pat = CHAINS["serbian"].pattern
    assert pat.findall("ово је тест") == ["ово", "је", "тест"]
