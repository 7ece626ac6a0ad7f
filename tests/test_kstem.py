"""KStem (Krovetz dictionary-validated English stemmer): full parity with
the reference's vocabulary data (analysis/en/kstemTestData.zip — all ~12k
(word, stem) pairs, TestKStemmer.testVocabulary style), plus the
KStemFilter token contract (KStemFilter.java: lowercase input assumed,
non-alphabetic and length-bounded terms pass through)."""

import os
import zipfile

import pytest

from lucene_spark.kstem import kstem
from lucene_spark.lang import CHAINS

_ZIP = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
    "analysis/en/kstemTestData.zip"
)

# embedded sample (from kstemTestData.zip) so the test has teeth without
# the reference checkout; one per ending routine + dictionary tiers
_VECTORS = [
    ("abatement", "abate"),         # -ment
    ("abettors", "abet"),           # plural + doubled consonant
    ("abdicated", "abdicate"),      # past tense -> -e root
    ("amplification", "amplify"),   # -ication -> -y
    ("anglicization", "anglicize"), # -ization -> -ize
    ("announcing", "announce"),     # aspect -> -e root
    ("calories", "calorie"),        # -ies with dictionary backstop
    ("crosses", "cross"),           # double-s guard
    ("dying", "die"),               # direct conflation
    ("italians", "italy"),          # country/nationality conflation
    ("aide", "aide"),               # exception word stays
    ("aided", "aid"),               # ... but inflected form stems
    ("immunity", "immune"),         # -ity variant-in-dictionary rule
    ("militarily", "military"),     # -ily -> -y
    ("optimal", "optimum"),         # -al -> -um
    ("injunctive", "injunction"),   # -ive -> -ion
    ("running", "running"),         # in dictionary as-is
    ("zoos", "zoo"),                # plain plural
]


@pytest.mark.parametrize("word,want", _VECTORS)
def test_kstem_embedded_vectors(word, want):
    assert kstem(word) == want


def test_kstem_full_reference_vocabulary():
    """Every (word, stem) pair in the reference's VocabularyAssert data."""
    if not os.path.exists(_ZIP):
        pytest.skip("reference checkout not present")
    bad = []
    n = 0
    with zipfile.ZipFile(_ZIP) as zf:
        for line in zf.read("kstem_examples.txt").decode().splitlines():
            if "\t" not in line:
                continue
            w, want = line.split("\t")[:2]
            n += 1
            got = kstem(w)
            if got != want:
                bad.append((w, want, got))
    assert n > 12000
    assert not bad, bad[:10]


def test_kstem_token_contract():
    # short (<=2) and over-long (>=50) terms pass through unchanged
    assert kstem("as") == "as"
    long = "a" * 50
    assert kstem(long) == long
    # non-alphabetic terms pass through (stemmer requires lowercase a-z)
    assert kstem("c3po") == "c3po"
    assert kstem("mid-term") == "mid-term"


def test_kstem_chain_registered():
    fn = CHAINS["english_kstem"].token_fn
    # the chain lowercases before stemming (LowerCaseFilter precedes
    # KStemFilter in the reference chain)
    assert fn("Abatements") == "abate"
    assert fn("INDEXES") == "index"
