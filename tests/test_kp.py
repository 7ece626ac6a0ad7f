"""Kraaij-Pohlmann Dutch stemmer (snowball 'Kp'): full parity with the
reference's vocabulary data (analysis/snowball/kp.zip — all 2,000
(voc, output) pairs, TestSnowballVocab style), plus pinned pairs from the
compiled-reference dev oracle covering the machine's corners (ge- prefix
and infix removal, lengthen_V vowel doubling, 'ij' vowel units, Y-marking,
'je' left contexts, undoubling incl. v->f / z->s)."""

import os
import zipfile

import pytest

from lucene_spark.kp import kp_stem
from lucene_spark.lang import CHAINS, STOP_HOLE

_ZIP = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
    "analysis/snowball/kp.zip"
)

# pinned (word, stem) pairs, verified against org.tartarus.snowball.ext
# .KpStemmer compiled from the reference and run as a dev-time oracle
_VECTORS = [
    ("gegeven", "geef"),            # ge- prefix removal + lengthen_V
    ("uitgegeven", "uitgeef"),      # ge- infix removal
    ("gewerkt", "werk"),            # ge- prefix + Step_1c 't' drop
    ("boekjes", "boek"),            # 'jes' diminutive
    ("mannen", "man"),              # 'en' + undouble
    ("maken", "maak"),              # 'en' + lengthen_V (open syllable)
    ("lopen", "loop"),              # same with 'o'
    ("geven", "geef"),              # 'e' lengthening
    ("lichamelijk", "lichamelijk"),
    ("mogelijkheden", "molijk"),    # heden -> heid, then lijkheid chain
    ("appelen", "appeel"),          # lengthen_V after 'en' removal
    ("vrijheid", "vrijheid"),       # 'ij' counts as one vowel unit
    ("blijven", "blijf"),           # v -> f undouble path
    ("huizen", "huis"),             # z -> s
    ("katjes", "kat"),              # tje after short vowel
    ("mandjes", "mand"),            # dje
    ("koninkje", "koon"),           # inkje -> ing, then ing strip + lengthen
    ("bloempje", "bloem"),          # mpje -> m
    ("politieagentje", "politieagen"),  # tje with VX context
    ("studenten", "student"),
    ("fotografie", "fotograaf"),    # fie (R2) + lengthen
    ("biologie", "biologie"),       # gie blocked: R2 not reached
    ("organisatie", "organiseer"),  # atie -> eer
    ("kwaliteit", "kwaal"),         # iteit + lengthen
    ("lezer", "lezer"),             # 'er' is not in the suffix tables
    ("ys", "ys"),                   # initial y is marked consonant
    ("baryton", "baryton"),         # vowel+y marking
]


@pytest.mark.parametrize("word,want", _VECTORS)
def test_kp_pinned_vectors(word, want):
    assert kp_stem(word) == want


def test_kp_full_reference_vocabulary():
    """All 2,000 (voc.txt, output.txt) pairs from the reference's kp.zip."""
    if not os.path.exists(_ZIP):
        pytest.skip("reference checkout not present")
    with zipfile.ZipFile(_ZIP) as zf:
        voc = zf.read("voc.txt").decode().split()
        out = zf.read("output.txt").decode().split()
    assert len(voc) == len(out) == 2000
    bad = [(w, e, kp_stem(w)) for w, e in zip(voc, out) if kp_stem(w) != e]
    assert not bad, bad[:10]


def test_kp_chain_registered():
    fn = CHAINS["dutch_kp"].token_fn
    assert fn("Boekjes") == "boek"
    assert fn("de") == STOP_HOLE  # Dutch stopword -> position hole
