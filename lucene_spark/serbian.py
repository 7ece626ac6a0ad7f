"""Serbian analysis: snowball Serbian stemmer + normalization filter.

Stemmer re-expresses org/tartarus/snowball/ext/SerbianStemmer.java as
plain scan/suffix logic over the machine-extracted data tables in
serbiandata.py; validated against the reference stemmer compiled and run
as a dev-time oracle (tests/test_serbian.py pins sampled pairs).

Pipeline (SerbianAnalyzer, analysis/sr/SerbianAnalyzer.java:59-68):
StandardTokenizer -> lowercase -> stop -> SerbianStemmer ->
SerbianNormalizationFilter (bald Latin transliteration AFTER stemming).

Stemmer shape (SerbianStemmer.java):
- cyr_to_lat: global Cyrillic -> Latin letter map (ljubav stays 'lj' via
  the two-char letters lje/nje/dzhe) (:2264)
- prelude: C'ije'C -> CeC, C'je'C -> CeC (C = consonant incl. diacritics),
  'dj' -> 'dj-ligature' (đ) (:2395)
- mark_regions: no_diacritics flag; p1 after the first vowel (or, for a
  vowel-initial word, after the first consonant); syllabic-r adjustment
  (:2517)
- Step_1 (no region), then Step_2 (R1) else Step_3 (R1, delete): longest
  suffix from the extracted tables; guard=True rows require a
  diacritic-free word (:2641, 2960, 3646)
"""

from __future__ import annotations

from typing import Optional

from .serbiandata import CYR_TO_LAT, STEP1, STEP2, STEP3

_VOWELS = frozenset("aeiou")
_DIACRITICS = frozenset("ćčđšž")  # ć č đ š ž
_CONS = frozenset("bcdfghjklmnprstvz") | _DIACRITICS

_CYR_MAP = dict(CYR_TO_LAT)
# longest-first suffix order per table (find_among_b longest-match)
_STEP1 = sorted(STEP1, key=lambda e: -len(e[0]))
_STEP2 = sorted(STEP2, key=lambda e: -len(e[0]))
_STEP3 = sorted(STEP3, key=len, reverse=True)


def _cyr_to_lat(w: str) -> str:
    if not any(ch in _CYR_MAP for ch in w):
        return w
    return "".join(_CYR_MAP.get(ch, ch) for ch in w)


def _prelude(w: str) -> str:
    # C"ije"C -> C"e"C, then C"je"C -> C"e"C (left-to-right rescan from the
    # leading consonant, like the generated machine), then dj -> đ
    for pat in ("ije", "je"):
        i = 0
        while i < len(w):
            if (w[i] in _CONS and w.startswith(pat, i + 1)
                    and i + 1 + len(pat) < len(w)
                    and w[i + 1 + len(pat)] in _CONS):
                w = w[: i + 1] + "e" + w[i + 1 + len(pat):]
                # rescan from the same leading consonant
                continue
            i += 1
    return w.replace("dj", "đ")


def _mark_regions(w: str):
    no_diacritics = not any(ch in _DIACRITICS for ch in w)
    n = len(w)
    p1 = n
    i = 0
    while i < n and w[i] not in _VOWELS:
        i += 1
    if i < n:
        p1 = i + 1
        if p1 < 2:
            # vowel-initial: p1 moves past the first consonant instead
            # (and STAYS at the provisional first-vowel+1 when the word has
            # no consonant at all — the machine only overwrites on success)
            j = p1
            while j < n and w[j] in _VOWELS:
                j += 1
            if j < n:
                p1 = j + 1
    # syllabic r: an 'r' acting as the first vowel pulls p1 left
    r = w.find("r")
    if r >= 0:
        r_end = r + 1
        if r_end < 2:
            j = r_end
            while j < n and w[j] == "r":
                j += 1
            if j >= n:
                return p1, no_diacritics
            r_end = j + 1
        if p1 - r_end > 1:
            p1 = r_end
    return p1, no_diacritics


def _apply(w: str, table, p1: Optional[int], no_diacritics: bool
           ) -> Optional[str]:
    """Longest-suffix match; commit to it (no backtracking): a failed R1 or
    diacritics guard fails the whole step."""
    for suf, rep, guard in table:
        if w.endswith(suf):
            b = len(w) - len(suf)
            if p1 is not None and p1 > b:
                return None
            if guard and not no_diacritics:
                return None
            return w[:b] + rep
    return None


def serbian_stem(word: str) -> str:
    """Stem one lowercased Serbian token (SnowballFilter('Serbian'))."""
    w = _cyr_to_lat(word)
    w = _prelude(w)
    p1, no_diacritics = _mark_regions(w)
    r = _apply(w, _STEP1, None, no_diacritics)
    if r is not None:
        w = r
    r = _apply(w, _STEP2, p1, no_diacritics)
    if r is None:
        # Step_3: plain R1 delete
        for suf in _STEP3:
            if w.endswith(suf):
                b = len(w) - len(suf)
                if p1 <= b:
                    return w[:b]
                return w
        return w
    return r


# SerbianNormalizationFilter (analysis/sr/SerbianNormalizationFilter.java):
# bald Latin transliteration applied AFTER stemming
_NORM = {
    "а": "a", "б": "b", "в": "v", "г": "g",
    "д": "d", "ђ": "dj", "đ": "dj", "е": "e",
    "ж": "z", "з": "z", "ž": "z", "и": "i",
    "ј": "j", "к": "k", "л": "l", "љ": "lj",
    "м": "m", "н": "n", "њ": "nj", "о": "o",
    "п": "p", "р": "r", "с": "s", "т": "t",
    "ћ": "c", "ц": "c", "ч": "c", "č": "c",
    "ć": "c", "у": "u", "ф": "f", "х": "h",
    "џ": "dz", "ш": "s", "š": "s",
}


def serbian_normalize(w: str) -> str:
    if not any(ch in _NORM for ch in w):
        return w
    return "".join(_NORM.get(ch, ch) for ch in w)
