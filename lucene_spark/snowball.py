"""Snowball stemmers for the Scandinavian analyzers — Swedish, Danish,
Norwegian (org/tartarus/snowball/ext/{Swedish,Danish,Norwegian}Stemmer.java,
the reference analyzers' default SnowballFilter stemmers). Re-expressed as
plain suffix logic over an R1 region instead of the generated cursor
machine; validated against the reference's own snowball test vocabularies
(analysis/snowball/{swedish,danish,norwegian}.zip voc/output pairs — the
TestSnowballVocab data).

Shared semantics (SnowballProgram.java):

- R1 starts after the first non-vowel following the first vowel, adjusted
  to begin no earlier than position 3; words without that shape (or
  shorter than 3) have an empty region and never stem.
- An "among" match is the longest suffix that fits ENTIRELY inside R1
  (find_among_b treats characters before limit_backward as unmatchable,
  so a shorter in-region suffix beats a longer out-of-region one); once a
  match is chosen its action runs — a failed condition fails the step
  without backtracking to shorter suffixes.
- Conditions on the character(s) BEFORE the matched suffix (the s-ending
  groups) are checked with the region restored: they only require the
  characters to exist, not to lie in R1.
"""

from __future__ import annotations

from typing import Optional, Sequence


def _r1(word: str, vowels: str) -> int:
    """Region start: first non-vowel after the first vowel, min 3; the
    word's length (empty region) when the shape is absent."""
    n = len(word)
    if n < 3:
        return n
    i = 0
    while i < n and word[i] not in vowels:
        i += 1
    while i < n and word[i] in vowels:
        i += 1
    if i >= n:
        return n
    return max(i + 1, 3)


def _longest_in_r1(word: str, p1: int, suffixes: Sequence[str]) -> Optional[str]:
    for s in suffixes:  # pre-sorted by decreasing length
        if word.endswith(s) and len(word) - len(s) >= p1:
            return s
    return None


def _by_len(*suffixes: str):
    return tuple(sorted(suffixes, key=len, reverse=True))


# ---------------------------------------------------------------------------
# Swedish (SwedishStemmer.java)
# ---------------------------------------------------------------------------

_SV_VOWELS = "aeiouyäåö"
#: a_0 minus the conditional 's' (case 2)
_SV_STEP1 = _by_len(
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
    "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
    "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades",
    "andes", "ens", "arens", "hetens", "erns", "at", "andet", "het",
    "ast", "s",
)
_SV_S_ENDING = "bcdfghjklmnoprtvy"
_SV_PAIRS = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_STEP3 = _by_len("lig", "ig", "els", "löst", "fullt")


def swedish_stem(w: str) -> str:
    p1 = _r1(w, _SV_VOWELS)
    m = _longest_in_r1(w, p1, _SV_STEP1)
    if m == "s":
        if len(w) >= 2 and w[-2] in _SV_S_ENDING:
            w = w[:-1]
    elif m:
        w = w[: -len(m)]
    if _longest_in_r1(w, p1, _SV_PAIRS):
        w = w[:-1]
    m = _longest_in_r1(w, p1, _SV_STEP3)
    if m in ("löst", "fullt"):
        w = w[:-1]  # löst -> lös, fullt -> full
    elif m:
        w = w[: -len(m)]
    return w


# ---------------------------------------------------------------------------
# Danish (DanishStemmer.java)
# ---------------------------------------------------------------------------

_DA_VOWELS = "aeiouyæåø"
_DA_STEP1 = _by_len(
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene", "erne",
    "ere", "en", "heden", "eren", "er", "heder", "erer", "heds", "es",
    "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens", "erens",
    "ers", "ets", "erets", "et", "eret", "s",
)
_DA_S_ENDING = "abcdfghjklmnoprtvyzå"
_DA_PAIRS = ("gd", "dt", "gt", "kt")
_DA_STEP3 = _by_len("elig", "lig", "ig", "els", "løst")
#: g_c — the consonant group the undouble step tests
_DA_CONSONANTS = "bcdfghjklmnpqrstvwxz"


def _da_consonant_pair(w: str, p1: int) -> str:
    if _longest_in_r1(w, p1, _DA_PAIRS):
        return w[:-1]
    return w


def danish_stem(w: str) -> str:
    p1 = _r1(w, _DA_VOWELS)
    m = _longest_in_r1(w, p1, _DA_STEP1)
    if m == "s":
        if len(w) >= 2 and w[-2] in _DA_S_ENDING:
            w = w[:-1]
    elif m:
        w = w[: -len(m)]
    w = _da_consonant_pair(w, p1)
    if w.endswith("igst"):  # region-free prelude of r_other_suffix
        w = w[:-2]
    m = _longest_in_r1(w, p1, _DA_STEP3)
    if m == "løst":
        w = w[:-1]
    elif m:
        w = w[: -len(m)]
        w = _da_consonant_pair(w, p1)
    # undouble: last char (inside R1) repeats its predecessor
    if len(w) >= 2 and len(w) > p1 and w[-1] in _DA_CONSONANTS and w[-2] == w[-1]:
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Norwegian (NorwegianStemmer.java)
# ---------------------------------------------------------------------------

_NO_VOWELS = "aeiouyæåø"
#: a_0 minus 's' (case 2) and erte/ert (case 3)
_NO_STEP1 = _by_len(
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en", "heten",
    "ar", "er", "heter", "as", "es", "edes", "endes", "enes", "hetenes",
    "ens", "hetens", "ers", "ets", "et", "het", "ast",
    "s", "erte", "ert",
)
_NO_S_ENDING = "bcdfghjlmnoprtvyz"  # no 'k': the guarded branch below
_NO_PAIRS = ("dt", "vt")
_NO_STEP3 = _by_len(
    "leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
    "slov", "hetslov",
)


def norwegian_stem(w: str) -> str:
    p1 = _r1(w, _NO_VOWELS)
    m = _longest_in_r1(w, p1, _NO_STEP1)
    if m in ("erte", "ert"):
        w = w[: -len(m)] + "er"
    elif m == "s":
        prev = w[-2] if len(w) >= 2 else ""
        if prev in _NO_S_ENDING:
            w = w[:-1]
        elif prev == "k" and len(w) >= 3 and w[-3] not in _NO_VOWELS:
            # 'ks' deletes only after a non-vowel (out_grouping_b fails at
            # the word boundary, so a leading 'k' never qualifies)
            w = w[:-1]
    elif m:
        w = w[: -len(m)]
    if _longest_in_r1(w, p1, _NO_PAIRS):
        w = w[:-1]
    m = _longest_in_r1(w, p1, _NO_STEP3)
    if m:
        w = w[: -len(m)]
    return w


# ---------------------------------------------------------------------------
# Russian (org/tartarus/snowball/ext/RussianStemmer.java) — the
# RussianAnalyzer's default SnowballFilter stemmer. All suffix matching is
# confined to RV (after the first vowel); the derivational step adds an R2
# start condition. 'ё' folds to 'е' first (the stemmer's own prelude).
# ---------------------------------------------------------------------------

_RU_VOWELS = "аеиоуыэюя"

#: perfective gerund: group 1 needs а/я immediately before (kept), group 2
#: carries its own и/ы
_RU_GERUND_1 = _by_len("в", "вши", "вшись")
_RU_GERUND_2 = _by_len("ив", "ыв", "ивши", "ывши", "ившись", "ывшись")
_RU_ADJECTIVE = _by_len(
    "ее", "ие", "ое", "ые", "ими", "ыми", "ей", "ий", "ой", "ый", "ем",
    "им", "ом", "ым", "его", "ого", "ему", "ому", "их", "ых", "ею", "ою",
    "ую", "юю", "ая", "яя",
)
_RU_PARTICIPLE_1 = _by_len("ем", "нн", "вш", "щ", "ющ")
_RU_PARTICIPLE_2 = _by_len("ивш", "ывш", "ующ")
_RU_REFLEXIVE = _by_len("сь", "ся")
_RU_VERB_1 = _by_len(
    "ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло", "но", "ет",
    "ют", "ны", "ть", "ешь", "нно",
)
_RU_VERB_2 = _by_len(
    "ила", "ыла", "ена", "ите", "ейте", "уйте", "или", "ыли", "ей", "уй",
    "ил", "ыл", "им", "ым", "ен", "ило", "ыло", "ено", "ует", "ит", "ыт",
    "уют", "ят", "ены", "ить", "ыть", "ишь", "ю", "ую",
)
_RU_NOUN = _by_len(
    "а", "ев", "ов", "е", "ие", "ье", "и", "еи", "ии", "ами", "ями",
    "иями", "й", "ей", "ией", "ий", "ой", "ам", "ем", "ием", "ом", "ям",
    "иям", "о", "у", "ах", "ях", "иях", "ы", "ь", "ю", "ию", "ью", "я",
    "ия", "ья",
)
_RU_DERIVATIONAL = _by_len("ост", "ость")
_RU_TIDY = _by_len("ейше", "ейш", "н", "ь")


def _ru_regions(w: str):
    """(pV, p2): RV starts after the first vowel; R2 after the second
    vowel-nonvowel alternation (RussianStemmer.r_mark_regions)."""
    n = len(w)
    i = 0
    while i < n and w[i] not in _RU_VOWELS:
        i += 1
    if i == n:
        return n, n
    pV = i + 1
    i = pV
    while i < n and w[i] in _RU_VOWELS:
        i += 1
    if i == n:
        return pV, n
    i += 1
    while i < n and w[i] not in _RU_VOWELS:
        i += 1
    if i == n:
        return pV, n
    i += 1
    while i < n and w[i] in _RU_VOWELS:
        i += 1
    if i == n:
        return pV, n
    return pV, i + 1


def _ru_cond_ay(w: str, m: str, pV: int) -> bool:
    """Group-1 condition: the char before the suffix is а/я, inside RV."""
    i = len(w) - len(m) - 1
    return i >= pV and w[i] in "ая"


def russian_stem(w: str) -> str:
    w = w.replace("ё", "е")
    pV, p2 = _ru_regions(w)
    # step 1: perfective gerund, else [reflexive] + adjectival|verb|noun
    m = _longest_in_r1(
        w, pV, sorted(_RU_GERUND_1 + _RU_GERUND_2, key=len, reverse=True)
    )
    done = False
    if m:
        if m in _RU_GERUND_2 or _ru_cond_ay(w, m, pV):
            w = w[: -len(m)]
            done = True
    if not done:
        m = _longest_in_r1(w, pV, _RU_REFLEXIVE)
        if m:
            w = w[: -len(m)]
        m = _longest_in_r1(w, pV, _RU_ADJECTIVE)
        if m:
            w = w[: -len(m)]
            p = _longest_in_r1(
                w, pV,
                sorted(_RU_PARTICIPLE_1 + _RU_PARTICIPLE_2, key=len,
                       reverse=True),
            )
            if p and (p in _RU_PARTICIPLE_2 or _ru_cond_ay(w, p, pV)):
                w = w[: -len(p)]
        else:
            m = _longest_in_r1(
                w, pV,
                sorted(_RU_VERB_1 + _RU_VERB_2, key=len, reverse=True),
            )
            if m and (m in _RU_VERB_2 or _ru_cond_ay(w, m, pV)):
                w = w[: -len(m)]
            else:
                m = _longest_in_r1(w, pV, _RU_NOUN)
                if m:
                    w = w[: -len(m)]
    # step 2: trailing и
    if w.endswith("и") and len(w) - 1 >= pV:
        w = w[:-1]
    # step 3: derivational (R2 condition on the match start)
    m = _longest_in_r1(w, pV, _RU_DERIVATIONAL)
    if m and len(w) - len(m) >= p2:
        w = w[: -len(m)]
    # step 4: tidy up
    m = _longest_in_r1(w, pV, _RU_TIDY)
    if m in ("ейше", "ейш"):
        w = w[: -len(m)]
        if w.endswith("нн") and len(w) - 2 >= pV:
            w = w[:-1]
    elif m == "н":
        if len(w) >= 2 and w[-2] == "н" and len(w) - 2 >= pV:
            w = w[:-1]
    elif m == "ь":
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Dutch (org/tartarus/snowball/ext/DutchStemmer.java) — the DutchAnalyzer's
# default SnowballFilter stemmer. Prelude un-accents vowels and shields
# i/y-between-vowels as I/Y (treated as consonants by the regions and
# grouping tests); R1 has the min-3 adjustment, R2 none; the backward
# section runs with NO region limit on matching — regions only gate the
# per-rule R1/R2 conditions; postlude lowers I/Y back.
# ---------------------------------------------------------------------------

_NL_V = "aeiouyè"
_NL_V_J = "aeiouyèj"
_NL_V_I = "Iaeiouyè"
_NL_ACCENTS = str.maketrans("áäéëíïóöúü", "aaeeiioouu")


def _nl_prelude(w: str) -> str:
    w = w.translate(_NL_ACCENTS)
    if w.startswith("y"):
        w = "Y" + w[1:]
    c = list(w)
    for i in range(len(c) - 1):
        if c[i] in _NL_V:
            if c[i + 1] == "i" and i + 2 < len(c) and c[i + 2] in _NL_V:
                c[i + 1] = "I"
            elif c[i + 1] == "y":
                c[i + 1] = "Y"
    return "".join(c)


def _nl_regions(w: str):
    n = len(w)
    i = 0
    while i < n and w[i] not in _NL_V:
        i += 1
    if i == n:
        return n, n
    i += 1
    while i < n and w[i] in _NL_V:
        i += 1
    if i == n:
        return n, n
    p1 = max(i + 1, 3)
    i += 1
    while i < n and w[i] not in _NL_V:
        i += 1
    if i == n:
        return p1, n
    i += 1
    while i < n and w[i] in _NL_V:
        i += 1
    if i == n:
        return p1, n
    return p1, i + 1


def _nl_undouble(w: str) -> str:
    if w[-2:] in ("dd", "kk", "tt"):
        return w[:-1]
    return w


def _nl_en_ending(w: str, m: str, p1: int) -> str:
    start = len(w) - len(m)
    if (
        start >= p1
        and start > 0
        and w[start - 1] not in _NL_V
        and not w[:start].endswith("gem")
    ):
        return _nl_undouble(w[:start])
    return w


def _suffix(w: str, sufs) -> Optional[str]:
    for s in sufs:  # length-desc
        if w.endswith(s):
            return s
    return None


def dutch_stem(w: str) -> str:
    w = _nl_prelude(w)
    p1, p2 = _nl_regions(w)
    # part A: heden -> heid | en(e) | s(e)
    m = _suffix(w, ("heden", "ene", "en", "se", "s"))
    if m == "heden":
        if len(w) - 5 >= p1:
            w = w[:-5] + "heid"
    elif m in ("ene", "en"):
        w = _nl_en_ending(w, m, p1)
    elif m in ("se", "s"):
        start = len(w) - len(m)
        if start >= p1 and start > 0 and w[start - 1] not in _NL_V_J:
            w = w[:start]
    # part B: e-ending (remembered for the 'bar' rule)
    e_found = False
    if (
        w.endswith("e")
        and len(w) - 1 >= p1
        and len(w) >= 2
        and w[-2] not in _NL_V
    ):
        w = _nl_undouble(w[:-1])
        e_found = True
    # part C: heid (R2, not after c) -> delete, then a following en
    if (
        w.endswith("heid")
        and len(w) - 4 >= p2
        and not (len(w) >= 5 and w[-5] == "c")
    ):
        w = w[:-4]
        if w.endswith("en"):
            w = _nl_en_ending(w, "en", p1)
    # part D: d-suffixes
    m = _suffix(w, ("lijk", "baar", "end", "ing", "bar", "ig"))
    if m in ("end", "ing"):
        start = len(w) - 3
        if start >= p2:
            w = w[:start]
            if (
                w.endswith("ig")
                and len(w) - 2 >= p2
                and not (len(w) >= 3 and w[-3] == "e")
            ):
                w = w[:-2]
            else:
                w = _nl_undouble(w)
    elif m == "ig":
        start = len(w) - 2
        if start >= p2 and not (start >= 1 and w[start - 1] == "e"):
            w = w[:start]
    elif m == "lijk":
        start = len(w) - 4
        if start >= p2:
            w = w[:start]
            if (
                w.endswith("e")
                and len(w) - 1 >= p1
                and len(w) >= 2
                and w[-2] not in _NL_V
            ):
                w = _nl_undouble(w[:-1])
    elif m == "baar":
        start = len(w) - 4
        if start >= p2:
            w = w[:start]
    elif m == "bar":
        start = len(w) - 3
        if start >= p2 and e_found:
            w = w[:start]
    # part E: undouble vowel (C V V C, last char outside g_v_I)
    if (
        len(w) >= 4
        and w[-1] not in _NL_V_I
        and w[-3:-1] in ("aa", "ee", "oo", "uu")
        and w[-4] not in _NL_V
    ):
        w = w[:-2] + w[-1]
    # postlude
    return w.replace("I", "i").replace("Y", "y")
