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


# ---------------------------------------------------------------------------
# Finnish (org/tartarus/snowball/ext/FinnishStemmer.java) — the
# FinnishAnalyzer's default SnowballFilter stemmer. All suffix matching is
# limited to R1 (R2 for 'sti' and the comparative endings); regions have NO
# min-3 adjustment. Conditions that run after the among match (the switch
# bodies) see the un-limited string; the r_VI / r_LONG among-methods run
# UNDER the R1 limit, and on failure fall back to the parent entry 'n'.
# ---------------------------------------------------------------------------

_FI_V1 = "aeiouyäö"
_FI_V2 = "aeiouäö"  # g_V2: V1 minus y
_FI_AEI = "aeiä"
_FI_C = "bcdfghjklmnpqrstvwxz"
_FI_PARTICLE_END = _FI_V1 + "nt"
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")

_FI_PARTICLES = _by_len("pa", "pä", "sti", "kaan", "kään", "han", "hän",
                        "kin", "ko", "kö")
_FI_POSS = _by_len("nsa", "nsä", "mme", "nne", "ni", "si", "an", "en", "än")
#: a_6 in textual length order; per-entry behavior dispatched below
_FI_CASE = _by_len(
    "seen", "tten", "siin",
    "lla", "ssa", "lta", "sta", "tta", "lle", "ine", "ksi", "han", "den",
    "hen", "hin", "hon", "hän", "hön", "llä", "ssä", "ltä", "stä", "ttä",
    "na", "ta", "nä", "tä", "a", "n", "ä",
)
_FI_CASE_H = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
              "hän": "ä", "hön": "ö"}
_FI_OTHER = _by_len("eja", "ejä", "imma", "impa", "immi", "impi", "immä",
                    "impä", "mma", "mpa", "mmi", "mpi", "mmä", "mpä")
_FI_OTHER_PO = frozenset(("mma", "mpa", "mmi", "mpi", "mmä", "mpä"))


def _fi_regions(w: str):
    """Standard snowball R1/R2 over g_V1, no minimum adjustment."""
    n = len(w)
    i = 0
    while i < n and w[i] not in _FI_V1:
        i += 1
    if i == n:
        return n, n
    while i < n and w[i] in _FI_V1:
        i += 1
    if i == n:
        return n, n
    p1 = i + 1
    i = p1
    while i < n and w[i] not in _FI_V1:
        i += 1
    if i == n:
        return p1, n
    while i < n and w[i] in _FI_V1:
        i += 1
    if i == n:
        return p1, n
    return p1, i + 1


def _fi_case_n(w: str) -> str:
    """Case-ending entry 'n': delete it, plus one more char when the stem
    then ends with a long vowel pair or 'ie' (region-free check)."""
    rest = w[:-1]
    if len(rest) >= 2 and (rest[-2:] in _FI_LONG or rest.endswith("ie")):
        return rest[:-1]
    return rest


def finnish_stem(w: str) -> str:
    p1, p2 = _fi_regions(w)

    # particle etc. (R1 match; 'sti' needs R2, the rest a particle_end char)
    m = _longest_in_r1(w, p1, _FI_PARTICLES)
    if m == "sti":
        if len(w) - 3 >= p2:
            w = w[:-3]
    elif m:
        i = len(w) - len(m) - 1
        if i >= 0 and w[i] in _FI_PARTICLE_END:
            w = w[: -len(m)]

    # possessive (R1 match; context checks are region-free)
    m = _longest_in_r1(w, p1, _FI_POSS)
    if m == "si":
        if not (len(w) >= 3 and w[-3] == "k"):
            w = w[:-2]
    elif m == "ni":
        w = w[:-2]
        if w.endswith("kse"):
            w = w[:-1] + "i"
    elif m in ("nsa", "nsä", "mme", "nne"):
        w = w[:-3]
    elif m == "an":
        if w[:-2].endswith(("lla", "na", "ssa", "ta", "lta", "sta")):
            w = w[:-2]
    elif m == "än":
        if w[:-2].endswith(("llä", "nä", "ssä", "tä", "ltä", "stä")):
            w = w[:-2]
    elif m == "en":
        if w[:-2].endswith(("lle", "ine")):
            w = w[:-2]

    # case ending (R1 match; among-method conditions under the R1 limit)
    ending_removed = False
    m = _longest_in_r1(w, p1, _FI_CASE)
    if m in ("den", "tten", "siin"):
        # r_VI: preceding "Vi" with both chars inside R1, V in g_V2
        i = len(w) - len(m) - 1
        if i >= p1 and w[i] == "i" and i - 1 >= p1 and w[i - 1] in _FI_V2:
            w = w[: -len(m)]
            ending_removed = True
        else:
            w = _fi_case_n(w)  # among fallback to parent entry 'n'
            ending_removed = True
    elif m == "seen":
        # r_LONG under the R1 limit
        if len(w) - 6 >= p1 and w[-6:-4] in _FI_LONG:
            w = w[:-4]
            ending_removed = True
        else:
            w = _fi_case_n(w)
            ending_removed = True
    elif m in _FI_CASE_H:
        if len(w) >= 4 and w[-4] == _FI_CASE_H[m]:
            w = w[:-3]
            ending_removed = True
    elif m in ("tta", "ttä"):
        if len(w) >= 4 and w[-4] == "e":
            w = w[:-3]
            ending_removed = True
    elif m == "n":
        w = _fi_case_n(w)
        ending_removed = True
    elif m in ("a", "ä"):
        if len(w) >= 3 and w[-2] in _FI_V1 and w[-3] in _FI_C:
            w = w[:-1]
            ending_removed = True
    elif m:
        w = w[: -len(m)]
        ending_removed = True

    # other endings (comparatives; R2 match, po-guard region-free)
    m = _longest_in_r1(w, p2, _FI_OTHER)
    if m in _FI_OTHER_PO:
        if not w[: -len(m)].endswith("po"):
            w = w[: -len(m)]
    elif m:
        w = w[: -len(m)]

    if ending_removed:
        # i_plural: trailing i/j inside R1
        if w and w[-1] in "ij" and len(w) - 1 >= p1:
            w = w[:-1]
    else:
        # t_plural: trailing t in R1 preceded by an R1 vowel, then a
        # comparative tail in R2
        if (
            w.endswith("t")
            and len(w) - 1 >= p1
            and len(w) >= 2
            and w[-2] in _FI_V1
            and len(w) - 2 >= p1
        ):
            w = w[:-1]
            m = _longest_in_r1(w, p2, ("imma", "mma"))
            if m == "imma":
                w = w[:-4]
            elif m == "mma" and not w[:-3].endswith("po"):
                w = w[:-3]

    # tidy (each sub-step independent, on the evolving string)
    if len(w) >= 2 and len(w) - 2 >= p1 and w[-2:] in _FI_LONG:
        w = w[:-1]
    if (
        w
        and len(w) - 1 >= p1
        and w[-1] in _FI_AEI
        and len(w) >= 2
        and len(w) - 2 >= p1
        and w[-2] in _FI_C
    ):
        w = w[:-1]
    if (
        w.endswith("j")
        and len(w) - 1 >= p1
        and len(w) >= 2
        and len(w) - 2 >= p1
        and w[-2] in "ou"
    ):
        w = w[:-1]
    if (
        w.endswith("o")
        and len(w) - 1 >= p1
        and len(w) >= 2
        and len(w) - 2 >= p1
        and w[-2] == "j"
    ):
        w = w[:-1]
    # undouble the consonant just before the trailing vowel run (region-free)
    i = len(w)
    while i > 0 and w[i - 1] in _FI_V1:
        i -= 1
    if i > 0 and w[i - 1] in _FI_C and i - 2 >= 0 and w[i - 2] == w[i - 1]:
        w = w[: i - 1] + w[i:]
    return w


# ---------------------------------------------------------------------------
# Romanian (org/tartarus/snowball/ext/RomanianStemmer.java) — the
# RomanianAnalyzer's default SnowballFilter stemmer (cedilla forms ş/ţ, as
# in the reference's resources). Prelude shields u/i between vowels as U/I
# (consonants thereafter); step_0 and the combo loop are R1-gated, the
# standard suffixes R2-gated, verb suffixes match entirely inside RV, the
# final vowel inside RV; postlude lowers I/U back.
# ---------------------------------------------------------------------------

_RO_V = "aeiouâîă"

#: step_0 (a_1): suffix -> replacement ("d" = delete); 'ile' additionally
#: fails when preceded by "ab"
_RO_STEP0 = {
    "iilor": "i", "aţia": "aţi", "aţie": "aţi", "atei": "at", "ului": "d",
    "iile": "i", "ilor": "i", "elor": "e", "aua": "a", "iua": "i",
    "ele": "e", "ile": "i", "iei": "i", "ea": "e", "ii": "i", "ul": "d",
}
_RO_COMBO = {
    "abilitate": "abil", "abilitati": "abil", "abilităi": "abil",
    "abilităţi": "abil", "ibilitate": "ibil", "ivitate": "iv",
    "ivitati": "iv", "ivităi": "iv", "ivităţi": "iv",
    "icala": "ic", "iciva": "ic", "icale": "ic", "icitate": "ic",
    "icive": "ic", "icali": "ic", "icatori": "ic", "icitati": "ic",
    "icivi": "ic", "icităi": "ic", "icităţi": "ic", "ical": "ic",
    "icator": "ic", "iciv": "ic", "icală": "ic", "icivă": "ic",
    "ativa": "at", "aţiune": "at", "atoare": "at", "ătoare": "at",
    "ative": "at", "atori": "at", "ători": "at", "ativi": "at",
    "ator": "at", "ător": "at", "ativ": "at", "ativă": "at",
    "itiva": "it", "iţiune": "it", "itoare": "it", "itive": "it",
    "itori": "it", "itivi": "it", "itor": "it", "itiv": "it",
    "itivă": "it",
}
_RO_STD_DEL = (
    "ica", "abila", "ibila", "oasa", "ata", "ita", "anta", "uta", "iva",
    "ic", "ice", "abile", "ibile", "oase", "ate", "itate", "ite", "ante",
    "ute", "ive", "ici", "abili", "ibili", "atori", "osi", "ati", "itati",
    "iti", "anti", "uti", "ivi", "ităi", "oşi", "ităţi",
    "abil", "ibil", "ator", "os", "at", "it", "ant", "ut", "iv",
    "ică", "abilă", "ibilă", "oasă", "ată",
    "ită", "antă", "ută", "ivă",
)
_RO_STD_IST = ("isme", "iste", "isti", "işti", "ism", "ist", "ista",
               "istă")
_RO_STD = {s: "d" for s in _RO_STD_DEL}
_RO_STD.update({s: "ist" for s in _RO_STD_IST})
_RO_STD.update({"iune": "t", "iuni": "t"})
_RO_VERB1 = (
    "ea", "ia", "esc", "ăsc", "ind", "ând", "are", "ere", "ire",
    "âre", "ase", "ise", "use", "âse", "eşte",
    "ăşte", "eze", "ai", "eai", "iai", "eşti",
    "ăşti", "ui", "ezi", "âi", "aşi", "aseşi",
    "iseşi", "useşi", "âseşi", "işi", "uşi",
    "âşi", "eaţi", "iaţi", "arăţi",
    "aserăţi", "iserăţi", "userăţi",
    "âserăţi", "irăţi", "urăţi",
    "ârăţi", "am", "eam", "iam", "asem", "isem", "usem",
    "âsem", "arăm", "aserăm", "iserăm", "userăm",
    "âserăm", "irăm", "urăm", "ârăm", "au",
    "eau", "iau", "indu", "ându", "ez", "ească", "ară",
    "aseră", "iseră", "useră", "âseră",
    "iră", "ură", "âră", "ează",
)
_RO_VERB2 = (
    "se", "sese", "sei", "seşi", "seseşi", "aţi",
    "eţi", "iţi", "âţi", "serăţi",
    "seserăţi", "em", "sesem", "im", "âm", "ăm",
    "serăm", "seserăm", "seră", "seseră",
)
_RO_STEP0_KEYS = _by_len(*_RO_STEP0)
_RO_COMBO_KEYS = _by_len(*_RO_COMBO)
_RO_STD_KEYS = _by_len(*_RO_STD)
_RO_VERBS = _by_len(*(_RO_VERB1 + _RO_VERB2))
_RO_VERB2_SET = frozenset(_RO_VERB2)


def _ro_prelude(w: str) -> str:
    c = list(w)
    for i in range(len(c) - 2):
        if c[i] in _RO_V and c[i + 2] in _RO_V:
            if c[i + 1] == "u":
                c[i + 1] = "U"
            elif c[i + 1] == "i":
                c[i + 1] = "I"
    return "".join(c)


def _ro_rv(w: str) -> int:
    n = len(w)
    if n < 2:
        return n
    if w[0] in _RO_V:
        i = 2
        if w[1] in _RO_V:
            while i < n and w[i] in _RO_V:
                i += 1
        else:
            while i < n and w[i] not in _RO_V:
                i += 1
        return i + 1 if i < n else n
    if w[1] in _RO_V:
        return 3 if n >= 3 else n
    i = 2
    while i < n and w[i] not in _RO_V:
        i += 1
    return i + 1 if i < n else n


def _ro_r1r2(w: str):
    n = len(w)
    i = 0
    while i < n and w[i] not in _RO_V:
        i += 1
    while i < n and w[i] in _RO_V:
        i += 1
    if i == n:
        return n, n
    p1 = i + 1
    i = p1
    while i < n and w[i] not in _RO_V:
        i += 1
    while i < n and w[i] in _RO_V:
        i += 1
    if i == n:
        return p1, n
    return p1, i + 1


def romanian_stem(w: str) -> str:
    w = _ro_prelude(w)
    pV = _ro_rv(w)
    p1, p2 = _ro_r1r2(w)

    # step 0: plural/article endings (R1-gated, hard fail)
    for s in _RO_STEP0_KEYS:
        if w.endswith(s):
            if len(w) - len(s) >= p1:
                rep = _RO_STEP0[s]
                if s == "ile" and w[:-3].endswith("ab"):
                    break
                w = w[: -len(s)] + ("" if rep == "d" else rep)
            break

    # standard suffixes: combo loop (R1), then the main table (R2)
    removed = False
    changed = True
    while changed:
        changed = False
        for s in _RO_COMBO_KEYS:
            if w.endswith(s):
                if len(w) - len(s) >= p1:
                    w = w[: -len(s)] + _RO_COMBO[s]
                    removed = True
                    changed = True
                break
    for s in _RO_STD_KEYS:
        if w.endswith(s):
            if len(w) - len(s) >= p2:
                rep = _RO_STD[s]
                if rep == "t":
                    # iune/iuni must follow ţ; ţ+suffix -> "t"
                    if w[: -len(s)].endswith("ţ"):
                        w = w[: -len(s) - 1] + "t"
                        removed = True
                elif rep == "d":
                    w = w[: -len(s)]
                    removed = True
                else:
                    w = w[: -len(s)] + rep
                    removed = True
            break

    # verb suffixes (only when nothing standard was removed; match must lie
    # entirely inside RV, and case-1 needs a non-vowel or 'u' before it,
    # also inside RV)
    if not removed:
        m = _longest_in_r1(w, pV, _RO_VERBS)
        if m:
            if m in _RO_VERB2_SET:
                w = w[: -len(m)]
            else:
                i = len(w) - len(m) - 1
                if i >= pV and (w[i] not in _RO_V or w[i] == "u"):
                    w = w[: -len(m)]

    # final vowel (RV-gated, hard fail; 'ie' wins over 'e')
    for s in ("ie", "a", "e", "i", "ă"):
        if w.endswith(s):
            if len(w) - len(s) >= pV:
                w = w[: -len(s)]
            break

    return w.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# Hungarian (org/tartarus/snowball/ext/HungarianStemmer.java) — the
# HungarianAnalyzer's default SnowballFilter stemmer. Every backward rule
# matches its suffix REGION-FREE (limit_backward stays 0) and only then
# requires the match to start inside R1 — a failed R1 check fails the rule
# with NO fallback to a shorter suffix. R1 itself treats the consonant
# digraphs (cs/dzs/gy/ly/ny/sz/ty/zs) as single units.
# ---------------------------------------------------------------------------

_HU_V = "aeiouáéíóöúüőű"
_HU_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLES = _by_len(
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn", "pp", "rr",
    "ccs", "ss", "zzs", "tt", "vv", "ggy", "lly", "nny", "tty", "ssz", "zz",
)
_HU_CASE = _by_len(
    "ba", "ra", "be", "re", "ig", "nak", "nek", "val", "vel", "ul", "nál",
    "nél", "ból", "ról", "tól", "ül", "ből", "ről", "től", "n", "an", "ban",
    "en", "ben", "képpen", "on", "ön", "képp", "kor", "t", "at", "et",
    "ként", "anként", "enként", "onként", "ot", "ért", "öt", "hez", "hoz",
    "höz", "vá", "vé",
)
#: action tables: "d" = delete, else the replacement vowel
_HU_OWNED = {
    "éi": "d", "áéi": "a", "ééi": "e", "é": "d", "ké": "d", "aké": "d",
    "eké": "d", "oké": "d", "áké": "a", "éké": "e", "öké": "d", "éé": "e",
}
_HU_SING_OWNER = {
    "a": "d", "ja": "d", "d": "d", "ad": "d", "ed": "d", "od": "d",
    "ád": "a", "éd": "e", "öd": "d", "e": "d", "je": "d", "nk": "d",
    "unk": "d", "ánk": "a", "énk": "e", "ünk": "d", "uk": "d", "juk": "d",
    "ájuk": "a", "ük": "d", "jük": "d", "éjük": "e", "m": "d", "am": "d",
    "em": "d", "om": "d", "ám": "a", "ém": "e", "o": "d", "á": "a",
    "é": "e",
}
_HU_PLUR_OWNER = {
    "id": "d", "aid": "d", "jaid": "d", "eid": "d", "jeid": "d", "áid": "a",
    "éid": "e", "i": "d", "ai": "d", "jai": "d", "ei": "d", "jei": "d",
    "ái": "a", "éi": "e", "itek": "d", "eitek": "d", "jeitek": "d",
    "éitek": "e", "ik": "d", "aik": "d", "jaik": "d", "eik": "d",
    "jeik": "d", "áik": "a", "éik": "e", "ink": "d", "aink": "d",
    "jaink": "d", "eink": "d", "jeink": "d", "áink": "a", "éink": "e",
    "aitok": "d", "jaitok": "d", "áitok": "a", "im": "d", "aim": "d",
    "jaim": "d", "eim": "d", "jeim": "d", "áim": "a", "éim": "e",
}
_HU_PLURAL = {"k": "d", "ak": "d", "ek": "d", "ok": "d", "ák": "a",
              "ék": "e", "ök": "d"}
_HU_OWNED_KEYS = _by_len(*_HU_OWNED)
_HU_SING_OWNER_KEYS = _by_len(*_HU_SING_OWNER)
_HU_PLUR_OWNER_KEYS = _by_len(*_HU_PLUR_OWNER)
_HU_PLURAL_KEYS = _by_len(*_HU_PLURAL)


def _hu_r1(w: str) -> int:
    n = len(w)
    if n == 0:
        return 0
    if w[0] in _HU_V:
        i = 1
        while i < n and w[i] in _HU_V:
            i += 1
        if i == n:
            return n
        for d in _HU_DIGRAPHS:  # dzs first (longest)
            if w.startswith(d, i):
                return i + len(d)
        return i + 1
    i = 1
    while i < n and w[i] not in _HU_V:
        i += 1
    if i == n:
        return n
    return i + 1


def _hu_match(w: str, p1: int, sufs) -> Optional[str]:
    """Longest textual suffix; None when it starts before R1 (hard fail,
    no fallback — find_among_b runs region-free here)."""
    for s in sufs:
        if w.endswith(s):
            return s if len(w) - len(s) >= p1 else None
    return None


def _hu_double(stem: str) -> bool:
    return stem.endswith(_HU_DOUBLES)


def _hu_undouble(stem: str) -> str:
    """r_undouble: drop the second-to-last char (ggy->gy, ssz->sz, tt->t)."""
    return stem[:-2] + stem[-1]


def _hu_apply(w: str, p1: int, keys, table) -> str:
    m = _hu_match(w, p1, keys)
    if not m:
        return w
    act = table[m]
    return w[: -len(m)] + ("" if act == "d" else act)


def hungarian_stem(w: str) -> str:
    p1 = _hu_r1(w)
    # instrum: al/el after a double consonant -> delete + undouble
    m = _hu_match(w, p1, ("al", "el"))
    if m and _hu_double(w[:-2]):
        w = _hu_undouble(w[:-2])
    # case endings, then á/é -> a/e normalization (itself R1-gated)
    m = _hu_match(w, p1, _HU_CASE)
    if m:
        w = w[: -len(m)]
        if w.endswith("á") and len(w) - 1 >= p1:
            w = w[:-1] + "a"
        elif w.endswith("é") and len(w) - 1 >= p1:
            w = w[:-1] + "e"
    # case_special: án/ánként -> a, én -> e
    m = _hu_match(w, p1, ("ánként", "án", "én"))
    if m in ("ánként", "án"):
        w = w[: -len(m)] + "a"
    elif m == "én":
        w = w[:-2] + "e"
    # case_other: -stul/-stül family
    m = _hu_match(w, p1, ("ástul", "éstül", "astul", "estül", "stul", "stül"))
    if m == "ástul":
        w = w[:-5] + "a"
    elif m == "éstül":
        w = w[:-5] + "e"
    elif m:
        w = w[: -len(m)]
    # factive: á/é after a double consonant -> delete + undouble
    m = _hu_match(w, p1, ("á", "é"))
    if m and _hu_double(w[:-1]):
        w = _hu_undouble(w[:-1])
    w = _hu_apply(w, p1, _HU_OWNED_KEYS, _HU_OWNED)
    w = _hu_apply(w, p1, _HU_SING_OWNER_KEYS, _HU_SING_OWNER)
    w = _hu_apply(w, p1, _HU_PLUR_OWNER_KEYS, _HU_PLUR_OWNER)
    w = _hu_apply(w, p1, _HU_PLURAL_KEYS, _HU_PLURAL)
    return w


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


# ---------------------------------------------------------------------------
# Turkish (org/tartarus/snowball/ext/TurkishStemmer.java) — the
# TurkishAnalyzer's default SnowballFilter stemmer. No regions: every rule
# is gated by vowel HARMONY (the last vowel of the effective prefix must be
# preceded somewhere by a char of its harmony group) and by the
# optional-consonant/vowel attachment checks. Marks COMPOUND — a branch
# strips the sum of its consecutively marked suffixes; the ki-chain recurses
# on the PREFIX with a marked-but-undeleted tail re-appended (mid-buffer
# slice semantics of the generated cursor machine).
# ---------------------------------------------------------------------------

_TR_VOWELS = "aeıioöuü"
_TR_U = "ıiuü"
_TR_HARMONY = {
    "a": "aouı", "e": "eiöü", "ı": "aı", "i": "ei",
    "o": "ou", "ö": "öü", "u": "ou", "ü": "öü",
}

_TR_POSS = _by_len("m", "n", "miz", "niz", "muz", "nuz", "müz", "nüz",
                   "mız", "nız")
_TR_LARI = _by_len("leri", "ları")
_TR_NU = _by_len("ni", "nu", "nü", "nı")
_TR_NUN = _by_len("in", "un", "ün", "ın")
_TR_YA = _by_len("a", "e")
_TR_NA = _by_len("na", "ne")
_TR_DA = _by_len("da", "ta", "de", "te")
_TR_NDA = _by_len("nda", "nde")
_TR_DAN = _by_len("dan", "tan", "den", "ten")
_TR_NDAN = _by_len("ndan", "nden")
_TR_YLA = _by_len("la", "le")
_TR_CA = _by_len("ca", "ce")
_TR_YUM = _by_len("im", "um", "üm", "ım")
_TR_SUN = _by_len("sin", "sun", "sün", "sın")
_TR_YUZ = _by_len("iz", "uz", "üz", "ız")
_TR_SUNUZ = _by_len("siniz", "sunuz", "sünüz", "sınız")
_TR_LAR = _by_len("lar", "ler")
_TR_NUZ = _by_len("niz", "nuz", "nüz", "nız")
_TR_DUR = _by_len("dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır")
_TR_CASINA = _by_len("casına", "cesine")
_TR_YDU = _by_len(
    "di", "ti", "dik", "tik", "duk", "tuk", "dük", "tük", "dık", "tık",
    "dim", "tim", "dum", "tum", "düm", "tüm", "dım", "tım", "din", "tin",
    "dun", "tun", "dün", "tün", "dın", "tın", "du", "tu", "dü", "tü",
    "dı", "tı",
)
_TR_YSA = _by_len("sa", "se", "sak", "sek", "sam", "sem", "san", "sen")
_TR_YMUS = _by_len("miş", "muş", "müş", "mış")


def _tr_harmony_ok(e: str) -> bool:
    j = len(e) - 1
    while j >= 0 and e[j] not in _TR_VOWELS:
        j -= 1
    if j < 0:
        return False
    grp = _TR_HARMONY[e[j]]
    for k in range(j - 1, -1, -1):
        if e[k] in grp:
            return True
    return False


def _tr_suf(e: str, sufs) -> Optional[int]:
    for s in sufs:
        if e.endswith(s):
            return len(s)
    return None


def _tr_opt_c(e: str, ch: str) -> Optional[int]:
    """Optional attachment consonant ch: extra strip 1 when present
    (vowel-preceded), 0 when absent and the skipped char is vowel-preceded;
    None = attachment shape invalid."""
    if e.endswith(ch):
        if len(e) >= 2 and e[-2] in _TR_VOWELS:
            return 1
        return None
    if len(e) >= 2 and e[-2] in _TR_VOWELS:
        return 0
    return None


def _tr_opt_u(e: str) -> Optional[int]:
    if e and e[-1] in _TR_U:
        if len(e) >= 2 and e[-2] not in _TR_VOWELS:
            return 1
        return None
    if len(e) >= 2 and e[-2] not in _TR_VOWELS:
        return 0
    return None


def _tr_mark(e: str, sufs, harmony: bool = True, opt=None) -> Optional[int]:
    if harmony and not _tr_harmony_ok(e):
        return None
    n = _tr_suf(e, sufs)
    if n is None:
        return None
    if opt is not None:
        x = opt(e[:-n])
        if x is None:
            return None
        return n + x
    return n


def _mk_poss(e):
    n = _tr_suf(e, _TR_POSS)
    if n is None:
        return None
    x = _tr_opt_u(e[:-n])
    return None if x is None else n + x


def _mk_sU(e):
    if not _tr_harmony_ok(e):
        return None
    if not e or e[-1] not in _TR_U:
        return None
    x = _tr_opt_c(e[:-1], "s")
    return None if x is None else 1 + x


def _mk_lArI(e):
    return _tr_suf(e, _TR_LARI)


def _mk_yU(e):
    if not _tr_harmony_ok(e):
        return None
    if not e or e[-1] not in _TR_U:
        return None
    x = _tr_opt_c(e[:-1], "y")
    return None if x is None else 1 + x


def _mk_nU(e):
    return _tr_mark(e, _TR_NU)


def _mk_nUn(e):
    return _tr_mark(e, _TR_NUN, opt=lambda p: _tr_opt_c(p, "n"))


def _mk_yA(e):
    return _tr_mark(e, _TR_YA, opt=lambda p: _tr_opt_c(p, "y"))


def _mk_nA(e):
    return _tr_mark(e, _TR_NA)


def _mk_DA(e):
    return _tr_mark(e, _TR_DA)


def _mk_ndA(e):
    return _tr_mark(e, _TR_NDA)


def _mk_DAn(e):
    return _tr_mark(e, _TR_DAN)


def _mk_ndAn(e):
    return _tr_mark(e, _TR_NDAN)


def _mk_ylA(e):
    return _tr_mark(e, _TR_YLA, opt=lambda p: _tr_opt_c(p, "y"))


def _mk_ncA(e):
    return _tr_mark(e, _TR_CA, opt=lambda p: _tr_opt_c(p, "n"))


def _mk_yUm(e):
    return _tr_mark(e, _TR_YUM, opt=lambda p: _tr_opt_c(p, "y"))


def _mk_sUn(e):
    return _tr_mark(e, _TR_SUN)


def _mk_yUz(e):
    return _tr_mark(e, _TR_YUZ, opt=lambda p: _tr_opt_c(p, "y"))


def _mk_sUnUz(e):
    return _tr_suf(e, _TR_SUNUZ)


def _mk_lAr(e):
    return _tr_mark(e, _TR_LAR)


def _mk_nUz(e):
    return _tr_mark(e, _TR_NUZ)


def _mk_DUr(e):
    return _tr_mark(e, _TR_DUR)


def _mk_cAsInA(e):
    return _tr_suf(e, _TR_CASINA)


def _mk_yDU(e):
    return _tr_mark(e, _TR_YDU, opt=lambda p: _tr_opt_c(p, "y"))


def _mk_ysA(e):
    return _tr_mark(e, _TR_YSA, harmony=False,
                    opt=lambda p: _tr_opt_c(p, "y"))


def _mk_ymUs(e):
    return _tr_mark(e, _TR_YMUS, opt=lambda p: _tr_opt_c(p, "y"))


def _mk_yken(e):
    if not e.endswith("ken"):
        return None
    x = _tr_opt_c(e[:-3], "y")
    return None if x is None else 3 + x


def _tr_first(e, *marks) -> Optional[int]:
    for mk in marks:
        n = mk(e)
        if n is not None:
            return n
    return None


def _tr_nominal_verb(w: str):
    """r_stem_nominal_verb_suffixes: returns (new_w, continue_noun_flag)."""
    # alt 1: ymUs_|yDU|ysA|yken
    n = _tr_first(w, _mk_ymUs, _mk_yDU, _mk_ysA, _mk_yken)
    if n is not None:
        return w[:-n], True
    # alt 2: cAsInA (sUnUz|lAr|yUm|sUn|yUz)? ymUs_
    n1 = _mk_cAsInA(w)
    if n1 is not None:
        e = w[:-n1]
        n2 = _tr_first(e, _mk_sUnUz, _mk_lAr, _mk_yUm, _mk_sUn, _mk_yUz) or 0
        n3 = _mk_ymUs(e[: len(e) - n2] if n2 else e)
        if n3 is not None:
            return w[: len(w) - (n1 + n2 + n3)], True
    # alt 3: lAr, delete, then (DUr|yDU|ysA|ymUs_)? — stops noun stemming
    n = _mk_lAr(w)
    if n is not None:
        w = w[:-n]
        m = _tr_first(w, _mk_DUr, _mk_yDU, _mk_ysA, _mk_ymUs)
        if m is not None:
            w = w[:-m]
        return w, False
    # alt 4: nUz (yDU|ysA)
    n1 = _mk_nUz(w)
    if n1 is not None:
        e = w[:-n1]
        n2 = _tr_first(e, _mk_yDU, _mk_ysA)
        if n2 is not None:
            return w[: len(w) - (n1 + n2)], True
    # alt 5: (sUnUz|yUz|sUn|yUm), delete, then ymUs_?
    n = _tr_first(w, _mk_sUnUz, _mk_yUz, _mk_sUn, _mk_yUm)
    if n is not None:
        w = w[:-n]
        m = _mk_ymUs(w)
        if m is not None:
            w = w[:-m]
        return w, True
    # alt 6: DUr, delete, then ((sUnUz|lAr|yUm|sUn|yUz)? ymUs_)?
    n = _mk_DUr(w)
    if n is None:
        return w, True
    w = w[:-n]
    n2 = _tr_first(w, _mk_sUnUz, _mk_lAr, _mk_yUm, _mk_sUn, _mk_yUz) or 0
    n3 = _mk_ymUs(w[: len(w) - n2] if n2 else w)
    if n3 is not None:
        w = w[: len(w) - (n2 + n3)]
    return w, True


def _tr_chain_ki(w: str):
    """r_stem_suffix_chain_before_ki: (new_w, applied). The ndA-recursive
    path edits the PREFIX and re-appends the marked tail (mid-buffer
    slice_del semantics)."""
    if not w.endswith("ki"):
        return w, False
    e = w[:-2]
    # alt A: DA ki -> delete, then lAr?/possessives? tails
    n = _mk_DA(e)
    if n is not None:
        w2 = e[:-n]
        m = _mk_lAr(w2)
        if m is not None:
            w2 = w2[:-m]
            w3, ok = _tr_chain_ki(w2)
            return (w3 if ok else w2), True
        m = _mk_poss(w2)
        if m is not None:
            w2 = w2[:-m]
            k = _mk_lAr(w2)
            if k is not None:
                w2 = w2[:-k]
                w3, ok = _tr_chain_ki(w2)
                if ok:
                    w2 = w3
            return w2, True
        return w2, True
    # alt B: nUn ki -> delete, then lArI | (poss|sU) lAr? chain? | chain?
    n = _mk_nUn(e)
    if n is not None:
        w2 = e[:-n]
        m = _mk_lArI(w2)
        if m is not None:
            return w2[:-m], True
        m = _mk_poss(w2)
        if m is None:
            m = _mk_sU(w2)
        if m is not None:
            w2 = w2[:-m]
            k = _mk_lAr(w2)
            if k is not None:
                w2 = w2[:-k]
                w3, ok = _tr_chain_ki(w2)
                if ok:
                    w2 = w3
            return w2, True
        w3, ok = _tr_chain_ki(w2)
        return (w3 if ok else w2), True
    # alt C: ndA ki (marked only): lArI/sU delete through the tail; the
    # recursive fallback edits the prefix and KEEPS the ndA+ki tail
    n = _mk_ndA(e)
    if n is not None:
        w2 = e[:-n]
        m = _mk_lArI(w2)
        if m is not None:
            return w2[:-m], True
        m = _mk_sU(w2)
        if m is not None:
            w2 = w2[:-m]
            k = _mk_lAr(w2)
            if k is not None:
                w2 = w2[:-k]
                w3, ok = _tr_chain_ki(w2)
                if ok:
                    w2 = w3
            return w2, True
        w3, ok = _tr_chain_ki(w2)
        if ok:
            return w3 + e[len(e) - n:] + "ki", True
        return w, False
    return w, False


def _tr_noun(w: str) -> str:
    """r_stem_noun_suffixes (one pass; returns the possibly-shortened word)."""
    # N1: lAr, delete, chain_ki?
    n = _mk_lAr(w)
    if n is not None:
        w = w[:-n]
        w2, ok = _tr_chain_ki(w)
        return w2 if ok else w
    # N2: ncA, delete, then lArI | (poss|sU) lAr?+chain | lAr+chain
    n = _mk_ncA(w)
    if n is not None:
        w = w[:-n]
        m = _mk_lArI(w)
        if m is not None:
            return w[:-m]
        m = _mk_poss(w)
        if m is None:
            m = _mk_sU(w)
        if m is not None:
            w = w[:-m]
            k = _mk_lAr(w)
            if k is not None:
                w = w[:-k]
                w2, ok = _tr_chain_ki(w)
                if ok:
                    w = w2
            return w
        k = _mk_lAr(w)
        if k is not None:
            w2 = w[:-k]
            w3, ok = _tr_chain_ki(w2)
            if ok:
                return w3
            return w2
        return w
    # N3: (ndA|nA) then lArI | sU lAr?+chain | chain(prefix, tail kept)
    n = _tr_first(w, _mk_ndA, _mk_nA)
    if n is not None:
        e = w[:-n]
        m = _mk_lArI(e)
        if m is not None:
            return e[:-m]
        m = _mk_sU(e)
        if m is not None:
            e = e[:-m]
            k = _mk_lAr(e)
            if k is not None:
                e = e[:-k]
                w2, ok = _tr_chain_ki(e)
                if ok:
                    e = w2
            return e
        w2, ok = _tr_chain_ki(e)
        if ok:
            return w2 + w[len(w) - n:]
        # fall through to later alternatives on the ORIGINAL word
    # N4: (ndAn|nU) then (sU lAr?+chain | lArI)
    n = _tr_first(w, _mk_ndAn, _mk_nU)
    if n is not None:
        e = w[:-n]
        m = _mk_sU(e)
        if m is not None:
            e = e[:-m]
            k = _mk_lAr(e)
            if k is not None:
                e = e[:-k]
                w2, ok = _tr_chain_ki(e)
                if ok:
                    e = w2
            return e
        m = _mk_lArI(e)
        if m is not None:
            return e[:-m]
        # neither: alternative fails, continue
    # N5: DAn, delete, then (poss lAr?+chain | lAr chain? | chain)?
    n = _mk_DAn(w)
    if n is not None:
        w = w[:-n]
        m = _mk_poss(w)
        if m is not None:
            w = w[:-m]
            k = _mk_lAr(w)
            if k is not None:
                w = w[:-k]
                w2, ok = _tr_chain_ki(w)
                if ok:
                    w = w2
            return w
        m = _mk_lAr(w)
        if m is not None:
            w2 = w[:-m]
            w3, ok = _tr_chain_ki(w2)
            return w3 if ok else w2
        w2, ok = _tr_chain_ki(w)
        return w2 if ok else w
    # N6: (nUn|ylA), delete, then [lAr+chain | (poss|sU) lAr?+chain | chain]?
    n = _tr_first(w, _mk_nUn, _mk_ylA)
    if n is not None:
        w = w[:-n]
        m = _mk_lAr(w)
        if m is not None:
            w = w[:-m]
            w2, ok = _tr_chain_ki(w)
            if ok:
                return w2
            # lAr slice persists; fall to the (poss|sU) alternative
        m = _mk_poss(w)
        if m is None:
            m = _mk_sU(w)
        if m is not None:
            w = w[:-m]
            k = _mk_lAr(w)
            if k is not None:
                w = w[:-k]
                w2, ok = _tr_chain_ki(w)
                if ok:
                    w = w2
            return w
        w2, ok = _tr_chain_ki(w)
        return w2 if ok else w
    # N7: lArI
    n = _mk_lArI(w)
    if n is not None:
        return w[:-n]
    # N8: chain_ki at the end
    w2, ok = _tr_chain_ki(w)
    if ok:
        return w2
    # N9: (DA|yU|yA), delete, then [poss lAr(mark)? | lAr] + slice + chain?
    n = _tr_first(w, _mk_DA, _mk_yU, _mk_yA)
    if n is not None:
        w = w[:-n]
        m = _mk_poss(w)
        if m is not None:
            w = w[:-m]
            k = _mk_lAr(w)
            if k is not None:
                w = w[:-k]
            w2, ok = _tr_chain_ki(w)
            return w2 if ok else w
        m = _mk_lAr(w)
        if m is not None:
            w = w[:-m]
            w2, ok = _tr_chain_ki(w)
            return w2 if ok else w
        return w
    # N10: (poss|sU), delete, then [lAr + chain]?
    n = _mk_poss(w)
    if n is None:
        n = _mk_sU(w)
    if n is not None:
        w = w[:-n]
        k = _mk_lAr(w)
        if k is not None:
            w = w[:-k]
            w2, ok = _tr_chain_ki(w)
            if ok:
                w = w2
        return w
    return w


def turkish_stem(w: str) -> str:
    if sum(1 for c in w if c in _TR_VOWELS) < 2:
        return w
    w, cont = _tr_nominal_verb(w)
    if not cont:
        return w
    w = _tr_noun(w)
    # postlude
    if w in ("ad", "soyad"):
        return w
    if w.endswith(("d", "g")):
        j = len(w) - 1
        while j >= 0 and w[j] not in _TR_VOWELS:
            j -= 1
        if j >= 0:
            v = w[j]
            if v in "aı":
                w += "ı"
            elif v in "ei":
                w += "i"
            elif v in "ou":
                w += "u"
            else:
                w += "ü"
    last = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}.get(w[-1:] or "")
    if last:
        w = w[:-1] + last
    return w


# ---------------------------------------------------------------------------
# Irish (snowball/ext/IrishStemmer.java, Snowball 2.0 'irish'): an initial
# mutation/eclipsis prefix table, then noun / derivational / verb suffix
# tables gated on the standard pV/p1/p2 regions — validated against the
# reference's irish.zip vocabulary.
# ---------------------------------------------------------------------------

_GA_V = frozenset("aeiouáéíóú")

#: initial_morph among a_0 (longest prefix wins): replacement or None=delete
_GA_PREFIXES = (
    ("d'fh", "f"), ("bhf", "f"),
    ("b'", None), ("bh", "b"), ("bp", "p"), ("ch", "c"), ("d'", None),
    ("dh", "d"), ("dt", "t"), ("fh", "f"), ("gc", "c"), ("gh", "g"),
    ("h-", None), ("m'", None), ("mb", "b"), ("mh", "m"), ("n-", None),
    ("nd", "d"), ("ng", "g"), ("ph", "p"), ("sh", "s"), ("t-", None),
    ("th", "t"), ("ts", "s"),
)

#: noun_sfx among a_1: (suffix, region) region 1 = R1, 2 = R2; delete
_GA_NOUN = (
    ("íochta", 1), ("aíochta", 1), ("ire", 2), ("aire", 2), ("abh", 1),
    ("eabh", 1), ("ibh", 1), ("aibh", 1), ("amh", 1), ("eamh", 1),
    ("imh", 1), ("aimh", 1), ("íocht", 1), ("aíocht", 1), ("irí", 2),
    ("airí", 2),
)

#: deriv among a_2: (suffix, region-or-None, replacement-or-None)
_GA_DERIV = (
    ("óideacha", None, "óid"), ("patacha", None, "paite"),
    ("achta", 2, None), ("arcachta", None, "arc"), ("eachta", 2, None),
    ("grafaíochta", None, "graf"), ("paite", None, "paite"),
    ("ach", 2, None), ("each", 2, None), ("óideach", None, "óid"),
    ("gineach", None, "gin"), ("patach", None, "paite"),
    ("grafaíoch", None, "graf"), ("pataigh", None, "paite"),
    ("óidigh", None, "óid"), ("achtúil", 2, None), ("eachtúil", 2, None),
    ("gineas", None, "gin"), ("ginis", None, "gin"), ("acht", 2, None),
    ("arcacht", None, "arc"), ("eacht", 2, None),
    ("grafaíocht", None, "graf"), ("arcachtaí", None, "arc"),
    ("grafaíochtaí", None, "graf"),
)

#: verb_sfx among a_3: (suffix, region) region 0 = RV, 1 = R1; delete
_GA_VERB = (
    ("imid", 0), ("aimid", 0), ("ímid", 0), ("aímid", 0), ("adh", 1),
    ("eadh", 1), ("faidh", 0), ("fidh", 0), ("áil", 1), ("ain", 1),
    ("tear", 1), ("tar", 1),
)


def _ga_regions(w: str):
    n = len(w)
    pV = p1 = p2 = n
    for i, ch in enumerate(w):
        if ch in _GA_V:
            pV = i + 1
            break
    i = 0
    while i < n and w[i] not in _GA_V:
        i += 1
    while i < n and w[i] in _GA_V:
        i += 1
    if i < n:
        p1 = i + 1
        i += 1
        while i < n and w[i] not in _GA_V:
            i += 1
        while i < n and w[i] in _GA_V:
            i += 1
        if i < n:
            p2 = i + 1
    return pV, p1, p2


def irish_stem(w: str) -> str:
    """Snowball Irish (snowball/ext/IrishStemmer.java:330-352): prefix
    mutation strip, then noun/deriv/verb suffix passes applied in sequence
    on the mutated word, each gated on regions computed from the
    prefix-stripped form."""
    for pre, rep in sorted(_GA_PREFIXES, key=lambda x: -len(x[0])):
        if w.startswith(pre):
            w = (rep or "") + w[len(pre):]
            break
    pV, p1, p2 = _ga_regions(w)

    def gate(region: int, start: int) -> bool:
        bound = (pV, p1, p2)[region]
        return bound <= start

    # noun_sfx: longest suffix in the table; fires only if its region allows
    for suf, reg in sorted(_GA_NOUN, key=lambda x: -len(x[0])):
        if w.endswith(suf):
            if gate(reg, len(w) - len(suf)):
                w = w[: -len(suf)]
            break
    for suf, reg, rep in sorted(_GA_DERIV, key=lambda x: -len(x[0])):
        if w.endswith(suf):
            if reg is None:
                w = w[: -len(suf)] + rep
            elif gate(reg, len(w) - len(suf)):
                w = w[: -len(suf)]
            break
    for suf, reg in sorted(_GA_VERB, key=lambda x: -len(x[0])):
        if w.endswith(suf):
            if gate(reg, len(w) - len(suf)):
                w = w[: -len(suf)]
            break
    return w


# ---------------------------------------------------------------------------
# Armenian (snowball/ext/ArmenianStemmer.java, Snowball 2.0 'armenian'):
# ending (R2-gated) -> verb -> adjective -> noun suffix passes, every
# match bounded to start at or after pV. Among tables machine-extracted.
# ---------------------------------------------------------------------------

_HY_V = frozenset("աեէըիոււօ")

_HY_ADJ = (
    "երորդ", "ական", "ավետ", "արան", "եկեն", "երեն", "լայն", "ովին",
    "որակ", "որէն", "վուն", "րորդ", "ալի", "ակի", "բար", "գին", "կոտ",
    "պես", "ատ", "եղ", "են", "ին", "իվ",
)

_HY_VERB = (
    "ացրինք", "վեցինք", "ալուց", "ացանք", "ացինք", "ացնալ", "ացվել",
    "ացրեց", "ացրին", "ացրիր", "ացրիք", "ելուց", "եցինք", "եցնել",
    "եցվել", "կոտել", "վեցին", "վեցիր", "վեցիք", "ալիս", "ալով",
    "ալու", "անալ", "ատել", "ացան", "ացավ", "ացար", "ացաք", "ացին",
    "ացիր", "ացիք", "ացրի", "ելիս", "ելով", "ելու", "ենալ", "եցավ",
    "եցար", "եցին", "եցիր", "եցիք", "ոտել", "վեցի", "վում", "ցանք",
    "ցնել", "անք", "ացա", "ացի", "եցա", "եցի", "ըալ", "ըել", "նել",
    "ում", "չել", "ված", "վել", "տել", "ցան", "ցաք", "ալ", "ան", "ավ",
    "ար", "աց", "աք", "ել", "եց", "վե", "ա",
)

_HY_NOUN = (
    "ություն", "մունք", "ալիք", "անակ", "անիք", "անօց", "ավոր", "արան",
    "եղէն", "յուն", "ուհի", "ույթ", "ույք", "ունք", "ուստ", "ստան",
    "վածք", "ածո", "արք", "գար", "ենք", "իչք", "յակ", "ոնք", "որդ",
    "ուկ", "ուս", "չեք", "պան", "վոր", "ակ", "ան", "իլ", "իկ", "իչ",
    "իք", "ոց", "ու", "ցի", "ք",
)

_HY_ENDING = (
    "ությանդ", "ությանը", "ությանն", "ությանս", "ներում", "ության",
    "անում", "երում", "ներին", "ներից", "ներով", "վանից", "անով",
    "երին", "երից", "երով", "ներդ", "ները", "ների", "ներն", "ոջից",
    "վանդ", "վանը", "վանս", "ամբ", "անդ", "անը", "երդ", "երը", "երի",
    "երն", "ներ", "ոջդ", "ոջը", "ոջս", "ուդ", "ուն", "ուց", "վան",
    "վից", "վով", "ցից", "ան", "եր", "ին", "ից", "ոջ", "ով", "ոց",
    "սա", "վա", "վի", "դ", "ը", "ի", "ն", "ց",
)


def _hy_regions(w: str):
    n = len(w)
    pV = p2 = n
    i = 0
    while i < n and w[i] not in _HY_V:
        i += 1
    if i < n:
        i += 1
        pV = i
        while i < n and w[i] in _HY_V:
            i += 1
        if i < n:
            i += 1
            while i < n and w[i] not in _HY_V:
                i += 1
            if i < n:
                i += 1
                while i < n and w[i] in _HY_V:
                    i += 1
                if i < n:
                    i += 1
                    p2 = i
    return pV, p2


def armenian_stem(w: str) -> str:
    """Snowball Armenian (snowball/ext/ArmenianStemmer.java:334-368).

    All four passes match with limit_backward = pV — the pV bound
    constrains MATCHING (a longest suffix crossing pV is not considered;
    shorter ones still are), while the ending pass's R2 check is a
    post-gate on the committed longest match (gated -> no shorter retry).
    """
    pV, p2 = _hy_regions(w)

    def strip(word: str, table, gate: int = 0) -> str:
        tail = word[pV:]
        for suf in table:
            if tail.endswith(suf):
                start = len(word) - len(suf)
                if start >= gate:
                    return word[:start]
                return word
        return word

    w = strip(w, _HY_ENDING, gate=p2)
    w = strip(w, _HY_VERB)
    w = strip(w, _HY_ADJ)
    w = strip(w, _HY_NOUN)
    return w
