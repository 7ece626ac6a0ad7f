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


# ---------------------------------------------------------------------------
# Catalan (snowball/ext/CatalanStemmer.java, Snowball 2.0 'catalan'):
# attached pronoun -> (standard suffix | verb suffix) -> residual suffix,
# R1/R2 post-gates, then accent cleaning. Among tables machine-extracted.
# ---------------------------------------------------------------------------

_CA_V = frozenset("aeiouàáèéíïòóúü")

_CA_A_0 = (
    ("·", 6), ("à", 1), ("á", 1), ("è", 2), ("é", 2), ("ì", 3),
    ("í", 3), ("ï", 3), ("ò", 4), ("ó", 4), ("ú", 5), ("ü", 5),
)

_CA_A_1 = (
    ("selas", 1), ("selos", 1), ("-les", 1), ("-nos", 1), ("sela", 1),
    ("selo", 1), ("'hi", 1), ("'ho", 1), ("'ls", 1), ("'ns", 1),
    ("-la", 1), ("-li", 1), ("-ls", 1), ("-me", 1), ("-ns", 1),
    ("-te", 1), ("-us", 1), ("ens", 1), ("las", 1), ("les", 1),
    ("los", 1), ("nos", 1), ("vos", 1), ("'l", 1), ("'m", 1),
    ("'n", 1), ("'s", 1), ("'t", 1), ("-m", 1), ("-n", 1), ("hi", 1),
    ("ho", 1), ("la", 1), ("le", 1), ("li", 1), ("lo", 1), ("me", 1),
    ("se", 1), ("us", 1),
)

_CA_A_2 = (
    ("allengües", 1), ("ativitats", 1), ("quíssimes", 5),
    ("ativitat", 1), ("bilitats", 1), ("ialismes", 1), ("ialistes", 1),
    ("ionistes", 1), ("lógiques", 3), ("quíssima", 5), ("quíssims", 5),
    ("atòries", 1), ("bilitat", 1), ("ialisme", 1), ("ialista", 1),
    ("ionisme", 1), ("ionista", 1), ("isament", 1), ("ivitats", 1),
    ("quíssim", 5), ("íssimes", 1), ("acions", 2), ("aments", 1),
    ("ancies", 1), ("atives", 1), ("atòria", 1), ("encies", 1),
    ("formes", 1), ("idores", 1), ("ificar", 1), ("ivisme", 1),
    ("ivitat", 1), ("logies", 3), ("logíes", 3), ("lógica", 3),
    ("lógics", 3), ("ències", 1), ("íssima", 1), ("íssims", 1),
    ("ables", 1), ("adora", 1), ("adors", 1), ("adura", 1),
    ("ament", 1), ("ancia", 1), ("asses", 1), ("assos", 1),
    ("atius", 1), ("ativa", 1), ("cions", 1), ("doras", 1),
    ("dores", 1), ("dures", 1), ("encia", 1), ("eries", 1),
    ("ibles", 1), ("ictes", 1), ("idors", 1), ("inies", 1),
    ("iques", 4), ("ismes", 1), ("issem", 1), ("isseu", 1),
    ("issos", 1), ("istes", 1), ("itats", 1), ("itzar", 1),
    ("logia", 3), ("logis", 3), ("logía", 3), ("ments", 1),
    ("sfera", 1), ("toris", 1), ("trius", 1), ("àries", 1),
    ("ència", 1), ("ìssem", 1), ("ìsseu", 1), ("ìssin", 1),
    ("ícies", 1), ("íinia", 1), ("ínies", 1), ("íssem", 1),
    ("ísseu", 1), ("íssim", 1), ("íssiu", 1), ("ístic", 1),
    ("ívola", 1), ("ïtats", 1), ("able", 1), ("ació", 1), ("ades", 2),
    ("aire", 1), ("alla", 1), ("amen", 1), ("ants", 1), ("aris", 1),
    ("assa", 1), ("atge", 1), ("atiu", 1), ("bles", 1), ("dora", 1),
    ("dors", 1), ("egar", 1), ("ejar", 1), ("ella", 1), ("ells", 1),
    ("enca", 1), ("ents", 1), ("eres", 1), ("eria", 1), ("eses", 1),
    ("esos", 1), ("essa", 1), ("ible", 1), ("icis", 1), ("icte", 1),
    ("ient", 1), ("imes", 1), ("ines", 1), ("inia", 1), ("ions", 1),
    ("isam", 1), ("isme", 1), ("issa", 1), ("ista", 1), ("iste", 1),
    ("itar", 1), ("itat", 1), ("ites", 1), ("ives", 1), ("logi", 3),
    ("ment", 1), ("nces", 1), ("ores", 1), ("oses", 1), ("osos", 1),
    ("otes", 1), ("tori", 1), ("triu", 1), ("ària", 1), ("ícia", 1),
    ("ícis", 1), ("ívol", 1), ("ïtat", 1), ("ada", 2), ("all", 1),
    ("als", 1), ("ana", 1), ("ant", 1), ("ari", 1), ("ats", 1),
    ("ble", 1), ("ció", 1), ("dor", 1), ("dur", 1), ("dís", 1),
    ("ell", 1), ("enc", 1), ("ent", 1), ("era", 1), ("ers", 1),
    ("esa", 1), ("esc", 1), ("eta", 1), ("ets", 1), ("fer", 1),
    ("ica", 4), ("ici", 1), ("ics", 4), ("ima", 1), ("ims", 1),
    ("ina", 1), ("ita", 1), ("ius", 1), ("iva", 1), ("nça", 1),
    ("ora", 1), ("ors", 1), ("osa", 1), ("ota", 1), ("ots", 1),
    ("uds", 1), ("uts", 1), ("íci", 1), ("al", 1), ("ar", 1),
    ("et", 1), ("ic", 4), ("il", 1), ("ió", 1), ("ls", 1), ("or", 1),
    ("ot", 1), ("ud", 1), ("ès", 1), ("és", 1), ("ís", 1), ("ós", 1),
    ("ó", 1),
)

_CA_A_3 = (
    ("aríamos", 1), ("eresseu", 1), ("eríamos", 1), ("iríamos", 1),
    ("iéramos", 1), ("iésemos", 1), ("adores", 1), ("aremos", 1),
    ("aríais", 1), ("asteis", 1), ("eremos", 1), ("eríais", 1),
    ("esquen", 1), ("esques", 1), ("esquin", 1), ("esquis", 1),
    ("ierais", 1), ("ieseis", 1), ("iremos", 1), ("iríais", 1),
    ("isquen", 1), ("isteis", 1), ("ábamos", 1), ("áramos", 1),
    ("ásemos", 1), ("ïsquen", 1), ("ïsques", 1), ("abais", 1),
    ("adora", 1), ("adors", 1), ("arais", 1), ("arian", 1),
    ("arien", 1), ("aries", 1), ("aréis", 1), ("arían", 1),
    ("arías", 1), ("aríem", 1), ("aríeu", 1), ("aseis", 1),
    ("assen", 1), ("asses", 1), ("asseu", 1), ("assim", 1),
    ("assin", 1), ("assis", 1), ("assiu", 1), ("atges", 1),
    ("eixen", 1), ("eixer", 1), ("eixes", 1), ("eixin", 1),
    ("eixis", 1), ("erass", 1), ("eréis", 1), ("erían", 1),
    ("erías", 1), ("esqui", 1), ("essen", 1), ("esses", 1),
    ("esseu", 1), ("essim", 1), ("essin", 1), ("essis", 1),
    ("iendo", 1), ("ieran", 1), ("ieras", 1), ("ieron", 1),
    ("iesen", 1), ("ieses", 1), ("iguem", 1), ("igueu", 1),
    ("irien", 1), ("iries", 1), ("iréis", 1), ("irìem", 1),
    ("irìeu", 1), ("irían", 1), ("irías", 1), ("iríem", 1),
    ("iríeu", 1), ("issen", 1), ("isses", 1), ("issim", 1),
    ("issin", 1), ("issis", 1), ("issiu", 1), ("itzeu", 1),
    ("itzis", 1), ("àssem", 1), ("àsseu", 1), ("àssim", 1),
    ("àssiu", 1), ("èssim", 1), ("èssiu", 1), ("éssem", 1),
    ("éssen", 1), ("ésseu", 1), ("éssim", 1), ("éssiu", 1),
    ("íamos", 1), ("íssim", 1), ("íssiu", 1), ("ïguem", 1),
    ("ïgueu", 1), ("ïssen", 1), ("ïsses", 1), ("ïssin", 1),
    ("ïssis", 1), ("aban", 1), ("abas", 1), ("adas", 1), ("ades", 1),
    ("ador", 1), ("ados", 1), ("amos", 1), ("ando", 2), ("aran", 1),
    ("aras", 1), ("arem", 1), ("aren", 1), ("ares", 1), ("areu", 1),
    ("aria", 1), ("aron", 1), ("aràs", 1), ("arán", 1), ("arás", 1),
    ("arés", 1), ("aría", 1), ("asen", 1), ("ases", 1), ("aste", 1),
    ("avem", 1), ("aven", 1), ("aves", 1), ("eixi", 1), ("eixo", 1),
    ("ents", 1), ("erau", 1), ("eren", 1), ("erán", 1), ("erás", 1),
    ("ería", 1), ("esca", 1), ("idas", 1), ("ides", 1), ("idos", 1),
    ("iera", 1), ("iese", 1), ("imos", 1), ("ineu", 1), ("inin", 1),
    ("inis", 1), ("iran", 1), ("irem", 1), ("iren", 1), ("ires", 1),
    ("ireu", 1), ("iria", 1), ("iràs", 1), ("irán", 1), ("irás", 1),
    ("iría", 1), ("isca", 1), ("isin", 1), ("isis", 1), ("iste", 1),
    ("itza", 1), ("itzi", 1), ("itzo", 1), ("itzà", 1), ("ixen", 1),
    ("ixes", 1), ("ques", 1), ("tzar", 1), ("udes", 1), ("àrem", 1),
    ("àren", 1), ("àreu", 1), ("àvem", 1), ("àveu", 1), ("ávem", 1),
    ("áveu", 1), ("íais", 1), ("írem", 1), ("íreu", 1), ("ïdes", 1),
    ("ïren", 1), ("ïres", 1), ("ïsca", 1), ("ïxen", 1), ("ïxes", 1),
    ("aba", 1), ("ada", 1), ("ado", 1), ("ams", 1), ("ant", 1),
    ("ara", 1), ("arà", 1), ("ará", 1), ("aré", 1), ("ase", 1),
    ("ass", 1), ("ats", 1), ("ava", 1), ("dre", 1), ("eix", 1),
    ("ent", 1), ("erá", 1), ("eré", 1), ("ess", 1), ("ida", 1),
    ("ido", 1), ("ids", 1), ("ien", 1), ("ies", 1), ("ieu", 1),
    ("ini", 1), ("int", 1), ("ira", 1), ("irà", 1), ("irá", 1),
    ("irè", 1), ("iré", 1), ("isc", 1), ("its", 1), ("itz", 1),
    ("ixa", 1), ("ixo", 1), ("iïn", 1), ("iïs", 1), ("sin", 1),
    ("sis", 1), ("uda", 1), ("áis", 1), ("ìeu", 1), ("ían", 1),
    ("ías", 1), ("íem", 1), ("íeu", 1), ("ïda", 1), ("ïen", 1),
    ("ïes", 1), ("ïra", 1), ("ïsc", 1), ("ïxo", 1), ("ad", 1),
    ("am", 1), ("an", 1), ("ar", 1), ("as", 1), ("at", 1), ("au", 1),
    ("ed", 1), ("em", 1), ("en", 1), ("er", 1), ("es", 1), ("ia", 1),
    ("id", 1), ("ie", 1), ("ii", 1), ("in", 1), ("io", 1), ("ir", 1),
    ("it", 1), ("ix", 1), ("ià", 1), ("iï", 1), ("ió", 1), ("re", 1),
    ("ut", 1), ("às", 1), ("és", 1), ("ía", 1), ("ís", 1), ("ïa", 1),
    ("ïm", 1), ("ït", 1), ("ïu", 1), ("ïx", 1), ("í", 1),
)

_CA_A_4 = (
    ("iqu", 2), ("itz", 1), ("eu", 1), ("ir", 1), ("is", 1), ("it", 1),
    ("iu", 1), ("os", 1), ("ïn", 1), ("ïs", 1), ("a", 1), ("e", 1),
    ("i", 1), ("o", 1), ("s", 1), ("à", 1), ("á", 1), ("é", 1),
    ("ì", 1), ("í", 1), ("ï", 1), ("ó", 1),
)


_CA_CLEAN = str.maketrans({
    "à": "a", "á": "a", "è": "e", "é": "e", "ì": "i", "í": "i",
    "ï": "i", "ò": "o", "ó": "o", "ú": "u", "ü": "u", "·": ".",
})


def _std_regions(w: str, vowels) -> tuple:
    """Standard snowball p1/p2: after the first non-vowel following the
    first vowel; p2 likewise continuing from p1."""
    n = len(w)
    p1 = p2 = n
    i = 0
    while i < n and w[i] not in vowels:
        i += 1
    if i < n:
        i += 1
        while i < n and w[i] in vowels:
            i += 1
        if i < n:
            i += 1
            p1 = i
            while i < n and w[i] not in vowels:
                i += 1
            if i < n:
                i += 1
                while i < n and w[i] in vowels:
                    i += 1
                if i < n:
                    i += 1
                    p2 = i
    return p1, p2


def _match_b(word: str, table):
    """Longest-suffix match: (suffix, action) or None (tables pre-sorted
    by length desc)."""
    for suf, act in table:
        if word.endswith(suf):
            return suf, act
    return None


def catalan_stem(w: str) -> str:
    """Snowball Catalan (snowball/ext/CatalanStemmer.java:684-724)."""
    p1, p2 = _std_regions(w, _CA_V)

    def gated(word, suf, region):
        return len(word) - len(suf) >= (p1 if region == 1 else p2)

    m = _match_b(w, _CA_A_1)
    if m and gated(w, m[0], 1):
        w = w[: -len(m[0])]
    did = False
    m = _match_b(w, _CA_A_2)
    if m:
        suf, act = m
        if act == 1 and gated(w, suf, 1):
            w = w[: -len(suf)]
            did = True
        elif act == 2 and gated(w, suf, 2):
            w = w[: -len(suf)]
            did = True
        elif act == 3 and gated(w, suf, 2):
            w = w[: -len(suf)] + "log"
            did = True
        elif act == 4 and gated(w, suf, 2):
            w = w[: -len(suf)] + "ic"
            did = True
        elif act == 5 and gated(w, suf, 1):
            w = w[: -len(suf)] + "c"
            did = True
    if not did:
        m = _match_b(w, _CA_A_3)
        if m:
            suf, act = m
            if gated(w, suf, act):
                w = w[: -len(suf)]
    m = _match_b(w, _CA_A_4)
    if m:
        suf, act = m
        if act == 1 and gated(w, suf, 1):
            w = w[: -len(suf)]
        elif act == 2 and gated(w, suf, 1):
            w = w[: -len(suf)] + "ic"
    return w.translate(_CA_CLEAN)


# ---------------------------------------------------------------------------
# Basque (snowball/ext/BasqueStemmer.java, Snowball 2.0 'basque'):
# repeat(aditzak) -> repeat(izenak) -> adjetiboak. The repeats continue
# matching LEFTWARD from the last slice position (snowball cursor
# semantics), not from the end of the word. Among tables machine-extracted.
# ---------------------------------------------------------------------------

_EU_V = frozenset("aeiou")

_EU_A_0 = (
    ("arabera", 4), ("atseden", 3), ("tzailea", 1), ("aldatu", 1),
    ("baditu", 5), ("erreza", 1), ("gailua", 1), ("gaitza", 1),
    ("garria", 2), ("kaitza", 1), ("karria", 1), ("kizuna", 1),
    ("kundea", 1), ("kuntza", 1), ("tailea", 1), ("taldia", 1),
    ("tarazi", 1), ("tezina", 1), ("tzaile", 1), ("aldia", 1),
    ("arazi", 1), ("bidea", 1), ("errez", 1), ("etari", 1),
    ("ezina", 1), ("gailu", 1), ("gaitz", 1), ("galea", 1),
    ("garri", 2), ("gunea", 1), ("kaitz", 1), ("karia", 1),
    ("karri", 1), ("kidea", 1), ("kizun", 1), ("korra", 1),
    ("kunde", 1), ("kunea", 1), ("pidea", 1), ("rekin", 1),
    ("taile", 1), ("taldi", 1), ("tezin", 1), ("tzaga", 1),
    ("tzaka", 1), ("tzake", 1), ("tzeke", 1), ("aldi", 1), ("atze", 1),
    ("bera", 1), ("bide", 1), ("dako", 1), ("dura", 1), ("etan", 1),
    ("ezin", 1), ("gaia", 1), ("gale", 1), ("gune", 1), ("gura", 1),
    ("idea", 1), ("kari", 1), ("kera", 1), ("keta", 1), ("kide", 1),
    ("kina", 1), ("kuna", 1), ("kune", 1), ("kura", 1), ("lari", 1),
    ("mena", 1), ("orra", 1), ("pena", 1), ("pera", 1), ("pide", 1),
    ("rean", 1), ("tari", 1), ("tatu", 1), ("tuna", 1), ("tura", 1),
    ("tzat", 1), ("tzez", 1), ("ago", 1), ("ari", 1), ("atu", 1),
    ("ean", 1), ("era", 1), ("eta", 1), ("eza", 1), ("gai", 1),
    ("ide", 1), ("kan", 1), ("kin", 1), ("kor", 1), ("men", 1),
    ("pen", 1), ("tio", 1), ("tun", 1), ("tza", 2), ("tze", 1),
    ("an", 1), ("du", 1), ("ez", 1), ("go", 1), ("ka", 1), ("ki", 1),
    ("la", 1), ("le", 1), ("or", 1), ("tu", 1),
)

_EU_A_1 = (
    ("minutuko", 6), ("garrena", 1), ("gerrena", 1), ("aurrea", 1),
    ("garren", 1), ("garria", 2), ("gerren", 1), ("gibela", 1),
    ("gintza", 1), ("gintzo", 1), ("gintzu", 1), ("handia", 1),
    ("kaldea", 1), ("kintza", 1), ("kirria", 1), ("koitza", 1),
    ("kondoa", 1), ("kuntza", 1), ("larria", 1), ("mendia", 1),
    ("mendua", 1), ("mentua", 1), ("ontzia", 1), ("taldea", 1),
    ("taldia", 1), ("tariko", 1), ("tasuna", 1), ("tzaina", 1),
    ("tzalea", 1), ("tzarra", 1), ("urrena", 1), ("zionea", 1),
    ("aizun", 1), ("aldea", 1), ("aldia", 1), ("antza", 1),
    ("artea", 1), ("asuna", 1), ("aurka", 10), ("aurre", 1),
    ("behar", 1), ("bizia", 1), ("burua", 1), ("degia", 1),
    ("denda", 1), ("duria", 1), ("durua", 1), ("eroza", 1),
    ("estua", 1), ("etako", 1), ("etara", 1), ("etxea", 1),
    ("gabea", 1), ("garna", 1), ("garri", 2), ("geldi", 8),
    ("gibel", 1), ("gilea", 1), ("gunea", 1), ("handi", 1),
    ("igaro", 9), ("kabea", 1), ("kaila", 1), ("kalde", 1),
    ("karia", 1), ("keria", 1), ("kirri", 1), ("koitz", 1),
    ("kondo", 1), ("korra", 1), ("kotea", 1), ("kumea", 1),
    ("laria", 1), ("larri", 1), ("lekua", 1), ("liara", 1),
    ("mendi", 1), ("mendu", 1), ("mentu", 1), ("nahia", 1),
    ("ondoa", 1), ("ontzi", 1), ("ordea", 1), ("ordua", 1),
    ("ostea", 1), ("skila", 1), ("takoa", 1), ("talde", 1),
    ("taldi", 1), ("taria", 1), ("tarik", 1), ("taroa", 1),
    ("tasun", 1), ("tegia", 1), ("teria", 1), ("tiara", 1),
    ("tokia", 1), ("trako", 5), ("tzain", 1), ("tzale", 1),
    ("tzara", 1), ("urren", 1), ("zaina", 1), ("zalea", 1),
    ("zaroa", 1), ("zehar", 7), ("zinoa", 1), ("zione", 1),
    ("alde", 1), ("aldi", 1), ("anda", 1), ("anga", 1), ("aria", 1),
    ("aroa", 1), ("arte", 1), ("asia", 1), ("asun", 1), ("bera", 1),
    ("buru", 2), ("dara", 1), ("degi", 1), ("duna", 1), ("duri", 1),
    ("duru", 1), ("egia", 1), ("emea", 1), ("enea", 1), ("eria", 1),
    ("eroa", 1), ("eroz", 1), ("estu", 1), ("etan", 1), ("etxe", 1),
    ("ezia", 1), ("gabe", 1), ("gaia", 1), ("geia", 1), ("gela", 1),
    ("gile", 1), ("giro", 1), ("gune", 1), ("joka", 3), ("kabe", 1),
    ("kada", 1), ("kail", 1), ("kana", 1), ("kari", 1), ("kera", 1),
    ("keta", 1), ("kide", 1), ("kina", 1), ("koia", 1), ("kote", 1),
    ("kume", 1), ("lari", 1), ("leku", 1), ("liar", 1), ("mina", 1),
    ("nahi", 1), ("ngoa", 1), ("ohia", 1), ("ondo", 1), ("orde", 1),
    ("ordu", 1), ("oroa", 1), ("osoa", 1), ("oste", 1), ("pera", 1),
    ("tako", 1), ("tara", 1), ("tari", 1), ("taro", 1), ("tatu", 4),
    ("tegi", 1), ("tiar", 1), ("tila", 1), ("toki", 1), ("tsua", 1),
    ("ttoa", 1), ("tuko", 1), ("txoa", 1), ("txua", 1), ("tzar", 1),
    ("tzen", 4), ("tzoa", 1), ("tzua", 1), ("unea", 1), ("zain", 1),
    ("zale", 1), ("zaro", 1), ("zino", 1), ("zioa", 1), ("zkoa", 1),
    ("ztoa", 1), ("ada", 1), ("ail", 1), ("ara", 1), ("ari", 1),
    ("aro", 1), ("asi", 1), ("dar", 1), ("dua", 1), ("dun", 1),
    ("egi", 1), ("eko", 1), ("eme", 1), ("ena", 1), ("ero", 1),
    ("eta", 1), ("eza", 1), ("gai", 1), ("gei", 1), ("goi", 1),
    ("kan", 1), ("ket", 1), ("kia", 1), ("kin", 1), ("koa", 1),
    ("koi", 1), ("kor", 1), ("min", 1), ("nea", 1), ("ngo", 1),
    ("noa", 1), ("ohi", 1), ("oia", 1), ("ola", 1), ("ora", 2),
    ("oro", 1), ("osa", 1), ("oso", 1), ("pea", 1), ("ren", 2),
    ("ska", 1), ("sko", 1), ("sta", 1), ("tan", 1), ("tar", 1),
    ("tea", 1), ("ten", 4), ("tia", 1), ("toa", 1), ("tra", 1),
    ("tsu", 1), ("tto", 1), ("tua", 1), ("txo", 1), ("txu", 1),
    ("tza", 2), ("tzo", 1), ("tzu", 1), ("una", 1), ("une", 1),
    ("xka", 1), ("zio", 1), ("zka", 1), ("zko", 1), ("zto", 1),
    ("zua", 1), ("ñoa", 1), ("ak", 1), ("ar", 1), ("di", 1), ("du", 1),
    ("ek", 1), ("en", 4), ("ez", 1), ("ga", 1), ("ge", 1), ("go", 1),
    ("ka", 1), ("ki", 1), ("ko", 1), ("na", 1), ("ne", 1), ("no", 1),
    ("oi", 1), ("or", 2), ("os", 1), ("pe", 1), ("ra", 1), ("ro", 1),
    ("sa", 1), ("ta", 1), ("te", 1), ("ti", 1), ("to", 1), ("tu", 1),
    ("tz", 1), ("za", 1), ("zp", 1), ("zu", 1), ("ñi", 1), ("ño", 1),
    ("z", 1),
)

_EU_A_2 = (
    ("keria", 1), ("lanik", 1), ("larik", 1), ("dade", 1), ("date", 1),
    ("tade", 1), ("tate", 1), ("zlea", 2), ("ztik", 1), ("era", 1),
    ("ero", 1), ("rik", 1), ("gi", 1), ("go", 1), ("ik", 1), ("ki", 1),
    ("la", 1), ("ro", 1), ("to", 1),
)


#: per-table action maps: act -> (gate_region, replacement); region
#: 'v' = RV, 1 = R1, 2 = R2, None = ungated
_EU_ACT_0 = {1: ("v", ""), 2: (2, ""), 3: (None, "atseden"),
             4: (None, "arabera"), 5: (None, "baditu")}
_EU_ACT_1 = {1: ("v", ""), 2: (2, ""), 3: (None, "jok"), 4: (1, ""),
             5: (None, "tra"), 6: (None, "minutu"), 7: (None, "zehar"),
             8: (None, "geldi"), 9: (None, "igaro"), 10: (None, "aurka")}
_EU_ACT_2 = {1: ("v", ""), 2: (None, "z")}


def _rv_romance(w: str, V) -> int:
    """Snowball romance-language pV: second-letter-consonant -> after next
    vowel; two leading vowels -> after next consonant; consonant-vowel ->
    after the third letter; else end of word."""
    n = len(w)
    if n == 0:
        return 0
    if w[0] in V:
        if n > 1 and w[1] not in V:
            j = 2
            while j < n and w[j] not in V:
                j += 1
            return j + 1 if j < n else n
        j = 2
        while j < n and w[j] in V:
            j += 1
        return j + 1 if j < n else n
    if n > 1 and w[1] not in V:
        j = 2
        while j < n and w[j] not in V:
            j += 1
        return j + 1 if j < n else n
    if n > 1 and w[1] in V:
        return 3 if n > 2 else n
    return n


def _rule_b(w: str, end: int, table, actions, pV: int, p1: int, p2: int):
    """One backward among application at cursor=end: (new_w, new_end) or
    None if no match / gate failed."""
    tail = w[:end]
    for suf, act in table:
        if tail.endswith(suf):
            start = end - len(suf)
            region, rep = actions[act]
            if region == "v" and start < pV:
                return None
            if region == 1 and start < p1:
                return None
            if region == 2 and start < p2:
                return None
            return w[:start] + rep + w[end:], start
    return None


def basque_stem(w: str) -> str:
    """Snowball Basque (snowball/ext/BasqueStemmer.java:688-741)."""
    pV = _rv_romance(w, _EU_V)
    p1, p2 = _std_regions(w, _EU_V)
    end = len(w)
    while True:
        r = _rule_b(w, end, _EU_A_0, _EU_ACT_0, pV, p1, p2)
        if r is None:
            break
        w, end = r
    while True:
        r = _rule_b(w, end, _EU_A_1, _EU_ACT_1, pV, p1, p2)
        if r is None:
            break
        w, end = r
    r = _rule_b(w, end, _EU_A_2, _EU_ACT_2, pV, p1, p2)
    if r is not None:
        w, end = r
    return w


# ---------------------------------------------------------------------------
# Lithuanian (snowball/ext/LithuanianStemmer.java, Snowball 2.0
# 'lithuanian'): fix_conflicts -> step1 (R1-bounded case endings) ->
# fix_chdz -> repeat(step2, R1-bounded) -> fix_chdz -> fix_gd. Words
# starting with 'a' and longer than 6 compute p1 from position 1.
# ---------------------------------------------------------------------------

_LT_V = frozenset("aeiouyąęėįūų")

_LT_A_0 = (
    ("tumeisi", -1), ("tumėmės", -1), ("tumėtės", -1), ("enimis", -1),
    ("iuosna", -1), ("siuosi", -1), ("telėti", -1), ("terėti", -1),
    ("tumeis", -1), ("tumėme", -1), ("tumėte", -1), ("čiausi", -1),
    ("enims", -1), ("eniui", -1), ("enyje", -1), ("enyse", -1),
    ("eriai", -1), ("erimi", -1), ("erims", -1), ("eryje", -1),
    ("eryse", -1), ("iamės", -1), ("iatės", -1), ("iauti", -1),
    ("inėti", -1), ("iomis", -1), ("iosna", -1), ("iuose", -1),
    ("iuosi", -1), ("iuoti", -1), ("kimės", -1), ("siesi", -1),
    ("simės", -1), ("sitės", -1), ("tumei", -1), ("tumėm", -1),
    ("tumėt", -1), ("uosna", -1), ("ėjosi", -1), ("aisi", -1),
    ("amės", -1), ("asis", -1), ("atės", -1), ("ausi", -1),
    ("auti", -1), ("eisi", -1), ("enie", -1), ("enio", -1),
    ("enis", -1), ("eniu", -1), ("enti", -1), ("enys", -1),
    ("eria", -1), ("erie", -1), ("erys", -1), ("iais", -1),
    ("iame", -1), ("iams", -1), ("iasi", -1), ("iate", -1),
    ("iaus", -1), ("iems", -1), ("iesi", -1), ("imis", -1),
    ("imės", -1), ("inti", -1), ("ioje", -1), ("ioms", -1),
    ("iose", -1), ("ioti", -1), ("iuje", -1), ("iumi", -1),
    ("iuos", -1), ("kite", -1), ("omis", -1), ("omės", -1),
    ("osna", -1), ("otės", -1), ("sime", -1), ("site", -1),
    ("tute", -1), ("tųsi", -1), ("uisi", -1), ("umis", -1),
    ("uose", -1), ("uosi", -1), ("uoti", -1), ("ysis", -1),
    ("ysna", -1), ("čiau", -1), ("ėmis", -1), ("ėmės", -1),
    ("ėsna", -1), ("ėtės", -1), ("ais", -1), ("ame", -1), ("ams", -1),
    ("asi", -1), ("ate", -1), ("aus", -1), ("ens", -1), ("enį", -1),
    ("ers", -1), ("erį", -1), ("erų", -1), ("esi", -1), ("iai", -1),
    ("iam", -1), ("ias", -1), ("iat", -1), ("iau", -1), ("iem", -1),
    ("ies", -1), ("imi", -1), ("ims", -1), ("ion", -1), ("ios", -1),
    ("isi", -1), ("ite", -1), ("iui", -1), ("iun", -1), ("ius", -1),
    ("iąs", -1), ("oje", -1), ("ome", -1), ("oms", -1), ("ose", -1),
    ("osi", -1), ("ote", -1), ("oti", -1), ("sim", -1), ("sit", -1),
    ("siu", -1), ("tum", -1), ("tųs", -1), ("uje", -1), ("umi", -1),
    ("ums", -1), ("uos", -1), ("usi", -1), ("yje", -1), ("yse", -1),
    ("yti", -1), ("ąsi", -1), ("ėje", -1), ("ėjo", -1), ("ėme", -1),
    ("ėms", -1), ("ėse", -1), ("ėsi", -1), ("ėte", -1), ("ėti", -1),
    ("ųsi", -1), ("ai", -1), ("am", -1), ("an", -1), ("as", -1),
    ("at", -1), ("au", -1), ("ei", -1), ("es", -1), ("ia", -1),
    ("ie", -1), ("im", -1), ("io", -1), ("is", -1), ("it", -1),
    ("iu", -1), ("ią", -1), ("ių", -1), ("ki", -1), ("oj", -1),
    ("om", -1), ("on", -1), ("os", -1), ("ot", -1), ("si", -1),
    ("ti", -1), ("ui", -1), ("un", -1), ("uo", -1), ("us", -1),
    ("ys", -1), ("ąs", -1), ("ėj", -1), ("ėm", -1), ("ėn", -1),
    ("ės", -1), ("ėt", -1), ("įs", -1), ("ūs", -1), ("a", -1),
    ("e", -1), ("i", -1), ("k", -1), ("o", -1), ("s", -1), ("u", -1),
    ("y", -1), ("ą", -1), ("ė", -1), ("ę", -1), ("į", -1), ("ų", -1),
)

_LT_A_1 = (
    ("utėait", -1), ("siant", -1), ("uliuk", -1), ("učiuk", -1),
    ("iais", -1), ("iant", -1), ("iaus", -1), ("iuoj", -1),
    ("iuos", -1), ("iuot", -1), ("ykšt", -1), ("ykšč", -1),
    ("zgan", -1), ("ain", -1), ("ais", -1), ("ant", -1), ("auj", -1),
    ("aus", -1), ("dam", -1), ("dav", -1), ("esn", -1), ("iaj", -1),
    ("ias", -1), ("iau", -1), ("iej", -1), ("ies", -1), ("ing", -1),
    ("int", -1), ("ioj", -1), ("iok", -1), ("iop", -1), ("ios", -1),
    ("iuk", -1), ("iul", -1), ("iąj", -1), ("iąs", -1), ("išk", -1),
    ("iųj", -1), ("jam", -1), ("uoj", -1), ("uos", -1), ("uot", -1),
    ("ėję", -1), ("aj", -1), ("am", -1), ("oj", -1), ("ok", -1),
    ("op", -1), ("os", -1), ("ot", -1), ("sv", -1), ("yl", -1),
    ("yt", -1), ("ąj", -1), ("ąs", -1), ("ėj", -1), ("ėl", -1),
    ("ėt", -1), ("ęs", -1), ("šv", -1), ("ųj", -1), ("ę", -1),
)

_LT_A_2 = (
    ("okatės", 8), ("aitės", 1), ("asius", 5), ("avime", 6),
    ("ojime", 7), ("okate", 8), ("uotės", 2), ("ėjime", 3),
    ("aite", 1), ("esiu", 4), ("uote", 2),
)

_LT_A_3 = (
    ("dž", 2), ("č", 1),
)

_LT_A_4 = (
    ("gd", 1),
)


_LT_CONFLICT = {1: "aitė", 2: "uotė", 3: "ėjimas", 4: "esys", 5: "asys",
                6: "avimas", 7: "ojimas", 8: "okatė"}


def _lt_p1(w: str) -> int:
    n = len(w)
    i = 1 if (w.startswith("a") and n > 6) else 0
    while i < n and w[i] not in _LT_V:
        i += 1
    if i >= n:
        return n
    i += 1
    while i < n and w[i] in _LT_V:
        i += 1
    if i >= n:
        return n
    return i + 1


def lithuanian_stem(w: str) -> str:
    """Snowball Lithuanian (snowball/ext/LithuanianStemmer.java:470-545)."""
    p1 = _lt_p1(w)
    # fix_conflicts (unbounded, once)
    for suf, act in _LT_A_2:
        if w.endswith(suf):
            w = w[: -len(suf)] + _LT_CONFLICT[act]
            break
    # step1: longest a_0 suffix lying entirely within R1, delete
    if len(w) >= p1:
        tail = w[p1:]
        for suf, act in _LT_A_0:
            if tail.endswith(suf):
                w = w[: -len(suf)]
                break
    # fix_chdz
    for suf, act in _LT_A_3:
        if w.endswith(suf):
            w = w[: -len(suf)] + ("t" if act == 1 else "d")
            break
    # repeat(step2): R1-bounded deletes, cursor moves left
    end = len(w)
    while end >= p1:
        tail = w[p1:end]
        hit = None
        for suf, act in _LT_A_1:
            if tail.endswith(suf):
                hit = suf
                break
        if hit is None:
            break
        end -= len(hit)
        w = w[:end] + w[end + len(hit):]
    # fix_chdz again
    for suf, act in _LT_A_3:
        if w.endswith(suf):
            w = w[: -len(suf)] + ("t" if act == 1 else "d")
            break
    # fix_gd
    if w.endswith("gd"):
        w = w[:-2] + "g"
    return w


# ---------------------------------------------------------------------------
# Estonian (snowball/ext/EstonianStemmer.java, Snowball 3.0 'estonian'):
# whole-word verb exceptions short-circuit; otherwise emphasis (gi/ki) ->
# verb endings -> (if not verb) substantive cascade -> undouble kk/pp/tt.
# All suffix rules match bounded to R1. Among tables machine-extracted.
# ---------------------------------------------------------------------------

_ET_V1 = frozenset("aeiouäõöü")
_ET_RV = frozenset("aeiou")
_ET_KI = frozenset("bdfghkpstzšž")
_ET_GI = frozenset("aceijlmnoqruvwxäõöü")

_ET_A_0 = (
    ("gi", 1), ("ki", 2),
)

_ET_A_1 = (
    ("nuksime", 1), ("nuksite", 1), ("nuksid", 1), ("nuksin", 1),
    ("dakse", 1), ("ksime", 1), ("ksite", 1), ("takse", 1),
    ("akse", 2), ("daks", 1), ("ksid", 1), ("ksin", 1), ("mata", 1),
    ("sime", 1), ("site", 1), ("taks", 1), ("sin", 1), ("da", 3),
    ("me", 3), ("b", 3), ("n", 3),
)

_ET_A_10 = (
    ("joodakse", 1), ("jäädakse", 12), ("jääksime", 12),
    ("jääksite", 12), ("keedakse", 4), ("keeksime", 4),
    ("keeksite", 4), ("käiksime", 8), ("käiksite", 8),
    ("laoksime", 16), ("laoksite", 16), ("loeksime", 14),
    ("loeksite", 14), ("looksime", 7), ("looksite", 7),
    ("löödakse", 5), ("lööksime", 5), ("lööksite", 5),
    ("müüksime", 13), ("müüksite", 13), ("näeksime", 18),
    ("näeksite", 18), ("nägemata", 18), ("põeksime", 15),
    ("põeksite", 15), ("saadakse", 2), ("saaksime", 2),
    ("saaksite", 2), ("söödakse", 9), ("sööksime", 9), ("sööksite", 9),
    ("teeksime", 17), ("teeksite", 17), ("tegemata", 17),
    ("tooksime", 10), ("tooksite", 10), ("viiksime", 3),
    ("viiksite", 3), ("võidakse", 11), ("võiksime", 11),
    ("võiksite", 11), ("joomata", 1), ("juuakse", 1), ("jääksid", 12),
    ("jääksin", 12), ("jäämata", 12), ("keeksid", 4), ("keeksin", 4),
    ("keemata", 4), ("käiakse", 8), ("käiksid", 8), ("käiksin", 8),
    ("käimata", 8), ("laoksid", 16), ("laoksin", 16), ("loeksid", 14),
    ("loeksin", 14), ("looksid", 7), ("looksin", 7), ("loomata", 7),
    ("luuakse", 7), ("lööksid", 5), ("lööksin", 5), ("löömata", 5),
    ("lüüakse", 5), ("müüakse", 13), ("müüksid", 13), ("müüksin", 13),
    ("müümata", 13), ("näeksid", 18), ("näeksin", 18), ("nähakse", 18),
    ("põeksid", 15), ("põeksin", 15), ("saaksid", 2), ("saaksin", 2),
    ("saamata", 2), ("sööksid", 9), ("sööksin", 9), ("söömata", 9),
    ("süüakse", 9), ("teeksid", 17), ("teeksin", 17), ("tehakse", 17),
    ("tooksid", 10), ("tooksin", 10), ("toomata", 10), ("tuuakse", 10),
    ("viiakse", 3), ("viiksid", 3), ("viiksin", 3), ("viimata", 3),
    ("viisime", 3), ("viisite", 3), ("võiksid", 11), ("võiksin", 11),
    ("võimata", 11), ("joovad", 1), ("jäävad", 12), ("keevad", 4),
    ("käivad", 8), ("laovad", 16), ("loevad", 14), ("loovad", 7),
    ("löövad", 5), ("müüvad", 13), ("näevad", 18), ("nägema", 18),
    ("põevad", 15), ("saavad", 2), ("söövad", 9), ("teevad", 17),
    ("tegema", 17), ("toovad", 10), ("viisin", 3), ("viivad", 3),
    ("võivad", 11), ("jooma", 1), ("joome", 1), ("joote", 1),
    ("jäime", 12), ("jäite", 12), ("jääda", 12), ("jäädi", 12),
    ("jääks", 12), ("jääma", 12), ("jääme", 12), ("jääte", 12),
    ("jõime", 1), ("jõite", 1), ("keeks", 4), ("keema", 4),
    ("keeme", 4), ("keeta", 4), ("keete", 4), ("käidi", 8),
    ("käiks", 8), ("käima", 8), ("käime", 8), ("käite", 8),
    ("laoks", 16), ("laome", 16), ("laote", 16), ("loeks", 14),
    ("loeme", 14), ("loete", 14), ("loodi", 7), ("looks", 7),
    ("looma", 7), ("loome", 7), ("loote", 7), ("lõime", 6),
    ("lõite", 6), ("löödi", 5), ("lööks", 5), ("lööma", 5),
    ("lööme", 5), ("lööte", 5), ("müüdi", 13), ("müüks", 13),
    ("müüma", 13), ("müüme", 13), ("müüte", 13), ("näeks", 18),
    ("näeme", 18), ("näete", 18), ("nähti", 18), ("põeks", 15),
    ("põeme", 15), ("põete", 15), ("saada", 2), ("saadi", 2),
    ("saaks", 2), ("saama", 2), ("saame", 2), ("saate", 2),
    ("saime", 2), ("saite", 2), ("sõime", 9), ("sõite", 9),
    ("söödi", 9), ("sööks", 9), ("sööma", 9), ("sööme", 9),
    ("sööte", 9), ("teeks", 17), ("teeme", 17), ("teete", 17),
    ("tehti", 17), ("toodi", 10), ("tooks", 10), ("tooma", 10),
    ("toome", 10), ("toote", 10), ("tõime", 10), ("tõite", 10),
    ("viidi", 3), ("viiks", 3), ("viima", 3), ("viime", 3),
    ("viite", 3), ("võida", 11), ("võidi", 11), ("võiks", 11),
    ("võima", 11), ("võime", 11), ("võite", 11), ("joob", 1),
    ("jood", 1), ("joon", 1), ("juua", 1), ("jäid", 12), ("jäin", 12),
    ("jääb", 12), ("jääd", 12), ("jään", 12), ("jõid", 1), ("jõin", 1),
    ("keeb", 4), ("keed", 4), ("keen", 4), ("kees", 4), ("käia", 8),
    ("käib", 8), ("käid", 8), ("käin", 8), ("käis", 8), ("laob", 16),
    ("laod", 16), ("laon", 16), ("loeb", 14), ("loed", 14),
    ("loen", 14), ("loob", 7), ("lood", 7), ("loon", 7), ("luua", 7),
    ("lõid", 6), ("lõin", 6), ("lööb", 5), ("lööd", 5), ("löön", 5),
    ("lüüa", 5), ("müüa", 13), ("müüb", 13), ("müüd", 13),
    ("müün", 13), ("müüs", 13), ("näeb", 18), ("näed", 18),
    ("näen", 18), ("näha", 18), ("põeb", 15), ("põed", 15),
    ("põen", 15), ("saab", 2), ("saad", 2), ("saan", 2), ("said", 2),
    ("sain", 2), ("sõid", 9), ("sõin", 9), ("sööb", 9), ("sööd", 9),
    ("söön", 9), ("süüa", 9), ("teeb", 17), ("teed", 17), ("teen", 17),
    ("teha", 17), ("toob", 10), ("tood", 10), ("toon", 10),
    ("tuua", 10), ("tõid", 10), ("tõin", 10), ("viia", 3), ("viib", 3),
    ("viid", 3), ("viin", 3), ("võib", 11), ("võid", 11), ("võin", 11),
    ("võis", 11), ("jäi", 12), ("jõi", 1), ("lõi", 6), ("sai", 2),
    ("sõi", 9), ("tõi", 10),
)

_ET_A_2 = (
    ("aa", -1), ("ee", -1), ("ii", -1), ("oo", -1), ("uu", -1),
    ("ää", -1), ("õõ", -1), ("öö", -1), ("üü", -1),
)

_ET_A_3 = (
    ("i", 1),
)

_ET_A_4 = (
    ("lasse", 1), ("lisse", 3), ("misse", 2), ("lane", 1), ("lasi", 1),
    ("last", 1), ("line", 3), ("lisi", 3), ("list", 3), ("mine", 2),
    ("misi", 2), ("mist", 2),
)

_ET_A_5 = (
    ("sse", 1), ("ga", 1), ("ks", 1), ("le", 1), ("lt", 1), ("st", 1),
    ("ta", 1), ("l", 1), ("s", 1), ("t", 1),
)

_ET_A_6 = (
    ("ikkude", 1), ("ikke", 1), ("ike", 1), ("sid", 2), ("de", 4),
    ("te", 3), ("d", 4),
)

_ET_A_7 = (
    ("kk", -1), ("pp", -1), ("tt", -1),
)

_ET_A_8 = (
    ("du", -1), ("nu", -1), ("tu", -1), ("va", -1),
)

_ET_A_9 = (
    ("mai", 1), ("ma", 2), ("m", 1),
)

_ET_VERB_EXC_REPL = {1: 'joo', 2: 'saa', 3: 'viima', 4: 'keesi', 5: 'löö', 6: 'löi', 7: 'loo', 8: 'käisi', 9: 'söö', 10: 'too', 11: 'võisi', 12: 'jääma', 13: 'müüsi', 14: 'luge', 15: 'põde', 16: 'ladu', 17: 'tegi', 18: 'nägi'}


def _et_p1(w: str) -> int:
    n = len(w)
    i = 0
    while i < n and w[i] not in _ET_V1:
        i += 1
    if i >= n:
        return n
    while i < n and w[i] in _ET_V1:
        i += 1
    if i >= n:
        return n
    return i + 1


def _et_match(w: str, table, p1: int):
    """Longest suffix of w lying within [p1, len(w)]: (suffix, act) or
    None."""
    if len(w) < p1:
        return None
    tail = w[p1:]
    for suf, act in table:
        if tail.endswith(suf):
            return suf, act
    return None


def _et_longv(w: str) -> bool:
    return any(w.endswith(s) for s, _ in _ET_A_2)


def estonian_stem(w: str) -> str:
    """Snowball Estonian (snowball/ext/EstonianStemmer.java:918-975)."""
    for word, act in _ET_A_10:
        if w == word:
            return _ET_VERB_EXC_REPL[act]
    p1 = _et_p1(w)

    # emphasis: gi/ki with >=4 chars before the suffix
    m = _et_match(w, _ET_A_0, p1)
    if m:
        suf, act = m
        start = len(w) - len(suf)
        if start - 4 >= 0:
            if act == 1:
                if (w[start - 1] in _ET_GI
                        and not _et_longv(w[:start])):
                    w = w[:start]
            else:
                if w[start - 1] in _ET_KI:
                    w = w[:start]

    # verb endings
    is_verb = False
    m = _et_match(w, _ET_A_1, p1)
    if m:
        suf, act = m
        start = len(w) - len(suf)
        if act == 1:
            w = w[:start]
            is_verb = True
        elif act == 2:
            w = w[:start] + "a"
            is_verb = True
        elif act == 3:
            if start > 0 and w[start - 1] in _ET_V1:
                w = w[:start]
                is_verb = True

    if not is_verb:
        # special noun endings
        m = _et_match(w, _ET_A_4, p1)
        if m:
            suf, act = m
            w = w[: -len(suf)] + {1: "lase", 2: "mise", 3: "lise"}[act]
        # case ending: previous char in RV or long vowel before
        m = _et_match(w, _ET_A_5, p1)
        if m:
            suf, _ = m
            start = len(w) - len(suf)
            if (start > 0 and w[start - 1] in _ET_RV) or _et_longv(w[:start]):
                w = w[:start]
        # plural and the three first cases
        m = _et_match(w, _ET_A_6, p1)
        if m:
            suf, act = m
            start = len(w) - len(suf)
            if act == 1:
                w = w[:start] + "iku"
            elif act == 2:
                if not _et_longv(w[:start]):
                    w = w[:start]
            elif act == 3:
                head = w[:start]
                if start - 4 >= 0 and not head.endswith("t"):
                    if head.endswith(("mis", "las", "lis")):
                        w = head + "e"
                    else:
                        w = head
                elif not head.endswith("t"):
                    w = head + "t"
            elif act == 4:
                if (start > 0 and w[start - 1] in _ET_RV) or _et_longv(
                    w[:start]
                ):
                    w = w[:start]
        # degrees
        m = _et_match(w, _ET_A_9, p1)
        if m:
            suf, act = m
            start = len(w) - len(suf)
            if act == 1:
                if start > 0 and w[start - 1] in _ET_RV:
                    w = w[:start]
            else:
                w = w[:start]
        # i-plural
        m = _et_match(w, _ET_A_3, p1)
        if m:
            start = len(w) - 1
            if start > 0 and w[start - 1] in _ET_RV:
                w = w[:start]
        # nu/du/tu/va
        m = _et_match(w, _ET_A_8, p1)
        if m:
            w = w[: -len(m[0])]

    # remove double kpt: final vowel preceded by kk/pp/tt drops one
    if (len(w) >= 3 and w[-1] in _ET_V1
            and w[-3:-1] in ("kk", "pp", "tt")):
        w = w[:-2] + w[-1]
    return w


# ---------------------------------------------------------------------------
# Nepali (snowball/ext/NepaliStemmer.java, Snowball 2.0 'nepali'):
# category-1 suffix strip (conditional on the preceding vowel sign), then
# a loop alternating category-2 (guarded deletes) and category-3 strips.
# Among tables machine-extracted.
# ---------------------------------------------------------------------------

_NE_A_0 = (
    ("द्वारा", 1), ("मार्फत", 1), ("सँगै", 1), ("पछि", 1), ("लाइ", 1),
    ("लाई", 1), ("सँग", 1), ("संग", 1), ("का", 2), ("कि", 2),
    ("की", 2), ("कै", 2), ("को", 2), ("मा", 1), ("मै", 1), ("रत", 1),
    ("ले", 1),
)

_NE_A_1 = (
    ("ँ", -1), ("ं", -1), ("ै", -1),
)

_NE_A_2 = (
    ("ँ", 1), ("ं", 1), ("ै", 2),
)

_NE_A_3 = (
    ("थिइस्", 1), ("नेछन्", 1), ("नेछस्", 1), ("हुनेछ", 1),
    ("हुन्छ", 1), ("इएका", 1), ("इएकी", 1), ("इएको", 1), ("इछन्", 1),
    ("इछस्", 1), ("इन्छ", 1), ("एछन्", 1), ("एछस्", 1), ("छिन्", 1),
    ("छेस्", 1), ("छ्यौ", 1), ("थिन्", 1), ("थियो", 1), ("थियौ", 1),
    ("थिस्", 1), ("थ्यो", 1), ("थ्यौ", 1), ("दियो", 1), ("देखि", 1),
    ("देखी", 1), ("नेका", 1), ("नेकै", 1), ("नेको", 1), ("नेछु", 1),
    ("नेछौ", 1), ("माथि", 1), ("लान्", 1), ("होस्", 1), ("िएका", 1),
    ("िएकी", 1), ("िएको", 1), ("िछन्", 1), ("िछस्", 1), ("िन्छ", 1),
    ("ेछन्", 1), ("ेछस्", 1), ("इछौ", 1), ("इदा", 1), ("इदै", 1),
    ("इदो", 1), ("इयो", 1), ("इस्", 1), ("एका", 1), ("एकी", 1),
    ("एकै", 1), ("एको", 1), ("एछु", 1), ("एछौ", 1), ("छन्", 1),
    ("छस्", 1), ("थिए", 1), ("नेछ", 1), ("पर्", 1), ("भयो", 1),
    ("हरु", 1), ("हरू", 1), ("िछौ", 1), ("िदा", 1), ("िदै", 1),
    ("िदो", 1), ("ियो", 1), ("िस्", 1), ("ेका", 1), ("ेकी", 1),
    ("ेकै", 1), ("ेको", 1), ("ेछु", 1), ("ेछौ", 1), ("इछ", 1),
    ("एछ", 1), ("छु", 1), ("छे", 1), ("छौ", 1), ("थी", 1), ("थे", 1),
    ("दा", 1), ("दी", 1), ("दै", 1), ("दो", 1), ("नु", 1), ("ने", 1),
    ("यो", 1), ("यौ", 1), ("िछ", 1), ("ेछ", 1), ("छ", 1),
)


def nepali_stem(w: str) -> str:
    """Snowball Nepali (snowball/ext/NepaliStemmer.java:250-292)."""
    m = _match_b(w, _NE_A_0)
    if m:
        suf, act = m
        head = w[: -len(suf)]
        if act == 1:
            w = head
        elif act == 2 and not head.endswith(("ए", "े")):
            w = head
    while True:
        changed = False
        m = _match_b(w, _NE_A_1)
        if m:  # check_category_2 guard: a_1 matches at the end
            m2 = _match_b(w, _NE_A_2)
            if m2:
                suf, act = m2
                head = w[: -len(suf)]
                if act == 1 and head.endswith(("यौ", "छौ", "नौ", "थे")):
                    w = head
                    changed = True
                elif act == 2 and head.endswith("त्र"):
                    w = head
                    changed = True
        if not changed:
            m3 = _match_b(w, _NE_A_3)
            if m3:
                w = w[: -len(m3[0])]
                changed = True
        if not changed:
            break
    return w


# ---------------------------------------------------------------------------
# German snowball (snowball/ext/GermanStemmer.java, Snowball 2.0 'german')
# — selectable alternative to the default GermanLightStemmer chain.
# ---------------------------------------------------------------------------

_DE_A_0 = (
    ("U", 2), ("Y", 1), ("ä", 3), ("ö", 4), ("ü", 2),
)

_DE_A_1 = (
    ("ern", 1), ("em", 1), ("en", 2), ("er", 1), ("es", 2), ("e", 2),
    ("s", 3),
)

_DE_A_2 = (
    ("est", 1), ("en", 1), ("er", 1), ("st", 2),
)

_DE_A_3 = (
    ("lich", 1), ("ig", 1),
)

_DE_A_4 = (
    ("heit", 3), ("isch", 2), ("keit", 4), ("lich", 3), ("end", 1),
    ("ung", 1), ("ig", 2), ("ik", 2),
)


_DE_SB_V = frozenset("aeiouyäöü")
_DE_S_ENDING = frozenset("bdfghklmnrt")
_DE_ST_ENDING = frozenset("bdfghklmnt")
_DE_POSTLUDE = str.maketrans({"U": "u", "Y": "y", "ä": "a", "ö": "o",
                              "ü": "u"})


def _de_prelude(w: str) -> str:
    w = w.replace("ß", "ss")
    s = list(w)
    for i in range(1, len(s) - 1):
        if s[i] == "u" and s[i - 1] in _DE_SB_V and s[i + 1] in _DE_SB_V:
            s[i] = "U"
        elif s[i] == "y" and s[i - 1] in _DE_SB_V and s[i + 1] in _DE_SB_V:
            s[i] = "Y"
    return "".join(s)


def _de_regions(w: str):
    p1, p2 = _std_regions(w, _DE_SB_V)
    if p1 < 3:
        p1 = 3
    return p1, p2


def german_snowball_stem(w: str) -> str:
    """Snowball German (snowball/ext/GermanStemmer.java:432-455): prelude
    (ss + intervocalic u/y protection), three R1/R2-gated suffix steps
    with the niss / e-guard / er-en / lich-ig bonus deletions, postlude
    unfolds umlauts."""
    w = _de_prelude(w)
    p1, p2 = _de_regions(w)
    return _de_suffix_steps(w, p1, p2)


def _de_suffix_steps(w: str, p1: int, p2: int) -> str:
    def in_r1(start):
        return start >= p1

    def in_r2(start):
        return start >= p2

    # step A (a_1)
    m = _match_b(w, _DE_A_1)
    if m and in_r1(len(w) - len(m[0])):
        suf, act = m
        if act == 1:
            w = w[: -len(suf)]
        elif act == 2:
            w = w[: -len(suf)]
            if w.endswith("niss"):
                w = w[:-1]
        elif act == 3:
            start = len(w) - 1
            if start > 0 and w[start - 1] in _DE_S_ENDING:
                w = w[:start]
    # step B (a_2)
    m = _match_b(w, _DE_A_2)
    if m and in_r1(len(w) - len(m[0])):
        suf, act = m
        if act == 1:
            w = w[: -len(suf)]
        elif act == 2:
            start = len(w) - 2
            # in_grouping_b consumes the st-ending char BEFORE the 3-char
            # room check (GermanStemmer.java r_standard_suffix case 2)
            if (start > 0 and w[start - 1] in _DE_ST_ENDING
                    and start - 1 - 3 >= 0):
                w = w[:start]
    # step C (a_4)
    m = _match_b(w, _DE_A_4)
    if m and in_r2(len(w) - len(m[0])):
        suf, act = m
        if act == 1:  # end/ung
            w = w[: -len(suf)]
            if (w.endswith("ig") and not w.endswith("eig")
                    and in_r2(len(w) - 2)):
                w = w[:-2]
        elif act == 2:  # ig/ik/isch: not preceded by e
            if not w[: -len(suf)].endswith("e"):
                w = w[: -len(suf)]
        elif act == 3:  # lich/heit
            w = w[: -len(suf)]
            if w.endswith(("er", "en")) and in_r1(len(w) - 2):
                w = w[:-2]
        elif act == 4:  # keit
            w = w[: -len(suf)]
            m3 = _match_b(w, _DE_A_3)
            if m3 and in_r2(len(w) - len(m3[0])):
                w = w[: -len(m3[0])]
    return w.translate(_DE_POSTLUDE)


def _de2_prelude(w: str) -> str:
    """German2 prelude (snowball/ext/German2Stemmer.java r_prelude):
    intervocalic u/y marking FIRST, then ss/ae/oe/ue folding with the
    'qu' protection."""
    s = list(w)
    for i in range(1, len(s) - 1):
        if s[i] == "u" and s[i - 1] in _DE_SB_V and s[i + 1] in _DE_SB_V:
            s[i] = "U"
        elif s[i] == "y" and s[i - 1] in _DE_SB_V and s[i + 1] in _DE_SB_V:
            s[i] = "Y"
    out: List[str] = []
    i = 0
    n = len(s)
    while i < n:
        two = s[i] + (s[i + 1] if i + 1 < n else "")
        if s[i] == "ß":
            out.append("ss")
            i += 1
        elif two == "ae":
            out.append("ä")
            i += 2
        elif two == "oe":
            out.append("ö")
            i += 2
        elif two == "ue":
            out.append("ü")
            i += 2
        elif two == "qu":
            out.append("qu")
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def german2_stem(w: str) -> str:
    """Snowball German2 (snowball/ext/German2Stemmer.java): German with
    the ae/oe/ue folding prelude; suffix steps identical."""
    w = _de2_prelude(w)
    p1, p2 = _de_regions(w)
    return _de_suffix_steps(w, p1, p2)




# ---------------------------------------------------------------------------
# English snowball / Porter2 (snowball/ext/EnglishStemmer.java, Snowball
# 2.0 'english') — selectable alternative to the classic Porter stemmer in
# stem.py. Among tables machine-extracted.
# ---------------------------------------------------------------------------

_EN_A_0 = (
    ("commun", -1), ("arsen", -1), ("gener", -1),
)

_EN_A_1 = (
    ("'s'", 1), ("'s", 1), ("'", 1),
)

_EN_A_10 = (
    ("cosmos", -1), ("gently", 7), ("singly", 11), ("andes", -1),
    ("atlas", -1), ("dying", 3), ("early", 9), ("lying", 4),
    ("skies", 2), ("tying", 5), ("bias", -1), ("howe", -1),
    ("idly", 6), ("news", -1), ("only", 10), ("skis", 1), ("ugly", 8),
    ("sky", -1),
)

_EN_A_2 = (
    ("sses", 1), ("ied", 2), ("ies", 2), ("ss", -1), ("us", -1),
    ("s", 3),
)

_EN_A_3 = (
    ("at", 1), ("bb", 2), ("bl", 1), ("dd", 2), ("ff", 2), ("gg", 2),
    ("iz", 1), ("mm", 2), ("nn", 2), ("pp", 2), ("rr", 2), ("tt", 2),
)

_EN_A_4 = (
    ("eedly", 1), ("ingly", 2), ("edly", 2), ("eed", 1), ("ing", 2),
    ("ed", 2),
)

_EN_A_5 = (
    ("ational", 7), ("fulness", 9), ("iveness", 11), ("ization", 6),
    ("ousness", 10), ("biliti", 12), ("lessli", 14), ("tional", 1),
    ("alism", 8), ("aliti", 8), ("ation", 7), ("entli", 5),
    ("fulli", 9), ("iviti", 11), ("ousli", 10), ("abli", 4),
    ("alli", 8), ("anci", 3), ("ator", 7), ("enci", 2), ("izer", 6),
    ("bli", 12), ("ogi", 13), ("li", 15),
)

_EN_A_6 = (
    ("ational", 2), ("tional", 1), ("alize", 3), ("ative", 6),
    ("icate", 4), ("iciti", 4), ("ical", 4), ("ness", 5), ("ful", 5),
)

_EN_A_7 = (
    ("ement", 1), ("able", 1), ("ance", 1), ("ence", 1), ("ible", 1),
    ("ment", 1), ("ant", 1), ("ate", 1), ("ent", 1), ("ion", 2),
    ("ism", 1), ("iti", 1), ("ive", 1), ("ize", 1), ("ous", 1),
    ("al", 1), ("er", 1), ("ic", 1),
)

_EN_A_8 = (
    ("e", 1), ("l", 2),
)

_EN_A_9 = (
    ("canning", -1), ("earring", -1), ("herring", -1), ("proceed", -1),
    ("succeed", -1), ("exceed", -1), ("inning", -1), ("outing", -1),
)


_EN_V = frozenset("aeiouy")
_EN_WXY = frozenset("Yaeiouwxy")
_EN_VALID_LI = frozenset("cdeghkmnrt")
_EN_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_EN_EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EN_EXC2 = frozenset(("inning", "outing", "canning", "herring", "earring",
                      "proceed", "exceed", "succeed"))
_EN_S2_MAP = {1: "tion", 2: "ence", 3: "ance", 4: "able", 5: "ent",
              6: "ize", 7: "ate", 8: "al", 9: "ful", 10: "ous",
              11: "ive", 12: "ble", 14: "less"}
_EN_S3_MAP = {1: "tion", 2: "ate", 3: "al", 4: "ic"}


def _en_shortv(w: str, end: int) -> bool:
    """r_shortv at cursor=end: ...CVC' with C' not in WXY, or ^CV."""
    if end >= 3 and (w[end - 1] not in _EN_WXY and w[end - 2] in _EN_V
                     and w[end - 3] not in _EN_V):
        return True
    return end == 2 and w[0] in _EN_V and w[1] not in _EN_V


def english_snowball_stem(w: str) -> str:
    """Snowball English / Porter2 (snowball/ext/EnglishStemmer.java:
    855-931)."""
    if w in _EN_EXC1:
        return _EN_EXC1[w]
    if len(w) < 3:
        return w
    # prelude
    y_found = False
    if w.startswith("'"):
        w = w[1:]
    s = list(w)
    if s and s[0] == "y":
        s[0] = "Y"
        y_found = True
    for i in range(1, len(s)):
        if s[i] == "y" and s[i - 1] in _EN_V:
            s[i] = "Y"
            y_found = True
    w = "".join(s)
    # mark regions (gener/commun/arsen prefix exception)
    p1 = p2 = len(w)
    for pre in ("commun", "gener", "arsen"):
        if w.startswith(pre):
            p1 = len(pre)
            break
    else:
        i, n = 0, len(w)
        while i < n and w[i] not in _EN_V:
            i += 1
        if i < n:
            i += 1
            while i < n and w[i] in _EN_V:
                i += 1
            if i < n:
                p1 = i + 1
    # p2 continues from p1
    i, n = p1, len(w)
    while i < n and w[i] not in _EN_V:
        i += 1
    if i < n:
        i += 1
        while i < n and w[i] in _EN_V:
            i += 1
        if i < n:
            p2 = i + 1

    # Step 1a
    m = _match_b(w, _EN_A_1)
    if m:
        w = w[: -len(m[0])]
    m = _match_b(w, _EN_A_2)
    if m:
        suf, act = m
        if act == 1:
            w = w[:-4] + "ss"
        elif act == 2:
            head = w[: -len(suf)]
            w = head + ("i" if len(head) > 1 else "ie")
        elif act == 3:
            if any(c in _EN_V for c in w[: -2]):
                w = w[:-1]
        # ss/us (act -1): no change, but the match consumes the step

    if w in _EN_EXC2:
        return w

    # Step 1b
    m = _match_b(w, _EN_A_4)
    if m:
        suf, act = m
        start = len(w) - len(suf)
        if act == 1:
            if start >= p1:
                w = w[:start] + "ee"
        else:
            if any(c in _EN_V for c in w[:start]):
                w = w[:start]
                m3 = _match_b(w, _EN_A_3)
                if m3 and m3[1] == 1:          # at/bl/iz
                    w = w + "e"
                elif w[-2:] in _EN_DOUBLES:    # undouble
                    w = w[:-1]
                elif len(w) == p1 and _en_shortv(w, len(w)):
                    w = w + "e"
    # Step 1c
    if (len(w) > 2 and w[-1] in "yY" and w[-2] not in _EN_V):
        w = w[:-1] + "i"
    # Step 2
    m = _match_b(w, _EN_A_5)
    if m and len(w) - len(m[0]) >= p1:
        suf, act = m
        head = w[: -len(suf)]
        if act in _EN_S2_MAP:
            w = head + _EN_S2_MAP[act]
        elif act == 13:  # ogi -> og if preceded by l
            if head.endswith("l"):
                w = head + "og"
        elif act == 15:  # li after valid_LI
            if head and head[-1] in _EN_VALID_LI:
                w = head
    # Step 3
    m = _match_b(w, _EN_A_6)
    if m and len(w) - len(m[0]) >= p1:
        suf, act = m
        head = w[: -len(suf)]
        if act in _EN_S3_MAP:
            w = head + _EN_S3_MAP[act]
        elif act == 5:   # ness/ful
            w = head
        elif act == 6:   # ative: R2
            if len(head) >= p2:
                w = head
    # Step 4
    m = _match_b(w, _EN_A_7)
    if m and len(w) - len(m[0]) >= p2:
        suf, act = m
        head = w[: -len(suf)]
        if act == 1:
            w = head
        elif act == 2:   # ion preceded by s/t
            if head.endswith(("s", "t")):
                w = head
    # Step 5
    m = _match_b(w, _EN_A_8)
    if m:
        suf, act = m
        start = len(w) - 1
        if act == 1:     # e
            if start >= p2 or (start >= p1
                               and not _en_shortv(w, start)):
                w = w[:start]
        else:            # l: R2 and preceded by l
            if start >= p2 and w[start - 1] == "l":
                w = w[:start]
    # postlude
    if y_found:
        w = w.replace("Y", "y")
    return w


# ---------------------------------------------------------------------------
# Spanish snowball (snowball/ext/SpanishStemmer.java, Snowball 2.0
# 'spanish') — selectable alternative to the default SpanishLightStemmer.
# ---------------------------------------------------------------------------

_ES_A_0 = (
    ("á", 1), ("é", 2), ("í", 3), ("ó", 4), ("ú", 5),
)

_ES_A_1 = (
    ("selas", -1), ("selos", -1), ("sela", -1), ("selo", -1),
    ("las", -1), ("les", -1), ("los", -1), ("nos", -1), ("la", -1),
    ("le", -1), ("lo", -1), ("me", -1), ("se", -1),
)

_ES_A_2 = (
    ("iendo", 6), ("iéndo", 1), ("yendo", 7), ("ando", 6), ("ándo", 2),
    ("ar", 6), ("er", 6), ("ir", 6), ("ár", 3), ("ér", 4), ("ír", 5),
)

_ES_A_3 = (
    ("ad", -1), ("ic", -1), ("iv", 1), ("os", -1),
)

_ES_A_4 = (
    ("able", 1), ("ante", 1), ("ible", 1),
)

_ES_A_5 = (
    ("abil", 1), ("ic", 1), ("iv", 1),
)

_ES_A_6 = (
    ("amientos", 1), ("imientos", 1), ("aciones", 2), ("amiento", 1),
    ("imiento", 1), ("uciones", 4), ("adoras", 2), ("adores", 2),
    ("amente", 6), ("ancias", 2), ("encias", 5), ("idades", 8),
    ("logías", 3), ("ables", 1), ("ación", 2), ("adora", 2),
    ("ancia", 2), ("antes", 2), ("anzas", 1), ("encia", 5),
    ("ibles", 1), ("ismos", 1), ("istas", 1), ("logía", 3),
    ("mente", 7), ("ución", 4), ("able", 1), ("ador", 2), ("ante", 2),
    ("anza", 1), ("ible", 1), ("icas", 1), ("icos", 1), ("idad", 8),
    ("ismo", 1), ("ista", 1), ("ivas", 9), ("ivos", 9), ("osas", 1),
    ("osos", 1), ("ica", 1), ("ico", 1), ("iva", 9), ("ivo", 9),
    ("osa", 1), ("oso", 1),
)

_ES_A_7 = (
    ("yamos", 1), ("yendo", 1), ("yeron", 1), ("yais", 1), ("yan", 1),
    ("yas", 1), ("yen", 1), ("yes", 1), ("ya", 1), ("ye", 1),
    ("yo", 1), ("yó", 1),
)

_ES_A_8 = (
    ("aríamos", 2), ("eríamos", 2), ("iríamos", 2), ("iéramos", 2),
    ("iésemos", 2), ("aremos", 2), ("aríais", 2), ("asteis", 2),
    ("eremos", 2), ("eríais", 2), ("ierais", 2), ("ieseis", 2),
    ("iremos", 2), ("iríais", 2), ("isteis", 2), ("ábamos", 2),
    ("áramos", 2), ("ásemos", 2), ("abais", 2), ("arais", 2),
    ("aréis", 2), ("arían", 2), ("arías", 2), ("aseis", 2),
    ("eréis", 2), ("erían", 2), ("erías", 2), ("iendo", 2),
    ("ieran", 2), ("ieras", 2), ("ieron", 2), ("iesen", 2),
    ("ieses", 2), ("iréis", 2), ("irían", 2), ("irías", 2),
    ("íamos", 2), ("aban", 2), ("abas", 2), ("adas", 2), ("ados", 2),
    ("amos", 2), ("ando", 2), ("aran", 2), ("aras", 2), ("aron", 2),
    ("arán", 2), ("arás", 2), ("aría", 2), ("asen", 2), ("ases", 2),
    ("aste", 2), ("emos", 1), ("erán", 2), ("erás", 2), ("ería", 2),
    ("idas", 2), ("idos", 2), ("iera", 2), ("iese", 2), ("imos", 2),
    ("irán", 2), ("irás", 2), ("iría", 2), ("iste", 2), ("íais", 2),
    ("aba", 2), ("ada", 2), ("ado", 2), ("ara", 2), ("ará", 2),
    ("aré", 2), ("ase", 2), ("erá", 2), ("eré", 2), ("ida", 2),
    ("ido", 2), ("irá", 2), ("iré", 2), ("áis", 2), ("éis", 1),
    ("ían", 2), ("ías", 2), ("ad", 2), ("an", 2), ("ar", 2), ("as", 2),
    ("ed", 2), ("en", 1), ("er", 2), ("es", 1), ("id", 2), ("ir", 2),
    ("ió", 2), ("ía", 2), ("ís", 2),
)

_ES_A_9 = (
    ("os", 1), ("a", 1), ("e", 2), ("o", 1), ("á", 1), ("é", 2),
    ("í", 1), ("ó", 1),
)


_ES_V = frozenset("aeiouáéíóúü")
_ES_POSTLUDE = str.maketrans({"á": "a", "é": "e", "í": "i", "ó": "o",
                              "ú": "u"})
_ES_A2_REPL = {1: "iendo", 2: "ando", 3: "ar", 4: "er", 5: "ir"}


def spanish_snowball_stem(w: str) -> str:
    """Snowball Spanish (snowball/ext/SpanishStemmer.java:832-871)."""
    pV = _rv_romance(w, _ES_V)
    p1, p2 = _std_regions(w, _ES_V)

    def r1(start):
        return start >= p1

    def r2(start):
        return start >= p2

    def rv(start):
        return start >= pV

    # attached pronoun
    m = _match_b(w, _ES_A_1)
    if m:
        pron = m[0]
        head = w[: -len(pron)]
        m2 = _match_b(head, _ES_A_2)
        if m2:
            mark, act = m2
            start = len(head) - len(mark)
            if rv(start):
                if act in _ES_A2_REPL:
                    w = head[:start] + _ES_A2_REPL[act]
                elif act == 6:
                    w = head
                elif act == 7 and head[:start].endswith("u"):
                    w = head

    # standard suffix | y-verb | verb
    done = False
    m = _match_b(w, _ES_A_6)
    if m:
        suf, act = m
        start = len(w) - len(suf)
        head = w[:start]
        if act == 1 and r2(start):
            w = head
            done = True
        elif act == 2 and r2(start):
            w = head
            done = True
            if w.endswith("ic") and r2(len(w) - 2):
                w = w[:-2]
        elif act == 3 and r2(start):
            w = head + "log"
            done = True
        elif act == 4 and r2(start):
            w = head + "u"
            done = True
        elif act == 5 and r2(start):
            w = head + "ente"
            done = True
        elif act == 6 and r1(start):
            w = head
            done = True
            m3 = _match_b(w, _ES_A_3)
            if m3 and r2(len(w) - len(m3[0])):
                iv = m3[1] == 1
                w = w[: -len(m3[0])]
                if iv and w.endswith("at") and r2(len(w) - 2):
                    w = w[:-2]
        elif act == 7 and r2(start):
            w = head
            done = True
            m3 = _match_b(w, _ES_A_4)
            if m3 and r2(len(w) - len(m3[0])):
                w = w[: -len(m3[0])]
        elif act == 8 and r2(start):
            w = head
            done = True
            m3 = _match_b(w, _ES_A_5)
            if m3 and r2(len(w) - len(m3[0])):
                w = w[: -len(m3[0])]
        elif act == 9 and r2(start):
            w = head
            done = True
            if w.endswith("at") and r2(len(w) - 2):
                w = w[:-2]
    if not done:
        # y-verb: bounded to RV, requires preceding u
        tail = w[pV:]
        m = _match_b(tail, _ES_A_7)
        if m and w[: len(w) - len(m[0])].endswith("u"):
            w = w[: -len(m[0])]
            done = True
    if not done:
        tail = w[pV:]
        m = _match_b(tail, _ES_A_8)
        if m:
            suf, act = m
            start = len(w) - len(suf)
            if act == 1 and w[:start].endswith("gu"):
                w = w[: start - 1]
            else:
                w = w[:start]
    # residual
    m = _match_b(w, _ES_A_9)
    if m:
        suf, act = m
        start = len(w) - len(suf)
        if act == 1 and rv(start):
            w = w[:start]
        elif act == 2 and rv(start):
            w = w[:start]
            if (w.endswith("gu") and rv(len(w) - 1)):
                w = w[:-1]
    return w.translate(_ES_POSTLUDE)


# ---------------------------------------------------------------------------
# Italian snowball (snowball/ext/ItalianStemmer.java, Snowball 2.0
# 'italian') — selectable alternative to the default ItalianLightStemmer.
# ---------------------------------------------------------------------------

_IT_A_0 = (
    ("qu", 6), ("á", 1), ("é", 2), ("í", 3), ("ó", 4), ("ú", 5),
)

_IT_A_1 = (
    ("I", 1), ("U", 2),
)

_IT_A_2 = (
    ("gliela", -1), ("gliele", -1), ("glieli", -1), ("glielo", -1),
    ("gliene", -1), ("cela", -1), ("cele", -1), ("celi", -1),
    ("celo", -1), ("cene", -1), ("mela", -1), ("mele", -1),
    ("meli", -1), ("melo", -1), ("mene", -1), ("sene", -1),
    ("tela", -1), ("tele", -1), ("teli", -1), ("telo", -1),
    ("tene", -1), ("vela", -1), ("vele", -1), ("veli", -1),
    ("velo", -1), ("vene", -1), ("gli", -1), ("ci", -1), ("la", -1),
    ("le", -1), ("li", -1), ("lo", -1), ("mi", -1), ("ne", -1),
    ("si", -1), ("ti", -1), ("vi", -1),
)

_IT_A_3 = (
    ("ando", 1), ("endo", 1), ("ar", 2), ("er", 2), ("ir", 2),
)

_IT_A_4 = (
    ("abil", -1), ("ic", -1), ("iv", 1), ("os", -1),
)

_IT_A_5 = (
    ("abil", 1), ("ic", 1), ("iv", 1),
)

_IT_A_6 = (
    ("amente", 7), ("amenti", 6), ("amento", 6), ("atrice", 1),
    ("atrici", 1), ("azione", 2), ("azioni", 2), ("imenti", 6),
    ("imento", 6), ("usione", 4), ("usioni", 4), ("uzione", 4),
    ("uzioni", 4), ("abile", 1), ("abili", 1), ("atore", 2),
    ("atori", 2), ("ibile", 1), ("ibili", 1), ("logia", 3),
    ("logie", 3), ("mente", 1), ("ante", 1), ("anti", 1), ("anza", 1),
    ("anze", 1), ("enza", 5), ("enze", 5), ("iche", 1), ("ichi", 1),
    ("ismi", 1), ("ismo", 1), ("ista", 1), ("iste", 1), ("isti", 1),
    ("istà", 1), ("istè", 1), ("istì", 1), ("ica", 1), ("ice", 1),
    ("ici", 1), ("ico", 1), ("ità", 8), ("iva", 9), ("ive", 9),
    ("ivi", 9), ("ivo", 9), ("osa", 1), ("ose", 1), ("osi", 1),
    ("oso", 1),
)

_IT_A_7 = (
    ("erebbero", 1), ("irebbero", 1), ("assero", 1), ("assimo", 1),
    ("eranno", 1), ("erebbe", 1), ("eremmo", 1), ("ereste", 1),
    ("eresti", 1), ("essero", 1), ("iranno", 1), ("irebbe", 1),
    ("iremmo", 1), ("ireste", 1), ("iresti", 1), ("iscano", 1),
    ("iscono", 1), ("issero", 1), ("arono", 1), ("avamo", 1),
    ("avano", 1), ("avate", 1), ("eremo", 1), ("erete", 1),
    ("erono", 1), ("evamo", 1), ("evano", 1), ("evate", 1),
    ("iremo", 1), ("irete", 1), ("irono", 1), ("ivamo", 1),
    ("ivano", 1), ("ivate", 1), ("Yamo", 1), ("ammo", 1), ("ando", 1),
    ("asse", 1), ("assi", 1), ("emmo", 1), ("enda", 1), ("ende", 1),
    ("endi", 1), ("endo", 1), ("erai", 1), ("erei", 1), ("iamo", 1),
    ("immo", 1), ("irai", 1), ("irei", 1), ("isca", 1), ("isce", 1),
    ("isci", 1), ("isco", 1), ("ano", 1), ("are", 1), ("ata", 1),
    ("ate", 1), ("ati", 1), ("ato", 1), ("ava", 1), ("avi", 1),
    ("avo", 1), ("ere", 1), ("erà", 1), ("erò", 1), ("ete", 1),
    ("eva", 1), ("evi", 1), ("evo", 1), ("ire", 1), ("irà", 1),
    ("irò", 1), ("ita", 1), ("ite", 1), ("iti", 1), ("ito", 1),
    ("iva", 1), ("ivi", 1), ("ivo", 1), ("ono", 1), ("uta", 1),
    ("ute", 1), ("uti", 1), ("uto", 1), ("ar", 1), ("ir", 1),
)


_IT_V = frozenset("aeiouàèìòù")
_IT_AEIO = frozenset("aeioàèìò")
_IT_ACUTE = str.maketrans({"á": "à", "é": "è", "í": "ì", "ó": "ò",
                           "ú": "ù"})
_IT_POSTLUDE = str.maketrans({"I": "i", "U": "u"})


def _it_prelude(w: str) -> str:
    w = w.translate(_IT_ACUTE).replace("qu", "qU")
    s = list(w)
    for i in range(1, len(s) - 1):
        if s[i] == "u" and s[i - 1] in _IT_V and s[i + 1] in _IT_V:
            s[i] = "U"
        elif s[i] == "i" and s[i - 1] in _IT_V and s[i + 1] in _IT_V:
            s[i] = "I"
    return "".join(s)


def italian_snowball_stem(w: str) -> str:
    """Snowball Italian (snowball/ext/ItalianStemmer.java:843-883)."""
    w = _it_prelude(w)
    pV = _rv_romance(w, _IT_V)
    p1, p2 = _std_regions(w, _IT_V)

    def r1(s):
        return s >= p1

    def r2(s):
        return s >= p2

    def rv(s):
        return s >= pV

    # attached pronoun
    m = _match_b(w, _IT_A_2)
    if m:
        pron = m[0]
        head = w[: -len(pron)]
        m2 = _match_b(head, _IT_A_3)
        if m2 and rv(len(head) - len(m2[0])):
            w = head if m2[1] == 1 else head + "e"

    done = False
    m = _match_b(w, _IT_A_6)
    if m:
        suf, act = m
        start = len(w) - len(suf)
        head = w[:start]
        if act == 1 and r2(start):
            w = head
            done = True
        elif act == 2 and r2(start):
            w = head
            done = True
            if w.endswith("ic") and r2(len(w) - 2):
                w = w[:-2]
        elif act == 3 and r2(start):
            w = head + "log"
            done = True
        elif act == 4 and r2(start):
            w = head + "u"
            done = True
        elif act == 5 and r2(start):
            w = head + "ente"
            done = True
        elif act == 6 and rv(start):
            w = head
            done = True
        elif act == 7 and r1(start):
            w = head
            done = True
            m3 = _match_b(w, _IT_A_4)
            if m3 and r2(len(w) - len(m3[0])):
                iv = m3[1] == 1
                w = w[: -len(m3[0])]
                if iv and w.endswith("at") and r2(len(w) - 2):
                    w = w[:-2]
        elif act == 8 and r2(start):
            w = head
            done = True
            m3 = _match_b(w, _IT_A_5)
            if m3 and r2(len(w) - len(m3[0])):
                w = w[: -len(m3[0])]
        elif act == 9 and r2(start):
            w = head
            done = True
            if w.endswith("at") and r2(len(w) - 2):
                w = w[:-2]
                if w.endswith("ic") and r2(len(w) - 2):
                    w = w[:-2]
    if not done:
        tail = w[pV:]
        m = _match_b(tail, _IT_A_7)
        if m:
            w = w[: -len(m[0])]
    # vowel suffix
    if w and w[-1] in _IT_AEIO and rv(len(w) - 1):
        w = w[:-1]
        if w.endswith("i") and rv(len(w) - 1):
            w = w[:-1]
    # ch/gh -> c/g: the RV check runs after consuming BOTH chars
    # (ItalianStemmer.java r_vowel_suffix second block)
    if (len(w) >= 2 and w[-1] == "h" and w[-2] in "cg"
            and rv(len(w) - 2)):
        w = w[:-1]
    return w.translate(_IT_POSTLUDE)


# ---------------------------------------------------------------------------
# Portuguese snowball (snowball/ext/PortugueseStemmer.java, Snowball 2.0
# 'portuguese') — selectable alternative to the light/RSLP stemmers.
# ---------------------------------------------------------------------------

_PTSB_A_0 = (
    ("ã", 1), ("õ", 2),
)

_PTSB_A_1 = (
    ("a~", 1), ("o~", 2),
)

_PTSB_A_2 = (
    ("ad", -1), ("ic", -1), ("iv", 1), ("os", -1),
)

_PTSB_A_3 = (
    ("ante", 1), ("avel", 1), ("ível", 1),
)

_PTSB_A_4 = (
    ("abil", 1), ("ic", 1), ("iv", 1),
)

_PTSB_A_5 = (
    ("amentos", 1), ("imentos", 1), ("adoras", 1), ("adores", 1),
    ("amente", 5), ("amento", 1), ("aço~es", 1), ("idades", 7),
    ("imento", 1), ("logias", 2), ("uço~es", 3), ("ências", 4),
    ("adora", 1), ("antes", 1), ("aça~o", 1), ("idade", 7),
    ("ismos", 1), ("istas", 1), ("logia", 2), ("mente", 6),
    ("uça~o", 3), ("ância", 1), ("ência", 4), ("ador", 1), ("ante", 1),
    ("ezas", 1), ("icas", 1), ("icos", 1), ("iras", 9), ("ismo", 1),
    ("ista", 1), ("ivas", 8), ("ivos", 8), ("osas", 1), ("osos", 1),
    ("ável", 1), ("ível", 1), ("eza", 1), ("ica", 1), ("ico", 1),
    ("ira", 9), ("iva", 8), ("ivo", 8), ("osa", 1), ("oso", 1),
)

_PTSB_A_6 = (
    ("aríamos", 1), ("eríamos", 1), ("iríamos", 1), ("ássemos", 1),
    ("êssemos", 1), ("íssemos", 1), ("aremos", 1), ("aríeis", 1),
    ("eremos", 1), ("eríeis", 1), ("iremos", 1), ("iríeis", 1),
    ("áramos", 1), ("ásseis", 1), ("ávamos", 1), ("éramos", 1),
    ("ésseis", 1), ("íramos", 1), ("ísseis", 1), ("ara~o", 1),
    ("ardes", 1), ("areis", 1), ("ariam", 1), ("arias", 1),
    ("armos", 1), ("assem", 1), ("asses", 1), ("astes", 1),
    ("era~o", 1), ("erdes", 1), ("ereis", 1), ("eriam", 1),
    ("erias", 1), ("ermos", 1), ("essem", 1), ("esses", 1),
    ("estes", 1), ("ira~o", 1), ("irdes", 1), ("ireis", 1),
    ("iriam", 1), ("irias", 1), ("irmos", 1), ("issem", 1),
    ("isses", 1), ("istes", 1), ("áreis", 1), ("áveis", 1),
    ("éreis", 1), ("íamos", 1), ("íreis", 1), ("adas", 1), ("ados", 1),
    ("amos", 1), ("ando", 1), ("aram", 1), ("aras", 1), ("arei", 1),
    ("arem", 1), ("ares", 1), ("aria", 1), ("arás", 1), ("asse", 1),
    ("aste", 1), ("avam", 1), ("avas", 1), ("emos", 1), ("endo", 1),
    ("eram", 1), ("eras", 1), ("erei", 1), ("erem", 1), ("eres", 1),
    ("eria", 1), ("erás", 1), ("esse", 1), ("este", 1), ("idas", 1),
    ("idos", 1), ("imos", 1), ("indo", 1), ("iram", 1), ("iras", 1),
    ("irei", 1), ("irem", 1), ("ires", 1), ("iria", 1), ("irás", 1),
    ("isse", 1), ("iste", 1), ("ámos", 1), ("íeis", 1), ("ada", 1),
    ("ado", 1), ("ais", 1), ("ara", 1), ("ará", 1), ("ava", 1),
    ("eis", 1), ("era", 1), ("erá", 1), ("iam", 1), ("ias", 1),
    ("ida", 1), ("ido", 1), ("ira", 1), ("irá", 1), ("am", 1),
    ("ar", 1), ("as", 1), ("ei", 1), ("em", 1), ("er", 1), ("es", 1),
    ("eu", 1), ("ia", 1), ("ir", 1), ("is", 1), ("iu", 1), ("ou", 1),
)

_PTSB_A_7 = (
    ("os", 1), ("a", 1), ("i", 1), ("o", 1), ("á", 1), ("í", 1),
    ("ó", 1),
)

_PTSB_A_8 = (
    ("e", 1), ("ç", 2), ("é", 1), ("ê", 1),
)


_PTSB_V = frozenset("aeiouáâéêíóôú")
_PTSB_POST = (("a~", "ã"), ("o~", "õ"))


def portuguese_snowball_stem(w: str) -> str:
    """Snowball Portuguese (snowball/ext/PortugueseStemmer.java:783-853)."""
    w = w.replace("ã", "a~").replace("õ", "o~")
    pV = _rv_romance(w, _PTSB_V)
    p1, p2 = _std_regions(w, _PTSB_V)

    def r1(s):
        return s >= p1

    def r2(s):
        return s >= p2

    def rv(s):
        return s >= pV

    def standard(w):
        m = _match_b(w, _PTSB_A_5)
        if not m:
            return None
        suf, act = m
        start = len(w) - len(suf)
        head = w[:start]
        if act == 1 and r2(start):
            return head
        if act == 2 and r2(start):
            return head + "log"
        if act == 3 and r2(start):
            return head + "u"
        if act == 4 and r2(start):
            return head + "ente"
        if act == 5 and r1(start):
            w = head
            m3 = _match_b(w, _PTSB_A_2)
            if m3 and r2(len(w) - len(m3[0])):
                iv = m3[1] == 1
                w = w[: -len(m3[0])]
                if iv and w.endswith("at") and r2(len(w) - 2):
                    w = w[:-2]
            return w
        if act == 6 and r2(start):
            w = head
            m3 = _match_b(w, _PTSB_A_3)
            if m3 and r2(len(w) - len(m3[0])):
                w = w[: -len(m3[0])]
            return w
        if act == 7 and r2(start):
            w = head
            m3 = _match_b(w, _PTSB_A_4)
            if m3 and r2(len(w) - len(m3[0])):
                w = w[: -len(m3[0])]
            return w
        if act == 8 and r2(start):
            w = head
            if w.endswith("at") and r2(len(w) - 2):
                w = w[:-2]
            return w
        if act == 9 and rv(start) and head.endswith("e"):
            return head + "ir"
        return None

    res = standard(w)
    if res is None:
        tail = w[pV:]
        m = _match_b(tail, _PTSB_A_6)
        if m:
            res = w[: -len(m[0])]
    if res is not None:
        w = res
        # trailing i after c in RV
        if w.endswith("ci") and rv(len(w) - 1):
            w = w[:-1]
    else:
        m = _match_b(w, _PTSB_A_7)
        if m and rv(len(w) - len(m[0])):
            w = w[: -len(m[0])]
    # residual form
    m = _match_b(w, _PTSB_A_8)
    if m:
        suf, act = m
        start = len(w) - len(suf)
        if act == 1 and rv(start):
            w = w[:start]
            if ((w.endswith("gu") or w.endswith("ci"))
                    and rv(len(w) - 1)):
                w = w[:-1]
        elif act == 2:
            w = w[:start] + "c"
    for marker, ch in _PTSB_POST:
        w = w.replace(marker, ch)
    return w


# ---------------------------------------------------------------------------
# French snowball (snowball/ext/FrenchStemmer.java, Snowball 2.0 'french')
# — selectable alternative to the default FrenchLightStemmer. Validated
# against the reference snowball implementation run as a dev-time oracle.
# ---------------------------------------------------------------------------

_FRSB_A_0 = (
    ("col", -1), ("par", -1), ("tap", -1),
)

_FRSB_A_1 = (
    ("He", 4), ("Hi", 5), ("H", 6), ("I", 1), ("U", 2), ("Y", 3),
)

_FRSB_A_2 = (
    ("Ièr", 4), ("abl", 3), ("eus", 2), ("iqU", 3), ("ièr", 4),
    ("iv", 1),
)

_FRSB_A_3 = (
    ("abil", 1), ("ic", 2), ("iv", 3),
)

_FRSB_A_4 = (
    ("issements", 12), ("issement", 12), ("atrices", 2),
    ("amment", 13), ("ateurs", 2), ("ations", 2), ("atrice", 2),
    ("ements", 6), ("emment", 14), ("logies", 3), ("usions", 4),
    ("utions", 4), ("ables", 1), ("ances", 1), ("ateur", 2),
    ("ation", 2), ("ement", 6), ("ences", 5), ("euses", 11),
    ("iqUes", 1), ("ismes", 1), ("istes", 1), ("logie", 3),
    ("ments", 15), ("usion", 4), ("ution", 4), ("able", 1),
    ("ance", 1), ("eaux", 9), ("ence", 5), ("euse", 11), ("iqUe", 1),
    ("isme", 1), ("iste", 1), ("ités", 7), ("ives", 8), ("ment", 15),
    ("aux", 10), ("eux", 1), ("ifs", 8), ("ité", 7), ("ive", 8),
    ("if", 8),
)

_FRSB_A_5 = (
    ("issaIent", 1), ("issantes", 1), ("iraIent", 1), ("issante", 1),
    ("issants", 1), ("issions", 1), ("irions", 1), ("issais", 1),
    ("issait", 1), ("issant", 1), ("issent", 1), ("issiez", 1),
    ("issons", 1), ("irais", 1), ("irait", 1), ("irent", 1),
    ("iriez", 1), ("irons", 1), ("iront", 1), ("isses", 1),
    ("issez", 1), ("irai", 1), ("iras", 1), ("irez", 1), ("isse", 1),
    ("îmes", 1), ("îtes", 1), ("ies", 1), ("ira", 1), ("ie", 1),
    ("ir", 1), ("is", 1), ("it", 1), ("ît", 1), ("i", 1),
)

_FRSB_A_6 = (
    ("assions", 3), ("eraIent", 2), ("assent", 3), ("assiez", 3),
    ("erions", 2), ("aIent", 3), ("antes", 3), ("asses", 3),
    ("erais", 2), ("erait", 2), ("eriez", 2), ("erons", 2),
    ("eront", 2), ("èrent", 2), ("ante", 3), ("ants", 3), ("asse", 3),
    ("erai", 2), ("eras", 2), ("erez", 2), ("ions", 1), ("âmes", 3),
    ("âtes", 3), ("ais", 3), ("ait", 3), ("ant", 3), ("era", 2),
    ("iez", 2), ("ées", 2), ("ai", 3), ("as", 3), ("er", 2), ("ez", 2),
    ("ât", 3), ("ée", 2), ("és", 2), ("a", 3), ("é", 2),
)

_FRSB_A_7 = (
    ("Ière", 2), ("ière", 2), ("Ier", 2), ("ier", 2), ("ion", 1),
    ("e", 3),
)

_FRSB_A_8 = (
    ("eill", -1), ("ell", -1), ("enn", -1), ("ett", -1), ("onn", -1),
)


_FR_V = frozenset("aeiouyàâèéêëîïôùû")
_FR_KEEP_S = frozenset("aiosuè")


def _fr_prelude(w: str) -> str:
    s = list(w)
    i = 0
    while i < len(s):
        c = s[i]
        if c in _FR_V and i + 1 < len(s):
            if (s[i + 1] == "u" and i + 2 < len(s)
                    and s[i + 2] in _FR_V):
                s[i + 1] = "U"
                i += 2
                continue
            if (s[i + 1] == "i" and i + 2 < len(s)
                    and s[i + 2] in _FR_V):
                s[i + 1] = "I"
                i += 2
                continue
            if s[i + 1] == "y":
                s[i + 1] = "Y"
                i += 2
                continue
        if c == "ë":
            s[i:i + 1] = ["H", "e"]
            i += 2
            continue
        if c == "ï":
            s[i:i + 1] = ["H", "i"]
            i += 2
            continue
        if c == "y" and i + 1 < len(s) and s[i + 1] in _FR_V:
            s[i] = "Y"
            i += 1
            continue
        if c == "q" and i + 1 < len(s) and s[i + 1] == "u":
            s[i + 1] = "U"
            i += 2
            continue
        i += 1
    return "".join(s)


def _fr_pv(w: str) -> int:
    n = len(w)
    if n >= 2 and w[0] in _FR_V and w[1] in _FR_V and n >= 3:
        return 3
    if w.startswith(("col", "par", "tap")):
        return 3
    i = 1
    while i < n and w[i] not in _FR_V:
        i += 1
    return i + 1 if i < n else n


_FR_POSTLUDE = [("I", "i"), ("U", "u"), ("Y", "y"), ("He", "ë"),
                ("Hi", "ï"), ("H", "")]


def french_snowball_stem(w: str) -> str:
    """Snowball French (snowball/ext/FrenchStemmer.java:1070-1160)."""
    w = _fr_prelude(w)
    pV = _fr_pv(w)
    p1, p2 = _std_regions(w, _FR_V)

    def r1(s):
        return s >= p1

    def r2(s):
        return s >= p2

    def rv(s):
        return s >= pV

    def standard(w):
        """Returns (new_w, success); cases 13-15 mutate but report
        failure (the driver then runs residual_suffix)."""
        m = _match_b(w, _FRSB_A_4)
        if not m:
            return w, False
        suf, act = m
        start = len(w) - len(suf)
        head = w[:start]
        if act == 1 and r2(start):
            return head, True
        if act == 2 and r2(start):
            w = head
            if w.endswith("ic"):
                if r2(len(w) - 2):
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
            return w, True
        if act == 3 and r2(start):
            return head + "log", True
        if act == 4 and r2(start):
            return head + "u", True
        if act == 5 and r2(start):
            return head + "ent", True
        if act == 6 and rv(start):
            w = head
            m3 = _match_b(w, _FRSB_A_2)
            if m3:
                s3, a3 = m3
                st3 = len(w) - len(s3)
                if a3 == 1 and r2(st3):      # iv
                    w = w[:st3]
                    if w.endswith("at") and r2(len(w) - 2):
                        w = w[:-2]
                elif a3 == 2:                # eus
                    if r2(st3):
                        w = w[:st3]
                    elif r1(st3):
                        w = w[:st3] + "eux"
                elif a3 == 3 and r2(st3):    # abl/iqU
                    w = w[:st3]
                elif a3 == 4 and rv(st3):    # ièr/Ièr
                    w = w[:st3] + "i"
            return w, True
        if act == 7 and r2(start):
            w = head
            m3 = _match_b(w, _FRSB_A_3)
            if m3:
                s3, a3 = m3
                st3 = len(w) - len(s3)
                if a3 == 1:                  # abil
                    w = w[:st3] if r2(st3) else w[:st3] + "abl"
                elif a3 == 2:                # ic
                    w = w[:st3] if r2(st3) else w[:st3] + "iqU"
                elif a3 == 3 and r2(st3):    # iv
                    w = w[:st3]
            return w, True
        if act == 8 and r2(start):
            w = head
            if w.endswith("at") and r2(len(w) - 2):
                w = w[:-2]
                if w.endswith("ic"):
                    if r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
            return w, True
        if act == 9:
            return head + "eau", True
        if act == 10 and r1(start):
            return head + "al", True
        if act == 11:                        # euse/euses
            if r2(start):
                return head, True
            if r1(start):
                return head + "eux", True
            return w, False
        if act == 12 and r1(start) and head and head[-1] not in _FR_V:
            return head, True
        if act == 13 and rv(start):          # amment -> ant, continue
            return head + "ant", False
        if act == 14 and rv(start):          # emment -> ent, continue
            return head + "ent", False
        if act == 15:                        # ment(s) after RV vowel
            if start > 0 and w[start - 1] in _FR_V and rv(start - 1):
                return head, False
            return w, False
        return w, False

    w, done = standard(w)
    if not done:
        tail = w[pV:]
        m = _match_b(tail, _FRSB_A_5)
        if m:
            start = len(w) - len(m[0])
            head = w[:start]
            # not preceded by H; preceded by a non-vowel (within RV bound)
            if (not head.endswith("H") and start - 1 >= pV
                    and head and head[-1] not in _FR_V):
                w = head
                done = True
    if not done:
        tail = w[pV:]
        m = _match_b(tail, _FRSB_A_6)
        if m:
            suf, act = m
            start = len(w) - len(suf)
            if act == 1:
                if r2(start):
                    w = w[:start]
                    done = True
            else:
                w = w[:start]
                # the e-bonus matches under limit_backward = pV
                if act == 3 and w.endswith("e") and len(w) - 1 >= pV:
                    w = w[:-1]
                done = True
    if done:
        # final Y -> i, or ç -> c
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # residual: optional s-deletion, then a_7 bounded to RV
        if w.endswith("s"):
            head = w[:-1]
            if head.endswith("Hi") or (head and head[-1]
                                       not in _FR_KEEP_S):
                w = head
        tail = w[pV:]
        m = _match_b(tail, _FRSB_A_7)
        if m:
            suf, act = m
            start = len(w) - len(suf)
            if act == 1:
                if r2(start) and w[:start].endswith(("s", "t")):
                    w = w[:start]
            elif act == 2:
                w = w[:start] + "i"
            else:
                w = w[:start]
    # un_double
    if w.endswith(("eill", "ell", "enn", "ett", "onn")):
        w = w[:-1]
    # un_accent: at least one trailing non-vowel, then é/è -> e
    i = len(w)
    while i > 0 and w[i - 1] not in _FR_V:
        i -= 1
    if i < len(w) and i > 0 and w[i - 1] in "éè":
        w = w[:i - 1] + "e" + w[i:]
    # postlude
    for marker, ch in _FR_POSTLUDE:
        w = w.replace(marker, ch)
    return w
