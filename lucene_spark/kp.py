"""Kraaij–Pohlmann Dutch stemmer (snowball 'Kp').

Re-expresses the reference's generated cursor machine
(org/tartarus/snowball/ext/KpStemmer.java; algorithm: Kraaij & Pohlmann,
"Porter's stemming algorithm for Dutch", 1994 — published at
snowballstem.org) as plain suffix/region logic, the same style as
snowball.py. Validated against the reference stemmer compiled and run as a
dev-time oracle over the full Dutch test vocabulary plus synthesized
suffix-table words (tests/test_kp.py embeds the pinned pairs).

Machine notes (KpStemmer.java line refs):
- groupings: v = aeiouy, v_WX = v+wx, AOU = aou, AIOU = aiou (:121-127)
- 'y' after a vowel (and word-initial 'y') is marked 'Y' = consonant (:1350)
- "ij" counts as ONE vowel unit in the measure and as a vowel in the V/C
  context tests; a lone 'j' is a consonant (:153-219, 1243)
- p1/p2 are absolute cursor positions; suffix slices don't move them, but
  ge- prefix/infix removal triggers a re-measure (:1448-1490)
- lengthen_V re-doubles a short vowel left in an open final syllable
  (man -> maan) after several deletions (:221)
- Step_6 (undouble, incl. v->f, z->s) runs only if a suffix step fired or
  a ge- INFIX (not prefix) was removed (:1519-1537)
"""

from __future__ import annotations

from typing import Optional, Tuple

_V = frozenset("aeiouy")
_V_WX = frozenset("aeiouywx")
_AOU = frozenset("aou")
_AIOU = frozenset("aiou")


def _is_v(w: str, i: int) -> bool:
    """r_V at cursor i: preceding char is a vowel, or preceding pair 'ij'."""
    return (i >= 1 and w[i - 1] in _V) or (i >= 2 and w[i - 2:i] == "ij")


def _is_vx(w: str, i: int) -> bool:
    """r_VX: r_V one position earlier (requires a char to step over)."""
    return i >= 1 and _is_v(w, i - 1)


def _is_c(w: str, i: int) -> bool:
    """r_C: preceding char is a consonant and the preceding pair isn't 'ij'."""
    if i >= 2 and w[i - 2:i] == "ij":
        return False
    return i >= 1 and w[i - 1] not in _V


def _lengthen_v(w: str) -> str:
    """r_lengthen_V at end-of-word: double a short a/o/u (or e) left in an
    open final syllable after suffix removal (man -> maan, gen -> geen).
    Always 'succeeds' (the original returns true either way)."""
    c = len(w)
    if c == 0 or w[c - 1] in _V_WX:
        return w
    i = c - 1  # cursor after the final consonant; ket = i
    if i >= 1 and w[i - 1] in _AOU:
        # double unless the vowel is preceded by another vowel
        if i - 1 == 0 or (i >= 2 and w[i - 2] not in _V):
            return w[: i - 1] + w[i - 1] + w[i - 1:]
        return w
    if i >= 1 and w[i - 1] == "e":
        cc = i - 1  # cursor after consuming the 'e'
        if cc >= 1 and w[cc - 1] not in _V:
            cc2 = cc - 1  # consumed the consonant before the 'e'
        elif cc >= 1:
            return w  # vowel before the 'e' (and not at the boundary)
        else:
            cc2 = cc
        # no doubling when an a/i/o/u precedes (directly, or one consonant
        # further back with a consonant before it)
        if cc2 >= 1 and w[cc2 - 1] in _AIOU:
            return w
        if cc2 >= 1:
            cc3 = cc2 - 1
            if cc3 >= 1 and w[cc3 - 1] in _AIOU and cc3 - 1 >= 1 \
                    and w[cc3 - 2] not in _V:
                return w
        return w[: i - 1] + "e" + w[i - 1:]
    return w


def _measure(w: str) -> Tuple[int, int]:
    """r_measure: p1/p2 = cursor after the 1st/2nd consonant that follows
    a (consonant*, vowel-unit+) run, where 'ij' is one vowel unit."""
    n = len(w)
    c = 0

    def vowel_run(c: int) -> int:
        units = 0
        while True:
            if w[c:c + 2] == "ij":
                c += 2
            elif c < n and w[c] in _V:
                c += 1
            else:
                break
            units += 1
        return c if units else -1

    while c < n and w[c] not in _V:
        c += 1
    c = vowel_run(c)
    if c < 0 or c >= n or w[c] in _V:
        return n, n
    c += 1
    p1 = c
    while c < n and w[c] not in _V:
        c += 1
    c = vowel_run(c)
    if c < 0 or c >= n or w[c] in _V:
        return p1, n
    return p1, c + 1


def _find_among_b(w: str, table) -> Optional[Tuple[str, int]]:
    """Longest matching suffix from the among table (find_among_b)."""
    best = None
    for s, code in table:
        if w.endswith(s) and (best is None or len(s) > len(best[0])):
            best = (s, code)
    return best


_A0 = [("nde", 7), ("en", 6), ("s", 2), ("'s", 1), ("es", 4), ("ies", 3),
       ("aus", 5)]
_A1 = [("de", 5), ("ge", 2), ("ische", 4), ("je", 1), ("lijke", 3),
       ("le", 9), ("ene", 10), ("re", 8), ("se", 7), ("te", 6), ("ieve", 11)]
_A2 = [("heid", 3), ("fie", 6), ("gie", 7), ("atie", 1), ("isme", 2),
       ("ing", 2), ("arij", 5), ("erij", 2), ("sel", 3), ("rder", 4),
       ("ster", 3), ("iteit", 2), ("dst", 9), ("tst", 8)]
_A3 = [("end", 9), ("atief", 2), ("erig", 9), ("achtig", 3), ("ioneel", 1),
       ("baar", 3), ("laar", 5), ("naar", 4), ("raar", 6), ("eriger", 9),
       ("achtiger", 3), ("lijker", 8), ("tant", 7), ("erigst", 9),
       ("achtigst", 3), ("lijkst", 8)]
_A4 = [("ig", 1), ("iger", 1), ("igst", 1)]
_A5 = [("ft", "f"), ("kt", "k"), ("pt", "p")]
_A6 = [("bb", "b"), ("cc", "c"), ("dd", "d"), ("ff", "f"), ("gg", "g"),
       ("hh", "h"), ("jj", "j"), ("kk", "k"), ("ll", "l"), ("mm", "m"),
       ("nn", "n"), ("pp", "p"), ("qq", "q"), ("rr", "r"), ("ss", "s"),
       ("tt", "t"), ("v", "f"), ("vv", "v"), ("ww", "w"), ("xx", "x"),
       ("z", "s"), ("zz", "z")]


def _step1(w: str, p1: int) -> Optional[str]:
    m = _find_among_b(w, _A0)
    if m is None:
        return None
    suf, code = m
    b = len(w) - len(suf)
    if code == 1:  # 's
        return w[:b]
    if code == 2:  # s
        if p1 > b:
            return None
        if w.endswith("t", 0, b) and p1 <= b - 1:
            return None
        if not _is_c(w, b):
            return None
        return w[:b]
    if code == 3:  # ies -> ie
        return w[:b] + "ie" if p1 <= b else None
    if code == 4:  # es
        if w.endswith("ar", 0, b) and p1 <= b - 2 and _is_c(w, b - 2):
            return _lengthen_v(w[:b - 2])
        if w.endswith("er", 0, b) and p1 <= b - 2 and _is_c(w, b - 2):
            return w[:b - 2]
        if p1 <= b and _is_c(w, b):
            return w[:b] + "e"
        return None
    if code == 5:  # aus -> au
        return w[:b] + "au" if p1 <= b and _is_v(w, b) else None
    if code == 6:  # en
        if w.endswith("hed", 0, b) and p1 <= b - 3:
            return w[:b - 3] + "heid"
        if w.endswith("nd", 0, b):
            return w[:b]
        if w.endswith("d", 0, b) and p1 <= b - 1 and _is_c(w, b - 1):
            return w[:b - 1]
        if (w.endswith("i", 0, b) or w.endswith("j", 0, b)) and _is_v(w, b - 1):
            return w[:b]
        if p1 <= b and _is_c(w, b):
            return _lengthen_v(w[:b])
        return None
    # code 7: nde -> nd
    return w[:b] + "nd"


def _step2(w: str, p1: int) -> Optional[str]:
    m = _find_among_b(w, _A1)
    if m is None:
        return None
    suf, code = m
    b = len(w) - len(suf)
    if code == 1:  # je (with left-context alternatives, longest first)
        if w.endswith("'t", 0, b):
            return w[:b - 2]
        if w.endswith("et", 0, b) and p1 <= b - 2 and _is_c(w, b - 2):
            return w[:b - 2]
        if w.endswith("rnt", 0, b):
            return w[:b - 3] + "rn"
        if w.endswith("t", 0, b) and p1 <= b - 1 and _is_vx(w, b - 1):
            return w[:b - 1]
        if w.endswith("ink", 0, b):
            return w[:b - 3] + "ing"
        if w.endswith("mp", 0, b):
            return w[:b - 2] + "m"
        if w.endswith("'", 0, b) and p1 <= b - 1:
            return w[:b - 1]
        if p1 <= b and _is_c(w, b):
            return w[:b]
        return None
    if p1 > b:
        return None
    if code == 2:  # ge -> g
        return w[:b] + "g"
    if code == 3:  # lijke -> lijk
        return w[:b] + "lijk"
    if code == 4:  # ische -> isch
        return w[:b] + "isch"
    if code == 5:  # de
        return w[:b] if _is_c(w, b) else None
    if code == 6:  # te -> t
        return w[:b] + "t"
    if code == 7:  # se -> s
        return w[:b] + "s"
    if code == 8:  # re -> r
        return w[:b] + "r"
    if code == 9:  # le -> l (+ lengthen)
        return _lengthen_v(w[:b] + "l")
    if code == 10:  # ene -> en (+ lengthen)
        return _lengthen_v(w[:b] + "en") if _is_c(w, b) else None
    # code 11: ieve -> ief
    return w[:b] + "ief" if _is_c(w, b) else None


def _step3(w: str, p1: int, p2: int) -> Optional[str]:
    m = _find_among_b(w, _A2)
    if m is None:
        return None
    suf, code = m
    b = len(w) - len(suf)
    if code == 4:  # rder -> r (no region condition)
        return w[:b] + "r"
    if code in (6, 7):  # fie/gie (R2)
        if p2 > b:
            return None
        return _lengthen_v(w[:b] + ("f" if code == 6 else "g"))
    if p1 > b:
        return None
    if code == 1:  # atie -> eer
        return w[:b] + "eer"
    if code == 2:  # isme/ing/erij/iteit (+ lengthen)
        return _lengthen_v(w[:b])
    if code == 3:  # heid/sel/ster
        return w[:b]
    if code == 5:  # arij -> aar
        return w[:b] + "aar" if _is_c(w, b) else None
    if code == 8:  # tst -> t
        return w[:b] + "t" if _is_c(w, b) else None
    # code 9: dst -> d
    return w[:b] + "d" if _is_c(w, b) else None


def _step4(w: str, p1: int) -> Optional[str]:
    m = _find_among_b(w, _A3)
    if m is not None:
        suf, code = m
        b = len(w) - len(suf)
        if p1 <= b:
            if code == 1:  # ioneel -> ie
                return w[:b] + "ie"
            if code == 2:  # atief -> eer
                return w[:b] + "eer"
            if code == 3:  # achtig(er/st)/baar
                return w[:b]
            if code == 4 and _is_v(w, b):  # naar -> n
                return w[:b] + "n"
            if code == 5 and _is_v(w, b):  # laar -> l
                return w[:b] + "l"
            if code == 6 and _is_v(w, b):  # raar -> r
                return w[:b] + "r"
            if code == 7:  # tant -> teer
                return w[:b] + "teer"
            if code == 8:  # lijker/lijkst -> lijk
                return w[:b] + "lijk"
            if code == 9 and _is_c(w, b):  # end/erig(er/st) (+ lengthen)
                return _lengthen_v(w[:b])
    # fall through to ig/iger/igst when the a_3 guard failed
    m = _find_among_b(w, _A4)
    if m is None:
        return None
    b = len(w) - len(m[0])
    if p1 <= b and _is_c(w, b):
        return _lengthen_v(w[:b])
    return None


def _step7(w: str) -> Optional[str]:
    m = _find_among_b(w, _A5)
    if m is None:
        return None
    return w[: len(w) - 2] + m[1]


def _step6(w: str) -> Optional[str]:
    m = _find_among_b(w, _A6)
    if m is None:
        return None
    return w[: len(w) - len(m[0])] + m[1]


def _step1c(w: str, p1: int) -> Optional[str]:
    """Only after a ge- removal: drop a trailing d/t (verb forms)."""
    if not w:
        return None
    last = w[-1]
    if last not in ("d", "t"):
        return None
    b = len(w) - 1
    if p1 > b or not _is_c(w, b):
        return None
    if last == "d":
        if w.endswith("n", 0, b) and p1 <= b - 1:
            return None
    else:
        if w.endswith("h", 0, b) and p1 <= b - 1:
            return None
    return w[:b]


def _lose_prefix(w: str) -> Optional[str]:
    """Remove leading 'ge' when >=3 chars remain containing a vowel run
    followed by a consonant."""
    if not w.startswith("ge") or len(w) < 5:
        return None
    i = 2
    while i < len(w) and w[i] not in _V:
        i += 1
    if i >= len(w):
        return None
    while i < len(w) and w[i] in _V:
        i += 1
    if i >= len(w):
        return None
    return w[2:]


def _lose_infix(w: str) -> Optional[str]:
    """Remove the first internal 'ge' (position >= 1) under the same
    lookahead conditions as the prefix rule."""
    g = w.find("ge", 1)
    if g < 0:
        return None
    j = g + 2
    if j + 3 > len(w):
        return None
    i = j
    while i < len(w) and w[i] not in _V:
        i += 1
    if i >= len(w):
        return None
    while i < len(w) and w[i] in _V:
        i += 1
    if i >= len(w):
        return None
    return w[:g] + w[g + 2:]


def kp_stem(word: str) -> str:
    """Stem one lowercased Dutch token (SnowballFilter('Kp') semantics)."""
    w = word
    y_found = False
    if w[:1] == "y":
        w = "Y" + w[1:]
        y_found = True
    if "y" in w:
        out = list(w)
        for i in range(len(out) - 1):
            if out[i] in _V and out[i + 1] == "y":
                out[i + 1] = "Y"
                y_found = True
        w = "".join(out)

    p1, p2 = _measure(w)
    stemmed = False
    for step in (lambda v: _step1(v, p1), lambda v: _step2(v, p1),
                 lambda v: _step3(v, p1, p2), lambda v: _step4(v, p1)):
        r = step(w)
        if r is not None:
            w, stemmed = r, True

    r = _lose_prefix(w)
    if r is not None:
        w = r
        p1, p2 = _measure(w)
        r = _step1c(w, p1)
        if r is not None:
            w = r

    ge_infix = False
    r = _lose_infix(w)
    if r is not None:
        w = r
        ge_infix = True
        p1, p2 = _measure(w)
        r = _step1c(w, p1)
        if r is not None:
            w = r

    r = _step7(w)
    if r is not None:
        w, stemmed = r, True
    if stemmed or ge_infix:
        r = _step6(w)
        if r is not None:
            w = r
    if y_found:
        w = w.replace("Y", "y")
    return w
