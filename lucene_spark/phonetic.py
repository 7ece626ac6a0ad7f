"""Phonetic encoders + filter plumbing: the analog of the reference's
``analysis/phonetic`` module (``PhoneticFilter.java``,
``DoubleMetaphoneFilter.java``), whose encoders come from Apache
commons-codec's language package. Each encoder here is re-derived from the
published algorithm (Russell/Odell Soundex, the Refined Soundex variant,
Philips' Metaphone and Double Metaphone, Taft's NYSIIS, Hood's Caverphone
2.0, Postel's Kölner Phonetik) and validated against the reference's own
filter test vectors (``TestPhoneticFilter.java``,
``TestDoubleMetaphoneFilter.java``).

Filter semantics (PhoneticFilter.java:54-97): the encoded form either
REPLACES the token (``inject=False``) or joins it at the same position
(``inject=True``, posIncr=0 overlap — same injection machinery as
index-time synonyms / decompounding). Encodings that are empty or equal to
the input leave the token untouched; non-alphabetic tokens pass through.

Index integration: ``IndexConfig.phonetic = PhoneticConfig(...)`` — the
invert path encodes once per DISTINCT token (memoized), so per-token cost
amortizes across the corpus vocabulary inside the existing Arrow-batched
UDF: no extra shuffle, no per-row Python.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

# ---------------------------------------------------------------------------
# Soundex (Russell/Odell; commons-codec Soundex with the H/W rule)
# ---------------------------------------------------------------------------

_SOUNDEX_MAP = "01230120022455012623010202"  # A..Z


def _soundex_code(c: str) -> str:
    return _SOUNDEX_MAP[ord(c) - 65]


def soundex(text: str) -> str:
    """American Soundex, 4 chars, zero-padded. H and W are transparent: a
    consonant on the far side of H/W that maps to the same code as the one
    before them is suppressed."""
    s = "".join(c for c in text.upper() if "A" <= c <= "Z")
    if not s:
        return ""

    def mapping(i: int) -> str:
        m = _soundex_code(s[i])
        if i > 1 and m != "0":
            hw = s[i - 1]
            if hw in "HW":
                pre = s[i - 2]
                if _soundex_code(pre) == m or pre in "HW":
                    return ""  # suppressed
        return m

    out = [s[0], "0", "0", "0"]
    last = mapping(0)
    count, i = 1, 1
    while i < len(s) and count < 4:
        m = mapping(i)
        i += 1
        if m:
            if m != "0" and m != last:
                out[count] = m
                count += 1
            last = m
    return "".join(out)


# ---------------------------------------------------------------------------
# Refined Soundex (commons-codec RefinedSoundex)
# ---------------------------------------------------------------------------

_REFINED_MAP = "01360240043788015936020505"  # A..Z


def refined_soundex(text: str) -> str:
    """Refined Soundex: finer consonant classes, no length cap, vowels keep
    a '0' marker between consonant groups."""
    s = "".join(c for c in text.upper() if "A" <= c <= "Z")
    if not s:
        return ""
    out = [s[0]]
    last = ""
    for c in s:
        code = _REFINED_MAP[ord(c) - 65]
        if code != last:
            out.append(code)
            last = code
    return "".join(out)


# ---------------------------------------------------------------------------
# Metaphone (Philips 1990; commons-codec Metaphone, default max length 4)
# ---------------------------------------------------------------------------

_FRONTV = "EIY"
_VARSON = "CSPTG"
_VOWELS = "AEIOU"


def metaphone(text: str, max_code_len: int = 4) -> str:
    if not text:
        return ""
    if len(text) == 1:
        return text.upper()
    inwd = text.upper()

    # initial-letter exceptions
    if inwd[0] in "KGP" and inwd[1] == "N":
        local = inwd[1:]
    elif inwd[0] == "A" and inwd[1] == "E":
        local = inwd[1:]
    elif inwd[0] == "W" and inwd[1] == "R":
        local = inwd[1:]
    elif inwd[0] == "W" and inwd[1] == "H":
        local = "W" + inwd[2:]
    elif inwd[0] == "X":
        local = "S" + inwd[1:]
    else:
        local = inwd

    wdsz = len(local)
    code: List[str] = []
    n = 0

    def is_vowel(i: int) -> bool:
        return 0 <= i < wdsz and local[i] in _VOWELS

    def prev_is(i: int, c: str) -> bool:
        return i > 0 and local[i - 1] == c

    def next_is(i: int, c: str) -> bool:
        return i + 1 < wdsz and local[i + 1] == c

    def region(i: int, s: str) -> bool:
        return local[i : i + len(s)] == s

    while len(code) < max_code_len and n < wdsz:
        symb = local[n]
        if symb != "C" and prev_is(n, symb):  # drop duplicates except CC
            n += 1
            continue
        if symb in _VOWELS:
            if n == 0:
                code.append(symb)
        elif symb == "B":
            if not (prev_is(n, "M") and n == wdsz - 1):  # silent -MB
                code.append("B")
        elif symb == "C":
            if prev_is(n, "S") and n + 1 < wdsz and local[n + 1] in _FRONTV:
                pass  # SCE/SCI/SCY: silent C
            elif region(n, "CIA"):
                code.append("X")
            elif n + 1 < wdsz and local[n + 1] in _FRONTV:
                code.append("S")  # CE/CI/CY
            elif prev_is(n, "S") and next_is(n, "H"):
                code.append("K")  # SCH
            elif next_is(n, "H"):
                if n == 0 and wdsz >= 3 and not is_vowel(2):
                    code.append("K")  # CH + consonant
                else:
                    code.append("X")
            else:
                code.append("K")
        elif symb == "D":
            if n + 2 < wdsz and local[n + 1] == "G" and local[n + 2] in _FRONTV:
                code.append("J")  # DGE/DGI/DGY
                n += 2
            else:
                code.append("T")
        elif symb == "G":
            silent = False
            if n + 1 == wdsz - 1 and local[n + 1 : n + 2] == "H":
                silent = True  # -GH
            elif n + 2 < wdsz and local[n + 1] == "H" and not is_vowel(n + 2):
                silent = True  # GH + consonant
            elif n > 0 and (region(n, "GN") or region(n, "GNED")):
                silent = True
            if not silent:
                hard = prev_is(n, "G")
                if n + 1 < wdsz and local[n + 1] in _FRONTV and not hard:
                    code.append("J")
                else:
                    code.append("K")
        elif symb == "H":
            if n == wdsz - 1:
                pass  # terminal H
            elif n > 0 and local[n - 1] in _VARSON:
                pass
            elif is_vowel(n + 1):
                code.append("H")
        elif symb in "FJLMNR":
            code.append(symb)
        elif symb == "K":
            if n == 0 or not prev_is(n, "C"):
                code.append("K")
        elif symb == "P":
            code.append("F" if next_is(n, "H") else "P")
        elif symb == "Q":
            code.append("K")
        elif symb == "S":
            if region(n, "SH") or region(n, "SIO") or region(n, "SIA"):
                code.append("X")
            else:
                code.append("S")
        elif symb == "T":
            if region(n, "TIA") or region(n, "TIO"):
                code.append("X")
            elif region(n, "TCH"):
                pass  # silent
            elif region(n, "TH"):
                code.append("0")
            else:
                code.append("T")
        elif symb == "V":
            code.append("F")
        elif symb in "WY":
            if is_vowel(n + 1):
                code.append(symb)
        elif symb == "X":
            code.append("K")
            code.append("S")
        elif symb == "Z":
            code.append("S")
        # other characters (digits, punctuation) are ignored
        n += 1

    return "".join(code[:max_code_len])


# ---------------------------------------------------------------------------
# NYSIIS (Taft 1970; commons-codec Nysiis, strict 6-char key)
# ---------------------------------------------------------------------------


def _nysiis_is_vowel(c: str) -> bool:
    return c in "AEIOU"


def nysiis(text: str, strict: bool = True) -> str:
    s = "".join(c for c in text.upper() if "A" <= c <= "Z")
    if not s:
        return ""
    # first-character transcodes
    s = re.sub(r"^MAC", "MCC", s)
    s = re.sub(r"^KN", "NN", s)
    s = re.sub(r"^K", "C", s)
    s = re.sub(r"^(PH|PF)", "FF", s)
    s = re.sub(r"^SCH", "SSS", s)
    # last-character transcodes
    s = re.sub(r"(EE|IE)$", "Y", s)
    s = re.sub(r"(DT|RT|RD|NT|ND)$", "D", s)

    chars = list(s)
    key = [chars[0]]
    for i in range(1, len(chars)):
        nxt = chars[i + 1] if i < len(chars) - 1 else " "
        anext = chars[i + 2] if i < len(chars) - 2 else " "
        prev, curr = chars[i - 1], chars[i]
        if curr == "E" and nxt == "V":
            t = "AF"
        elif _nysiis_is_vowel(curr):
            t = "A"
        elif curr == "Q":
            t = "G"
        elif curr == "Z":
            t = "S"
        elif curr == "M":
            t = "N"
        elif curr == "K":
            t = "NN" if nxt == "N" else "C"
        elif curr == "S" and nxt == "C" and anext == "H":
            t = "SSS"
        elif curr == "P" and nxt == "H":
            t = "FF"
        elif curr == "H" and (not _nysiis_is_vowel(prev) or not _nysiis_is_vowel(nxt)):
            t = prev
        elif curr == "W" and _nysiis_is_vowel(prev):
            t = prev
        else:
            t = curr
        # in-place transcode (multi-char results overwrite following chars)
        for k, tc in enumerate(t):
            if i + k < len(chars):
                chars[i + k] = tc
        if chars[i] != chars[i - 1]:
            key.append(chars[i])

    if len(key) > 1:
        if key[-1] == "S":
            key.pop()
        if len(key) > 2 and key[-2:] == ["A", "Y"]:
            key = key[:-2] + ["Y"]
        if key and key[-1] == "A":
            key.pop()
    out = "".join(key)
    return out[:6] if strict else out


# ---------------------------------------------------------------------------
# Caverphone 2.0 (Hood 2004; commons-codec Caverphone2)
# ---------------------------------------------------------------------------

_CAVERPHONE_STEPS: Tuple[Tuple[str, str], ...] = (
    (r"e$", ""),
    (r"^cough", "cou2f"),
    (r"^rough", "rou2f"),
    (r"^tough", "tou2f"),
    (r"^enough", "enou2f"),
    (r"^trough", "trou2f"),
    (r"^gn", "2n"),
    (r"mb$", "m2"),
    (r"cq", "2q"),
    (r"ci", "si"),
    (r"ce", "se"),
    (r"cy", "sy"),
    (r"tch", "2ch"),
    (r"c", "k"),
    (r"q", "k"),
    (r"x", "k"),
    (r"v", "f"),
    (r"dg", "2g"),
    (r"tio", "sio"),
    (r"tia", "sia"),
    (r"d", "t"),
    (r"ph", "fh"),
    (r"b", "p"),
    (r"sh", "s2"),
    (r"z", "s"),
    (r"^[aeiou]", "A"),
    (r"[aeiou]", "3"),
    (r"j", "y"),
    (r"^y3", "Y3"),
    (r"^y", "A"),
    (r"y", "3"),
    (r"3gh3", "3kh3"),
    (r"gh", "22"),
    (r"g", "k"),
    (r"s+", "S"),
    (r"t+", "T"),
    (r"p+", "P"),
    (r"k+", "K"),
    (r"f+", "F"),
    (r"m+", "M"),
    (r"n+", "N"),
    (r"w3", "W3"),
    (r"wh3", "Wh3"),
    (r"w$", "3"),
    (r"w", "2"),
    (r"^h", "A"),
    (r"h", "2"),
    (r"r3", "R3"),
    (r"r$", "3"),
    (r"r", "2"),
    (r"l3", "L3"),
    (r"l$", "3"),
    (r"l", "2"),
    (r"2", ""),
    (r"3$", "A"),
    (r"3", ""),
)


def caverphone2(text: str) -> str:
    """Caverphone 2.0: ten-character code padded with '1'."""
    s = re.sub(r"[^a-z]", "", text.lower())
    for pat, rep in _CAVERPHONE_STEPS:
        s = re.sub(pat, rep, s)
    return (s + "1111111111")[:10]


# ---------------------------------------------------------------------------
# Kölner Phonetik (Postel 1969; commons-codec ColognePhonetic)
# ---------------------------------------------------------------------------


def cologne_phonetic(text: str) -> str:
    """Cologne phonetics for German: letters map to digit classes with
    left/right context rules; adjacent duplicates collapse and non-leading
    '0's drop."""
    # fold the German specials the way commons-codec preprocesses
    s = text.upper()
    s = (
        s.replace("Ä", "A").replace("Ö", "O").replace("Ü", "U").replace("ß", "SS")
    )
    s = "".join(c for c in s if "A" <= c <= "Z")
    if not s:
        return ""
    n = len(s)
    raw: List[str] = []
    for i, c in enumerate(s):
        # out-of-range context reads as a non-matching placeholder ('-'):
        # '' would vacuously satisfy every `in` membership test
        prev = s[i - 1] if i > 0 else "-"
        nxt = s[i + 1] if i + 1 < n else "-"
        if c in "AEIJOUY":
            raw.append("0")
        elif c == "B":
            raw.append("1")
        elif c == "P":
            raw.append("3" if nxt == "H" else "1")
        elif c in "DT":
            raw.append("8" if nxt in "CSZ" else "2")
        elif c in "FVW":
            raw.append("3")
        elif c in "GKQ":
            raw.append("4")
        elif c == "C":
            if i == 0:
                raw.append("4" if nxt in "AHKLOQRUX" else "8")
            elif prev in "SZ":
                raw.append("8")
            elif nxt in "AHKOQUX":
                raw.append("4")
            else:
                raw.append("8")
        elif c == "X":
            raw.append("8" if prev in "CKQ" else "48")
        elif c == "L":
            raw.append("5")
        elif c in "MN":
            raw.append("6")
        elif c == "R":
            raw.append("7")
        elif c in "SZ":
            raw.append("8")
        # H is ignored
    flat = "".join(raw)
    out: List[str] = []
    for i, d in enumerate(flat):
        if i > 0 and flat[i - 1] == d:
            continue
        out.append(d)
    # drop non-leading zeros
    return "".join(d for i, d in enumerate(out) if d != "0" or i == 0)


# ---------------------------------------------------------------------------
# Double Metaphone (Philips 2000, C/R Users Journal; the commons-codec
# refinement used by DoubleMetaphoneFilter.java). Produces a primary and an
# alternate code, each capped at max_code_len (default 4).
# ---------------------------------------------------------------------------

_DM_VOWELS = "AEIOUY"
_DM_SILENT_START = ("GN", "KN", "PN", "WR", "PS")
_L_R_N_M_B_H_F_V_W_SPACE = ("L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER = (
    "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER",
)
_L_T_K_S_N_M_B_Z = ("L", "T", "K", "S", "N", "M", "B", "Z")


class _DmResult:
    __slots__ = ("primary", "alternate", "maxlen")

    def __init__(self, maxlen: int):
        self.primary: List[str] = []
        self.alternate: List[str] = []
        self.maxlen = maxlen

    def append(self, p: str, a: Optional[str] = None) -> None:
        self.append_primary(p)
        self.append_alternate(p if a is None else a)

    def append_primary(self, s: str) -> None:
        for c in s:
            if len(self.primary) < self.maxlen:
                self.primary.append(c)

    def append_alternate(self, s: str) -> None:
        for c in s:
            if len(self.alternate) < self.maxlen:
                self.alternate.append(c)

    @property
    def complete(self) -> bool:
        return len(self.primary) >= self.maxlen and len(self.alternate) >= self.maxlen


def _dm_char(v: str, i: int) -> str:
    return v[i] if 0 <= i < len(v) else "\0"


def _dm_vowel(c: str) -> bool:
    return c in _DM_VOWELS


def _dm_in(v: str, start: int, length: int, *criteria: str) -> bool:
    if start < 0 or start + length > len(v):
        return False
    return v[start : start + length] in criteria


def double_metaphone(text: str, max_code_len: int = 4, alternate: bool = False) -> str:
    """Double Metaphone primary (or alternate) code."""
    value = text.strip().upper() if text else ""
    if not value:
        return ""
    slavo = (
        "W" in value or "K" in value or "CZ" in value or "WITZ" in value
    )
    index = 1 if value[:2] in _DM_SILENT_START else 0
    r = _DmResult(max_code_len)
    n = len(value)

    while not r.complete and index < n:
        c = value[index]
        if c in "AEIOUY":
            if index == 0:
                r.append("A")
            index += 1
        elif c == "B":
            r.append("P")
            index += 2 if _dm_char(value, index + 1) == "B" else 1
        elif c == "Ç":  # C-cedilla
            r.append("S")
            index += 1
        elif c == "C":
            index = _dm_handle_c(value, r, index)
        elif c == "D":
            if _dm_in(value, index, 2, "DG"):
                if _dm_in(value, index + 2, 1, "I", "E", "Y"):
                    r.append("J")  # "edge"
                    index += 3
                else:
                    r.append("TK")  # "Edgar"
                    index += 2
            elif _dm_in(value, index, 2, "DT", "DD"):
                r.append("T")
                index += 2
            else:
                r.append("T")
                index += 1
        elif c == "F":
            r.append("F")
            index += 2 if _dm_char(value, index + 1) == "F" else 1
        elif c == "G":
            index = _dm_handle_g(value, r, index, slavo)
        elif c == "H":
            if (index == 0 or _dm_vowel(_dm_char(value, index - 1))) and _dm_vowel(
                _dm_char(value, index + 1)
            ):
                r.append("H")
                index += 2
            else:
                index += 1
        elif c == "J":
            index = _dm_handle_j(value, r, index, slavo)
        elif c == "K":
            r.append("K")
            index += 2 if _dm_char(value, index + 1) == "K" else 1
        elif c == "L":
            if _dm_char(value, index + 1) == "L":
                if _dm_condition_l0(value, index):
                    r.append_primary("L")  # Spanish "cabrillo": alt drops L
                else:
                    r.append("L")
                index += 2
            else:
                r.append("L")
                index += 1
        elif c == "M":
            r.append("M")
            if _dm_char(value, index + 1) == "M" or (
                _dm_in(value, index - 1, 3, "UMB")
                and (index + 1 == n - 1 or _dm_in(value, index + 2, 2, "ER"))
            ):
                index += 2
            else:
                index += 1
        elif c == "N":
            r.append("N")
            index += 2 if _dm_char(value, index + 1) == "N" else 1
        elif c == "Ñ":  # N-tilde
            r.append("N")
            index += 1
        elif c == "P":
            if _dm_char(value, index + 1) == "H":
                r.append("F")
                index += 2
            else:
                r.append("P")
                index += 2 if _dm_in(value, index + 1, 1, "P", "B") else 1
        elif c == "Q":
            r.append("K")
            index += 2 if _dm_char(value, index + 1) == "Q" else 1
        elif c == "R":
            if (
                index == n - 1
                and not slavo
                and _dm_in(value, index - 2, 2, "IE")
                and not _dm_in(value, index - 4, 2, "ME", "MA")
            ):
                r.append_alternate("R")  # French "rogier"
            else:
                r.append("R")
            index += 2 if _dm_char(value, index + 1) == "R" else 1
        elif c == "S":
            index = _dm_handle_s(value, r, index, slavo)
        elif c == "T":
            index = _dm_handle_t(value, r, index)
        elif c == "V":
            r.append("F")
            index += 2 if _dm_char(value, index + 1) == "V" else 1
        elif c == "W":
            index = _dm_handle_w(value, r, index)
        elif c == "X":
            if index == 0:
                r.append("S")
                index += 1
            else:
                if not (
                    index == n - 1
                    and (
                        _dm_in(value, index - 3, 3, "IAU", "EAU")
                        or _dm_in(value, index - 2, 2, "AU", "OU")
                    )
                ):
                    r.append("KS")  # French "breaux" keeps silent
                index += 2 if _dm_in(value, index + 1, 1, "C", "X") else 1
        elif c == "Z":
            if _dm_char(value, index + 1) == "H":
                r.append("J")  # pinyin "zhao"
                index += 2
            else:
                if _dm_in(value, index + 1, 2, "ZO", "ZI", "ZA") or (
                    slavo and index > 0 and _dm_char(value, index - 1) != "T"
                ):
                    r.append("S", "TS")
                else:
                    r.append("S")
                index += 2 if _dm_char(value, index + 1) == "Z" else 1
        else:
            index += 1

    return "".join((r.alternate if alternate else r.primary)[:max_code_len])


def _dm_condition_c0(value: str, index: int) -> bool:
    """Germanic '-ACH-' ("bacher") but not "bacchus"."""
    if _dm_in(value, index, 4, "CHIA"):
        return True
    if index <= 1:
        return False
    if _dm_vowel(_dm_char(value, index - 2)):
        return False
    if not _dm_in(value, index - 1, 3, "ACH"):
        return False
    c = _dm_char(value, index + 2)
    return (c != "I" and c != "E") or _dm_in(value, index - 2, 6, "BACHER", "MACHER")


def _dm_handle_c(value: str, r: _DmResult, index: int) -> int:
    if _dm_condition_c0(value, index):
        r.append("K")
        return index + 2
    if index == 0 and _dm_in(value, index, 6, "CAESAR"):
        r.append("S")
        return index + 2
    if _dm_in(value, index, 2, "CH"):
        return _dm_handle_ch(value, r, index)
    if _dm_in(value, index, 2, "CZ") and not _dm_in(value, index - 2, 4, "WICZ"):
        r.append("S", "X")  # "Czerny"
        return index + 2
    if _dm_in(value, index + 1, 3, "CIA"):
        r.append("X")  # "focaccia"
        return index + 3
    if _dm_in(value, index, 2, "CC") and not (
        index == 1 and _dm_char(value, 0) == "M"
    ):
        return _dm_handle_cc(value, r, index)  # double C, not "McClellan"
    if _dm_in(value, index, 2, "CK", "CG", "CQ"):
        r.append("K")
        return index + 2
    if _dm_in(value, index, 2, "CI", "CE", "CY"):
        if _dm_in(value, index, 3, "CIO", "CIE", "CIA"):
            r.append("S", "X")  # Italian vs. English
        else:
            r.append("S")
        return index + 2
    r.append("K")
    if _dm_in(value, index + 1, 2, " C", " Q", " G"):
        return index + 3  # "Mac Caffrey", "Mac Gregor"
    if _dm_in(value, index + 1, 1, "C", "K", "Q") and not _dm_in(
        value, index + 1, 2, "CE", "CI"
    ):
        return index + 2
    return index + 1


def _dm_handle_cc(value: str, r: _DmResult, index: int) -> int:
    if _dm_in(value, index + 2, 1, "I", "E", "H") and not _dm_in(
        value, index + 2, 2, "HU"
    ):
        if (index == 1 and _dm_char(value, index - 1) == "A") or _dm_in(
            value, index - 1, 5, "UCCEE", "UCCES"
        ):
            r.append("KS")  # "accident", "accede", "succeed"
        else:
            r.append("X")  # "bacci", "bertucci"
        return index + 3
    r.append("K")  # Pierce's rule
    return index + 2


def _dm_condition_ch0(value: str, index: int) -> bool:
    """Greek roots: "chemistry", "chorus"."""
    if index != 0:
        return False
    if not _dm_in(value, index + 1, 5, "HARAC", "HARIS") and not _dm_in(
        value, index + 1, 3, "HOR", "HYM", "HIA", "HEM"
    ):
        return False
    return not _dm_in(value, 0, 5, "CHORE")


def _dm_condition_ch1(value: str, index: int) -> bool:
    """Germanic or 'architect' (but not 'arch')."""
    return (
        _dm_in(value, 0, 4, "VAN ", "VON ")
        or _dm_in(value, 0, 3, "SCH")
        or _dm_in(value, index - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
        or _dm_in(value, index + 2, 1, "T", "S")
        or (
            (_dm_in(value, index - 1, 1, "A", "O", "U", "E") or index == 0)
            and (
                _dm_in(value, index + 2, 1, *_L_R_N_M_B_H_F_V_W_SPACE)
                or index + 1 == len(value) - 1
            )
        )
    )


def _dm_handle_ch(value: str, r: _DmResult, index: int) -> int:
    if index > 0 and _dm_in(value, index, 4, "CHAE"):
        r.append("K", "X")  # "Michael"
        return index + 2
    if _dm_condition_ch0(value, index):
        r.append("K")
        return index + 2
    if _dm_condition_ch1(value, index):
        r.append("K")
        return index + 2
    if index > 0:
        if _dm_in(value, 0, 2, "MC"):
            r.append("K")
        else:
            r.append("X", "K")
    else:
        r.append("X")
    return index + 2


def _dm_handle_g(value: str, r: _DmResult, index: int, slavo: bool) -> int:
    nxt = _dm_char(value, index + 1)
    if nxt == "H":
        return _dm_handle_gh(value, r, index)
    if nxt == "N":
        if index == 1 and _dm_vowel(_dm_char(value, 0)) and not slavo:
            r.append("KN", "N")
        elif not _dm_in(value, index + 2, 2, "EY") and nxt != "Y" and not slavo:
            r.append("N", "KN")
        else:
            r.append("KN")
        return index + 2
    if _dm_in(value, index + 1, 2, "LI") and not slavo:
        r.append("KL", "L")
        return index + 2
    if index == 0 and (
        nxt == "Y" or _dm_in(value, index + 1, 2, *_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER)
    ):
        r.append("K", "J")  # -ges-, -gep- at start
        return index + 2
    if (
        (_dm_in(value, index + 1, 2, "ER") or nxt == "Y")
        and not _dm_in(value, 0, 6, "DANGER", "RANGER", "MANGER")
        and not _dm_in(value, index - 1, 1, "E", "I")
        and not _dm_in(value, index - 1, 3, "RGY", "OGY")
    ):
        r.append("K", "J")  # -ger-, -gy-
        return index + 2
    if _dm_in(value, index + 1, 1, "E", "I", "Y") or _dm_in(
        value, index - 1, 4, "AGGI", "OGGI"
    ):
        if (
            _dm_in(value, 0, 4, "VAN ", "VON ")
            or _dm_in(value, 0, 3, "SCH")
            or _dm_in(value, index + 1, 2, "ET")
        ):
            r.append("K")  # obvious germanic
        elif _dm_in(value, index + 1, 3, "IER"):
            r.append("J")
        else:
            r.append("J", "K")  # Italian "biaggi"
        return index + 2
    if nxt == "G":
        r.append("K")
        return index + 2
    r.append("K")
    return index + 1


def _dm_handle_gh(value: str, r: _DmResult, index: int) -> int:
    if index > 0 and not _dm_vowel(_dm_char(value, index - 1)):
        r.append("K")
        return index + 2
    if index == 0:
        if _dm_char(value, index + 2) == "I":
            r.append("J")
        else:
            r.append("K")
        return index + 2
    if (
        (index > 1 and _dm_in(value, index - 2, 1, "B", "H", "D"))
        or (index > 2 and _dm_in(value, index - 3, 1, "B", "H", "D"))
        or (index > 3 and _dm_in(value, index - 4, 1, "B", "H"))
    ):
        return index + 2  # Parker's rule: "hugh"
    if (
        index > 2
        and _dm_char(value, index - 1) == "U"
        and _dm_in(value, index - 3, 1, "C", "G", "L", "R", "T")
    ):
        r.append("F")  # "laugh", "cough", "rough", "tough"
    elif index > 0 and _dm_char(value, index - 1) != "I":
        r.append("K")
    return index + 2


def _dm_handle_j(value: str, r: _DmResult, index: int, slavo: bool) -> int:
    if _dm_in(value, index, 4, "JOSE") or _dm_in(value, 0, 4, "SAN "):
        # obvious Spanish: "Jose", "San Jacinto"
        if (
            index == 0
            and _dm_char(value, index + 4) == " "
            or len(value) == 4
            or _dm_in(value, 0, 4, "SAN ")
        ):
            r.append("H")
        else:
            r.append("J", "H")
        return index + 1
    if index == 0:
        r.append("J", "A")  # Yankelovich / Jankelowicz
    elif (
        _dm_vowel(_dm_char(value, index - 1))
        and not slavo
        and _dm_char(value, index + 1) in "AO"
    ):
        r.append("J", "H")  # Spanish "bajador"
    elif index == len(value) - 1:
        r.append("J", " ")
    elif not _dm_in(value, index + 1, 1, *_L_T_K_S_N_M_B_Z) and not _dm_in(
        value, index - 1, 1, "S", "K", "L"
    ):
        r.append("J")
    return index + 2 if _dm_char(value, index + 1) == "J" else index + 1


def _dm_condition_l0(value: str, index: int) -> bool:
    if index == len(value) - 3 and _dm_in(value, index - 1, 4, "ILLO", "ILLA", "ALLE"):
        return True  # Spanish "cabrillo", "gallegos"
    return (
        _dm_in(value, len(value) - 2, 2, "AS", "OS")
        or _dm_in(value, len(value) - 1, 1, "A", "O")
    ) and _dm_in(value, index - 1, 4, "ALLE")


def _dm_handle_s(value: str, r: _DmResult, index: int, slavo: bool) -> int:
    if _dm_in(value, index - 1, 3, "ISL", "YSL"):
        return index + 1  # "island", "carlisle": silent S
    if index == 0 and _dm_in(value, index, 5, "SUGAR"):
        r.append("X", "S")
        return index + 1
    if _dm_in(value, index, 2, "SH"):
        if _dm_in(value, index + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
            r.append("S")  # germanic
        else:
            r.append("X")
        return index + 2
    if _dm_in(value, index, 3, "SIO", "SIA") or _dm_in(value, index, 4, "SIAN"):
        if slavo:
            r.append("S")
        else:
            r.append("S", "X")
        return index + 3
    if (index == 0 and _dm_in(value, index + 1, 1, "M", "N", "L", "W")) or _dm_in(
        value, index + 1, 1, "Z"
    ):
        r.append("S", "X")  # "smith" matches "schmidt"
        return index + 2 if _dm_in(value, index + 1, 1, "Z") else index + 1
    if _dm_in(value, index, 2, "SC"):
        return _dm_handle_sc(value, r, index)
    if index == len(value) - 1 and _dm_in(value, index - 2, 2, "AI", "OI"):
        r.append_alternate("S")  # French "resnais", "artois"
    else:
        r.append("S")
    return index + 2 if _dm_in(value, index + 1, 1, "S", "Z") else index + 1


def _dm_handle_sc(value: str, r: _DmResult, index: int) -> int:
    if _dm_char(value, index + 2) == "H":
        # Schlesinger's rule
        if _dm_in(value, index + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
            if _dm_in(value, index + 3, 2, "ER", "EN"):
                r.append("X", "SK")  # "schermerhorn", "schenker"
            else:
                r.append("SK")  # Dutch: "school", "schooner"
        else:
            if (
                index == 0
                and not _dm_vowel(_dm_char(value, 3))
                and _dm_char(value, 3) != "W"
            ):
                r.append("X", "S")
            else:
                r.append("X")
    elif _dm_in(value, index + 2, 1, "I", "E", "Y"):
        r.append("S")
    else:
        r.append("SK")
    return index + 3


def _dm_handle_t(value: str, r: _DmResult, index: int) -> int:
    if _dm_in(value, index, 4, "TION"):
        r.append("X")
        return index + 3
    if _dm_in(value, index, 3, "TIA", "TCH"):
        r.append("X")
        return index + 3
    if _dm_in(value, index, 2, "TH") or _dm_in(value, index, 3, "TTH"):
        if (
            _dm_in(value, index + 2, 2, "OM", "AM")
            or _dm_in(value, 0, 4, "VAN ", "VON ")
            or _dm_in(value, 0, 3, "SCH")
        ):
            r.append("T")  # "thomas", "thames", germanic
        else:
            r.append("0", "T")
        return index + 2
    r.append("T")
    return index + 2 if _dm_in(value, index + 1, 1, "T", "D") else index + 1


def _dm_handle_w(value: str, r: _DmResult, index: int) -> int:
    if _dm_in(value, index, 2, "WR"):
        r.append("R")
        return index + 2
    if index == 0 and (
        _dm_vowel(_dm_char(value, index + 1)) or _dm_in(value, index, 2, "WH")
    ):
        if _dm_vowel(_dm_char(value, index + 1)):
            r.append("A", "F")  # Wasserman matches Vasserman
        else:
            r.append("A")  # Uomo matches Womo
        return index + 1
    if (
        (index == len(value) - 1 and _dm_vowel(_dm_char(value, index - 1)))
        or _dm_in(value, index - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
        or _dm_in(value, 0, 3, "SCH")
    ):
        r.append_alternate("F")  # Arnow matches Arnoff
        return index + 1
    if _dm_in(value, index, 4, "WICZ", "WITZ"):
        r.append("TS", "FX")  # Polish "filipowicz"
        return index + 4
    return index + 1


# ---------------------------------------------------------------------------
# Filter plumbing (PhoneticFilter / DoubleMetaphoneFilter analog)
# ---------------------------------------------------------------------------

#: PhoneticFilterFactory registry names (PhoneticFilterFactory.java:90-96)
ENCODERS = {
    "metaphone": lambda t, n: metaphone(t, n),
    "doublemetaphone": lambda t, n: double_metaphone(t, n),
    "soundex": lambda t, n: soundex(t),
    "refinedsoundex": lambda t, n: refined_soundex(t),
    "caverphone": lambda t, n: caverphone2(t),
    "colognephonetic": lambda t, n: cologne_phonetic(t),
    "nysiis": lambda t, n: nysiis(t),
    # multi-code branching encoder (DaitchMokotoffSoundexFilter.java);
    # dispatched specially in PhoneticConfig.transform
    "daitchmokotoff": None,
}


@dataclass(frozen=True)
class PhoneticConfig:
    """IndexConfig.phonetic: phonetic token expansion at index time.

    - ``inject=True``: encoded form(s) join the token at its position
      (posIncr=0 overlap) — PhoneticFilter inject mode.
    - ``inject=False``: the encoding REPLACES the token (the original is
      dropped); for doublemetaphone the alternate still joins at posIncr=0
      (DoubleMetaphoneFilter.java:45-76).
    Encodings that are empty or equal to the token leave it untouched.
    """

    encoder: str = "metaphone"
    inject: bool = True
    max_code_len: int = 4
    _memo: dict = field(default_factory=dict, compare=False, repr=False, hash=False)

    def __post_init__(self):
        if self.encoder not in ENCODERS:
            raise ValueError(
                f"unknown phonetic encoder {self.encoder!r}; "
                f"one of {sorted(ENCODERS)}"
            )

    def transform(self, term: str) -> Tuple[str, List[str]]:
        """(replacement, extras-at-same-position) for one token."""
        got = self._memo.get(term)
        if got is not None:
            return got
        extras: List[str] = []
        replacement = term
        if self.encoder == "daitchmokotoff":
            codes = [c for c in daitch_mokotoff(term) if c != term]
            if codes:
                if self.inject:
                    extras.extend(codes)
                else:
                    replacement = codes[0]
                    extras.extend(codes[1:])
            out = (replacement, extras)
            self._memo[term] = out
            return out
        try:
            code = ENCODERS[self.encoder](term, self.max_code_len)
        except Exception:
            code = ""
        if code and code != term:
            if self.encoder == "doublemetaphone":
                alt = double_metaphone(term, self.max_code_len, alternate=True)
                if self.inject:
                    extras.append(code)
                    if alt and alt != code:
                        extras.append(alt)
                else:
                    replacement = code
                    if alt and alt != code:
                        extras.append(alt)
            elif self.inject:
                extras.append(code)
            else:
                replacement = code
        out = (replacement, extras)
        self._memo[term] = out
        return out

    def to_json(self) -> dict:
        return {
            "encoder": self.encoder,
            "inject": self.inject,
            "max_code_len": self.max_code_len,
        }


def phonetic_from_json(d: Optional[dict]) -> Optional[PhoneticConfig]:
    return PhoneticConfig(**d) if d else None


# ---------------------------------------------------------------------------
# Daitch-Mokotoff Soundex (Daitch & Mokotoff 1985, Avotaynu; the published
# coding chart commons-codec ships as dmrules.txt and
# DaitchMokotoffSoundexFilter.java consumes). Ambiguous sounds branch:
# a word yields a SET of 6-digit codes.
# ---------------------------------------------------------------------------

#: pattern -> (at_start, before_vowel, other); '|' separates branch
#: alternatives, '' = not coded. Ordered longest-first per initial letter.
_DM_SOUNDEX_RULES = {
    "a": [("ai", "0", "1", ""), ("aj", "0", "1", ""), ("ay", "0", "1", ""),
          ("au", "0", "7", ""), ("a", "0", "", "")],
    "b": [("b", "7", "7", "7")],
    "c": [("chs", "5", "54", "54"), ("csz", "4", "4", "4"),
          ("czs", "4", "4", "4"), ("ch", "5|4", "5|4", "5|4"),
          ("ck", "5|45", "5|45", "5|45"), ("cz", "4", "4", "4"),
          ("cs", "4", "4", "4"), ("c", "5|4", "5|4", "5|4")],
    "d": [("drz", "4", "4", "4"), ("drs", "4", "4", "4"),
          ("dsh", "4", "4", "4"), ("dsz", "4", "4", "4"),
          ("dzh", "4", "4", "4"), ("dzs", "4", "4", "4"),
          ("ds", "4", "4", "4"), ("dz", "4", "4", "4"),
          ("dt", "3", "3", "3"), ("d", "3", "3", "3")],
    "e": [("ei", "0", "1", ""), ("ej", "0", "1", ""), ("ey", "0", "1", ""),
          ("eu", "1", "1", ""), ("e", "0", "", "")],
    "f": [("fb", "7", "7", "7"), ("f", "7", "7", "7")],
    "g": [("g", "5", "5", "5")],
    "h": [("h", "5", "5", "")],
    "i": [("ia", "1", "", ""), ("ie", "1", "", ""), ("io", "1", "", ""),
          ("iu", "1", "", ""), ("i", "0", "", "")],
    "j": [("j", "1|4", "|4", "|4")],
    "k": [("ks", "5", "54", "54"), ("k", "5", "5", "5")],
    "l": [("l", "8", "8", "8")],
    "m": [("mn", "66", "66", "66"), ("m", "6", "6", "6")],
    "n": [("nm", "66", "66", "66"), ("n", "6", "6", "6")],
    "o": [("oi", "0", "1", ""), ("oj", "0", "1", ""), ("oy", "0", "1", ""),
          ("o", "0", "", "")],
    "p": [("pf", "7", "7", "7"), ("ph", "7", "7", "7"), ("p", "7", "7", "7")],
    "q": [("q", "5", "5", "5")],
    "r": [("rz", "94|4", "94|4", "94|4"), ("rs", "94|4", "94|4", "94|4"),
          ("r", "9", "9", "9")],
    "s": [("schtsch", "2", "4", "4"), ("schtsh", "2", "4", "4"),
          ("schtch", "2", "4", "4"), ("shtch", "2", "4", "4"),
          ("shtsh", "2", "4", "4"), ("stsch", "2", "4", "4"),
          ("shch", "2", "4", "4"), ("strz", "2", "4", "4"),
          ("strs", "2", "4", "4"), ("stsh", "2", "4", "4"),
          ("szcz", "2", "4", "4"), ("szcs", "2", "4", "4"),
          ("scht", "2", "43", "43"), ("schd", "2", "43", "43"),
          ("stch", "2", "4", "4"), ("sch", "4", "4", "4"),
          ("sht", "2", "43", "43"), ("szt", "2", "43", "43"),
          ("shd", "2", "43", "43"), ("szd", "2", "43", "43"),
          ("sh", "4", "4", "4"), ("st", "2", "43", "43"),
          ("sz", "4", "4", "4"), ("sc", "2", "4", "4"),
          ("sd", "2", "43", "43"), ("s", "4", "4", "4")],
    "t": [("ttsch", "4", "4", "4"), ("ttch", "4", "4", "4"),
          ("tsch", "4", "4", "4"), ("ttsz", "4", "4", "4"),
          ("tch", "4", "4", "4"), ("trz", "4", "4", "4"),
          ("trs", "4", "4", "4"), ("tsh", "4", "4", "4"),
          ("tts", "4", "4", "4"), ("ttz", "4", "4", "4"),
          ("tzs", "4", "4", "4"), ("tsz", "4", "4", "4"),
          ("th", "3", "3", "3"), ("ts", "4", "4", "4"),
          ("tc", "4", "4", "4"), ("tz", "4", "4", "4"),
          ("t", "3", "3", "3")],
    "u": [("ui", "0", "1", ""), ("uj", "0", "1", ""), ("uy", "0", "1", ""),
          ("ue", "0", "", ""), ("u", "0", "", "")],
    "v": [("v", "7", "7", "7")],
    "w": [("w", "7", "7", "7")],
    "x": [("x", "5", "54", "54")],
    "y": [("y", "1", "", "")],
    "z": [("zhdzh", "2", "4", "4"), ("zdzh", "2", "4", "4"),
          ("zsch", "2", "4", "4"), ("zdz", "2", "4", "4"),
          ("zhd", "2", "43", "43"), ("zsh", "4", "4", "4"),
          ("zd", "2", "43", "43"), ("zh", "4", "4", "4"),
          ("zs", "4", "4", "4"), ("z", "4", "4", "4")],
}

_DM_SOUNDEX_LEN = 6
_DM_SOUNDEX_VOWELS = "aeiou"

_DM_SOUNDEX_FOLD = {
    "ß": "s", "à": "a", "á": "a", "â": "a", "ã": "a", "ä": "a", "å": "a",
    "æ": "a", "ç": "c", "è": "e", "é": "e", "ê": "e", "ë": "e", "ì": "i",
    "í": "i", "î": "i", "ï": "i", "ð": "d", "ñ": "n", "ò": "o", "ó": "o",
    "ô": "o", "õ": "o", "ö": "o", "ø": "o", "ù": "u", "ú": "u", "û": "u",
    "ý": "y", "ÿ": "y",
}


def daitch_mokotoff(text: str) -> List[str]:
    """All Daitch-Mokotoff codes for `text` (branching on ambiguous
    sounds), each 6 digits zero-padded, in branch-creation order. Adjacent
    identical codes collapse unless the letters are an m/n pair."""
    s = "".join(
        _DM_SOUNDEX_FOLD.get(c, c)
        for c in text.lower()
        if _DM_SOUNDEX_FOLD.get(c, c).isalpha() or c.isspace()
    )
    s = "".join(c for c in s if not c.isspace())
    if not s:
        return []
    # branches: list of (code_so_far, last_replacement); order preserved
    branches: List[Tuple[str, Optional[str]]] = [("", None)]
    index = 0
    last_char = ""
    n = len(s)
    while index < n:
        ch = s[index]
        rules = _DM_SOUNDEX_RULES.get(ch)
        if rules is None:
            index += 1
            last_char = ch
            continue
        context = s[index:]
        for pat, at_start, before_vowel, other in rules:
            if context.startswith(pat):
                if index == 0:
                    repl = at_start
                elif (
                    index + len(pat) < n
                    and s[index + len(pat)] in _DM_SOUNDEX_VOWELS
                ):
                    repl = before_vowel
                else:
                    repl = other
                alternatives = repl.split("|")
                # mn / nm pairs force the duplicate append (coded 66)
                force = (last_char == "m" and ch == "n") or (
                    last_char == "n" and ch == "m"
                )
                nxt: List[Tuple[str, str]] = []
                seen = set()
                for code, last_repl in branches:
                    for alt in alternatives:
                        # duplicate rule: skip when the running code already
                        # ends with this replacement — UNLESS an m/n pair
                        # forces it, or a not-coded letter (last_repl "")
                        # sat between (a vowel resets the suppression)
                        if force or last_repl is None or not last_repl.endswith(alt):
                            new_code = (code + alt)[:_DM_SOUNDEX_LEN]
                        else:
                            new_code = code
                        if new_code not in seen:
                            seen.add(new_code)
                            nxt.append((new_code, alt))
                branches = nxt
                index += len(pat)
                break
        else:
            index += 1
        last_char = ch
    out: List[str] = []
    for code, _ in branches:
        padded = (code + "000000")[:_DM_SOUNDEX_LEN]
        if padded not in out:
            out.append(padded)
    return out
