"""RSLP stemmer engine — analysis/pt/RSLPStemmerBase.java re-expressed.

Parses the published RSLP step-description resources (the reference's
gl/galician.rslp and pt/portuguese.rslp rule tables, embedded verbatim as
data under resources/) into Step objects, and implements the Galician and
Portuguese-RSLP stem drivers (analysis/gl/GalicianStemmer.java:44-76,
analysis/pt/PortugueseStemmer.java:39-76).

Rule semantics: a rule fires if the remaining stem is long enough and no
exception matches; type-0 steps use suffix exceptions, type-1 whole-word
exceptions; the first matching rule in a step wins.
"""

import os
import re
from typing import Dict, List, Optional, Tuple

_HEADER = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*(0|1),\s*\{(.*)\},\s*$')
_STRIP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+)\s*\}\s*(,|(\}\s*;))$')
_REP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)"\}\s*(,|(\}\s*;))$')
_EXC = re.compile(
    r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)",\s*\{(.*)\}\s*\}\s*(,|(\}\s*;))$'
)


class Rule:
    __slots__ = ("suffix", "min", "replacement", "exc_words", "exc_suffixes")

    def __init__(self, suffix: str, min_: int, replacement: str,
                 exc_words=None, exc_suffixes=None):
        self.suffix = suffix
        self.min = min_
        self.replacement = replacement
        self.exc_words = frozenset(exc_words) if exc_words else None
        self.exc_suffixes = tuple(exc_suffixes) if exc_suffixes else None

    def matches(self, w: str) -> bool:
        if len(w) - len(self.suffix) < self.min or not w.endswith(self.suffix):
            return False
        if self.exc_words is not None and w in self.exc_words:
            return False
        if self.exc_suffixes is not None and w.endswith(self.exc_suffixes):
            return False
        return True

    def replace(self, w: str) -> str:
        return w[: len(w) - len(self.suffix)] + self.replacement


class Step:
    __slots__ = ("name", "rules", "min", "suffixes")

    def __init__(self, name: str, rules: List[Rule], min_: int,
                 suffixes: Optional[List[str]]):
        self.name = name
        self.rules = rules
        if min_ == 0:
            min_ = min(r.min + len(r.suffix) for r in rules)
        self.min = min_
        self.suffixes = tuple(suffixes) if suffixes else None

    def apply(self, w: str) -> str:
        if len(w) < self.min:
            return w
        if self.suffixes is not None and not w.endswith(self.suffixes):
            return w
        for r in self.rules:
            if r.matches(w):
                return r.replace(w)
        return w


def _parse_list(s: str) -> Optional[List[str]]:
    if not s:
        return None
    return [p.strip()[1:-1] for p in s.split(",")]


def parse_rslp(path: str) -> Dict[str, Step]:
    steps: Dict[str, Step] = {}
    lines = [
        ln.strip() for ln in open(path, encoding="utf-8")
        if ln.strip() and not ln.strip().startswith("#")
    ]
    i = 0
    while i < len(lines):
        m = _HEADER.match(lines[i])
        if not m:
            raise ValueError(f"bad step header at line {i}: {lines[i]}")
        name, min_, typ = m.group(1), int(m.group(2)), int(m.group(3))
        suffixes = _parse_list(m.group(4))
        rules: List[Rule] = []
        i += 1
        while True:
            ln = lines[i]
            mm = _STRIP.match(ln)
            if mm:
                rules.append(Rule(mm.group(1), int(mm.group(2)), ""))
            else:
                mm = _REP.match(ln)
                if mm:
                    rules.append(Rule(mm.group(1), int(mm.group(2)),
                                      mm.group(3)))
                else:
                    mm = _EXC.match(ln)
                    if not mm:
                        raise ValueError(f"bad rule at line {i}: {ln}")
                    exc = _parse_list(mm.group(4))
                    if typ == 0:
                        rules.append(Rule(mm.group(1), int(mm.group(2)),
                                          mm.group(3), exc_suffixes=exc))
                    else:
                        rules.append(Rule(mm.group(1), int(mm.group(2)),
                                          mm.group(3), exc_words=exc))
            i += 1
            if ln.endswith(";"):
                break
        steps[name] = Step(name, rules, min_, suffixes)
    return steps


def _steps_from_data(rows) -> Dict[str, Step]:
    steps: Dict[str, Step] = {}
    for name, min_, suffixes, rules in rows:
        rs = [Rule(suf, m, rep, exc_words=ew, exc_suffixes=es)
              for suf, m, rep, ew, es in rules]
        st = Step.__new__(Step)
        st.name = name
        st.rules = rs
        st.min = min_
        st.suffixes = tuple(suffixes) if suffixes else None
        steps[name] = st
    return steps


_GL: Optional[Dict[str, Step]] = None
_PT: Optional[Dict[str, Step]] = None

_GL_ACCENTS = str.maketrans(
    {"á": "a", "é": "e", "ê": "e", "í": "i", "ó": "o", "ú": "u"}
)
_PT_ACCENTS = str.maketrans({
    "à": "a", "á": "a", "â": "a", "ã": "a", "ä": "a", "å": "a",
    "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ì": "i", "í": "i", "î": "i", "ï": "i",
    "ò": "o", "ó": "o", "ô": "o", "õ": "o", "ö": "o",
    "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ç": "c", "ñ": "n",
})


def galician_stem(w: str) -> str:
    """GalicianStemmer.stem (analysis/gl/GalicianStemmer.java:44-76)."""
    global _GL
    if _GL is None:
        from .rslpdata import GL_STEPS

        _GL = _steps_from_data(GL_STEPS)
    st = _GL
    w = st["Plural"].apply(w)
    w = st["Unification"].apply(w)
    w = st["Adverb"].apply(w)
    while True:
        old = w
        w = st["Augmentative"].apply(w)
        if w == old:
            break
    old = w
    w = st["Noun"].apply(w)
    if w == old:
        w = st["Verb"].apply(w)
    w = st["Vowel"].apply(w)
    return w.translate(_GL_ACCENTS)


def portuguese_rslp_stem(w: str) -> str:
    """PortugueseStemmer.stem (analysis/pt/PortugueseStemmer.java:39-76)."""
    global _PT
    if _PT is None:
        from .rslpdata import PT_STEPS

        _PT = _steps_from_data(PT_STEPS)
    st = _PT
    w = st["Plural"].apply(w)
    w = st["Adverb"].apply(w)
    w = st["Feminine"].apply(w)
    w = st["Augmentative"].apply(w)
    old = w
    w = st["Noun"].apply(w)
    if w == old:
        old = w
        w = st["Verb"].apply(w)
        if w == old:
            w = st["Vowel"].apply(w)
    return w.translate(_PT_ACCENTS)
