"""Hunspell dictionary stemming (analysis/hunspell/): .aff/.dic parsing +
the recursive affix-stripping stemmer.

Scope = the STEMMING core, the part an analysis chain runs per token
(`analysis/hunspell/HunspellStemFilter.java`): Dictionary.java:315-470
(directive parsing), :653-768 (PFX/SFX rules, flag aliases, strips,
conditions), :904-1200 (dic entries: escapes, morph data, hidden
title-cased twins), AffixCondition.java:17-183 (char-pattern conditions
split between strip and stem), ConvTable.java (ICONV/OCONV longest-match
rewriting), WordCase.java, and Stemmer.java:57-670 (case variation incl.
CHECKSHARPS ss/ß enumeration and the tr/az dotted-i regime, prefix and
suffix FST walks re-expressed as dict lookups over affix lengths,
cross-product recursion, circumfix/needaffix gating, st: stem
exceptions). Compounding, suggestion generation, and spell-check-only
flags (FORBIDDENWORD, KEEPCASE enforcement, ONLYINCOMPOUND contexts) are
out of scope exactly as in the reference Stemmer, which leaves them to
Hunspell.java — entries carrying them still parse and stem.

Everything here is driver-side pure Python over a loaded dictionary; the
Spark integration runs `Stemmer.unique_stems` per DISTINCT token inside
the same vectorized analysis UDF as every other language chain (no
per-row Python, no extra shuffle).

Validated against the reference's own unit fixtures (simple, condition,
escaped, flag long/num, fullstrip, ignore, needaffix, circumfix,
complexprefix, homonyms, morph aliases, ICONV/OCONV, Dutch IJ, Turkish
alternate casing, CHECKSHARPS, case-sensitive homonyms — see
tests/test_hunspell.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

FLAG_UNSET = "\x00"
# ONLYUPCASEFLAG in Hunspell (Dictionary.java:78)
HIDDEN_FLAG = chr(65511)

PREFIX = "PFX"
SUFFIX = "SFX"


# ---------------- flag parsing (Dictionary.java:1332-1430) ----------------


def _parse_flags_simple(raw: str) -> Tuple[str, ...]:
    return tuple(raw)


def _parse_flags_long(raw: str) -> Tuple[str, ...]:
    if len(raw) % 2 == 1:
        raise ValueError(f"Invalid flags (should be even number of characters): {raw}")
    out = []
    for i in range(0, len(raw), 2):
        f1, f2 = raw[i], raw[i + 1]
        if ord(f1) >= 256 or ord(f2) >= 256:
            raise ValueError(f"Invalid flags (LONG flags must be ASCII): {raw}")
        out.append(chr((ord(f1) << 8) | ord(f2)))
    return tuple(out)


def _parse_flags_num(raw: str) -> Tuple[str, ...]:
    out = []
    group = ""
    for i in range(len(raw) + 1):
        if i == len(raw) or raw[i] == ",":
            if group:  # empty groups ignored (danish dictionaries)
                out.append(chr(int(group)))
                group = ""
        elif raw[i].isdigit():
            group += raw[i]
    return tuple(out)


# ---------------- WordCase (WordCase.java) ----------------

UPPER, TITLE, LOWER, MIXED, NEUTRAL = "UPPER", "TITLE", "LOWER", "MIXED", "NEUTRAL"


def _char_case(c: str) -> str:
    if c.isupper():
        return "U"
    if c.islower() and c.upper() != c:
        return "L"
    return "N"


def word_case(word: str) -> str:
    start = _char_case(word[0])
    seen_upper = seen_lower = False
    for c in word[1:]:
        cc = _char_case(c)
        seen_upper = seen_upper or cc == "U"
        seen_lower = seen_lower or cc == "L"
        if seen_upper and seen_lower:
            break
    if seen_lower and seen_upper:
        return MIXED
    if start == "L":
        return MIXED if seen_upper else LOWER
    if start == "U":
        return UPPER if not seen_lower else TITLE
    return LOWER if seen_lower else (UPPER if seen_upper else NEUTRAL)


def _lower_char(c: str) -> str:
    low = c.lower()
    # Python's str.lower maps U+0130 to "i" + combining dot; Java's
    # char-level Character.toLowerCase maps it to plain "i"
    if len(low) != 1:
        return "i" if c == "İ" else c
    return low


def _upper_char(c: str) -> str:
    up = c.upper()
    return up if len(up) == 1 else c  # ß etc.: Java's 1:1 table keeps them


# ---------------- affix conditions (AffixCondition.java) ----------------


def _is_regexp(condition: str) -> bool:
    return "[" in condition or "." in condition or "-" in condition


def _char_patterns(condition: str) -> List[str]:
    """Split a hunspell condition into char patterns ([...] groups, dots,
    literals) — skipCharPattern/countCharPatterns."""
    out, i = [], 0
    while i < len(condition):
        if condition[i] == "[":
            j = condition.index("]", i + 1)
            out.append(condition[i : j + 1])
            i = j + 1
        else:
            out.append(condition[i])
            i += 1
    return out


def _pattern_to_re(patterns: Sequence[str]) -> "re.Pattern":
    parts = []
    for p in patterns:
        if p.startswith("["):
            body = p[1:-1]
            neg = body.startswith("^")
            if neg:
                body = body[1:]
            # unescape, then re-escape for Python (dash has no special
            # meaning in hunspell conditions — escapeDash)
            chars = []
            k = 0
            while k < len(body):
                if body[k] == "\\" and k + 1 < len(body):
                    chars.append(body[k + 1])
                    k += 2
                else:
                    chars.append(body[k])
                    k += 1
            cls = "".join(re.escape(c) for c in chars)
            parts.append(("[^" if neg else "[") + cls + "]")
        elif p == ".":
            parts.append(".")
        elif p.startswith("\\") and len(p) == 1:
            parts.append(re.escape(p))
        else:
            parts.append(re.escape(p[1] if p.startswith("\\") and len(p) > 1 else p))
    return re.compile("".join(parts) + r"\Z", re.DOTALL)


ALWAYS_TRUE = ("T", None, 0)
ALWAYS_FALSE = ("F", None, 0)


def compile_condition(kind: str, strip: str, condition: str):
    """AffixCondition.compile (:63-109): returns (mode, matcher, n_chars)
    where the matcher applies to the stem side only (the strip part is
    pre-verified at compile time)."""
    if condition == "." or (
        kind == PREFIX and strip.startswith(condition)
    ) or (kind == SUFFIX and strip.endswith(condition) and not _is_regexp(condition)):
        return ALWAYS_TRUE
    if not _is_regexp(condition):
        if kind == SUFFIX and condition.endswith(strip):
            stem_cond = condition[: len(condition) - len(strip)]
            return ("SUB", stem_cond, len(stem_cond))
        if kind == PREFIX and condition.startswith(strip):
            stem_cond = condition[len(strip):]
            return ("SUB", stem_cond, len(stem_cond))
        return ALWAYS_FALSE
    # tolerate unclosed [ like Hunspell does
    last = condition.rfind("[")
    if last >= 0 and condition.find("]", last + 1) < 0:
        condition += "]"
    try:
        pats = _char_patterns(condition)
    except ValueError:
        return ALWAYS_FALSE
    n = len(pats)
    if n <= len(strip):
        # the condition holds entirely inside the strip (":85-89")
        rx = _pattern_to_re(pats)
        target = strip[len(strip) - n :] if kind == PREFIX else strip[:n]
        return ALWAYS_TRUE if rx.match(target) else ALWAYS_FALSE
    if kind == PREFIX:
        strip_pats, stem_pats = pats[: len(strip)], pats[len(strip):]
        if strip and not _pattern_to_re(strip_pats).match(strip):
            return ALWAYS_FALSE
        return ("RE_PRE", _pattern_to_re(stem_pats), n - len(strip))
    strip_pats = pats[n - len(strip):]
    stem_pats = pats[: n - len(strip)]
    if strip and not _pattern_to_re(strip_pats).match(strip):
        return ALWAYS_FALSE
    return ("RE_SUF", _pattern_to_re(stem_pats), n - len(strip))


def condition_accepts(cond, kind: str, stem: str) -> bool:
    mode, matcher, n = cond
    if mode == "T":
        return True
    if mode == "F":
        return False
    if len(stem) < n:
        return False
    if mode == "SUB":
        return stem.endswith(matcher) if kind == SUFFIX else stem.startswith(matcher)
    if mode == "RE_SUF":
        return matcher.match(stem[len(stem) - n :]) is not None
    return matcher.match(stem[:n]) is not None


# ---------------- ICONV/OCONV (ConvTable.java) ----------------


class ConvTable:
    def __init__(self, mappings: Dict[str, str]) -> None:
        self.mappings = dict(mappings)
        self.first_chars = {k[0] for k in mappings}
        self.max_len = max((len(k) for k in mappings), default=0)

    def might_replace_char(self, c: str) -> bool:
        return c in self.first_chars

    def apply(self, text: str) -> str:
        out = []
        i = 0
        while i < len(text):
            if text[i] not in self.first_chars:
                out.append(text[i])
                i += 1
                continue
            best = None
            for j in range(min(len(text), i + self.max_len), i, -1):
                if text[i:j] in self.mappings:
                    best = j
                    break
            if best is None:
                out.append(text[i])
                i += 1
            else:
                out.append(self.mappings[text[i:best]])
                i = best
        return "".join(out)


# ---------------- Dictionary ----------------


@dataclass
class Affix:
    kind: str
    flag: str
    strip: str
    append: str
    append_flags: Tuple[str, ...]
    condition: tuple
    cross_product: bool
    index: int = 0

    def has_append_flag(self, flag: str) -> bool:
        return flag != FLAG_UNSET and flag in self.append_flags


@dataclass
class _Entry:
    flags: frozenset
    morph: Optional[str] = None


def _index_of_space_or_tab(text: str, start: int) -> int:
    p1, p2 = text.find("\t", start), text.find(" ", start)
    if p1 >= 0 and p2 >= 0:
        return min(p1, p2)
    return max(p1, p2)


def _morph_boundary(line: str) -> int:
    """morphBoundary (Dictionary.java:945-975): the entry/morph split."""
    end = _index_of_space_or_tab(line, 0)
    if end == -1:
        return len(line)
    while 0 <= end < len(line):
        if line[end] == "\t" or (
            end > 0
            and end + 3 < len(line)
            and line[end + 1].isalpha()
            and line[end + 2].isalpha()
            and line[end + 3] == ":"
        ):
            break
        end = _index_of_space_or_tab(line, end + 1)
    if end == -1:
        return len(line)
    return end


class HunspellDictionary:
    """Parsed .aff + .dic files (Dictionary.java), stemming subset."""

    def __init__(
        self, aff_text: str, dic_texts: Sequence[str], ignore_case: bool = False
    ) -> None:
        self.ignore_case = ignore_case
        self.complex_prefixes = False
        self.full_strip = False
        self.check_sharps = False
        self.alternate_casing = False
        self.circumfix = FLAG_UNSET
        self.keepcase = FLAG_UNSET
        self.needaffix = FLAG_UNSET
        self.onlyincompound = FLAG_UNSET
        self.forbiddenword = FLAG_UNSET
        self.ignore: Optional[frozenset] = None
        self.iconv: Optional[ConvTable] = None
        self.oconv: Optional[ConvTable] = None
        self._parse_flags: Callable[[str], Tuple[str, ...]] = _parse_flags_simple
        self._flag_aliases: Optional[List[str]] = None
        self._morph_aliases: Optional[List[str]] = None
        self.prefixes: Dict[str, List[Affix]] = {}
        self.suffixes: Dict[str, List[Affix]] = {}
        self.second_stage_prefix_flags: set = set()
        self.second_stage_suffix_flags: set = set()
        self.max_prefix_len = 0
        self.max_suffix_len = 0
        self.affixes: List[Affix] = []
        self.words: Dict[str, List[_Entry]] = {}

        self._read_affix(aff_text)
        for dic in dic_texts:
            self._read_dic(dic)

    # ----- .aff (Dictionary.java:315-470) -----

    def _parse_flag(self, raw: str) -> str:
        flags = self._parse_flags(raw)
        if len(flags) != 1:
            raise ValueError(f"expected only one flag, got: {raw}")
        return flags[0]

    def _read_affix(self, text: str) -> None:
        lines = text.split("\n")
        i = 0
        while i < len(lines):
            line = lines[i].lstrip("﻿").rstrip("\r")
            i += 1
            parts = line.split()
            if not parts or line.lstrip().startswith("#"):
                continue
            first = parts[0]
            if first == "FLAG":
                mode = parts[1]
                if mode == "long":
                    self._parse_flags = _parse_flags_long
                elif mode == "num":
                    self._parse_flags = _parse_flags_num
                elif mode == "UTF-8":
                    self._parse_flags = _parse_flags_simple
            elif first == "COMPLEXPREFIXES":
                self.complex_prefixes = True
            elif first == "FULLSTRIP":
                self.full_strip = True
            elif first == "CHECKSHARPS":
                self.check_sharps = True
            elif first == "CIRCUMFIX":
                self.circumfix = self._parse_flag(parts[1])
            elif first == "KEEPCASE":
                self.keepcase = self._parse_flag(parts[1])
            elif first == "NEEDAFFIX" or first == "PSEUDOROOT":
                self.needaffix = self._parse_flag(parts[1])
            elif first == "ONLYINCOMPOUND":
                self.onlyincompound = self._parse_flag(parts[1])
            elif first == "FORBIDDENWORD":
                self.forbiddenword = self._parse_flag(parts[1])
            elif first == "IGNORE":
                self.ignore = frozenset(parts[1])
            elif first in ("ICONV", "OCONV"):
                n = int(parts[1])
                mappings = {}
                for _ in range(n):
                    row = lines[i].split()
                    i += 1
                    mappings[row[1]] = row[2]
                table = ConvTable(mappings)
                if first == "ICONV":
                    self.iconv = table
                else:
                    self.oconv = table
            elif first == "LANG":
                lang = parts[1].split("_")[0].lower()
                self.alternate_casing = lang in ("tr", "az")
            elif first == "AF":
                if self._flag_aliases is None:
                    self._flag_aliases = []
                    self._af_count = int(parts[1])
                else:
                    self._flag_aliases.append(parts[1] if len(parts) > 1 else "")
            elif first == "AM":
                if self._morph_aliases is None:
                    self._morph_aliases = []
                else:
                    self._morph_aliases.append(
                        line.split(None, 1)[1].strip() if len(parts) > 1 else ""
                    )
            elif first in (PREFIX, SUFFIX) and len(parts) >= 4 and parts[2] in ("Y", "N"):
                i = self._parse_affix_rules(first, parts, lines, i)

    def _parse_affix_rules(self, kind, header, lines, i) -> int:
        """parseAffix (Dictionary.java:653-768)."""
        cross = header[2] == "Y"
        try:
            num = int(header[3])
        except ValueError:
            return i
        flag = self._parse_flag(header[1])
        cont_flags = (
            self.second_stage_prefix_flags
            if kind == PREFIX
            else self.second_stage_suffix_flags
        )
        table = self.prefixes if kind == PREFIX else self.suffixes
        for _ in range(num):
            rule = lines[i].rstrip("\r")
            i += 1
            args = rule.split()
            strip = "" if args[2] == "0" else args[2]
            affix_arg = args[3]
            append_flags: Tuple[str, ...] = ()
            sep = affix_arg.rfind("/")
            if sep != -1:
                flag_part = affix_arg[sep + 1 :]
                affix_arg = affix_arg[:sep]
                if self._flag_aliases:
                    flag_part = self._flag_aliases[int(flag_part) - 1]
                append_flags = self._parse_flags(flag_part)
                cont_flags.update(append_flags)
            if affix_arg == "0":
                affix_arg = ""
            condition = args[4] if len(args) > 4 else "."
            cond = compile_condition(
                PREFIX if kind == PREFIX else SUFFIX, strip, condition
            )
            if self._needs_input_cleaning_text(affix_arg):
                affix_arg = self.clean_input(affix_arg)
            aff = Affix(
                kind=kind,
                flag=flag,
                strip=strip,
                append=affix_arg,
                append_flags=append_flags,
                condition=cond,
                cross_product=cross,
                index=len(self.affixes),
            )
            self.affixes.append(aff)
            table.setdefault(affix_arg, []).append(aff)
            if kind == PREFIX:
                self.max_prefix_len = max(self.max_prefix_len, len(affix_arg))
            else:
                self.max_suffix_len = max(self.max_suffix_len, len(affix_arg))
        return i

    # ----- .dic (Dictionary.java:904-1200) -----

    @staticmethod
    def _unescape(entry: str) -> Tuple[str, str]:
        """word\\/flag escaping: return (word, flagPart) — unescapeEntry."""
        word = []
        i = 0
        flag_part = ""
        while i < len(entry):
            ch = entry[i]
            if ch == "\\" and i + 1 < len(entry):
                word.append(entry[i + 1])
                i += 2
            elif ch == "/" and i > 0:
                flag_part = entry[i + 1 :]
                break
            else:
                word.append(ch)
                i += 1
        return "".join(word), flag_part

    def _read_dic(self, text: str) -> None:
        lines = text.split("\n")
        start = 1  # first line is the (approximate) word count
        try:
            int(lines[0].strip())
        except (ValueError, IndexError):
            start = 0
        for raw in lines[start:]:
            line = raw.rstrip("\r")
            if not line.strip() or line.startswith("#"):
                continue
            # morph data boundary (morphBoundary, Dictionary.java:945-975):
            # a space splits the entry only before a tab or an `xx:` morph
            # field — dictionary words may themselves contain spaces
            end = _morph_boundary(line)
            entry_part = line[:end]
            morph_part = line[end:].strip()
            word, flag_part = self._unescape(entry_part)
            if not word:
                continue
            if self._flag_aliases and flag_part:
                flag_part = self._flag_aliases[int(flag_part) - 1]
            flags = frozenset(self._parse_flags(flag_part)) if flag_part else frozenset()
            morph = self._read_morph(morph_part)
            if self._needs_input_cleaning_text(word):
                word = self.clean_input(word)
            self._add_word(word, flags, morph)
            # hidden title-cased twin (writeNormalizedWordEntry:1030-1051)
            wc = word_case(word)
            if wc == MIXED or (wc == UPPER and flag_part):
                hidden = _upper_char(word[0]) + "".join(
                    self.case_fold(c) for c in word[1:]
                )
                self._add_word(hidden, flags | {HIDDEN_FLAG}, morph)

    def _read_morph(self, morph_part: str) -> Optional[str]:
        if not morph_part:
            return None
        if self._morph_aliases is not None and morph_part.isdigit():
            morph_part = self._morph_aliases[int(morph_part) - 1]
        return morph_part or None

    def _add_word(self, word: str, flags: frozenset, morph: Optional[str]) -> None:
        group = self.words.setdefault(word, [])
        group.append(_Entry(flags=flags, morph=morph))
        # WordStorage.flushGroup:311-335 — hidden entries are dropped when
        # any non-hidden entry exists for the same word
        if any(HIDDEN_FLAG not in e.flags for e in group):
            group[:] = [e for e in group if HIDDEN_FLAG not in e.flags]

    # ----- runtime helpers -----

    def case_fold(self, c: str) -> str:
        if self.alternate_casing:
            if c == "I":
                return "ı"  # ı
            if c == "İ":  # İ
                return "i"
        return _lower_char(c)

    def may_need_input_cleaning(self) -> bool:
        return self.ignore_case or self.ignore is not None or self.iconv is not None

    def _needs_input_cleaning_text(self, text: str) -> bool:
        if not self.may_need_input_cleaning():
            return False
        for ch in text:
            if (
                (self.ignore is not None and ch in self.ignore)
                or (self.ignore_case and self.case_fold(ch) != ch)
                or (self.iconv is not None and self.iconv.might_replace_char(ch))
            ):
                return True
        return False

    def clean_input(self, text: str) -> str:
        out = []
        for ch in text:
            if self.ignore is not None and ch in self.ignore:
                continue
            if self.ignore_case and self.iconv is None:
                ch = self.case_fold(ch)
            out.append(ch)
        cleaned = "".join(out)
        if self.iconv is not None:
            cleaned = self.iconv.apply(cleaned)
            if self.ignore_case:
                cleaned = "".join(self.case_fold(c) for c in cleaned)
        return cleaned

    def lookup(self, word: str) -> List[_Entry]:
        return self.words.get(word, [])

    def is_dot_i_case_change_disallowed(self, word: str) -> bool:
        return word[0] == "İ" and not self.alternate_casing

    def is_second_stage_prefix(self, flag: str) -> bool:
        return flag in self.second_stage_prefix_flags

    def is_second_stage_suffix(self, flag: str) -> bool:
        return flag in self.second_stage_suffix_flags


def _sniff_charset(data: bytes) -> str:
    """The SET directive names the file charset; hunspell's default is
    ISO8859-1 (Dictionary.java getDecoder)."""
    for line in data.split(b"\n")[:50]:
        s = line.strip()
        if s.startswith(b"SET"):
            name = s.split()[1].decode("ascii", "replace")
            return {
                "UTF-8": "utf-8",
                "ISO8859-1": "latin-1",
                "ISO8859-15": "iso8859-15",
                "ISO8859-2": "iso8859-2",
                "KOI8-R": "koi8-r",
                "microsoft-cp1251": "cp1251",
            }.get(name, name)
    return "latin-1"


def load_dictionary(
    aff_path: str, dic_paths: Sequence[str], ignore_case: bool = False
) -> HunspellDictionary:
    with open(aff_path, "rb") as f:
        aff_bytes = f.read()
    charset = _sniff_charset(aff_bytes)
    dics = []
    for p in dic_paths:
        with open(p, "rb") as f:
            dics.append(f.read().decode(charset, "replace"))
    return HunspellDictionary(
        aff_bytes.decode(charset, "replace"), dics, ignore_case=ignore_case
    )


# ---------------- Stemmer (Stemmer.java) ----------------


class Stemmer:
    def __init__(self, dictionary: HunspellDictionary) -> None:
        self.d = dictionary

    # -- public --

    def stem(self, word: str) -> List[str]:
        d = self.d
        if d.may_need_input_cleaning() and d._needs_input_cleaning_text(word):
            word = d.clean_input(word)
        if not word:
            return []
        out: List[str] = []

        def processor(stem: str, entry: _Entry) -> bool:
            out.append(self._new_stem(stem, entry))
            return True

        self._do_stem(word, processor)
        wc = self._case_of(word)
        if wc in (UPPER, TITLE):
            self._vary_case(word, wc, lambda v: self._do_stem(v, processor))
        return out

    def unique_stems(self, word: str) -> List[str]:
        stems = self.stem(word)
        seen = set()
        out = []
        for s in stems:
            key = s.lower() if self.d.ignore_case else s
            if key not in seen:
                seen.add(key)
                out.append(s)
        return out

    # -- case variation (Stemmer.java:96-222) --

    def _case_of(self, word: str) -> str:
        if self.d.ignore_case or not word or word[0].islower():
            return MIXED
        return word_case(word)

    def _vary_case(self, word: str, wc: str, process: Callable[[str], bool]) -> bool:
        d = self.d
        title = None
        if wc == UPPER:
            title = word[0] + "".join(d.case_fold(c) for c in word[1:])
            apos = self._capitalize_after_apostrophe(title)
            if apos is not None and not process(apos):
                return False
            if not process(title):
                return False
            if d.check_sharps and not self._vary_sharp_s(title, process):
                return False
        if d.is_dot_i_case_change_disallowed(word):
            return True
        base = title if title is not None else word
        lower = d.case_fold(base[0]) + base[1:]
        if not process(lower):
            return False
        if wc == UPPER and d.check_sharps and not self._vary_sharp_s(lower, process):
            return False
        return True

    @staticmethod
    def _capitalize_after_apostrophe(word: str) -> Optional[str]:
        for i in range(1, len(word) - 1):
            if word[i] == "'":
                nxt = word[i + 1]
                up = _upper_char(nxt)
                if up != nxt:
                    return word[: i + 1] + up + word[i + 2 :]
        return None

    def _vary_sharp_s(self, word: str, process: Callable[[str], bool]) -> bool:
        def replace_ss(start: int, depth: int):
            if depth > 5:
                return [word[start:]]
            ss = word.find("ss", start)
            if ss < 0:
                return None
            prefix = word[start:ss]
            tails = replace_ss(ss + 2, depth + 1)
            if tails is None:
                tails = [word[ss + 2 :]]
            out = []
            for t in tails:
                out.append(prefix + "ss" + t)
                out.append(prefix + "ß" + t)
            return out

        variants = replace_ss(0, 0)
        if variants is None:
            return True
        for v in variants:
            if v != word and not process(v):
                return False
        return True

    # -- core (Stemmer.java:224-670) --

    def _do_stem(self, word: str, processor) -> bool:
        d = self.d
        for entry in d.lookup(word):
            if d.needaffix != FLAG_UNSET and d.needaffix in entry.flags:
                continue  # pseudostem requiring an affix
            if d.onlyincompound != FLAG_UNSET and d.onlyincompound in entry.flags:
                continue
            if not processor(word, entry):
                return False
        return self._stem(
            word, previous=None, prev_flag=FLAG_UNSET, prefix_aff=None,
            depth=0, do_prefix=True, previous_was_prefix=False,
            processor=processor,
        )

    def _stem(
        self, word, previous, prev_flag, prefix_aff, depth, do_prefix,
        previous_was_prefix, processor,
    ) -> bool:
        d = self.d
        n = len(word)
        if do_prefix and d.prefixes:
            limit = n + 1 if d.full_strip else n
            for i in range(0, min(limit, d.max_prefix_len + 1)):
                for aff in d.prefixes.get(word[:i], ()):
                    if aff is previous:
                        continue
                    if self._is_affix_compatible(
                        aff, prev_flag, depth, True, False
                    ):
                        stripped = self._strip_affix(word, i, aff, True)
                        if stripped is None:
                            continue
                        if not self._apply_affix(
                            stripped, aff, previous, None, depth, True, processor
                        ):
                            return False
        if d.suffixes:
            limit = 0 if d.full_strip else 1
            for i in range(n, limit - 1, -1):
                alen = n - i
                if alen > d.max_suffix_len:
                    break
                for aff in d.suffixes.get(word[i:], ()):
                    if aff is previous:
                        continue
                    if self._is_affix_compatible(
                        aff, prev_flag, depth, False, previous_was_prefix
                    ):
                        stripped = self._strip_affix(word, alen, aff, False)
                        if stripped is None:
                            continue
                        if not self._apply_affix(
                            stripped, aff, previous, prefix_aff, depth, False,
                            processor,
                        ):
                            return False
        return True

    def _strip_affix(self, word: str, affix_len: int, aff: Affix, is_prefix: bool):
        """stripAffix (:455-487): None if conditions fail or the result
        would be empty."""
        de_len = len(word) - affix_len
        if len(aff.strip) + de_len == 0:
            return None
        stem = word[affix_len:] if is_prefix else word[:de_len]
        if not condition_accepts(
            aff.condition, PREFIX if is_prefix else SUFFIX, stem
        ):
            return None
        if not aff.strip:
            return stem
        return (aff.strip + stem) if is_prefix else (stem + aff.strip)

    def _is_affix_compatible(
        self, aff: Affix, prev_flag: str, depth: int, is_prefix: bool,
        previous_was_prefix: bool,
    ) -> bool:
        d = self.d
        if d.onlyincompound != FLAG_UNSET and d.onlyincompound in aff.append_flags:
            return False  # SIMPLE_WORD context only (no compounds here)
        if depth == 0:
            return True
        if aff.cross_product:
            return previous_was_prefix or (
                prev_flag != FLAG_UNSET and prev_flag in aff.append_flags
            )
        return False

    def _apply_affix(
        self, stripped: str, aff: Affix, previous, prefix_aff, depth, is_prefix,
        processor,
    ) -> bool:
        d = self.d
        flag = aff.flag
        skip_lookup = self._needs_another_affix(aff, previous, not is_prefix, prefix_aff)
        if not skip_lookup:
            for entry in d.lookup(stripped):
                if flag in entry.flags or self._flag_appended_by(prefix_aff, flag):
                    chained_prefix = (
                        d.complex_prefixes and depth == 1 and is_prefix
                    )
                    if not chained_prefix and prefix_aff is not None:
                        pflag = prefix_aff.flag
                        if pflag not in entry.flags and not self._flag_appended_by(
                            aff, pflag
                        ):
                            continue
                    if (
                        d.onlyincompound != FLAG_UNSET
                        and d.onlyincompound in entry.flags
                    ):
                        continue
                    if not processor(stripped, entry):
                        return False
        if aff.cross_product and depth <= 1:
            if depth == 0:
                if is_prefix:
                    prefix_aff = aff
                    do_prefix = d.complex_prefixes and d.is_second_stage_prefix(flag)
                elif not d.complex_prefixes and d.is_second_stage_suffix(flag):
                    do_prefix = False
                else:
                    return True
            else:
                do_prefix = False
                if is_prefix and d.complex_prefixes:
                    prefix_aff = aff
                elif is_prefix or d.complex_prefixes or not d.is_second_stage_suffix(flag):
                    return True
            return self._stem(
                stripped, aff, flag, prefix_aff, depth + 1, do_prefix, is_prefix,
                processor,
            )
        return True

    def _needs_another_affix(self, aff: Affix, previous, is_suffix: bool, prefix_aff) -> bool:
        d = self.d
        circumfix = d.circumfix
        if is_suffix and (
            self._flag_appended_by(prefix_aff, circumfix)
            != self._flag_appended_by(aff, circumfix)
        ):
            return True
        if self._flag_appended_by(aff, d.needaffix):
            return (
                not is_suffix
                or previous is None
                or self._flag_appended_by(previous, d.needaffix)
            )
        return False

    @staticmethod
    def _flag_appended_by(aff: Optional[Affix], flag: str) -> bool:
        return aff is not None and aff.has_append_flag(flag)

    # -- HunspellStemFilter (HunspellStemFilter.java:85-156) --

    def filter_token(self, token: str, longest_only: bool = True) -> str:
        """Single-token HunspellStemFilter: unknown words pass through
        unchanged; longest_only picks by length desc then text desc (the
        reference lengthComparator). With longest_only=False this returns
        the FIRST stem (the filter's head token; overlap emission at
        posIncr=0 is the index-time synonym plumbing's job)."""
        stems = self.stem(token)
        if not stems:
            return token
        if longest_only and len(stems) > 1:
            return max(stems, key=lambda s: (len(s), s))
        return stems[0]

    # -- stem exceptions + OCONV (:283-316) --

    def _new_stem(self, stem: str, entry: _Entry) -> str:
        exception = None
        if entry.morph:
            data = entry.morph
            if data.startswith("st:"):
                start = 0
            else:
                idx = data.find(" st:")
                start = idx + 1 if idx >= 0 else -1
            if start >= 0:
                rest = data[start + 3 :]
                sp = rest.find(" ")
                exception = rest[:sp] if sp >= 0 else rest
        result = exception if exception is not None else stem
        if self.d.oconv is not None:
            result = self.d.oconv.apply(result)
        return result


def register_chain(
    name: str,
    aff_path: str,
    dic_paths: Sequence[str],
    ignore_case: bool = False,
    longest_only: bool = True,
) -> Stemmer:
    """Register a hunspell-backed analyzer chain under ``name`` in the
    language-chain registry (lang.CHAINS), usable anywhere a chain name
    is accepted (IndexConfig(chain=...), analyze_series). Tokens keep
    their original case (raw_case — the stemmer runs its own case
    variation, Stemmer.java:96-134) and run through the single-token
    HunspellStemFilter; the per-DISTINCT-token factorize dedup in
    analysis.analyze_series makes the stemmer O(vocab per batch)."""
    from . import analysis, lang

    stemmer = Stemmer(load_dictionary(aff_path, dic_paths, ignore_case=ignore_case))

    def tok(t: str) -> str:
        return stemmer.filter_token(t, longest_only=longest_only)

    lang.CHAINS[name] = lang.ChainSpec(
        lang._LATIN_EXT_TOKEN_PATTERN, tok, raw_case=True
    )
    analysis.LANG_CHAINS = tuple(lang.CHAINS)  # refresh the frozen snapshot
    return stemmer


@dataclass
class HunspellFilter:
    """IndexConfig-attachable HunspellStemFilter
    (analysis/hunspell/HunspellStemFilter.java): ``longest_only=True``
    replaces each token with its longest stem (unknown words unchanged);
    ``longest_only=False`` keeps the first stem in place and injects the
    remaining unique stems at the SAME position (posIncr=0 overlaps,
    norm-discounted like synonyms — incrementToken:93-101). The filter
    object ships to executors inside the pickled UDF closure, so builds
    work on workers with no driver-side registry. aff/dic paths are kept
    for the index manifest round-trip."""

    stemmer: Stemmer
    longest_only: bool = True
    aff_path: Optional[str] = None
    dic_paths: Tuple[str, ...] = ()
    ignore_case: bool = False

    @classmethod
    def load(
        cls,
        aff_path: str,
        dic_paths: Sequence[str],
        ignore_case: bool = False,
        longest_only: bool = True,
    ) -> "HunspellFilter":
        return cls(
            stemmer=Stemmer(
                load_dictionary(aff_path, dic_paths, ignore_case=ignore_case)
            ),
            longest_only=longest_only,
            aff_path=aff_path,
            dic_paths=tuple(dic_paths),
            ignore_case=ignore_case,
        )

    def map_token(self, token: str) -> str:
        return self.stemmer.filter_token(token, longest_only=True)

    def expand_token(self, token: str) -> List[str]:
        """dedup mode: [head_stem, *overlap_stems]; [] = pass through."""
        return self.stemmer.unique_stems(token)

    def to_json(self) -> Optional[dict]:
        if self.aff_path is None:
            return None  # inline dictionaries don't round-trip by path
        return {
            "aff_path": self.aff_path,
            "dic_paths": list(self.dic_paths),
            "ignore_case": self.ignore_case,
            "longest_only": self.longest_only,
        }


def hunspell_from_json(d: Optional[dict]) -> Optional[HunspellFilter]:
    if not d:
        return None
    return HunspellFilter.load(
        d["aff_path"],
        d["dic_paths"],
        ignore_case=d.get("ignore_case", False),
        longest_only=d.get("longest_only", True),
    )
