"""Dictionary-based Korean morphological segmentation: the lattice /
Viterbi machinery of the reference's nori module
(``analysis/nori/src/java/.../KoreanTokenizer.java``), with the dictionary
as a pluggable seam (same split as :mod:`lucene_spark.kuromoji`).

What is parity and what is not:

- PARITY: the lattice construction (per-position dictionary prefix lookups
  + unknown-word spans per character class with invoke/group flags),
  least-cost Viterbi over ``word_cost + connection(right_id, left_id)``,
  the whitespace rule (tokens never span spaces; a token *preceded by*
  whitespace whose left POS is one of E/J/VCP/XSA/XSN/XSV pays a 3000
  space penalty — ``KoreanTokenizer.computeSpacePenalty``,
  ``KoreanTokenizer.java:355-402``), the three decompound modes
  NONE/DISCARD/MIXED over COMPOUND and INFLECT entries
  (``KoreanTokenizer.java:1058-1112``: DISCARD replaces the compound by
  its morphemes, MIXED emits the compound then its morphemes with the
  first morpheme at posIncr=0; COMPOUND parts carve real offsets from the
  surface, INFLECT parts share the whole span), the default POS stoptag
  set (``KoreanPartOfSpeechStopFilter.DEFAULT_STOP_TAGS``,
  ``KoreanPartOfSpeechStopFilter.java:36-58``), and the reading-form
  substitution (``KoreanReadingFormFilter.java:45-55``: term text becomes
  the Hangul transcription when the entry carries one).
- NOT BUNDLED: the mecab-ko-dic binary dictionary the reference compiles
  into its jar (~25 MB of entries + connection matrix). The
  ``KoDictionary`` seam accepts any entry set / connection matrix;
  ``demo_dictionary()`` ships a small hand-built lexicon (char-class
  defaults shaped after the public mecab-ko-dic char.def) so the chain is
  runnable and testable end-to-end — exactly the reference's split
  between machinery (KoreanTokenizer) and resource (TokenInfoDictionary).

Correctness of the machinery is pinned by a brute-force oracle test:
Viterbi's segmentation must equal exhaustive minimum-cost enumeration
including the space penalty (tests/test_korean.py), plus behavioral
vectors on the demo lexicon and decompound-mode contracts.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

MAX_UNKNOWN_WORD_LENGTH = 1024

#: KoreanTokenizer.computeSpacePenalty: left POS classes that pay 3000
#: when the token follows whitespace (particles / endings / suffixes glue
#: to the previous word in well-formed Korean).
SPACE_PENALTY = 3000
SPACE_PENALIZED_POS = frozenset(["E", "J", "VCP", "XSA", "XSN", "XSV"])

# POS.Type (POS.java:29-41)
MORPHEME = "MORPHEME"
COMPOUND = "COMPOUND"
INFLECT = "INFLECT"
PREANALYSIS = "PREANALYSIS"

#: KoreanPartOfSpeechStopFilter.DEFAULT_STOP_TAGS
DEFAULT_STOP_TAGS = frozenset(
    [
        "E", "IC", "J", "MAG", "MAJ", "MM", "SP", "SSC", "SSO", "SC",
        "SE", "XPN", "XSA", "XSN", "XSV", "UNA", "NA", "VSV",
    ]
)

# ---------------------------------------------------------------------------
# Character classes (dict/CharacterDefinition.java over mecab-ko-dic's
# char.def bands)
# ---------------------------------------------------------------------------

HANGUL = "HANGUL"
HANJA = "HANJA"
ALPHA = "ALPHA"
NUMERIC = "NUMERIC"
SPACE = "SPACE"
DEFAULT = "DEFAULT"


def char_class(c: str) -> str:
    o = ord(c)
    if 0xAC00 <= o <= 0xD7A3 or 0x1100 <= o <= 0x11FF or 0x3130 <= o <= 0x318F:
        return HANGUL
    if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF or 0xF900 <= o <= 0xFAFF:
        return HANJA
    if c.isspace():
        return SPACE
    if c.isdigit():
        return NUMERIC
    if c.isalpha():
        return ALPHA
    return DEFAULT


#: class -> (invoke, group), shaped after the public mecab-ko-dic char.def
#: defaults: Hangul runs group into one unknown span only when the
#: dictionary has nothing; each unknown Hanja char stands alone (readings
#: are per-character); alpha/numeric runs always surface.
_CHAR_FLAGS = {
    DEFAULT: (False, True),
    HANGUL: (False, True),
    HANJA: (False, False),
    ALPHA: (True, True),
    NUMERIC: (True, True),
}

#: class -> (left_id, right_id, word_cost) for unknown spans (unk.def
#: shape: unknown Hangul is expensive so dictionary paths win).
_UNK_COSTS = {
    DEFAULT: (0, 0, 4000),
    HANGUL: (0, 0, 11000),
    HANJA: (0, 0, 9000),
    ALPHA: (0, 0, 6000),
    NUMERIC: (0, 0, 4000),
}


# ---------------------------------------------------------------------------
# Dictionary seam
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Morpheme:
    """One part of a COMPOUND/INFLECT/PREANALYSIS entry
    (dict/Dictionary.java Morpheme)."""

    tag: str
    surface: str


@dataclass(frozen=True)
class KoEntry:
    surface: str
    left_id: int = 0
    right_id: int = 0
    word_cost: int = 0
    pos: str = "NNG"
    pos_type: str = MORPHEME
    #: decompound parts (None for plain morphemes)
    morphemes: Optional[Tuple[Morpheme, ...]] = None
    #: Hangul transcription of a Hanja surface (ReadingAttribute)
    reading: Optional[str] = None


@dataclass
class KoDictionary:
    """Token-info dictionary + connection-cost seam
    (dict/TokenInfoDictionary.java + dict/ConnectionCosts.java as plain
    data). ``conn[(right_id, left_id)]`` is the bigram transition cost;
    missing pairs read 0."""

    entries: Sequence[KoEntry]
    conn: Dict[Tuple[int, int], int] = field(default_factory=dict)
    _by_surface: Dict[str, List[KoEntry]] = field(default_factory=dict, repr=False)
    _max_len: int = 0

    def __post_init__(self):
        for e in self.entries:
            self._by_surface.setdefault(e.surface, []).append(e)
            self._max_len = max(self._max_len, len(e.surface))

    def prefix_lookup(self, text: str, pos: int) -> List[KoEntry]:
        out: List[KoEntry] = []
        upper = min(self._max_len, len(text) - pos)
        for L in range(1, upper + 1):
            out.extend(self._by_surface.get(text[pos : pos + L], ()))
        return out

    def connection_cost(self, right_id: int, left_id: int) -> int:
        return self.conn.get((right_id, left_id), 0)


@dataclass(frozen=True)
class KoToken:
    surface: str
    start: int
    end: int
    pos: str = "NNG"
    pos_type: str = MORPHEME
    unknown: bool = False
    #: graph attributes set by MIXED decompounding
    pos_inc: int = 1
    pos_len: int = 1
    reading: Optional[str] = None


# ---------------------------------------------------------------------------
# Viterbi segmentation (KoreanTokenizer.parse/backtrace re-expressed as a
# forward DP; spaces are free transitions that arm the space penalty)
# ---------------------------------------------------------------------------


def _lattice_arcs(text: str, dic: KoDictionary):
    """All arcs (start, end, entry, unknown): dictionary matches plus
    unknown-word spans per character class. Arcs never start on, nor
    extend across, whitespace."""
    n = len(text)
    arcs: List[Tuple[int, int, KoEntry, bool]] = []
    unknown_word_end = -1
    # positions with no arriving arc spawn nothing (KoreanTokenizer.parse:
    # `if (posData.count == 0) continue`, same as JapaneseTokenizer.java:940)
    # — otherwise a grouped unknown span spawned from an unreachable
    # position would consume the unknownWordEndIndex dedupe and dead-end
    # the lattice
    reachable = [False] * (n + 1)
    reachable[0] = True
    for pos in range(n):
        c = text[pos]
        klass = char_class(c)
        if klass == SPACE:
            if reachable[pos]:
                reachable[pos + 1] = True
            continue
        if not reachable[pos]:
            continue
        matched = [
            e
            for e in dic.prefix_lookup(text, pos)
            if " " not in e.surface
        ]
        any_match = bool(matched)
        for e in matched:
            arcs.append((pos, pos + len(e.surface), e, False))
            reachable[pos + len(e.surface)] = True
        invoke, group = _CHAR_FLAGS[klass]
        if (not any_match or invoke) and pos >= unknown_word_end:
            if not group:
                length = 1
            else:
                length = 1
                while (
                    pos + length < n
                    and length < MAX_UNKNOWN_WORD_LENGTH
                    and char_class(text[pos + length]) == klass
                ):
                    length += 1
            lid, rid, cost = _UNK_COSTS[klass]
            arcs.append(
                (
                    pos,
                    pos + length,
                    KoEntry(
                        text[pos : pos + length], lid, rid, cost,
                        pos="UNKNOWN", pos_type=MORPHEME,
                    ),
                    True,
                )
            )
            reachable[pos + length] = True
            unknown_word_end = pos + length
    return arcs


def _space_penalty(left_pos: str, num_spaces: int) -> int:
    """KoreanTokenizer.computeSpacePenalty (KoreanTokenizer.java:355-402)."""
    if num_spaces > 0 and left_pos in SPACE_PENALIZED_POS:
        return SPACE_PENALTY
    return 0


def viterbi(text: str, dic: KoDictionary) -> List[Tuple[KoEntry, int, int, bool]]:
    """Least-cost path of (entry, start, end, unknown) over `text`.
    Whitespace is crossed for free but arms the space penalty of the next
    arc."""
    n = len(text)
    if n == 0:
        return []
    arcs = _lattice_arcs(text, dic)
    by_start: Dict[int, List[Tuple[int, KoEntry, bool]]] = {}
    for start, end, e, unk in arcs:
        by_start.setdefault(start, []).append((end, e, unk))
    INF = float("inf")
    # best[pos] = (cost, right_id, back) where back is either
    # ("arc", start, entry, unknown) or ("space", pos-1)
    best: List[Tuple[float, int, Optional[tuple]]] = [(INF, 0, None)] * (n + 1)
    best[0] = (0.0, 0, None)
    for pos in range(n):
        cost_here, rid_here, _ = best[pos]
        if cost_here == INF:
            continue
        if char_class(text[pos]) == SPACE:
            if cost_here < best[pos + 1][0]:
                best[pos + 1] = (cost_here, rid_here, ("space", pos))
            continue
        preceded_by_space = pos > 0 and char_class(text[pos - 1]) == SPACE
        for end, e, unk in by_start.get(pos, ()):
            c = (
                cost_here
                + dic.connection_cost(rid_here, e.left_id)
                + e.word_cost
                + _space_penalty(e.pos, 1 if preceded_by_space else 0)
            )
            if c < best[end][0]:
                best[end] = (c, e.right_id, ("arc", pos, e, unk))
    if best[n][0] == INF:
        raise RuntimeError("lattice has no complete path")
    out: List[Tuple[KoEntry, int, int, bool]] = []
    pos = n
    while pos > 0:
        _, _, back = best[pos]
        if back[0] == "space":
            pos = back[1]
            continue
        _, start, e, unk = back
        out.append((e, start, pos, unk))
        pos = start
    out.reverse()
    return out


def brute_force_viterbi(
    text: str, dic: KoDictionary
) -> Tuple[float, Tuple[Tuple[str, int, int], ...]]:
    """Exhaustive minimum-cost enumeration over all complete arc paths
    (test oracle for :func:`viterbi`). Returns (cost, ((surface, start,
    end), ...))."""
    n = len(text)
    arcs = _lattice_arcs(text, dic)
    by_start: Dict[int, List[Tuple[int, KoEntry, bool]]] = {}
    for start, end, e, unk in arcs:
        by_start.setdefault(start, []).append((end, e, unk))
    bests: Dict[int, List[Tuple[float, int, tuple]]] = {}

    def walk(pos: int, cost: float, rid: int, path: tuple):
        while pos < n and char_class(text[pos]) == SPACE:
            pos += 1
        if pos >= n:
            key = bests.setdefault(-1, [])
            key.append((cost, rid, path))
            return
        preceded = pos > 0 and char_class(text[pos - 1]) == SPACE
        for end, e, unk in by_start.get(pos, ()):
            c = (
                cost
                + dic.connection_cost(rid, e.left_id)
                + e.word_cost
                + _space_penalty(e.pos, 1 if preceded else 0)
            )
            walk(end, c, e.right_id, path + ((e.surface, pos, end),))

    walk(0, 0.0, 0, ())
    done = bests.get(-1, [])
    if not done:
        raise RuntimeError("no complete path")
    best = min(done, key=lambda t: t[0])
    return best[0], best[2]


# ---------------------------------------------------------------------------
# Decompounding (KoreanTokenizer.java:1058-1112) + filters
# ---------------------------------------------------------------------------

MODE_NONE = "none"
MODE_DISCARD = "discard"
MODE_MIXED = "mixed"
#: KoreanTokenizer.DEFAULT_DECOMPOUND (KoreanTokenizer.java:90)
DEFAULT_DECOMPOUND = MODE_DISCARD


def _reading_of(dic: KoDictionary, e: KoEntry, m: Morpheme) -> Optional[str]:
    """A decompound part inherits a reading when the dictionary has a
    same-surface entry that carries one (per-character Hanja readings)."""
    for cand in dic._by_surface.get(m.surface, ()):
        if cand.reading is not None:
            return cand.reading
    return None


def segment(
    text: str,
    dic: KoDictionary,
    mode: str = DEFAULT_DECOMPOUND,
) -> List[KoToken]:
    """Viterbi segmentation + decompounding per `mode`
    (none/discard/mixed)."""
    if mode not in (MODE_NONE, MODE_DISCARD, MODE_MIXED):
        raise ValueError(f"mode must be none|discard|mixed, got {mode!r}")
    out: List[KoToken] = []
    for e, start, end, unk in viterbi(text, dic):
        if e.pos_type == MORPHEME or mode == MODE_NONE or e.morphemes is None:
            out.append(
                KoToken(e.surface, start, end, e.pos, e.pos_type, unk,
                        reading=e.reading)
            )
            continue
        parts: List[KoToken] = []
        if e.pos_type == COMPOUND:
            # parts carve real offsets out of the compound surface
            off = start
            for m in e.morphemes:
                parts.append(
                    KoToken(m.surface, off, off + len(m.surface), m.tag,
                            MORPHEME, False,
                            reading=_reading_of(dic, e, m))
                )
                off += len(m.surface)
        else:  # INFLECT / PREANALYSIS: parts share the whole span
            for m in e.morphemes:
                parts.append(
                    KoToken(m.surface, start, end, m.tag, MORPHEME, False,
                            reading=_reading_of(dic, e, m))
                )
        if mode == MODE_DISCARD:
            out.extend(parts)
        else:  # MIXED: compound first (posLen = #parts), first part inc 0
            out.append(
                KoToken(e.surface, start, end, e.pos, e.pos_type, unk,
                        pos_inc=1, pos_len=max(1, len(parts)),
                        reading=e.reading)
            )
            for i, p in enumerate(parts):
                out.append(
                    KoToken(p.surface, p.start, p.end, p.pos, p.pos_type,
                            p.unknown, pos_inc=0 if i == 0 else 1,
                            pos_len=1, reading=p.reading)
                )
    return out


def pos_stop(
    tokens: Sequence[KoToken], stop_tags: frozenset = DEFAULT_STOP_TAGS
) -> List[Optional[KoToken]]:
    """KoreanPartOfSpeechStopFilter: stopped tokens become None (position
    holes, like stopwords)."""
    return [None if t.pos in stop_tags else t for t in tokens]


def reading_form(t: KoToken) -> str:
    """KoreanReadingFormFilter: the term text is the reading when present."""
    return t.reading if t.reading is not None else t.surface


# ---------------------------------------------------------------------------
# Demo dictionary (the machinery/resource seam: production plugs
# mecab-ko-dic-scale data here)
# ---------------------------------------------------------------------------


def demo_dictionary() -> KoDictionary:
    N = Morpheme
    entries = [
        # plain nouns
        KoEntry("한국", 10, 10, 1500, "NNP"),
        KoEntry("서울", 10, 10, 1500, "NNP"),
        KoEntry("삼성", 10, 10, 1700, "NNP"),
        KoEntry("전자", 10, 10, 1700, "NNG"),
        KoEntry("학교", 10, 10, 1600, "NNG"),
        KoEntry("대학", 10, 10, 1700, "NNG"),
        KoEntry("대학교", 10, 10, 1900, "NNG"),
        KoEntry("언어", 10, 10, 1600, "NNG"),
        KoEntry("검색", 10, 10, 1600, "NNG"),
        KoEntry("엔진", 10, 10, 1700, "NNG"),
        KoEntry("사람", 10, 10, 1500, "NNG"),
        # compounds (decompound into real dictionary nouns)
        KoEntry("삼성전자", 10, 10, 2800, "NNP", COMPOUND,
                (N("NNP", "삼성"), N("NNG", "전자"))),
        KoEntry("서울대학교", 10, 10, 2900, "NNP", COMPOUND,
                (N("NNP", "서울"), N("NNG", "대학교"))),
        KoEntry("검색엔진", 10, 10, 2800, "NNG", COMPOUND,
                (N("NNG", "검색"), N("NNG", "엔진"))),
        # particles (J) and endings (E) — POS-stopped downstream
        KoEntry("은", 20, 20, 800, "J"),
        KoEntry("는", 20, 20, 800, "J"),
        KoEntry("이", 20, 20, 800, "J"),
        KoEntry("가", 20, 20, 800, "J"),
        KoEntry("을", 20, 20, 800, "J"),
        KoEntry("를", 20, 20, 800, "J"),
        KoEntry("의", 20, 20, 800, "J"),
        KoEntry("에", 20, 20, 800, "J"),
        KoEntry("에서", 20, 20, 900, "J"),
        # verbs + an INFLECT form (하는 = 하/VV + 는/E)
        KoEntry("하다", 30, 30, 1800, "VV"),
        KoEntry("하", 30, 30, 1400, "VV"),
        KoEntry("간다", 30, 30, 1800, "VV"),
        KoEntry("하는", 30, 30, 1000, "VV", INFLECT,
                (N("VV", "하"), N("E", "는"))),
        # Hanja readings (SH + ReadingAttribute): per-character entries
        # plus a whole-word entry whose reading is the full transcription
        KoEntry("漢", 40, 40, 2000, "SH", reading="한"),
        KoEntry("字", 40, 40, 2000, "SH", reading="자"),
        KoEntry("漢字", 40, 40, 3200, "SH", reading="한자"),
    ]
    conn = {
        # noun -> particle glues cheaply; particle -> noun is pricier
        (10, 20): -500,
        (20, 10): 300,
        (10, 10): 200,
        (30, 20): -300,
    }
    return KoDictionary(entries, conn)


def korean_analyze_tokens(
    text: str,
    dic: Optional[KoDictionary] = None,
    mode: str = DEFAULT_DECOMPOUND,
    stop_tags: frozenset = DEFAULT_STOP_TAGS,
) -> List[Optional[str]]:
    """KoreanAnalyzer.createComponents (KoreanAnalyzer.java:72-79):
    KoreanTokenizer(decompound) -> PartOfSpeechStop -> ReadingForm ->
    Lower. Stopped tokens come back as None (position holes)."""
    if dic is None:
        dic = demo_dictionary()
    out: List[Optional[str]] = []
    for t in pos_stop(segment(text, dic, mode), stop_tags):
        if t is None:
            out.append(None)
        else:
            out.append(reading_form(t).lower())
    return out
