"""Dictionary-based Japanese morphological segmentation: the lattice /
Viterbi machinery of the reference's kuromoji module
(``analysis/kuromoji/src/java/.../JapaneseTokenizer.java``), with the
dictionary as a pluggable seam.

What is parity and what is not:

- PARITY: the lattice construction (per-position dictionary prefix lookups
  + unknown-word spans per character class with invoke/group flags,
  ``JapaneseTokenizer.java:940-1015``), least-cost Viterbi over
  ``word_cost + connection(right_id, left_id)``, and the search-mode
  decomposition penalty (``computePenalty``, ``JapaneseTokenizer.java:
  383-400``: all-kanji spans longer than 2 pay ``(len-2)*3000``, other
  spans longer than 7 pay ``(len-7)*1700``).
- NOT BUNDLED: the MeCab-IPADIC binary dictionary the reference compiles
  into its jar (~12 MB of entries + a 1316x1316 connection matrix). The
  ``JaDictionary`` seam accepts any entry set / connection matrix;
  ``demo_dictionary()`` ships a small hand-built lexicon (IPADIC-style
  char-class defaults from the public char.def/unk.def format) so the
  chain is runnable and testable end-to-end. Production use plugs a real
  dictionary into the same seam — exactly the reference's split between
  machinery (JapaneseTokenizer) and resource (TokenInfoDictionary).

Correctness of the machinery is pinned by a brute-force oracle test:
Viterbi's segmentation must equal exhaustive minimum-cost enumeration
(tests/test_kuromoji.py), plus behavioral vectors on the demo lexicon.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

MAX_UNKNOWN_WORD_LENGTH = 1024

# search-mode constants (JapaneseTokenizer.java:106-112)
SEARCH_MODE_KANJI_LENGTH = 2
SEARCH_MODE_OTHER_LENGTH = 7
SEARCH_MODE_KANJI_PENALTY = 3000
SEARCH_MODE_OTHER_PENALTY = 1700


# ---------------------------------------------------------------------------
# Character classes (dict/CharacterDefinition.java; ranges are the public
# IPADIC char.def bands)
# ---------------------------------------------------------------------------

KANJI = "KANJI"
KANJINUMERIC = "KANJINUMERIC"
HIRAGANA = "HIRAGANA"
KATAKANA = "KATAKANA"
ALPHA = "ALPHA"
NUMERIC = "NUMERIC"
DEFAULT = "DEFAULT"

_KANJI_NUMERALS = set("一二三四五六七八九十百千万億兆")


def char_class(c: str) -> str:
    o = ord(c)
    if c in _KANJI_NUMERALS:
        return KANJINUMERIC
    if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF or o == 0x3005:
        return KANJI
    if 0x3041 <= o <= 0x309F:
        return HIRAGANA
    if 0x30A0 <= o <= 0x30FF or 0x31F0 <= o <= 0x31FF:
        return KATAKANA
    if c.isdigit():
        return NUMERIC
    if c.isalpha():
        return ALPHA
    return DEFAULT


def is_kanji(c: str) -> bool:
    k = char_class(c)
    return k == KANJI or k == KANJINUMERIC


#: class -> (invoke, group): IPADIC char.def defaults. invoke=True spawns
#: unknown words even when dictionary entries matched at the position;
#: group=True merges a same-class run into one unknown span.
_CHAR_FLAGS = {
    DEFAULT: (False, True),
    KANJI: (False, False),
    KANJINUMERIC: (True, True),
    HIRAGANA: (False, True),
    KATAKANA: (True, True),
    ALPHA: (True, True),
    NUMERIC: (True, True),
}

#: class -> (left_id, right_id, word_cost) for unknown spans: shaped after
#: the public IPADIC unk.def entries (kanji unknowns are expensive,
#: katakana/alpha runs cheap enough to surface as single tokens)
_UNK_COSTS = {
    DEFAULT: (0, 0, 4000),
    KANJI: (0, 0, 11000),
    KANJINUMERIC: (0, 0, 11000),
    HIRAGANA: (0, 0, 9000),
    KATAKANA: (0, 0, 7000),
    ALPHA: (0, 0, 6000),
    NUMERIC: (0, 0, 4000),
}


# ---------------------------------------------------------------------------
# Dictionary seam
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class JaEntry:
    surface: str
    left_id: int = 0
    right_id: int = 0
    word_cost: int = 0
    pos: str = "*"


@dataclass
class JaDictionary:
    """Token-info dictionary + connection-cost seam
    (dict/TokenInfoDictionary.java + dict/ConnectionCosts.java re-expressed
    as plain data). ``conn[right_id][left_id]`` is the bigram transition
    cost; missing pairs read 0."""

    entries: Sequence[JaEntry]
    conn: Dict[Tuple[int, int], int] = field(default_factory=dict)
    _by_surface: Dict[str, List[JaEntry]] = field(default_factory=dict, repr=False)
    _max_len: int = 0

    def __post_init__(self):
        for e in self.entries:
            self._by_surface.setdefault(e.surface, []).append(e)
            self._max_len = max(self._max_len, len(e.surface))

    def prefix_lookup(self, text: str, pos: int) -> List[JaEntry]:
        """All dictionary entries whose surface starts at text[pos]."""
        out: List[JaEntry] = []
        upper = min(self._max_len, len(text) - pos)
        for L in range(1, upper + 1):
            out.extend(self._by_surface.get(text[pos : pos + L], ()))
        return out

    def connection_cost(self, right_id: int, left_id: int) -> int:
        return self.conn.get((right_id, left_id), 0)


@dataclass(frozen=True)
class JaToken:
    surface: str
    start: int
    end: int
    pos: str = "*"
    unknown: bool = False


# ---------------------------------------------------------------------------
# Viterbi segmentation (JapaneseTokenizer.parse/backtrace, re-expressed as
# a forward DP — the reference streams with incremental backtrace for
# unbounded input; tokens here arrive as analyzer-chopped bounded strings)
# ---------------------------------------------------------------------------


def _lattice_arcs(text: str, dic: JaDictionary, mode: str):
    """All arcs (start, end, entry, unknown) the reference would enqueue:
    dictionary matches plus unknown-word spans per character class."""
    n = len(text)
    arcs: List[Tuple[int, int, JaEntry, bool]] = []
    unknown_word_end = -1
    # positions with no arriving arc spawn nothing (JapaneseTokenizer.java:
    # 940 `if (posData.count == 0) continue`) — otherwise a grouped unknown
    # span spawned from an unreachable position would consume the
    # unknownWordEndIndex dedupe and dead-end the lattice
    reachable = [False] * (n + 1)
    reachable[0] = True
    for pos in range(n):
        if not reachable[pos]:
            continue
        matched = dic.prefix_lookup(text, pos)
        any_match = bool(matched)
        for e in matched:
            arcs.append((pos, pos + len(e.surface), e, False))
            reachable[pos + len(e.surface)] = True
        c = text[pos]
        klass = char_class(c)
        invoke, group = _CHAR_FLAGS[klass]
        # JapaneseTokenizer.java:969: spawn an unknown word if nothing
        # matched, or the class always invokes; dedupe grouped spans by
        # remembering the last unknown end (":1013 unknownWordEndIndex")
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
                    JaEntry(text[pos : pos + length], lid, rid, cost, "UNK-" + klass),
                    True,
                )
            )
            reachable[pos + length] = True
            unknown_word_end = pos + length
    return arcs


def _penalty(surface: str, mode: str) -> int:
    """Search-mode decomposition penalty (computePenalty,
    JapaneseTokenizer.java:383-400)."""
    if mode != "search":
        return 0
    length = len(surface)
    if length > SEARCH_MODE_KANJI_LENGTH:
        if all(is_kanji(c) for c in surface):
            return (length - SEARCH_MODE_KANJI_LENGTH) * SEARCH_MODE_KANJI_PENALTY
        if length > SEARCH_MODE_OTHER_LENGTH:
            return (length - SEARCH_MODE_OTHER_LENGTH) * SEARCH_MODE_OTHER_PENALTY
    return 0


def segment(text: str, dic: JaDictionary, mode: str = "normal") -> List[JaToken]:
    """Least-cost Viterbi segmentation of `text`. mode='search' applies the
    reference's compound-splitting penalties."""
    if mode not in ("normal", "search"):
        raise ValueError(f"mode must be 'normal' or 'search', got {mode!r}")
    n = len(text)
    if n == 0:
        return []
    arcs = _lattice_arcs(text, dic, mode)
    by_start: Dict[int, List[Tuple[int, JaEntry, bool]]] = {}
    for start, end, e, unk in arcs:
        by_start.setdefault(start, []).append((end, e, unk))
    INF = float("inf")
    # best[pos] = (cost, right_id_of_arriving_arc, back_arc)
    best: List[Tuple[float, int, Optional[Tuple[int, JaEntry, bool]]]] = [
        (INF, 0, None)
    ] * (n + 1)
    best[0] = (0.0, 0, None)
    for pos in range(n):
        cost_here, rid_here, _ = best[pos]
        if cost_here == INF:
            continue
        for end, e, unk in by_start.get(pos, ()):
            c = (
                cost_here
                + dic.connection_cost(rid_here, e.left_id)
                + e.word_cost
                + _penalty(e.surface, mode)
            )
            if c < best[end][0]:
                best[end] = (c, e.right_id, (pos, e, unk))
    if best[n][0] == INF:
        # cannot happen: unknown arcs cover every position
        raise RuntimeError("lattice has no complete path")
    out: List[JaToken] = []
    pos = n
    while pos > 0:
        _, _, back = best[pos]
        start, e, unk = back
        out.append(JaToken(e.surface, start, pos, e.pos, unk))
        pos = start
    out.reverse()
    return out


def brute_force_segment(
    text: str, dic: JaDictionary, mode: str = "normal"
) -> Tuple[float, Tuple[str, ...]]:
    """Exhaustive minimum-cost segmentation (test oracle): enumerate every
    path over the same arcs and return (cost, surfaces). Exponential — test
    inputs only."""
    arcs = _lattice_arcs(text, dic, mode)
    by_start: Dict[int, List[Tuple[int, JaEntry]]] = {}
    for start, end, e, _ in arcs:
        by_start.setdefault(start, []).append((end, e))
    n = len(text)
    best: List[Tuple[float, Tuple[str, ...]]] = [(float("inf"), ())] * (n + 1)

    def walk(pos: int, cost: float, rid: int, path: Tuple[str, ...]):
        if pos == n:
            nonlocal result
            if cost < result[0]:
                result = (cost, path)
            return
        for end, e in by_start.get(pos, ()):
            walk(
                end,
                cost
                + dic.connection_cost(rid, e.left_id)
                + e.word_cost
                + _penalty(e.surface, mode),
                e.right_id,
                path + (e.surface,),
            )

    result: Tuple[float, Tuple[str, ...]] = (float("inf"), ())
    walk(0, 0.0, 0, ())
    return result


# ---------------------------------------------------------------------------
# Demo lexicon (NOT IPADIC — a hand-built seam exerciser; see module doc)
# ---------------------------------------------------------------------------


def demo_dictionary() -> JaDictionary:
    """Small Japanese lexicon with IPADIC-shaped costs: common nouns,
    compounds, and particles. Context ids: 0=default, 1=noun-right,
    2=particle-left; the connection matrix rewards noun->particle."""
    E = JaEntry
    entries = [
        E("東京", 0, 1, 3000, "名詞"),
        E("京都", 0, 1, 3000, "名詞"),
        E("東", 0, 1, 7000, "名詞"),
        E("都", 0, 1, 6500, "名詞"),
        E("大阪", 0, 1, 3000, "名詞"),
        E("関西", 0, 1, 3500, "名詞"),
        E("国際", 0, 1, 3500, "名詞"),
        E("空港", 0, 1, 3500, "名詞"),
        E("関西国際空港", 0, 1, 5000, "名詞"),
        E("日本", 0, 1, 2500, "名詞"),
        E("語", 0, 1, 6000, "名詞"),
        E("日本語", 0, 1, 3000, "名詞"),
        E("学校", 0, 1, 3000, "名詞"),
        E("学", 0, 1, 6500, "名詞"),
        E("校", 0, 1, 6500, "名詞"),
        E("の", 2, 0, 1000, "助詞"),
        E("に", 2, 0, 1000, "助詞"),
        E("は", 2, 0, 1200, "助詞"),
        E("へ", 2, 0, 1200, "助詞"),
        E("行く", 0, 0, 4000, "動詞"),
        E("です", 0, 0, 3000, "助動詞"),
    ]
    conn = {
        (1, 2): -2000,  # noun -> particle: strongly favored
        (0, 2): 500,  # anything else -> particle: mildly discouraged
        (1, 0): 0,
    }
    return JaDictionary(entries=entries, conn=conn)


def japanese_analyze(
    text: str, dic: Optional[JaDictionary] = None, mode: str = "search"
) -> List[str]:
    """ChainSpec analyze-override: segment each run of Japanese script via
    the lattice; non-Japanese runs fall through as single tokens split on
    non-word chars (the surrounding chain handles their casing)."""
    import re as _re

    if dic is None:
        dic = demo_dictionary()
    out: List[str] = []
    for run in _re.findall(r"[぀-ヿㇰ-ㇿ㐀-鿿々]+|[a-zA-Z0-9_]+", text):
        if _re.match(r"[a-zA-Z0-9_]", run):
            out.append(run.lower())
        else:
            for tok in segment(run, dic, mode=mode):
                out.append(tok.surface)
    return out
