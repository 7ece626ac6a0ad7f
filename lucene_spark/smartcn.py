"""HMM-based Chinese word segmentation: the hidden-Markov lattice of the
reference's smartcn module
(``analysis/smartcn/src/java/.../hhmm/HHMMSegmenter.java``), with the
dictionary as a pluggable seam (same machinery/resource split as
:mod:`lucene_spark.kuromoji` / :mod:`lucene_spark.korean`).

What is parity and what is not:

- PARITY: the SegGraph construction (``HHMMSegmenter.createSegGraph``:
  every Hanzi contributes its single-char token plus every dictionary
  word matched by prefix extension; letter/digit runs collapse to one
  token whose frequency comes from the ``未##串`` / ``未##数`` marker
  entries; delimiters carry MAX_FREQUENCE; sentence start/end markers
  ``始##始`` / ``末##末`` bracket the graph), the BiSegGraph bigram edge
  weight (``BiSegGraph.java:96-108``, exactly
  ``-log(smooth*(1+f(w1))/MAX_FREQUENCE +
  (1-smooth)*((1-tiny)*f(w1@w2)/(1+f(w1)) + tiny))`` with smooth=0.1,
  tiny=1/MAX_FREQUENCE, MAX_FREQUENCE=2159997 — ``Utility.java:47``),
  and the shortest-path Viterbi over token indices
  (``BiSegGraph.getShortPath``).
- NOT BUNDLED: the GB2312 coredict/bigramdict the reference loads from
  its jar (~8 MB). The ``CnDictionary`` seam accepts any word/bigram
  frequency tables; ``demo_dictionary()`` ships a small hand-built
  lexicon so the chain is runnable and testable end-to-end — the
  reference's split between machinery (HHMMSegmenter) and resource
  (WordDictionary/BigramDictionary).

Correctness of the machinery is pinned by a brute-force oracle test:
the shortest path must equal exhaustive minimum-weight enumeration over
all complete segmentations (tests/test_smartcn.py), plus behavioral
vectors on the demo lexicon (the classic 研究生命 ambiguity resolves by
bigram evidence, as in the reference's TestHHMMSegmenter style).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

# Utility.java:47
MAX_FREQUENCE = 2079997 + 80000
SMOOTH = 0.1
TINY = 1.0 / MAX_FREQUENCE

# Utility.java:30-41
STRING_MARKER = "未##串"
NUMBER_MARKER = "未##数"
START_MARKER = "始##始"
END_MARKER = "末##末"
WORD_SEGMENT_CHAR = "@"

# WordType.java
SENTENCE_BEGIN = "SENTENCE_BEGIN"
SENTENCE_END = "SENTENCE_END"
CHINESE_WORD = "CHINESE_WORD"
STRING = "STRING"
NUMBER = "NUMBER"
DELIMITER = "DELIMITER"

# CharType bands (Utility.getCharType, Utility.java:140-159)
HANZI = "HANZI"
LETTER = "LETTER"
DIGIT = "DIGIT"
SPACE_LIKE = "SPACE_LIKE"
CT_DELIMITER = "DELIMITER"
FULLWIDTH_LETTER = "FULLWIDTH_LETTER"
FULLWIDTH_DIGIT = "FULLWIDTH_DIGIT"
OTHER = "OTHER"


def char_type(ch: str) -> str:
    o = ord(ch)
    if 0x4E00 <= o <= 0x9FA5:
        return HANZI
    if 0x0041 <= o <= 0x005A or 0x0061 <= o <= 0x007A:
        return LETTER
    if 0x0030 <= o <= 0x0039:
        return DIGIT
    if ch in (" ", "\t", "\r", "\n", "　"):
        return SPACE_LIKE
    if 0x0021 <= o <= 0x00BB or 0x2010 <= o <= 0x2642 or 0x3001 <= o <= 0x301E:
        return CT_DELIMITER
    if 0xFF21 <= o <= 0xFF3A or 0xFF41 <= o <= 0xFF5A:
        return FULLWIDTH_LETTER
    if 0xFF10 <= o <= 0xFF19:
        return FULLWIDTH_DIGIT
    if 0xFE30 <= o <= 0xFF63:
        return CT_DELIMITER
    return OTHER


# ---------------------------------------------------------------------------
# Dictionary seam (WordDictionary + BigramDictionary as plain data)
# ---------------------------------------------------------------------------


@dataclass
class CnDictionary:
    """``words[w]`` = unigram frequency (coredict); ``bigrams["w1@w2"]``
    = pair frequency (bigramdict). Missing keys read 0."""

    words: Dict[str, int]
    bigrams: Dict[str, int] = field(default_factory=dict)
    _prefixes: set = field(default_factory=set, repr=False)
    _max_len: int = 1

    def __post_init__(self):
        for w in self.words:
            self._max_len = max(self._max_len, len(w))
            for L in range(1, len(w) + 1):
                self._prefixes.add(w[:L])

    def frequency(self, w: str) -> int:
        return self.words.get(w, 0)

    def is_prefix(self, w: str) -> bool:
        return w in self._prefixes

    def bigram_frequency(self, w1: str, w2: str) -> int:
        return self.bigrams.get(w1 + WORD_SEGMENT_CHAR + w2, 0)


@dataclass(frozen=True)
class SegToken:
    """hhmm/SegToken.java: ``word`` is the dictionary key used for
    frequencies/bigrams (marker words for letter/digit runs); ``text``
    is the surface the analyzer emits."""

    word: str
    start: int
    end: int
    word_type: str
    frequency: int
    text: str = ""


# ---------------------------------------------------------------------------
# SegGraph (HHMMSegmenter.createSegGraph, HHMMSegmenter.java:40-183)
# ---------------------------------------------------------------------------


def create_seg_graph(sentence: str, dic: CnDictionary) -> List[SegToken]:
    n = len(sentence)
    tokens: List[SegToken] = []
    i = 0
    while i < n:
        ct = char_type(sentence[i])
        if ct == SPACE_LIKE:
            i += 1
        elif ct == HANZI:
            # single Hanzi always enters the graph, phrase or not
            ch = sentence[i]
            tokens.append(
                SegToken(ch, i, i + 1, CHINESE_WORD, dic.frequency(ch), ch)
            )
            # extend dictionary prefixes (getPrefixMatch walk)
            j = i + 1
            buf = ch
            while j < n and dic.is_prefix(buf):
                while j < n and char_type(sentence[j]) == SPACE_LIKE:
                    j += 1
                if j < n and char_type(sentence[j]) == HANZI:
                    buf = buf + sentence[j]
                    j += 1
                    if len(buf) > 1 and dic.frequency(buf) > 0:
                        tokens.append(
                            SegToken(buf, i, j, CHINESE_WORD,
                                     dic.frequency(buf), buf)
                        )
                else:
                    break
                if not dic.is_prefix(buf):
                    break
            i += 1
        elif ct in (LETTER, FULLWIDTH_LETTER):
            j = i + 1
            while j < n and char_type(sentence[j]) in (LETTER, FULLWIDTH_LETTER):
                j += 1
            tokens.append(
                SegToken(STRING_MARKER, i, j, STRING,
                         dic.frequency(STRING_MARKER), sentence[i:j])
            )
            i = j
        elif ct in (DIGIT, FULLWIDTH_DIGIT):
            j = i + 1
            while j < n and char_type(sentence[j]) in (DIGIT, FULLWIDTH_DIGIT):
                j += 1
            tokens.append(
                SegToken(NUMBER_MARKER, i, j, NUMBER,
                         dic.frequency(NUMBER_MARKER), sentence[i:j])
            )
            i = j
        elif ct == CT_DELIMITER:
            # "No need to search the weight for the punctuation" — max freq
            tokens.append(
                SegToken(sentence[i], i, i + 1, DELIMITER, MAX_FREQUENCE,
                         sentence[i])
            )
            i += 1
        else:  # OTHER: unknown symbol as unknown string
            tokens.append(
                SegToken(STRING_MARKER, i, i + 1, STRING,
                         dic.frequency(STRING_MARKER), sentence[i])
            )
            i += 1
    # sentence brackets (HHMMSegmenter.java:169-180)
    tokens.append(
        SegToken(START_MARKER, -1, 0, SENTENCE_BEGIN,
                 dic.frequency(START_MARKER), "")
    )
    tokens.append(
        SegToken(END_MARKER, n, n + 1, SENTENCE_END,
                 dic.frequency(END_MARKER), "")
    )
    return tokens


# ---------------------------------------------------------------------------
# BiSegGraph edge weights + shortest path (BiSegGraph.java:48-215)
# ---------------------------------------------------------------------------


def edge_weight(t1: SegToken, t2: SegToken, dic: CnDictionary) -> float:
    """-log{ a*P(w1) + (1-a)*P(w2|w1) } exactly as BiSegGraph.java:100-107."""
    one_word_freq = t1.frequency
    pair_freq = dic.bigram_frequency(t1.word, t2.word)
    return -math.log(
        SMOOTH * (1.0 + one_word_freq) / (MAX_FREQUENCE + 0.0)
        + (1.0 - SMOOTH)
        * ((1.0 - TINY) * pair_freq / (1.0 + one_word_freq) + TINY)
    )


def _edges(tokens: List[SegToken], dic: CnDictionary):
    """(from_idx, to_idx, weight) for every consecutive pair: t1 connects
    to every token at the NEXT existing start offset >= t1.end
    (BiSegGraph.generateBiSegGraph's `while !isStartExist(next) next++`)."""
    by_start: Dict[int, List[int]] = {}
    for idx, t in enumerate(tokens):
        by_start.setdefault(t.start, []).append(idx)
    max_start = max(t.start for t in tokens)
    out = []
    for idx, t1 in enumerate(tokens):
        if t1.word_type == SENTENCE_END:
            continue
        nxt = t1.end
        while nxt <= max_start and nxt not in by_start:
            nxt += 1
        for jdx in by_start.get(nxt, ()):
            out.append((idx, jdx, edge_weight(t1, tokens[jdx], dic)))
    return out


def segment_sentence(sentence: str, dic: CnDictionary) -> List[SegToken]:
    """HHMMSegmenter.process: min-weight path through the bigram graph,
    start/end markers dropped."""
    if not sentence:
        return []
    tokens = create_seg_graph(sentence, dic)
    if len(tokens) == 2:  # only the brackets (all space)
        return []
    edges = _edges(tokens, dic)
    incoming: Dict[int, List[Tuple[int, float]]] = {}
    for f, t, w in edges:
        incoming.setdefault(t, []).append((f, w))
    start_idx = next(
        i for i, t in enumerate(tokens) if t.word_type == SENTENCE_BEGIN
    )
    end_idx = next(
        i for i, t in enumerate(tokens) if t.word_type == SENTENCE_END
    )
    INF = float("inf")
    best: Dict[int, Tuple[float, Optional[int]]] = {start_idx: (0.0, None)}
    # tokens sorted by start make a topological order (edges go forward)
    order = sorted(range(len(tokens)), key=lambda i: (tokens[i].start, tokens[i].end))
    for idx in order:
        if idx == start_idx:
            continue
        b, back = INF, None
        for f, w in incoming.get(idx, ()):
            fb = best.get(f, (INF, None))[0]
            if fb + w < b:
                b, back = fb + w, f
        best[idx] = (b, back)
    path = []
    cur = end_idx
    if best.get(end_idx, (INF, None))[0] == INF:
        raise RuntimeError("bigram graph has no complete path")
    while cur is not None and cur != start_idx:
        path.append(cur)
        cur = best[cur][1]
    path.reverse()
    return [tokens[i] for i in path if tokens[i].word_type != SENTENCE_END]


def brute_force_segment(
    sentence: str, dic: CnDictionary
) -> Tuple[float, Tuple[str, ...]]:
    """Exhaustive min-weight enumeration over all complete paths (test
    oracle for :func:`segment_sentence`)."""
    tokens = create_seg_graph(sentence, dic)
    edges = _edges(tokens, dic)
    adj: Dict[int, List[Tuple[int, float]]] = {}
    for f, t, w in edges:
        adj.setdefault(f, []).append((t, w))
    start_idx = next(
        i for i, t in enumerate(tokens) if t.word_type == SENTENCE_BEGIN
    )
    end_idx = next(
        i for i, t in enumerate(tokens) if t.word_type == SENTENCE_END
    )
    results = []

    def walk(idx, cost, path):
        if idx == end_idx:
            results.append((cost, path))
            return
        for t, w in adj.get(idx, ()):
            walk(t, cost + w, path + (tokens[t].text,))

    walk(start_idx, 0.0, ())
    if not results:
        raise RuntimeError("no complete path")
    c, p = min(results, key=lambda r: r[0])
    return c, tuple(x for x in p if x)


# ---------------------------------------------------------------------------
# Demo dictionary
# ---------------------------------------------------------------------------


def demo_dictionary() -> CnDictionary:
    words = {
        # the classic 研究生命起源 ambiguity: 研究/生命/起源 must beat
        # 研究生/命/起源 on bigram evidence
        "研究": 4000, "研究生": 1500, "生命": 3000, "命": 500,
        "起源": 2000, "生": 800,
        "中国": 6000, "中华": 3000, "人民": 5000, "共和国": 2500,
        "中华人民共和国": 1200,
        "北京": 5000, "大学": 4500, "北京大学": 2200,
        "语言": 3000, "搜索": 2800, "引擎": 2000, "搜索引擎": 1800,
        "我": 7000, "是": 8000, "的": 9000, "人": 6000,
        STRING_MARKER: 200, NUMBER_MARKER: 300,
        START_MARKER: MAX_FREQUENCE // 2, END_MARKER: MAX_FREQUENCE // 2,
    }
    bigrams = {
        "研究@生命": 1200,
        "生命@起源": 900,
        "研究生@命": 1,
        "始##始@研究": 800,
        "始##始@我": 900,
        "我@是": 1500,
        "北京大学@的": 400,
        "搜索引擎@的": 300,
    }
    return CnDictionary(words, bigrams)


def chinese_analyze_tokens(
    text: str, dic: Optional[CnDictionary] = None
) -> List[str]:
    """SmartChineseAnalyzer's token stream shape: HHMM segmentation,
    delimiters dropped, letter runs lowercased (the reference also
    porter-stems them via its PorterStemFilter — applied by the chain's
    token fn so English mixed into Chinese text behaves like the
    reference)."""
    if dic is None:
        dic = demo_dictionary()
    out: List[str] = []
    for t in segment_sentence(text, dic):
        if t.word_type == DELIMITER:
            continue
        out.append(t.text.lower())
    return out
