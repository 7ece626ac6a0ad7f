"""Smartcn-analog HHMM tests: shortest path vs a brute-force min-weight
oracle (the machinery pin — no bundled coredict, see smartcn.py module
doc), the exact BiSegGraph edge-weight formula (BiSegGraph.java:96-108),
SegGraph construction rules (HHMMSegmenter.java:40-183), and the chain
integration."""

import itertools
import math

from lucene_spark.smartcn import (
    MAX_FREQUENCE,
    SMOOTH,
    TINY,
    CnDictionary,
    SegToken,
    brute_force_segment,
    char_type,
    chinese_analyze_tokens,
    create_seg_graph,
    demo_dictionary,
    edge_weight,
    segment_sentence,
)

DIC = demo_dictionary()


def test_shortest_path_equals_brute_force():
    """Every string over a small ZH alphabet up to length 5: the DP
    shortest path's surface sequence weight equals the exhaustive
    minimum (costs are distinct log-weights, so paths match too)."""
    alphabet = "研究生命起a1"
    for L in range(1, 6):
        for combo in itertools.product(alphabet, repeat=L):
            text = "".join(combo)
            got = tuple(
                t.text for t in segment_sentence(text, DIC) if t.text
            )
            _cost, want = brute_force_segment(text, DIC)
            assert got == want, (text, got, want)


def test_classic_ambiguity_resolves_by_bigram():
    # 研究生命起源: 研究/生命/起源 beats 研究生/命/起源 on bigram evidence
    assert [t.text for t in segment_sentence("研究生命起源", DIC)] == [
        "研究", "生命", "起源",
    ]


def test_long_dictionary_word_wins():
    assert [t.text for t in segment_sentence("中华人民共和国", DIC)] == [
        "中华人民共和国",
    ]


def test_edge_weight_formula_exact():
    """-log(smooth*(1+f1)/MAX + (1-smooth)*((1-tiny)*f12/(1+f1) + tiny))"""
    t1 = SegToken("研究", 0, 2, "CHINESE_WORD", DIC.frequency("研究"), "研究")
    t2 = SegToken("生命", 2, 4, "CHINESE_WORD", DIC.frequency("生命"), "生命")
    f1 = DIC.frequency("研究")
    f12 = DIC.bigram_frequency("研究", "生命")
    want = -math.log(
        SMOOTH * (1.0 + f1) / MAX_FREQUENCE
        + (1.0 - SMOOTH) * ((1.0 - TINY) * f12 / (1.0 + f1) + TINY)
    )
    assert edge_weight(t1, t2, DIC) == want
    # no bigram evidence -> heavier edge
    t3 = SegToken("命", 3, 4, "CHINESE_WORD", DIC.frequency("命"), "命")
    assert edge_weight(t1, t3, DIC) > want


def test_seg_graph_contains_single_chars_and_words():
    toks = create_seg_graph("研究生", DIC)
    keys = {(t.word, t.start, t.end) for t in toks}
    # every Hanzi single char + both dictionary words + brackets
    assert ("研", 0, 1) in keys and ("究", 1, 2) in keys and ("生", 2, 3) in keys
    assert ("研究", 0, 2) in keys and ("研究生", 0, 3) in keys
    assert ("始##始", -1, 0) in keys and ("末##末", 3, 4) in keys


def test_letter_digit_runs_collapse_with_marker_frequency():
    toks = create_seg_graph("abc12", DIC)
    by_type = {t.word_type: t for t in toks}
    assert by_type["STRING"].text == "abc" and by_type["STRING"].word == "未##串"
    assert by_type["NUMBER"].text == "12" and by_type["NUMBER"].word == "未##数"


def test_delimiter_carries_max_frequence():
    toks = create_seg_graph(",", DIC)
    d = next(t for t in toks if t.word_type == "DELIMITER")
    assert d.frequency == MAX_FREQUENCE


def test_analyze_drops_delimiters_and_lowercases():
    assert chinese_analyze_tokens("搜索引擎, Hello 123") == [
        "搜索引擎", "hello", "123",
    ]


def test_lang_chain_integration():
    from lucene_spark.lang import chinese_analyze

    # porter stem reaches only the non-CJK tokens (SmartChineseAnalyzer's
    # PorterStemFilter)
    assert chinese_analyze("我是北京大学的人 running") == [
        "我", "是", "北京大学", "的", "人", "run",
    ]


def test_char_type_bands():
    assert char_type("中") == "HANZI"
    assert char_type("a") == "LETTER"
    assert char_type("7") == "DIGIT"
    assert char_type(" ") == "SPACE_LIKE"
    assert char_type(",") == "DELIMITER"
    assert char_type("，") == "DELIMITER"
    assert char_type("ｱ"[0]) != "HANZI"
