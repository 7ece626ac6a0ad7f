"""Nori-analog lattice tests: Viterbi vs a brute-force min-cost oracle
(the machinery pin — no bundled mecab-ko-dic, see korean.py module doc),
decompound-mode contracts mirroring KoreanTokenizer.java:1058-1112,
the space-penalty rule (KoreanTokenizer.java:355-402), POS stop defaults
(KoreanPartOfSpeechStopFilter.java:36-58), reading-form substitution
(KoreanReadingFormFilter.java:45-55), and the chain integration."""

import itertools

from lucene_spark.korean import (
    DEFAULT_STOP_TAGS,
    KoDictionary,
    KoEntry,
    Morpheme,
    brute_force_viterbi,
    char_class,
    demo_dictionary,
    korean_analyze_tokens,
    pos_stop,
    reading_form,
    segment,
    viterbi,
)

DIC = demo_dictionary()


# -- Viterbi == exhaustive enumeration --------------------------------------


def test_viterbi_equals_brute_force():
    """Every string over a small KO alphabet (with space) up to length 5:
    the Viterbi path cost equals the exhaustive minimum, and the
    segmentation tiles the non-space input exactly."""
    alphabet = "삼성전자는 학"
    for L in range(1, 6):
        for combo in itertools.product(alphabet, repeat=L):
            text = "".join(combo)
            if text.strip() != text or "  " in text:
                continue  # lattice input is analyzer-chopped runs
            if not text:
                continue
            path = viterbi(text, DIC)
            # exact tiling of non-space spans
            covered = "".join(text[s:e] for _, s, e, _ in path)
            assert covered == text.replace(" ", "")
            bf_cost, _bf_path = brute_force_viterbi(text, DIC)
            # recompute viterbi cost with the space penalty (exact arcs)
            from lucene_spark.korean import _space_penalty

            cost, rid = 0.0, 0
            for e, s, t, _ in path:
                pre = 1 if (s > 0 and text[s - 1] == " ") else 0
                cost += (
                    DIC.connection_cost(rid, e.left_id)
                    + e.word_cost
                    + _space_penalty(e.pos, pre)
                )
                rid = e.right_id
            assert cost == bf_cost, (text, cost, bf_cost)


# -- decompound modes (KoreanTokenizer.java:1058-1112) -----------------------


def test_decompound_none_keeps_compound():
    toks = segment("삼성전자", DIC, "none")
    assert [(t.surface, t.pos_type) for t in toks] == [("삼성전자", "COMPOUND")]


def test_decompound_discard_replaces_with_parts():
    toks = segment("삼성전자", DIC, "discard")
    assert [t.surface for t in toks] == ["삼성", "전자"]
    # COMPOUND parts carve real offsets out of the surface
    assert [(t.start, t.end) for t in toks] == [(0, 2), (2, 4)]
    assert all(t.pos_inc == 1 for t in toks)


def test_decompound_mixed_emits_graph():
    toks = segment("삼성전자", DIC, "mixed")
    assert [t.surface for t in toks] == ["삼성전자", "삼성", "전자"]
    # compound spans both parts (posLen=2); first part overlaps (posInc=0)
    assert [(t.pos_inc, t.pos_len) for t in toks] == [(1, 2), (0, 1), (1, 1)]


def test_inflect_parts_share_the_whole_span():
    toks = segment("하는", DIC, "discard")
    assert [(t.surface, t.pos) for t in toks] == [("하", "VV"), ("는", "E")]
    assert [(t.start, t.end) for t in toks] == [(0, 2), (0, 2)]


# -- space penalty (KoreanTokenizer.java:355-402) ----------------------------


def test_space_penalty_discourages_detached_particle():
    """A particle (J) after whitespace pays 3000: with a same-surface noun
    available, the noun reading wins across a space but the particle wins
    when glued."""
    dic = KoDictionary(
        [
            KoEntry("말", 10, 10, 1500, "NNG"),
            KoEntry("이", 20, 20, 800, "J"),
            KoEntry("이", 10, 10, 2500, "NNG"),
        ],
        {(10, 20): -500},
    )
    glued = segment("말이", dic)
    assert [(t.surface, t.pos) for t in glued] == [("말", "NNG"), ("이", "J")]
    spaced = segment("말 이", dic)
    # J would cost 800+3000-500=3300 > NNG 2500+200(conn default 0)
    assert [(t.surface, t.pos) for t in spaced] == [("말", "NNG"), ("이", "NNG")]


def test_tokens_never_span_spaces():
    dic = KoDictionary([KoEntry("한국어", 10, 10, 100, "NNG")], {})
    toks = segment("한국 어", dic)
    assert all(" " not in t.surface for t in toks)
    assert "".join(t.surface for t in toks) == "한국어"


# -- POS stop + reading form -------------------------------------------------


def test_default_stop_tags_match_reference():
    assert DEFAULT_STOP_TAGS == frozenset(
        ["E", "IC", "J", "MAG", "MAJ", "MM", "SP", "SSC", "SSO", "SC",
         "SE", "XPN", "XSA", "XSN", "XSV", "UNA", "NA", "VSV"]
    )


def test_pos_stop_holes():
    toks = segment("삼성전자는 한국", DIC)
    kept = pos_stop(toks)
    assert [t.surface if t else None for t in kept] == [
        "삼성", "전자", None, "한국",
    ]


def test_reading_form_substitutes_hanja():
    toks = segment("漢字", DIC)
    assert [reading_form(t) for t in toks] == ["한자"]
    toks = segment("漢", DIC)
    assert [reading_form(t) for t in toks] == ["한"]
    # no reading -> surface unchanged
    toks = segment("한국", DIC)
    assert [reading_form(t) for t in toks] == ["한국"]


def test_unknown_hangul_groups_into_one_span():
    toks = segment("회사", DIC)
    assert [(t.surface, t.unknown) for t in toks] == [("회사", True)]


def test_analyzer_chain_order():
    """KoreanAnalyzer.java:72-79: tokenize(DISCARD) -> POS stop ->
    reading -> lower; stops come back as None holes."""
    assert korean_analyze_tokens("삼성전자는 漢字") == [
        "삼성", "전자", None, "한자",
    ]


def test_lang_chain_integration():
    from lucene_spark.lang import STOP_HOLE, korean_analyze

    out = korean_analyze("서울대학교에서 Spark 검색엔진 123")
    assert out == [
        "서울", "대학교", STOP_HOLE, "spark", "검색", "엔진", "123",
    ]


def test_char_class_bands():
    assert char_class("한") == "HANGUL"
    assert char_class("漢") == "HANJA"
    assert char_class(" ") == "SPACE"
    assert char_class("a") == "ALPHA"
    assert char_class("7") == "NUMERIC"
    assert char_class("!") == "DEFAULT"
