"""Kuromoji-analog lattice tests: Viterbi vs a brute-force min-cost oracle
(the machinery pin — no bundled IPADIC, see kuromoji.py module doc),
behavioral vectors on the demo lexicon mirroring the reference's
JapaneseTokenizer semantics (search-mode compound splitting, unknown-word
grouping), and the chain integration."""

import itertools

from lucene_spark.kuromoji import (
    JaDictionary,
    JaEntry,
    brute_force_segment,
    char_class,
    demo_dictionary,
    segment,
)

DIC = demo_dictionary()


def _cost(tokens, dic, mode):
    """Re-derive a path's cost for comparison with the brute-force oracle."""
    from lucene_spark.kuromoji import _penalty

    total, rid = 0.0, 0
    for t in tokens:
        # find the entry actually used (surface + unknown flag)
        total += _penalty(t.surface, mode)
        matches = [e for e in dic.entries if e.surface == t.surface]
        if t.unknown or not matches:
            from lucene_spark.kuromoji import _UNK_COSTS

            lid, new_rid, c = _UNK_COSTS[char_class(t.surface[0])]
        else:
            e = min(matches, key=lambda e: e.word_cost)
            lid, new_rid, c = e.left_id, e.right_id, e.word_cost
        total += dic.connection_cost(rid, lid) + c
        rid = new_rid
    return total


# -- Viterbi == exhaustive enumeration --------------------------------------


def test_viterbi_equals_brute_force():
    """Every string over a small JA alphabet up to length 6: the Viterbi
    path cost equals the exhaustive minimum (and the segmentation tiles the
    input exactly)."""
    alphabet = "東京都の語X"
    for L in range(1, 6):
        for combo in itertools.product(alphabet, repeat=L):
            text = "".join(combo)
            for mode in ("normal", "search"):
                toks = segment(text, DIC, mode=mode)
                # exact tiling
                assert "".join(t.surface for t in toks) == text
                pos = 0
                for t in toks:
                    assert t.start == pos and t.end == pos + len(t.surface)
                    pos = t.end
                bf_cost, _ = brute_force_segment(text, DIC, mode=mode)
                assert _cost(toks, DIC, mode) == bf_cost, (text, mode)


# -- demo-lexicon behavioral vectors ----------------------------------------


def test_tokyo_to_prefers_compound_plus_suffix():
    """東京都 -> 東京 + 都 (the lattice prefers the cheap compound over
    東 + 京都, like the IPADIC costs do)."""
    assert [t.surface for t in segment("東京都", DIC)] == ["東京", "都"]


def test_search_mode_splits_long_compound():
    """関西国際空港: one dictionary word in normal mode; search mode's
    all-kanji penalty ((6-2)*3000) makes the three-part path win —
    the reference's canonical search-mode example."""
    assert [t.surface for t in segment("関西国際空港", DIC, mode="normal")] == [
        "関西国際空港"
    ]
    assert [t.surface for t in segment("関西国際空港", DIC, mode="search")] == [
        "関西", "国際", "空港"
    ]


def test_dictionary_word_beats_parts():
    assert [t.surface for t in segment("日本語", DIC)] == ["日本語"]


def test_particle_attachment():
    toks = segment("東京の空港", DIC)
    assert [t.surface for t in toks] == ["東京", "の", "空港"]
    assert [t.pos for t in toks] == ["名詞", "助詞", "名詞"]


def test_unknown_katakana_grouped():
    """Katakana runs outside the lexicon group into one unknown token
    (char.def: KATAKANA invoke+group)."""
    toks = segment("スパーク", DIC)
    assert [t.surface for t in toks] == ["スパーク"]
    assert toks[0].unknown


def test_unknown_kanji_not_grouped():
    """KANJI group=false: unknown kanji emit per-char tokens."""
    toks = segment("鰻丼", DIC)  # neither in the demo lexicon
    assert [t.surface for t in toks] == ["鰻", "丼"]
    assert all(t.unknown for t in toks)


def test_empty_and_mode_validation():
    assert segment("", DIC) == []
    try:
        segment("東京", DIC, mode="nbest")
        assert False
    except ValueError:
        pass


# -- chain integration ------------------------------------------------------


def test_japanese_analyze_chain():
    from lucene_spark.lang import STOP_HOLE, japanese_analyze

    # particles drop to position holes (JapanesePartOfSpeechStopFilter)
    assert japanese_analyze("東京の空港") == ["東京", STOP_HOLE, "空港"]
    # latin passes through lowered; katakana unknown + stem drops the
    # prolonged sound mark (JapaneseKatakanaStemFilter)
    assert japanese_analyze("Spark コンピューター") == ["spark", "コンピュータ"]


def test_japanese_chain_registered():
    from lucene_spark.analysis import flat_tokenize
    import pandas as pd

    flat, counts = flat_tokenize(
        pd.Series(["東京都へ行く", "日本語です"]), chain="japanese"
    )
    # へ (particle) and です (aux) become stop holes, dropped by the hole
    # filter downstream — flat_tokenize keeps them as markers
    assert list(counts) == [4, 2]
    from lucene_spark.lang import STOP_HOLE

    assert list(flat) == ["東京", "都", STOP_HOLE, "行く", "日本語", STOP_HOLE]


def test_custom_dictionary_seam():
    """Any dictionary plugs into the same seam (the reference's
    UserDictionary path)."""
    dic = JaDictionary(
        entries=[JaEntry("ab", 0, 0, 10), JaEntry("abc", 0, 0, 50),
                 JaEntry("c", 0, 0, 10)],
        conn={},
    )
    assert [t.surface for t in segment("abc", dic)] == ["ab", "c"]  # 20 < 50
    dic2 = JaDictionary(
        entries=[JaEntry("ab", 0, 0, 10), JaEntry("abc", 0, 0, 15),
                 JaEntry("c", 0, 0, 10)],
        conn={},
    )
    assert [t.surface for t in segment("abc", dic2)] == ["abc"]  # 15 < 20
