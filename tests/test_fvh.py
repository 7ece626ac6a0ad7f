"""FastVectorHighlighter: hand-verified fragment windows + invariants
(vectorhighlight/FieldPhraseList.java, BaseFragListBuilder.java:36-79)."""

import pytest

from lucene_spark.functions.fvh import (
    _frag_list,
    _phrase_infos,
    _build_trie,
    fvh_highlight,
)
from lucene_spark.query import PhraseQuery, TermQuery


TEXT = "the quick brown fox jumps over the lazy dog"


def infos_for(text, queries):
    import re

    from lucene_spark.analysis import _TOKEN_PATTERN

    trie = _build_trie(queries)
    qterms = set()

    def walk(n):
        for t, c in n.items():
            qterms.add(t)
            walk(c[0])

    walk(trie)
    toks = []
    for pos, m in enumerate(_TOKEN_PATTERN.finditer(text)):
        if m.group().lower() in qterms:
            toks.append((m.group().lower(), pos, m.start(), m.end()))
    return _phrase_infos(toks, trie)


def test_term_info_offsets():
    assert infos_for(TEXT, [TermQuery(term="quick")]) == [(4, 9, 1.0, 1)]


def test_phrase_info_requires_adjacency():
    assert infos_for(TEXT, [PhraseQuery(terms=("lazy", "dog"))]) == [
        (35, 43, 1.0, 2)
    ]
    # non-adjacent pair never matches as a phrase
    assert infos_for(TEXT, [PhraseQuery(terms=("quick", "fox"))]) == []


def test_longest_match_preferred_with_prefix_fallback():
    # both 'quick' and 'quick brown' are queries: the longer wins
    infos = infos_for(
        TEXT,
        [TermQuery(term="quick"), PhraseQuery(terms=("quick", "brown"))],
    )
    assert infos == [(4, 15, 1.0, 2)]
    # 'quick brown fox jumps' is NOT a query; falls back to 'quick brown'
    infos2 = infos_for(
        TEXT,
        [PhraseQuery(terms=("quick", "brown")),
         PhraseQuery(terms=("quick", "brown", "fox", "lazy"))],
    )
    assert infos2 == [(4, 15, 1.0, 2)]


def test_frag_window_centers_match():
    # fcs=18, margin=6: 'quick' at [4,9) -> newMargin=(18-5)//2=6,
    # spanStart=max(4-6,0)=0, spanEnd=0+18=18
    frags = _frag_list([(4, 9, 1.0, 1)], 18, 6)
    assert [(f[0], f[1]) for f in frags] == [(0, 18)]


def test_frag_windows_are_disjoint_and_cover_matches():
    infos = [(i * 30, i * 30 + 4, 1.0, 1) for i in range(6)]
    frags = _frag_list(infos, 20, 6)
    spans = [(f[0], f[1]) for f in frags]
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 <= s2  # startOffset advances: no overlap
    covered = [i for f in frags for i in f[2]]
    assert covered == infos  # every match lands in exactly one fragment


def test_fvh_highlight_end_to_end(spark):
    df = spark.createDataFrame(
        [(0, TEXT), (1, "no match here"), (2, "quick " * 30)],
        "doc_id long, text string",
    )
    rows = fvh_highlight(
        df, "doc_id", "text",
        [TermQuery(term="quick"), PhraseQuery(terms=("lazy", "dog"), boost=2.0)],
        frag_char_size=24, top_n=1,
    ).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    assert 1 not in by_doc
    # doc 0's best fragment is the boosted phrase window
    assert "<b>lazy dog</b>" in by_doc[0]["snippet"]
    assert by_doc[0]["score"] == 2.0
    # doc 2: many 'quick' matches packed per window, one best returned
    assert by_doc[2]["score"] >= 2.0  # several 1.0-boost matches in window
    assert by_doc[2]["snippet"].count("<b>quick</b>") >= 2


def test_sloppy_phrase_gap_validation():
    """Slop phrases validate per-pair gaps |next - pos - 1| <= slop
    (FieldQuery.isValidTermOrPhrase, :459-476)."""
    q = [PhraseQuery(terms=("quick", "fox"), slop=1)]
    # 'quick brown fox': gap of 1 token -> matches at slop 1
    assert infos_for(TEXT, q) == [(4, 19, 1.0, 2)]
    # slop 0 rejects the same gap
    assert infos_for(TEXT, [PhraseQuery(terms=("quick", "fox"))]) == []
    # out-of-order within slop: |next - pos - 1| uses abs
    assert infos_for("fox quick", [PhraseQuery(terms=("quick", "fox"),
                                               slop=2)]) == []
    # ('quick' first in stack order: candidate is quick@1 then nothing
    # after; 'fox' precedes so no in-order chain exists)
    assert infos_for("quick fox", [PhraseQuery(terms=("quick", "fox"),
                                               slop=2)]) == [(0, 9, 1.0, 2)]


# -- FieldQuery.expand (FieldQuery.java:176-260) ------------------------------


def _expanded_keys(queries):
    from lucene_spark.functions.fvh import _expand_queries

    out = []
    for q in _expand_queries(queries):
        if isinstance(q, PhraseQuery):
            out.append((tuple(q.terms), int(q.slop)))
        else:
            out.append((q.term,))
    return out


def test_expand_no_phrases_is_identity():
    # ex1) flatQueries={a,b,c} => expandQueries={a,b,c}
    qs = [TermQuery(term=t) for t in "abc"]
    assert _expanded_keys(qs) == [("a",), ("b",), ("c",)]


def test_expand_overlapping_pair():
    # ex2) {a,"b c","c d"} => {a,"b c","c d","b c d"}
    qs = [
        TermQuery(term="a"),
        PhraseQuery(terms=("b", "c")),
        PhraseQuery(terms=("c", "d")),
    ]
    assert _expanded_keys(qs) == [
        ("a",), (("b", "c"), 0), (("c", "d"), 0), (("b", "c", "d"), 0),
    ]


def test_expand_either_direction():
    # ex2 of checkOverlap) A="b c", B="a b" => {"a b c"}
    qs = [PhraseQuery(terms=("b", "c")), PhraseQuery(terms=("a", "b"))]
    assert (("a", "b", "c"), 0) in _expanded_keys(qs)


def test_expand_no_overlap_cases():
    # ex3) "a b" / "c d"; ex2/5/6/8 of checkOverlap: containment or
    # interior overlap must NOT expand
    for a, b in [
        (("a", "b"), ("c", "d")),
        (("a", "b"), ("a", "b", "c")),
        (("a", "b", "c"), ("b", "c")),
        (("a", "b", "c"), ("b",)),
        (("a", "b", "c", "d"), ("b", "c")),
    ]:
        got = _expanded_keys([PhraseQuery(terms=a), PhraseQuery(terms=b)])
        assert got == [(a, 0), (b, 0)], (a, b, got)


def test_expand_repeated_terms():
    # ex7) src="a a a a", dest="a a a" => {"a a a a a","a a a a a a"}
    qs = [PhraseQuery(terms=("a",) * 4), PhraseQuery(terms=("a",) * 3)]
    got = set(_expanded_keys(qs))
    assert (("a",) * 5, 0) in got and (("a",) * 6, 0) in got
    assert len(got) == 4


def test_expand_requires_equal_slop():
    qs = [
        PhraseQuery(terms=("b", "c"), slop=1),
        PhraseQuery(terms=("c", "d"), slop=0),
    ]
    assert _expanded_keys(qs) == [(("b", "c"), 1), (("c", "d"), 0)]


def test_expand_merged_phrase_highlights_whole_span():
    """End-to-end FieldPhraseList behavior: {"quick brown","brown fox"}
    marks 'quick brown fox' as ONE merged span (boost 1, 3 terms)."""
    from lucene_spark.functions.fvh import _expand_queries

    qs = [
        PhraseQuery(terms=("quick", "brown")),
        PhraseQuery(terms=("brown", "fox")),
    ]
    infos = infos_for(TEXT, _expand_queries(qs))
    assert infos == [(4, 19, 1.0, 3)]
