"""Query-time synonym graph expansion vs the reference's TestQueryBuilder
expectations (core/src/test/org/apache/lucene/util/TestQueryBuilder.java:
testSynonyms, testSynonymsPhrase, testMultiWordSynonymsPhrase[_WithSlop],
testMultiWordSynonymsBoolean, testMultiWordPhraseSynonymsBoolean) — the
MockSynonymFilter there adds dog for dogs and cavy for "guinea pig"
(test-framework/.../MockSynonymFilter.java), i.e. the expand rules
"dogs, dog" and "guinea pig, cavy". No Spark needed: query construction is
pure driver-side planning."""

import pytest

from lucene_spark.analysis import standard_analyze
from lucene_spark.query import (
    BooleanClause,
    BooleanQuery,
    MultiPhraseQuery,
    Occur,
    PhraseQuery,
    SynonymQuery,
    TermQuery,
    token_stream_to_term_automaton,
)
from lucene_spark.search import TooManyClauses
from lucene_spark.synonymgraph import (
    SynonymMap,
    create_boolean_query,
    create_field_query,
    create_phrase_query,
    expand_graph,
    parse_solr_synonyms,
    segments_to_token_stream,
)

RULES = "dogs, dog\nguinea pig, cavy\n"


def _map(expand=True, text=RULES):
    return parse_solr_synonyms(text, standard_analyze, expand=expand)


def should(*qs):
    return BooleanQuery(clauses=tuple(BooleanClause(q, Occur.SHOULD) for q in qs))


def must(*qs):
    return BooleanQuery(clauses=tuple(BooleanClause(q, Occur.MUST) for q in qs))


SYN_BOOL = should(must(TermQuery(term="guinea"), TermQuery(term="pig")),
                  TermQuery(term="cavy"))
SYN_PHRASE = should(PhraseQuery(terms=("guinea", "pig")), TermQuery(term="cavy"))


# --- SolrSynonymParser ------------------------------------------------------

def test_parse_expand_list():
    m = _map()
    assert m.lookup(("dogs",)) == [("dogs",), ("dog",)]
    # outputs keep rule insertion order (SynonymMap ord order), so the
    # line's first entry leads even when it is not the matched input
    assert m.lookup(("dog",)) == [("dogs",), ("dog",)]
    assert m.lookup(("guinea", "pig")) == [("guinea", "pig"), ("cavy",)]
    assert m.lookup(("cavy",)) == [("guinea", "pig"), ("cavy",)]
    assert m.max_input_len == 2


def test_parse_noexpand_maps_to_first():
    m = _map(expand=False)
    assert m.lookup(("dog",)) == [("dogs",)]
    assert m.lookup(("dogs",)) == [("dogs",)]


def test_parse_replacement_rule():
    m = _map(text="usa, u s a => united states\n# comment\n")
    assert m.lookup(("usa",)) == [("united", "states")]
    assert m.lookup(("u", "s", "a")) == [("united", "states")]
    assert m.lookup(("united", "states")) is None


def test_parse_rejects_empty_sides():
    with pytest.raises(ValueError):
        parse_solr_synonyms("foo =>", standard_analyze)
    with pytest.raises(ValueError):
        parse_solr_synonyms("solo", standard_analyze)


# --- expand_graph matching semantics ---------------------------------------

def test_greedy_longest_match_non_overlapping():
    m = _map(text="big apple, nyc\napple, fruit\n")
    segs = expand_graph(["big", "apple", "pie"], m)
    # longest match at 'big' wins; scan resumes AFTER the match, so the
    # inner 'apple' rule never fires (SynonymGraphFilter.java parse())
    assert [s.paths for s in segs] == [
        [("big", "apple"), ("nyc",)],
        [("pie",)],
    ]


def test_single_path_replacement_flattens():
    m = _map(text="usa => united states\n")
    segs = expand_graph(["usa", "visa"], m)
    assert [s.paths for s in segs] == [[("united",)], [("states",)], [("visa",)]]
    assert not any(s.is_graph for s in segs)


# --- QueryBuilder decision tree (reference test expectations) --------------

def test_single_term():
    assert create_boolean_query("story", standard_analyze, _map()) == TermQuery(
        term="story"
    )


def test_empty_returns_none():
    assert create_boolean_query("", standard_analyze, _map()) is None


def test_synonyms_single_position():
    # testSynonyms: bare SynonymQuery for every creation mode
    expected = SynonymQuery(terms=("dogs", "dog"))
    m = _map()
    assert create_boolean_query("dogs", standard_analyze, m) == expected
    assert create_phrase_query("dogs", standard_analyze, m) == expected
    assert (
        create_boolean_query("dogs", standard_analyze, m, operator=Occur.MUST)
        == expected
    )


def test_synonyms_phrase_multiphrase():
    # testSynonymsPhrase: old dogs -> MultiPhraseQuery [old][dogs|dog]
    expected = MultiPhraseQuery(slots=(("old",), ("dogs", "dog")))
    assert create_phrase_query("old dogs", standard_analyze, _map()) == expected


def test_multiword_synonyms_phrase():
    # testMultiWordSynonymsPhrase
    assert create_phrase_query("guinea pig", standard_analyze, _map()) == SYN_PHRASE


def test_multiword_synonyms_phrase_with_slop():
    expected = should(
        PhraseQuery(terms=("guinea", "pig"), slop=4), TermQuery(term="cavy")
    )
    assert (
        create_phrase_query("guinea pig", standard_analyze, _map(), slop=4)
        == expected
    )


@pytest.mark.parametrize("occur", [Occur.SHOULD, Occur.MUST])
def test_multiword_synonyms_boolean(occur):
    # testMultiWordSynonymsBoolean: graph segments are ALWAYS wrapped
    m = _map()

    def wrap(*qs):
        return BooleanQuery(clauses=tuple(BooleanClause(q, occur) for q in qs))

    assert create_boolean_query(
        "guinea pig", standard_analyze, m, operator=occur
    ) == wrap(SYN_BOOL)
    assert create_boolean_query(
        "guinea pig story", standard_analyze, m, operator=occur
    ) == wrap(SYN_BOOL, TermQuery(term="story"))
    assert create_boolean_query(
        "the guinea pig story", standard_analyze, m, operator=occur
    ) == wrap(TermQuery(term="the"), SYN_BOOL, TermQuery(term="story"))
    assert create_boolean_query(
        "the guinea pig story guinea pig", standard_analyze, m, operator=occur
    ) == wrap(TermQuery(term="the"), SYN_BOOL, TermQuery(term="story"), SYN_BOOL)


@pytest.mark.parametrize("occur", [Occur.SHOULD, Occur.MUST])
def test_multiword_phrase_synonyms_boolean(occur):
    # testMultiWordPhraseSynonymsBoolean: auto_phrase=True makes each
    # multi-token side path a slop-0 phrase
    m = _map()

    def wrap(*qs):
        return BooleanQuery(clauses=tuple(BooleanClause(q, occur) for q in qs))

    assert create_boolean_query(
        "guinea pig", standard_analyze, m, operator=occur, auto_phrase=True
    ) == wrap(SYN_PHRASE)
    assert create_boolean_query(
        "guinea pig story", standard_analyze, m, operator=occur, auto_phrase=True
    ) == wrap(SYN_PHRASE, TermQuery(term="story"))


def test_mixed_flat_synonym_inside_graph_query():
    # dogs (flat synonym position) next to a graph segment
    m = _map()
    got = create_boolean_query("dogs guinea pig", standard_analyze, m)
    assert got == should(SynonymQuery(terms=("dogs", "dog")), SYN_BOOL)


def test_plain_phrase_and_boolean_unaffected():
    m = _map()
    assert create_phrase_query("old story", standard_analyze, m) == PhraseQuery(
        terms=("old", "story")
    )
    assert create_boolean_query(
        "old story", standard_analyze, m, operator=Occur.MUST
    ) == must(TermQuery(term="old"), TermQuery(term="story"))


def test_operator_validation():
    with pytest.raises(ValueError):
        create_field_query(
            "x", standard_analyze, None, operator=Occur.MUST_NOT
        )


def test_graph_phrase_path_explosion_raises():
    # TestQueryBuilder.java:546 analyzeGraphPhrase TooManyClauses analog
    rules = "\n".join(f"w{i}, a{i}, b{i}" for i in range(11))
    m = _map(text=rules)
    text = " ".join(f"w{i}" for i in range(11))  # 3^11 paths > 1024
    # all-flat synonyms are NOT a graph; force a graph with one multiword
    m.add(("w0",), ("two", "words"))
    with pytest.raises(TooManyClauses):
        create_phrase_query(text, standard_analyze, m)


def test_no_synonym_map_plain_queries():
    assert create_boolean_query("old dogs", standard_analyze, None) == should(
        TermQuery(term="old"), TermQuery(term="dogs")
    )


# --- graph token stream / TermAutomatonQuery bridge ------------------------

def test_segments_to_token_stream_geometry():
    m = _map()
    segs = expand_graph(["guinea", "pig", "story"], m)
    ts = segments_to_token_stream(segs)
    # guinea: start 0 -> inserted 1; cavy: parallel single edge 0 -> 2;
    # pig: 1 -> 2; story: 2 -> 3
    assert ts == [
        ("guinea", 1, 1),
        ("cavy", 0, 2),
        ("pig", 1, 1),
        ("story", 1, 1),
    ]


def test_token_stream_feeds_term_automaton():
    m = _map()
    segs = expand_graph(["guinea", "pig", "story"], m)
    q = token_stream_to_term_automaton(segments_to_token_stream(segs))
    assert q is not None  # builds + finishes without holes


def test_parallel_multitoken_paths_get_distinct_states():
    m = _map(text="a b, c d\n")
    segs = expand_graph(["a", "b"], m)
    ts = segments_to_token_stream(segs)
    # distinct inserted positions: no cross-path string "a d" / "c b"
    assert ts == [("a", 1, 1), ("c", 0, 2), ("b", 1, 2), ("d", 1, 1)]
