"""Analyzer parity tests. Expected token sequences mirror the reference's own
expectations in core/src/test/.../standard/TestStandardAnalyzer.java
(assertAnalyzesTo calls) restricted to the ASCII envelope we support."""

import pandas as pd
import pytest

from lucene_spark.analysis import (
    MAX_TOKEN_LENGTH,
    TOKEN_RE,
    analyze_series,
    code_analyze,
    standard_analyze,
    stop_filter,
    tokenize,
    word_delimiter_parts,
)


# (input, expected) — drawn from TestStandardAnalyzer.java:394-439 and
# TestSearch.java-style plain text
CASES = [
    ("testing 1234", ["testing", "1234"]),
    ("B2B", ["b2b"]),
    ("2B", ["2b"]),
    ("ac/dc", ["ac", "dc"]),
    ("O'Reilly", ["o'reilly"]),
    ("you're", ["you're"]),
    ("O'Reilly's", ["o'reilly's"]),
    ("21.35", ["21.35"]),
    ("R2D2 C3PO", ["r2d2", "c3po"]),
    ("216.239.63.104", ["216.239.63.104"]),
    ('"QUOTED" word', ["quoted", "word"]),
    ("", []),
    (".", []),
    (" ", []),
    ("snake_case_id", ["snake_case_id"]),  # _ = ExtendNumLet joins
    ("a_1", ["a_1"]),
    ("__init__", ["__init__"]),
    ("foo.bar", ["foo.bar"]),  # . = MidNumLet between letters joins
    ("foo..bar", ["foo", "bar"]),  # double punctuation breaks
    ("1,234", ["1,234"]),
    ("1, 234", ["1", "234"]),
    ("a-b", ["a", "b"]),  # hyphen always breaks
    ("x=y+z;", ["x", "y", "z"]),
    ("don't stop", ["don't", "stop"]),
]


@pytest.mark.parametrize("text,expected", CASES)
def test_standard_analyze(text, expected):
    assert standard_analyze(text) == expected


def test_max_token_length_chop():
    long = "a" * 600
    toks = tokenize(long)
    assert toks == ["a" * 255, "a" * 255, "a" * 90]
    assert all(len(t) <= MAX_TOKEN_LENGTH for t in toks)


def test_vectorized_matches_scalar():
    texts = pd.Series([c[0] for c in CASES])
    out = analyze_series(texts, chain="standard")
    for got, (_, expected) in zip(out, CASES):
        assert got == expected


WDF_CASES = [
    ("camelCaseId", ["camel", "case", "id"]),
    ("snake_case", ["snake", "case"]),
    ("num2mixed3", ["num", "2", "mixed", "3"]),
    ("HTTPServer", ["http", "server"]),
    ("getX", ["get", "x"]),
    ("plain", ["plain"]),
    ("__dunder__", ["dunder"]),
]


@pytest.mark.parametrize("text,expected", WDF_CASES)
def test_code_analyze(text, expected):
    assert code_analyze(text) == expected


def test_word_delimiter_parts_case_preserved_until_lowercase():
    assert word_delimiter_parts("HTTPServer") == ["HTTP", "Server"]


def test_stop_filter_holes_advance_positions():
    toks = standard_analyze("the quick the fox")
    kept = stop_filter(toks, frozenset({"the"}))
    assert kept == [("quick", 1), ("fox", 3)]


def test_regex_is_cross_engine_safe():
    # no backreferences / lookbehind — portable to RE2 (DuckDB) + Java regex
    assert "\\1" not in TOKEN_RE and "(?<" not in TOKEN_RE and "(?=" not in TOKEN_RE


def test_flat_tokenize_equivalence():
    """Batch fast path == compositional chain, both chains, incl. chop."""
    import numpy as np

    from lucene_spark.analysis import flat_tokenize

    texts = [c[0] for c in CASES] + [w[0] for w in WDF_CASES] + ["x" * 600 + " yQz"]
    s = pd.Series(texts)
    for chain, fn in (("standard", standard_analyze), ("code", code_analyze)):
        flat, counts = flat_tokenize(s, chain=chain)
        expected = [fn(t) for t in texts]
        assert counts.tolist() == [len(e) for e in expected]
        assert flat.tolist() == [t for e in expected for t in e]


def test_duckdb_and_spark_regex_agree():
    import duckdb

    from lucene_spark.analysis import duckdb_token_re

    texts = [c[0] for c in CASES if c[0].strip()]
    for t in texts:
        got = duckdb.sql(
            "select regexp_extract_all(lower(?), '" + duckdb_token_re() + "')",
            params=[t],
        ).fetchone()[0]
        assert got == standard_analyze(t), t


# ---- ASCII folding chain (ASCIIFoldingFilter analog) ----


def test_fold_ascii_reference_cases():
    from lucene_spark.analysis import fold_ascii

    assert fold_ascii("Crème Brûlée") == "Creme Brulee"
    assert fold_ascii("café ñoño Ærø") == "cafe nono AEro"
    assert fold_ascii("straße Łódź") == "strasse Lodz"
    assert fold_ascii("Þór døgn") == "THor dogn"
    assert fold_ascii("plain ascii 123") == "plain ascii 123"


def test_fold_chain_tokenizes_whole_words():
    import pandas as pd

    from lucene_spark.analysis import flat_tokenize

    s = pd.Series(["Crème café ß"])
    flat, counts = flat_tokenize(s, chain="standard_fold")
    assert list(flat) == ["creme", "cafe", "ss"]
    assert counts.tolist() == [3]
    # WITHOUT folding the non-ASCII chars break tokens apart
    flat2, _ = flat_tokenize(s, chain="standard")
    assert "creme" not in list(flat2)


def test_fold_chain_batch_equals_scalar():
    import pandas as pd

    from lucene_spark.analysis import analyze_series, flat_tokenize

    texts = pd.Series(["École élève", "naïve coöperate", "Ærøskøbing"])
    flat, counts = flat_tokenize(texts, chain="standard_fold")
    via_series = [t for lst in analyze_series(texts, chain="standard_fold") for t in lst]
    assert list(flat) == via_series


def test_english_stop_words_set():
    from lucene_spark.analysis import ENGLISH_STOP_WORDS, stop_filter

    assert len(ENGLISH_STOP_WORDS) == 33  # EnglishAnalyzer.java:46-51
    assert {"the", "into", "such", "will"} <= ENGLISH_STOP_WORDS
    assert "from" not in ENGLISH_STOP_WORDS  # famously NOT in the set
    kept = stop_filter(["the", "quick", "fox"], ENGLISH_STOP_WORDS)
    assert kept == [("quick", 1), ("fox", 2)]  # hole at position 0


def test_index_time_synonyms_overlaps_and_norm_discount(spark):
    """posIncr=0 synonym injection: length/tf/sttf count the injected
    token, the norm byte discounts it (numOverlap), phrases accept the
    synonym at the base position, and the commit point round-trips the
    config."""
    import numpy as np
    from lucene_spark.build import IndexConfig, build_index, read_index, write_index
    from lucene_spark.check import check_index
    from lucene_spark.query import PhraseQuery, TermQuery
    from lucene_spark.search import Searcher

    rows = [(0, "the fast table runs"), (1, "a quick brown fox"), (2, "fast and slow")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = IndexConfig(
        chain="standard", with_positions=True, seg_size=64,
        synonyms=(("fast", ("quick",)),),
    )
    idx = build_index(df, cfg, content_col="text", doc_id_col="doc_id",
                      auto_seg_size=False, eager=True)
    got = {
        int(r["doc_id"]): (int(r["length"]), int(r["num_overlap"]), int(r["norm"]))
        for r in idx.docs.collect()
    }
    # doc0: 4 base tokens + 1 injected -> length 5, overlap 1, norm byte4(4)
    assert got == {0: (5, 1, 4), 1: (4, 0, 4), 2: (4, 1, 3)}
    assert idx.stats.sum_total_term_freq == 13  # 11 base + 2 injected
    s = Searcher(idx, dtype=np.float64)
    assert sorted(
        int(r["doc_id"]) for r in s.matches(TermQuery(term="quick")).collect()
    ) == [0, 1, 2]
    assert [
        int(r["doc_id"])
        for r in s.matches(PhraseQuery(terms=("quick", "table"))).collect()
    ] == [0]
    check_index(idx)
    path = str(__import__("tempfile").mkdtemp()) + "/synidx"
    write_index(idx, path)
    r = read_index(spark, path)
    assert r.config.synonyms == (("fast", ("quick",)),)
    check_index(r)
    idx.unpersist()
