"""Phonetic encoders vs the reference's filter test vectors
(analysis/phonetic: TestPhoneticFilter.java, TestDoubleMetaphoneFilter.java)
plus classic published vectors for the encoders themselves, and the index
integration (inject posIncr=0 / replace semantics)."""

from lucene_spark.phonetic import (
    PhoneticConfig,
    caverphone2,
    cologne_phonetic,
    double_metaphone,
    metaphone,
    nysiis,
    phonetic_from_json,
    refined_soundex,
    soundex,
)

# -- TestPhoneticFilter.testAlgorithms vectors ------------------------------


def test_metaphone_filter_vectors():
    assert [metaphone(w) for w in "aaa bbb ccc easgasg".split()] == [
        "A", "B", "KKK", "ESKS"
    ]


def test_double_metaphone_filter_vectors():
    assert [double_metaphone(w) for w in "aaa bbb ccc easgasg".split()] == [
        "A", "PP", "KK", "ASKS"
    ]


def test_soundex_filter_vectors():
    assert [soundex(w) for w in "aaa bbb ccc easgasg".split()] == [
        "A000", "B000", "C000", "E220"
    ]


def test_refined_soundex_filter_vectors():
    assert [refined_soundex(w) for w in "aaa bbb ccc easgasg".split()] == [
        "A0", "B1", "C3", "E034034"
    ]


def test_caverphone2_filter_vectors():
    assert [caverphone2(w) for w in "Darda Karleen Datha Carlene".split()] == [
        "TTA1111111", "KLN1111111", "TTA1111111", "KLN1111111"
    ]


def test_nysiis_filter_vectors():
    assert [nysiis(w) for w in "aaa bbb ccc easgasg".split()] == [
        "A", "B", "C", "EASGAS"
    ]


# -- TestDoubleMetaphoneFilter vectors --------------------------------------


def test_dm_international():
    assert double_metaphone("international") == "ANTR"
    assert double_metaphone("international", 8) == "ANTRNXNL"


def test_dm_alternate():
    """Kuczewski: primary KSSK, alternate KXFS (slavo-germanic branch)."""
    assert double_metaphone("Kuczewski") == "KSSK"
    assert double_metaphone("Kuczewski", alternate=True) == "KXFS"


def test_dm_non_convertible():
    assert double_metaphone("12345") == ""
    assert double_metaphone("#$%@#^%&") == ""
    assert double_metaphone("hello", 8) == "HL"


# -- classic published vectors ----------------------------------------------


def test_soundex_classics():
    assert soundex("Robert") == "R163"
    assert soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == "A261"  # H/W transparency
    assert soundex("Ashcroft") == "A261"
    assert soundex("Tymczak") == "T522"
    assert soundex("Pfister") == "P236"


def test_metaphone_classics():
    exp = {
        "howl": "HL", "The": "0", "quick": "KK", "brown": "BRN",
        "fox": "FKS", "jumped": "JMPT", "over": "OFR", "lazy": "LS",
        "dogs": "TKS", "Knight": "NT", "Xavier": "SFR", "Wright": "RT",
    }
    for w, e in exp.items():
        assert metaphone(w) == e, (w, metaphone(w), e)
    assert metaphone("12345") == ""


def test_cologne_classics():
    assert cologne_phonetic("Müller-Lüdenscheidt") == "65752682"
    assert cologne_phonetic("Breschnew") == "17863"
    assert cologne_phonetic("Wikipedia") == "3412"


def test_dm_phonetic_matches():
    """The point of the algorithm: spelling variants share a code."""
    assert (
        double_metaphone("Smith", alternate=True)
        == double_metaphone("Schmidt")
        == "XMT"
    )
    assert double_metaphone("Wasserman", alternate=True).startswith("F")
    assert double_metaphone("Filipowicz") == "FLPT"  # -WICZ -> TS


# -- PhoneticConfig transform semantics -------------------------------------


def test_transform_inject():
    p = PhoneticConfig("metaphone", inject=True)
    assert p.transform("customer") == ("customer", ["KSTM"])
    assert p.transform("12345") == ("12345", [])  # non-convertible untouched


def test_transform_replace():
    p = PhoneticConfig("soundex", inject=False)
    assert p.transform("customer") == ("C235", [])
    assert p.transform("12345") == ("12345", [])


def test_transform_dm_alternate_modes():
    pi = PhoneticConfig("doublemetaphone", inject=True)
    assert pi.transform("kuczewski") == ("kuczewski", ["KSSK", "KXFS"])
    pr = PhoneticConfig("doublemetaphone", inject=False)
    # replace: primary replaces, alternate still overlaps
    assert pr.transform("kuczewski") == ("KSSK", ["KXFS"])


def test_config_json_round_trip():
    p = PhoneticConfig("caverphone", inject=False, max_code_len=6)
    assert phonetic_from_json(p.to_json()) == p
    assert phonetic_from_json(None) is None
    try:
        PhoneticConfig("nope")
        assert False
    except ValueError:
        pass


# -- index integration ------------------------------------------------------


def test_phonetic_index_inject_and_norm_discount(spark):
    """inject=True: encoded overlap joins each token's position
    (norm-discounted); the code term is searchable and phrase-composable."""
    import numpy as np

    from lucene_spark.build import IndexConfig, build_index, read_index, write_index
    from lucene_spark.check import check_index
    from lucene_spark.query import PhraseQuery, TermQuery
    from lucene_spark.search import Searcher

    pho = PhoneticConfig("doublemetaphone", inject=True)
    rows = [(0, "smith runs fast"), (1, "schmidt joins"), (2, "table scan")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = IndexConfig(
        chain="standard", with_positions=True, seg_size=64, phonetic=pho
    )
    idx = build_index(df, cfg, content_col="text", doc_id_col="doc_id",
                      auto_seg_size=False, eager=True)
    got = {
        int(r["doc_id"]): (int(r["length"]), int(r["num_overlap"]))
        for r in idx.docs.collect()
    }
    # smith -> SM0/XMT (2 extras), runs -> RNS, fast -> FST: 3+4=7? smith
    # injects both primary and alternate; runs/fast one each
    assert got[0] == (7, 4)
    s = Searcher(idx, dtype=np.float64)
    # "smith" (SM0|XMT) and "schmidt" (XMT alternate) meet on XMT
    assert sorted(
        int(r["doc_id"]) for r in s.matches(TermQuery(term="XMT")).collect()
    ) == [0, 1]
    # the injected code sits at the source token's position
    assert [
        int(r["doc_id"])
        for r in s.matches(PhraseQuery(terms=("SM0", "runs"))).collect()
    ] == [0]
    check_index(idx)
    path = str(__import__("tempfile").mkdtemp()) + "/phidx"
    write_index(idx, path)
    r = read_index(spark, path)
    assert r.config.phonetic == pho
    check_index(r)
    idx.unpersist()


def test_phonetic_index_replace_mode(spark):
    """inject=False: the code REPLACES the token (original not searchable)."""
    import numpy as np

    from lucene_spark.build import IndexConfig, build_index
    from lucene_spark.query import TermQuery
    from lucene_spark.search import Searcher

    pho = PhoneticConfig("soundex", inject=False)
    rows = [(0, "smith runs"), (1, "smyth sprints")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = IndexConfig(
        chain="standard", with_positions=False, seg_size=64, phonetic=pho
    )
    idx = build_index(df, cfg, content_col="text", doc_id_col="doc_id",
                      auto_seg_size=False, eager=True)
    s = Searcher(idx, dtype=np.float64)
    assert sorted(
        int(r["doc_id"]) for r in s.matches(TermQuery(term="S530")).collect()
    ) == [0, 1]
    assert s.matches(TermQuery(term="smith")).count() == 0
    idx.unpersist()


def test_entry_phonetic_map_consistency():
    """__spark_entry__._PHONETIC_MAP rows must equal what the engine's
    DoubleMetaphone inject mode produces for the corpus vocabulary (the
    oracle injects from this map; the algorithm itself is pinned by the
    reference vectors above)."""
    import __spark_entry__ as e

    p = PhoneticConfig("doublemetaphone", inject=True)
    for word, codes in e._PHONETIC_MAP:
        assert p.transform(word) == (word, codes), word


# -- Daitch-Mokotoff Soundex ------------------------------------------------


def test_dm_soundex_filter_vectors():
    """TestDaitchMokotoffSoundexFilter.testAlgorithms (set-compare: branch
    emission order is a documented envelope)."""
    from lucene_spark.phonetic import daitch_mokotoff as dms

    assert dms("aaa") == ["000000"]
    assert dms("bbb") == ["700000"]
    assert set(dms("ccc")) == {
        "400000", "450000", "454000", "540000", "545000", "500000"
    }
    assert dms("easgasg") == ["045450"]


def test_dm_soundex_published_examples():
    """Canonical examples from the published D-M coding chart."""
    from lucene_spark.phonetic import daitch_mokotoff as dms

    assert dms("GOLDEN") == ["583600"]
    assert dms("Moskowitz") == ["645740"]
    assert set(dms("Auerbach")) == {"097400", "097500"}
    assert set(dms("Peters")) == {"739400", "734000"}
    assert dms("Mintz") == ["664000"]  # -ntz collapses, mn would force 66
    assert dms("12345") == []


def test_dm_soundex_transform_modes():
    p = PhoneticConfig("daitchmokotoff", inject=True)
    repl, extras = p.transform("ccc")
    assert repl == "ccc" and len(extras) == 6
    r = PhoneticConfig("daitchmokotoff", inject=False)
    repl, extras = r.transform("bbb")
    assert repl == "700000" and extras == []
