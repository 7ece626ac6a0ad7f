"""Payloads (queries/payloads + DelimitedPayloadTokenFilter): parsing and
the payload functions checked against hand-computed values."""

import pytest

from lucene_spark.functions.payloads import parse_delimited_payloads, payload_score


@pytest.fixture(scope="module")
def payloads(spark):
    docs = spark.createDataFrame(
        [
            (0, "The|0.5 quick|2.0 fox|1.5 quick|4.0"),
            (1, "quick brown|1.0"),          # first token: no payload
            (2, "a|b|3.25 neg|-2.0"),        # multi-delimiter: split at LAST
            (3, "quick|x fox|2.5"),          # non-numeric suffix -> absent
            (4, "slow|1.0 fox|0.25"),
            (5, "quick|1.0 fox|2.0 quick|3.0 fox|4.0"),
        ],
        "doc_id long, text string",
    )
    return parse_delimited_payloads(docs, "doc_id", "text").cache()


def test_parsing(payloads):
    rows = {
        (r["doc_id"], r["pos"]): (r["term"], r["payload"])
        for r in payloads.collect()
    }
    assert rows[(0, 0)] == ("the", 0.5)       # lowercased
    assert rows[(0, 3)] == ("quick", 4.0)
    assert rows[(1, 0)] == ("quick", None)    # no delimiter -> no payload
    assert rows[(2, 0)] == ("a|b", 3.25)      # LAST-delimiter split
    assert rows[(2, 1)] == ("neg", -2.0)
    assert rows[(3, 0)] == ("quick", None)    # non-numeric -> absent


@pytest.mark.parametrize(
    "fn,exp",
    [
        ("sum", {0: 6.0, 1: 1.0, 3: 1.0, 5: 4.0}),
        ("max", {0: 4.0, 1: 1.0, 3: 1.0, 5: 3.0}),
        ("min", {0: 2.0, 1: 1.0, 3: 1.0, 5: 1.0}),
        ("avg", {0: 3.0, 1: 1.0, 3: 1.0, 5: 2.0}),
    ],
)
def test_payload_functions_single_term(payloads, fn, exp):
    # 'quick': doc0 payloads {2.0, 4.0}; doc1 {} (matches, seen=0 -> 1.0);
    # doc3 {} (unparsable); doc5 {1.0, 3.0}
    got = {
        int(r["doc_id"]): float(r["score"])
        for r in payload_score(payloads, "quick", fn).collect()
    }
    assert got == pytest.approx(exp)


def test_negative_doc_score_is_zero(payloads):
    got = {
        int(r["doc_id"]): float(r["score"])
        for r in payload_score(payloads, "neg", "sum").collect()
    }
    assert got == {2: 0.0}


def test_adjacent_pair_payloads(payloads):
    # quick->fox adjacent: doc0 (quick@1 2.0, fox@2 1.5); doc5 both pairs
    # (1.0+2.0 and 3.0+4.0); doc3 matches with only fox's payload (2.5)
    got = {
        int(r["doc_id"]): float(r["score"])
        for r in payload_score(payloads, ("quick", "fox"), "sum").collect()
    }
    assert got == pytest.approx({0: 3.5, 3: 2.5, 5: 10.0})


def _brute_chain_scores(toks_by_doc, terms, slop, fn):
    """Greedy NearSpansOrdered chains + PayloadSpanCollector, from scratch:
    per start position of terms[0], each later clause takes its minimal
    position past the previous; match iff width - (n-1) <= slop; every
    chain position's payload feeds the function."""
    out = {}
    n = len(terms)
    for doc_id, toks in toks_by_doc.items():
        pos = {}
        for p, (t, pl) in enumerate(toks):
            pos.setdefault(t, []).append((p, pl))
        if not all(t in pos for t in terms):
            continue
        collected = []
        matched = False
        for p0, pl0 in pos[terms[0]]:
            chain = [(p0, pl0)]
            prev = p0
            ok = True
            for t in terms[1:]:
                nxts = [(p, pl) for p, pl in pos[t] if p > prev]
                if not nxts:
                    ok = False
                    break
                chain.append(nxts[0])
                prev = nxts[0][0]
            if ok and (prev - p0 - (n - 1)) <= slop:
                matched = True
                collected += [pl for _p, pl in chain if pl is not None]
        if not matched:
            continue
        if not collected:
            out[doc_id] = 1.0
            continue
        v = {
            "sum": sum(collected),
            "min": min(collected),
            "max": max(collected),
            "avg": sum(collected) / len(collected),
        }[fn]
        out[doc_id] = max(v, 0.0)
    return out


@pytest.mark.parametrize("slop", [0, 1, 3])
@pytest.mark.parametrize("fn", ["sum", "min", "max", "avg"])
def test_chain3_matches_brute(spark, slop, fn):
    """3-term ordered chains with slop vs the from-scratch chain scorer
    (queries/payloads/PayloadScoreQuery.java over an ordered
    SpanNearQuery)."""
    import random

    rng = random.Random(20260818 + slop)
    vocab = ["a", "b", "c", "d"]
    toks_by_doc = {
        d: [
            (rng.choice(vocab), rng.choice([0.5, 1.5, 2.0, None]))
            for _ in range(rng.randint(1, 15))
        ]
        for d in range(120)
    }
    rows = [
        (d, " ".join(t if pl is None else f"{t}|{pl}" for t, pl in toks))
        for d, toks in toks_by_doc.items()
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tbl = parse_delimited_payloads(docs, "doc_id", "text")
    terms = ("a", "b", "a")
    got = {
        int(r["doc_id"]): float(r["score"])
        for r in payload_score(tbl, terms, fn, slop=slop).collect()
    }
    exp = _brute_chain_scores(toks_by_doc, terms, slop, fn)
    assert got == pytest.approx(exp)


def test_chain_reduces_to_pair_at_slop0(payloads):
    got = {
        int(r["doc_id"]): float(r["score"])
        for r in payload_score(payloads, ("quick", "fox"), "sum", slop=0).collect()
    }
    assert got == pytest.approx({0: 3.5, 3: 2.5, 5: 10.0})


def test_include_span_score(spark, payloads):
    span = spark.createDataFrame(
        [(0, 2.0), (1, 3.0), (3, 10.0), (5, 0.5)], "doc_id long, score double"
    )
    got = {
        int(r["doc_id"]): float(r["score"])
        for r in payload_score(payloads, "quick", "sum", span_scores=span).collect()
    }
    assert got == pytest.approx({0: 12.0, 1: 3.0, 3: 10.0, 5: 2.0})
