"""FieldMaskingSpanQuery and SpanPositionRangeQuery parity
(search/spans/FieldMaskingSpanQuery.java, SpanPositionRangeQuery.java):
masked clauses stream positions from their own field while norms and
collection statistics stay on the mask field; position-range keeps spans
with spanStart >= start and spanEnd <= end."""

import numpy as np
import pytest

from lucene_spark.build import IndexConfig, build_index
from lucene_spark.query import (
    FieldMaskedTerm,
    SpanFirstQuery,
    SpanNearQuery,
    SpanPositionRangeQuery,
)
from lucene_spark.search import MultiFieldSearcher, Searcher

import os, sys
sys.path.insert(0, os.path.dirname(__file__))
from oracle import (
    BruteForceIndex,
    _near_spans_ordered_freq,
    _near_spans_unordered_freq,
    f32,
    make_corpus,
)


@pytest.fixture(scope="module")
def masked(spark):
    # two PARALLEL positional fields over one doc set (the reference
    # javadoc's teacher first/last shape): same token count per doc, so
    # ordinals are comparable across fields
    a = make_corpus(150, ["alpha", "beta", "gamma", "delta"], seed=7)
    b = [
        " ".join(
            ["zeta" if (i + j) % 3 == 0 else "eta" for j in range(len(t.split()))]
        )
        for i, t in enumerate(a)
    ]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(zip(a, b))],
        "doc_id long, fa string, fb string",
    )
    cfg = IndexConfig(seg_size=64, with_positions=True)
    ia = build_index(df, cfg, content_col="fa", doc_id_col="doc_id",
                     auto_seg_size=False, eager=True)
    ib = build_index(df, cfg, content_col="fb", doc_id_col="doc_id",
                     auto_seg_size=False, eager=True)
    yield {
        "s": MultiFieldSearcher(
            {"a": Searcher(ia, dtype=np.float32),
             "b": Searcher(ib, dtype=np.float32)},
            default_field="a",
        ),
        "sa": Searcher(ia, dtype=np.float32),
        "oa": BruteForceIndex(a),
        "ob": BruteForceIndex(b),
    }
    ia.unpersist()
    ib.unpersist()


def _got(df):
    return [(int(r["doc_id"]), np.float32(r["score"])) for r in df.collect()]


def _expected_masked(oa, ob, clauses, slop, in_order, norm_idx):
    """clauses = [(which_index, term)]; norms/avgdl from norm_idx."""
    freqs = {}
    for d in range(oa.doc_count):
        lists = [o.positions[d].get(t) for o, t in clauses]
        if any(p is None for p in lists):
            continue
        f = (
            _near_spans_ordered_freq(lists, slop)
            if in_order
            else _near_spans_unordered_freq(lists, slop)
        )
        if f:
            freqs[d] = f
    w = f32(1.0) * f32(sum(float(o.idf(t)) for o, t in clauses))
    out = {}
    for d, freq in freqs.items():
        inv = norm_idx.cache[norm_idx.norms[d]]
        out[d] = w - w / (f32(1.0) + f32(freq) * inv)
    return BruteForceIndex.topk(out, 10)


def test_masked_ordered_cross_field(masked):
    s, oa, ob = masked["s"], masked["oa"], masked["ob"]
    q = SpanNearQuery(
        terms=("alpha", FieldMaskedTerm(field="b", term="zeta")),
        slop=2, in_order=True,
    )
    exp = _expected_masked(oa, ob, [(oa, "alpha"), (ob, "zeta")], 2, True, oa)
    assert _got(s.search(q, 10)) == [(d, np.float32(v)) for d, v in exp]


def test_masked_unordered_cross_field(masked):
    s, oa, ob = masked["s"], masked["oa"], masked["ob"]
    q = SpanNearQuery(
        terms=("beta", FieldMaskedTerm(field="b", term="eta")),
        slop=3, in_order=False,
    )
    exp = _expected_masked(oa, ob, [(oa, "beta"), (ob, "eta")], 3, False, oa)
    assert _got(s.search(q, 10)) == [(d, np.float32(v)) for d, v in exp]


def test_masked_all_clauses_foreign_field_uses_mask_norms(masked):
    """Every clause masked from field b, but the query's field is a: the
    norms and collection stats must still be field a's (SpanWeight reads
    getNormValues(getField()))."""
    s, oa, ob = masked["s"], masked["oa"], masked["ob"]
    q = SpanNearQuery(
        terms=(
            FieldMaskedTerm(field="b", term="zeta"),
            FieldMaskedTerm(field="b", term="eta"),
        ),
        slop=1, in_order=True,
    )
    exp = _expected_masked(oa, ob, [(ob, "zeta"), (ob, "eta")], 1, True, oa)
    assert _got(s.search(q, 10)) == [(d, np.float32(v)) for d, v in exp]


def test_masked_on_single_field_searcher_raises(masked):
    q = SpanNearQuery(
        terms=("alpha", FieldMaskedTerm(field="b", term="zeta")),
        slop=2, in_order=True,
    )
    with pytest.raises(ValueError, match="MultiFieldSearcher"):
        masked["sa"].search(q, 10).collect()


def test_position_range_term(masked):
    sa, oa = masked["sa"], masked["oa"]
    lo, hi = 2, 9
    freqs = {}
    for d in range(oa.doc_count):
        ps = [p for p in oa.positions[d].get("gamma", ()) if lo <= p and p + 1 <= hi]
        if ps:
            freqs[d] = 0.5 * len(ps)
    exp = BruteForceIndex.topk(oa._freq_score(freqs, ["gamma"], 1.0), 10)
    q = SpanPositionRangeQuery(match="gamma", start=lo, end=hi)
    assert _got(sa.search(q, 10)) == [(d, np.float32(v)) for d, v in exp]


def test_position_range_start0_equals_span_first(masked):
    sa = masked["sa"]
    got_pr = _got(
        sa.search(SpanPositionRangeQuery(match="delta", start=0, end=5), 10)
    )
    got_sf = _got(sa.search(SpanFirstQuery(term="delta", end=5), 10))
    assert got_pr == got_sf and got_pr


def test_position_range_over_near_spans(masked):
    from lucene_spark import matchers

    sa, oa = masked["sa"], masked["oa"]
    lo, hi = 1, 12
    sub = SpanNearQuery(terms=("alpha", "beta"), slop=4, in_order=True)
    freqs = {}
    for d in range(oa.doc_count):
        lists = [oa.positions[d].get(t) for t in ("alpha", "beta")]
        if any(p is None for p in lists):
            continue
        ss, ee = matchers.ordered_chain_spans(
            [np.asarray(p, dtype=np.int64) for p in lists], 4
        )
        keep = (ss >= lo) & (ee <= hi)
        if keep.any():
            freqs[d] = float(np.sum(1.0 / (1.0 + (ee[keep] - ss[keep]))))
    exp = BruteForceIndex.topk(
        oa._freq_score(freqs, ["alpha", "beta"], 1.0), 10
    )
    q = SpanPositionRangeQuery(match=sub, start=lo, end=hi)
    assert _got(sa.search(q, 10)) == [(d, np.float32(v)) for d, v in exp]


# ---- Intervals.fixField (FixedFieldIntervalsSource) ----


def _brute_fixfield_interval_freq(lists, max_gaps):
    """Ordered minimal intervals over cross-field position lists (the
    staircase definition), maxgaps-filtered, minExtent = clause count."""
    import itertools

    n = len(lists)
    cands = set()
    for tup in itertools.product(*lists):
        if all(tup[i] < tup[i + 1] for i in range(n - 1)):
            cands.add((tup[0], tup[-1]))
    minimal = {
        (s, e)
        for (s, e) in cands
        if not any(
            s2 >= s and e2 <= e and (s2, e2) != (s, e) for (s2, e2) in cands
        )
    }
    freq = 0.0
    for s, e in minimal:
        if max_gaps >= 0 and (e - s + 1) - n > max_gaps:
            continue
        freq += 1.0 / max((e - s + 1) - n + 1, 1)
    return freq


@pytest.mark.parametrize("max_gaps", [-1, 2])
def test_intervals_fixfield_matches_brute(masked, max_gaps):
    from lucene_spark.query import IntervalQuery

    q = IntervalQuery(
        terms=(FieldMaskedTerm(field="b", term="zeta"), "beta"),
        ordered=True,
        max_gaps=max_gaps,
    )
    got = dict(_got(masked["s"].search(q, 200)))
    oa, ob = masked["oa"], masked["ob"]
    exp = {}
    for d in range(oa.doc_count):
        pz = ob.positions[d].get("zeta")
        pb = oa.positions[d].get("beta")
        if pz is None or pb is None:
            continue
        f = _brute_fixfield_interval_freq([pz, pb], max_gaps)
        if f > 0:
            exp[d] = np.float32(1.0 - 1.0 / (f + 1.0))
    assert set(got) == set(exp)
    for d in exp:
        assert got[d] == pytest.approx(float(exp[d]), rel=1e-6)


def test_intervals_fixfield_single_field_raises(masked):
    from lucene_spark.query import IntervalQuery

    q = IntervalQuery(
        terms=(FieldMaskedTerm(field="b", term="zeta"), "beta"), ordered=True
    )
    with pytest.raises(NotImplementedError):
        masked["sa"].search(q, 10)
