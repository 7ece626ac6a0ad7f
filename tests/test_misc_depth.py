"""SweetSpotSimilarity, DocValuesStatsCollector, geo distance sort vs
brute-force oracles (misc/SweetSpotSimilarity.java,
misc/search/DocValuesStats.java, document/LatLonPointSortField)."""

import math

import numpy as np
import pytest

from lucene_spark.build import IndexConfig, build_index
from lucene_spark.functions.dvstats import doc_values_stats
from lucene_spark.functions.geo import EARTH_RADIUS_M, distance_sort
from lucene_spark.query import TermQuery
from lucene_spark.search import Searcher
from lucene_spark.similarities import SweetSpot
from lucene_spark.smallfloat import byte4_to_int, int_to_byte4

import os, sys
sys.path.insert(0, os.path.dirname(__file__))
from oracle import BruteForceIndex, make_corpus

f32 = np.float32


@pytest.fixture(scope="module")
def ss(spark):
    texts = make_corpus(150, ["red", "blue", "spark", "the"], seed=71,
                        min_len=1, max_len=40)
    vals = [None if i % 9 == 0 else (i * 3) % 50 for i in range(150)]
    df = spark.createDataFrame(
        [(i, t, v) for i, (t, v) in enumerate(zip(texts, vals))],
        "doc_id long, text string, nval long",
    )
    idx = build_index(
        df, IndexConfig(seg_size=64, with_positions=False,
                        store_cols=("nval",)),
        content_col="text", doc_id_col="doc_id",
        auto_seg_size=False, eager=True,
    )
    yield {"texts": texts, "vals": vals, "idx": idx,
           "o": BruteForceIndex(texts)}
    idx.unpersist()


def brute_sweetspot(o, term, ln_min, ln_max, steep, tf_base, tf_min):
    n = o.doc_count
    df_ = o.doc_freq(term)
    idf = f32(math.log((n + 1) / float(df_ + 1)) + 1.0)
    out = {}
    for d, tf in enumerate(o.tfs):
        if term not in tf:
            continue
        length = int(byte4_to_int(np.int64(o.norms[d])))
        inner = abs(length - ln_min) + abs(length - ln_max) - (ln_max - ln_min)
        norm = f32(1.0 / math.sqrt(float(f32(steep) * f32(inner) + f32(1.0))))
        freq = f32(tf[term])
        if freq <= tf_min:
            tfv = f32(tf_base)
        else:
            tfv = f32(math.sqrt(float(freq + f32(tf_base) * f32(tf_base)
                                      - f32(tf_min))))
        out[d] = f32(f32(tfv * idf) * norm)
    return out


def test_sweetspot_matches_brute_force(ss):
    sim = SweetSpot(ln_min=3, ln_max=12, steepness=0.5, tf_base=1.5,
                    tf_min=2.0)
    s = Searcher(ss["idx"], dtype=np.float32, similarity=sim)
    exp = BruteForceIndex.topk(
        brute_sweetspot(ss["o"], "red", 3, 12, 0.5, 1.5, 2.0), 10
    )
    got = [(int(r["doc_id"]), f32(r["score"]))
           for r in s.search(TermQuery(term="red"), 10).collect()]
    assert got == [(d, f32(v)) for d, v in exp]


def test_sweetspot_defaults_degrade_to_classic(ss):
    from lucene_spark.similarities import Classic

    s1 = Searcher(ss["idx"], dtype=np.float32, similarity=SweetSpot())
    s2 = Searcher(ss["idx"], dtype=np.float32, similarity=Classic())
    a = [(int(r["doc_id"]), f32(r["score"]))
         for r in s1.search(TermQuery(term="blue"), 20).collect()]
    b = [(int(r["doc_id"]), f32(r["score"]))
         for r in s2.search(TermQuery(term="blue"), 20).collect()]
    assert a == b


def test_sweetspot_hyperbolic_tf_bounds(ss):
    sim = SweetSpot(hyperbolic=(1.0, 2.0, math.e, 5.0))
    fn = sim._tf_fn(np.float32)
    vals = fn(np.array([0.0, 1.0, 5.0, 50.0], dtype=np.float64))
    assert vals[0] == 0.0
    assert 1.0 <= vals[1] < 1.5
    assert abs(vals[2] - 1.5) < 1e-6  # tanh(0) midpoint
    assert abs(vals[3] - 2.0) < 1e-6  # saturates at max


def test_doc_values_stats(ss, spark):
    s = Searcher(ss["idx"], dtype=np.float32)
    matches = s.matches(TermQuery(term="red"))
    ids = sorted(int(r["doc_id"]) for r in matches.collect())
    vals = [ss["vals"][d] for d in ids]
    present = [v for v in vals if v is not None]
    row = doc_values_stats(matches, s.index.docs, "nval").collect()[0]
    assert row["cnt"] == len(present)
    assert row["missing"] == len(vals) - len(present)
    assert row["mn"] == min(present)
    assert row["mx"] == max(present)
    assert row["total"] == sum(present)
    assert row["mean"] == pytest.approx(np.mean(present))
    assert row["variance"] == pytest.approx(np.var(present))
    assert row["stdev"] == pytest.approx(np.std(present))


def test_distance_sort(spark):
    rows = [(i, float((i * 7) % 120 - 60), float((i * 13) % 340 - 170))
            for i in range(300)]
    rows[5] = (5, None, None)  # missing coords drop out
    docs = spark.createDataFrame(rows, "doc_id long, lat double, lon double")
    got = [(int(r["doc_id"]), r["distance_m"])
           for r in distance_sort(docs, "lat", "lon", 10.0, 20.0, 5).collect()]

    def hav(lat1, lon1, lat2, lon2):
        rl1, rl2 = math.radians(lat1), math.radians(lat2)
        dla, dlo = math.radians(lat2 - lat1) / 2, math.radians(lon2 - lon1) / 2
        a = (math.sin(dla) ** 2
             + math.cos(rl1) * math.cos(rl2) * math.sin(dlo) ** 2)
        return 2 * EARTH_RADIUS_M * math.asin(min(1.0, math.sqrt(a)))

    exp = sorted(
        ((i, hav(la, lo, 10.0, 20.0)) for i, la, lo in rows if la is not None),
        key=lambda t: (t[1], t[0]),
    )[:5]
    assert [d for d, _v in got] == [d for d, _v in exp]
    for (_d1, v1), (_d2, v2) in zip(got, exp):
        assert v1 == pytest.approx(v2)
