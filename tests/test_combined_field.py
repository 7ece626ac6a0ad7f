"""CombinedFieldQuery (BM25F) vs an independent brute-force oracle that
transcribes the reference's merges literally:

- freq         = sum_f weight_f * tf_f            (CombinedFieldQuery.java:427,453-462)
- norm         = intToByte4(round(sum_f w_f * LENGTH_TABLE[norm_f])) with a
                 sequential f32 accumulation and Math.round(float) = floor(v+0.5f)
                 (MultiNormsLeafSimScorer.java:128-139); raw norm if only one
                 norm field (MultiNormsLeafSimScorer.java:67-68)
- pseudo term stats: df = max_f df_f, ttf = per-step `long += double`
                 truncation, floored at 1        (CombinedFieldQuery.java:292-309)
- pseudo collection stats: docCount = max_f, sumTotalTermFreq per-step
                 truncated                        (CombinedFieldQuery.java:319-333)
- the scorer is plain BM25 over (freq, combined norm)
"""

import math

import numpy as np
import pytest

from lucene_spark.build import IndexConfig, build_index
from lucene_spark.query import CombinedFieldQuery
from lucene_spark.search import MultiFieldSearcher, Searcher
from lucene_spark.smallfloat import LENGTH_TABLE, int_to_byte4

import os, sys
sys.path.insert(0, os.path.dirname(__file__))
from oracle import BruteForceIndex, make_corpus

f32 = np.float32


@pytest.fixture(scope="module")
def fields(spark):
    body = make_corpus(150, ["the", "spark", "merge", "red", "blue"], seed=7)
    title = make_corpus(150, ["spark", "red", "title", "merge"], seed=8,
                        min_len=1, max_len=6)
    df = spark.createDataFrame(
        [(i, b, t) for i, (b, t) in enumerate(zip(body, title))],
        "doc_id long, body string, title string",
    )
    cfg = IndexConfig(seg_size=64)
    idx_b = build_index(df, cfg, content_col="body", doc_id_col="doc_id",
                        auto_seg_size=False, eager=True)
    idx_t = build_index(df, cfg, content_col="title", doc_id_col="doc_id",
                        auto_seg_size=False, eager=True)
    yield {
        "body": body, "title": title,
        "s": MultiFieldSearcher(
            {"body": Searcher(idx_b, dtype=np.float32),
             "title": Searcher(idx_t, dtype=np.float32)},
            default_field="body",
        ),
        "ob": BruteForceIndex(body),
        "ot": BruteForceIndex(title),
    }
    idx_b.unpersist()
    idx_t.unpersist()


def brute_bm25f(term, field_oracles, weights, k1=1.2, b=0.75):
    """field_oracles: list of BruteForceIndex; weights: list of float."""
    # pseudo term stats (per-step long += double truncation)
    df_max, ttf = 0, 0
    for o, w in zip(field_oracles, weights):
        n = o.doc_freq(term)
        if n > 0:
            df_max = max(df_max, n)
            ttf = int(ttf + w * sum(tf.get(term, 0) for tf in o.tfs))
    if df_max == 0:
        return {}
    doc_count = max(o.doc_count for o in field_oracles)
    sttf = 0
    for o, w in zip(field_oracles, weights):
        sttf = int(sttf + w * o.sum_ttf)
    ttf = max(1, ttf)
    idf = f32(math.log(1.0 + (doc_count - df_max + 0.5) / (df_max + 0.5)))
    avgdl = f32(sttf / float(doc_count))
    k1f, bf, one = f32(k1), f32(b), f32(1.0)
    cache = one / (k1f * ((one - bf) + bf * LENGTH_TABLE / avgdl))
    w_q = f32(1.0) * idf
    out = {}
    for d in range(doc_count):
        freq = 0.0
        for o, w in zip(field_oracles, weights):
            freq += w * o.tfs[d].get(term, 0)
        if freq <= 0:
            continue
        # combined norm byte, sequential f32 accumulation
        total = f32(0.0)
        for o, w in zip(field_oracles, weights):
            total = f32(total + f32(w) * LENGTH_TABLE[o.norms[d]])
        nb = int(int_to_byte4(int(np.floor(total + f32(0.5)))))
        out[d] = f32(w_q - w_q / (one + f32(freq) * cache[nb]))
    return out


def _got(df):
    return [(int(r["doc_id"]), np.float32(r["score"])) for r in df.collect()]


@pytest.mark.parametrize("weights", [(1.0, 1.0), (1.0, 2.5), (3.0, 1.0)])
def test_combined_field_matches_brute_force(fields, weights):
    s, ob, ot = fields["s"], fields["ob"], fields["ot"]
    exp_scores = brute_bm25f("red", [ob, ot], list(weights))
    exp = BruteForceIndex.topk(exp_scores, 10)
    got = _got(s.search(
        CombinedFieldQuery(term="red",
                           fields=(("body", weights[0]), ("title", weights[1]))),
        10,
    ))
    assert got == [(d, np.float32(v)) for d, v in exp]


def test_combined_field_term_in_one_field_only(fields):
    # 'title' appears only in the title field; body contributes norms only
    s, ob, ot = fields["s"], fields["ob"], fields["ot"]
    exp = BruteForceIndex.topk(brute_bm25f("title", [ob, ot], [1.0, 2.0]), 10)
    got = _got(s.search(
        CombinedFieldQuery(term="title", fields=(("body", 1.0), ("title", 2.0))),
        10,
    ))
    assert len(got) > 0
    assert got == [(d, np.float32(v)) for d, v in exp]


def test_combined_field_absent_term_empty(fields):
    got = fields["s"].search(
        CombinedFieldQuery(term="zzzznope", fields=(("body", 1.0), ("title", 1.0))),
        10,
    )
    assert got.count() == 0


def test_combined_field_weight_below_one_raises(fields):
    with pytest.raises(ValueError):
        fields["s"].search(
            CombinedFieldQuery(term="red", fields=(("body", 0.5), ("title", 1.0))),
            10,
        ).collect()
