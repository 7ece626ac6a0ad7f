"""Sharded HNSW graph ANN (functions/hnsw.py).

Reference north-star: util/hnsw/HnswGraphBuilder.java /
HnswGraphSearcher.java (one graph per segment, per-leaf search + merge).
The recall bar mirrors the IVF suite: measured recall@10 >= 0.95 at a
fixed ef budget vs exact float64 cosine on a clustered fixture.
"""

import numpy as np
import pandas as pd
import pytest

import lucene_spark.functions.hnsw as fh


def _fixture(rng, n, dim, n_clusters, noise=0.35):
    centers = rng.normal(size=(n_clusters, dim))
    labels = rng.integers(0, n_clusters, size=n)
    vecs = (centers[labels] + noise * rng.normal(size=(n, dim))).astype(
        np.float32
    )
    return pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": [v for v in vecs]}
    ), vecs


def test_hnsw_recall_and_plan(spark):
    """Recall@10 >= 0.95 at ef=80 on 12k clustered vectors, and the query
    plans as a shard-cogrouped exchange — no cartesian product, no
    broadcast-nested-loop (the fan-out is the broadcast of a 3-row query
    matrix inside the UDF closure, not a join)."""
    rng = np.random.default_rng(7)
    pdf, vecs = _fixture(rng, 12_000, 32, 40)
    emb = spark.createDataFrame(pdf).repartition(16).persist()
    emb.count()

    graph = fh.build_hnsw(emb, n_shards=8, m=16, ef_construction=100).persist()
    assert graph.count() == 12_000
    qids = [3, 4567, 11999]
    got = fh.hnsw_topk(graph, emb, qids, k=10, ef=80, m=16, n_shards=8)

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "FlatMapCoGroupsInPandas" in plan

    rows = got.collect()
    m = vecs.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    hits = total = 0
    for qid in qids:
        sims = m @ m[qid]
        sims[qid] = -2
        truth = set(np.argsort(-sims, kind="stable")[:10].tolist())
        found = {int(r["vec_id"]) for r in rows if int(r["query_id"]) == qid}
        assert len(found) == 10
        hits += len(truth & found)
        total += 10
    recall = hits / total
    assert recall >= 0.95, f"recall@10 = {recall}"
    emb.unpersist()
    graph.unpersist()


def test_hnsw_deterministic_build(spark):
    """Same data, two independent builds -> bit-identical graphs (hash
    levels + ascending-id insertion + id tie-breaks everywhere). This is
    the property the sim_hnsw_topk oracle rests on."""
    rng = np.random.default_rng(11)
    pdf, _ = _fixture(rng, 600, 16, 8)
    emb = spark.createDataFrame(pdf).repartition(7).persist()
    emb.count()

    def snap():
        rows = fh.build_hnsw(emb, n_shards=4, m=8, ef_construction=40).collect()
        return sorted(
            (r["shard"], r["vec_id"], r["node_level"], tuple(map(tuple, r["levels"])))
            for r in rows
        )

    a, b = snap(), snap()
    assert a == b
    emb.unpersist()


def test_hnsw_exhaustive_ef_equals_exact(spark):
    """With ef >= shard size the base-layer expansion visits the whole
    connected component, so the merged top-k equals exact brute-force
    cosine under the shared rank protocol (round 6, vec_id tie) — the
    sf0.01 registry entry runs in exactly this regime."""
    rng = np.random.default_rng(23)
    pdf, vecs = _fixture(rng, 400, 24, 10)
    emb = spark.createDataFrame(pdf).repartition(8).persist()
    emb.count()

    graph = fh.build_hnsw(emb, n_shards=4, m=16, ef_construction=64)
    qids = [0, 200]
    got = fh.hnsw_topk(graph, emb, qids, k=5, ef=256, m=16, n_shards=4).collect()

    m = vecs.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    for qid in qids:
        sims = np.round(m @ m[qid], 6)
        sims[qid] = -2
        order = np.lexsort((np.arange(len(sims)), -sims))[:5]
        want = [(int(i), float(sims[i])) for i in order]
        have = [
            (int(r["vec_id"]), float(r["sim"]))
            for r in sorted(
                (r for r in got if int(r["query_id"]) == qid),
                key=lambda r: r["rank"],
            )
        ]
        assert have == want
    emb.unpersist()


def test_hnsw_diversity_selection():
    """_select_diverse keeps the reference's semantics
    (HnswGraphBuilder.diversityCheck): a candidate closer to an already
    selected neighbor than to the query is skipped."""
    # query at origin-ward direction; c0 best; c1 nearly duplicates c0 so
    # it must be skipped; c2 is farther from q but diverse
    vecs = np.array(
        [
            [1.0, 0.0],  # c0
            [0.999, -0.045],  # c1: sim to c0 ~ 0.999 > sim to q
            [0.0, 1.0],  # c2: orthogonal to c0
        ],
        dtype=np.float32,
    )
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    q = np.array([0.9, 0.1], dtype=np.float32)
    q /= np.linalg.norm(q)
    sims = vecs @ q
    cand = np.arange(3)
    sel = fh._select_diverse(sims, cand, vecs, m=2)
    assert sel.tolist() == [0, 2]
