"""Sharded HNSW graph ANN over embedding columns.

Re-expresses the reference's HNSW stack (util/hnsw/HnswGraphBuilder.java,
HnswGraphSearcher.java; Malkov & Yashunin, "Efficient and robust
approximate nearest neighbor search using Hierarchical Navigable Small
World graphs", IEEE TPAMI 2018) for Spark's execution model: one graph per
SHARD, built inside ``applyInPandas`` (graph construction is inherently
sequential, so the parallel unit is the shard, exactly like the
reference's one-graph-per-segment layout where each segment builds
independently); queries fan out to every shard's graph and the per-shard
top-k merge under a global rank — the segment-fanout shape of
IndexSearcher over per-leaf HNSW graphs.

Scale design points:
- shards are hash-partitioned, so graph build is embarrassingly parallel
  and each executor holds one shard's vectors + adjacency (bounded
  memory: choose n_shards so n/n_shards vectors fit per executor);
- the persisted graph is a plain DataFrame (shard, vec_id, levels) — a
  Parquet-friendly adjacency that co-partitions with the vectors by
  shard, so the query-time cogroup is a local join per shard;
- query fan-out is a broadcast of the (tiny) query matrix; merge is a
  per-query window rank over shards x ef candidates, not a global sort
  of all vectors.

Determinism: node levels come from an md5 hash of the vector id (the
deterministic analog of HnswGraphBuilder's seeded
``-ln(random()) * ml``), insertion order is ascending vec_id within a
shard, and every similarity comparison tie-breaks on lower id — the same
build on the same data is bit-identical, which is what lets the
``sim_hnsw_topk`` oracle hold exactly.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

GRAPH_SCHEMA = "shard int, vec_id long, node_level int, levels array<array<long>>"


def _level_for(vid: int, ml: float) -> int:
    """Deterministic HNSW level: md5(vid) -> uniform (0,1) -> floor(-ln(u)*ml)
    (HnswGraphBuilder.getRandomGraphLevel, seeded RNG replaced by a hash so
    re-builds are reproducible)."""
    h = hashlib.md5(str(int(vid)).encode()).digest()
    u = (int.from_bytes(h[:8], "big") + 1) / float(1 << 64)
    return int(-math.log(u) * ml)


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.maximum(n, 1e-30)


def _select_diverse(
    q_sims: np.ndarray, cand: np.ndarray, vecs: np.ndarray, m: int
) -> np.ndarray:
    """Neighbor selection with the diversity heuristic
    (HnswGraphBuilder.diversityCheck / Malkov Algorithm 4, base form): scan
    candidates best-first; keep c unless c is closer to an already-selected
    neighbor than to the query. cand are row indices, q_sims their dot
    products with the query (vectors are L2-normalized: cosine == dot)."""
    order = np.lexsort((cand, -q_sims))
    chosen: List[int] = []
    for j in order:
        c = int(cand[j])
        if not chosen:
            chosen.append(c)
        else:
            to_sel = vecs[np.asarray(chosen)] @ vecs[c]
            # diverse iff strictly closer to the query than to every
            # already-selected neighbor (HnswGraphBuilder.diversityCheck:
            # neighborSimilarity >= score rejects)
            if np.all(to_sel < q_sims[j]):
                chosen.append(c)
        if len(chosen) >= m:
            break
    return np.asarray(chosen, dtype=np.int64)


class _ShardHnsw:
    """One shard's in-memory graph during build/search. Row indices are
    local; ids map back through self.ids."""

    def __init__(self, ids: np.ndarray, vecs: np.ndarray, m: int, ef_c: int):
        self.ids = ids
        self.vecs = _normalize(vecs.astype(np.float32)).astype(np.float32)
        self.m = m
        self.ef_c = ef_c
        self.ml = 1.0 / math.log(m)
        n = len(ids)
        self.node_level = np.array(
            [_level_for(int(i), self.ml) for i in ids], dtype=np.int32
        )
        # adjacency: per node, per level, a python list of row indices
        self.nbrs: List[List[List[int]]] = [
            [[] for _ in range(self.node_level[r] + 1)] for r in range(n)
        ]
        self.entry: Optional[int] = None  # row index of the entry point

    def _max_conn(self, level: int) -> int:
        # 2M on the base layer, M above (HnswGraphBuilder M/M0 convention)
        return self.m * 2 if level == 0 else self.m

    def _search_layer(
        self, q: np.ndarray, eps: List[int], ef: int, level: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Best-first expansion with a bounded result set (Algorithm 2 /
        HnswGraphSearcher.searchLevel). Returns (rows, sims) of up to ef
        nearest, unsorted. Neighbor distance evaluations are numpy-batched
        per expanded node."""
        import heapq

        visited = set(eps)
        sims0 = self.vecs[np.asarray(eps)] @ q
        # candidates: max-heap by sim (python heapq is min -> negate);
        # results: min-heap of (sim, -row) to evict the worst
        cand = [(-float(s), int(r)) for s, r in zip(sims0, eps)]
        heapq.heapify(cand)
        res = [(float(s), -int(r)) for s, r in zip(sims0, eps)]
        heapq.heapify(res)
        while len(res) > ef:
            heapq.heappop(res)
        while cand:
            cs, cr = heapq.heappop(cand)
            cs = -cs
            worst = res[0][0] if len(res) >= ef else -np.inf
            if cs < worst:
                break
            neigh = [
                v
                for v in self.nbrs[cr][level]
                if v not in visited
            ]
            if not neigh:
                continue
            visited.update(neigh)
            sims = self.vecs[np.asarray(neigh)] @ q
            worst = res[0][0] if len(res) >= ef else -np.inf
            for s, r in zip(sims, neigh):
                s = float(s)
                if len(res) < ef or s > worst:
                    heapq.heappush(res, (s, -int(r)))
                    heapq.heappush(cand, (-s, int(r)))
                    if len(res) > ef:
                        heapq.heappop(res)
                    worst = res[0][0] if len(res) >= ef else -np.inf
        rows = np.array([-nr for _, nr in res], dtype=np.int64)
        sims = np.array([s for s, _ in res], dtype=np.float64)
        return rows, sims

    def insert(self, r: int) -> None:
        q = self.vecs[r]
        lvl = int(self.node_level[r])
        if self.entry is None:
            self.entry = r
            return
        ep = self.entry
        top = int(self.node_level[ep])
        # greedy descent through layers above the new node's level
        eps = [ep]
        for lc in range(top, lvl, -1):
            rows, sims = self._search_layer(q, eps, 1, lc)
            eps = [int(rows[np.lexsort((rows, -sims))[0]])]
        for lc in range(min(lvl, top), -1, -1):
            rows, sims = self._search_layer(q, eps, self.ef_c, lc)
            sel = _select_diverse(sims, rows, self.vecs, self.m)
            self.nbrs[r][lc] = [int(x) for x in sel]
            for nb in sel:
                lst = self.nbrs[nb][lc]
                lst.append(r)
                mc = self._max_conn(lc)
                if len(lst) > mc:
                    # shrink with the same diversity heuristic, from nb's
                    # point of view (HnswGraphBuilder link shrinking)
                    arr = np.asarray(lst, dtype=np.int64)
                    s = self.vecs[arr] @ self.vecs[nb]
                    keep = _select_diverse(s, arr, self.vecs, mc)
                    self.nbrs[nb][lc] = [int(x) for x in keep]
            # the whole candidate set seeds the next layer (Algorithm 1:
            # ep <- W)
            eps = [int(x) for x in rows]
        if lvl > top:
            self.entry = r

    def build(self) -> None:
        for r in range(len(self.ids)):
            self.insert(r)

    def search(self, q: np.ndarray, k: int, ef: int) -> Tuple[np.ndarray, np.ndarray]:
        """(ids, sims) of up to max(k, ef) approximate nearest neighbors."""
        if self.entry is None:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        qn = np.asarray(q, dtype=np.float32)
        qn = qn / max(float(np.linalg.norm(qn)), 1e-30)
        ep = self.entry
        for lc in range(int(self.node_level[ep]), 0, -1):
            rows, sims = self._search_layer(qn, [ep], 1, lc)
            ep = int(rows[np.lexsort((rows, -sims))[0]])
        rows, sims = self._search_layer(qn, [ep], max(ef, k), 0)
        order = np.lexsort((self.ids[rows], -np.round(sims, 9)))
        rows = rows[order]
        return self.ids[rows], sims[order]


def build_hnsw(
    emb: DataFrame,
    n_shards: int = 8,
    m: int = 16,
    ef_construction: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Build per-shard HNSW graphs and return the adjacency DataFrame
    (shard, vec_id, node_level, levels[level] = neighbor vec_ids). Shard
    assignment is a deterministic hash of the id; construction order is
    ascending id within a shard. Each applyInPandas group builds one graph
    — shards build in parallel across executors, the in-Python cost is
    O(n_shard * efc * M * d) numpy work per shard."""
    shard = F.pmod(F.crc32(F.col(id_col).cast("string")), F.lit(n_shards)).cast(
        "int"
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy(np.int64)
        vecs = np.stack(
            [np.asarray(v, dtype=np.float32) for v in pdf["vec"]]
        )
        g = _ShardHnsw(ids, vecs, m, ef_construction)
        g.build()
        sh = int(pdf["shard"].iloc[0])
        return pd.DataFrame(
            {
                "shard": sh,
                "vec_id": ids,
                "node_level": g.node_level.astype(np.int32),
                "levels": [
                    [[int(ids[v]) for v in lvl] for lvl in g.nbrs[r]]
                    for r in range(len(ids))
                ],
            }
        )

    base = emb.select(
        shard.alias("shard"),
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("vec"),
    )
    return base.groupBy("shard").applyInPandas(build, schema=GRAPH_SCHEMA)


def hnsw_topk(
    graph: DataFrame,
    emb: DataFrame,
    query_ids: List[int],
    k: int = 5,
    ef: int = 64,
    m: int = 16,
    n_shards: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query the sharded graphs: broadcast the query matrix, run the HNSW
    descent per shard inside a cogrouped applyInPandas (vectors + adjacency
    co-partitioned on shard — a local join), then merge shard candidates
    under a per-query global rank (rounded sim desc, vec_id asc). Query
    vectors themselves are excluded from results, like ivf_topk.

    ``n_shards`` must match the build: the vector side re-derives the shard
    with the same hash expression instead of joining through the graph, so
    the (possibly unpersisted) graph lineage is evaluated exactly once, by
    the cogroup."""
    qrows = (
        emb.filter(F.col(id_col).isin(list(query_ids)))
        .select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .collect()
    )
    qby = {int(r["i"]): np.asarray(r["v"], dtype=np.float32) for r in qrows}
    qlist = [(int(q), qby[int(q)]) for q in query_ids]
    shard = F.pmod(F.crc32(F.col(id_col).cast("string")), F.lit(n_shards)).cast(
        "int"
    )
    vec_side = emb.select(
        shard.alias("shard"),
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("vec"),
    )
    g = graph.select("shard", "vec_id", "node_level", "levels")
    qset = {int(q) for q in query_ids}

    def run(key, vecs_pdf: pd.DataFrame, graph_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(vecs_pdf) == 0 or len(graph_pdf) == 0:
            return pd.DataFrame(
                {"query_id": [], "vec_id": [], "sim": []}
            ).astype({"query_id": np.int64, "vec_id": np.int64, "sim": np.float64})
        vecs_pdf = vecs_pdf.sort_values("vec_id").reset_index(drop=True)
        graph_pdf = graph_pdf.sort_values("vec_id").reset_index(drop=True)
        ids = vecs_pdf["vec_id"].to_numpy(np.int64)
        mat = np.stack(
            [np.asarray(v, dtype=np.float32) for v in vecs_pdf["vec"]]
        )
        rowof = {int(v): r for r, v in enumerate(ids)}
        gobj = _ShardHnsw.__new__(_ShardHnsw)
        gobj.ids = ids
        gobj.vecs = _normalize(mat).astype(np.float32)
        gobj.m = m
        gobj.node_level = graph_pdf["node_level"].to_numpy(np.int32)
        gobj.nbrs = [
            [[rowof[int(v)] for v in lvl] for lvl in levels]
            for levels in graph_pdf["levels"]
        ]
        top = int(np.max(gobj.node_level))
        cands = np.nonzero(gobj.node_level == top)[0]
        # the build's final entry point: insertion order is ascending id
        # and the entry only changes on a strictly higher level, so it is
        # the lowest-id node of the top level
        gobj.entry = int(cands[np.argmin(ids[cands])])
        # float64 re-score for the emitted candidates: the oracle computes
        # cosine in doubles, and a float32-accumulated dot can disagree at
        # the 6th rounded decimal
        mat64 = mat.astype(np.float64)
        mat64 /= np.maximum(np.linalg.norm(mat64, axis=1, keepdims=True), 1e-30)
        outs = []
        for qid, qv in qlist:
            rids, _ = gobj.search(qv, k + 1, ef)
            keep = rids != qid
            rids = rids[keep]
            q64 = qv.astype(np.float64)
            q64 /= max(float(np.linalg.norm(q64)), 1e-30)
            rows_l = np.array([rowof[int(v)] for v in rids], dtype=np.int64)
            sims64 = mat64[rows_l] @ q64 if len(rows_l) else np.empty(0)
            outs.append(
                pd.DataFrame(
                    {
                        "query_id": np.int64(qid),
                        "vec_id": rids,
                        "sim": sims64,
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    scored = (
        vec_side.groupBy("shard")
        .cogroup(g.groupBy("shard"))
        .applyInPandas(run, schema="query_id long, vec_id long, sim double")
    )
    scored = scored.filter(~F.col("vec_id").isin(list(qset)))
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("sim"), 6)), F.asc("vec_id")
    )
    return (
        scored.withColumn("sim", F.round(F.col("sim"), 6))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
        .orderBy("query_id", "rank")
    )
