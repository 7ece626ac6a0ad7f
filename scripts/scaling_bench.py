"""Two-parallelism scaling evidence (BASELINE.md protocol / north rule):
run the identical index-build + query workload at local[N] and local[4N]
on the same deterministic synthetic source-code corpus, report throughput
at both and scaling efficiency = (T_N / T_4N) / 4, writing BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [n_docs] [N]
(defaults: 200000 docs, N=8 -> compares local[8] vs local[32])

Each measurement runs in a fresh subprocess (own JVM) so the two levels are
isolated; within a level the build is timed after a warm-up job.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_level(cores: int, n_docs: int) -> dict:
    """Measured in a child process; returns its JSON result."""
    out = subprocess.run(
        [sys.executable, __file__, "--child", str(cores), str(n_docs)],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"child failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def child(cores: int, n_docs: int) -> None:
    import numpy as np

    from lucene_spark.build import IndexConfig, build_index
    from lucene_spark.corpus import generate_corpus, sha256_sidecar, verify_sha256
    from lucene_spark.query import TermQuery, bool_query
    from lucene_spark.search import Searcher
    from lucene_spark.session import get_spark

    spark = get_spark(app=f"scaling_{cores}", cores=cores, shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")

    corpus = generate_corpus(spark, n_docs, num_partitions=cores * 4).persist()
    corpus.count()  # generation excluded from build timing (same both levels)
    sidecar = sha256_sidecar(corpus).persist()
    sidecar.count()

    t0 = time.time()
    verify_sha256(corpus, sidecar)
    cfg = IndexConfig(chain="code", seg_size=1 << 13, block_size=128, with_positions=False)
    idx = build_index(corpus, cfg, order_cols=["repo", "path"],
                      num_partitions=cores * 2, eager=True)
    build_sec = time.time() - t0

    searcher = Searcher(idx, dtype=np.float32)
    qs = [
        TermQuery(term="return"),
        TermQuery(term="index"),
        bool_query(must=[TermQuery(term="def"), TermQuery(term="merge")]),
        bool_query(should=[TermQuery(term=t) for t in ("index", "writer", "segment")]),
    ]
    lat = []
    for q in qs:
        t0 = time.time()
        searcher.search(q, 10).collect()
        lat.append(time.time() - t0)
    qps_t0 = time.time()
    reps = 3
    for _ in range(reps):
        for q in qs:
            searcher.search(q, 10).collect()
    query_sec = (time.time() - qps_t0) / (reps * len(qs))

    print(
        json.dumps(
            {
                "cores": cores,
                "n_docs": n_docs,
                "build_sec": round(build_sec, 2),
                "docs_per_sec": round(n_docs / build_sec, 1),
                "query_p50_sec": round(sorted(lat)[len(lat) // 2], 3),
                "query_mean_sec": round(query_sec, 3),
            }
        )
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]))
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_high = n_low * 4

    low = run_level(n_low, n_docs)
    high = run_level(n_high, n_docs)
    eff = (high["docs_per_sec"] / low["docs_per_sec"]) / 4
    report = {
        "n_docs": n_docs,
        "low": low,
        "high": high,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report, indent=2))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE.md — measured baseline + scaling evidence

Workload: deterministic synthetic source-code corpus ({n_docs:,} docs,
seed=42, sha256-verified), code-aware analysis chain, full index build
(invert -> segment writer -> postings blocks + terms + norms), then the
BM25 top-10 query set. Identical input + identical job at two parallelism
levels (sandbox stand-in for N vs 4N executors per the north rule).

| level | cores | build wall (s) | docs/sec | query p50 (s) | query mean (s) |
|---|---|---|---|---|---|
| N  | {n_low} | {low['build_sec']} | {low['docs_per_sec']} | {low['query_p50_sec']} | {low['query_mean_sec']} |
| 4N | {n_high} | {high['build_sec']} | {high['docs_per_sec']} | {high['query_p50_sec']} | {high['query_mean_sec']} |

**Scaling efficiency (build throughput): {eff:.3f}** (target >= 0.8)

efficiency = (docs_per_sec[4N] / docs_per_sec[N]) / 4

Reproduce: `python scripts/scaling_bench.py {n_docs} {n_low}`
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
