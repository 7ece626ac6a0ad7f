"""Profile the non-hot-cache WAND tiers: warm job counts + latency for the
bm25_or3 query with the hot postings cache off, on BOTH the driver-bounds
tier (the bench's bm25_or3_distributed entry) and the fully distributed
tier (LUCENE_SPARK_DRIVER_META_MAX=0 — bounds never collected to the
driver, the WAND test runs inline in the decode scanner).
Run: python scripts/profile_dist.py"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ["LUCENE_SPARK_HOT_CACHE_POSTINGS"] = "0"

from lucene_spark.build import IndexConfig, build_index
from lucene_spark.query import TermQuery, bool_query
from lucene_spark.search import Searcher
from lucene_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app="profile_dist", cores=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).repartition(32).persist()
docs.count()
cfg = IndexConfig(chain="standard", seg_size=1 << 12, block_size=128,
                  with_positions=True, store_cols=("lang",))
t0 = time.time()
idx = build_index(docs, cfg, content_col="text", doc_id_col="doc_id", eager=True)
print("build", round(time.time() - t0, 2))

sc = spark.sparkContext


def job_ids():
    st = sc.statusTracker()
    return set(st.getJobIdsForGroup(None) or [])


def profile(label, searcher, q, reps=4):
    t0 = time.time()
    searcher.top_docs(q, 10)
    print(f"{label} cold: {time.time() - t0:.3f} s")
    for rep in range(reps):
        before = job_ids()
        t0 = time.time()
        searcher.top_docs(q, 10)
        dt = time.time() - t0
        after = job_ids()
        print(f"{label} warm rep{rep}: {dt*1000:.1f} ms, jobs={len(after - before)}")


q = bool_query(should=[TermQuery(term=t) for t in ("spark", "merge", "vector")])

profile("driver-tier", Searcher(idx, dtype=np.float32, preload_stats=True), q)

os.environ["LUCENE_SPARK_DRIVER_META_MAX"] = "0"
try:
    profile("dist-tier  ", Searcher(idx, dtype=np.float32, preload_stats=True), q)
finally:
    del os.environ["LUCENE_SPARK_DRIVER_META_MAX"]
spark.stop()
