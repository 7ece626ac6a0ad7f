"""LRUQueryCache + UsageTrackingQueryCachingPolicy analog tests.

Pinned to the reference's own suites: the policy thresholds and
never-cache classes mirror TestUsageTrackingFilterCachingPolicy.java, the
ring-buffer frequency semantics TestFrequencyTrackingRingBuffer.java, and
the LRU/eviction/stats behavior TestLRUQueryCache.java (testEviction,
testClearQuery, testRamBytesUsedAgreesWithRamUsageTester's accounting
shape). End-to-end: rank identity cached vs uncached, persistence of the
cached doc-set, unpersist on eviction."""

import random

import numpy as np
import pytest

from lucene_spark.build import IndexConfig, build_index
from lucene_spark.query import (
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    PointRangeQuery,
    PrefixQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    bool_query,
)
from lucene_spark.querycache import (
    FrequencyTrackingRingBuffer,
    LRUQueryCache,
    UsageTrackingQueryCachingPolicy,
    cache_key,
    is_costly,
    should_never_cache,
)
from lucene_spark.search import Searcher

from oracle import make_corpus

VOCAB = [
    "the", "a", "of", "return", "if", "def", "import", "value", "data",
    "index", "query", "term", "doc", "score", "merge", "block", "spark",
]


# ---------------- FrequencyTrackingRingBuffer ----------------


def test_ring_buffer_basic():
    buf = FrequencyTrackingRingBuffer(4, sentinel=-1)
    assert buf.frequency(-1) == 4  # pre-filled with the sentinel
    buf.add(3)
    buf.add(3)
    buf.add(5)
    assert buf.frequency(3) == 2
    assert buf.frequency(5) == 1
    assert buf.frequency(-1) == 1
    # wrap: the two oldest (3, 3) get overwritten
    buf.add(7)
    buf.add(7)
    buf.add(7)
    assert buf.frequency(3) == 0
    assert buf.frequency(5) == 1
    assert buf.frequency(7) == 3


def test_ring_buffer_matches_naive_window():
    """TestFrequencyTrackingRingBuffer.test semantics: frequency == count
    within the trailing max_size window."""
    rng = random.Random(42)
    size = 16
    buf = FrequencyTrackingRingBuffer(size, sentinel=-1)
    window = []
    for _ in range(500):
        v = rng.randrange(10)
        buf.add(v)
        window.append(v)
        window = window[-size:]
        for key in range(10):
            assert buf.frequency(key) == window.count(key)


def test_ring_buffer_min_size():
    with pytest.raises(ValueError):
        FrequencyTrackingRingBuffer(1, sentinel=-1)


# ---------------- UsageTrackingQueryCachingPolicy ----------------


def test_never_cache_classes():
    # TestUsageTrackingFilterCachingPolicy.testNeverCacheMatchAll etc.
    assert should_never_cache(TermQuery(term="foo"))
    assert should_never_cache(MatchAllDocsQuery())
    assert should_never_cache(MatchNoDocsQuery())
    assert should_never_cache(BooleanQuery(clauses=()))
    assert should_never_cache(DisjunctionMaxQuery(disjuncts=()))
    assert not should_never_cache(PrefixQuery(prefix="foo"))
    assert not should_never_cache(
        bool_query(must=[TermQuery(term="a"), TermQuery(term="b")])
    )


def test_is_costly_multi_term_and_points():
    # isCostly: MultiTermQuery family, TermInSetQuery, Point*Query
    assert is_costly(PrefixQuery(prefix="f"))
    assert is_costly(WildcardQuery(pattern="f*o"))
    assert is_costly(FuzzyQuery(term="foo"))
    assert is_costly(TermRangeQuery(lower="a", upper="b"))
    assert is_costly(TermInSetQuery(terms=("a", "b")))
    assert is_costly(PointRangeQuery(field_col="x", lower=1, upper=2))
    assert not is_costly(TermQuery(term="foo"))
    assert not is_costly(bool_query(must=[TermQuery(term="a")]))


def test_min_frequency_thresholds():
    policy = UsageTrackingQueryCachingPolicy()
    assert policy.min_frequency_to_cache(PrefixQuery(prefix="f")) == 2
    assert (
        policy.min_frequency_to_cache(
            bool_query(should=[TermQuery(term="a"), TermQuery(term="b")])
        )
        == 4
    )
    assert (
        policy.min_frequency_to_cache(
            DisjunctionMaxQuery(
                disjuncts=(TermQuery(term="a"), TermQuery(term="b"))
            )
        )
        == 4
    )
    # a non-costly, non-compound filter: the default 5
    from lucene_spark.query import IndexSortRangeQuery

    assert (
        policy.min_frequency_to_cache(
            IndexSortRangeQuery(field_col="f", lower=0, upper=1)
        )
        == 5
    )


def test_policy_should_cache_after_min_frequency():
    # TestUsageTrackingFilterCachingPolicy.testSanity
    policy = UsageTrackingQueryCachingPolicy()
    costly = PrefixQuery(prefix="ab")
    assert not policy.should_cache(costly)
    policy.on_use(costly)
    assert not policy.should_cache(costly)  # freq 1 < 2
    policy.on_use(costly)
    assert policy.should_cache(costly)  # freq 2 == 2

    compound = bool_query(must=[TermQuery(term="a"), TermQuery(term="b")])
    for i in range(3):
        policy.on_use(compound)
        assert not policy.should_cache(compound), i
    policy.on_use(compound)
    assert policy.should_cache(compound)  # freq 4 == 4

    # never-cache queries stay out no matter how often they are used
    term = TermQuery(term="z")
    for _ in range(10):
        policy.on_use(term)
    assert not policy.should_cache(term)


def test_history_size_evicts_old_usages():
    policy = UsageTrackingQueryCachingPolicy(history_size=4)
    q = PrefixQuery(prefix="ab")
    policy.on_use(q)
    policy.on_use(q)
    assert policy.should_cache(q)
    # flood the (tiny) history: q's usages fall out of the window
    for i in range(4):
        policy.on_use(PrefixQuery(prefix=f"other{i}"))
    assert not policy.should_cache(q)


# ---------------- cache_key ----------------


def test_cache_key_strips_wrappers():
    q = PrefixQuery(prefix="ab")
    assert cache_key(ConstantScoreQuery(query=q)) == q
    import dataclasses

    boosted = dataclasses.replace(q, boost=3.0)
    assert cache_key(boosted) == q
    assert cache_key(ConstantScoreQuery(query=boosted)) == q


# ---------------- LRUQueryCache (pure driver mechanics) ----------------


class _FakeDF:
    """Stands in for a persisted DataFrame in driver-only tests."""

    def __init__(self):
        self.persisted = True

    def unpersist(self):
        self.persisted = False
        return self


def test_lru_eviction_order_and_stats():
    # TestLRUQueryCache.testEviction: LRU by access, maxSize bound
    cache = LRUQueryCache(max_size=2, min_docs_to_cache=0)
    q1, q2, q3 = (PrefixQuery(prefix=p) for p in ("a", "b", "c"))
    d1, d2, d3 = _FakeDF(), _FakeDF(), _FakeDF()
    cache.put_if_absent(q1, d1, 10)
    cache.put_if_absent(q2, d2, 10)
    assert cache.cached_queries() == [q1, q2]
    assert cache.get(q1) is d1  # touch q1 -> most recently used
    assert cache.cached_queries() == [q2, q1]
    cache.put_if_absent(q3, d3, 10)  # evicts q2 (LRU)
    assert cache.cached_queries() == [q1, q3]
    assert not d2.persisted and d1.persisted and d3.persisted
    assert cache.get(q2) is None
    assert (cache.hit_count, cache.miss_count) == (1, 1)
    assert cache.cache_count == 3 and cache.cache_size == 2
    assert cache.eviction_count == 1
    cache.assert_consistent()


def test_ram_bound_eviction():
    from lucene_spark.querycache import (
        BYTES_PER_CACHED_DOC,
        HASHTABLE_RAM_BYTES_PER_ENTRY,
        LINKED_HASHTABLE_RAM_BYTES_PER_ENTRY,
        QUERY_DEFAULT_RAM_BYTES_USED,
    )

    per_entry_overhead = (
        LINKED_HASHTABLE_RAM_BYTES_PER_ENTRY
        + QUERY_DEFAULT_RAM_BYTES_USED
        + HASHTABLE_RAM_BYTES_PER_ENTRY
    )
    # room for exactly two 100-doc entries
    cap = 2 * (per_entry_overhead + 100 * BYTES_PER_CACHED_DOC)
    cache = LRUQueryCache(max_size=100, max_ram_bytes=cap, min_docs_to_cache=0)
    dfs = [_FakeDF() for _ in range(3)]
    for i, df in enumerate(dfs):
        cache.put_if_absent(PrefixQuery(prefix=f"p{i}"), df, 100)
    assert cache.cache_size == 2
    assert not dfs[0].persisted
    assert cache.ram_bytes_used() <= cap
    cache.assert_consistent()


def test_clear_query_and_clear():
    cache = LRUQueryCache(max_size=4, min_docs_to_cache=0)
    q1, q2 = PrefixQuery(prefix="a"), PrefixQuery(prefix="b")
    d1, d2 = _FakeDF(), _FakeDF()
    cache.put_if_absent(q1, d1, 5)
    cache.put_if_absent(q2, d2, 5)
    cache.clear_query(q1)
    assert not d1.persisted and cache.cached_queries() == [q2]
    cache.clear()
    assert not d2.persisted and cache.cache_size == 0
    assert cache.ram_bytes_used() == 0
    cache.assert_consistent()


def test_skip_cache_factor_validation():
    with pytest.raises(ValueError):
        LRUQueryCache(skip_cache_factor=0.5)


# ---------------- end-to-end on a real index ----------------


@pytest.fixture(scope="module")
def built(spark):
    docs = make_corpus(200, VOCAB, seed=11, min_len=2, max_len=30)
    cfg = IndexConfig(seg_size=64, block_size=16, with_positions=False)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, content string"
    )
    idx = build_index(df, cfg, doc_id_col="doc_id").persist()
    yield idx
    idx.unpersist()


def _rows(df):
    return sorted(
        (int(r["doc_id"]), float(np.float32(r["score"])))
        for r in df.collect()
    )


def test_end_to_end_rank_identity_and_reuse(built):
    cache = LRUQueryCache(min_docs_to_cache=0)
    plain = Searcher(built, dtype=np.float32, preload_stats=True)
    cached = Searcher(
        built, dtype=np.float32, preload_stats=True, query_cache=cache
    )
    q = bool_query(
        must=[TermQuery(term="def")],
        filter=[PrefixQuery(prefix="ind")],
        must_not=[WildcardQuery(pattern="mer*")],
    )
    expected = _rows(plain.matches(q))
    for use in range(4):
        assert _rows(cached.matches(q)) == expected, use
    # both costly clauses (filter + must_not) cached at their 2nd use
    assert set(map(type, cache.cached_queries())) == {
        PrefixQuery,
        WildcardQuery,
    }
    assert cache.hit_count >= 2
    cache.assert_consistent()
    # the cached doc-sets live in executor storage (never collected)
    for entry in cache._entries.values():
        assert entry.df.storageLevel.useMemory
    # eviction unpersists
    cache.clear()
    # filter semantics with the cache must equal a fresh uncached searcher
    assert _rows(cached.matches(q)) == expected


def test_min_docs_gate_blocks_small_index(built):
    # default min_docs_to_cache=10_000 > the 200-doc fixture
    cache = LRUQueryCache()
    s = Searcher(built, dtype=np.float32, preload_stats=True, query_cache=cache)
    q = bool_query(must=[TermQuery(term="def")], filter=[PrefixQuery(prefix="ind")])
    for _ in range(4):
        s.matches(q).collect()
    assert cache.cache_size == 0 and cache.miss_count == 0


def test_worst_case_size_gate(built):
    # cacheEntryHasReasonableWorstCaseSize: 5 * maxDoc/8 must fit
    cache = LRUQueryCache(min_docs_to_cache=0, max_ram_bytes=100)
    s = Searcher(built, dtype=np.float32, preload_stats=True, query_cache=cache)
    q = bool_query(must=[TermQuery(term="def")], filter=[PrefixQuery(prefix="ind")])
    for _ in range(4):
        s.matches(q).collect()
    assert cache.cache_size == 0


def test_skip_cache_factor_blocks_expensive_filter(built):
    # filter est_cost >> skip_cache_factor * lead_cost -> served uncached
    cache = LRUQueryCache(min_docs_to_cache=0, skip_cache_factor=1.0)
    s = Searcher(built, dtype=np.float32, preload_stats=True, query_cache=cache)
    # "the" is the most frequent term; the singleton-ish must side leads.
    # a boolean filter gets a driver cost estimate (sum of term doc_freqs)
    filt = bool_query(
        should=[TermQuery(term="the"), TermQuery(term="of"), TermQuery(term="a")]
    )
    q = bool_query(must=[TermQuery(term="def")], filter=[filt])
    for _ in range(6):
        s.matches(q).collect()
    assert cache.cache_size == 0  # skipped every time
    # with the default generous factor it caches after 4 uses
    cache2 = LRUQueryCache(min_docs_to_cache=0)
    s2 = Searcher(built, dtype=np.float32, preload_stats=True, query_cache=cache2)
    for _ in range(6):
        s2.matches(q).collect()
    assert cache2.cache_size == 1


def test_shared_cache_never_cross_serves_indexes(built, spark):
    """The per-leaf CacheKey role: one cache shared by Searchers over two
    DIFFERENT indexes must keep their doc-sets apart (the javadoc example
    shares cache+policy across searchers/readers)."""
    docs2 = make_corpus(150, VOCAB, seed=99, min_len=2, max_len=30)
    cfg = IndexConfig(seg_size=64, block_size=16, with_positions=False)
    df2 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs2)], "doc_id long, content string"
    )
    built2 = build_index(df2, cfg, doc_id_col="doc_id").persist()
    try:
        cache = LRUQueryCache(min_docs_to_cache=0)
        s1 = Searcher(built, dtype=np.float32, preload_stats=True, query_cache=cache)
        s2 = Searcher(built2, dtype=np.float32, preload_stats=True, query_cache=cache)
        q = bool_query(must=[TermQuery(term="def")], filter=[PrefixQuery(prefix="ind")])
        exp1 = _rows(Searcher(built, dtype=np.float32).matches(q))
        exp2 = _rows(Searcher(built2, dtype=np.float32).matches(q))
        for _ in range(3):  # both filters cached (costly => 2nd use)
            assert _rows(s1.matches(q)) == exp1
            assert _rows(s2.matches(q)) == exp2
        assert cache.cache_size == 2  # one entry per index core
        # clear_core drops exactly one index's entries
        cache.clear_core(built2.postings._qc_core_key)
        assert cache.cache_size == 1
        assert _rows(s1.matches(q)) == exp1 and _rows(s2.matches(q)) == exp2
        cache.assert_consistent()
    finally:
        built2.unpersist()


def test_cached_filter_respects_later_deletes(built, spark):
    """Deletes applied AFTER a filter doc-set was cached must still drop
    the deleted docs: live-docs filtering layers on top of the boolean
    result (the reference caches match-all-including-deleted sets and
    intersects liveDocs at collection time)."""
    import dataclasses as _dc

    idx = _dc.replace(built)  # shallow copy so `built` keeps no tombstones
    cache = LRUQueryCache(min_docs_to_cache=0)
    s = Searcher(idx, dtype=np.float32, preload_stats=True, query_cache=cache)
    q = bool_query(must=[TermQuery(term="def")], filter=[PrefixQuery(prefix="ind")])
    before = _rows(s.matches(q))
    for _ in range(2):
        s.matches(q).collect()  # cache the filter doc-set
    assert cache.cache_size == 1
    victims = [d for d, _ in before][:2]
    assert victims
    idx2 = idx.delete_docs(victims)
    s2 = Searcher(idx2, dtype=np.float32, preload_stats=True, query_cache=cache)
    hits_before = cache.hit_count
    got = _rows(s2.matches(q))
    # deletes share the postings core, so the STALE cached doc-set served
    # (hit) and live-docs filtering still removed the victims on top
    assert cache.hit_count > hits_before
    assert got == [(d, sc) for d, sc in before if d not in victims]


def test_set_query_cache_toggle(built):
    cache = LRUQueryCache(min_docs_to_cache=0)
    s = Searcher(built, dtype=np.float32, preload_stats=True)
    q = bool_query(must=[TermQuery(term="def")], filter=[PrefixQuery(prefix="ind")])
    baseline = _rows(s.matches(q))
    s.set_query_cache(cache)
    for _ in range(3):
        assert _rows(s.matches(q)) == baseline
    assert cache.cache_size == 1
    s.set_query_cache(None)
    assert _rows(s.matches(q)) == baseline
    assert cache.hit_count == 1  # no further lookups after disabling
