"""Query cache: LRUQueryCache + UsageTrackingQueryCachingPolicy analogs.

The reference caches FILTER-context DocIdSets per (query, segment) with an
LRU over queries, capped by entry count and RAM, and only caches queries
the usage-tracking policy has seen often enough
(search/LRUQueryCache.java:86-151, search/UsageTrackingQueryCachingPolicy.java:28-185,
util/FrequencyTrackingRingBuffer.java:31-86).

Spark re-expression: the "DocIdSet" is a persisted ``doc_id`` DataFrame —
Spark's block manager holds it distributed across executors (never
collected to the driver), so the cache scales with the cluster exactly
like the reference's per-segment bitsets scale with the index. Eviction
= ``unpersist()``. The index is a single logical leaf at the DataFrame
level (segments are physical layout underneath), so the per-leaf map
collapses to one entry and the MinSegmentSizePredicate becomes a
min-doc-count gate on the whole index.

Sharing one cache across several Searchers is supported exactly like the
reference (the javadoc example stores cache + policy in statics): entries
key on (index core key, unwrapped query) — the per-leaf CacheKey role —
so two indexes never cross-serve doc-sets, and ``clear_core`` is the
clearCoreCacheKey analog for dropping one index's entries when it is
released. Deletes stay correct without invalidation: the Searcher applies
live-docs filtering ON TOP of every boolean result (``_apply_deletes``),
so a doc-set cached before a delete still serves, minus the deleted docs
— the same contract as the reference, where the query cache stores
match-all-including-deleted sets and LeafReader.getLiveDocs intersects.

Semantics ported exactly:
- the 256-slot frequency-tracking ring of query hashes;
- never-cache classes (TermQuery, MatchAll/MatchNoDocs, empty bool/dismax
  — UsageTrackingQueryCachingPolicy.shouldNeverCache:57-94);
- min frequency 2 for costly queries (multi-term / point / TermInSet —
  isCostly:45-53), 5 default, 4 for boolean/dismax
  (minFrequencyToCache:119-137);
- LRU on access, eviction while over maxSize or maxRamBytes
  (evictIfNecessary:323-349), hit/miss/cacheCount/cacheSize stats,
  evictionCount = cacheCount - cacheSize;
- cache keys strip ConstantScore/boost wrappers (IndexSearcher consults
  the cache on the unwrapped query — LRUQueryCache.java:269-292 asserts);
- the worst-case-entry gate (cacheEntryHasReasonableWorstCaseSize:688-697:
  5 * maxDoc/8 must fit in maxRamBytes);
- the skip-cache factor: a clause whose estimated cost exceeds
  skip_cache_factor * lead_cost is served uncached this time
  (scorerSupplier ScorerSupplier.get, LRUQueryCache.java:758-765).
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict
from typing import Callable, Dict, List, Optional, Tuple

from pyspark import StorageLevel
from pyspark.sql import DataFrame

from .query import (
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

# RamUsageEstimator constants the reference accounts per entry
# (RamUsageEstimator.java): kept so the accounting SHAPE matches; the
# dominant term is the per-doc payload below.
QUERY_DEFAULT_RAM_BYTES_USED = 1024
HASHTABLE_RAM_BYTES_PER_ENTRY = 32
LINKED_HASHTABLE_RAM_BYTES_PER_ENTRY = 48
# A cached doc-id set costs ~8 bytes/doc in executor storage (long ids in
# Tungsten rows) — the RoaringDocIdSet/FixedBitSet stand-in.
BYTES_PER_CACHED_DOC = 8


class FrequencyTrackingRingBuffer:
    """util/FrequencyTrackingRingBuffer.java:31-86: fixed ring of the
    last ``max_size`` hashes, pre-filled with a sentinel; adding overwrites
    the oldest entry and keeps exact frequencies of current contents."""

    def __init__(self, max_size: int, sentinel: int) -> None:
        if max_size < 2:
            raise ValueError("maxSize must be at least 2")
        self.max_size = max_size
        self._buffer = [sentinel] * max_size
        self._position = 0
        self._freqs: Dict[int, int] = {sentinel: max_size}

    def add(self, value: int) -> None:
        removed = self._buffer[self._position]
        left = self._freqs[removed] - 1
        if left:
            self._freqs[removed] = left
        else:
            del self._freqs[removed]
        self._buffer[self._position] = value
        self._freqs[value] = self._freqs.get(value, 0) + 1
        self._position += 1
        if self._position == self.max_size:
            self._position = 0

    def frequency(self, key: int) -> int:
        return self._freqs.get(key, 0)


_COSTLY_TYPES = (
    # the MultiTermQuery family (isCostly, UsageTrackingQueryCachingPolicy
    # .java:45-53: builds its DocIdSet by scanning the term dictionary)
    PrefixQuery,
    WildcardQuery,
    RegexpQuery,
    FuzzyQuery,
    TermRangeQuery,
    TermInSetQuery,
)


def _is_point_query(query: Query) -> bool:
    """isPointQuery (UsageTrackingQueryCachingPolicy.java:34-43): walk the
    class hierarchy for a simple name Point*Query (anonymous subclasses of
    PointRangeQuery etc. must match too)."""
    for clazz in type(query).__mro__:
        if clazz is Query:
            break
        name = clazz.__name__
        if name.startswith("Point") and name.endswith("Query"):
            return True
    return False


def is_costly(query: Query) -> bool:
    return isinstance(query, _COSTLY_TYPES) or _is_point_query(query)


def should_never_cache(query: Query) -> bool:
    """shouldNeverCache (UsageTrackingQueryCachingPolicy.java:57-94).
    DocValuesFieldExistsQuery is n/a here (the repo expresses field-exists
    as an isNotNull scan predicate, never a Query node)."""
    if isinstance(query, TermQuery):
        return True  # term queries are already plenty fast
    if isinstance(query, (MatchAllDocsQuery, MatchNoDocsQuery)):
        return True
    if isinstance(query, BooleanQuery) and not query.clauses:
        return True
    if isinstance(query, DisjunctionMaxQuery) and not query.disjuncts:
        return True
    return False


class UsageTrackingQueryCachingPolicy:
    """Cache a filter once its recent-usage frequency clears the per-class
    threshold (UsageTrackingQueryCachingPolicy.java:96-185)."""

    SENTINEL = -(2 ** 63)  # outside any Python hash() image of our keys

    def __init__(self, history_size: int = 256) -> None:
        self._recently_used = FrequencyTrackingRingBuffer(
            history_size, self.SENTINEL
        )

    def min_frequency_to_cache(self, query: Query) -> int:
        """:119-137 — 2 for costly, else 5, minus one for compound queries
        (so "A OR B" caches before A and B would individually)."""
        if is_costly(query):
            return 2
        min_frequency = 5
        if isinstance(query, (BooleanQuery, DisjunctionMaxQuery)):
            min_frequency -= 1
        return min_frequency

    def on_use(self, query: Query) -> None:
        assert not isinstance(query, ConstantScoreQuery)
        if should_never_cache(query):
            return
        self._recently_used.add(hash(query))

    def frequency(self, query: Query) -> int:
        return self._recently_used.frequency(hash(query))

    def should_cache(self, query: Query) -> bool:
        if should_never_cache(query):
            return False
        return self.frequency(query) >= self.min_frequency_to_cache(query)


def cache_key(query: Query) -> Query:
    """The cache consults the UNWRAPPED query: ConstantScore wrappers peel
    off and boosts normalize to 1 (a filter's doc set is score-free, so
    "q^2" and "q" share one entry — LRUQueryCache.java:269-296 asserts the
    key is never a Boost/ConstantScore wrapper)."""
    while isinstance(query, ConstantScoreQuery):
        query = query.query
    boost = getattr(query, "boost", 1.0)
    if boost != 1.0:
        query = dataclasses.replace(query, boost=1.0)
    return query


@dataclasses.dataclass
class _Entry:
    df: DataFrame
    doc_count: int

    @property
    def ram_bytes(self) -> int:
        # leaf-cache entry accounting (LeafCache.putIfAbsent:645-651)
        return (
            HASHTABLE_RAM_BYTES_PER_ENTRY
            + self.doc_count * BYTES_PER_CACHED_DOC
        )


class LRUQueryCache:
    """LRU over cached filter doc-sets, capped by entry count and RAM
    (LRUQueryCache.java:86-151; defaults mirror the IndexSearcher default
    cache: 1000 queries / 32 MB there — 256 / 50 MB in the class javadoc
    example; we take maxSize=256, 50 MB)."""

    def __init__(
        self,
        max_size: int = 256,
        max_ram_bytes: int = 50 * 1024 * 1024,
        min_docs_to_cache: int = 10_000,
        skip_cache_factor: float = 250.0,
    ) -> None:
        if skip_cache_factor < 1:
            raise ValueError(
                f"skipCacheFactor must be no less than 1, get {skip_cache_factor}"
            )
        self.max_size = max_size
        self.max_ram_bytes = max_ram_bytes
        # MinSegmentSizePredicate(10000, .03) analog: one logical leaf =
        # the whole index, so only the absolute floor applies
        self.min_docs_to_cache = min_docs_to_cache
        self.skip_cache_factor = skip_cache_factor
        # (core_key, query) -> entry; core_key = the owning index's cache
        # key (the IndexReader.CacheKey / per-leaf map role,
        # LRUQueryCache.java:269-317) so a shared cache never cross-serves
        # doc-sets between indexes
        self._entries: "OrderedDict[Tuple[object, Query], _Entry]" = OrderedDict()
        self.hit_count = 0
        self.miss_count = 0
        self.cache_count = 0  # total ever cached
        self._ram_bytes_used = 0

    # ---------------- stats (LRUQueryCache.java:536-613) ----------------

    @property
    def cache_size(self) -> int:
        return len(self._entries)

    @property
    def eviction_count(self) -> int:
        return self.cache_count - self.cache_size

    def ram_bytes_used(self) -> int:
        return self._ram_bytes_used

    def cached_queries(self) -> List[Query]:
        """LRU order, least-recently-used first (cachedQueries:459-467)."""
        return [q for _core, q in self._entries]

    # ---------------- core ----------------

    def get(self, query: Query, core_key: object = None) -> Optional[DataFrame]:
        key = (core_key, cache_key(query))
        entry = self._entries.get(key)
        if entry is None:
            self.miss_count += 1
            return None
        # the get moves the query to the most-recently-used position
        self._entries.move_to_end(key)
        self.hit_count += 1
        return entry.df

    def put_if_absent(
        self, query: Query, df: DataFrame, doc_count: int, core_key: object = None
    ) -> None:
        key = (core_key, cache_key(query))
        if key in self._entries:
            return
        entry = _Entry(df=df, doc_count=doc_count)
        self._entries[key] = entry
        self.cache_count += 1
        self._ram_bytes_used += (
            LINKED_HASHTABLE_RAM_BYTES_PER_ENTRY
            + QUERY_DEFAULT_RAM_BYTES_USED
            + entry.ram_bytes
        )
        self._evict_if_necessary()

    def _requires_eviction(self) -> bool:
        if not self._entries:
            return False
        return (
            len(self._entries) > self.max_size
            or self._ram_bytes_used > self.max_ram_bytes
        )

    def _evict_if_necessary(self) -> None:
        while self._requires_eviction():
            _key, entry = self._entries.popitem(last=False)  # LRU end
            self._ram_bytes_used -= (
                LINKED_HASHTABLE_RAM_BYTES_PER_ENTRY
                + QUERY_DEFAULT_RAM_BYTES_USED
                + entry.ram_bytes
            )
            entry.df.unpersist()

    def _drop(self, key: Tuple[object, Query]) -> None:
        entry = self._entries.pop(key, None)
        if entry is not None:
            self._ram_bytes_used -= (
                LINKED_HASHTABLE_RAM_BYTES_PER_ENTRY
                + QUERY_DEFAULT_RAM_BYTES_USED
                + entry.ram_bytes
            )
            entry.df.unpersist()

    def clear_query(self, query: Query) -> None:
        """clearQuery (LRUQueryCache.java:371-380): drop the query's
        entries on every core."""
        q = cache_key(query)
        for key in [k for k in self._entries if k[1] == q]:
            self._drop(key)

    def clear_core(self, core_key: object) -> None:
        """clearCoreCacheKey (LRUQueryCache.java:351-369): drop every
        entry of one index — call when the index is released."""
        for key in [k for k in self._entries if k[0] == core_key]:
            self._drop(key)

    def clear(self) -> None:
        for entry in self._entries.values():
            entry.df.unpersist()
        self._entries.clear()
        self._ram_bytes_used = 0

    def assert_consistent(self) -> None:
        """assertConsistent (LRUQueryCache.java:406-457): bounds hold and
        the accounting recomputes exactly."""
        if self._requires_eviction():
            raise AssertionError(
                f"requires evictions: size={len(self._entries)}, "
                f"maxSize={self.max_size}, ramBytesUsed={self._ram_bytes_used}, "
                f"maxRamBytesUsed={self.max_ram_bytes}"
            )
        recomputed = sum(
            LINKED_HASHTABLE_RAM_BYTES_PER_ENTRY
            + QUERY_DEFAULT_RAM_BYTES_USED
            + e.ram_bytes
            for e in self._entries.values()
        )
        if recomputed != self._ram_bytes_used:
            raise AssertionError(
                f"ramBytesUsed mismatch : {self._ram_bytes_used} != {recomputed}"
            )

    # ------------- the CachingWrapperWeight analog -------------

    def _has_reasonable_worst_case_size(self, max_doc: int) -> bool:
        """cacheEntryHasReasonableWorstCaseSize (:688-697): room for 5
        worst-case (dense bitset) entries, else caching just thrashes."""
        return (max_doc // 8) * 5 < self.max_ram_bytes

    def doc_set(
        self,
        query: Query,
        build: Callable[[], DataFrame],
        policy: UsageTrackingQueryCachingPolicy,
        max_doc: int,
        lead_cost: Optional[int] = None,
        est_cost: Optional[int] = None,
        core_key: object = None,
    ) -> Tuple[DataFrame, bool]:
        """Resolve a FILTER-context doc-id set through the cache.

        Returns (doc_id DataFrame, from_cache). Mirrors
        CachingWrapperWeight.scorerSupplier (LRUQueryCache.java:719-790):
        onUse -> eligibility gates -> get -> shouldCache -> skip factor ->
        build + putIfAbsent.
        """
        key = cache_key(query)
        policy.on_use(key)

        if max_doc < self.min_docs_to_cache or not (
            self._has_reasonable_worst_case_size(max_doc)
        ):
            return build(), False

        cached = self.get(key, core_key=core_key)
        if cached is not None:
            return cached, True

        if not policy.should_cache(key):
            return build(), False

        # skip cache operation which would slow this query down too much
        # (:758-765 — cost / skipCacheFactor > leadCost)
        if (
            lead_cost is not None
            and est_cost is not None
            and est_cost / self.skip_cache_factor > lead_cost
        ):
            return build(), False

        df = build().persist(StorageLevel.MEMORY_AND_DISK)
        doc_count = df.count()  # materialize + exact RAM accounting
        self.put_if_absent(key, df, doc_count, core_key=core_key)
        return df, False
