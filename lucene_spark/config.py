"""Engine configuration (the reference's IndexWriterConfig / FieldType /
Similarity knobs, collapsed to what our single-text-field engine needs)."""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Optional, Tuple

from .bm25 import B_DEFAULT, K1_DEFAULT


@dataclass(frozen=True)
class IndexConfig:
    """Analyzer + layout + scoring knobs.

    - ``chain``: 'standard' (StandardAnalyzer-equivalent) or 'code' (adds
      WordDelimiterGraph-style splitting) — SURVEY.md §2.2.
    - ``seg_size``: docs per segment; segments are contiguous doc_id ranges
      (segment_id = doc_id // seg_size), the Spark analog of DWPT flushes.
      Doubles as the skew salt: hot terms split across segments, so no
      groupBy group exceeds one segment's postings.
    - ``block_size``: postings per encoded block (Lucene's 128).
    - ``with_positions``: store position streams (phrase queries).
    """

    chain: str = "standard"
    seg_size: int = 1 << 16
    block_size: int = 128
    with_positions: bool = True
    k1: float = K1_DEFAULT
    b: float = B_DEFAULT
    store_cols: Tuple[str, ...] = ()
    field: str = "content"
    # stopwords: empty by default, like 9.x StandardAnalyzer
    stopwords: frozenset = dc_field(default_factory=frozenset)
    # index-time synonyms (SynonymFilter with posIncr=0): base term ->
    # extra tokens injected at the SAME position after stop filtering.
    # Injected tokens are overlaps: they count into length/tf/sttf but the
    # norm discounts them (FieldInvertState.numOverlap,
    # index/IndexingChain.java:1196; BM25Similarity discountOverlaps).
    synonyms: Tuple[Tuple[str, Tuple[str, ...]], ...] = ()
    # compound-word decompounding (CompoundWordTokenFilterBase subclasses):
    # a compound.DictionaryDecompounder / HyphenationDecompounder whose
    # subwords are injected at the original token's position (posIncr=0
    # overlaps, same norm discount as synonyms) — SURVEY.md §2.2.
    decompound: Optional[object] = None
    # phonetic token expansion (PhoneticFilter / DoubleMetaphoneFilter):
    # a phonetic.PhoneticConfig; applied LAST in the chain (after stop /
    # decompound / synonyms), encoded forms replace (inject=False) or
    # overlap (inject=True, posIncr=0) their source token.
    phonetic: Optional[object] = None
    # hunspell dictionary stemming (HunspellStemFilter): a
    # hunspell.HunspellFilter; applied right after the stop filter
    # (longest_only replaces 1:1; otherwise first stem in place + the
    # remaining unique stems as posIncr=0 overlaps, norm-discounted).
    hunspell: Optional[object] = None
