"""Lucene SmallFloat norm quantization, re-implemented vectorized in numpy.

Semantics mirror the reference exactly (behavioral parity, fresh code):
- ``long_to_int4`` / ``int4_to_long``: 4-significant-bit pseudo-float for
  positive longs, order-preserving
  (reference: lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-143).
- ``int_to_byte4`` / ``byte4_to_int``: byte encoding with the first
  NUM_FREE_VALUES=24 values exact
  (reference: util/SmallFloat.java:145-181; MAX_INT4 = longToInt4(2^31-1) = 231).

Used for BM25 doc-length norms: norm byte = int_to_byte4(field length), and
scoring decodes via the 256-entry LENGTH_TABLE
(reference: search/similarities/BM25Similarity.java:128-142).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "long_to_int4",
    "int4_to_long",
    "int_to_byte4",
    "byte4_to_int",
    "LENGTH_TABLE",
    "NUM_FREE_VALUES",
    "MAX_INT4",
]


def long_to_int4(i):
    """Vectorized longToInt4. Accepts scalar or array of non-negative ints."""
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("only supports positive values")
    # number of significant bits = 64 - numberOfLeadingZeros(i)
    # (0 has 0 bits; np: use bit_length via log2 avoided — do it exactly)
    num_bits = np.zeros_like(i)
    v = i.copy()
    while np.any(v > 0):
        num_bits = np.where(v > 0, num_bits + 1, num_bits)
        v >>= 1
    shift = num_bits - 4
    normal = (((i >> np.maximum(shift, 0)) & 0x07) | ((shift + 1) << 3)).astype(np.int64)
    out = np.where(num_bits < 4, i, normal)
    return out if out.ndim else int(out)


def int4_to_long(i):
    """Vectorized int4ToLong."""
    i = np.asarray(i, dtype=np.int64)
    bits = i & 0x07
    shift = (i >> 3) - 1
    normal = (bits | 0x08) << np.maximum(shift, 0)
    out = np.where(shift == -1, bits, normal)
    return out if out.ndim else int(out)


MAX_INT4 = int(long_to_int4(np.int64(2**31 - 1)))  # == 231
NUM_FREE_VALUES = 255 - MAX_INT4  # == 24


def int_to_byte4(i):
    """Vectorized intToByte4: encode non-negative int -> unsigned byte (0..255)."""
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("only supports positive values")
    enc = NUM_FREE_VALUES + long_to_int4(np.maximum(i - NUM_FREE_VALUES, 0))
    out = np.where(i < NUM_FREE_VALUES, i, enc).astype(np.int64)
    return out if out.ndim else int(out)


def byte4_to_int(b):
    """Vectorized byte4ToInt: decode unsigned byte (0..255) -> int."""
    b = np.asarray(b, dtype=np.int64) & 0xFF
    dec = NUM_FREE_VALUES + int4_to_long(np.maximum(b - NUM_FREE_VALUES, 0))
    out = np.where(b < NUM_FREE_VALUES, b, dec)
    return out if out.ndim else int(out)


# LENGTH_TABLE[i] = float(byte4ToInt(i)) — BM25Similarity.java:128-134
LENGTH_TABLE: np.ndarray = byte4_to_int(np.arange(256)).astype(np.float32)
