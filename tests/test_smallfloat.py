"""SmallFloat parity tests (reference: util/SmallFloat.java, test style of
core/src/test/org/apache/lucene/util/TestSmallFloat.java)."""

import numpy as np
import pytest

from lucene_spark.smallfloat import (
    LENGTH_TABLE,
    MAX_INT4,
    NUM_FREE_VALUES,
    byte4_to_int,
    int4_to_long,
    int_to_byte4,
    long_to_int4,
)


def ref_long_to_int4(i: int) -> int:
    # independent scalar re-derivation of the spec
    assert i >= 0
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    return ((i >> shift) & 0x07) | ((shift + 1) << 3)


def ref_int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    return bits if shift == -1 else (bits | 0x08) << shift


def ref_int_to_byte4(i: int) -> int:
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + ref_long_to_int4(i - NUM_FREE_VALUES)


def test_constants():
    assert MAX_INT4 == 231
    assert NUM_FREE_VALUES == 24


@pytest.mark.parametrize(
    "i", list(range(0, 300)) + [1000, 65535, 10**6, 2**31 - 1]
)
def test_long_to_int4_matches_spec(i):
    assert long_to_int4(i) == ref_long_to_int4(i)


def test_int4_round_trip_monotone():
    vals = np.concatenate(
        [np.arange(0, 4096), 2 ** np.arange(12, 31), [2**31 - 1]]
    ).astype(np.int64)
    enc = long_to_int4(vals)
    dec = int4_to_long(enc)
    # order-preserving and decode <= original < next bucket
    assert np.all(np.diff(enc[np.argsort(vals)]) >= 0)
    assert np.all(dec <= vals)
    # identity below 8 (subnormal)
    assert np.all(dec[vals < 8] == vals[vals < 8])


def test_int_to_byte4_boundary_table():
    # FIXTURES.md §6 boundary lengths
    lengths = list(range(0, 65)) + [127, 128, 255, 256, 1000, 10**6, 2**31 - 1]
    for L in lengths:
        b = int_to_byte4(L)
        assert 0 <= b <= 255
        assert b == ref_int_to_byte4(L)
        # identity below NUM_FREE_VALUES + small values (spec: exact < 24,
        # and int4 subnormals keep 24..31 exact too)
        if L < 40:
            assert byte4_to_int(b) == L


def test_byte4_round_trip_all_bytes():
    bs = np.arange(256)
    dec = byte4_to_int(bs)
    # monotone non-decreasing, re-encoding is identity
    assert np.all(np.diff(dec) > 0)
    assert np.all(int_to_byte4(dec) == bs)


def test_length_table_is_float32_decode():
    assert LENGTH_TABLE.dtype == np.float32
    assert LENGTH_TABLE[0] == 0.0
    assert LENGTH_TABLE[23] == 23.0
    assert len(LENGTH_TABLE) == 256


def test_quantization_is_floor():
    # values are truncated down to the bucket floor: decode(encode(x)) <= x
    xs = np.arange(0, 100000)
    dec = byte4_to_int(int_to_byte4(xs))
    assert np.all(dec <= xs)
    # and encode is monotone in x
    assert np.all(np.diff(int_to_byte4(xs)) >= 0)
