"""Codec round-trip properties: encode->decode == identity, checksums
catch corruption, and compression wins on the streams the store holds."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pyhctsa_spark.functions.codec import (
    dod_decode,
    dod_encode,
    gorilla_decode,
    gorilla_encode,
)


def test_gorilla_roundtrip_basic():
    rng = np.random.default_rng(3)
    for v in [
        np.array([]),
        np.array([1.5]),
        np.zeros(100),
        np.full(50, 3.14159),
        rng.standard_normal(1000) * 1e6,
        np.arange(500, dtype=np.float64),
        np.array([0.0, -0.0, np.inf, -np.inf, 1e-308, 1e308]),
        np.array([1.5, np.nan, np.nan, np.inf, -2.25, np.nan]),
    ]:
        out = gorilla_decode(gorilla_encode(v))
        np.testing.assert_array_equal(
            out.view(np.uint64), np.asarray(v, dtype=np.float64).view(np.uint64)
        )


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(0, 400))
def test_gorilla_roundtrip_property(seed, n):
    rng = np.random.default_rng(seed)
    kind = seed % 4
    if kind == 0:
        v = rng.standard_normal(n)
    elif kind == 1:
        v = np.round(rng.standard_normal(n) * 100, 2)  # low-entropy mantissas
    elif kind == 2:
        v = np.repeat(rng.standard_normal(max(1, n // 5 + 1)), 5)[:n]
    else:
        v = rng.integers(-1000, 1000, n).astype(np.float64)
    out = gorilla_decode(gorilla_encode(v))
    np.testing.assert_array_equal(out.view(np.uint64), v.view(np.uint64))


def test_gorilla_checksum_detects_corruption():
    blob = bytearray(gorilla_encode(np.random.default_rng(0).standard_normal(64)))
    blob[20] ^= 0x40  # mid-stream payload bit (last byte may be padding)
    with pytest.raises(ValueError):
        gorilla_decode(bytes(blob))


def test_gorilla_compresses_slow_moving_series():
    # AR-like slowly varying series: XORs share windows -> < 64 bits/value
    rng = np.random.default_rng(1)
    v = np.cumsum(rng.integers(-2, 3, 4096)).astype(np.float64)
    blob = gorilla_encode(v)
    bits_per_value = (len(blob) - 16) * 8 / len(v)
    assert bits_per_value < 40


def test_dod_roundtrip_and_ratio():
    # regular window grid: ~1 bit per offset
    o = np.arange(0, 10_000, dtype=np.int64)
    blob = dod_encode(o)
    np.testing.assert_array_equal(dod_decode(blob), o)
    assert (len(blob) - 16) * 8 / len(o) < 1.2

    rng = np.random.default_rng(5)
    irregular = np.cumsum(rng.integers(1, 5000, 500)).astype(np.int64)
    np.testing.assert_array_equal(dod_decode(dod_encode(irregular)), irregular)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(-(2**40), 2**40), max_size=200))
def test_dod_roundtrip_property(xs):
    o = np.array(xs, dtype=np.int64)
    np.testing.assert_array_equal(dod_decode(dod_encode(o)), o)


def test_dod_checksum_detects_corruption():
    blob = bytearray(dod_encode(np.arange(100, dtype=np.int64)))
    blob[10] ^= 0x01
    with pytest.raises(ValueError):
        dod_decode(bytes(blob))
