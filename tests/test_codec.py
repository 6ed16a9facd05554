"""Gorilla XOR + delta-of-delta codec roundtrip tests (FIXTURES.md T4)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fruits_spark.kernels.codec import (
    dod_decode,
    dod_encode,
    gorilla_decode,
    gorilla_encode,
)

RNG = np.random.default_rng(7)


def test_gorilla_roundtrip_smooth():
    # rolled-up signature streams are smooth — the codec's sweet spot
    x = np.cumsum(RNG.normal(0, 0.01, 500)) + 100.0
    enc = gorilla_encode(x)
    np.testing.assert_array_equal(gorilla_decode(enc, len(x)), x)
    assert len(enc) < 8 * len(x)  # actually compresses


def test_gorilla_roundtrip_edge_cases():
    for x in [
        np.array([]),
        np.array([0.0]),
        np.array([1.5, 1.5, 1.5]),
        np.array([np.pi, -np.e, 0.0, 1e300, 5e-324]),
        RNG.random(100),
    ]:
        enc = gorilla_encode(x)
        np.testing.assert_array_equal(gorilla_decode(enc, len(x)), x)


def test_gorilla_constant_is_tiny():
    x = np.full(1000, 42.0)
    enc = gorilla_encode(x)
    assert len(enc) <= 8 + 1000 // 8 + 2  # 1 bit/value after the first


def test_dod_roundtrip_regular():
    t = np.arange(0, 10000, 10, dtype=np.int64)
    enc = dod_encode(t)
    np.testing.assert_array_equal(dod_decode(enc, len(t)), t)
    assert len(enc) <= 16 + 2 + len(t) // 8 + 2  # ~1 bit per step


def test_dod_roundtrip_jittery():
    t = np.cumsum(RNG.integers(1, 5000, 300)).astype(np.int64)
    enc = dod_encode(t)
    np.testing.assert_array_equal(dod_decode(enc, len(t)), t)


def test_dod_edge_cases():
    for t in [
        np.array([], dtype=np.int64),
        np.array([7], dtype=np.int64),
        np.array([-5, 3], dtype=np.int64),
        np.array([0, 1 << 40, 0, -(1 << 40)], dtype=np.int64),
    ]:
        enc = dod_encode(t)
        np.testing.assert_array_equal(dod_decode(enc, len(t)), t)


@given(
    st.lists(
        st.floats(allow_nan=False, width=64), min_size=0, max_size=60
    )
)
@settings(max_examples=50, deadline=None)
def test_gorilla_roundtrip_property(xs):
    x = np.array(xs, dtype=np.float64)
    np.testing.assert_array_equal(gorilla_decode(gorilla_encode(x), len(x)), x)


@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62),
        min_size=0,
        max_size=60,
    )
)
@settings(max_examples=50, deadline=None)
def test_dod_roundtrip_property(ts):
    t = np.array(ts, dtype=np.int64)
    np.testing.assert_array_equal(dod_decode(dod_encode(t), len(t)), t)
