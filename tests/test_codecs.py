"""Round-trip property tests for the Gorilla / delta-of-delta codecs
(FIXTURES.md F3 compression_roundtrip, including the listed edge cases:
constant series, single point, NaN gap markers)."""

import numpy as np
import pytest

from miaplpy_spark.kernels.codecs import (
    decode_dod,
    decode_gorilla,
    encode_dod,
    encode_gorilla,
)

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


def _rt_ts(ts):
    out = decode_dod(encode_dod(np.asarray(ts, dtype=np.int64)))
    np.testing.assert_array_equal(out, np.asarray(ts, dtype=np.int64))


def _rt_vals(v):
    arr = np.asarray(v, dtype=np.float64)
    out = decode_gorilla(encode_gorilla(arr))
    np.testing.assert_array_equal(out.view(np.uint64), arr.view(np.uint64))


def test_dod_empty_single_constant():
    _rt_ts([])
    _rt_ts([1723766400])
    _rt_ts([0, 360, 720, 1080, 1440])  # steady cadence -> all '0' bits


def test_dod_gaps_and_jitter():
    _rt_ts([0, 360, 720, 1440, 1800, 5400, 5760])  # dropped slots
    _rt_ts([0, 359, 721, 1082, 1439, 1801])        # jitter
    _rt_ts([0, 10**15, 2 * 10**15 + 7, -5])         # 64-bit escape branch


def test_dod_compresses_steady_cadence():
    ts = np.arange(0, 360 * 1000, 360, dtype=np.int64)
    blob = encode_dod(ts)
    assert len(blob) < ts.nbytes / 20  # ~1 bit/point vs 8 bytes


def test_gorilla_empty_single_constant():
    _rt_vals([])
    _rt_vals([3.14159])
    _rt_vals([2.5] * 100)


def test_gorilla_nan_gap_markers():
    _rt_vals([1.0, np.nan, 1.5, np.nan, np.nan, 2.0])


def test_gorilla_mixed_values():
    rng = np.random.default_rng(42)
    _rt_vals(rng.standard_normal(500))
    _rt_vals(np.round(rng.standard_normal(500), 2))  # rounded -> compressible
    _rt_vals([0.0, -0.0, np.inf, -np.inf, 1e-308, 1e308])


def test_gorilla_compresses_slow_series():
    v = np.cumsum(np.ones(1000) * 0.5) + 100.0
    blob = encode_gorilla(v)
    assert len(blob) < v.nbytes / 2


if HAVE_HYP:

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.integers(min_value=-2**61, max_value=2**61), max_size=200))
    def test_dod_roundtrip_property(ts):
        _rt_ts(ts)

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.floats(allow_nan=True, allow_infinity=True), max_size=200))
    def test_gorilla_roundtrip_property(vals):
        _rt_vals(vals)
