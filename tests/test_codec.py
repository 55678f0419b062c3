"""Unit + property tests for the varint/delta posting codec."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kbasesearchengine_spark.functions.codec import (
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
)


def test_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0
    assert delta_encode(np.array([], dtype=np.uint64)) == b""
    assert delta_decode(b"").size == 0


def test_known_values():
    # 0 -> 0x00, 127 -> 0x7f, 128 -> 0x80 0x01, 300 -> 0xAC 0x02
    assert varint_encode(np.array([0])) == b"\x00"
    assert varint_encode(np.array([127])) == b"\x7f"
    assert varint_encode(np.array([128])) == b"\x80\x01"
    assert varint_encode(np.array([300])) == b"\xac\x02"
    assert varint_encode(np.array([1, 300, 2])) == b"\x01\xac\x02\x02"


def test_roundtrip_basic():
    v = np.array([0, 1, 127, 128, 255, 16384, 2**32 - 1, 2**40], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(v)), v)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
def test_varint_roundtrip_prop(xs):
    v = np.array(xs, dtype=np.uint64)
    out = varint_decode(varint_encode(v))
    assert np.array_equal(out, v)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**48), min_size=1, max_size=500)
)
def test_delta_roundtrip_prop(xs):
    ids = np.unique(np.array(xs, dtype=np.uint64))
    out = delta_decode(delta_encode(ids))
    assert np.array_equal(out, ids)


def test_delta_compression_wins():
    ids = np.arange(10_000, dtype=np.uint64) * 3 + 7
    blob = delta_encode(ids)
    assert len(blob) < 2 * len(ids)  # gaps of 3 -> ~1 byte each
