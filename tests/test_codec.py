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


# ---- encode_grouped (the dtype-native batch encoder, r5) ----

from kbasesearchengine_spark.functions.codec import encode_grouped, varint_sizes


@st.composite
def grouped_postings(draw):
    """Contiguous groups of sorted-unique doc ids with int32 tf/dl lanes —
    the exact layout _flush hands the codec (int64 doc, int32 tf/dl)."""
    n_groups = draw(st.integers(min_value=1, max_value=6))
    docs, tfs, dls, starts, ends = [], [], [], [], []
    pos = 0
    for _ in range(n_groups):
        ids = draw(
            st.lists(
                st.integers(min_value=0, max_value=2**40),
                min_size=1, max_size=40, unique=True,
            )
        )
        ids = sorted(ids)
        docs.extend(ids)
        tfs.extend(
            draw(
                st.lists(
                    st.integers(min_value=1, max_value=2**20),
                    min_size=len(ids), max_size=len(ids),
                )
            )
        )
        dls.extend(
            draw(
                st.lists(
                    st.integers(min_value=1, max_value=2**30),
                    min_size=len(ids), max_size=len(ids),
                )
            )
        )
        starts.append(pos)
        pos += len(ids)
        ends.append(pos)
    return (
        np.array(docs, dtype=np.int64),
        np.array(tfs, dtype=np.int32),
        np.array(dls, dtype=np.int32),
        np.array(starts, dtype=np.int64),
        np.array(ends, dtype=np.int64),
    )


@settings(max_examples=100, deadline=None)
@given(grouped_postings(), st.sampled_from([2, 4, 128]))
def test_encode_grouped_roundtrip_and_blocks_prop(gp, block_size):
    doc, tf, dl, starts, ends = gp
    enc = encode_grouped(doc, tf, dl, starts, ends, block_size)
    for g, (s, e) in enumerate(zip(starts, ends)):
        ids, tfg, dlg = doc[s:e], tf[s:e], dl[s:e]
        assert np.array_equal(delta_decode(enc["doc_ids"][g]), ids.astype(np.uint64))
        assert np.array_equal(varint_decode(enc["tfs"][g]), tfg.astype(np.uint64))
        assert np.array_equal(varint_decode(enc["dls"][g]), dlg.astype(np.uint64))
        # block metadata: per block_size-slice maxima/minima + last doc id
        nb = (len(ids) + block_size - 1) // block_size
        assert len(enc["block_last"][g]) == nb
        for j in range(nb):
            sl = slice(j * block_size, min((j + 1) * block_size, len(ids)))
            assert enc["block_last"][g][j] == int(ids[sl][-1])
            assert enc["block_max_tf"][g][j] == int(tfg[sl].max())
            assert enc["block_min_dl"][g][j] == int(dlg[sl].min())
        # per-block byte offsets: monotone, start at 0, and each block's
        # byte slice decodes to exactly its block_size gaps/values
        for name, lane in (("doc", None), ("tf", tfg), ("dl", dlg)):
            off = enc[f"block_{name}_off"][g]
            blob = enc[{"doc": "doc_ids", "tf": "tfs", "dl": "dls"}[name]][g]
            assert off[0] == 0 and list(off) == sorted(off)
            bounds = list(off) + [len(blob)]
            for j in range(nb):
                piece = blob[bounds[j]:bounds[j + 1]]
                vals = varint_decode(piece)
                lo, hi = j * block_size, min((j + 1) * block_size, len(ids))
                assert len(vals) == hi - lo
                if lane is not None:
                    assert np.array_equal(vals, lane[lo:hi].astype(np.uint64))


@settings(max_examples=60, deadline=None)
@given(grouped_postings())
def test_encode_grouped_dtype_native_equals_uint64(gp):
    """The r5 dtype-native path (int64 doc / int32 tf,dl straight from the
    flush kernel) must produce byte-identical blobs and metadata to the
    old mandatory-uint64 inputs."""
    doc, tf, dl, starts, ends = gp
    a = encode_grouped(doc, tf, dl, starts, ends, 4)
    b = encode_grouped(
        doc.astype(np.uint64), tf.astype(np.uint64), dl.astype(np.uint64),
        starts, ends, 4,
    )
    assert a == b


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**31 - 1), min_size=1, max_size=200))
def test_varint_sizes_dtype_invariant(xs):
    v64 = np.array(xs, dtype=np.uint64)
    v32 = np.array(xs, dtype=np.int32)
    assert np.array_equal(varint_sizes(v64), varint_sizes(v32))
    assert varint_encode(v64) == varint_encode(v32.astype(np.uint64))
