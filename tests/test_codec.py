"""Varint/delta codec round-trip tests (FIXTURES.md F7)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dpr_ray import codec


def test_varint_empty():
    assert codec.encode_varint(np.empty(0, dtype=np.uint64)) == b""
    assert len(codec.decode_varint(b"")) == 0


def test_varint_known_values():
    # 0 and 127 are single bytes; 128 is two bytes (LEB128)
    assert codec.encode_varint(np.array([0], dtype=np.uint64)) == b"\x00"
    assert codec.encode_varint(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert codec.encode_varint(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert codec.encode_varint(np.array([300], dtype=np.uint64)) == b"\xac\x02"


def test_varint_boundaries_roundtrip():
    vals = []
    for i in range(0, 64, 7):
        vals += [(1 << i) - 1, 1 << i, (1 << i) + 1]
    vals.append(2**64 - 1)
    arr = np.array(sorted(set(v for v in vals if v < 2**64)), dtype=np.uint64)
    assert np.array_equal(codec.decode_varint(codec.encode_varint(arr)), arr)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
def test_varint_roundtrip_property(xs):
    arr = np.array(xs, dtype=np.uint64)
    assert np.array_equal(codec.decode_varint(codec.encode_varint(arr)), arr)


@settings(max_examples=50, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**48), max_size=300))
def test_delta_roundtrip_property(xs):
    arr = np.array(sorted(xs), dtype=np.uint64)
    assert np.array_equal(codec.delta_decode(codec.delta_encode(arr)), arr)


def test_delta_is_compact():
    dense = np.arange(10_000, 20_000, dtype=np.uint64)
    assert len(codec.delta_encode(dense)) < 10_050  # ~1 byte per gap


def test_max_tf_norm_is_conservative():
    rng = np.random.default_rng(7)
    tfs = rng.integers(1, 50, 1000)
    dls = rng.integers(1, 5000, 1000)
    from dpr_ray.config import BM25Params
    from dpr_ray.query.scorer import tf_norm_vec

    p = BM25Params()
    bound = codec.max_tf_norm_bound(tfs, dls, 300.0, p.k1, p.b)
    exact = tf_norm_vec(tfs, dls, 300.0, p)
    assert float(bound) >= exact.max()


def test_concat_delta_decode_rejects_empty_blob():
    """A blob decoding to zero values is a truncated/corrupt segment file;
    pre-guard, a TRAILING empty blob died as an opaque IndexError inside
    the cumsum reconstruction deep in query serving."""
    import pytest

    from dpr_ray.index import segments as seg

    good = codec.delta_encode(np.array([3, 9, 20], dtype=np.uint64))
    ok, per = seg.concat_delta_decode([good, good])
    assert per.tolist() == [3, 3]
    for blobs in ([good, b""], [b"", good], [b""]):
        with pytest.raises(ValueError, match="corrupt posting blob"):
            seg.concat_delta_decode(blobs)


def test_encode_single_block_lists_rejects_empty_group():
    """An empty term group would silently steal a neighbor's bounds
    (reduceat identity semantics) — a df=0 row with bogus block_max
    corrupts BMW pruning; the precondition is now loud."""
    import pytest

    from dpr_ray.config import BM25Params
    from dpr_ray.index import segments as seg

    docids = np.array([3, 9], dtype=np.uint64)
    tfs = np.array([1, 2], dtype=np.uint64)
    dls = np.array([5, 6], dtype=np.uint64)
    with pytest.raises(ValueError, match="empty term group"):
        seg.encode_single_block_lists(
            ["a", "b"], np.array([0, 0, 2], np.int64), docids, tfs, dls,
            avgdl=5.0, params=BM25Params(), num_tbuckets=4,
        )
    tbl, dfs = seg.encode_single_block_lists(
        ["a", "b"], np.array([0, 1, 2], np.int64), docids, tfs, dls,
        avgdl=5.0, params=BM25Params(), num_tbuckets=4,
    )
    assert dfs.tolist() == [1, 1] and tbl.num_rows == 2
