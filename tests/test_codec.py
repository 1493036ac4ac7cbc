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
