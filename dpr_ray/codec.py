"""Posting-list codec: numpy-vectorized LEB128 varint + delta encoding.

Physical posting-list layout (FIXTURES.md F7): postings for a term are
docid-sorted and split into fixed-size blocks. Each block stores three
varint-encoded byte strings — delta(docids), tfs, dls — plus a conservative
float32 upper bound ``max_tf_norm`` of the BM25 tf-normalization component
(block-max, for WAND skipping) and the first/last docid for navigation.

Everything is vectorized: encode/decode touch no per-value Python loops.
The codec is lossless; exactness of scores is preserved because tf and dl
are stored as integers and the scorer recomputes float64 tf_norm.
"""

from __future__ import annotations

import numpy as np

_SHIFTS = (np.arange(10, dtype=np.uint64) * np.uint64(7))  # varint byte shifts
_THRESHOLDS = (np.uint64(1) << (_SHIFTS[1:]))  # 2^7, 2^14, ..., 2^63


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints (any int dtype) to bytes."""
    v = np.ascontiguousarray(values).astype(np.uint64)
    if v.size == 0:
        return b""
    # exact per-value byte count: 1 + (#thresholds <= v)
    nbytes = np.ones(len(v), dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += (v >= t).astype(np.int64)
    payload = (v[:, None] >> _SHIFTS[None, :]) & np.uint64(0x7F)  # (n, 10)
    cont = np.arange(10)[None, :] < (nbytes - 1)[:, None]
    mat = (payload | (cont.astype(np.uint64) << np.uint64(7))).astype(np.uint8)
    keep = np.arange(10)[None, :] < nbytes[:, None]
    return mat[keep].tobytes()  # row-major: bytes of value i precede value i+1


def encode_varint_with_counts(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode and ALSO return the per-value byte counts, so callers
    can slice the byte stream at arbitrary value boundaries (the batched
    many-posting-lists encoder needs per-term offsets)."""
    v = np.ascontiguousarray(values).astype(np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    nbytes = np.ones(len(v), dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += (v >= t).astype(np.int64)
    payload = (v[:, None] >> _SHIFTS[None, :]) & np.uint64(0x7F)
    cont = np.arange(10)[None, :] < (nbytes - 1)[:, None]
    mat = (payload | (cont.astype(np.uint64) << np.uint64(7))).astype(np.uint8)
    keep = np.arange(10)[None, :] < nbytes[:, None]
    return mat[keep].tobytes(), nbytes


def decode_varint(buf: bytes | memoryview) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    vid = np.zeros(len(b), dtype=np.int64)
    np.cumsum(is_end[:-1], out=vid[1:])
    starts = np.empty(int(vid[-1]) + 1, dtype=np.int64)
    starts[0] = 0
    ends = np.flatnonzero(is_end)
    starts[1:] = ends[:-1] + 1
    pos = (np.arange(len(b)) - starts[vid]).astype(np.uint64)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (pos * np.uint64(7))
    out = np.zeros(len(starts), dtype=np.uint64)
    np.add.at(out, vid, contrib)  # disjoint bit ranges → add == or
    return out


def delta_encode(sorted_vals: np.ndarray) -> bytes:
    """Varint(first, gaps) for a strictly-increasing uint64 array."""
    v = np.ascontiguousarray(sorted_vals).astype(np.uint64)
    if v.size == 0:
        return b""
    deltas = np.empty_like(v)
    deltas[0] = v[0]
    np.subtract(v[1:], v[:-1], out=deltas[1:])
    return encode_varint(deltas)


def delta_decode(buf: bytes | memoryview) -> np.ndarray:
    d = decode_varint(buf)
    return np.cumsum(d, dtype=np.uint64)


def max_tf_norm_bound(
    tfs: np.ndarray, dls: np.ndarray, avgdl: float, k1: float, b: float
) -> np.float32:
    """Conservative float32 upper bound of tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))
    over a block. Rounded UP one float32 ulp so WAND pruning can never drop a
    document whose exact float64 score would reach the heap (SURVEY §7 hard
    part (c))."""
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    m = np.float32(norm.max()) if norm.size else np.float32(0.0)
    return np.float32(np.nextafter(m, np.float32(np.inf)))
