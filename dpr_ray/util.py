"""Small shared numeric helpers."""

from __future__ import annotations

import functools

import numpy as np

P31 = (1 << 31) - 1  # Mersenne prime; 31-bit hashes keep all products in u64


def poly_mod31(values, offsets, base: int) -> np.ndarray:
    """Per-group polynomial hash ``sum(v_i * base^(n-1-i)) mod (2^31-1)``
    (Horner-equivalent), vectorized across ALL groups at once. ``offsets``
    has length n_groups+1; group j owns values[offsets[j]:offsets[j+1]].
    Empty groups hash to 0.

    Deterministic across processes AND expressible in SQL as
    ``list_reduce(list_prepend(0, vals), (a,v) -> (a*base+v) % 2147483647)``
    — the property the DuckDB oracle checks rely on."""
    values = np.asarray(values, dtype=np.uint64)
    offsets = np.asarray(offsets, dtype=np.int64)
    p = np.uint64(P31)
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.uint64)
    lens = np.diff(offsets)
    if len(values) == 0 or n == 0 or lens.max() == 0:
        return out
    maxlen = int(lens.max())
    pows = np.empty(maxlen, dtype=np.uint64)
    acc = 1
    for i in range(maxlen):
        pows[i] = acc
        acc = (acc * base) % P31
    owner_end = np.repeat(offsets[1:], lens)
    revpos = owner_end - 1 - np.arange(len(values), dtype=np.int64)
    # v%p < 2^31 and pow < 2^31 → product < 2^62 (no u64 overflow); group
    # sums of L terms < L·2^31 stay in u64 for any realistic L
    terms = ((values % p) * pows[revpos]) % p
    nz = lens > 0
    out[nz] = np.add.reduceat(terms, offsets[:-1][nz]) % p
    return out


def token_hash31_impl(t: str, base: int = 131) -> int:
    """31-bit rolling hash of a token's code points (SQL-expressible,
    deterministic — never python hash()). PLAIN function: code shipped to
    workers must reference THIS, not the lru-cached wrapper below — an
    ``lru_cache`` wrapper pickles by module reference (its ``__reduce__``
    ignores ``register_pickle_by_value``), which breaks workers that can't
    ``import dpr_ray``. Cache per actor with a local dict instead."""
    h = 0
    for c in t:
        h = (h * base + ord(c)) % P31
    return h


token_hash31 = functools.lru_cache(maxsize=1_000_000)(token_hash31_impl)


def token_hash62_impl(t: str) -> int:
    """62-bit token hash from two independent 31-bit rolling hashes
    (bases 131/137) — bit-addressable for SimHash, SQL-expressible.
    Plain (shippable) like :func:`token_hash31_impl`."""
    return token_hash31_impl(t, 131) | (token_hash31_impl(t, 137) << 31)


def auto_pool(frac: float = 1.0) -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized from the cluster — never a
    hard-coded cap (a (1,4) pool starves a 32-CPU node), never min ==
    total CPUs (deadlocks against upstream read tasks)."""
    import ray

    n = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)
    return (1, max(2, int(n * frac)))


def round_half_away(x, decimals: int = 6) -> np.ndarray:
    """Round half AWAY from zero (SQL ROUND semantics; numpy rounds half to
    even — the two disagree exactly on .5 boundaries, which ratio-valued
    columns hit often). Used for every float the DuckDB oracle reproduces."""
    scale = 10.0 ** decimals
    a = np.asarray(x, dtype=np.float64) * scale
    return np.sign(a) * np.floor(np.abs(a) + 0.5) / scale


def to_i6(x) -> np.ndarray:
    """round(x * 1e6) as int64 with SQL ROUND (half-away) semantics."""
    a = np.asarray(x, dtype=np.float64) * 1e6
    return (np.sign(a) * np.floor(np.abs(a) + 0.5)).astype(np.int64)


def strip_schema_metadata(batch):
    """Drop file-level schema metadata (e.g. the ``pandas`` blob pyarrow
    embeds on write): a metadata-bearing ``pa.Schema`` is unhashable, so
    Ray's per-merge ``unify_schemas`` logs a warning for every block pair.
    Metadata-only replace — buffers are untouched (zero-copy)."""
    return batch.replace_schema_metadata(None) if batch.schema.metadata else batch


def read_parquet_clean(path, **kw):
    """``ray.data.read_parquet`` with schema metadata stripped at the read
    boundary (fused into the read task). Use for any externally-written
    parquet; files this engine writes carry no metadata already."""
    import ray.data

    return ray.data.read_parquet(path, **kw).map_batches(
        strip_schema_metadata, batch_format="pyarrow"
    )
