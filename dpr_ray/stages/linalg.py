"""Distributed second-moment statistics over an embedding column, and the
PCA-whitening transform built on them — the embedding-hygiene step
(centering/decorrelation) a large-scale similarity pipeline runs before
indexing.

Scale shape: one ``map_batches`` pass emits per-block Gram partials
``(n, Σx, Σxxᵀ)`` — d + d² doubles per BLOCK, independent of row count —
which the driver combines exactly (float64 adds of a handful of block
partials). The corpus is never shuffled and never leaves the workers;
only O(blocks × d²) floats move. The eigendecomposition is a driver-side
``numpy.linalg.eigh`` of the d×d covariance (d is the embedding dim —
64 here, ≤ a few thousand in practice).

Determinism: partial sums use numpy's fixed pairwise summation per block
and a fixed block-order combine; eigenvector sign is normalized (largest-
|component| entry made positive) so repeated runs give identical
transforms. No reference counterpart (DPR hands FAISS raw vectors).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .._shipping import ensure_shippable
from .ann import _to_matrix  # shared zero-row-safe list<float> → (n, d)


def gram_partials(ds, vec_col: str = "embedding"):
    """→ (n, sum_x (d,), sum_xx (d, d)) combined exactly on the driver
    from per-block partials."""
    ensure_shippable()

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # a zero-row block has no dimensionality to report — emit a
            # zero-ROW partial (the driver combine skips it) rather than
            # crashing on a (0, 0) matrix
            return pa.table(
                {
                    "n": pa.array([], pa.int64()),
                    "sum_x": pa.array([], pa.list_(pa.float64())),
                    "sum_xx": pa.array([], pa.list_(pa.float64())),
                    "d": pa.array([], pa.int64()),
                }
            )
        x = _to_matrix(batch[vec_col])
        d = x.shape[1]
        return pa.table(
            {
                "n": pa.array([x.shape[0]], pa.int64()),
                "sum_x": pa.array([x.sum(axis=0).tolist()],
                                  pa.list_(pa.float64())),
                "sum_xx": pa.array([(x.T @ x).ravel().tolist()],
                                   pa.list_(pa.float64())),
                "d": pa.array([d], pa.int64()),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not rows:
        return 0, None, None
    d = int(rows[0]["d"])
    n = 0
    sum_x = np.zeros(d)
    sum_xx = np.zeros((d, d))
    for r in rows:
        n += int(r["n"])
        sum_x += np.asarray(r["sum_x"])
        sum_xx += np.asarray(r["sum_xx"]).reshape(d, d)
    return n, sum_x, sum_xx


def covariance(ds, vec_col: str = "embedding"):
    """Population covariance: → pyarrow.Table ``(i, j, cov_i4)`` (d² rows,
    ``cov_i4 = round(cov * 1e4)``). i4 — not the usual i6 — because the
    two sides sum in different orders (numpy pairwise vs DuckDB
    sequential); the ~1e-11 float drift is far inside 1e-4 granularity
    but would flip ~1e-6 boundaries once in a few thousand values."""
    n, sum_x, sum_xx = gram_partials(ds, vec_col)
    if n == 0:
        return pa.table(
            {
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "cov_i4": pa.array([], pa.int64()),
            }
        )
    mu = sum_x / n
    cov = sum_xx / n - np.outer(mu, mu)
    d = len(mu)
    ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
    scaled = cov.ravel() * 1e4
    cov_i4 = (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)
    return pa.table(
        {
            "i": pa.array(ii.ravel().astype(np.int64), pa.int64()),
            "j": pa.array(jj.ravel().astype(np.int64), pa.int64()),
            "cov_i4": pa.array(cov_i4, pa.int64()),
        }
    )


def pca_whiten(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_components: int | None = None,
    eps: float = 1e-9,
):
    """PCA whitening: → Dataset ``(id, whitened: list<double>)`` where
    ``whitened = (x - μ) V Λ^(-1/2)`` over the top ``n_components``
    eigenpairs (all by default). One stats pass + one map-only transform
    pass; the (μ, W) pair ships once via closure (d×d floats)."""
    ensure_shippable()
    n, sum_x, sum_xx = gram_partials(ds, vec_col)
    if n == 0:
        raise ValueError("pca_whiten: empty dataset")
    mu = sum_x / n
    cov = sum_xx / n - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    if n_components is not None:
        w, v = w[:n_components], v[:, :n_components]
    # deterministic sign: largest-|component| entry of each vector positive
    flip = np.sign(v[np.argmax(np.abs(v), axis=0), np.arange(v.shape[1])])
    flip[flip == 0] = 1.0
    v = v * flip[None, :]
    wmat = v / np.sqrt(np.maximum(w, eps))[None, :]

    def transform(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "id": pa.array([], pa.int64()),
                    "whitened": pa.array([], pa.list_(pa.float64())),
                }
            )
        x = _to_matrix(batch[vec_col])
        z = (x - mu[None, :]) @ wmat
        return pa.table(
            {
                "id": batch[id_col].cast(pa.int64()),
                "whitened": pa.array(z.tolist(), pa.list_(pa.float64())),
            }
        )

    return ds.map_batches(transform, batch_format="pyarrow")
