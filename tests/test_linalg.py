"""Distributed Gram partials / covariance / PCA whitening vs numpy."""

import numpy as np
import pyarrow as pa
import ray

from dpr_ray.stages.linalg import covariance, gram_partials, pca_whiten


def _ds(x):
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(x)), pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in x], pa.list_(pa.float64())
                ),
            }
        )
    ).repartition(4)


def test_gram_partials_exact(ray_session):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(300, 8))
    n, sx, sxx = gram_partials(_ds(x))
    assert n == 300
    np.testing.assert_allclose(sx, x.sum(axis=0), rtol=1e-12)
    np.testing.assert_allclose(sxx, x.T @ x, rtol=1e-12)


def test_covariance_matches_numpy(ray_session):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(500, 6)) * np.array([1, 2, 3, 1, 2, 3])
    out = covariance(_ds(x)).to_pandas()
    want = np.cov(x, rowvar=False, bias=True)
    got = np.zeros((6, 6))
    got[out["i"], out["j"]] = out["cov_i4"] / 1e4
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pca_whiten_decorrelates(ray_session):
    rng = np.random.default_rng(3)
    # correlated 2D data embedded in 4D
    base = rng.normal(size=(1000, 2))
    x = np.column_stack(
        [base[:, 0], base[:, 0] * 0.9 + base[:, 1] * 0.1, base[:, 1], base[:, 0]]
    )
    out = (
        pca_whiten(_ds(x), n_components=2)
        .to_pandas()
        .sort_values("id")
    )
    z = np.array(out["whitened"].tolist())
    cz = np.cov(z, rowvar=False, bias=True)
    np.testing.assert_allclose(cz, np.eye(2), atol=1e-6)


def test_pca_whiten_deterministic(ray_session):
    rng = np.random.default_rng(4)
    x = rng.normal(size=(200, 5))
    a = pca_whiten(_ds(x)).to_pandas().sort_values("id")
    b = pca_whiten(_ds(x)).to_pandas().sort_values("id")
    np.testing.assert_array_equal(
        np.array(a["whitened"].tolist()), np.array(b["whitened"].tolist())
    )
