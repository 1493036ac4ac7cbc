"""Distributed prefix_sum / pack_bins vs driver-side cumsum."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from dpr_ray.stages.scan import pack_bins, prefix_sum


def _ds(keys, vals):
    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(list(keys), pa.int64()),
                "v": pa.array(list(vals), pa.int64()),
            }
        )
    ).repartition(4)


def test_prefix_sum_matches_cumsum(ray_session):
    rng = np.random.default_rng(5)
    keys = rng.permutation(1000)  # unordered, unique
    vals = rng.integers(1, 50, 1000)
    out = (
        prefix_sum(_ds(keys, vals), "k", "v", bucket_width=97)
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    order = np.argsort(keys)
    want = np.concatenate(([0], np.cumsum(vals[order])[:-1]))
    assert (out["key"].to_numpy() == keys[order]).all()
    assert (out["offset"].to_numpy() == want).all()


def test_prefix_sum_auto_bucket_width(ray_session):
    keys = [3, 1 << 40, 7, 1 << 39]
    vals = [10, 20, 30, 40]
    out = prefix_sum(_ds(keys, vals), "k", "v").to_pandas().sort_values("key")
    assert list(out["offset"]) == [0, 10, 40, 80]


def test_prefix_sum_duplicate_keys_raises(ray_session):
    with pytest.raises(Exception):
        prefix_sum(_ds([1, 1, 2], [1, 1, 1]), "k", "v", bucket_width=10).take_all()


def test_pack_bins_layout(ray_session):
    keys = range(10)
    vals = [100] * 10  # budget 250 → bins of floor(offset/250)
    out = (
        pack_bins(_ds(keys, vals), "k", "v", budget=250, bucket_width=3)
        .to_pandas()
        .sort_values("key")
    )
    assert list(out["bin_id"]) == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
