"""Hypothesis property tests for the order-sensitive distributed ops:
asof_join, prefix_sum, exact_quantiles — randomized inputs vs exact
driver-side ground truth."""

import numpy as np
import pyarrow as pa
import ray
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dpr_ray.stages.joins import asof_join
from dpr_ray.stages.scan import prefix_sum
from dpr_ray.stages.sketch import exact_quantiles

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

events = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 30)),  # (user, ts)
    min_size=0,
    max_size=40,
)


@_slow
@given(left=events, right=events)
def test_asof_property(ray_session, left, right):
    lrows = [(i + 1000, u, t) for i, (u, t) in enumerate(left)]
    rrows = [(i + 2000, u, t) for i, (u, t) in enumerate(right)]

    def ds(rows):
        eid, uid, ts = zip(*rows) if rows else ((), (), ())
        return ray.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array(list(eid), pa.int64()),
                    "user_id": pa.array(list(uid), pa.int64()),
                    "ts": pa.array(list(ts), pa.int64()),
                }
            )
        )

    if not lrows:
        return
    out = asof_join(ds(lrows), ds(rrows)).to_pandas()
    assert len(out) == len(lrows)
    got = {r["left_id"]: (r["right_id"], r["right_ts_us"]) for _, r in out.iterrows()}
    for le, lu, lt in lrows:
        best = (-1, -1)
        for re_, ru, rt in rrows:
            if ru == lu and (rt, re_) < (lt, le):
                if best == (-1, -1) or (rt, re_) > (best[1], best[0]):
                    best = (re_, rt)
        assert got[le] == best


@_slow
@given(
    vals=st.lists(st.integers(0, 1000), min_size=1, max_size=200),
    width=st.integers(1, 50),
)
def test_prefix_sum_property(ray_session, vals, width):
    keys = np.random.default_rng(0).permutation(len(vals)) * 3  # sparse, unique
    ds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(keys, pa.int64()),
                "v": pa.array(vals, pa.int64()),
            }
        )
    ).repartition(3)
    out = (
        prefix_sum(ds, "k", "v", bucket_width=width)
        .to_pandas()
        .sort_values("key")
    )
    order = np.argsort(keys)
    want = np.concatenate(([0], np.cumsum(np.asarray(vals)[order])[:-1]))
    assert (out["offset"].to_numpy() == want).all()


@_slow
@given(vals=st.lists(st.integers(-50, 50), min_size=1, max_size=300))
def test_quantiles_property(ray_session, vals):
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(vals, pa.int64())})
    ).repartition(2)
    ps = (0, 100_000, 500_000, 999_999, 1_000_000)
    out = exact_quantiles(ds, "v", ps_i6=ps)
    s = np.sort(vals)
    got = dict(zip(out["p_i6"].to_pylist(), out["value"].to_pylist()))
    for p in ps:
        assert got[p] == s[((len(s) - 1) * p) // 1_000_000]
