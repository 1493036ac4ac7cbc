"""Hopping windows + heavy hitters vs in-process brute force."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from dpr_ray.stages.sketch import heavy_hitters
from dpr_ray.stages.windows import hopping_window_agg

HOP = 1_000_000  # 1 s
WIN = 4_000_000  # 4 s → k = 4 windows per event


def _events(n=500, seed=7):
    rng = np.random.default_rng(seed)
    ts = rng.integers(0, 60_000_000, n)  # 1 min span, us
    return pa.table(
        {
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array(
                [f"t{int(x)}" for x in rng.integers(0, 3, n)]
            ),
            "value": pa.array(rng.normal(0, 10, n), pa.float64()),
        }
    )


def test_hopping_window_vs_brute(ray_session):
    t = _events()
    got = (
        hopping_window_agg(
            ray.data.from_arrow(t).repartition(7),
            window_us=WIN,
            hop_us=HOP,
        )
        .to_pandas()
        .sort_values(["window_start", "event_type"], ignore_index=True)
    )

    # brute force: every event → its 4 windows
    ts = t["ts"].cast(pa.int64()).to_numpy()
    rows = {}
    for i in range(len(ts)):
        base = (ts[i] // HOP) * HOP
        for j in range(WIN // HOP):
            key = (base - j * HOP, t["event_type"][i].as_py())
            n, s = rows.get(key, (0, 0.0))
            rows[key] = (n + 1, s + t["value"][i].as_py())

    assert len(got) == len(rows)
    for _, r in got.iterrows():
        n, s = rows[(r["window_start"].value // 1000, r["event_type"])]
        assert r["n_events"] == n
        assert abs(r["sum_value"] - s) < 1e-5
    # every window start is hop-aligned and covers its events
    assert (got["window_start"].astype("int64") % HOP == 0).all()


def test_hopping_rejects_nonmultiple(ray_session):
    with pytest.raises(ValueError):
        hopping_window_agg(
            ray.data.from_arrow(_events(10)), window_us=3, hop_us=2
        )


def test_session_windows_vs_brute(ray_session):
    """Arrow-native sessionization vs an in-process brute force, including
    exact-gap ties (gap == threshold must NOT split — strict >) and
    duplicate timestamps."""
    from dpr_ray.stages.windows import session_windows

    rng = np.random.default_rng(11)
    n = 400
    gap_s = 2.0
    ts = rng.integers(0, 40_000_000, n)
    ts[10] = ts[11] = 5_000_000  # duplicate timestamps, same user
    users = rng.integers(0, 12, n)
    # plant an exact-gap pair for user 99: 2.000000s apart → same session
    ts = np.concatenate([ts, [70_000_000, 72_000_000]])
    users = np.concatenate([users, [99, 99]])
    t = pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        }
    )
    got = (
        session_windows(
            ray.data.from_arrow(t).repartition(7),
            gap_seconds=gap_s,
            key_col="user_id",
            ts_col="ts",
        )
        .to_pandas()
        .sort_values(["user_id", "session_start"], ignore_index=True)
    )
    # brute force per user
    want = []
    for u in np.unique(users):
        uts = np.sort(ts[users == u])
        start = prev = uts[0]
        cnt = 1
        for x in uts[1:]:
            if x - prev > gap_s * 1e6:
                want.append((u, start, prev, cnt))
                start, cnt = x, 0
            cnt += 1
            prev = x
        want.append((u, start, prev, cnt))
    assert len(got) == len(want)
    for row, (u, s, e, c) in zip(got.itertuples(index=False), want):
        assert row.user_id == u
        assert row.session_start.value // 1000 == s
        assert row.session_end.value // 1000 == e
        assert row.n_events == c
    # the exact-gap user stayed one session
    assert (got[got.user_id == 99].n_events == 2).all()


def test_session_windows_int64_type_and_empty_group(ray_session):
    """int64 ts inputs must come back as int64 session bounds (no silent
    timestamp coercion); non-µs timestamp units rescale rather than
    reinterpret; a directly-called empty group returns an empty table
    instead of raising."""
    from dpr_ray.stages.windows import session_windows

    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array(
                [0, 1_000_000, 9_000_000, 500], pa.int64()
            ),
        }
    )
    got = (
        session_windows(
            ray.data.from_arrow(t), gap_seconds=2.0,
            key_col="user_id", ts_col="ts",
        )
        .to_pandas()
        .sort_values(["user_id", "session_start"], ignore_index=True)
    )
    assert got["session_start"].dtype == np.int64
    assert got["session_end"].dtype == np.int64
    assert got["session_start"].tolist() == [0, 9_000_000, 500]
    assert got["session_end"].tolist() == [1_000_000, 9_000_000, 500]

    # non-µs timestamp unit: values rescale (s → s), not reinterpret as µs
    ts_s = pa.table(
        {
            "user_id": pa.array([7, 7], pa.int64()),
            "ts": pa.array([10, 100], pa.int64()).cast(pa.timestamp("s")),
        }
    )
    got_s = session_windows(
        ray.data.from_arrow(ts_s), gap_seconds=1.0,
        key_col="user_id", ts_col="ts",
    ).to_pandas()
    assert sorted(v.timestamp() for v in got_s["session_start"]) == [10.0, 100.0]

    # empty group straight into the group fn (unreachable via Ray's
    # groupby today, but a latent trap if called directly)
    import ray.data as _rd  # noqa: F401  (parity with other tests)

    empty = t.slice(0, 0)
    ds = session_windows(
        ray.data.from_arrow(empty), gap_seconds=2.0,
        key_col="user_id", ts_col="ts",
    )
    assert ds.count() == 0


def _docs(n=200, seed=3):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i:03d}" for i in range(120)]
    # zipf-ish skew so there ARE heavy hitters
    p = 1.0 / np.arange(1, len(vocab) + 1)
    p /= p.sum()
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 40), p=p))
        for _ in range(n)
    ]
    return pa.table({"text": pa.array(texts)})


def _brute_topk(t, k):
    from collections import Counter

    c = Counter()
    for s in t["text"].to_pylist():
        c.update(s.split(" "))
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


@pytest.mark.parametrize("capacity", [4096, 48, 4])
def test_heavy_hitters_exact(ray_session, capacity):
    """capacity=4096: no truncation; 48: sketch path with real drops;
    4: under-provisioned → exact-fallback path. All must be exact."""
    t = _docs()
    got = heavy_hitters(
        ray.data.from_arrow(t).repartition(9), k=20, capacity=capacity
    )
    want = _brute_topk(t, 20)
    assert got.column_names == ["term", "cnt", "rank"]
    assert list(got["rank"].to_pylist()) == list(range(1, len(want) + 1))
    assert list(zip(got["term"].to_pylist(), got["cnt"].to_pylist())) == want


def test_window_aggs_rescale_non_us_timestamps(ray_session):
    """tumbling/hopping over a timestamp[s] (and [ns]) ts column must
    RESCALE to µs, not reinterpret the payload: a direct int64 cast left
    seconds-valued integers that `// 3.6e9` collapsed into window 0 —
    silently wrong windows. session_windows already rescaled; the two
    fixed-window ops now share the same contract."""
    import ray.data

    from dpr_ray.stages.windows import hopping_window_agg, tumbling_window_agg

    base = 1_700_000_000  # epoch seconds
    tbl_s = pa.table(
        {
            "ts": pa.array(
                [base, base + 1800, base + 3600, base + 3605, base + 7200],
                pa.timestamp("s"),
            ),
            "event_type": ["a", "a", "a", "b", "a"],
            "value": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    tbl_us = tbl_s.set_column(
        0, "ts", tbl_s["ts"].cast(pa.timestamp("us"))
    )
    tbl_ns = tbl_s.set_column(
        0, "ts", tbl_s["ts"].cast(pa.timestamp("ns"))
    )
    for op, kw in (
        (tumbling_window_agg, {"window": "hour"}),
        (hopping_window_agg, {"window_us": 3_600_000_000,
                              "hop_us": 1_800_000_000}),
    ):
        want = (
            op(ray.data.from_arrow(tbl_us), **kw)
            .to_pandas()
            .sort_values(["window_start", "event_type"])
            .reset_index(drop=True)
        )
        assert want["n_events"].sum() > 0
        # the us run must span multiple windows (guards the assertion
        # below against a trivially-all-one-window fixture)
        assert want["window_start"].nunique() > 1
        for tbl in (tbl_s, tbl_ns):
            got = (
                op(ray.data.from_arrow(tbl), **kw)
                .to_pandas()
                .sort_values(["window_start", "event_type"])
                .reset_index(drop=True)
            )
            assert got.equals(want), (op.__name__, tbl["ts"].type)
