"""Windowed aggregates over stream-shaped tables (events).

Ray Data has no event-time windows; a tumbling window is a groupby over the
truncated timestamp. The implementation pre-aggregates per batch (one row
per (window, key) per batch) so the shuffle moves partials, not events —
the partial+final pattern for aggregation at scale.

Ordering assumption: none — tumbling counts/sums are order-independent.
(Session windows would need per-key ts-sorted map_groups; see
``session_windows``.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from .._shipping import ensure_shippable
from ..util import round_half_away

_UNIT_US = {"second": 1_000_000, "minute": 60_000_000, "hour": 3_600_000_000,
            "day": 86_400_000_000}


def tumbling_window_agg(
    events_ds,
    window: str = "hour",
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """→ Dataset (window_start: timestamp[us], <key_col>, n_events,
    sum_value): tumbling-window count + sum per key."""
    ensure_shippable()
    unit = _UNIT_US[window]

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (ts // unit) * unit
        t = pa.table(
            {
                "w": pa.array(win, pa.int64()),
                "key": batch[key_col],
                "value": batch[value_col],
            }
        )
        g = t.group_by(["w", "key"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )
        return pa.table(
            {
                "w": g["w"],
                "key": g["key"],
                "sum_part": g["value_sum"],
                "n_part": g["value_count"],
            }
        )

    partials = events_ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(["w", "key"]).aggregate(
        Sum("sum_part", alias_name="sum_value"),
        Sum("n_part", alias_name="n_events"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": batch["w"].cast(pa.timestamp("us")),
                key_col: batch["key"],
                "n_events": batch["n_events"].cast(pa.int64()),
                "sum_value": pa.array(
                    round_half_away(
                        batch["sum_value"].to_numpy(zero_copy_only=False)
                    ),
                    pa.float64(),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def hopping_window_agg(
    events_ds,
    window_us: int = 3_600_000_000,
    hop_us: int = 900_000_000,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """→ Dataset (window_start: timestamp[us], <key_col>, n_events,
    sum_value): HOPPING (sliding) windows of length ``window_us`` advancing
    every ``hop_us``. ``window_us`` must be a multiple of ``hop_us``; each
    event then belongs to exactly ``window_us // hop_us`` windows (starts
    ``(ts // hop - i) * hop`` for ``i in 0..k-1``), so the per-batch
    expansion factor is the fixed constant k — partials stay one row per
    (window, key) per batch and the shuffle moves partials, not the
    k-times-replicated events."""
    ensure_shippable()
    if window_us % hop_us:
        raise ValueError("window_us must be a multiple of hop_us")
    k = window_us // hop_us

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(ts)
        base = (ts // hop_us) * hop_us
        # (k, n) window starts, flattened; keys/values tiled by take
        win = (base[None, :] - np.arange(k, dtype=np.int64)[:, None] * hop_us).ravel()
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), k))
        t = pa.table(
            {
                "w": pa.array(win, pa.int64()),
                "key": pc.take(batch[key_col], idx),
                "value": pc.take(batch[value_col], idx),
            }
        )
        g = t.group_by(["w", "key"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )
        return pa.table(
            {
                "w": g["w"],
                "key": g["key"],
                "sum_part": g["value_sum"],
                "n_part": g["value_count"],
            }
        )

    agg = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["w", "key"])
        .aggregate(
            Sum("sum_part", alias_name="sum_value"),
            Sum("n_part", alias_name="n_events"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": batch["w"].cast(pa.timestamp("us")),
                key_col: batch["key"],
                "n_events": batch["n_events"].cast(pa.int64()),
                "sum_value": pa.array(
                    round_half_away(
                        batch["sum_value"].to_numpy(zero_copy_only=False)
                    ),
                    pa.float64(),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def session_windows(
    events_ds,
    gap_seconds: float = 1800.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
):
    """→ Dataset (key, session_start, session_end, n_events): session
    windows per key (gap-based). Ordering handled inside map_groups: each
    key's events are sorted by ts in its group (the documented partitioning
    assumption: all events of a key land in one group via the groupby)."""
    ensure_shippable()

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ts = g[ts_col].astype("int64").to_numpy() / 1e6  # seconds
        new_session = np.ones(len(ts), dtype=bool)
        new_session[1:] = (ts[1:] - ts[:-1]) > gap_seconds
        sid = np.cumsum(new_session)
        out = (
            pd.DataFrame(
                {"sid": sid, "ts": g[ts_col].to_numpy(), key_col: g[key_col].to_numpy()}
            )
            .groupby("sid")
            .agg(
                session_start=("ts", "min"),
                session_end=("ts", "max"),
                n_events=("ts", "size"),
            )
            .reset_index(drop=True)
        )
        out.insert(0, key_col, g[key_col].iloc[0])
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return events_ds.groupby(key_col).map_groups(sessions, batch_format="pandas")
