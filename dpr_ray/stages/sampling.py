"""Deterministic corpus sampling and per-group top-k selection — the two
"shrink it" primitives of a training-data pipeline (downsample a stratum,
keep the best N per stratum).

- ``stratified_sample``: hash-gated Bernoulli per stratum. The keep
  decision is a pure function of (seed, key) — rerunning, resharding or
  resuming the pipeline keeps EXACTLY the same rows (no RNG state, no
  ordering dependence), and the 31-bit rolling hash is SQL-expressible so
  the oracle replays the sample row-for-row. Map-only: no shuffle at all.
- ``grouped_topk``: per-block partial top-k per group (each block emits at
  most k rows per group it has seen) → one ``groupby`` finisher. The
  shuffle moves O(k × groups-per-block) rows, never the corpus; total
  order (value desc, id asc) makes results reproducible under ties.

No reference counterpart (DPR's only sampling is seeded epoch shuffles,
``dpr/utils/data_utils.py:342-442``); engine additions like heavy_hitters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .._shipping import ensure_shippable
from ..util import token_hash31_impl


def stratified_sample(
    ds,
    key_col: str,
    strata_col: str,
    rates_i6: dict[str, int],
    default_rate_i6: int = 0,
    seed: str = "s",
):
    """Keep a row iff ``scramble(roll131(seed + ':' + str(key))) % 1e6 <
    rate_i6[stratum]`` — per-stratum Bernoulli, deterministic in the key.
    Rates are parts-per-million ints (exact, no float thresholds). The
    Knuth multiplicative scramble matters: the raw rolling hash of short
    key strings is badly mixed in the low range (measured 0.99 keep at a
    0.70 gate); one modular multiply restores uniformity and stays
    SQL-expressible within int64 (h < 2^31, 2654435761·h < 2^63)."""
    ensure_shippable()

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        strata = batch[strata_col].to_pylist()
        gate = np.fromiter(
            (
                (token_hash31_impl(f"{seed}:{k}", 131) * 2654435761)
                % 2147483647
                % 1_000_000
                < rates_i6.get(s, default_rate_i6)
                for k, s in zip(keys, strata)
            ),
            dtype=bool,
            count=len(keys),
        )
        return batch.filter(pa.array(gate))

    return ds.map_batches(keep, batch_format="pyarrow")


def grouped_topk(
    ds,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int,
):
    """→ Dataset: the top-``k`` rows per group by (value desc, id asc),
    with a ``rank`` column (1-based). Exact under ties (total order)."""
    ensure_shippable()

    def partial_topk(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            batch,
            sort_keys=[
                (group_col, "ascending"),
                (value_col, "descending"),
                (id_col, "ascending"),
            ],
        )
        t = batch.take(order)
        g = t[group_col].to_numpy(zero_copy_only=False)
        # rank within run of equal group values (sorted, so runs contiguous)
        starts = np.concatenate(([0], np.nonzero(g[1:] != g[:-1])[0] + 1))
        pos = np.arange(len(g)) - np.repeat(starts, np.diff(np.append(starts, len(g))))
        return t.filter(pa.array(pos < k))

    def finish(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group,
            sort_keys=[(value_col, "descending"), (id_col, "ascending")],
        )
        t = group.take(order[:k])
        return t.append_column(
            "rank", pa.array(np.arange(1, t.num_rows + 1, dtype=np.int64))
        )

    return (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(finish, batch_format="pyarrow")
    )


def fixed_size_sample(
    ds,
    key_col: str,
    n: int,
    seed: str = "s",
):
    """Exactly-``n`` uniform sample, deterministic in the keys: every row
    gets a scrambled-hash priority and the global ``n`` smallest win
    (ties → smaller key). Distributed as per-block partial top-n →
    single-group finisher — the shuffle carries ≤ n rows per block, and
    the result is independent of partitioning, ordering, or reruns
    (reservoir sampling without the order-dependence)."""
    ensure_shippable()

    def add_priority(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        pri = np.fromiter(
            (
                (token_hash31_impl(f"{seed}:{k}", 131) * 2654435761)
                % 2147483647
                for k in keys
            ),
            dtype=np.int64,
            count=len(keys),
        )
        return pa.table(
            {
                "key": batch[key_col].cast(pa.int64()),
                # grouped_topk keeps the LARGEST values: negate so the
                # smallest priorities win
                "neg_priority": pa.array(-pri, pa.int64()),
                "grp": pa.array(np.zeros(len(keys), np.int64), pa.int64()),
            }
        )

    out = grouped_topk(
        ds.map_batches(add_priority, batch_format="pyarrow"),
        group_col="grp",
        value_col="neg_priority",
        id_col="key",
        k=n,
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"key": batch["key"], "rank": batch["rank"]}
        )

    return out.map_batches(finish, batch_format="pyarrow")
