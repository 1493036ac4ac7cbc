"""Distributed heavy hitters (exact top-k frequent terms) via a
sketch-candidates → exact-verify two-pass.

The 100-TB shape: counting EVERY distinct term exactly is a full
groupby-shuffle over the token stream (|vocab| keys, token-stream-sized
input). Heavy hitters only needs the top-k, so pass 1 ships a bounded
sketch per block — each batch counts its terms exactly (one vectorized
``value_counts``), keeps its top-``capacity`` counters and records the
largest DROPPED count as that batch's error bound (a Misra-Gries-style
truncation: a term dropped in a batch had count ≤ that bound there).
Summing partials gives ``true(t) - err ≤ est(t) ≤ true(t)`` with
``err = Σ_b err_b``, so every true top-k term is provably inside
``{t : est(t) + err ≥ k-th largest est}`` — that candidate set is
broadcast (one ``ray.put``) and pass 2 re-counts ONLY candidates exactly.
The shuffle moves ≤ (capacity+1) rows per block in pass 1 and |candidates|
partial rows per block in pass 2, never the token stream.

If the capacity was too small for the data (k-th estimate ≤ err, so an
entirely-dropped term could still be top-k) the operator falls back to the
exact full groupby and logs it — correctness is unconditional, the sketch
is purely a traffic optimization. No silent caps: candidate count, error
bound and any fallback are logged.

Reference parity: DPR has no frequency-sketch operator; this is one of the
engine's LLM-data-pipeline additions (same family as A4/A5 corpus counters,
``dpr/data/biencoder_data.py`` corpus stats).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Sum

from .._shipping import ensure_shippable

logger = logging.getLogger(__name__)


def _term_counts(batch: pa.Table, text_col: str) -> tuple[pa.Array, pa.Array]:
    """Space-split tokens of a batch → (terms, counts), one vectorized pass
    (mirrors the oracle's ``regexp_split_to_array(text, ' ')``)."""
    toks = pc.list_flatten(pc.split_pattern(batch[text_col], " "))
    vc = toks.value_counts()
    return vc.field("values"), vc.field("counts").cast(pa.int64())


def heavy_hitters(
    docs_ds,
    k: int = 50,
    capacity: int = 4096,
    text_col: str = "text",
) -> pa.Table:
    """→ pyarrow.Table (term, cnt, rank): the EXACT top-k most frequent
    space-split terms, rank 1..k by (count desc, term asc). Small result by
    construction (k rows); the heavy work is distributed as documented in
    the module docstring."""
    ensure_shippable()

    def partial(batch: pa.Table) -> pa.Table:
        terms, counts = _term_counts(batch, text_col)
        n = len(terms)
        err = 0
        if n > capacity:
            cnp = counts.to_numpy()
            order = np.argpartition(cnp, n - capacity)
            keep, drop = order[n - capacity:], order[: n - capacity]
            err = int(cnp[drop].max())
            take = pa.array(keep)
            terms, counts = terms.take(take), counts.take(take)
        body = pa.table(
            {
                "term": terms,
                "cnt": counts,
                "is_err": pa.array(np.zeros(len(terms), dtype=bool)),
            }
        )
        err_row = pa.table(
            {
                "term": pa.array([""], pa.string()),
                "cnt": pa.array([err], pa.int64()),
                "is_err": pa.array([True]),
            }
        )
        return pa.concat_tables([body.cast(err_row.schema), err_row])

    # Narrow by construction: ≤ (capacity+1) rows per input block.
    partials = docs_ds.map_batches(partial, batch_format="pyarrow").materialize()
    err_total = sum(
        r["cnt"]
        for r in partials.map_batches(
            lambda b: b.filter(b["is_err"]), batch_format="pyarrow"
        ).take_all()
    )
    est = (
        partials.map_batches(
            lambda b: b.filter(pc.invert(b["is_err"])), batch_format="pyarrow"
        )
        .groupby("term")
        .aggregate(Sum("cnt", alias_name="est"))
    )
    top_est = est.sort("est", descending=True).limit(k).take_all()
    theta = top_est[-1]["est"] if len(top_est) >= k else 0

    if theta <= err_total:
        # Sketch under-provisioned for this distribution: a term dropped
        # everywhere could still be top-k. Fall back to the exact full
        # count — correctness over traffic.
        logger.warning(
            "heavy_hitters: capacity=%d too small (theta=%d <= err=%d); "
            "falling back to exact full count",
            capacity, theta, err_total,
        )
        exact = (
            docs_ds.map_batches(
                lambda b: pa.table(dict(zip(("term", "cnt"), _term_counts(b, text_col)))),
                batch_format="pyarrow",
            )
            .groupby("term")
            .aggregate(Sum("cnt", alias_name="cnt"))
        )
        cand_tbl = pa.Table.from_pylist(
            exact.sort(["cnt", "term"], descending=[True, False]).limit(k).take_all(),
            schema=pa.schema([("term", pa.string()), ("cnt", pa.int64())]),
        )
    else:
        thresh = theta - err_total
        cands = est.map_batches(
            lambda b: b.filter(pc.greater_equal(b["est"], thresh)),
            batch_format="pyarrow",
        )
        cand_terms = pa.array(
            [r["term"] for r in cands.select_columns(["term"]).take_all()],
            pa.string(),
        )
        logger.info(
            "heavy_hitters: %d candidates (err=%d, theta=%d)",
            len(cand_terms), err_total, theta,
        )
        cand_ref = ray.put(cand_terms)

        def exact_counts(batch: pa.Table) -> pa.Table:
            cand = ray.get(cand_ref)  # plasma-cached per worker process
            terms, counts = _term_counts(batch, text_col)
            mask = pc.is_in(terms, value_set=cand)
            return pa.table(
                {"term": terms.filter(mask), "cnt": counts.filter(mask)}
            )

        verified = (
            docs_ds.map_batches(exact_counts, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("cnt", alias_name="cnt"))
        )
        cand_tbl = pa.Table.from_pylist(
            verified.take_all(),
            schema=pa.schema([("term", pa.string()), ("cnt", pa.int64())]),
        )

    # k rows: total order (cnt desc, term asc) — deterministic, tie-safe.
    order = pc.sort_indices(
        cand_tbl,
        sort_keys=[("cnt", "descending"), ("term", "ascending")],
    )[:k]
    out = cand_tbl.take(order)
    return out.append_column(
        "rank", pa.array(np.arange(1, len(out) + 1, dtype=np.int64))
    )


def exact_quantiles(
    ds,
    value_col: str,
    ps_i6: tuple[int, ...] = (250_000, 500_000, 750_000, 900_000, 990_000),
) -> pa.Table:
    """→ pyarrow.Table ``(p_i6, value)``: EXACT discrete quantiles of an
    integer column. Quantile definition (integer arithmetic only, so the
    SQL oracle reproduces it bit-for-bit): the value at 0-indexed rank
    ``r(p) = ((n - 1) * p_i6) // 1_000_000`` of the sorted column.

    Scale shape: per-batch ``value_counts`` partials → ``groupby(value)``
    sum → a histogram whose row count is the number of DISTINCT values
    (bounded by the value domain — e.g. document lengths — not by row
    count); only that small histogram reaches the driver for the cumsum
    rank pick. No sort of the data, no per-row shuffle rows: one compact
    (value, cnt) row per distinct value per block."""
    ensure_shippable()

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch[value_col])
        return pa.table(
            {
                "value": vc.field("values").cast(pa.int64()),
                "cnt": vc.field("counts").cast(pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    tbl = pa.Table.from_pylist(
        hist.take_all(),
        schema=pa.schema([("value", pa.int64()), ("cnt", pa.int64())]),
    )
    order = pc.sort_indices(tbl, sort_keys=[("value", "ascending")])
    tbl = tbl.take(order)
    vals = tbl["value"].to_numpy()
    cum = np.cumsum(tbl["cnt"].to_numpy())
    n = int(cum[-1]) if len(cum) else 0
    out_p, out_v = [], []
    for p in ps_i6:
        if n == 0:
            continue
        r = ((n - 1) * int(p)) // 1_000_000
        out_p.append(int(p))
        out_v.append(int(vals[np.searchsorted(cum, r + 1)]))
    return pa.table(
        {
            "p_i6": pa.array(out_p, pa.int64()),
            "value": pa.array(out_v, pa.int64()),
        }
    )


def approx_quantiles(
    ds,
    value_col: str,
    id_col: str,
    rate_i6: int = 100_000,
    seed: str = "q",
    ps_i6: tuple[int, ...] = (250_000, 500_000, 750_000, 900_000, 990_000),
) -> pa.Table:
    """Approximate quantiles for CONTINUOUS / high-cardinality columns —
    the 100-TB path where :func:`exact_quantiles`' distinct-value
    histogram is unbounded: exact integer-rank quantiles OF a
    deterministic hash-gated uniform sample. The gate is the
    stratified_sample discipline (a pure function of ``(seed, id)`` —
    rerun-, reshard- and resume-stable) and values snap to i6, so the
    whole estimator replays bit-for-bit in SQL: no RNG, no sketch state.

    Error bound (DKW inequality): for sample size m the sup-norm CDF
    error is ≤ sqrt(ln(2/δ) / (2m)) with probability 1-δ — a 10% gate
    over 10^9 rows gives ±1.4e-4 quantile-units at 95% confidence. The
    map-only filter never shuffles the corpus; the driver sees one
    histogram row per distinct sampled i6 value (≤ m)."""
    ensure_shippable()
    from ..util import to_i6, token_hash31_impl

    def gate(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        keep = np.fromiter(
            (
                (token_hash31_impl(f"{seed}:{k}", 131) * 2654435761)
                % 2147483647
                % 1_000_000
                < rate_i6
                for k in ids
            ),
            dtype=bool,
            count=len(ids),
        )
        t = batch.filter(pa.array(keep))
        return pa.table(
            {
                "value_i6": pa.array(
                    to_i6(t[value_col].to_numpy(zero_copy_only=False)),
                    pa.int64(),
                )
            }
        )

    return exact_quantiles(
        ds.map_batches(gate, batch_format="pyarrow"), "value_i6", ps_i6
    )
