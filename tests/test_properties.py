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


doc_texts = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d", "ee"]), max_size=12).map(
        " ".join
    ),
    min_size=1,
    max_size=8,
)

_few = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _docs_of(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "docid": pa.array(range(len(texts)), pa.int64()),
                "content": pa.array(texts, pa.string()),
            }
        )
    )


@_few
@given(texts=doc_texts)
def test_ngram_hashed_equals_string_property(ray_session, texts):
    from dpr_ray.stages.dedup import ngram_jaccard_pairs, ngram_jaccard_pairs_hashed

    docs = _docs_of(texts)
    want = ngram_jaccard_pairs(docs, threshold=0.1).to_pandas()
    got = ngram_jaccard_pairs_hashed(docs, threshold=0.1).to_pandas()
    if want.empty or got.empty:
        assert want.empty and got.empty
        return
    want = want.sort_values(["docid_a", "docid_b"]).reset_index(drop=True)
    got = got.sort_values(["docid_a", "docid_b"]).reset_index(drop=True)
    assert want.equals(got)


@_few
@given(corpus=doc_texts, test=doc_texts)
def test_decontam_property(ray_session, corpus, test):
    from dpr_ray.stages.dedup import decontaminate

    W = 3
    out = (
        decontaminate(_docs_of(corpus), _docs_of(test), window=W)
        .to_pandas()
        .set_index("docid")
    )
    test_windows = set()
    for t in test:
        toks = t.split() if t else []
        for i in range(len(toks) - W + 1):
            test_windows.add(tuple(toks[i : i + W]))
    assert len(out) == len(corpus)
    for did, t in enumerate(corpus):
        toks = t.split() if t else []
        spans = [tuple(toks[i : i + W]) for i in range(len(toks) - W + 1)]
        assert out.loc[did, "n_spans"] == len(spans)
        assert out.loc[did, "n_hits"] == sum(s in test_windows for s in spans)


@_few
@given(texts=doc_texts)
def test_repetition_property(ray_session, texts):
    from collections import Counter

    from dpr_ray.stages.text_stats import RepetitionStats

    out = (
        _docs_of(texts)
        .map_batches(RepetitionStats(), batch_format="pyarrow")
        .to_pandas()
        .set_index("docid")
    )
    for did, t in enumerate(texts):
        toks = t.split() if t else []
        c2 = Counter(tuple(toks[i : i + 2]) for i in range(len(toks) - 1))
        c3 = Counter(tuple(toks[i : i + 3]) for i in range(len(toks) - 2))
        exp2 = round(max(c2.values()) / sum(c2.values()), 6) if c2 else 0.0
        exp3 = (
            round(sum(v for v in c3.values() if v > 1) / sum(c3.values()), 6)
            if c3
            else 0.0
        )
        assert abs(out.loc[did, "top2_frac"] - exp2) < 1e-9
        assert abs(out.loc[did, "dup3_frac"] - exp3) < 1e-9


@_few
@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=30
    ),
    ivs=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 20)),
        min_size=0,
        max_size=15,
    ),
)
def test_interval_join_property(ray_session, events, ivs):
    from dpr_ray.stages.joins import interval_join

    ev = pa.table(
        {
            "event_id": pa.array(range(len(events)), pa.int64()),
            "user_id": pa.array([u for u, _ in events], pa.int64()),
            "ts": pa.array([t for _, t in events], pa.int64()),
        }
    )
    iv = pa.table(
        {
            "user_id": pa.array([u for u, _, _ in ivs], pa.int64()),
            "session_start": pa.array([s for _, s, _ in ivs], pa.int64()),
            "session_end": pa.array([s + d for _, s, d in ivs], pa.int64()),
        }
    )
    out = interval_join(
        ray.data.from_arrow(ev), ray.data.from_arrow(iv)
    ).to_pandas()
    got = set(map(tuple, out[["left_id", "start_us", "end_us"]].to_numpy()))
    want, matched = set(), set()
    for eid, (u, t) in enumerate(events):
        for iu, s, d in ivs:
            if iu == u and s <= t <= s + d:
                want.add((eid, s, s + d))
                matched.add(eid)
    for eid in range(len(events)):
        if eid not in matched:
            want.add((eid, -1, -1))
    assert got == want


@_few
@given(
    vals=st.lists(st.integers(0, 40), min_size=1, max_size=60),
    budget=st.integers(1, 50),
)
def test_pack_fragments_property(ray_session, vals, budget):
    """Fragment tiling invariants for random token counts and budgets:
    fragments partition each nonzero doc's [0, n); every window except
    the last sums to exactly the budget; global fragment order in
    (bin_id, key) equals the concatenation layout."""
    from dpr_ray.stages.scan import pack_fragments

    keys = list(range(0, 2 * len(vals), 2))  # sparse, unique, ordered
    ds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(keys, pa.int64()),
                "v": pa.array(vals, pa.int64()),
            }
        )
    ).repartition(3)
    out = pack_fragments(ds, "k", "v", budget=budget, bucket_width=7).to_pandas()
    total = sum(vals)
    vmap = dict(zip(keys, vals))
    if total == 0:
        assert len(out) == 0
        return
    out = out.sort_values(["key", "bin_id"], ignore_index=True)
    assert set(out["key"]) == {k for k, v in vmap.items() if v > 0}
    for k, g in out.groupby("key"):
        assert g["tok_start"].iloc[0] == 0
        assert g["tok_end"].iloc[-1] == vmap[k]
        assert (
            g["tok_start"].to_numpy()[1:] == g["tok_end"].to_numpy()[:-1]
        ).all()
    if total:
        per_bin = out.groupby("bin_id")["frag_len"].sum().sort_index()
        assert per_bin.iloc[:-1].eq(budget).all()
        assert per_bin.sum() == total
        assert list(per_bin.index) == list(range((total - 1) // budget + 1))
