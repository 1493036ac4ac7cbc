"""stratified_sample determinism/rates; grouped_topk vs pandas ground truth."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from dpr_ray.stages.sampling import grouped_topk, stratified_sample
from dpr_ray.util import token_hash31


def _docs(n=1000):
    langs = ["en", "de", "fr"]
    return pa.table(
        {
            "docid": pa.array(np.arange(n), pa.int64()),
            "lang": pa.array([langs[i % 3] for i in range(n)], pa.string()),
            "score": pa.array((np.arange(n) * 37) % 101, pa.int64()),
        }
    )


def test_stratified_sample_deterministic_and_gated(ray_session):
    t = _docs()
    ds = ray.data.from_arrow(t).repartition(4)
    rates = {"en": 700_000, "de": 300_000}
    out1 = stratified_sample(ds, "docid", "lang", rates, 0).to_pandas()
    out2 = stratified_sample(ds, "docid", "lang", rates, 0).to_pandas()
    a = out1.sort_values("docid").reset_index(drop=True)
    b = out2.sort_values("docid").reset_index(drop=True)
    assert a.equals(b)  # rerun == identical rows
    assert (a["lang"] != "fr").all()  # default rate 0 drops the stratum
    # keep decision matches the hash gate row-for-row
    for _, r in a.iterrows():
        h = (token_hash31(f"s:{r['docid']}", 131) * 2654435761) % 2147483647
        assert h % 1_000_000 < rates[r["lang"]]
    # rates land within a loose tolerance of the gate
    en = (a["lang"] == "en").sum() / 334
    assert 0.55 < en < 0.85


def test_grouped_topk_matches_pandas(ray_session):
    t = _docs(500)
    ds = ray.data.from_arrow(t).repartition(5)
    out = (
        grouped_topk(ds, "lang", "score", "docid", k=4)
        .to_pandas()
        .sort_values(["lang", "rank"])
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    want = (
        df.sort_values(["lang", "score", "docid"],
                       ascending=[True, False, True])
        .groupby("lang")
        .head(4)
        .reset_index(drop=True)
    )
    assert len(out) == len(want)
    assert (out["docid"].to_numpy() == want["docid"].to_numpy()).all()
    assert (
        out.groupby("lang")["rank"]
        .apply(lambda x: list(x) == [1, 2, 3, 4])
        .all()
    )


def test_grouped_topk_small_groups(ray_session):
    t = pa.table(
        {
            "g": pa.array(["a", "a", "b"], pa.string()),
            "v": pa.array([5, 5, 1], pa.int64()),
            "i": pa.array([2, 1, 3], pa.int64()),
        }
    )
    out = (
        grouped_topk(ray.data.from_arrow(t), "g", "v", "i", k=10)
        .to_pandas()
        .sort_values(["g", "rank"])
    )
    # ties broken by id ascending
    assert list(out["i"]) == [1, 2, 3]


def test_fixed_size_sample(ray_session):
    from dpr_ray.stages.sampling import fixed_size_sample
    from dpr_ray.util import token_hash31_impl

    t = pa.table({"docid": pa.array(np.arange(500), pa.int64())})
    ds = ray.data.from_arrow(t).repartition(5)
    out = fixed_size_sample(ds, "docid", n=50).to_pandas()
    assert len(out) == 50 and sorted(out["rank"]) == list(range(1, 51))
    # matches the driver-side priority order exactly
    pri = {
        k: (token_hash31_impl(f"s:{k}", 131) * 2654435761) % 2147483647
        for k in range(500)
    }
    want = sorted(range(500), key=lambda k: (pri[k], k))[:50]
    got = out.sort_values("rank")["key"].tolist()
    assert got == want
    # rerun-identical regardless of partitioning
    out2 = (
        fixed_size_sample(ray.data.from_arrow(t).repartition(11), "docid", n=50)
        .to_pandas()
        .sort_values("rank")
    )
    assert out2.iloc[:, 0].tolist() == want
