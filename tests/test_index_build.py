"""Index build integration: postings, stats, sha256 invariant, salting
determinism (merge(build(A), build(B)) == build(A∪B) via re-blocking)."""

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pytest

from dpr_ray import corpus as corpus_mod
from dpr_ray.config import BM25Params
from dpr_ray.index import manifest as man
from dpr_ray.index import segments as seg
from dpr_ray.index.build import build_index
from dpr_ray.query.oracle import BruteForceBM25

N_DOCS = 120


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data

    tbl = corpus_mod.synth_corpus_table(N_DOCS, seed=7)
    ds = ray.data.from_arrow(tbl).repartition(4)
    index_dir = str(tmp_path_factory.mktemp("idx"))
    # tiny group budget + dense sampling so the salting path actually runs
    stats = build_index(
        ds, index_dir, docid_strategy="hash64", group_budget=30, sample_mod=2,
        block_size=16,
    )
    return tbl, index_dir, stats


def _load_segment_rows(index_dir):
    d = pads.dataset(os.path.join(index_dir, "segments"), partitioning="hive")
    return d.to_table().to_pylist()


def test_stats(built):
    tbl, index_dir, stats = built
    assert stats["N"] == N_DOCS
    oracle = _oracle(tbl)
    assert stats["sum_dl"] == int(oracle.dls.sum())
    assert abs(stats["avgdl"] - oracle.avgdl) < 1e-12
    assert stats["head_terms_salted"] > 0, "salting path must execute"


def _oracle(tbl):
    from dpr_ray.stages.featurize import docid_from_ext_id

    ext = [f"{r}/{p}" for r, p in zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist())]
    docids = [docid_from_ext_id(e) for e in ext]
    return BruteForceBM25(docids, tbl["content"].to_pylist(), BM25Params())


def test_postings_match_oracle(built):
    tbl, index_dir, stats = built
    oracle = _oracle(tbl)
    rows = _load_segment_rows(index_dir)
    by_term = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    # every oracle term present, postings identical
    assert set(by_term.keys()) == set(oracle.df.keys())
    for term, trows in by_term.items():
        docids, tfs, dls = seg.decode_rows(trows)
        o_doc, o_tf, o_dl = oracle.postings(term)
        assert np.array_equal(docids, o_doc), term
        assert np.array_equal(tfs, o_tf), term
        assert np.array_equal(dls, o_dl), term
        assert sum(r["df"] for r in trows) == oracle.df[term]


def test_sha256_invariant(built):
    tbl, index_dir, stats = built
    d = pads.dataset(os.path.join(index_dir, "docstore"), partitioning="hive")
    got = d.to_table(columns=["ext_id", "sha256", "doclen", "content"]).to_pylist()
    src = {
        f"{r}/{p}": hashlib.sha256(c.encode()).hexdigest()
        for r, p, c in zip(
            tbl["repo"].to_pylist(), tbl["path"].to_pylist(), tbl["content"].to_pylist()
        )
    }
    assert len(got) == N_DOCS
    for row in got:
        assert src[row["ext_id"]] == row["sha256"]
        assert hashlib.sha256(row["content"].encode()).hexdigest() == row["sha256"]


def test_manifest_written(built):
    _tbl, index_dir, _stats = built
    m = man.read_manifest(index_dir)
    assert m and m["complete"]
    assert m["partitions"]["segments"], "per-partition metrics recorded"
    assert all(p["rows"] >= 0 for p in m["partitions"]["segments"])
    assert m["skew_plan"]["salted_terms"] > 0


def test_salting_does_not_change_logical_index(ray_session, tmp_path):
    """The skew plan changes slice layout (slices = docid-range salts) but
    NOT the logical index: decoded postings and query results are identical
    between an aggressively-salted and an unsalted build; and a rebuild with
    the same plan is byte-identical (determinism under resume)."""
    import pyarrow as pa
    import ray.data

    from dpr_ray.query.executor import QueryExecutor

    tbl = corpus_mod.synth_corpus_table(60, seed=11)
    a = str(tmp_path / "a")
    a2 = str(tmp_path / "a2")
    b = str(tmp_path / "b")
    build_index(ray.data.from_arrow(tbl).repartition(3), a,
                docid_strategy="hash64", group_budget=10, sample_mod=1, block_size=8)
    build_index(ray.data.from_arrow(tbl).repartition(2), a2,
                docid_strategy="hash64", group_budget=10, sample_mod=1, block_size=8)
    build_index(ray.data.from_arrow(tbl).repartition(2), b,
                docid_strategy="hash64", group_budget=10**9, sample_mod=1, block_size=8)
    # same plan, different parallelism → byte-identical
    ra = sorted(_load_segment_rows(a), key=lambda r: (r["term"], r["slice_id"]))
    ra2 = sorted(_load_segment_rows(a2), key=lambda r: (r["term"], r["slice_id"]))
    assert ra == ra2
    # different plan → logically identical
    by_term_a, by_term_b = {}, {}
    for rows, acc in ((ra, by_term_a), (_load_segment_rows(b), by_term_b)):
        for r in rows:
            acc.setdefault(r["term"], []).append(r)
    assert set(by_term_a) == set(by_term_b)
    for t in by_term_a:
        da, ta, la = seg.decode_rows(by_term_a[t])
        db, tb_, lb = seg.decode_rows(by_term_b[t])
        assert np.array_equal(da, db) and np.array_equal(ta, tb_)
        assert np.array_equal(la, lb)
        assert sum(r["df"] for r in by_term_a[t]) == sum(r["df"] for r in by_term_b[t])
    # query results identical across plans
    qb = pa.table({"qid": ["q"], "question": ["def return import class"]})
    for method in ("taat", "bmw"):
        out_a = QueryExecutor(a, k=10, method=method)(qb).to_pylist()
        out_b = QueryExecutor(b, k=10, method=method)(qb).to_pylist()
        assert out_a == out_b


@pytest.mark.parametrize(
    "shape", ["omni_term", "two_heads", "identical_docs"]
)
def test_salted_merge_adversarial_skew(ray_session, tmp_path, shape):
    """Adversarial head-term skew: a single term covering >50% (here up to
    100%) of docs must spread across MANY docid-range salts and still
    merge to the exact logical index of an unsalted build — decoded
    postings, df sums, and query results identical; and a rebuild at
    different parallelism is byte-identical (determinism under the same
    skew plan)."""
    import json

    import pyarrow as pa
    import ray.data

    from dpr_ray.query.executor import QueryExecutor

    rng = np.random.default_rng(29)
    n = 90
    contents = []
    for i in range(n):
        if shape == "omni_term":
            # "omni" in EVERY doc (df = 100%), many times, plus noise
            toks = ["omni"] * int(rng.integers(2, 8)) + [
                f"noise{int(x)}" for x in rng.integers(0, 30, 10)
            ]
        elif shape == "two_heads":
            toks = [f"noise{int(x)}" for x in rng.integers(0, 30, 8)]
            if i % 10 < 6:
                toks += ["heavya"] * 3
            if i % 2 == 0:
                toks += ["heavyb"]
        else:  # identical_docs: EVERY term is a 100%-df head term
            toks = ["alpha", "beta", "gamma", "delta", "epsilon"] * 4
        rng.shuffle(toks)
        contents.append(" ".join(toks))
    tbl = pa.table(
        {
            "repo": pa.array([f"r{i % 5}" for i in range(n)], pa.string()),
            "path": pa.array([f"p/{i}.py" for i in range(n)], pa.string()),
            "commit": pa.array(["c"] * n, pa.string()),
            "lang": pa.array(["py"] * n, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )
    salted = str(tmp_path / "salted")
    salted2 = str(tmp_path / "salted2")
    plain = str(tmp_path / "plain")
    # group_budget=8 with sample_mod=1 → the head term needs ceil(df/8)
    # salts (≥ 12 for the omni shapes)
    build_index(ray.data.from_arrow(tbl).repartition(4), salted,
                docid_strategy="hash64", group_budget=8, sample_mod=1,
                block_size=8)
    build_index(ray.data.from_arrow(tbl).repartition(2), salted2,
                docid_strategy="hash64", group_budget=8, sample_mod=1,
                block_size=8)
    build_index(ray.data.from_arrow(tbl).repartition(3), plain,
                docid_strategy="hash64", group_budget=10**9, sample_mod=1,
                block_size=8)
    with open(os.path.join(salted, "docstore_done.json")) as f:
        salt_map = json.load(f)["salt_map"]
    head_terms = {
        "omni_term": ["omni"],
        "two_heads": ["heavya", "heavyb"],
        "identical_docs": ["alpha", "beta", "gamma", "delta", "epsilon"],
    }[shape]
    for t in head_terms:
        assert t in salt_map, (shape, t, salt_map)
    rs = sorted(_load_segment_rows(salted),
                key=lambda r: (r["term"], r["slice_id"]))
    rs2 = sorted(_load_segment_rows(salted2),
                 key=lambda r: (r["term"], r["slice_id"]))
    assert rs == rs2  # same skew plan, different parallelism → same bytes
    # the head term really is spread over many slices
    n_slices_head = sum(1 for r in rs if r["term"] == head_terms[0])
    assert n_slices_head >= 4, (shape, n_slices_head)
    # logical identity vs the unsalted build, term by term
    by_term_s, by_term_p = {}, {}
    for rows, acc in ((rs, by_term_s), (_load_segment_rows(plain), by_term_p)):
        for r in rows:
            acc.setdefault(r["term"], []).append(r)
    assert set(by_term_s) == set(by_term_p)
    for t in by_term_s:
        ds_, ts_, ls_ = seg.decode_rows(
            sorted(by_term_s[t], key=lambda r: r["slice_id"]))
        dp_, tp_, lp_ = seg.decode_rows(
            sorted(by_term_p[t], key=lambda r: r["slice_id"]))
        assert np.array_equal(ds_, dp_) and np.array_equal(ts_, tp_)
        assert np.array_equal(ls_, lp_)
        assert (sum(r["df"] for r in by_term_s[t])
                == sum(r["df"] for r in by_term_p[t]))
    qb = pa.table(
        {"qid": ["q"], "question": [" ".join(head_terms + ["noise3"])]}
    )
    for method in ("taat", "maxscore", "bmw"):
        out_s = QueryExecutor(salted, k=15, method=method)(qb).to_pylist()
        out_p = QueryExecutor(plain, k=15, method=method)(qb).to_pylist()
        assert out_s == out_p, (shape, method)


def test_write_partitioned_retry_idempotent_and_zero_block(
    ray_session, tmp_path
):
    """The partitioned sink names files by a content hash of the written
    rows, so a Ray TASK RETRY (worker death after a partial write)
    overwrites its own files instead of duplicating rows under a fresh
    uuid. Simulated here by writing the same block twice into one dir.
    Also: a zero-block dataset returns zeros instead of crashing on the
    None aggregate."""
    import pyarrow as pa
    import ray.data

    from dpr_ray.index.io import write_partitioned

    tbl = pa.table(
        {
            "tbucket": pa.array([0, 0, 1], pa.int64()),
            "v": pa.array([10, 20, 30], pa.int64()),
        }
    )
    out = str(tmp_path / "o")
    r1 = write_partitioned(ray.data.from_arrow(tbl), out, "tbucket",
                           sum_cols=["v"])
    files1 = sorted(
        os.path.join(d, f)
        for d, _, fs in os.walk(out) for f in fs if f.endswith(".parquet")
    )
    # the retry: identical rows written again into the same directory
    r2 = write_partitioned(ray.data.from_arrow(tbl), out, "tbucket",
                           sum_cols=["v"])
    files2 = sorted(
        os.path.join(d, f)
        for d, _, fs in os.walk(out) for f in fs if f.endswith(".parquet")
    )
    assert files1 == files2  # same names, overwritten — no duplicates
    assert r1 == r2 == {"rows": 3, "sum_v": 60}
    import pyarrow.dataset as pads

    back = pads.dataset(out, partitioning="hive").to_table()
    assert back.num_rows == 3  # rows not doubled by the retry

    empty = ray.data.from_arrow(tbl.slice(0, 0))
    assert write_partitioned(
        empty, str(tmp_path / "e"), "tbucket", sum_cols=["v"]
    ) == {"rows": 0, "sum_v": 0}


def test_failed_rebuild_invalidates_completeness(
    ray_session, tmp_path, monkeypatch
):
    """An in-place rebuild that dies mid-way must not leave the PREVIOUS
    build's manifest.json or stats.json claiming completeness: merge_indexes
    and SegmentStore read stats.json without a completeness check, so a
    stale copy over partial data would serve the old corpus's N/avgdl
    silently. build_index removes both before mutating outputs (the same
    discipline merge_indexes applies to its out_dir)."""
    import ray.data

    from dpr_ray.index import io as iomod

    d = str(tmp_path / "idx")
    a = corpus_mod.synth_corpus_table(25, seed=3)
    b = corpus_mod.synth_corpus_table(40, seed=4)
    build_index(ray.data.from_arrow(a).repartition(2), d,
                docid_strategy="hash64")
    assert man.is_complete(d)
    assert os.path.exists(os.path.join(d, "stats.json"))

    real = iomod.write_partitioned

    def boom(*args, **kwargs):
        raise RuntimeError("injected segments-write failure")

    monkeypatch.setattr(iomod, "write_partitioned", boom)
    with pytest.raises(Exception, match="injected"):
        build_index(ray.data.from_arrow(b).repartition(2), d,
                    docid_strategy="hash64")
    assert not man.is_complete(d)
    assert not os.path.exists(os.path.join(d, "stats.json")), (
        "stale stats.json survived a failed rebuild"
    )
    monkeypatch.setattr(iomod, "write_partitioned", real)
    stats = build_index(ray.data.from_arrow(b).repartition(2), d,
                        docid_strategy="hash64")
    assert man.is_complete(d) and stats["N"] == 40
