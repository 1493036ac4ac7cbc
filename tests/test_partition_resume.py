"""Per-partition (term-bucket) checkpointing: a build killed between
bucket merges resumes at the first unfinished bucket — no re-tokenize —
and converges to the clean-run segment bytes."""

import json
import os
import shutil

import pyarrow.dataset as pads

from dpr_ray import corpus as corpus_mod
from dpr_ray.index.build import build_index


def _segment_rows(index_dir):
    d = pads.dataset(os.path.join(index_dir, "segments"), partitioning="hive")
    return sorted(d.to_table().to_pylist(), key=lambda r: (r["term"], r["slice_id"]))


def test_partition_resume_converges(ray_session, tmp_path):
    import ray.data

    tbl = corpus_mod.synth_corpus_table(70, seed=17)
    clean = str(tmp_path / "clean")
    killed = str(tmp_path / "killed")
    ds = lambda: ray.data.from_arrow(tbl).repartition(3)  # noqa: E731

    build_index(ds(), clean, docid_strategy="hash64", partition_resume=True,
                group_budget=25, sample_mod=1)
    assert os.path.exists(os.path.join(clean, "postings_spill"))
    assert os.path.exists(os.path.join(clean, "segments_done.json"))

    # full build, then simulate a kill after bucket 5: wipe manifest, wipe
    # segment dirs > 5, truncate the done-bucket journal
    build_index(ds(), killed, docid_strategy="hash64", partition_resume=True,
                group_budget=25, sample_mod=1)
    os.remove(os.path.join(killed, "manifest.json"))
    seg_root = os.path.join(killed, "segments")
    for b in range(6, 16):
        shutil.rmtree(os.path.join(seg_root, f"tbucket={b}"), ignore_errors=True)
    with open(os.path.join(killed, "segments_done.json"), "w") as f:
        json.dump({"buckets": list(range(6))}, f)

    stats = build_index(ds(), killed, docid_strategy="hash64", resume=True,
                        partition_resume=True, group_budget=25, sample_mod=1)
    assert stats["N"] == 70
    assert _segment_rows(killed) == _segment_rows(clean)

    # resumed index answers queries identically to the clean one
    import pyarrow as pa

    from dpr_ray.query.executor import QueryExecutor

    q = pa.table({"qid": ["x"], "question": ["def import return class"]})
    a = QueryExecutor(clean, k=10)(q).to_pylist()
    b = QueryExecutor(killed, k=10)(q).to_pylist()
    assert a == b


def test_partition_resume_equals_single_pass(ray_session, tmp_path):
    """The spill+per-bucket path and the single-pass path produce identical
    segments (same skew plan ⇒ same bytes)."""
    import ray.data

    tbl = corpus_mod.synth_corpus_table(50, seed=23)
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    build_index(ray.data.from_arrow(tbl).repartition(2), a,
                docid_strategy="hash64", partition_resume=True,
                group_budget=20, sample_mod=1)
    build_index(ray.data.from_arrow(tbl).repartition(2), b,
                docid_strategy="hash64", partition_resume=False,
                group_budget=20, sample_mod=1)
    assert _segment_rows(a) == _segment_rows(b)
