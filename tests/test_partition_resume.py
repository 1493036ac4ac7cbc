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


def test_partition_resume_refuses_stale_spill(ray_session, tmp_path):
    """The postings spill holds pre-ENCODED postings: its bytes depend on
    the segment params (k1/b/num_tbuckets/block_size) and the corpus, so
    spill_done.json records resume_sig + corpus_fp and a resumed run whose
    params or corpus changed must refuse. Without this, a changed
    num_tbuckets reused a spill whose tbucket assignment no longer matches
    query-time term hashing — terms silently missing from results."""
    import pyarrow.parquet as pq
    import pytest
    import ray.data

    tbl = corpus_mod.synth_corpus_table(30, seed=9)
    cdir = tmp_path / "corp"
    cdir.mkdir()
    pq.write_table(tbl, str(cdir / "part.parquet"))
    idx = str(tmp_path / "idx")
    ds = lambda: ray.data.read_parquet(str(cdir))  # noqa: E731

    build_index(ds(), idx, docid_strategy="hash64", partition_resume=True,
                block_size=64, group_budget=20, sample_mod=1)
    # simulate a kill after the spill, mid-segments
    os.remove(os.path.join(idx, "manifest.json"))
    with open(os.path.join(idx, "segments_done.json"), "w") as f:
        json.dump({"buckets": list(range(4))}, f)
    # segment-level param changed: the docstore marker passes by design
    # (doc bytes don't depend on it) — the SPILL marker must refuse
    with pytest.raises(ValueError, match="parameters"):
        build_index(ds(), idx, docid_strategy="hash64", partition_resume=True,
                    block_size=32, group_budget=20, sample_mod=1, resume=True)
    with pytest.raises(ValueError, match="parameters"):
        build_index(ds(), idx, docid_strategy="hash64", partition_resume=True,
                    block_size=64, num_tbuckets=8, group_budget=20,
                    sample_mod=1, resume=True)
    # refusals are non-destructive: same-params resume still completes the
    # remaining buckets and converges to the clean-run bytes
    stats = build_index(ds(), idx, docid_strategy="hash64",
                        partition_resume=True, block_size=64,
                        group_budget=20, sample_mod=1, resume=True)
    assert stats["N"] == 30
    clean = str(tmp_path / "clean")
    build_index(ds(), clean, docid_strategy="hash64", partition_resume=True,
                block_size=64, group_budget=20, sample_mod=1)
    assert _segment_rows(idx) == _segment_rows(clean)
    # changed corpus with only the spill marker surviving (manifest AND
    # docstore marker gone): the docstore would rebuild from the new corpus,
    # so the SPILL marker's own fingerprint must refuse the stale spill
    pq.write_table(corpus_mod.synth_corpus_table(35, seed=10),
                   str(cdir / "part.parquet"))
    os.remove(os.path.join(idx, "manifest.json"))
    os.remove(os.path.join(idx, "docstore_done.json"))
    with pytest.raises(ValueError, match="fingerprint"):
        build_index(ds(), idx, docid_strategy="hash64", partition_resume=True,
                    block_size=64, group_budget=20, sample_mod=1, resume=True)


def test_partition_resume_rebuilds_on_bad_spill_marker(ray_session, tmp_path):
    """A spill marker that is unparseable (pre-atomic-write kill artifact)
    or predates signing ({"complete": true} only) is NOT user error: it is
    treated as absent — the spill is rebuilt from the current corpus+params
    (safe: the signed docstore marker upstream refuses corpus changes) and
    the resumed build converges to clean-run bytes instead of crashing with
    JSONDecodeError or silently reusing an unverifiable spill."""
    import pyarrow.parquet as pq
    import ray.data

    tbl = corpus_mod.synth_corpus_table(30, seed=9)
    cdir = tmp_path / "corp"
    cdir.mkdir()
    pq.write_table(tbl, str(cdir / "part.parquet"))
    idx = str(tmp_path / "idx")
    kw = dict(docid_strategy="hash64", partition_resume=True, block_size=64,
              group_budget=20, sample_mod=1)
    build_index(ray.data.read_parquet(str(cdir)), idx, **kw)
    clean = str(tmp_path / "clean")
    build_index(ray.data.read_parquet(str(cdir)), clean, **kw)

    for bad in ('{"complete": tru', '{"complete": true}'):
        os.remove(os.path.join(idx, "manifest.json"))
        with open(os.path.join(idx, "spill_done.json"), "w") as f:
            f.write(bad)
        stats = build_index(ray.data.read_parquet(str(cdir)), idx,
                            resume=True, **kw)
        assert stats["N"] == 30
        assert _segment_rows(idx) == _segment_rows(clean)
        # the rebuilt marker is signed: a stale-params resume refuses again
        with open(os.path.join(idx, "spill_done.json")) as f:
            smark = json.load(f)
        assert smark.get("resume_sig") and smark.get("corpus_fp")


def test_resume_rebuilds_on_truncated_markers(ray_session, tmp_path):
    """EVERY resume marker shares the spill marker's trust policy: a
    truncated/unparseable file (kill landed mid-json.dump before markers
    were written atomically) or one missing required keys reads as ABSENT
    — the stage reruns and converges to clean bytes — instead of crashing
    the resume with JSONDecodeError/KeyError. Affirmative signature
    mismatches still refuse loudly (test_resume_refuses_changed_params)."""
    import pyarrow.parquet as pq
    import ray.data

    tbl = corpus_mod.synth_corpus_table(30, seed=11)
    cdir = tmp_path / "corp"
    cdir.mkdir()
    pq.write_table(tbl, str(cdir / "part.parquet"))
    idx = str(tmp_path / "idx")
    kw = dict(docid_strategy="hash64", partition_resume=True, block_size=64,
              group_budget=20, sample_mod=1)
    build_index(ray.data.read_parquet(str(cdir)), idx, **kw)
    clean = str(tmp_path / "clean")
    build_index(ray.data.read_parquet(str(cdir)), clean, **kw)

    cases = [
        # (marker file, bad content) — truncated json AND legacy/keyless
        ("docstore_done.json", '{"complete": tru'),
        ("docstore_done.json", '{"complete": true}'),  # predates signing
        ("segments_done.json", '{"buckets": [0, 1'),
        ("segments_done.json", '"not-an-object"'),
        ("manifest.json", '{"complete": true, "stats": {"N"'),
    ]
    for fname, bad in cases:
        # fresh complete state, then corrupt exactly one marker
        stats = build_index(ray.data.read_parquet(str(cdir)), idx,
                            resume=True, **kw)
        with open(os.path.join(idx, fname), "w") as f:
            f.write(bad)
        if fname != "manifest.json":
            # a complete manifest short-circuits before stage markers load
            os.remove(os.path.join(idx, "manifest.json"))
        stats = build_index(ray.data.read_parquet(str(cdir)), idx,
                            resume=True, **kw)
        assert stats["N"] == 30, (fname, bad)
        assert _segment_rows(idx) == _segment_rows(clean), (fname, bad)


def test_read_json_marker_policy(tmp_path):
    """Unit contract of the shared helper: missing / unparseable /
    non-object → None (absent); valid object → the dict. write_json_atomic
    leaves no partial file at the destination path."""
    from dpr_ray.index.manifest import read_json_marker, write_json_atomic

    p = str(tmp_path / "m.json")
    assert read_json_marker(p) is None  # missing
    for bad in ('{"a": 1', "", "[1, 2]", '"str"', "\xff\xfe"):
        with open(p, "w") as f:
            f.write(bad)
        assert read_json_marker(p) is None, bad
    write_json_atomic(p, {"a": 1})
    assert read_json_marker(p) == {"a": 1}
    assert not os.path.exists(p + ".tmp")


def test_resume_refuses_changed_corpus(ray_session, tmp_path):
    """resume=True must not silently serve a DIFFERENT corpus: the
    docstore marker and the manifest record a best-effort corpus
    fingerprint (input file list + size + mtime); a resume whose input
    files don't match fails loudly instead of building segments over the
    stale docstore. tools/build_job.py defaults to resume=True, so an
    operator re-pointing --corpus at a new table hits exactly this path.
    In-memory corpora carry no file lineage — the check is skipped and
    old semantics apply."""
    import pyarrow.parquet as pq
    import pytest
    import ray.data

    a = corpus_mod.synth_corpus_table(30, seed=1)
    b = corpus_mod.synth_corpus_table(40, seed=2)
    cdir = tmp_path / "corp"
    cdir.mkdir()
    pq.write_table(a, str(cdir / "part.parquet"))
    idx = str(tmp_path / "idx")
    build_index(ray.data.read_parquet(str(cdir)), idx,
                docid_strategy="hash64", resume=True)
    # unchanged corpus: complete-manifest resume skips cleanly
    stats = build_index(ray.data.read_parquet(str(cdir)), idx,
                        docid_strategy="hash64", resume=True)
    assert stats["N"] == 30
    # changed corpus under a complete manifest: loud refusal
    pq.write_table(b, str(cdir / "part.parquet"))
    with pytest.raises(ValueError, match="fingerprint"):
        build_index(ray.data.read_parquet(str(cdir)), idx,
                    docid_strategy="hash64", resume=True)
    # killed-after-docstore shape (no manifest, marker survives): the
    # docstore marker's fingerprint also refuses
    os.remove(os.path.join(idx, "manifest.json"))
    with pytest.raises(ValueError, match="fingerprint"):
        build_index(ray.data.read_parquet(str(cdir)), idx,
                    docid_strategy="hash64", resume=True)
    # in-memory corpus: no lineage → no refusal; plain rebuild clears state
    stats = build_index(ray.data.from_arrow(b).repartition(1), idx,
                        docid_strategy="hash64")
    assert stats["N"] == 40


def test_resume_refuses_changed_params(ray_session, tmp_path):
    """The corpus fingerprint alone is not enough for resume safety:
    rerunning into an existing index dir with the SAME corpus but different
    build parameters must refuse instead of silently serving (complete
    manifest) or building on top of (docstore marker) an index that does
    not match the requested parameters. Segment-level params may
    legitimately change across a docstore-marker resume — the docstore
    bytes don't depend on them — so that combination rebuilds instead of
    refusing. In-memory corpora (fp=None) get the parameter guard too."""
    import pytest
    import ray.data

    from dpr_ray.config import BM25Params

    tbl = corpus_mod.synth_corpus_table(25, seed=5)
    idx = str(tmp_path / "idx")
    ds = lambda: ray.data.from_arrow(tbl).repartition(1)  # noqa: E731

    build_index(ds(), idx, docid_strategy="hash64", block_size=64)
    # same params: complete-manifest resume skips cleanly
    stats = build_index(ds(), idx, docid_strategy="hash64", block_size=64,
                        resume=True)
    assert stats["N"] == 25
    # segment-level param changed under a complete manifest: loud refusal
    with pytest.raises(ValueError, match="parameters"):
        build_index(ds(), idx, docid_strategy="hash64", block_size=32,
                    resume=True)
    with pytest.raises(ValueError, match="parameters"):
        build_index(ds(), idx, docid_strategy="hash64", block_size=64,
                    params=BM25Params(k1=0.5), resume=True)
    # featurize-level param changed under a complete manifest: loud refusal
    with pytest.raises(ValueError, match="parameters"):
        build_index(ds(), idx, docid_strategy="hash64", block_size=64,
                    dedup_ids=True, resume=True)
    # killed-after-docstore shape (marker survives, no manifest): a
    # featurize-level change refuses...
    os.remove(os.path.join(idx, "manifest.json"))
    with pytest.raises(ValueError, match="parameters"):
        build_index(ds(), idx, docid_strategy="hash64", block_size=64,
                    dedup_ids=True, resume=True)
    # ...but a segment-level change is FINE there: the docstore is still
    # valid, only segments rebuild — with the new params, recorded in the
    # new manifest
    stats = build_index(ds(), idx, docid_strategy="hash64", block_size=32,
                        resume=True)
    assert stats["N"] == 25 and stats["block_size"] == 32
    # and the new manifest now freezes block_size=32
    with pytest.raises(ValueError, match="parameters"):
        build_index(ds(), idx, docid_strategy="hash64", block_size=64,
                    resume=True)


def test_partition_resume_removes_stale_bucket_dirs(ray_session, tmp_path):
    """A prior partition build with a LARGER num_tbuckets killed
    mid-segments leaves tbucket dirs the current range never rewrites;
    rebuilding with resume=False must remove them — their postings use
    the old bucket assignment (phantom terms in full-segment scans,
    inflated stats). The non-partition path wipes segments_dir whole."""
    import pyarrow.parquet as pq
    import ray.data

    tbl = corpus_mod.synth_corpus_table(25, seed=19)
    cdir = tmp_path / "corp"
    cdir.mkdir()
    pq.write_table(tbl, str(cdir / "part.parquet"))
    kw = dict(docid_strategy="hash64", partition_resume=True,
              num_tbuckets=4, group_budget=20, sample_mod=1)
    clean = str(tmp_path / "clean")
    build_index(ray.data.read_parquet(str(cdir)), clean, **kw)
    idx = str(tmp_path / "idx")
    build_index(ray.data.read_parquet(str(cdir)), idx, **kw)
    # plant a stale out-of-range bucket dir (simulates the killed
    # larger-num_tbuckets run) with a real segment file inside
    seg_root = os.path.join(idx, "segments")
    src_dir = next(
        os.path.join(seg_root, d) for d in sorted(os.listdir(seg_root))
        if d.startswith("tbucket=") and os.listdir(os.path.join(seg_root, d))
    )
    stale = os.path.join(seg_root, "tbucket=9")
    shutil.copytree(src_dir, stale)
    stats = build_index(ray.data.read_parquet(str(cdir)), idx,
                        resume=False, **kw)
    assert not os.path.exists(stale)
    assert stats["N"] == 25
    assert _segment_rows(idx) == _segment_rows(clean)


def test_nonpartition_rebuild_clears_partition_markers(
    ray_session, tmp_path, monkeypatch
):
    """Run A completes with partition_resume=True (spill_done.json +
    segments_done.json on disk). Run B rebuilds with
    partition_resume=False and dies mid-segments — it must have REMOVED
    the partition markers first: run C (partition_resume=True, resume)
    would otherwise trust a bucket journal whose segment dirs run B
    wiped, skip every bucket, and write a manifest-complete index with
    silently EMPTY segments (live-reproduced before the guard)."""
    import ray.data

    from dpr_ray import corpus as corpus_mod
    from dpr_ray.index import io as iomod
    from dpr_ray.index import segments as seg
    from dpr_ray.index.build import build_index

    import pytest

    tbl = corpus_mod.synth_corpus_table(40, seed=11)
    d = str(tmp_path / "idx")
    ref = str(tmp_path / "ref")
    build_index(ray.data.from_arrow(tbl).repartition(2), d,
                docid_strategy="hash64", partition_resume=True)
    assert os.path.exists(os.path.join(d, "spill_done.json"))
    assert os.path.exists(os.path.join(d, "segments_done.json"))
    # simulate run A killed AFTER the segments phase but BEFORE the
    # manifest write: partition markers present, no completeness claim —
    # the state from which run B (resume=True) actually re-runs the
    # segments phase instead of early-returning
    for f in ("manifest.json", "stats.json"):
        os.remove(os.path.join(d, f))

    real = iomod.write_partitioned

    def boom(*a, **k):
        raise RuntimeError("injected mid-segments kill")

    monkeypatch.setattr(iomod, "write_partitioned", boom)
    with pytest.raises(Exception, match="injected"):
        build_index(ray.data.from_arrow(tbl).repartition(2), d,
                    docid_strategy="hash64", partition_resume=False,
                    resume=True)
    assert not os.path.exists(os.path.join(d, "spill_done.json"))
    assert not os.path.exists(os.path.join(d, "segments_done.json"))
    monkeypatch.setattr(iomod, "write_partitioned", real)

    # run C: partition resume rebuilds the spill + every bucket — the
    # result must match a clean build, never an empty segment set
    stats = build_index(ray.data.from_arrow(tbl).repartition(2), d,
                        docid_strategy="hash64", partition_resume=True,
                        resume=True)
    build_index(ray.data.from_arrow(tbl).repartition(2), ref,
                docid_strategy="hash64", partition_resume=True)
    want = seg.read_stats(ref)
    for k in ("N", "postings", "n_terms"):
        if k in want:
            assert stats[k] == want[k], k
    import pyarrow.dataset as pads

    n_rows = pads.dataset(
        os.path.join(d, "segments"), partitioning="hive"
    ).count_rows()
    assert n_rows == pads.dataset(
        os.path.join(ref, "segments"), partitioning="hive"
    ).count_rows()
    assert n_rows > 0
