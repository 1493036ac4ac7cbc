"""`ray job submit`-able incremental index refresh driver.

On a real cluster:
    ray job submit --working-dir . -- python tools/merge_job.py \
        --base-index /data/idx_v1 --delta-corpus s3://bucket/delta/*.parquet \
        --deletes-file gone.txt --out-index /data/idx_v2

Phases (each independently resumable; re-submit with the same args):
  1. delta build — ``build_index`` over ``--delta-corpus`` into
     ``<out>/.delta_index`` (skipped when ``--delta-index`` points at a
     pre-built one); resumes via build_index's own stage markers.
  2. upsert merge — ``merge_indexes(mode="upsert")``: newest-wins docid
     arbitration + tombstones, byte-identical to rebuilding the latest
     corpus (tests/test_merge_upsert.py). A completed merge writes
     ``merge_done.json`` recording the input signature; a re-submit with
     the same inputs skips it, a changed signature re-merges.

The base index is never modified; chain runs for multi-delta backlogs
(v1+d1→v2, v2+d2→v3 — the arbitration map stays delta-sized per run).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _signature(index_dirs, mode, dels, deletes_are_docids) -> str:
    h = hashlib.blake2b(digest_size=16)
    for d in index_dirs:
        h.update(os.path.abspath(d).encode())
        stats_p = os.path.join(d, "stats.json")
        with open(stats_p, "rb") as f:
            h.update(f.read())
    h.update(mode.encode())
    # the SAME deletes file means different tombstones under the flag
    # (ext_id hashing vs raw docids) — it must invalidate the marker
    h.update(b"docids" if deletes_are_docids else b"ext_ids")
    for x in sorted(str(v) for v in dels):
        # length-framed: unframed concatenation lets ['a','bc'] and
        # ['ab','c'] collide and falsely skip a semantically different
        # merge (same class as dpr_ray.index.merge._merge_signature)
        b = x.encode()
        h.update(len(b).to_bytes(4, "little"))
        h.update(b)
    return h.hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-index", required=True)
    ap.add_argument("--out-index", required=True)
    ap.add_argument("--delta-corpus",
                    help="parquet of (repo,path,commit,lang,content) updates/adds")
    ap.add_argument("--delta-index",
                    help="pre-built delta index (skips phase 1)")
    ap.add_argument("--deletes-file",
                    help="one tombstone per line: ext_id, or docid with "
                         "--deletes-are-docids")
    ap.add_argument("--deletes-are-docids", action="store_true")
    ap.add_argument("--mode", default="upsert",
                    choices=["upsert", "disjoint"])
    ap.add_argument("--docid-strategy", default="hash64",
                    choices=["hash64", "provided"])
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    if args.delta_corpus and args.delta_index:
        ap.error("--delta-corpus and --delta-index are mutually exclusive")

    import ray

    ray.init(
        address=os.environ.get("RAY_ADDRESS", "local"),
        num_cpus=args.num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data

    from dpr_ray._shipping import ensure_shippable
    from dpr_ray.index.build import build_index
    from dpr_ray.index.manifest import read_json_marker, write_json_atomic
    from dpr_ray.index.merge import merge_indexes

    ensure_shippable()  # standalone-tool rule: register BEFORE any UDF

    out: dict = {}
    dels: list[str] = []
    if args.deletes_file:
        with open(args.deletes_file) as f:
            dels = [ln.strip() for ln in f if ln.strip()]

    # ---- phase 1: delta build
    delta_dir = args.delta_index
    if args.delta_corpus:
        # loud up-front schema check (the build_job/curate_job rule): a
        # wrong-shape delta otherwise dies as a KeyError deep in a UDF
        import pyarrow.dataset as pads

        in_schema = pads.dataset(args.delta_corpus).schema
        required = ["repo", "path", "commit", "lang", "content"]
        schema_missing = [c for c in required if c not in in_schema.names]
        if schema_missing:
            raise SystemExit(
                f"--delta-corpus {args.delta_corpus} is missing column(s) "
                f"{schema_missing}; found {in_schema.names}. Expected an "
                "input_hint corpus (repo, path, commit, lang, content)."
            )
        delta_dir = os.path.join(args.out_index, ".delta_index")
        t0 = time.time()
        stats_d = build_index(
            ray.data.read_parquet(args.delta_corpus),
            delta_dir,
            docid_strategy=args.docid_strategy,
            resume=not args.no_resume,
        )
        out["delta_build_sec"] = round(time.time() - t0, 2)
        out["delta_docs"] = stats_d["N"]

    # bootstrap (first refresh cycle): a base that does not exist yet is
    # skipped, so the merge runs over the delta alone — this is the
    # "missing base" path dpr_ray.index.merge's zero-input error message
    # promises. Signature changes once the base appears, so a later run
    # with the same out-index re-merges instead of falsely resuming.
    base_exists = os.path.exists(os.path.join(args.base_index, "stats.json"))
    if not base_exists:
        if not delta_dir:
            raise SystemExit(
                f"--base-index {args.base_index} has no index (no "
                "stats.json) and no delta was given — nothing to merge"
            )
        out["base"] = "missing (bootstrap: merging delta alone)"
    index_dirs = ([args.base_index] if base_exists else []) + (
        [delta_dir] if delta_dir else []
    )
    sig = _signature(index_dirs, args.mode, dels, args.deletes_are_docids)
    marker = os.path.join(args.out_index, "merge_done.json")
    if not args.no_resume and os.path.exists(marker):
        # truncated/unparseable marker = kill artifact → re-merge (the
        # trust policy of dpr_ray.index.manifest.read_json_marker)
        done = read_json_marker(marker)
        if (
            done is not None
            and done.get("signature") == sig
            and isinstance(done.get("stats"), dict)
        ):
            out["merge"] = "resumed (marker present, same inputs)"
            out["stats"] = done["stats"]
            print(json.dumps(out))
            ray.shutdown()
            return
    if os.path.exists(marker):
        os.remove(marker)

    # ---- phase 2: merge (idempotent: outputs are wiped and rewritten)
    t0 = time.time()
    kw = {}
    if dels:
        if args.deletes_are_docids:
            kw["delete_docids"] = [int(x) for x in dels]
        else:
            kw["delete_ext_ids"] = dels
    stats = merge_indexes(
        index_dirs, args.out_index, mode=args.mode,
        resume=not args.no_resume, **kw,
    )
    out["merge_sec"] = round(time.time() - t0, 2)
    out["stats"] = stats
    write_json_atomic(marker, {"signature": sig, "stats": stats})
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
