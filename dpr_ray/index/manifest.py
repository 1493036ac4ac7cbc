"""Build manifests: per-partition lineage + metrics (north-rule requirement).

The reference's only resume units are whole output files (re-run a missing
shard id — ``generate_dense_embeddings.py:145-149``) and training
checkpoints (``dpr/utils/model_utils.py:21-31``). Here every build writes a
``manifest.json`` recording global stats, per-stage wall times, the skew
plan (salted head terms), and a per-partition table (file, rows, bytes) for
both docstore and segments. ``is_complete()`` gates resume: a rerun that
finds a complete manifest skips the build (segments are byte-deterministic,
so skip == rebuild) — and ``build_index`` refuses the skip when the
manifest's recorded ``corpus_fp`` (input-file fingerprint, see
``build.corpus_fingerprint``) doesn't match the corpus it was handed.
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq


def _partition_table(root: str) -> list[dict]:
    out = []
    for dirpath, _dirs, files in sorted(os.walk(root)):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            p = os.path.join(dirpath, f)
            try:
                rows = pq.ParquetFile(p).metadata.num_rows
            except Exception:
                rows = -1
            out.append(
                {
                    "file": os.path.relpath(p, root),
                    "rows": rows,
                    "bytes": os.path.getsize(p),
                }
            )
    return out


def write_json_atomic(path: str, obj: dict, **dump_kwargs) -> None:
    """Write-then-rename so a kill mid-dump never leaves a truncated JSON
    file at ``path`` — resume markers are trusted by filename, so a
    half-written marker must not be observable."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, **dump_kwargs)
    os.replace(tmp, path)


def read_json_marker(path: str) -> dict | None:
    """Marker trust policy (shared by every resume marker): a marker that
    is missing, unparseable (a pre-atomic-write kill artifact), or not a
    JSON object is treated as ABSENT — the caller rebuilds, which is
    always safe because every build/merge stage is deterministic.
    Affirmative signature/fingerprint MISMATCHES stay the caller's job
    and still refuse loudly (user error, not a kill artifact)."""
    try:
        with open(path) as f:
            obj = json.load(f)
    except (OSError, json.JSONDecodeError, UnicodeDecodeError):
        return None
    return obj if isinstance(obj, dict) else None


def write_manifest(
    index_dir: str, *, stats: dict, timings: dict, salt_map: dict,
    corpus_fp: str | None = None, resume_sig: str | None = None,
) -> dict:
    manifest = {
        "complete": True,
        "corpus_fp": corpus_fp,
        "resume_sig": resume_sig,
        "stats": stats,
        "timings": timings,
        "skew_plan": {"salted_terms": len(salt_map), "salt_map": dict(sorted(salt_map.items())[:1000])},
        "partitions": {
            "docstore": _partition_table(os.path.join(index_dir, "docstore")),
            "segments": _partition_table(os.path.join(index_dir, "segments")),
        },
    }
    write_json_atomic(
        os.path.join(index_dir, "manifest.json"), manifest,
        indent=1, sort_keys=True,
    )
    return manifest


def read_manifest(index_dir: str) -> dict | None:
    # truncated manifest (kill mid-write, pre-atomic-write artifact) reads
    # as absent: is_complete() then returns False and the build reruns
    return read_json_marker(os.path.join(index_dir, "manifest.json"))


def is_complete(index_dir: str) -> bool:
    m = read_manifest(index_dir)
    return bool(m and m.get("complete"))
