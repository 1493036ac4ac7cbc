"""Segment merge (SURVEY §7 M3): k indexes → one canonical index.

``merge_indexes([A, B, ...], out)`` re-merges posting lists across source
indexes with a groupby(term) over the ENCODED sub-lists (compact — the
shuffle moves compressed postings, not raw tokens), decodes, re-sorts by
docid and re-blocks with the MERGED corpus stats (block-max bounds depend
on the merged avgdl). The remerge encodes each term with contiguous
slice_ids, so for UNSALTED builds ``merge(build(A), build(B)) ==
build(A ∪ B)`` byte-for-byte (property-tested). When head terms were
salted, build emits per-salt slice_id offsets (salt*64) while the remerge
re-derives contiguous ids — the equality then holds LOGICALLY (same
decoded posting sets, same scores; ``test_merge_of_salted_indexes``), not
byte-for-byte.

Replaces the reference's index serialize/ingest cycle
(``faiss_indexers.py:41-105``), which cannot merge two HNSW indexes at all
(``faiss_indexers.py:148-151`` one-shot constraint).
"""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import ray.data

from .._shipping import ensure_shippable
from ..config import BLOCK_SIZE, BM25Params, DEFAULT_TERM_BUCKETS
from . import segments as seg
from .manifest import write_manifest


def merge_indexes(
    index_dirs: list[str],
    out_dir: str,
    *,
    params: BM25Params | None = None,
    num_tbuckets: int | None = None,
    block_size: int | None = None,
    max_postings_per_slice: int | None = None,
) -> dict:
    """Merge k built indexes into ``out_dir``. Docids must be disjoint
    across inputs (they are, for disjoint corpora with deterministic ids)."""
    ensure_shippable()
    t0 = time.time()
    stats_list = [seg.read_stats(d) for d in index_dirs]
    s0 = stats_list[0]
    params = params or BM25Params(k1=s0["k1"], b=s0["b"])
    num_tbuckets = num_tbuckets or int(s0["num_tbuckets"])
    block_size = block_size or int(s0.get("block_size", BLOCK_SIZE))
    max_pps = max_postings_per_slice or seg.MAX_POSTINGS_PER_SLICE
    n_docs = sum(int(s["N"]) for s in stats_list)
    sum_dl = sum(int(s["sum_dl"]) for s in stats_list)
    avgdl = (sum_dl / n_docs) if n_docs else 0.0
    num_dbuckets = int(s0.get("num_dbuckets", 16))

    def _read_union(subdir: str):
        # read_parquet rejects a LIST of directories in this Ray version;
        # read each index's dir and union (multi-source concat is native)
        parts = [
            ray.data.read_parquet(os.path.join(d, subdir)) for d in index_dirs
        ]
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        return ds

    segs = _read_union("segments")

    def remerge(group: pa.Table) -> pa.Table:
        term = group["term"][0].as_py()
        docids, tfs, dls = seg.decode_rows(group.to_pylist())
        rows = seg.encode_posting_list(
            term, docids, tfs, dls, avgdl, params,
            num_tbuckets, block_size, max_pps,
        )
        return seg.rows_to_table(rows)

    out_segments = os.path.join(out_dir, "segments")
    out_docstore = os.path.join(out_dir, "docstore")
    shutil.rmtree(out_segments, ignore_errors=True)
    shutil.rmtree(out_docstore, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    from .io import write_partitioned

    write_partitioned(
        segs.groupby("term").map_groups(remerge, batch_format="pyarrow"),
        out_segments, "tbucket",
    )
    # docstore union, re-sorted by docid (docid-range file layout preserved)
    _read_union("docstore").sort("docid").write_parquet(out_docstore)

    from ray.data.aggregate import Count, Sum

    seg_agg = ray.data.read_parquet(out_segments, columns=["df"]).aggregate(
        Count(), Sum("df")
    )
    stats = {
        "N": n_docs,
        "sum_dl": sum_dl,
        "avgdl": avgdl,
        "max_docid": max(int(s.get("max_docid", 0)) for s in stats_list),
        "postings": int(seg_agg["sum(df)"] or 0),
        "segment_slices": int(seg_agg["count()"]),
        "k1": params.k1,
        "b": params.b,
        "num_tbuckets": num_tbuckets,
        "num_dbuckets": num_dbuckets,
        "block_size": block_size,
        "head_terms_salted": 0,
        "merged_from": [os.path.abspath(d) for d in index_dirs],
    }
    seg.write_stats(out_dir, stats)
    write_manifest(
        out_dir,
        stats=stats,
        timings={"total_sec": time.time() - t0},
        salt_map={},
    )
    return stats
