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

Two modes:

- ``mode="disjoint"`` (default): docids must be disjoint across inputs
  (they are, for disjoint corpora with deterministic ids). Postings and
  docstores concatenate; stats are input-stat sums.
- ``mode="upsert"``: the incremental-refresh cycle. ``index_dirs`` is
  ordered oldest → newest; a docid present in several inputs keeps ONLY
  its newest version (postings of the older content drop for EVERY term),
  and ``delete_ext_ids`` tombstones documents out of the result entirely.
  ``upsert_merge(base, build(delta)) == build(latest_corpus)``
  byte-for-byte for unsalted builds (property-tested) — adds, updates and
  deletes in one pass, replacing a full rebuild of the base.

Scale shape (upsert): the arbitration map covers only docids of the
NON-BASE inputs plus tombstones — delta-sized by definition of an
incremental refresh, NOT corpus-sized. It is built on the driver from the
deltas' narrow docid columns (8 B/doc; capped by $DPR_UPSERT_DRIVER_CAP,
default 50M ≈ 400 MB) and broadcast once via ``ray.put`` (sorted uint64 +
winner-rank arrays, zero-copy plasma reads in every task). The docstore
filter is map-only; the segments pass is the same single groupby(term)
as disjoint mode. The 100-TB shape is therefore: base index any size,
delta bounded by the cap per merge — chain merges for bigger backlogs.

Tiered refresh policy (operational guidance; measured in BASELINE.md):
every upsert merge is a FULL rewrite of the merged index — the merged
avgdl changes every block-max bound, so cost ≈ one warm rebuild of
N_total regardless of delta size (measured: 100k docs merge 10.7-11.0 s
vs 6.0 s warm rebuild; 500k 24.5 s vs 16.9 s; 5M 128.8 s vs ~110-150 s
— the ratio approaches 1 as tokenization dominates the rebuild).
Therefore do NOT merge per small delta. Accumulate:

- deletes serve IMMEDIATELY via query-time tombstones
  (``QueryExecutor(banned_docids=...)``, overhead below host noise at
  10% banned) — no merge needed;
- adds/updates batch into a delta corpus; trigger the merge when the
  backlog reaches ~5-10% of N (amortizes the fixed rewrite over a
  meaningful refresh) or when the tombstone fraction approaches ~10%
  (collection stats stay index-time until the merge, as in Lucene);
- chain merges for multi-delta backlogs (v1+d1→v2, v2+d2→v3 —
  byte-identical to replaying the log, property-tested in
  tests/test_merge_upsert.py and measured as a 2-tier cycle in
  BASELINE.md); the arbitration map stays delta-sized per run, so a
  backlog larger than DPR_UPSERT_DRIVER_CAP splits into chained runs.

Fewer, larger deltas strictly dominate: k merges cost k full rewrites.
The merge's value is never beating a warm rebuild on one node — it is
refreshing WITHOUT the raw corpus text (the base may be unmounted
petabytes; the shuffle moves compressed varint postings, not tokens).

Replaces the reference's index serialize/ingest cycle
(``faiss_indexers.py:41-105``), which cannot merge two HNSW indexes at all
(``faiss_indexers.py:148-151`` one-shot constraint) and has no
delete/update story short of rebuilding.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import ray.data

from .._shipping import ensure_shippable
from ..config import BLOCK_SIZE, BM25Params
from . import manifest as man
from . import segments as seg
from .manifest import write_manifest

UPSERT_DRIVER_CAP = int(os.environ.get("DPR_UPSERT_DRIVER_CAP", 50_000_000))


def _keep_mask(
    docids: np.ndarray, rank: int, sh_ids: np.ndarray, sh_win: np.ndarray
) -> np.ndarray:
    """True where a (docid, source-rank) posting/doc survives the upsert:
    docid not arbitrated at all, or arbitrated with this rank as winner.
    ``sh_ids`` sorted uint64; ``sh_win`` the winning rank (-1 = deleted)."""
    if len(sh_ids) == 0:
        return np.ones(len(docids), bool)
    pos = np.searchsorted(sh_ids, docids)
    pos_c = np.minimum(pos, len(sh_ids) - 1)
    hit = sh_ids[pos_c] == docids
    return ~hit | ((sh_win[pos_c] == rank) & hit)


def _build_shadow(
    index_dirs: list[str],
    stats_list: list[dict],
    delete_ext_ids: list[str] | None,
    delete_docids=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side arbitration map for upsert mode: (sorted docids that
    appear in any non-base input or the tombstone list, winning rank per
    docid). Later inputs win; tombstones (-1) beat everything."""
    import pyarrow.dataset as pads

    from ..stages.featurize import docid_from_ext_id

    n_delta = sum(int(s["N"]) for s in stats_list[1:])
    n_del = len(delete_ext_ids or []) + (
        len(delete_docids) if delete_docids is not None else 0
    )
    if n_delta + n_del > UPSERT_DRIVER_CAP:
        raise ValueError(
            f"upsert arbitration map would hold {n_delta + n_del} docids > "
            f"DPR_UPSERT_DRIVER_CAP={UPSERT_DRIVER_CAP}; chain smaller "
            "delta merges or raise the cap"
        )
    ids_parts: list[np.ndarray] = []
    rank_parts: list[np.ndarray] = []
    for rank, d in enumerate(index_dirs[1:], start=1):
        t = pads.dataset(
            os.path.join(d, "docstore"), partitioning="hive"
        ).to_table(columns=["docid"])
        arr = t["docid"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids_parts.append(arr)
        rank_parts.append(np.full(len(arr), rank, np.int64))
    tomb: list[np.ndarray] = []
    if delete_ext_ids:
        tomb.append(
            np.fromiter(
                (docid_from_ext_id(e) for e in delete_ext_ids),
                dtype=np.uint64,
                count=len(delete_ext_ids),
            )
        )
    if delete_docids is not None and len(delete_docids):
        tomb.append(np.asarray(delete_docids, dtype=np.uint64))
    if tomb:
        darr = np.concatenate(tomb)
        ids_parts.append(darr)
        rank_parts.append(np.full(len(darr), -1, np.int64))
    if not ids_parts:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    ids = np.concatenate(ids_parts)
    rk = np.concatenate(rank_parts)
    # stable sort keeps concatenation order within a docid; the LAST entry
    # per docid is the highest delta rank (or the tombstone, appended last)
    order = np.argsort(ids, kind="stable")
    ids_s, rk_s = ids[order], rk[order]
    last = np.concatenate([ids_s[1:] != ids_s[:-1], [True]])
    return ids_s[last], rk_s[last]


def _merge_signature(
    index_dirs, stats_list, mode, delete_ext_ids, delete_docids,
    params, num_tbuckets, block_size,
) -> str:
    """Content signature of everything the merged docstore depends on —
    keys the docstore-phase resume marker. Besides stats, it fingerprints
    each input docstore's part files (name, size, mtime): an input rebuilt
    in place with coincidentally identical stats but different document
    text must NOT falsely resume a stale merged docstore (false
    invalidation is harmless — the pass just recomputes)."""
    h = hashlib.blake2b(digest_size=16)
    for d, s in zip(index_dirs, stats_list):
        h.update(os.path.abspath(d).encode())
        h.update(json.dumps(s, sort_keys=True).encode())
        doc_dir = os.path.join(d, "docstore")
        if os.path.isdir(doc_dir):
            for name in sorted(os.listdir(doc_dir)):
                p = os.path.join(doc_dir, name)
                if name.endswith(".parquet") and os.path.isfile(p):
                    st = os.stat(p)
                    # mtime at ns granularity: a part rewritten with the
                    # same size within the same SECOND must not falsely
                    # resume a stale merged docstore
                    h.update(f"{name}|{st.st_size}|{st.st_mtime_ns}".encode())
    h.update(f"{mode}|{params.k1}|{params.b}|{num_tbuckets}|{block_size}".encode())
    for e in sorted(delete_ext_ids or []):
        # length-framed: unframed concatenation made ['repo/ab','c'] and
        # ['repo/a','bc'] collide, falsely resuming a stale merged
        # docstore whose tombstone set (and avgdl) differ from the
        # segments phase's (the corpus_fingerprint collision class)
        b = e.encode()
        h.update(len(b).to_bytes(4, "little"))
        h.update(b)
    if delete_docids is not None and len(delete_docids):
        for v in np.sort(np.asarray(delete_docids, dtype=np.uint64)):
            h.update(int(v).to_bytes(8, "little"))
    return h.hexdigest()


def _write_docstore_ranged(ds_sorted, out_dir: str, mode: str) -> dict:
    """Terminal docstore writer: one ``part-<lo>-<hi>.parquet`` per
    docid-sorted block (the layout ``build_index`` produces and
    ``doc_join_copartitioned`` / DocJoin range pruning require), with
    (rows, sum_dl, max_docid, blocks) partials folded into the same pass —
    no re-read execution for the merged stats, and the written-block count
    feeds the part-file collision check."""
    import pyarrow.parquet as pq_

    from .build import (
        check_block_duplicates,
        decode_max_docid_s,
        docstore_part_name,
        encode_max_docid_s,
    )

    # disjoint mode REQUIRES disjoint docids across inputs but nothing
    # upstream enforces it (upsert arbitrates cross-input collisions away
    # before this point, so a duplicate there means an input index itself
    # carries duplicate docids): a violated precondition would silently
    # double-count postings. Blocks are docid-sorted, so collisions are
    # adjacent here or straddle block boundaries (caught by
    # _check_docstore_ranges after the write).
    advice = (
        "in the merged docstore: mode='disjoint' requires disjoint docids "
        "across inputs — use mode='upsert' to arbitrate collisions "
        "newest-wins"
        if mode == "disjoint"
        else "in the merged docstore under mode='upsert': an input index "
        "itself contains duplicate docids (built before duplicate "
        "validation) — rebuild that input from a deduplicated corpus"
    )

    def write_block(batch: pa.Table) -> pa.Table:
        # max_docid travels ORDER-PRESERVING-ENCODED as int64
        # (x - 2^63): Ray's Max aggregate rebuilds values through Python
        # ints with an inferred int64 arrow type, overflowing at
        # x = 2^64-1 (the top of the provided-docid space) — uint64
        # partial columns alone don't survive the reduce
        if batch.num_rows == 0:
            return pa.table(
                {
                    "rows": pa.array([0], pa.int64()),
                    "sum_dl": pa.array([0], pa.int64()),
                    "max_docid_s": pa.array(
                        [encode_max_docid_s(0)], pa.int64()
                    ),
                    "blocks": pa.array([0], pa.int64()),
                }
            )
        docids = batch["docid"].to_numpy(zero_copy_only=False)
        check_block_duplicates(docids, advice)
        name = docstore_part_name(docids)
        pq_.write_table(batch, os.path.join(out_dir, name))
        dl = int(batch["doclen"].to_numpy(zero_copy_only=False).sum())
        return pa.table(
            {
                "rows": pa.array([batch.num_rows], pa.int64()),
                "sum_dl": pa.array([dl], pa.int64()),
                "max_docid_s": pa.array(
                    [encode_max_docid_s(docids.max())], pa.int64()
                ),
                "blocks": pa.array([1], pa.int64()),
            }
        )

    from ray.data.aggregate import Max, Sum

    agg = ds_sorted.map_batches(write_block, batch_format="pyarrow").aggregate(
        Sum("rows"), Sum("sum_dl"), Max("max_docid_s"), Sum("blocks")
    )
    from .build import _check_docstore_ranges

    if agg is None:  # zero-block dataset: aggregate returns None, not zeros
        _check_docstore_ranges(out_dir, expected_parts=0)
        return {"rows": 0, "sum_dl": 0, "max_docid": 0}
    _check_docstore_ranges(
        out_dir, expected_parts=int(agg["sum(blocks)"] or 0)
    )
    return {
        "rows": int(agg["sum(rows)"] or 0),
        "sum_dl": int(agg["sum(sum_dl)"] or 0),
        # the all-sentinel case (only zero-row blocks) decodes to docid 0,
        # matching the zero-block return above
        "max_docid": decode_max_docid_s(agg["max(max_docid_s)"]),
    }


def merge_indexes(
    index_dirs: list[str],
    out_dir: str,
    *,
    params: BM25Params | None = None,
    num_tbuckets: int | None = None,
    block_size: int | None = None,
    max_postings_per_slice: int | None = None,
    mode: str = "disjoint",
    delete_ext_ids: list[str] | None = None,
    delete_docids=None,
    resume: bool = True,
) -> dict:
    """Merge k built indexes into ``out_dir``. ``mode="disjoint"`` requires
    disjoint docids; ``mode="upsert"`` arbitrates collisions newest-wins
    (``index_dirs`` ordered oldest → newest) and drops tombstones
    everywhere (docstore + every term's postings). Tombstones are
    ``delete_ext_ids`` (hash64-docid indexes) and/or ``delete_docids``
    (raw ids, for ``docid_strategy="provided"`` corpora)."""
    if mode not in ("disjoint", "upsert"):
        raise ValueError(f"unknown merge mode {mode!r}")
    if not index_dirs:
        raise ValueError(
            "merge_indexes needs at least one input index (an empty-base "
            "refresh should pass only the delta index — tools/merge_job.py "
            "does this for a missing base)"
        )
    # refuse in-place merges BEFORE any mutation: the docstore/segments
    # phases wipe out_dir's prior contents, so out_dir aliasing an input
    # would destroy the only copy of that index and then fail reading it
    # (the non-destructive-refusal rule). Merge to a fresh dir and swap.
    out_real = os.path.realpath(out_dir)
    for d in index_dirs:
        if os.path.realpath(d) == out_real:
            raise ValueError(
                f"out_dir {out_dir} aliases input index {d} — in-place "
                "merges would destroy the input before reading it; merge "
                "to a new directory and rename"
            )
    has_dels = bool(delete_ext_ids) or (
        delete_docids is not None and len(delete_docids) > 0
    )
    if has_dels and mode != "upsert":
        raise ValueError("delete_ext_ids/delete_docids require mode='upsert'")
    ensure_shippable()
    t0 = time.time()
    stats_list = [seg.read_stats(d) for d in index_dirs]
    s0 = stats_list[0]
    params = params or BM25Params(k1=s0["k1"], b=s0["b"])
    num_tbuckets = num_tbuckets or int(s0["num_tbuckets"])
    block_size = block_size or int(s0.get("block_size", BLOCK_SIZE))
    max_pps = max_postings_per_slice or seg.MAX_POSTINGS_PER_SLICE
    num_dbuckets = int(s0.get("num_dbuckets", 16))
    upsert = mode == "upsert"
    if not upsert:
        # validate BEFORE any out_dir mutation: the refusal must not brick
        # a previously complete out_dir (manifest/stats removal + segments
        # wipe happen below). Fabricating max_docid=0 instead would defeat
        # the executor's loud refuse-when-absent doc_shards guard AND flip
        # it into dense mode with real docids far past the buffer.
        for d, s in zip(index_dirs, stats_list):
            if "max_docid" not in s:
                raise ValueError(
                    f"input index {d} has no max_docid in stats.json — "
                    "rebuild it before merging"
                )

    if upsert:
        sh_ids, sh_win = _build_shadow(
            index_dirs, stats_list, delete_ext_ids, delete_docids
        )
        shadow_ref = ray.put((sh_ids, sh_win))
    else:
        shadow_ref = None

    keep_mask = _keep_mask  # captured as a FUNCTION (ship-by-value safe)

    def _read_union(subdir: str, with_rank: bool = False):
        # read_parquet rejects a LIST of directories in this Ray version;
        # read each index's dir and union (multi-source concat is native)
        parts = []
        for rank, d in enumerate(index_dirs):
            p = ray.data.read_parquet(os.path.join(d, subdir))
            if with_rank:

                def _tag(batch: pa.Table, _r: int = rank) -> pa.Table:
                    return batch.append_column(
                        "src_rank",
                        pa.array(np.full(batch.num_rows, _r, np.int64)),
                    )

                p = p.map_batches(_tag, batch_format="pyarrow")
            parts.append(p)
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        return ds

    out_segments = os.path.join(out_dir, "segments")
    out_docstore = os.path.join(out_dir, "docstore")
    os.makedirs(out_dir, exist_ok=True)
    # invalidate a PRIOR run's completeness claims BEFORE mutating outputs
    # (the build_index discipline): a re-merge killed mid-segments must
    # not leave an out_dir whose stale stats.json/manifest.json still say
    # "complete" over wiped/partial segments — readers would serve wrong
    # stats silently
    for stale in ("manifest.json", "stats.json"):
        p = os.path.join(out_dir, stale)
        if os.path.exists(p):
            os.remove(p)
    shutil.rmtree(out_segments, ignore_errors=True)

    # ---- docstore first: the upsert avgdl comes from SURVIVING docs, and
    # the ranged writer folds (N, sum_dl, max_docid) into the write pass.
    # Phase marker (written only AFTER a complete pass, keyed by an input
    # signature): a merge killed during the SEGMENTS shuffle resumes
    # without repaying the docstore sort+rewrite — a partial docstore has
    # no marker and is recomputed from scratch.
    sig = _merge_signature(
        index_dirs, stats_list, mode, delete_ext_ids, delete_docids,
        params, num_tbuckets, block_size,
    )
    marker = os.path.join(out_dir, "merge_docstore_done.json")
    doc_stats = None
    if resume:
        # unparseable / truncated marker reads as absent (kill mid-write
        # artifact — see manifest.read_json_marker's trust policy)
        done = man.read_json_marker(marker)
        if (
            done is not None
            and done.get("signature") == sig
            and isinstance(done.get("doc_stats"), dict)
            and os.path.isdir(out_docstore)
            and any(f.endswith(".parquet") for f in os.listdir(out_docstore))
        ):
            doc_stats = done["doc_stats"]
    doc_resumed = doc_stats is not None
    if not doc_resumed and os.path.exists(marker):
        os.remove(marker)
    if not doc_resumed:
        shutil.rmtree(out_docstore, ignore_errors=True)
        os.makedirs(out_docstore, exist_ok=True)
    if doc_resumed:
        pass
    elif upsert:
        # filter per input BRANCH (rank is a per-branch constant; a
        # post-union batch could coalesce rows of different branches)
        parts = []
        for rank, d in enumerate(index_dirs):

            def _doc_filter(batch: pa.Table, _r: int = rank) -> pa.Table:
                si, sw = ray.get(shadow_ref)
                ids = batch["docid"].to_numpy(zero_copy_only=False).astype(
                    np.uint64
                )
                return batch.filter(pa.array(keep_mask(ids, _r, si, sw)))

            parts.append(
                ray.data.read_parquet(os.path.join(d, "docstore")).map_batches(
                    _doc_filter, batch_format="pyarrow"
                )
            )
        doc_ds = parts[0]
        for p in parts[1:]:
            doc_ds = doc_ds.union(p)
        doc_ds = doc_ds.sort("docid")
    else:
        doc_ds = _read_union("docstore").sort("docid")
    if not doc_resumed:
        doc_stats = _write_docstore_ranged(doc_ds, out_docstore, mode)
        if doc_stats["rows"] == 0:
            # fully-deleted corpus: keep an empty docstore file so
            # downstream readers see the schema (mirrors build_index's
            # empty-corpus path)
            import pyarrow.dataset as pads
            import pyarrow.parquet as pq_

            schema = pads.dataset(
                os.path.join(index_dirs[0], "docstore"), partitioning="hive"
            ).schema
            pq_.write_table(
                schema.empty_table(),
                os.path.join(out_docstore, "empty.parquet"),
            )
        man.write_json_atomic(marker, {"signature": sig, "doc_stats": doc_stats})
    t_docstore = time.time()

    if upsert:
        n_docs = doc_stats["rows"]
        sum_dl = doc_stats["sum_dl"]
        max_docid = doc_stats["max_docid"]
    else:
        # input-stat sums: identical ints (and avgdl float) to a from-
        # scratch union build — the byte-for-byte property depends on it
        n_docs = sum(int(s["N"]) for s in stats_list)
        sum_dl = sum(int(s["sum_dl"]) for s in stats_list)
        # max_docid presence was validated BEFORE any out_dir mutation
        max_docid = max(int(s["max_docid"]) for s in stats_list)
    avgdl = (sum_dl / n_docs) if n_docs else 0.0

    # ---- segments: ONE groupby(tbucket) over encoded sub-lists, re-encoded
    # with the merged avgdl (block-max bounds depend on it). BUCKET
    # granularity, not per-term: map_groups costs ~1ms of Python per group,
    # which at code-scale vocabularies (100k+ terms) dominates the stage —
    # same lesson as build_index's merge_bucket (build.py:376). Inside a
    # bucket every sub-list decodes in ONE vectorized varint pass; upsert
    # filtering is a single searchsorted over the concatenated values.
    encode_posting_list = seg.encode_posting_list
    encode_single_block_lists = seg.encode_single_block_lists
    rows_to_table = seg.rows_to_table
    concat_delta_decode = seg.concat_delta_decode
    concat_varint_decode = seg.concat_varint_decode

    def remerge_bucket(group: pa.Table) -> pa.Table:
        # LOCKSTEP WARNING: this re-implements build.py merge_bucket's
        # decode → lexsort → re-encode core (see the note there); the
        # byte-identity property tests gate the pair.
        terms_col = group["term"].to_pylist()
        uniq_terms = sorted(set(terms_col))
        t_to_i = {t: i for i, t in enumerate(uniq_terms)}
        ranks_col = (
            group["src_rank"].to_numpy(zero_copy_only=False) if upsert else None
        )
        d_blobs: list[bytes] = []
        tf_blobs: list[bytes] = []
        dl_blobs: list[bytes] = []
        row_tidx: list[int] = []
        row_rank: list[int] = []
        for i in range(group.num_rows):
            for b_d, b_t, b_l in zip(
                group["block_docids"][i].as_py(),
                group["block_tfs"][i].as_py(),
                group["block_dls"][i].as_py(),
            ):
                d_blobs.append(b_d)
                tf_blobs.append(b_t)
                dl_blobs.append(b_l)
                row_tidx.append(t_to_i[terms_col[i]])
                if upsert:
                    row_rank.append(int(ranks_col[i]))
        if not d_blobs:
            return rows_to_table([])
        docids, vals_per_blob = concat_delta_decode(d_blobs)
        tfs, _ = concat_varint_decode(tf_blobs)
        dls, _ = concat_varint_decode(dl_blobs)
        tidx = np.repeat(np.asarray(row_tidx, dtype=np.int64), vals_per_blob)
        if upsert:
            si, sw = ray.get(shadow_ref)
            rk = np.repeat(np.asarray(row_rank, dtype=np.int64), vals_per_blob)
            m = keep_mask(docids, rk, si, sw)
            docids, tfs, dls, tidx = docids[m], tfs[m], dls[m], tidx[m]
            if len(docids) == 0:
                return rows_to_table([])
        order = np.lexsort((docids, tidx))
        docids, tfs, dls, tidx = (
            docids[order], tfs[order], dls[order], tidx[order],
        )
        bounds = np.flatnonzero(np.diff(tidx)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(tidx)]])
        small_terms: list[str] = []
        s_off = [0]
        s_idx: list[np.ndarray] = []
        out_rows: list[dict] = []
        for s, e in zip(starts, ends):
            term = uniq_terms[tidx[s]]
            n = e - s
            if n <= block_size:
                small_terms.append(term)
                s_idx.append(np.arange(s, e))
                s_off.append(s_off[-1] + n)
            else:
                out_rows.extend(
                    encode_posting_list(
                        term, docids[s:e], tfs[s:e], dls[s:e],
                        avgdl, params, num_tbuckets, block_size, max_pps,
                    )
                )
        parts = []
        if small_terms:
            sel = np.concatenate(s_idx)
            small_tbl, _ = encode_single_block_lists(
                small_terms, np.asarray(s_off, dtype=np.int64),
                docids[sel], tfs[sel], dls[sel],
                avgdl, params, num_tbuckets,
            )
            parts.append(small_tbl)
        if out_rows:
            parts.append(rows_to_table(out_rows))
        if not parts:
            return rows_to_table([])
        return pa.concat_tables(parts)

    from .io import write_partitioned

    # The groupby key is the inputs' precomputed tbucket column
    # (crc32(term) % num_tbuckets). If any input was built with a DIFFERENT
    # num_tbuckets than this merge's, one term would land in two groups —
    # duplicate slice sets with colliding slice_ids whose concatenated
    # block ranges are non-monotonic, silently breaking BMW's
    # searchsorted-over-block_last exactness. Recompute a uniform tbucket
    # from term in that case (cheap: one crc32 per SLICE row, not posting).
    seg_ds = _read_union("segments", with_rank=upsert)
    if any(int(s.get("num_tbuckets", num_tbuckets)) != num_tbuckets
           for s in stats_list):
        import zlib as _zlib

        def _rebucket(batch: pa.Table, _n: int = num_tbuckets) -> pa.Table:
            crc = _zlib.crc32
            tb = pa.array(
                [crc(t.encode()) % _n for t in batch["term"].to_pylist()],
                pa.int32(),
            )
            return batch.set_column(
                batch.schema.get_field_index("tbucket"), "tbucket", tb
            )

        seg_ds = seg_ds.map_batches(_rebucket, batch_format="pyarrow")

    # sum_cols folds (slice count, Σdf) into the write pass — a separate
    # read_parquet+aggregate costs seconds of fixed dispatch per merge
    # (CLAUDE.md: fold side computations into the pass touching the data)
    wres = write_partitioned(
        seg_ds.groupby("tbucket")
        .map_groups(remerge_bucket, batch_format="pyarrow"),
        out_segments, "tbucket", sum_cols=["df"],
    )
    # fully-tombstoned merge: no segment rows survive, but readers still
    # need one canonical-schema file (mirrors build_index's empty-corpus
    # guard; the docstore side already writes empty.parquet above)
    seg.ensure_nonempty_segments(out_segments)
    stats = {
        "N": n_docs,
        "sum_dl": sum_dl,
        "avgdl": avgdl,
        "max_docid": max_docid,
        "postings": int(wres["sum_df"]),
        "segment_slices": int(wres["rows"]),
        "k1": params.k1,
        "b": params.b,
        "num_tbuckets": num_tbuckets,
        "num_dbuckets": num_dbuckets,
        "block_size": block_size,
        "head_terms_salted": 0,
        "merged_from": [os.path.abspath(d) for d in index_dirs],
        "merge_mode": mode,
        "tombstones": len(delete_ext_ids or [])
        + (len(delete_docids) if delete_docids is not None else 0),
    }
    seg.write_stats(out_dir, stats)
    write_manifest(
        out_dir,
        stats=stats,
        timings={
            "total_sec": time.time() - t0,
            "docstore_sec": t_docstore - t0,
            "segments_sec": time.time() - t_docstore,
            "docstore_resumed": doc_resumed,
        },
        salt_map={},
        # sentinel fp/sig: a manifest with BOTH as None skips build_index's
        # resume guards (old-marker leniency), so build_index(resume=True)
        # pointed at a merge output would silently return the merged stats
        # for an unrelated corpus/params. Any real corpus fingerprint or
        # build signature mismatches these and refuses loudly.
        corpus_fp=f"merged:{sig}",
        resume_sig=f"merged:{sig}",
    )
    return stats
