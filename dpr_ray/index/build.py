"""Index build pipeline (SURVEY §7 M0–M3): corpus → docstore + segments.

Ray-Data restatement of the reference's index-build front half
(``generate_dense_embeddings.py:41-149`` + ``faiss_indexers.py:86-105``),
with postings instead of dense vectors:

  read corpus → map_batches(Featurize) → write docstore (docid-partitioned)
  → aggregate global stats (N, avgdl, max docid — the A5-analog aggregates)
  → deterministic 1/sample_mod corpus sample → head-term df estimate
  → map_batches(EmitEncodedPostings)  — map-side combine: per-batch
       per-(term, salt) delta+varint-encoded sub-lists; head terms salted by
       docid RANGE (salt = docid >> shift) so groups stay ≤ group_budget
       postings (skew: SURVEY §4)
  → groupby(term, salt).map_groups(merge)  — the ONLY shuffle, and it moves
       compressed sub-lists (one row per term per batch), not raw postings;
       merge decodes, re-sorts by docid, re-blocks → slice_id = salt (ranges
       are ordered, so slices concatenate docid-sorted). Same skew plan +
       same corpus ⇒ byte-identical segments at any parallelism (resume
       determinism; the plan itself is a deterministic function of the
       corpus sample).
  → write_parquet(segments/, partition_cols=["tbucket"])

The driver never materializes the corpus (the reference holds all passages
in driver RAM — ``dense_retriever.py:461-469`` — the one scalability sin this
design removes).
"""

from __future__ import annotations

import json
import math
import os
import time
from collections import Counter

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from .. import analyzer
from ..config import (
    BLOCK_SIZE,
    BM25Params,
    DEFAULT_GROUP_BUDGET,
    DEFAULT_TERM_BUCKETS,
)
from ..stages.featurize import Featurize
from . import manifest as man
from . import segments as seg
from .manifest import write_manifest


class EmitEncodedPostings:
    """Docstore batch → PRE-ENCODED per-(term, salt) posting sub-lists.

    Map-side combine: tokenize + tf-count each doc, gather the batch's
    postings per term, delta+varint-encode them BEFORE the shuffle — the
    groupby then moves compressed sub-lists (a few bytes per posting, one
    row per term per batch) instead of raw (term, docid, tf, dl) rows.
    Measured ~4x on the bench corpus vs shuffling raw postings.

    Skew plan: head terms (broadcast {term: shift} via ray.put, fetched once
    per actor) are salted by docid RANGE — salt = docid >> shift — so each
    (term, salt) group holds ≤ ~group_budget postings and, because ranges
    are ordered, the per-salt merged lists concatenate docid-sorted: the
    final segment stores them as slice_id = salt."""

    def __init__(self, shift_ref, avgdl, params, num_tbuckets, block_size):
        self.shift_map = ray.get(shift_ref) if shift_ref is not None else {}
        self.avgdl = avgdl
        self.params = params
        self.num_tbuckets = num_tbuckets
        self.block_size = block_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        docids = batch["docid"].to_numpy(zero_copy_only=False)
        dls = batch["doclen"].to_numpy(zero_copy_only=False)
        texts = batch["content"].to_pylist()
        token_lists = analyzer.tokenize_batch(texts)
        per_term: dict[str, tuple[list, list, list]] = {}
        for i, toks in enumerate(token_lists):
            d = int(docids[i])
            l = int(dls[i])
            for t, c in Counter(toks).items():
                e = per_term.get(t)
                if e is None:
                    e = per_term[t] = ([], [], [])
                e[0].append(d)
                e[1].append(c)
                e[2].append(l)
        rows: list[dict] = []
        salts: list[int] = []
        for t, (d_l, tf_l, dl_l) in per_term.items():
            d = np.array(d_l, dtype=np.uint64)
            tf = np.array(tf_l, dtype=np.uint64)
            dl = np.array(dl_l, dtype=np.uint64)
            shift = self.shift_map.get(t)
            if shift is None:
                groups = [(0, slice(None))]
            else:
                sv = (d >> np.uint64(shift)).astype(np.int64)
                groups = [(int(s), sv == s) for s in np.unique(sv)]
            for salt, mask in groups:
                # intermediate sub-lists are ONE block each: small WAND-sized
                # blocks here mean ~100k tiny numpy encode/decode calls per
                # 10M postings (measured 40+ CPU-s of pure overhead); the
                # final merge re-blocks at the queryable block_size
                new = seg.encode_posting_list(
                    t, d[mask], tf[mask], dl[mask],
                    self.avgdl, self.params, self.num_tbuckets,
                    block_size=1 << 30, max_postings_per_slice=1 << 62,
                )
                rows.extend(new)
                salts.extend([salt] * len(new))
        tbl = seg.rows_to_table(rows)
        return tbl.append_column("salt", pa.array(salts, pa.int64()))


class SampleDf:
    """Head-term df partials: emit per-batch (term, df) counts. The caller
    selects the sample rows (a docid-range predicate pushed into the
    docstore read — deterministic and block-independent), so mod=1 here
    keeps every row it is given; mod>1 filters docid % mod == 0 when a
    range predicate isn't available."""

    def __init__(self, sample_mod: int):
        self.sample_mod = sample_mod

    def __call__(self, batch: pa.Table) -> pa.Table:
        docids = batch["docid"].to_numpy(zero_copy_only=False)
        keep = docids % self.sample_mod == 0
        texts = [t for t, k in zip(batch["content"].to_pylist(), keep) if k]
        df: Counter = Counter()
        for toks in analyzer.tokenize_batch(texts):
            df.update(set(toks))
        if not df:
            return pa.table({"term": pa.array([], pa.string()),
                             "df_part": pa.array([], pa.int64())})
        return pa.table(
            {
                "term": pa.array(list(df.keys()), pa.string()),
                "df_part": pa.array(list(df.values()), pa.int64()),
            }
        )


def build_index(
    corpus_ds: ray.data.Dataset,
    index_dir: str,
    *,
    params: BM25Params = BM25Params(),
    num_tbuckets: int = DEFAULT_TERM_BUCKETS,
    num_dbuckets: int = 16,
    group_budget: int = DEFAULT_GROUP_BUDGET,
    sample_mod: int = 64,
    docid_strategy: str = "provided",
    block_size: int = BLOCK_SIZE,
    max_postings_per_slice: int = seg.MAX_POSTINGS_PER_SLICE,
    emit_concurrency: int | tuple | None = None,
    resume: bool = False,
    partition_resume: bool = False,
    dedup_ids: bool = False,
) -> dict:
    """Build a BM25 index under ``index_dir``. Returns the stats dict.

    Resume (``resume=True``): a complete manifest skips the whole build
    (segments are byte-deterministic, so skip == rebuild); a surviving
    docstore stage marker skips featurize+write and rebuilds only the
    segments. Partially-written stage outputs are wiped before rewrite, so
    a killed run restarted with resume=True converges to the clean-run
    bytes (property-tested)."""
    import shutil

    from .._shipping import ensure_shippable

    ensure_shippable()
    t0 = time.time()
    docstore_dir = os.path.join(index_dir, "docstore")
    segments_dir = os.path.join(index_dir, "segments")
    docstore_marker = os.path.join(index_dir, "docstore_done.json")
    if resume and man.is_complete(index_dir):
        return seg.read_stats(index_dir)
    os.makedirs(index_dir, exist_ok=True)

    # ---- stage 1: featurize → docstore ------------------------------------
    if resume and os.path.exists(docstore_marker):
        pass  # docstore stage completed in a prior run
    else:
        shutil.rmtree(docstore_dir, ignore_errors=True)
        feat = corpus_ds.map_batches(
            Featurize(docid_strategy=docid_strategy, num_dbuckets=num_dbuckets),
            batch_format="pyarrow",
        )
        # docid-SORTED plain parquet: files cover docid ranges, so point
        # lookups (DocJoin) prune via row-group stats, and downstream stages
        # read a few large blocks instead of thousands of hive fragments
        # (hive partition_cols write is also pathologically slow in this
        # Ray version — measured 49s vs 3.5s for 500k rows)
        if dedup_ids:
            # (repo, path) dedup (D1 analog): the same ext_id appearing
            # multiple times (e.g. several commits of one file) keeps ONE
            # deterministic row — the lexicographically greatest
            # (commit, sha256). groupby is sort-based, so the output is
            # docid-sorted like the plain path. Costlier (per-group calls):
            # off by default; enable when the corpus may carry duplicates.
            import pandas as pd_

            def first_wins(g: "pd_.DataFrame") -> "pd_.DataFrame":
                return g.sort_values(
                    ["commit", "sha256"], ascending=False
                ).head(1)

            feat.groupby("docid").map_groups(
                first_wins, batch_format="pandas"
            ).write_parquet(docstore_dir)
        else:
            feat.sort("docid").write_parquet(docstore_dir)
        if not os.path.isdir(docstore_dir):
            # empty corpus: write_parquet emitted nothing; create an empty
            # docstore file so downstream reads see a valid (0-row) table
            import pyarrow.parquet as pq_

            os.makedirs(docstore_dir, exist_ok=True)
            empty = Featurize(docid_strategy=docid_strategy,
                              num_dbuckets=num_dbuckets)(
                pa.table({
                    "repo": pa.array([], pa.string()),
                    "path": pa.array([], pa.string()),
                    "commit": pa.array([], pa.string()),
                    "lang": pa.array([], pa.string()),
                    "content": pa.array([], pa.large_string()),
                })
            )
            pq_.write_table(empty, os.path.join(docstore_dir, "empty.parquet"))
        with open(docstore_marker, "w") as f:
            json.dump({"complete": True}, f)
    t_docstore = time.time()

    # ---- stage 2: global stats (N, avgdl, docid space) --------------------
    from ray.data.aggregate import Max

    agg = ray.data.read_parquet(
        docstore_dir, columns=["docid", "doclen"]
    ).aggregate(Count(), Sum("doclen"), Max("docid"))
    n_docs = int(agg["count()"])
    sum_dl = int(agg["sum(doclen)"] or 0)
    avgdl = (sum_dl / n_docs) if n_docs else 0.0
    max_docid = int(agg["max(docid)"] or 0)
    space_bits = max(1, max_docid.bit_length())
    t_stats = time.time()

    # ---- stage 3: head-term discovery (skew plan) -------------------------
    # head terms get docid-RANGE salts: salt = docid >> shift, with
    # 2^(space_bits-shift) ≈ df_est/group_budget ranges (pow2-rounded)
    # (skipped when resuming from an existing spill: the plan is frozen
    # inside the spilled sub-lists)
    _spill_exists = (
        resume and partition_resume
        and os.path.exists(os.path.join(index_dir, "spill_done.json"))
    )
    salt_map: dict[str, int] = {}  # term -> shift
    if n_docs and sample_mod >= 1 and not _spill_exists:
        # sample = the first 1/mod of the docid space: a RANGE predicate, so
        # the sorted docstore prunes row groups instead of decoding all
        # content to discard (mod-1)/mod of it. Deterministic and
        # block-independent; the estimate only drives the skew plan.
        import pyarrow.compute as pc_

        cutoff = max_docid // sample_mod + 1
        flt = pc_.field("docid") < cutoff if sample_mod > 1 else None
        df_sample = (
            ray.data.read_parquet(
                docstore_dir, columns=["docid", "content"], filter=flt,
            )
            .map_batches(SampleDf(1), batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("df_part", alias_name="df_est"))
        )
        # head terms are at most sample_tokens/ (budget/mod) rows — tiny
        head = df_sample.filter(expr=f"df_est > {group_budget / sample_mod}").take_all()
        for r in head:
            n_salts = max(1, math.ceil(r["df_est"] * sample_mod / group_budget))
            bits = max(1, (n_salts - 1).bit_length())
            salt_map[r["term"]] = max(0, space_bits - bits)
    salt_ref = ray.put(salt_map)  # broadcast once; actors ray.get in __init__
    t_sample = time.time()

    # ---- stage 4: pre-encoded postings → groupby(term, salt) → segments ---
    def merge_sublists(group: pa.Table) -> pa.Table:
        term = group["term"][0].as_py()
        salt = int(group["salt"][0].as_py())
        docids, tfs, dls = seg.decode_rows(group.to_pylist())
        rows = seg.encode_posting_list(
            term, docids, tfs, dls,
            avgdl, params, num_tbuckets, block_size, max_postings_per_slice,
            slice_id_offset=salt * 64,  # ≤64 sub-slices per docid-range salt
        )
        assert len(rows) <= 64, f"slice overflow for term {term!r} salt {salt}"
        return seg.rows_to_table(rows)

    posts = ray.data.read_parquet(
        docstore_dir, columns=["docid", "content", "doclen"]
    )
    # Emit runs as plain TASKS, not an actor pool: it has no per-call state
    # worth amortizing (the salt map rides in the pickled instance; actors
    # would pay ~1s spawn each and ramp-up idle time — measured slower).
    # Explicit batch_size: emit cost is per-BATCH (one sub-list row per term
    # per batch) — tiny blocks otherwise blow up dispatch + shuffle rows.
    if emit_concurrency is not None:
        posts = posts.map_batches(
            EmitEncodedPostings,
            fn_constructor_args=(salt_ref, avgdl, params, num_tbuckets, block_size),
            batch_format="pyarrow", concurrency=emit_concurrency,
            batch_size=8192,
        )
    else:
        emit = EmitEncodedPostings(None, avgdl, params, num_tbuckets, block_size)
        emit.shift_map = salt_map  # by value: small; avoids per-task ray.get
        posts = posts.map_batches(emit, batch_format="pyarrow", batch_size=8192)
    import shutil as _sh

    from .io import write_partitioned

    if not partition_resume:
        final = posts.groupby(["term", "salt"]).map_groups(
            merge_sublists, batch_format="pyarrow"
        )
        _sh.rmtree(segments_dir, ignore_errors=True)
        write_partitioned(final, segments_dir, "tbucket")
    else:
        # Per-PARTITION checkpointing (the external-sort-run shape): spill
        # the pre-encoded sub-lists once, hive-partitioned by tbucket, then
        # merge+write one term bucket at a time, recording completion after
        # each. A killed run resumes at the first unfinished bucket with no
        # re-tokenization (the spill survives); the skew plan is frozen in
        # the spill, so resumed output is byte-identical to a clean run.
        spill_dir = os.path.join(index_dir, "postings_spill")
        spill_marker = os.path.join(index_dir, "spill_done.json")
        done_path = os.path.join(index_dir, "segments_done.json")
        if not (resume and os.path.exists(spill_marker)):
            _sh.rmtree(spill_dir, ignore_errors=True)
            write_partitioned(posts, spill_dir, "tbucket")
            with open(spill_marker, "w") as f:
                json.dump({"complete": True}, f)
            for p in (done_path,):
                if os.path.exists(p):
                    os.remove(p)
        done: set[int] = set()
        if resume and os.path.exists(done_path):
            with open(done_path) as f:
                done = set(json.load(f)["buckets"])
        for b in range(num_tbuckets):
            if b in done:
                continue
            bdir = os.path.join(spill_dir, f"tbucket={b}")
            out_b = os.path.join(segments_dir, f"tbucket={b}")
            _sh.rmtree(out_b, ignore_errors=True)
            if os.path.isdir(bdir):
                final_b = ray.data.read_parquet(bdir).groupby(
                    ["term", "salt"]
                ).map_groups(merge_sublists, batch_format="pyarrow")
                final_b.write_parquet(out_b)
            done.add(b)
            tmp = done_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"buckets": sorted(done)}, f)
            os.replace(tmp, done_path)
    # empty corpus / empty buckets: guarantee at least one (0-row) segment
    # file so readers always see the canonical schema
    has_seg_files = any(
        f.endswith(".parquet")
        for _d, _s, fs in os.walk(segments_dir)
        for f in fs
    )
    if not has_seg_files:
        import pyarrow.parquet as pq_

        d0 = os.path.join(segments_dir, "tbucket=0")
        os.makedirs(d0, exist_ok=True)
        empty_seg = seg.rows_to_table([]).remove_column(
            seg.SEGMENT_SCHEMA.get_field_index("tbucket")
        )
        pq_.write_table(empty_seg, os.path.join(d0, "empty.parquet"))
    t_segments = time.time()

    # ---- stage 5: stats + manifest ----------------------------------------
    seg_agg = ray.data.read_parquet(
        segments_dir, columns=["term", "df"]
    ).aggregate(Count(), Sum("df"))
    n_slices = int(seg_agg["count()"])
    n_postings = int(seg_agg["sum(df)"] or 0)
    stats = {
        "N": n_docs,
        "sum_dl": sum_dl,
        "avgdl": avgdl,
        "max_docid": max_docid,
        "postings": n_postings,
        "segment_slices": n_slices,
        "k1": params.k1,
        "b": params.b,
        "num_tbuckets": num_tbuckets,
        "num_dbuckets": num_dbuckets,
        "block_size": block_size,
        "head_terms_salted": len(salt_map),
    }
    seg.write_stats(index_dir, stats)
    write_manifest(
        index_dir,
        stats=stats,
        timings={
            "docstore_sec": t_docstore - t0,
            "stats_sec": t_stats - t_docstore,
            "head_sample_sec": t_sample - t_stats,
            "segments_sec": t_segments - t_sample,
            "total_sec": time.time() - t0,
        },
        salt_map=salt_map,
    )
    return stats
