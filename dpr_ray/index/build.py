"""Index build pipeline (SURVEY §7 M0–M3): corpus → docstore + segments.

Ray-Data restatement of the reference's index-build front half
(``generate_dense_embeddings.py:41-149`` + ``faiss_indexers.py:86-105``),
with postings instead of dense vectors:

  read corpus → map_batches(Featurize) → write docstore (docid-partitioned)
  → aggregate global stats (N, avgdl — the A5-analog aggregates)
  → deterministic 1/sample_mod corpus sample → head-term df estimate
  → map_batches(EmitPostings)  — (term, salt, docid, tf, dl) rows,
       head terms salted into ceil(df/budget) salts (skew: SURVEY §4)
  → groupby(term, salt).map_groups(encode)   — the big shuffle, skew-bounded
  → groupby(term).map_groups(merge)          — small shuffle over encoded
       sub-lists; re-sorts by docid and re-blocks, so final segment bytes are
       independent of salting/parallelism (resume determinism)
  → write_parquet(segments/, partition_cols=["tbucket"])

The driver never materializes the corpus (the reference holds all passages
in driver RAM — ``dense_retriever.py:461-469`` — the one scalability sin this
design removes).
"""

from __future__ import annotations

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
from . import segments as seg
from .manifest import write_manifest


class EmitPostings:
    """Docstore batch → (term, salt, docid, tf, dl) posting rows.

    Actor-pool stage: the head-term salt map is fetched from the object store
    ONCE per actor in __init__ (broadcast via ray.put, never re-shipped per
    batch). tf is the exact term count under the analyzer; dl is carried on
    every posting so scoring recomputes float64 tf_norm exactly
    (2-varint-bytes cost, the price of rank-identical scores)."""

    def __init__(self, salt_map_ref):
        self.salt_map = ray.get(salt_map_ref) if salt_map_ref is not None else {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        docids = batch["docid"].to_numpy(zero_copy_only=False)
        dls = batch["doclen"].to_numpy(zero_copy_only=False)
        texts = batch["content"].to_pylist()
        token_lists = analyzer.tokenize_batch(texts)
        terms: list[str] = []
        tfs: list[int] = []
        out_docid: list[int] = []
        out_dl: list[int] = []
        salts: list[int] = []
        salt_map = self.salt_map
        for i, toks in enumerate(token_lists):
            counts = Counter(toks)
            d = int(docids[i])
            l = int(dls[i])
            for t, c in counts.items():
                terms.append(t)
                tfs.append(c)
                out_docid.append(d)
                out_dl.append(l)
                ns = salt_map.get(t)
                salts.append(d % ns if ns else 0)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "salt": pa.array(salts, pa.int32()),
                "docid": pa.array(out_docid, pa.uint64()),
                "tf": pa.array(tfs, pa.uint64()),
                "dl": pa.array(out_dl, pa.uint64()),
            }
        )


class SampleDf:
    """Deterministic head-term discovery: keep docs with docid % mod == 0,
    emit per-batch partial (term, df). Sampling by docid is independent of
    block boundaries, so the head set (and hence nothing about the final
    index — merge re-blocks) is reproducible."""

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
    write_min_rows_per_file: int | None = None,
) -> dict:
    """Build a BM25 index under ``index_dir``. Returns the stats dict."""
    from .._shipping import ensure_shippable

    ensure_shippable()
    t0 = time.time()
    docstore_dir = os.path.join(index_dir, "docstore")
    segments_dir = os.path.join(index_dir, "segments")
    os.makedirs(index_dir, exist_ok=True)

    # ---- stage 1: featurize → docstore ------------------------------------
    feat = corpus_ds.map_batches(
        Featurize(docid_strategy=docid_strategy, num_dbuckets=num_dbuckets),
        batch_format="pyarrow",
    )
    feat.write_parquet(docstore_dir, partition_cols=["dbucket"])
    t_docstore = time.time()

    # ---- stage 2: global stats (N, avgdl) ---------------------------------
    agg = ray.data.read_parquet(docstore_dir, columns=["doclen"]).aggregate(
        Count(), Sum("doclen")
    )
    n_docs = int(agg["count()"])
    sum_dl = int(agg["sum(doclen)"] or 0)
    avgdl = (sum_dl / n_docs) if n_docs else 0.0
    t_stats = time.time()

    # ---- stage 3: head-term discovery (skew plan) -------------------------
    salt_map: dict[str, int] = {}
    if n_docs and sample_mod >= 1:
        df_sample = (
            ray.data.read_parquet(docstore_dir, columns=["docid", "content"])
            .map_batches(SampleDf(sample_mod), batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("df_part", alias_name="df_est"))
        )
        # head terms are at most sample_tokens/ (budget/mod) rows — tiny
        head = df_sample.filter(expr=f"df_est > {group_budget / sample_mod}").take_all()
        salt_map = {
            r["term"]: int(math.ceil(r["df_est"] * sample_mod / group_budget))
            for r in head
        }
    salt_ref = ray.put(salt_map)  # broadcast once; actors ray.get in __init__
    t_sample = time.time()

    # ---- stage 4: postings → salted groupby → encode → merge → segments ---
    def encode_sublist(group: pa.Table) -> pa.Table:
        term = group["term"][0].as_py()
        rows = seg.encode_posting_list(
            term,
            group["docid"].to_numpy(zero_copy_only=False),
            group["tf"].to_numpy(zero_copy_only=False),
            group["dl"].to_numpy(zero_copy_only=False),
            avgdl, params, num_tbuckets, block_size, max_postings_per_slice,
        )
        return seg.rows_to_table(rows)

    def merge_sublists(group: pa.Table) -> pa.Table:
        term = group["term"][0].as_py()
        docids, tfs, dls = seg.decode_rows(group.to_pylist())
        rows = seg.encode_posting_list(
            term, docids, tfs, dls,
            avgdl, params, num_tbuckets, block_size, max_postings_per_slice,
        )
        return seg.rows_to_table(rows)

    posts = ray.data.read_parquet(
        docstore_dir, columns=["docid", "content", "doclen"]
    )
    if emit_concurrency is None:
        # autoscaling pool, min 1: a pool whose MIN size equals the node's
        # CPU count deadlocks against the upstream read task (observed), and
        # reserving every CPU starves the groupby/write stages anyway.
        total_cpus = int(ray.cluster_resources().get("CPU", 4))
        emit_concurrency = (1, max(1, total_cpus - 1))
    posts = posts.map_batches(
        EmitPostings, fn_constructor_args=(salt_ref,),
        batch_format="pyarrow", concurrency=emit_concurrency,
    )
    sub = posts.groupby(["term", "salt"]).map_groups(
        encode_sublist, batch_format="pyarrow"
    )
    final = sub.groupby("term").map_groups(merge_sublists, batch_format="pyarrow")
    if write_min_rows_per_file:
        final.write_parquet(
            segments_dir, partition_cols=["tbucket"],
            min_rows_per_file=write_min_rows_per_file,
        )
    else:
        final.write_parquet(segments_dir, partition_cols=["tbucket"])
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
