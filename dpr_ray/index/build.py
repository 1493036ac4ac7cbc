"""Index build pipeline (SURVEY §7 M0–M3): corpus → docstore + segments.

Ray-Data restatement of the reference's index-build front half
(``generate_dense_embeddings.py:41-149`` + ``faiss_indexers.py:86-105``),
with postings instead of dense vectors:

  read corpus → map_batches(Featurize) → sort(docid) →
  map_batches(DocstoreWriter)  — ONE fused execution that writes the
       docid-sorted docstore AND emits partials for the global stats
       (N, avgdl, max docid — the A5-analog aggregates) and the
       deterministic docid%mod head-term df sample (skew plan); the
       stats + salt plan persist in the docstore resume marker
  → map_batches(EmitEncodedPostings)  — map-side combine: per-batch
       per-(term, salt) delta+varint-encoded sub-lists (small terms via the
       BATCHED single-block encoder — one numpy pass per batch, which is
       what survives code-scale vocabularies); head terms salted by docid
       RANGE (salt = docid >> shift) so groups stay ≤ group_budget postings
       (skew: SURVEY §4)
  → groupby(tbucket, salt).map_groups(merge_bucket)  — the ONLY shuffle,
       moving compressed sub-lists; groups are term BUCKETS (16), not terms
       (map_groups costs ~1ms Python per group). Each bucket decodes all
       sub-lists in one concatenated varint pass, lexsorts (term, docid),
       re-encodes: small terms batched, head terms per-term with
       slice_id = salt (ordered docid ranges ⇒ slices concatenate sorted).
       Same skew plan + same corpus ⇒ byte-identical segments at any
       parallelism (resume determinism; the plan is a deterministic
       function of the corpus sample).
  → parallel hive writer (segments/tbucket=i/; index/io.py)

The driver never materializes the corpus (the reference holds all passages
in driver RAM — ``dense_retriever.py:461-469`` — the one scalability sin this
design removes).
"""

from __future__ import annotations

import hashlib
import math
import logging
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

log = logging.getLogger(__name__)


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
        # unsalted terms go through the BATCHED single-block encoder (one
        # numpy pass for the whole batch — per-term numpy calls dominate on
        # code-scale vocabularies); salted head terms (few) per-term
        u_terms: list[str] = []
        u_off = [0]
        u_d: list[int] = []
        u_tf: list[int] = []
        u_dl: list[int] = []
        rows: list[dict] = []
        salts: list[int] = []
        for t, (d_l, tf_l, dl_l) in per_term.items():
            shift = self.shift_map.get(t)
            if shift is None:
                u_terms.append(t)
                u_d.extend(d_l)
                u_tf.extend(tf_l)
                u_dl.extend(dl_l)
                u_off.append(len(u_d))
            else:
                d = np.array(d_l, dtype=np.uint64)
                tf = np.array(tf_l, dtype=np.uint64)
                dl = np.array(dl_l, dtype=np.uint64)
                sv = (d >> np.uint64(shift)).astype(np.int64)
                for s in np.unique(sv):
                    mask = sv == s
                    new = seg.encode_posting_list(
                        t, d[mask], tf[mask], dl[mask],
                        self.avgdl, self.params, self.num_tbuckets,
                        block_size=1 << 30, max_postings_per_slice=1 << 62,
                    )
                    rows.extend(new)
                    salts.extend([int(s)] * len(new))
        small_tbl, _ = seg.encode_single_block_lists(
            u_terms,
            np.asarray(u_off, dtype=np.int64),
            np.asarray(u_d, dtype=np.uint64),
            np.asarray(u_tf, dtype=np.uint64),
            np.asarray(u_dl, dtype=np.uint64),
            self.avgdl, self.params, self.num_tbuckets,
            salts=np.zeros(len(u_terms), dtype=np.int64),
        )
        if rows:
            big_tbl = seg.rows_to_table(rows).append_column(
                "salt", pa.array(salts, pa.int64())
            )
            return pa.concat_tables([small_tbl, big_tbl])
        return small_tbl


_PARTIAL_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df_part", pa.int64()),
        ("cnt", pa.int64()),
        ("sum_dl", pa.int64()),
        # ORDER-PRESERVING-ENCODED int64 (x - 2^63): provided docids use
        # the full 64-bit space, and BOTH raw int64 (overflow at 2^63 in
        # the writer) and raw uint64 (Ray's Max aggregate rebuilds values
        # through Python ints as int64, overflowing at 2^64-1 in the
        # reduce) fail at the edges; the shifted encoding is total
        ("max_docid_s", pa.int64()),
        # 1 on the per-block stats row, 0 on term rows: Sum("blocks") is the
        # number of blocks WRITTEN, checked against the number of part files
        # on disk (two blocks with an identical docid range — a duplicated
        # docid split into two singleton blocks by the sort — would write
        # the same filename, silently dropping a row)
        ("blocks", pa.int64()),
    ]
)


def docstore_part_name(docids: np.ndarray) -> str:
    """part-<lo>-<hi>.parquet, zero-padded so lexical sort == numeric
    sort. ONE definition shared by build's DocstoreWriter and merge's
    _write_docstore_ranged — _check_docstore_ranges' filename slicing
    (f[5:25]/f[26:46]) depends on this exact format."""
    return f"part-{int(docids[0]):020d}-{int(docids[-1]):020d}.parquet"


def encode_max_docid_s(x: int) -> int:
    """Order-preserving int64 encoding of a uint64 max_docid partial (see
    _PARTIAL_SCHEMA's max_docid_s comment); shared with merge.py."""
    return int(x) - (1 << 63)


def decode_max_docid_s(mx) -> int:
    """Inverse of encode_max_docid_s; a None aggregate (zero data rows)
    decodes to docid 0."""
    return (int(mx) + (1 << 63)) if mx is not None else 0


def check_block_duplicates(docids: np.ndarray, advice: str) -> None:
    """Blocks arrive docid-sorted, so a duplicate docid within a block is
    adjacent — it would silently double-count postings at query time, so
    fail loudly with caller-specific remediation ``advice``.
    Boundary-straddling duplicates are caught after the write by
    ``_check_docstore_ranges`` (range overlap, or the part-count mismatch
    when both straddling blocks are singletons with the same range)."""
    if docids.size > 1:
        dup_at = np.flatnonzero(docids[1:] == docids[:-1])
        if dup_at.size:
            raise ValueError(
                f"duplicate docid {int(docids[dup_at[0]])} {advice}"
            )


class DocstoreWriter:
    """Terminal docstore stage: writes each docid-sorted block as one
    parquet file (named by its docid range — idempotent under task retry,
    range-prunable by DocJoin) and emits TINY partial rows that fold the
    former stats and skew-sample executions into this single pass:

    - one ``term=""`` row per block with (cnt, sum_dl, max_docid) partials
      (the A5-analog global aggregates),
    - one (term, df_part) row per term seen in the block's deterministic
      ``docid % sample_mod == 0`` sample (drives the head-term salt plan).

    Each standalone Dataset execution costs seconds of fixed dispatch on
    top of the work — measured ~7s of the build's non-scaling time at both
    8 and 32 CPUs before the fold."""

    def __init__(self, out_dir: str, sample_mod: int):
        self.out_dir = out_dir
        self.sample_mod = sample_mod

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq_

        if batch.num_rows == 0:
            return pa.Table.from_pylist([], schema=_PARTIAL_SCHEMA)
        docids = batch["docid"].to_numpy(zero_copy_only=False)
        check_block_duplicates(
            docids,
            "in the corpus (same provided id on two rows, or the same "
            "repo/path ingested twice): duplicate ids would double-count "
            "postings — deduplicate upstream, or pass dedup_ids=True IF "
            "the duplicates are the same document (dedup_ids fails loudly "
            "on distinct documents colliding on one docid)",
        )
        name = docstore_part_name(docids)
        pq_.write_table(batch, os.path.join(self.out_dir, name))
        terms: list[str] = []
        dfp: list[int] = []
        if self.sample_mod >= 1:
            keep = docids % self.sample_mod == 0
            texts = [
                t for t, k in zip(batch["content"].to_pylist(), keep) if k
            ]
            df: Counter = Counter()
            for toks in analyzer.tokenize_batch(texts):
                df.update(set(toks))
            terms = list(df.keys())
            dfp = list(df.values())
        n = batch.num_rows
        dl_sum = int(batch["doclen"].to_numpy(zero_copy_only=False).sum())
        z = [0] * len(terms)
        return pa.table(
            {
                "term": pa.array([""] + terms, pa.string()),
                "df_part": pa.array([0] + dfp, pa.int64()),
                "cnt": pa.array([n] + z, pa.int64()),
                "sum_dl": pa.array([dl_sum] + z, pa.int64()),
                "max_docid_s": pa.array(
                    # term rows carry the MINIMUM encoding (docid 0) so
                    # they never win the max
                    [encode_max_docid_s(docids.max())]
                    + [encode_max_docid_s(0)] * len(terms),
                    pa.int64(),
                ),
                "blocks": pa.array([1] + z, pa.int64()),
            }
        )


def _check_docstore_ranges(
    docstore_dir: str, expected_parts: int | None = None
) -> None:
    """Driver-side complement of the in-block duplicate check
    (``check_block_duplicates``): part filenames carry each block's
    [lo, hi] docid range, and the global sort makes ranges of distinct
    docids strictly increasing — so a boundary-straddling duplicate (the
    sort split equal keys across blocks) shows up as hi_i >= lo_{i+1}.
    ``expected_parts`` (the number of blocks the writer actually wrote,
    folded into the write pass) closes the one hole range order can't see:
    two singleton blocks of the SAME duplicated docid share a filename, so
    the second write silently overwrites the first — on disk that is one
    part file for two written blocks. O(#files) driver work, no data
    read."""
    ranges = sorted(
        (int(f[5:25]), int(f[26:46]))
        for f in os.listdir(docstore_dir)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    if expected_parts is not None and len(ranges) != expected_parts:
        raise ValueError(
            f"docstore wrote {expected_parts} blocks but {len(ranges)} part "
            "files exist: two blocks shared a docid range (a duplicate "
            "docid split into identical singleton blocks) — deduplicate "
            "the corpus upstream or pass dedup_ids=True"
        )
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        if hi >= lo:
            raise ValueError(
                f"docstore part docid ranges overlap at {lo} (block ends at "
                f"{hi}): a duplicate docid straddles a block boundary — "
                "deduplicate the corpus upstream or pass dedup_ids=True"
            )


_FINGERPRINT_STAT_CAP = 1 << 16


def _stat_sig(path: str) -> str | None:
    """``size:mtime_ns`` for a corpus input path, or None when neither the
    local filesystem nor pyarrow.fs can stat it. os.stat first (the common
    case, and ns mtime for free); object-store / URI paths
    (s3://, file://, hdfs://, ...) resolve through
    ``pyarrow.fs.FileSystem.from_uri`` — without this, a remote corpus
    regenerated in place (same keys, new content) fingerprinted identically
    and resume silently served the OLD corpus."""
    try:
        st = os.stat(path)
        return f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        pass
    try:
        from pyarrow import fs as pafs

        f, rel = pafs.FileSystem.from_uri(path)
        info = f.get_file_info([rel])[0]
        # mtime is optional in pyarrow FileInfo: a None mtime would make the
        # signature size-only, which passes a same-size content rewrite — the
        # exact false-pass this function exists to prevent. Treat it as
        # unstatable so the degradation warning fires instead.
        if info.type == pafs.FileType.File and info.mtime_ns is not None:
            return f"{info.size}:{info.mtime_ns}"
    except Exception:
        pass
    return None


def _stat_sigs(paths: list[str]) -> list[str | None]:
    """Per-path ``_stat_sig``, with remote paths batched: ONE filesystem
    resolved from the first URI and ONE ``get_file_info`` list call —
    per-path ``from_uri`` + single-file RPC would add up to
    ``_FINGERPRINT_STAT_CAP`` sequential filesystem constructions and
    metadata round-trips of fixed driver latency at every build/merge
    start on an object-store corpus. The relative path of each sibling
    URI is derived from the first URI's (uri, rel) suffix relationship
    (s3/gs/hdfs/file URIs all satisfy ``uri.endswith(rel)``); any path
    that doesn't share the first URI's prefix falls back to the
    per-path route."""
    out: list[str | None] = [None] * len(paths)
    remote: list[int] = []
    for i, p in enumerate(paths):
        try:
            st = os.stat(p)
            out[i] = f"{st.st_size}:{st.st_mtime_ns}"
        except OSError:
            remote.append(i)
    if not remote:
        return out
    singles = remote
    try:
        from pyarrow import fs as pafs

        uri0 = paths[remote[0]]
        f, rel0 = pafs.FileSystem.from_uri(uri0)
        if uri0.endswith(rel0):
            prefix = uri0[: len(uri0) - len(rel0)]
            batched = [i for i in remote if paths[i].startswith(prefix)]
            singles = [i for i in remote if not paths[i].startswith(prefix)]
            infos = f.get_file_info([paths[i][len(prefix):] for i in batched])
            for i, info in zip(batched, infos):
                # None mtime → unstatable, same policy as _stat_sig
                if info.type == pafs.FileType.File and info.mtime_ns is not None:
                    out[i] = f"{info.size}:{info.mtime_ns}"
    except Exception:
        singles = remote
    for i in singles:
        out[i] = _stat_sig(paths[i])
    return out


def corpus_fingerprint(corpus_ds: ray.data.Dataset) -> str | None:
    """Best-effort identity of the input corpus for resume safety: blake2b
    over the sorted input-file list with per-file (size, mtime_ns) where
    the path is stat-able (locally or via pyarrow.fs for URI paths).
    Returns None when the dataset has no file lineage (in-memory corpora)
    — the resume check is then skipped.
    A false REFUSAL (mtime touched, identical bytes) is safe — rerun
    without resume; a false pass would silently serve the old corpus, so
    mtime is hashed at ns granularity (second granularity passed a file
    regenerated within the same second) and EVERY path is hashed. Only
    the first 2^16 paths are stat'ed (bounded driver time); past the cap
    — and for any path neither stat route can see — a same-path content
    change is invisible, so a warning is logged: the resume check
    degrades to path-list identity there."""
    try:
        files = corpus_ds.input_files()
    except Exception:
        return None
    if not files:
        return None
    h = hashlib.blake2b(digest_size=16)
    h.update(str(len(files)).encode())
    ordered = sorted(files)
    if len(ordered) > _FINGERPRINT_STAT_CAP:
        log.warning(
            "corpus_fingerprint: %d input files > stat cap %d — content "
            "changes confined to files past the cap (same paths, same "
            "count) will not invalidate resume",
            len(ordered), _FINGERPRINT_STAT_CAP,
        )
    sigs = _stat_sigs(ordered[:_FINGERPRINT_STAT_CAP])
    unstatable = 0
    for i, p in enumerate(ordered):
        pb = p.encode()
        # length-framed path: without it, a stat-able path 'a' with sig
        # '1:2' and a single unstat-able path literally named 'a:1:2'
        # hash identical bytes — two distinct corpora, one fingerprint
        h.update(b"\0")
        h.update(str(len(pb)).encode())
        h.update(b":")
        h.update(pb)
        if i >= _FINGERPRINT_STAT_CAP:
            continue
        sig = sigs[i]
        if sig is None:
            unstatable += 1
        else:
            h.update(b":")
            h.update(sig.encode())
    if unstatable:
        log.warning(
            "corpus_fingerprint: %d/%d input files had no stat-able "
            "size/mtime — the changed-corpus resume check degrades to "
            "path-list identity for them",
            unstatable, len(ordered),
        )
    return h.hexdigest()


def _check_resume_fp(recorded, current, index_dir: str, source: str) -> None:
    if recorded and current and recorded != current:
        raise ValueError(
            f"resume=True but the input corpus does not match the one the "
            f"{source} in {index_dir!r} was built from (fingerprint "
            f"{current} != recorded {recorded}): resuming would silently "
            "serve the OLD corpus. Rebuild without resume (or into a fresh "
            "index dir) if the corpus really changed."
        )


def _resume_sig(scope: str, **kv) -> str:
    """Signature over the build PARAMETERS that determine a stage's output
    bytes. The corpus fingerprint alone is not enough for resume safety:
    rerunning into an existing index dir with the same corpus but a
    different docid_strategy / block_size / num_tbuckets / k1 / ... would
    otherwise silently serve (or rebuild on top of) an index that does not
    match the requested parameters — the same silent-staleness class as a
    changed corpus. Checked independently of the fingerprint so in-memory
    corpora (fp=None) still get the parameter guard."""
    h = hashlib.blake2b(digest_size=16)
    h.update(scope.encode())
    for k in sorted(kv):
        h.update(f"|{k}={kv[k]!r}".encode())
    return h.hexdigest()


def _check_resume_sig(recorded, current, index_dir: str, source: str) -> None:
    # old markers (pre-signature) carry no 'resume_sig': best-effort skip,
    # same policy as a fingerprint-less corpus
    if recorded and recorded != current:
        raise ValueError(
            f"resume=True but the build parameters (docid_strategy / "
            f"dedup_ids / block_size / num_tbuckets / k1 / b / ...) do not "
            f"match the ones the {source} in {index_dir!r} was built with "
            f"(signature {current} != recorded {recorded}): resuming would "
            "silently serve an index built with DIFFERENT parameters. "
            "Rebuild without resume (or into a fresh index dir) if the "
            "parameters really changed."
        )


def _strip_tbucket(t: pa.Table) -> pa.Table:
    """Drop the physical tbucket column before a hive-partitioned segment
    write: the directory name carries the value, and the OTHER segment
    writers (io.write_partitioned, ensure_nonempty_segments) already
    strip it — keeping it here gave partition-resume builds a different
    file schema than plain builds for the same logical index."""
    i = t.schema.get_field_index("tbucket")
    return t.remove_column(i) if i >= 0 else t


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
    bytes (property-tested). Both resume points record and verify a
    best-effort corpus fingerprint (``corpus_fingerprint``) so resuming
    against a CHANGED input corpus fails loudly instead of silently
    serving the old one; in-memory corpora have no file lineage and skip
    the check."""
    import shutil

    from .._shipping import ensure_shippable

    ensure_shippable()
    t0 = time.time()
    docstore_dir = os.path.join(index_dir, "docstore")
    segments_dir = os.path.join(index_dir, "segments")
    docstore_marker = os.path.join(index_dir, "docstore_done.json")
    corpus_fp = corpus_fingerprint(corpus_ds)
    # two resume scopes: the docstore marker's bytes + salt plan depend only
    # on the featurize/salt parameters (segment params may legitimately
    # change between a docstore resume and the segment rebuild it feeds);
    # the complete manifest freezes everything.
    doc_sig = _resume_sig(
        "docstore", docid_strategy=docid_strategy, num_dbuckets=num_dbuckets,
        dedup_ids=dedup_ids, sample_mod=sample_mod, group_budget=group_budget,
    )
    full_sig = _resume_sig(
        "index", doc_sig=doc_sig, k1=params.k1, b=params.b,
        num_tbuckets=num_tbuckets, block_size=block_size,
        max_postings_per_slice=max_postings_per_slice,
    )
    if resume:
        m = man.read_manifest(index_dir)
        if m and m.get("complete"):
            _check_resume_fp(
                m.get("corpus_fp"), corpus_fp, index_dir, "complete index"
            )
            _check_resume_sig(
                m.get("resume_sig"), full_sig, index_dir, "complete index"
            )
            return seg.read_stats(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    # Invalidate any prior completeness claim BEFORE mutating outputs: a
    # rebuild killed mid-way must not leave a dir whose stale manifest still
    # says "complete" (a later resume would then return stale stats over a
    # wiped/partial docstore). stats.json goes too: merge_indexes and
    # SegmentStore read it WITHOUT a completeness check, so a stale copy
    # over partial data would serve the old corpus's N/avgdl silently.
    # Non-resume rebuilds also drop stage markers.
    for stale in ("manifest.json", "stats.json"):
        p_ = os.path.join(index_dir, stale)
        if os.path.exists(p_):
            os.remove(p_)
    if not resume:
        for marker in (
            docstore_marker,
            os.path.join(index_dir, "spill_done.json"),
            os.path.join(index_dir, "segments_done.json"),
        ):
            if os.path.exists(marker):
                os.remove(marker)

    # ---- stage 1 (fused): featurize → sorted docstore + stats + skew plan
    # ONE Dataset execution writes the docid-sorted docstore AND emits the
    # partial rows for (N, sum_dl, max_docid) and the head-term df sample
    # (DocstoreWriter); the former separate stats + sample executions each
    # re-read the docstore and cost seconds of fixed dispatch that did not
    # shrink with CPUs (the round-1 scaling gap). The resume marker persists
    # the stats + salt plan so a resumed run recomputes nothing.
    from ray.data.aggregate import Max

    salt_map: dict[str, int] = {}  # term -> shift
    # marker trust policy (see man.read_json_marker): unparseable or
    # missing-keys markers are ABSENT → rebuild; present signatures that
    # MISMATCH still refuse loudly below
    dmark = man.read_json_marker(docstore_marker) if resume else None
    if dmark is not None and not (
        {"resume_sig", "n_docs", "sum_dl", "max_docid", "salt_map"}
        <= dmark.keys()
    ):
        dmark = None
        log.warning(
            "docstore marker %s is unreadable or predates marker signing"
            " — rebuilding the docstore", docstore_marker,
        )
    if dmark is not None:
        _check_resume_fp(
            dmark.get("corpus_fp"), corpus_fp, index_dir, "docstore"
        )
        _check_resume_sig(
            dmark.get("resume_sig"), doc_sig, index_dir, "docstore"
        )
        n_docs = int(dmark["n_docs"])
        sum_dl = int(dmark["sum_dl"])
        max_docid = int(dmark["max_docid"])
        salt_map = {k: int(v) for k, v in dmark["salt_map"].items()}
    else:
        shutil.rmtree(docstore_dir, ignore_errors=True)
        os.makedirs(docstore_dir, exist_ok=True)
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
            import pyarrow.compute as pc_

            def first_wins(g: pa.Table) -> pa.Table:
                # dedup is only correct when the group really is ONE
                # document ingested twice. Distinct ext_ids sharing a docid
                # are a hash64 collision between DIFFERENT documents
                # (~n²/2^64 — a real risk near 10^8-10^9 docs): collapsing
                # would silently drop a real document from the index.
                if g.num_rows > 1 and pc_.count_distinct(
                    g["ext_id"]
                ).as_py() > 1:
                    ids = sorted(set(g["ext_id"].to_pylist()))[:4]
                    raise ValueError(
                        f"docid {g['docid'][0].as_py()} is shared by "
                        f"DISTINCT documents {ids}: a hash64 collision "
                        "(or colliding provided ids) between different "
                        "documents — dedup_ids would silently drop one. "
                        "Use docid_strategy='provided' with unique ids "
                        "(or rename one ext_id)."
                    )
                order = pc_.sort_indices(
                    g,
                    sort_keys=[("commit", "descending"),
                               ("sha256", "descending")],
                )
                return g.take(order[:1])

            sorted_feat = feat.groupby("docid").map_groups(
                first_wins, batch_format="pyarrow"
            )
        else:
            sorted_feat = feat.sort("docid")
        partials = sorted_feat.map_batches(
            DocstoreWriter(docstore_dir, sample_mod), batch_format="pyarrow"
        ).materialize()  # executes the write ONCE; keeps only the tiny rows
        agg = partials.aggregate(
            Sum("cnt"), Sum("sum_dl"), Max("max_docid_s"), Sum("blocks")
        ) or {}  # zero-block dataset: aggregate returns None, not zeros
        _check_docstore_ranges(
            docstore_dir, expected_parts=int(agg.get("sum(blocks)") or 0)
        )
        n_docs = int(agg.get("sum(cnt)") or 0)
        sum_dl = int(agg.get("sum(sum_dl)") or 0)
        max_docid = decode_max_docid_s(agg.get("max(max_docid_s)"))
        space_bits = max(1, max_docid.bit_length())
        if n_docs and sample_mod >= 1:
            # head terms get docid-RANGE salts: salt = docid >> shift, with
            # 2^(space_bits-shift) ≈ df_est*mod/group_budget ranges
            # (pow2-rounded). The "" stats rows carry df_part=0 and never
            # pass the positive threshold.
            head = (
                partials.groupby("term")
                .aggregate(Sum("df_part", alias_name="df_est"))
                .filter(expr=f"df_est > {group_budget / sample_mod}")
                .take_all()
            )
            for r in head:
                n_salts = max(
                    1, math.ceil(r["df_est"] * sample_mod / group_budget)
                )
                bits = max(1, (n_salts - 1).bit_length())
                salt_map[r["term"]] = max(0, space_bits - bits)
        if not any(f.endswith(".parquet") for f in os.listdir(docstore_dir)):
            # empty corpus: create an empty docstore file so downstream
            # reads see a valid (0-row) table with the canonical schema
            import pyarrow.parquet as pq_

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
        man.write_json_atomic(
            docstore_marker,
            {
                "complete": True,
                "corpus_fp": corpus_fp,
                "resume_sig": doc_sig,
                "n_docs": n_docs,
                "sum_dl": sum_dl,
                "max_docid": max_docid,
                "salt_map": salt_map,
            },
        )
    avgdl = (sum_dl / n_docs) if n_docs else 0.0
    salt_ref = ray.put(salt_map)  # broadcast once; actors ray.get in __init__
    t_docstore = t_stats = t_sample = time.time()

    # ---- stage 4: pre-encoded postings → groupby(tbucket, salt) → segments
    # Grouping at BUCKET granularity (not per term): map_groups costs ~1ms
    # of Python per group, which at code-scale vocabularies (100k+ terms)
    # dominates the whole stage. One group = one term bucket; inside, all
    # sub-lists are decoded in ONE vectorized pass (concatenated varint
    # decode + cumsum-with-resets), lexsorted by (term, docid), and small
    # terms are re-encoded by the batched single-block encoder.
    def merge_bucket(group: pa.Table) -> pa.Table:
        # LOCKSTEP WARNING: merge.py's remerge_bucket re-implements this
        # decode → lexsort(term, docid) → re-encode core (different salt /
        # upsert-rank handling); the merge==build byte-identity property
        # depends on the two staying semantically aligned — fix both or
        # the property tests in test_merge_upsert.py will catch the drift.
        salt = int(group["salt"][0].as_py())
        d_all, tf_all, dl_all, tidx, terms_sorted = _bulk_decode_group(group)
        if len(d_all) == 0:
            return seg.rows_to_table([])
        order = np.lexsort((d_all, tidx))
        d_all, tf_all, dl_all, tidx = (
            d_all[order], tf_all[order], dl_all[order], tidx[order],
        )
        bounds = np.flatnonzero(np.diff(tidx)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(tidx)]])
        small_terms: list[str] = []
        s_off = [0]
        s_idx: list[np.ndarray] = []
        out_rows: list[dict] = []
        for s, e in zip(starts, ends):
            term = terms_sorted[tidx[s]]
            n = e - s
            if n <= block_size and salt == 0:
                small_terms.append(term)
                s_idx.append(np.arange(s, e))
                s_off.append(s_off[-1] + n)
            else:
                rows = seg.encode_posting_list(
                    term, d_all[s:e], tf_all[s:e], dl_all[s:e],
                    avgdl, params, num_tbuckets, block_size,
                    max_postings_per_slice, slice_id_offset=salt * 64,
                )
                assert len(rows) <= 64, f"slice overflow {term!r} salt {salt}"
                out_rows.extend(rows)
        parts = []
        if small_terms:
            sel = np.concatenate(s_idx)
            small_tbl, _ = seg.encode_single_block_lists(
                small_terms, np.asarray(s_off, dtype=np.int64),
                d_all[sel], tf_all[sel], dl_all[sel],
                avgdl, params, num_tbuckets,
            )
            parts.append(small_tbl)
        if out_rows:
            parts.append(seg.rows_to_table(out_rows))
        if not parts:
            return seg.rows_to_table([])
        return pa.concat_tables(parts)

    def _bulk_decode_group(group: pa.Table):
        """All sub-lists of a (tbucket, salt) group → concatenated
        (docids, tfs, dls, term_idx) via ONE varint decode per stream."""
        terms_col = group["term"].to_pylist()
        uniq_terms = sorted(set(terms_col))
        t_to_i = {t: i for i, t in enumerate(uniq_terms)}
        d_blobs: list[bytes] = []
        tf_blobs: list[bytes] = []
        dl_blobs: list[bytes] = []
        counts: list[int] = []
        row_tidx: list[int] = []
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
        if not d_blobs:
            z = np.empty(0, np.uint64)
            return z, z, z, np.empty(0, np.int64), uniq_terms
        docids, vals_per_blob = seg.concat_delta_decode(d_blobs)
        tfs, _ = seg.concat_varint_decode(tf_blobs)
        dls, _ = seg.concat_varint_decode(dl_blobs)
        tidx = np.repeat(
            np.asarray(row_tidx, dtype=np.int64), vals_per_blob
        )
        return docids, tfs, dls, tidx, uniq_terms

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

    n_slices = n_postings = None
    if not partition_resume:
        # drop any PARTITION-path state first, resume or not: this branch
        # is about to wipe segments_dir, and surviving spill_done.json /
        # segments_done.json markers would make a LATER
        # partition_resume=True run skip every "done" bucket whose dir no
        # longer exists — a manifest-complete index with silently empty
        # segments (live-reproduced before this guard)
        for stale_marker in (
            os.path.join(index_dir, "spill_done.json"),
            os.path.join(index_dir, "segments_done.json"),
        ):
            if os.path.exists(stale_marker):
                os.remove(stale_marker)
        _sh.rmtree(
            os.path.join(index_dir, "postings_spill"), ignore_errors=True
        )
        final = posts.groupby(["tbucket", "salt"]).map_groups(
            merge_bucket, batch_format="pyarrow"
        )
        _sh.rmtree(segments_dir, ignore_errors=True)
        wres = write_partitioned(final, segments_dir, "tbucket", sum_cols=["df"])
        n_slices = wres["rows"]  # one slice row per segment row
        n_postings = wres["sum_df"]
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
        # The spill holds pre-ENCODED postings: its bytes depend on the
        # segment params (k1/b/num_tbuckets/block_size via
        # EmitEncodedPostings) AND the corpus — so the marker records and
        # verifies full_sig + corpus_fp like the docstore/manifest markers.
        # Without this, rerunning with e.g. a changed num_tbuckets reused a
        # spill whose tbucket assignment no longer matches query-time term
        # hashing: terms silently missing. done_path needs no separate check:
        # it is removed whenever the spill is rewritten, so it can only
        # coexist with a spill marker that already passed these checks.
        # Marker trust policy: an affirmative MISMATCH of a recorded
        # signature/fingerprint is user error and refuses loudly; a marker
        # that is unparseable (pre-atomic-write kill artifact) or predates
        # signing entirely is treated as ABSENT — the spill is rebuilt from
        # the current corpus+params, which is always safe: the (signed)
        # docstore marker upstream already refused any corpus change, and
        # removing done_path forces segments to rebuild from the new spill.
        smark = man.read_json_marker(spill_marker) if resume else None
        if smark is not None and "resume_sig" not in smark:
            smark = None
        if resume and smark is None and os.path.exists(spill_marker):
            log.warning(
                "spill marker %s is unreadable or predates marker "
                "signing — rebuilding the postings spill",
                spill_marker,
            )
        if smark is not None:
            _check_resume_fp(
                smark.get("corpus_fp"), corpus_fp, index_dir, "postings spill"
            )
            _check_resume_sig(
                smark.get("resume_sig"), full_sig, index_dir, "postings spill"
            )
        else:
            # drop stale state FIRST (marker, bucket list, spill) so a kill
            # anywhere inside the rewrite leaves no marker — the next resume
            # rebuilds; writing the marker before removing done_path would
            # open a window where a fresh signed marker coexists with a
            # bucket list from the PREVIOUS spill
            for p in (spill_marker, done_path):
                if os.path.exists(p):
                    os.remove(p)
            _sh.rmtree(spill_dir, ignore_errors=True)
            write_partitioned(posts, spill_dir, "tbucket")
            man.write_json_atomic(spill_marker, {
                "complete": True, "corpus_fp": corpus_fp,
                "resume_sig": full_sig,
            })
        done: set[int] = set()
        if resume:
            dp = man.read_json_marker(done_path)
            if dp is not None and isinstance(dp.get("buckets"), list):
                done = set(dp["buckets"])
        # stale bucket dirs OUTSIDE range(num_tbuckets) — left by a prior
        # build with a larger num_tbuckets killed mid-segments and rerun
        # with resume=False (resume=True refuses via the spill signature) —
        # must go: the loop below only rewrites in-range buckets, and a
        # leftover dir's postings use the OLD tbucket assignment (phantom
        # terms in full-segment scans, inflated stats). The non-partition
        # path wipes segments_dir entirely.
        if os.path.isdir(segments_dir):
            for d_ in os.listdir(segments_dir):
                if not d_.startswith("tbucket="):
                    continue
                try:
                    b_ = int(d_.split("=", 1)[1])
                except ValueError:
                    b_ = -1
                if not (0 <= b_ < num_tbuckets):
                    _sh.rmtree(
                        os.path.join(segments_dir, d_), ignore_errors=True
                    )
        for b in range(num_tbuckets):
            if b in done:
                continue
            bdir = os.path.join(spill_dir, f"tbucket={b}")
            out_b = os.path.join(segments_dir, f"tbucket={b}")
            _sh.rmtree(out_b, ignore_errors=True)
            if os.path.isdir(bdir):
                final_b = ray.data.read_parquet(bdir).groupby(
                    "salt"
                ).map_groups(
                    merge_bucket, batch_format="pyarrow"
                ).map_batches(_strip_tbucket, batch_format="pyarrow")
                final_b.write_parquet(out_b)
            done.add(b)
            man.write_json_atomic(done_path, {"buckets": sorted(done)})
    # empty corpus / empty buckets: guarantee at least one (0-row) segment
    # file so readers always see the canonical schema
    seg.ensure_nonempty_segments(segments_dir)
    t_segments = time.time()

    # ---- stage 5: stats + manifest (write-pass partials when available) ---
    if n_slices is None:
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
        corpus_fp=corpus_fp,
        resume_sig=full_sig,
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
