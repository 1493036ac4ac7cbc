"""Deduplication family: exact, n-gram Jaccard (exact, shuffle-based),
MinHash+LSH, SimHash. Ray-Data-native shapes per the scale playbook:

- exact: content-hash in map_batches → groupby(hash) → first-wins
  (the reference's only dedup is first-wins on a stringified key,
  ``dpr/data/biencoder_data.py:379-380``).
- n-gram Jaccard: shingle explode → groupby(shingle) co-occurrence pairs →
  groupby(pair) intersection counts → exact Jaccard with broadcast set
  sizes. EXACT for any threshold (every qualifying pair shares ≥1 shingle);
  ``shingle_df_cap`` optionally drops ultra-hot shingles at scale (documented
  approximation, off by default).
- MinHash+LSH: per-batch signatures (vectorized universal hashing) → band
  explode → groupby(band) candidates → exact-Jaccard verification.
- SimHash: 64-bit tf-weighted fingerprints; near-dup candidates via 4×16-bit
  band equality, verified by Hamming distance.

All hashes are blake2b/arithmetic — deterministic across processes (never
python ``hash()``).
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pyarrow as pa
import ray

from .. import analyzer
from .._shipping import ensure_shippable
from ..util import round_half_away
from .text_stats import hash_token

_MERSENNE = (1 << 61) - 1


def shingles(tokens: list[str], k: int = 3) -> set[str]:
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


def shingle_hashes(tokens: list[str], k: int = 3) -> np.ndarray:
    return np.fromiter(
        (hash_token(s) for s in shingles(tokens, k)), dtype=np.uint64
    )


# ---------------------------------------------------------------- exact ----


def exact_dedup(ds, id_col: str = "docid", text_col: str = "content"):
    """→ Dataset (content_sha, docid_keep, n_dups): one row per distinct
    content, keeping the smallest id (first-wins, deterministic)."""
    ensure_shippable()

    def add_sha(batch: pa.Table) -> pa.Table:
        sha = [
            hashlib.sha256(t.encode()).hexdigest()
            for t in batch[text_col].to_pylist()
        ]
        return pa.table(
            {"content_sha": pa.array(sha), "docid": batch[id_col]}
        )

    def first_wins(group: pa.Table) -> pa.Table:
        ids = group["docid"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "content_sha": group["content_sha"][:1],
                "docid_keep": pa.array([int(ids.min())], pa.int64()),
                "n_dups": pa.array([len(ids)], pa.int64()),
            }
        )

    return (
        ds.map_batches(add_sha, batch_format="pyarrow")
        .groupby("content_sha")
        .map_groups(first_wins, batch_format="pyarrow")
    )


# ------------------------------------------------------- n-gram Jaccard ----


def ngram_jaccard_pairs(
    ds,
    id_col: str = "docid",
    text_col: str = "content",
    k: int = 3,
    threshold: float = 0.2,
    shingle_df_cap: int | None = None,
):
    """→ Dataset (docid_a, docid_b, jaccard) for pairs with exact k-gram
    Jaccard ≥ threshold (docid_a < docid_b; jaccard rounded to 6)."""
    ensure_shippable()

    def explode(batch: pa.Table) -> pa.Table:
        out_s, out_d = [], []
        ids = batch[id_col].to_pylist()
        for i, toks in enumerate(
            analyzer.tokenize_batch(batch[text_col].to_pylist())
        ):
            for s in shingles(toks, k):
                out_s.append(s)
                out_d.append(ids[i])
        return pa.table(
            {
                "shingle": pa.array(out_s, pa.string()),
                "docid": pa.array(out_d, pa.int64()),
            }
        )

    sh = ds.map_batches(explode, batch_format="pyarrow")

    # set sizes: distinct shingles per doc — small (one row per doc), broadcast
    def count_sizes(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "docid": group["docid"][:1],
                "n_shingles": pa.array([group.num_rows], pa.int64()),
            }
        )

    sizes_tbl = (
        sh.groupby("docid").map_groups(count_sizes, batch_format="pyarrow").to_pandas()
    )
    sizes_ref = ray.put(dict(zip(sizes_tbl["docid"], sizes_tbl["n_shingles"])))

    def pairs_of(group: pa.Table) -> pa.Table:
        ids = sorted(set(group["docid"].to_pylist()))
        if len(ids) < 2 or (shingle_df_cap and len(ids) > shingle_df_cap):
            return pa.table(
                {"docid_a": pa.array([], pa.int64()), "docid_b": pa.array([], pa.int64())}
            )
        a, b = zip(*combinations(ids, 2))
        return pa.table(
            {"docid_a": pa.array(a, pa.int64()), "docid_b": pa.array(b, pa.int64())}
        )

    pairs = sh.groupby("shingle").map_groups(pairs_of, batch_format="pyarrow")

    _sizes_cache: dict = {}

    def finish_pair(group: pa.Table) -> pa.Table:
        sizes = _sizes_cache.get("s")
        if sizes is None:  # one fetch per task; groups within a task reuse it
            sizes = ray.get(sizes_ref)
            _sizes_cache["s"] = sizes
        da = int(group["docid_a"][0].as_py())
        db = int(group["docid_b"][0].as_py())
        inter = group.num_rows  # one row per shared shingle
        union = sizes[da] + sizes[db] - inter
        j = float(round_half_away(inter / union)) if union else 0.0
        if j < threshold:
            return pa.table(
                {
                    "docid_a": pa.array([], pa.int64()),
                    "docid_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "docid_a": pa.array([da], pa.int64()),
                "docid_b": pa.array([db], pa.int64()),
                "jaccard": pa.array([j], pa.float64()),
            }
        )

    return pairs.groupby(["docid_a", "docid_b"]).map_groups(
        finish_pair, batch_format="pyarrow"
    )


# ------------------------------------------------------------- MinHash -----


_P31 = np.uint64((1 << 31) - 1)  # Mersenne prime; products fit in uint64


class MinHasher:
    """Vectorized universal-hash MinHash signatures over 31-bit shingle
    hashes: h_i(x) = (a_i*x + b_i) mod (2^31-1). a_i,x < 2^31 so products
    fit uint64 — one (num_perm × n_shingles) matrix op per document.
    Coefficients are deterministic from a fixed seed."""

    def __init__(self, num_perm: int = 64, seed: int = 1337):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, int(_P31), num_perm, dtype=np.uint64)[:, None]
        self.b = rng.integers(0, int(_P31), num_perm, dtype=np.uint64)[:, None]
        self.num_perm = num_perm

    def signature(self, shingle_h: np.ndarray) -> np.ndarray:
        if len(shingle_h) == 0:
            return np.full(self.num_perm, int(_P31), dtype=np.uint64)
        x = (shingle_h % _P31)[None, :]
        return ((self.a * x + self.b) % _P31).min(axis=1)


class _MinHashEmit:
    def __init__(self, id_col, text_col, k, num_perm, bands, seed):
        self.h = MinHasher(num_perm, seed)
        self.id_col, self.text_col, self.k = id_col, text_col, k
        self.bands = bands
        self.rows_per_band = num_perm // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        band_ids, band_hash, docids = [], [], []
        for i, toks in enumerate(
            analyzer.tokenize_batch(batch[self.text_col].to_pylist())
        ):
            sig = self.h.signature(shingle_hashes(toks, self.k))
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                band_ids.append(b)
                band_hash.append(bh)
                docids.append(ids[i])
        return pa.table(
            {
                "band": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hash, pa.string()),
                "docid": pa.array(docids, pa.int64()),
            }
        )


def minhash_lsh_pairs(
    ds,
    id_col: str = "docid",
    text_col: str = "content",
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    source_parquet: str | None = None,
):
    """→ Dataset (docid_a, docid_b, jaccard) of LSH candidate pairs whose
    EXACT shingle Jaccard ≥ threshold. Verification re-reads the two docs'
    text from ``source_parquet`` (point lookups, LRU-cached per actor)."""
    ensure_shippable()
    emit = ds.map_batches(
        _MinHashEmit,
        fn_constructor_args=(id_col, text_col, k, num_perm, bands, 1337),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def candidates(group: pa.Table) -> pa.Table:
        ids = sorted(set(group["docid"].to_pylist()))
        if len(ids) < 2:
            return pa.table(
                {"docid_a": pa.array([], pa.int64()), "docid_b": pa.array([], pa.int64())}
            )
        a, b = zip(*combinations(ids, 2))
        return pa.table(
            {"docid_a": pa.array(a, pa.int64()), "docid_b": pa.array(b, pa.int64())}
        )

    cand = (
        emit.groupby(["band", "band_hash"])
        .map_groups(candidates, batch_format="pyarrow")
        .groupby(["docid_a", "docid_b"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    )

    class Verify:
        def __init__(self):
            import pyarrow.dataset as pads

            self._ds = pads.dataset(source_parquet) if source_parquet else None
            self._cache: dict[int, set] = {}

        def _shingles(self, docid: int) -> set:
            s = self._cache.get(docid)
            if s is None:
                import pyarrow.compute as pc_

                tbl = self._ds.to_table(
                    columns=[id_col, text_col],
                    filter=pc_.field(id_col) == docid,
                )
                toks = analyzer.tokenize(tbl[text_col][0].as_py())
                s = shingles(toks, k)
                self._cache[docid] = s
            return s

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_a, out_b, out_j = [], [], []
            for r in batch.to_pylist():
                sa = self._shingles(int(r["docid_a"]))
                sb = self._shingles(int(r["docid_b"]))
                union = len(sa | sb)
                j = float(round_half_away(len(sa & sb) / union)) if union else 0.0
                if j >= threshold:
                    out_a.append(int(r["docid_a"]))
                    out_b.append(int(r["docid_b"]))
                    out_j.append(j)
            return pa.table(
                {
                    "docid_a": pa.array(out_a, pa.int64()),
                    "docid_b": pa.array(out_b, pa.int64()),
                    "jaccard": pa.array(out_j, pa.float64()),
                }
            )

    return cand.map_batches(Verify, batch_format="pyarrow", concurrency=(1, 2))


# ------------------------------------------------------------- SimHash -----


def simhash64(tokens: list[str]) -> int:
    """tf-weighted 64-bit SimHash of the token multiset."""
    if not tokens:
        return 0
    from collections import Counter

    acc = np.zeros(64, dtype=np.int64)
    bits = np.uint64(1) << np.arange(64, dtype=np.uint64)
    for t, tf in Counter(tokens).items():
        h = np.uint64(hash_token(t))
        sign = ((h & bits) != 0).astype(np.int64) * 2 - 1
        acc += sign * tf
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


class SimHash:
    def __init__(self, id_col: str = "docid", text_col: str = "content"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [
            simhash64(toks)
            for toks in analyzer.tokenize_batch(batch[self.text_col].to_pylist())
        ]
        return pa.table(
            {
                "docid": batch[self.id_col],
                "simhash": pa.array([h >> 1 for h in hs], pa.int64()),
                # 4×16-bit bands for banding-based near-dup candidates
                "b0": pa.array([h & 0xFFFF for h in hs], pa.int32()),
                "b1": pa.array([(h >> 16) & 0xFFFF for h in hs], pa.int32()),
                "b2": pa.array([(h >> 32) & 0xFFFF for h in hs], pa.int32()),
                "b3": pa.array([(h >> 48) & 0xFFFF for h in hs], pa.int32()),
            }
        )


def simhash_fingerprints(ds, id_col: str = "docid", text_col: str = "content"):
    ensure_shippable()
    return ds.map_batches(
        SimHash(id_col=id_col, text_col=text_col), batch_format="pyarrow"
    )
