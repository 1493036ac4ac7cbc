"""BM25 scalar math (SURVEY.md §2.9).

score(q, d) = Σ_{t ∈ q, sorted} idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))

idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))   (Lucene BM25 idf; always > 0)

Determinism contract (SURVEY §7 hard part (a)): every scoring path — the
brute-force oracle, the vectorized TAAT executor, and block-max WAND — sums a
document's per-term contributions in SORTED UNIQUE TERM order, in float64.
Ties are broken ``(-score, docid)`` everywhere. Reruns are rank- and
bit-identical.
"""

from __future__ import annotations

import math

import numpy as np

from ..config import BM25Params


def idf(df: float, n_docs: float) -> float:
    # math.log(1.0 + x), NOT log1p(x): the two differ in the last ulp
    # (1.0 + x rounds first), and every scoring path must reproduce THIS
    # value bitwise — a vectorized variant must be np.log(1.0 + x)
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_norm_vec(
    tfs: np.ndarray, dls: np.ndarray, avgdl: float, params: BM25Params
) -> np.ndarray:
    """Exact float64 tf-normalization component for arrays of (tf, dl)."""
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    return tf * (params.k1 + 1.0) / (tf + params.k1 * (1.0 - params.b + params.b * dl / avgdl))


def score_contrib_vec(
    tfs: np.ndarray,
    dls: np.ndarray,
    df: int,
    n_docs: int,
    avgdl: float,
    params: BM25Params,
) -> np.ndarray:
    """Per-posting float64 score contribution of one term."""
    return idf(df, n_docs) * tf_norm_vec(tfs, dls, avgdl, params)


def topk_order(scores: np.ndarray, docids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k entries under (-score, docid) ordering.

    Uses argpartition to avoid a full sort when the candidate set is much
    larger than k, then a lexsort of just the survivors.
    """
    n = len(scores)
    if n == 0 or k <= 0:
        return np.empty(0, dtype=np.int64)
    if n > 4 * k:
        # partition to find the k-th score, then keep EVERY entry tied with it
        # so (-score, docid) tie-breaking is exact even with mass score ties
        kth = np.partition(-scores, k - 1)[k - 1]
        cand = np.flatnonzero(-scores <= kth)
    else:
        cand = np.arange(n)
    order = cand[np.lexsort((docids[cand], -scores[cand]))]
    return order[:k]
