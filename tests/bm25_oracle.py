"""Shared brute-force-oracle top-k for the serving sweeps.

ONE implementation of the banned/windowed oracle contract
(test_refresh_matrix, test_e2e_property, and the inline window recompute
previously carried three copies — a tie-break or zero-score-semantics fix
had to land in all three or the sweeps drifted apart).

Contract (matches the engine bitwise): banned docids and docids outside
the half-open ``rng=[lo, hi)`` window score 0; zero-score docs never
appear in results; ties order by (-score, docid) via scorer.topk_order.
"""

import numpy as np

from dpr_ray.query import scorer
from dpr_ray.query.oracle import BruteForceBM25


def oracle_topk(
    o: BruteForceBM25, question: str, k: int, banned, rng=None
) -> list[tuple[int, float]]:
    if o.n_docs == 0:
        return []
    scores = o.score_all(question).copy()
    if len(banned):
        scores[np.isin(o.docids, np.asarray(banned, np.uint64))] = 0.0
    if rng is not None:  # half-open [lo, hi) docid window
        lo, hi = rng
        if lo >= hi:
            return []
        out = (o.docids < np.uint64(lo)) | (o.docids > np.uint64(hi - 1))
        scores[out] = 0.0
    nz = np.flatnonzero(scores > 0.0)
    order = scorer.topk_order(scores[nz], o.docids[nz], k)
    sel = nz[order]
    return [(int(o.docids[i]), float(scores[i])) for i in sel]
