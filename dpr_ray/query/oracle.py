"""Brute-force BM25 oracle (SURVEY §5): scores every (query, doc) pair with
pure Python/numpy over an in-memory corpus and produces rank-identical
top-k ground truth for engine tests. Shares the analyzer, the BM25 scalar
math, the sorted-term summation order and the (-score, docid) tie-break
with the distributed paths, so equality is exact (bitwise), not approximate.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from .. import analyzer
from ..config import BM25Params, DEFAULT_TOP_K
from . import scorer


class BruteForceBM25:
    def __init__(self, docids, texts, params: BM25Params = BM25Params()):
        self.params = params
        self.docids = np.asarray(docids, dtype=np.uint64)
        order = np.argsort(self.docids, kind="stable")
        self.docids = self.docids[order]
        texts = [texts[i] for i in order]
        self.counters = [Counter(analyzer.tokenize(t)) for t in texts]
        self.dls = np.array([sum(c.values()) for c in self.counters], dtype=np.int64)
        self.n_docs = len(texts)
        self.avgdl = float(self.dls.sum() / self.n_docs) if self.n_docs else 0.0
        self.df: Counter = Counter()
        for c in self.counters:
            self.df.update(c.keys())

    def postings(self, term: str):
        """(docids, tfs, dls) for one term, docid-sorted."""
        idx = [i for i, c in enumerate(self.counters) if term in c]
        return (
            self.docids[idx],
            np.array([self.counters[i][term] for i in idx], dtype=np.uint64),
            self.dls[idx].astype(np.uint64),
        )

    def score_all(self, question: str) -> np.ndarray:
        """Float64 score per doc (docid-sorted dense array), summed over the
        query's sorted unique terms."""
        terms = sorted(set(analyzer.tokenize(question)))
        scores = np.zeros(self.n_docs, dtype=np.float64)
        p = self.params
        for t in terms:
            df = self.df.get(t, 0)
            if df == 0:
                continue
            w = scorer.idf(df, self.n_docs)
            for i, c in enumerate(self.counters):
                tf = c.get(t)
                if tf:
                    dl = float(self.dls[i])
                    scores[i] += w * (
                        tf * (p.k1 + 1.0)
                        / (tf + p.k1 * (1.0 - p.b + p.b * dl / self.avgdl))
                    )
        return scores

    def top_k(self, question: str, k: int = DEFAULT_TOP_K):
        """[(docid, score)] for docs with score > 0, (-score, docid) order."""
        scores = self.score_all(question)
        nz = np.flatnonzero(scores > 0.0)
        order = scorer.topk_order(scores[nz], self.docids[nz], k)
        sel = nz[order]
        return [(int(self.docids[i]), float(scores[i])) for i in sel]
