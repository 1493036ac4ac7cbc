"""Answer-span location (the reader-ETL core the engine keeps in scope):

- ``find_answer_spans`` — token-subarray scan returning every (start, end)
  occurrence of the answer tokens in the passage tokens (reference
  ``_find_answer_positions``, ``dpr/data/reader_data.py:520-527``).
- ``chunk_level_hits`` — OR chunk-level has_answer up to the parent
  document and compute first-hit ranks at the parent level (reference
  table-chunk aggregation, ``dpr/data/qa_validation.py:249-282``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import analyzer


def find_answer_spans(passage_tokens: list[str],
                      answer_tokens: list[str]) -> list[tuple[int, int]]:
    """All (start, end) inclusive token spans where answer occurs."""
    n, h = len(answer_tokens), len(passage_tokens)
    if n == 0 or n > h:
        return []
    first = answer_tokens[0]
    return [
        (i, i + n - 1)
        for i in range(h - n + 1)
        if passage_tokens[i] == first
        and passage_tokens[i : i + n] == answer_tokens
    ]


def find_answer_spans_text(passage: str, answer: str) -> list[tuple[int, int]]:
    return find_answer_spans(analyzer.tokenize(passage), analyzer.tokenize(answer))


def select_best_spans(
    start_scores: np.ndarray,
    end_scores: np.ndarray,
    max_answer_length: int = 10,
    top_spans: int = 1,
) -> list[tuple[int, int, float]]:
    """Reader best-span selection (reference ``get_best_spans``,
    ``dpr/data/reader_data.py:370-416``): score every (start ≤ end <
    start+max_len) pair as start+end logits, sort descending, keep the top
    non-overlapping spans. Pure data op (model logits arrive as arrays)."""
    s = np.asarray(start_scores, dtype=np.float64)
    e = np.asarray(end_scores, dtype=np.float64)
    n = len(s)
    scores = s[:, None] + e[None, :]  # (start, end)
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    valid = (jj >= ii) & (jj - ii < max_answer_length)
    flat = np.flatnonzero(valid)
    order = flat[np.argsort(-scores.ravel()[flat], kind="stable")]
    chosen: list[tuple[int, int, float]] = []
    for idx in order:
        i, j = int(idx // n), int(idx % n)
        if any(not (j < ci or i > cj) for ci, cj, _ in chosen):
            continue  # overlaps a selected span (reader_data.py:399-407)
        chosen.append((i, j, float(scores[i, j])))
        if len(chosen) >= top_spans:
            break
    return chosen


def chunk_level_hits(results_ds, parent_col: str = "parent_docid"):
    """Result Dataset (qid, rank, has_answer, parent_col) → per (qid,
    parent) best rank with chunk hits OR'ed up: a hit on ANY chunk of a
    document counts for the document (reference qa_validation.py:249-265).
    Returns Dataset (qid, parent, best_hit) with best_hit = 0 for none."""

    def reduce_parent(group: pa.Table) -> pa.Table:
        ranks = group["rank"].to_numpy(zero_copy_only=False)
        hits = group["has_answer"].to_numpy(zero_copy_only=False)
        hit_ranks = ranks[hits]
        best = int(hit_ranks.min()) if len(hit_ranks) else 0
        return pa.table(
            {
                "qid": group["qid"][:1],
                "parent": group[parent_col][:1],
                "best_hit": pa.array([best], pa.int32()),
            }
        )

    return results_ds.groupby(["qid", parent_col]).map_groups(
        reduce_parent, batch_format="pyarrow"
    )
