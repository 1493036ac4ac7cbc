"""End-to-end corpus curation — the composed training-data pipeline a
100-TB pretraining corpus actually runs: per-doc quality features +
language ID in ONE map-only pass, near-dup cluster canonicalization
(``stages/components.py``), and a single cogroup merge that applies every
keep-rule. Output: the curated doc set with its audit columns.

Scale shape:
- pass 1 reads the corpus ONCE and computes quality + langid together
  (both are map-only over the same tokenized batch — fusing them halves
  the corpus reads vs running the stages separately).
- the near-dup leg shares nothing with pass 1 and runs as its own
  pipeline (shingle shuffle + label propagation).
- the merge is one ``groupby(docid)`` over two narrow per-doc tables
  (features, cluster labels) — per-doc decisions happen inside the
  group, nothing reaches the driver, and dropped-row counts come back as
  distributed aggregates, not materialized rows.

Keep-rules (each an audit column, so downstream can re-slice):
quality_i6 ≥ min_quality_i6, min_tokens ≤ n_tokens ≤ max_tokens,
lang_pred ≠ 'und', is_canonical (smallest docid of its near-dup cluster).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import analyzer
from .._shipping import ensure_shippable
from ..util import to_i6
from .text_stats import langid_preds, quality_columns


class QualityLang:
    """Fused TextQuality + LangId: ONE tokenize feeds both feature
    families (tokenization dominates both stages' per-row cost, so
    delegating to the two stage classes — each of which re-tokenizes —
    would pay it twice on the curation hot path). Output columns are
    byte-identical to running the stages separately."""

    def __init__(self, id_col: str = "docid", text_col: str = "content"):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        token_lists = analyzer.tokenize_batch(
            batch[self.text_col].to_pylist()
        )
        return pa.table(
            {
                "docid": batch[self.id_col],
                **quality_columns(token_lists),
                "lang_pred": pa.array(
                    langid_preds(token_lists), pa.string()
                ),
            }
        )


def curate_corpus(
    docs,
    pairs,
    id_col: str = "docid",
    text_col: str = "content",
    min_quality_i6: int = 250_000,
    min_tokens: int = 20,
    max_tokens: int = 1_000_000,
):
    """→ Dataset (docid, n_tokens, lang_pred, quality_i6, is_canonical,
    keep) — one row per input doc with every rule's verdict; filter on
    ``keep == 1`` for the curated corpus. ``pairs`` is any near-dup pair
    Dataset (see stages/dedup.py / stages/ann.py)."""
    ensure_shippable()
    from .components import connected_components

    feats = docs.map_batches(
        QualityLang(id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    )

    def lift_feats(batch: pa.Table) -> pa.Table:
        q_i6 = to_i6(batch["quality_score"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "docid": batch["docid"].cast(pa.int64()),
                "n_tokens": batch["n_tokens"],
                "lang_pred": batch["lang_pred"],
                "quality_i6": pa.array(q_i6, pa.int64()),
                "label": pa.array(
                    np.full(batch.num_rows, -1, np.int64), pa.int64()
                ),
            }
        )

    comp = connected_components(pairs)

    def lift_labels(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "docid": batch["node"],
                "n_tokens": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "lang_pred": pa.array([""] * n, pa.string()),
                "quality_i6": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "label": batch["label"],
            }
        )

    merged = feats.map_batches(lift_feats, batch_format="pyarrow").union(
        comp.map_batches(lift_labels, batch_format="pyarrow")
    )

    def decide(group: pa.Table) -> pa.Table:
        docid = int(group["docid"][0].as_py())
        lab = group["label"].to_numpy(zero_copy_only=False)
        nt = group["n_tokens"].to_numpy(zero_copy_only=False)
        fmask = nt >= 0
        if not fmask.any():  # label row for a doc outside `docs` — drop
            return pa.table(
                {
                    "docid": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "lang_pred": pa.array([], pa.string()),
                    "quality_i6": pa.array([], pa.int64()),
                    "is_canonical": pa.array([], pa.int64()),
                    "keep": pa.array([], pa.int64()),
                }
            )
        fi = int(np.nonzero(fmask)[0][0])
        n_tokens = int(nt[fi])
        lang = group["lang_pred"][fi].as_py()
        q_i6 = int(group["quality_i6"][fi].as_py())
        has_lab = lab >= 0
        cluster = int(lab[has_lab].min()) if has_lab.any() else docid
        is_canon = int(cluster == docid)
        keep = int(
            q_i6 >= min_quality_i6
            and min_tokens <= n_tokens <= max_tokens
            and lang != "und"
            and is_canon == 1
        )
        return pa.table(
            {
                "docid": pa.array([docid], pa.int64()),
                "n_tokens": pa.array([n_tokens], pa.int64()),
                "lang_pred": pa.array([lang], pa.string()),
                "quality_i6": pa.array([q_i6], pa.int64()),
                "is_canonical": pa.array([is_canon], pa.int64()),
                "keep": pa.array([keep], pa.int64()),
            }
        )

    return merged.groupby("docid").map_groups(decide, batch_format="pyarrow")
