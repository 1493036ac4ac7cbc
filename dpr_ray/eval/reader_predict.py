"""Reader prediction surface (S12/A3): per-question best spans by passage
threshold, EM@k aggregate, and the prediction-results JSON sink.

Ray-Data restatement of the reference's reader validation data path
(``train_extractive_reader.py:236-262`` EM aggregation,
``:418-470`` span selection over relevance-ranked passages,
``:512-536`` ``_save_predictions`` JSON) minus the model itself: logits
arrive as array columns (from any scorer), spans come from the word-level
``select_best_spans`` (``eval/spans.py``, the ``get_best_spans`` analog).

Per question (``reader_data.py`` eval samples keep retriever rank order):
passages are visited in DESCENDING relevance-logit order; each passage
contributes its best non-overlapping spans; the prediction at threshold n
is the first accumulated span whose passage's retriever rank ≤ n
(reference ``passage_idx < n`` filter, ``train_extractive_reader.py:461-464``).
EM@n = mean over questions of max exact_match against the gold answers
(``:251-262``).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from .qa import exact_match_score
from .spans import select_best_spans

PREDICTION_SCHEMA = pa.schema(
    [
        ("qid", pa.string()),
        ("question", pa.string()),
        ("top_k", pa.int64()),
        ("prediction_text", pa.string()),
        ("span_score", pa.float64()),
        ("relevance_score", pa.float64()),
        ("passage_rank", pa.int64()),
        ("passage_text", pa.string()),
    ]
)


def reader_predictions(
    samples_ds,
    passage_thresholds: list[int],
    max_answer_length: int = 10,
    top_spans: int = 10,
):
    """Dataset with one row per (qid, question, rank, relevance_logit,
    tokens: list<str>, start_logits: list<float>, end_logits: list<float>)
    → prediction Dataset (PREDICTION_SCHEMA), one row per (qid, threshold).
    """
    from .._shipping import ensure_shippable

    ensure_shippable()
    thresholds = sorted(passage_thresholds)

    def per_question(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        # relevance-descending visit order; rank breaks ties deterministically
        rows.sort(key=lambda r: (-r["relevance_logit"], r["rank"]))
        nbest: list[dict] = []
        for r in rows:
            spans = select_best_spans(
                np.asarray(r["start_logits"], dtype=np.float64),
                np.asarray(r["end_logits"], dtype=np.float64),
                max_answer_length=max_answer_length,
                top_spans=top_spans,
            )
            toks = r["tokens"]
            for i, j, score in spans:
                nbest.append(
                    {
                        "text": " ".join(toks[i : j + 1]),
                        "span_score": float(score),
                        "relevance_score": float(r["relevance_logit"]),
                        "rank": int(r["rank"]),
                        "passage_text": " ".join(toks),
                    }
                )
        out: list[dict] = []
        qid = rows[0]["qid"]
        question = rows[0]["question"]
        for n in thresholds:
            hit = next((p for p in nbest if p["rank"] <= n), None)
            if hit is None:  # reference assumes non-empty; emit the miss row
                hit = {"text": "", "span_score": -1.0,
                       "relevance_score": -1.0, "rank": 0,
                       "passage_text": ""}
            out.append(
                {
                    "qid": qid,
                    "question": question,
                    "top_k": n,
                    "prediction_text": hit["text"],
                    "span_score": hit["span_score"],
                    "relevance_score": hit["relevance_score"],
                    "passage_rank": hit["rank"],
                    "passage_text": hit["passage_text"],
                }
            )
        return pa.Table.from_pylist(out, schema=PREDICTION_SCHEMA)

    return samples_ds.groupby("qid").map_groups(
        per_question, batch_format="pyarrow"
    )


def reader_em_at_k(pred_ds, answers_ref) -> dict[int, float]:
    """A3: EM@n = mean over questions of max exact_match(prediction, gold)
    per threshold (``train_extractive_reader.py:251-262``). Distributed
    partial: per-block (n, hits, total) sums, reduced on the driver."""
    import ray

    answers = ray.get(answers_ref) if answers_ref is not None else {}

    def partial(batch: pa.Table) -> pa.Table:
        agg: dict[int, list[int]] = {}
        for r in batch.to_pylist():
            gold = answers.get(r["qid"], [])
            em = int(
                max(
                    (exact_match_score(r["prediction_text"], ga) for ga in gold),
                    default=False,
                )
            )
            a = agg.setdefault(int(r["top_k"]), [0, 0])
            a[0] += em
            a[1] += 1
        return pa.table(
            {
                "top_k": pa.array(sorted(agg), pa.int64()),
                "hits": pa.array([agg[n][0] for n in sorted(agg)], pa.int64()),
                "total": pa.array([agg[n][1] for n in sorted(agg)], pa.int64()),
            }
        )

    sums: dict[int, list[int]] = {}
    for b in pred_ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for r in b.to_pylist():
            a = sums.setdefault(int(r["top_k"]), [0, 0])
            a[0] += r["hits"]
            a[1] += r["total"]
    return {n: (h / t if t else 0.0) for n, (h, t) in sorted(sums.items())}


def save_reader_predictions(pred_ds, out_path: str, answers_ref=None) -> int:
    """S12: the reference ``_save_predictions`` JSON shape
    (``train_extractive_reader.py:512-536``): one entry per question with
    {question, gold_answers, predictions: [{top_k, prediction: {text,
    score, relevance_score, passage_idx, passage}}]}."""
    import ray

    answers = ray.get(answers_ref) if answers_ref is not None else {}
    by_q: dict[str, dict] = {}
    for b in pred_ds.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            e = by_q.setdefault(
                r["qid"],
                {
                    "question": r["question"],
                    "gold_answers": answers.get(r["qid"], []),
                    "predictions": [],
                },
            )
            e["predictions"].append(
                {
                    "top_k": int(r["top_k"]),
                    "prediction": {
                        "text": r["prediction_text"],
                        "score": r["span_score"],
                        "relevance_score": r["relevance_score"],
                        "passage_idx": int(r["passage_rank"]),
                        "passage": r["passage_text"],
                    },
                }
            )
    out = []
    for qid in sorted(by_q):
        e = by_q[qid]
        e["predictions"].sort(key=lambda p: p["top_k"])
        out.append(e)
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(json.dumps(out, indent=4) + "\n")
    return len(out)
