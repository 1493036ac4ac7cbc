"""Reader ETL (M20/J3): retriever results → reader training samples.

Ray-Data restatement of the reference's ``preprocess_retriever_data``
(``dpr/data/reader_data.py:234-317``) and its passage selection
(``_select_reader_passages``, ``reader_data.py:419-517``), over the
word-token stream of the SimpleTokenizer analyzer (the engine's tensorizer
analog — span semantics are identical to ``_find_answer_positions``,
``reader_data.py:520-527``, token-subarray scan):

- TRAIN mode: positives = retrieved passages whose token stream contains an
  answer span (gold-page-only first when a gold map is given, fallback to
  all — ``reader_data.py:443-495``), capped at ``max_positives``; negatives
  = non-hit passages capped at ``min(max(10*n_pos, max_negatives),
  min_negatives)`` (``reader_data.py:513-516``); samples with no positives
  are skipped (``skip_no_positives``).
- EVAL mode: no positives; all passages capped at ``eval_passages``
  (``DEFAULT_EVAL_PASSAGES``, ``reader_data.py:232``).
- Span shifting: the reader input sequence is question ⊕ title ⊕ passage
  tokens, so answer spans shift by ``passage_offset = |question| + |title|``
  (the ``_concat_pair`` shift, ``reader_data.py:530-533``).
- Gold-passage injection (J3): optional broadcast map question → (title,
  context); the gold passage is appended to positives when its text is not
  already present and it contains an answer (``reader_data.py:497-509``).

The whole transform is a ``groupby(qid).map_groups`` over the flattened
result Dataset — one group per question, never a driver-side dict of
passages (the reference forks a multiprocessing pool over driver-resident
samples, ``reader_data.py:320-367``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import pyarrow as pa

from .. import analyzer
from .spans import find_answer_spans


@dataclass(frozen=True)
class ReaderCfg:
    """Reference ``ReaderPreprocessingCfg`` defaults
    (``reader_data.py:220-229``)."""

    max_positives: int = 20
    max_negatives: int = 50
    min_negatives: int = 150
    max_retriever_passages: int = 200
    eval_passages: int = 100
    skip_no_positives: bool = True
    gold_page_only_positives: bool = True
    include_gold_passage: bool = False


READER_SAMPLE_SCHEMA = pa.schema(
    [
        ("qid", pa.string()),
        ("question", pa.string()),
        ("docid", pa.int64()),
        ("rank", pa.int64()),
        ("role", pa.string()),  # 'pos' | 'neg'
        ("passage_offset", pa.int64()),  # |question ⊕ title| token shift
        ("n_spans", pa.int64()),
        ("span0_start", pa.int64()),  # shifted; -1 when no span
        ("span0_end", pa.int64()),
    ]
)


def load_gold_passages(path: str) -> tuple[dict, dict]:
    """Parse the reference gold-passages JSON (``_get_gold_ctx_dict``,
    ``reader_data.py:536-569``): {"data": [{question, question_tokens,
    title, context, example_id}]} → (question → {title, context},
    tokenized-question → original question)."""
    with open(path) as f:
        data = json.load(f)["data"]
    gold: dict[str, dict] = {}
    canonical: dict[str, str] = {}
    for s in data:
        q = s["question"]
        q_tok = s.get("question_tokens", q)
        canonical[q_tok] = q
        rp = {"title": s["title"].lower(), "context": s["context"]}
        gold[q] = rp
        gold[q_tok] = rp
    return gold, canonical


def _spans_for(text: str, answers: list[str]) -> list[tuple[int, int]]:
    toks = analyzer.tokenize(text)
    out: list[tuple[int, int]] = []
    for a in answers:  # flatten in answer order (reader_data.py:459-464)
        out.extend(find_answer_spans(toks, analyzer.tokenize(a)))
    return out


def preprocess_retriever_results(
    results_ds,
    answers_ref,
    cfg: ReaderCfg = ReaderCfg(),
    is_train: bool = True,
    gold_ref=None,
):
    """Flattened result Dataset (qid, question, rank, docid, title, content)
    → reader-sample Dataset (READER_SAMPLE_SCHEMA). ``answers_ref`` /
    ``gold_ref`` are ray.put broadcasts ({qid: [answers]} and the
    load_gold_passages maps)."""
    import ray

    from .._shipping import ensure_shippable

    ensure_shippable()

    def per_question(group: pa.Table, _memo={}) -> pa.Table:
        # broadcasts resolve ON the worker, once per process (mutable-
        # default memo) — a driver-side ray.get captured the full answer/
        # gold maps in this closure and re-shipped them in every task's
        # pickled UDF (same fix as compat.convert_to_kilt)
        if "maps" not in _memo:
            import ray as _ray

            _memo["maps"] = (
                _ray.get(answers_ref) if answers_ref is not None else {},
                *(
                    _ray.get(gold_ref)
                    if gold_ref is not None
                    else ({}, {})
                ),
            )
        answers, gold, canonical = _memo["maps"]
        rows = sorted(group.to_pylist(), key=lambda r: r["rank"])
        rows = rows[: cfg.max_retriever_passages]
        qid = rows[0]["qid"]
        question = rows[0]["question"]
        question_txt = canonical.get(question, question)
        ans = answers.get(qid, [])
        q_len = len(analyzer.tokenize(question_txt))
        out: list[dict] = []

        def emit(r: dict, role: str, spans: list[tuple[int, int]]) -> None:
            shift = q_len + len(analyzer.tokenize(r.get("title") or ""))
            shifted = [(s + shift, e + shift) for s, e in spans]
            out.append(
                {
                    "qid": qid,
                    "question": question_txt,
                    "docid": int(r["docid"]),
                    "rank": int(r["rank"]),
                    "role": role,
                    "passage_offset": shift,
                    "n_spans": len(shifted),
                    "span0_start": shifted[0][0] if shifted else -1,
                    "span0_end": shifted[0][1] if shifted else -1,
                }
            )

        if not is_train:
            for r in rows[: cfg.eval_passages]:
                emit(r, "neg", [])
            return pa.Table.from_pylist(out, schema=READER_SAMPLE_SCHEMA)

        # tokenize each passage ONCE: spans were recomputed up to three
        # times per row (hits filter, negatives filter, positive emit) —
        # tokenization dominates this stage's per-row cost
        spans_map = {id(r): _spans_for(r["content"], ans) for r in rows}
        hits = [r for r in rows if spans_map[id(r)]]
        gold_info = gold.get(question_txt)
        if cfg.gold_page_only_positives and gold_info:
            from_gold = [
                r for r in hits
                if (r.get("title") or "").lower() == gold_info["title"]
            ]
            positives = from_gold or hits
        else:
            positives = hits
        positives = positives[: cfg.max_positives]
        n_pos = len(positives)
        if cfg.include_gold_passage and gold_info:
            if not any(r["content"] == gold_info["context"] for r in positives):
                g_spans = _spans_for(gold_info["context"], ans)
                if g_spans:  # gold counts as a positive (reader_data.py:497-509)
                    n_pos += 1
                    emit(
                        {
                            "docid": -1,
                            "rank": 0,
                            "title": gold_info["title"],
                            "content": gold_info["context"],
                        },
                        "pos",
                        g_spans,
                    )
        if n_pos == 0 and cfg.skip_no_positives:
            return pa.Table.from_pylist([], schema=READER_SAMPLE_SCHEMA)
        negatives = [r for r in rows if not spans_map[id(r)]]
        n_neg = min(max(10 * n_pos, cfg.max_negatives), cfg.min_negatives)
        for r in positives:
            emit(r, "pos", spans_map[id(r)])
        for r in negatives[:n_neg]:
            emit(r, "neg", [])
        return pa.Table.from_pylist(out, schema=READER_SAMPLE_SCHEMA)

    return results_ds.groupby("qid").map_groups(
        per_question, batch_format="pyarrow"
    )
