"""DPR evaluation surface: answer matching, top-k-hits, ranked results.

Reproduces the reference's validation semantics exactly:

- ``has_answer`` string mode — NFD + SimpleTokenizer both sides, uncased
  contiguous token-subsequence containment (``dpr/data/qa_validation.py:175-193``).
- ``has_answer`` regex mode — ``regex.search`` with IGNORECASE|UNICODE|
  MULTILINE over the NFD text; a bad pattern matches nothing
  (``qa_validation.py:195-210``).
- ``normalize_answer`` — lower, strip punctuation, drop articles, squeeze
  whitespace (``qa_validation.py:218-232``); ``exact_match_score`` equality
  (``qa_validation.py:214-215``).
- ``top_k_hits`` — per query the FIRST hit rank; cumulative counts
  ``top_k_hits[best_hit:] += 1``; accuracy = counts / n_queries
  (``qa_validation.py:72-79``, ``dense_retriever.py:301-315``).
- ``save_results`` — per-question dict with ranked ``ctxs`` (id/title/text/
  score-as-string/has_answer), score-desc (``dense_retriever.py:337-379``).

The per-rank validation runs as a ``map_batches`` stage over the result
Dataset (the reference forks a 16-worker multiprocessing pool with the whole
passage dict copied into each fork — ``qa_validation.py:56-68``; here docs
arrive via the DocJoin stage and answers via a ray.put broadcast).
"""

from __future__ import annotations

import json
import string
import unicodedata

import numpy as np
import pyarrow as pa
import regex as re

from .. import analyzer


def normalize_question(q: str) -> str:
    """Reference ``dpr/utils/data_utils.py:63-65``."""
    return q.replace("’", "'")


def normalize_answer(s: str) -> str:
    # reference order (qa_validation.py:218-232): lower → strip punctuation
    # → remove articles → squeeze whitespace
    s = s.lower()
    s = "".join(ch for ch in s if ch not in frozenset(string.punctuation))
    s = re.sub(r"\b(a|an|the)\b", " ", s)
    return " ".join(s.split())


def exact_match_score(prediction: str, ground_truth: str) -> bool:
    return normalize_answer(prediction) == normalize_answer(ground_truth)


def has_answer_string(answers: list[str], text: str) -> bool:
    text_toks = analyzer.tokenize(text)
    for a in answers:
        a_toks = analyzer.tokenize(a)
        if a_toks and analyzer.is_subsequence(a_toks, text_toks):
            return True
    return False


def has_answer_regex(answers: list[str], text: str) -> bool:
    text = unicodedata.normalize("NFD", text)
    for a in answers:
        # the PATTERN is NFD-normalized too (qa_validation.py:197-198
        # runs _normalize(single_answer) before regex_match): a composed
        # 'café' pattern would never match the decomposed text
        a = unicodedata.normalize("NFD", a)
        try:
            pat = re.compile(a, flags=re.IGNORECASE + re.UNICODE + re.MULTILINE)
        except Exception:
            # any compile failure matches nothing (regex_match catches
            # BaseException; re.error alone missed e.g. TypeError/
            # RecursionError from pathological patterns)
            continue
        if pat.search(text) is not None:
            return True
    return False


def normalize_kilt(s: str) -> str:
    """Reference ``qa_validation.py:298-314`` (same pipeline as
    normalize_answer: lower → strip punctuation → drop articles → squeeze)."""
    return normalize_answer(s)


def has_answer_kilt(answers: list[str], text: str) -> bool:
    """KILT match mode: normalized substring containment
    (``qa_validation.py:288-294``)."""
    text = normalize_kilt(text)
    return any(normalize_kilt(a) in text for a in answers if a)


class AttachHasAnswer:
    """map_batches stage: result rows (qid, ..., content) → + has_answer.

    ``answers_ref`` is a ray.put of {qid: [answer, ...]} — broadcast once,
    fetched per actor/task in __init__, never re-shipped per batch."""

    def __init__(self, answers_ref, match: str = "string"):
        import ray

        self.answers = ray.get(answers_ref) if answers_ref is not None else {}
        self.match = match

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["qid"].to_pylist()
        texts = batch["content"].to_pylist()
        fn = {
            "string": has_answer_string,
            "regex": has_answer_regex,
            "kilt": has_answer_kilt,
        }[self.match]
        flags = [
            fn(self.answers.get(qid, []), text) for qid, text in zip(qids, texts)
        ]
        return batch.append_column("has_answer", pa.array(flags, pa.bool_()))


def top_k_hits(results_ds, n_queries: int, k: int):
    """Cumulative hits@1..k over a result Dataset that carries (qid, rank,
    has_answer). Distributed partial+final: per-block histogram of first-hit
    ranks, summed on the driver (the per-qid reduce is a groupby)."""
    import pyarrow.compute as pc_

    def best_hit(group: pa.Table) -> pa.Table:
        ranks = group["rank"].to_numpy(zero_copy_only=False)
        hits = group["has_answer"].to_numpy(zero_copy_only=False)
        hit_ranks = ranks[hits]
        best = int(hit_ranks.min()) if len(hit_ranks) else 0  # 1-based; 0 = none
        return pa.table({"qid": group["qid"][:1], "best_hit": pa.array([best], pa.int32())})

    bh = results_ds.groupby("qid").map_groups(best_hit, batch_format="pyarrow")
    counts = np.zeros(k, dtype=np.int64)
    for b in bh.iter_batches(batch_format="pyarrow"):
        ranks = b["best_hit"].to_numpy(zero_copy_only=False)
        ranks = ranks[(ranks > 0) & (ranks <= k)]
        np.add.at(counts, ranks - 1, 1)
    cum = np.cumsum(counts)
    return {
        "n_queries": n_queries,
        "top_k_hits": cum.tolist(),
        "top_k_accuracy": (cum / max(1, n_queries)).tolist(),
    }


def assemble_results(results_ds, answers_ref=None):
    """Result Dataset (qid, question, rank, docid, score, ext_id, title,
    content, has_answer) → per-question Dataset matching the reference's
    output JSON schema (``dense_retriever.py:356-369``; FIXTURES.md F5):
    {question, answers, ctxs: [{id, title, text, score, has_answer}]}
    with ctxs score-desc and score stringified at 6 decimals."""
    import ray

    answers = ray.get(answers_ref) if answers_ref is not None else {}

    def per_question(group: pa.Table) -> pa.Table:
        rows = sorted(group.to_pylist(), key=lambda r: r["rank"])
        qid = rows[0]["qid"]
        ctxs = [
            {
                "id": r["ext_id"],
                "title": r["title"],
                "text": r["content"],
                "score": f"{r['score']:.6f}",
                "has_answer": bool(r["has_answer"]),
            }
            for r in rows
        ]
        return pa.table(
            {
                "qid": pa.array([qid]),
                "question": pa.array([rows[0]["question"]]),
                "answers": pa.array([answers.get(qid, [])], pa.list_(pa.string())),
                "ctxs": pa.array([json.dumps(ctxs)]),
            }
        )

    return results_ds.groupby("qid").map_groups(per_question, batch_format="pyarrow")


def save_results(results_ds, out_path: str, answers_ref=None) -> int:
    """Write the reference-shaped results JSON (single file, like
    ``save_results`` — small per-query output, safe to stream to driver)."""
    assembled = assemble_results(results_ds, answers_ref)
    out = []
    for b in assembled.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            out.append(
                {
                    "question": r["question"],
                    "answers": r["answers"],
                    "ctxs": json.loads(r["ctxs"]),
                }
            )
    out.sort(key=lambda r: r["question"])
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    return len(out)
