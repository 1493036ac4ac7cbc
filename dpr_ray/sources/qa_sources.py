"""DPR-shaped query and passage sources (SURVEY §2.1 S1-S6).

Query sets are small (NQ test = 3,610 rows), so parsing happens driver-side
with pyarrow and the result becomes a Dataset; the corpus-scale readers
(parquet) live in ``dpr_ray.corpus``.

- ``read_qa_csv`` — TSV (question \t answers-as-python-literal [\t id]),
  mirrors ``CsvQASrc`` (``dpr/data/retriever_data.py:79-124``) including the
  selector range slice; uses ``ast.literal_eval`` instead of the reference's
  ``eval`` (``retriever_data.py:110``).
- ``read_qa_jsonl`` — JSONL with configurable attribute names, mirrors
  ``JsonlQASrc`` (``retriever_data.py:127-154``).
- ``read_kilt_jsonl`` — answers nested under ``output[].answer``, mirrors
  ``KiltJsonlQASrc`` (``retriever_data.py:208-220``).
- ``read_ctx_tsv`` — passage TSV ``id \t text \t title`` with header-row
  value check and quote stripping, mirrors ``CsvCtxSrc``
  (``retriever_data.py:270-287``); emits input_hint-shaped corpus rows.

Every question passes ``normalize_question`` (``data_utils.py:63-65``).
Missing ids become ``q<row>`` (the reference keys results by position).
"""

from __future__ import annotations

import ast
import csv
import json

import pyarrow as pa

from ..eval.qa import normalize_question


def _qa_table(ids, questions, answers) -> pa.Table:
    return pa.table(
        {
            "qid": pa.array([str(i) for i in ids], pa.string()),
            "question": pa.array([normalize_question(q) for q in questions]),
            "answers": pa.array(answers, pa.list_(pa.string())),
        }
    )


def read_qa_csv(
    path: str,
    question_col: int = 0,
    answers_col: int = 1,
    id_col: int = -1,
    selector_start: int | None = None,
    selector_end: int | None = None,
) -> pa.Table:
    ids, questions, answers = [], [], []
    with open(path, newline="") as f:
        for i, row in enumerate(csv.reader(f, delimiter="\t")):
            if not row:
                continue
            q = row[question_col]
            # deliberate divergence from the reference's bare
            # eval(row[1]) (retriever_data.py:110): a literal that is
            # not a list/tuple becomes ONE answer — the reference would
            # crash on an int cell and silently iterate a quoted string
            # cell character by character; a non-literal cell falls back
            # to the raw string (the reference crashes there too)
            try:
                parsed = ast.literal_eval(row[answers_col])
            except (ValueError, SyntaxError):
                parsed = None
            if isinstance(parsed, (list, tuple)):
                ans = [str(a) for a in parsed]
            elif parsed is not None:
                ans = [str(parsed)]
            else:
                ans = [row[answers_col]]
            qid = row[id_col] if 0 <= id_col < len(row) else f"q{i}"
            ids.append(qid)
            questions.append(q)
            answers.append(ans)
    tbl = _qa_table(ids, questions, answers)
    if selector_start is not None or selector_end is not None:
        tbl = tbl.slice(
            selector_start or 0,
            (selector_end - (selector_start or 0)) if selector_end else None,
        )
    return tbl


def read_qa_jsonl(
    path: str,
    question_attr: str = "question",
    answers_attr: str = "answers",
    id_attr: str = "id",
) -> pa.Table:
    ids, questions, answers = [], [], []
    with open(path) as f:
        for i, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            ids.append(obj.get(id_attr, f"q{i}"))
            questions.append(obj[question_attr])
            answers.append([str(a) for a in obj.get(answers_attr, [])])
    return _qa_table(ids, questions, answers)


def read_kilt_jsonl(path: str) -> pa.Table:
    ids, questions, answers = [], [], []
    with open(path) as f:
        for i, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            ids.append(obj.get("id", f"q{i}"))
            questions.append(obj["input"])
            answers.append(
                [
                    str(o["answer"])
                    for o in obj.get("output", [])
                    if "answer" in o
                ]
            )
    return _qa_table(ids, questions, answers)


def read_biencoder_json(path: str, require_positive: bool = True) -> pa.Table:
    """Biencoder training-sample JSON (reference ``JsonQADataset``,
    ``dpr/data/biencoder_data.py:81-108``; FIXTURES.md F6): rows without a
    positive context are filtered (``biencoder_data.py:77-78``). Nested ctx
    pools become Arrow list<struct<title, text>> columns — the training-ETL
    part of the reference that stays in engine scope."""
    with open(path) as f:
        data = json.load(f)
    ctx_t = pa.list_(
        pa.struct([("title", pa.string()), ("text", pa.string())])
    )

    def pool(sample, key):
        return [
            {"title": c.get("title", ""), "text": c.get("text", "")}
            for c in sample.get(key, [])
        ]

    rows = [
        s for s in data
        if not require_positive or len(s.get("positive_ctxs", [])) > 0
    ]
    return pa.table(
        {
            "question": pa.array(
                [normalize_question(s["question"]) for s in rows]
            ),
            "answers": pa.array(
                [[str(a) for a in s.get("answers", [])] for s in rows],
                pa.list_(pa.string()),
            ),
            "positive_ctxs": pa.array(
                [pool(s, "positive_ctxs") for s in rows], ctx_t
            ),
            "negative_ctxs": pa.array(
                [pool(s, "negative_ctxs") for s in rows], ctx_t
            ),
            "hard_negative_ctxs": pa.array(
                [pool(s, "hard_negative_ctxs") for s in rows], ctx_t
            ),
        }
    )


def read_ctx_tsv(path: str, id_prefix: str = "") -> pa.Table:
    """Passage TSV → input_hint corpus rows. The external id becomes
    ``repo=<id_prefix.rstrip(':') or 'ctx'>``, ``path=<id>`` so
    ``ext_id = repo + "/" + path`` keeps the reference's prefixed-id
    semantics (``retriever_data.py:280-283``)."""
    repos, paths, commits, langs, contents, titles = [], [], [], [], [], []
    repo = (id_prefix.rstrip(":") or "ctx") if id_prefix else "ctx"
    with open(path, newline="") as f:
        for row in csv.reader(f, delimiter="\t"):
            if not row or row[0] == "id":  # header-row value check
                continue
            pid, text, title = row[0], row[1], row[2]
            # strip('"') like the reference (retriever_data.py:284):
            # removes ALL leading/trailing quotes, asymmetric included —
            # a one-pair strip kept '"Darth' verbatim and indexed the
            # quote, diverging from the reference corpus
            text = text.strip('"')
            repos.append(repo)
            paths.append(pid)
            commits.append("0" * 40)
            langs.append("text")
            contents.append(text)
            titles.append(title)
    return pa.table(
        {
            "repo": pa.array(repos),
            "path": pa.array(paths),
            "commit": pa.array(commits),
            "lang": pa.array(langs),
            "content": pa.array(contents, pa.large_string()),
            "title": pa.array(titles),
        }
    )
