"""NQ-tables surface (M16/M18/M19/S6): HTML-masked token streams → Table
tree → linearized retrieval chunks, as Ray Data stages.

Reference semantics reproduced exactly:

- ``Cell``/``Row``/``Table`` model with the same stringification (cells
  joined by "| ", table key = "<T>: {caption}\\n rows:\\n row #i: ...")
  — ``dpr/data/biencoder_data.py:183-250``.
- ``NQTableParser`` — stack-based parse of (tokens, html_mask, title):
  nested tables are appended to the enclosing cell and captioned
  "parent_caption | parent cell tokens"; content before the first row
  extends the caption — ``biencoder_data.py:252-337``.
- ``read_nq_tables`` — S6/M19: per-doc parse, "multiple issues" page skip,
  single-non-empty-row filter, exact first-wins dedup by table key, corpus
  counters — ``biencoder_data.py:340-389``. The reference builds one
  driver dict; here parsing is a map_batches over the jsonl rows and dedup
  is a groupby(key) (D1 shape).
- ``linearize_row`` (cells joined ", ", word count) and ``split_table``
  (greedy row packing under ``max_length`` words with the first non-empty
  row repeated as header per chunk) — ``biencoder_data.py:467-501,556-560``.
- ``split_tables_to_chunks`` — M17: 1 table → N (chunk, title) rows —
  ``biencoder_data.py:563-580``. Chunk identity here is (table_key_sha,
  chunk_seq) instead of the reference's run-order global ordinal (a global
  counter is not distribution-stable; the pair is a superset of the
  information and deterministic under any parallelism).
- ``get_table_string_for_answer_check`` — ``biencoder_data.py:393-398``.
"""

from __future__ import annotations

import hashlib
import json
from collections import deque

import pyarrow as pa


class Cell:
    __slots__ = ("value_tokens", "type", "nested_tables")

    def __init__(self):
        self.value_tokens: list[str] = []
        self.type = ""
        self.nested_tables: list["Table"] = []

    def __str__(self):
        return " ".join(self.value_tokens)

    def to_dpr_json(self, cell_idx: int):
        return {"col": cell_idx, "value": str(self)}


class Row:
    __slots__ = ("cells",)

    def __init__(self):
        self.cells: list[Cell] = []

    def __str__(self):
        return "| ".join(str(c) for c in self.cells)

    def to_dpr_json(self, row_idx: int):
        return {
            "row": row_idx,
            "columns": [c.to_dpr_json(i) for i, c in enumerate(self.cells)],
        }


class Table:
    def __init__(self, caption: str = ""):
        self.caption = caption
        self.body: list[Row] = []
        self.key: str | None = None
        self.gold_match = False

    def __str__(self):
        s = "<T>: {}\n".format(self.caption)
        s += " rows:\n"
        for i, r in enumerate(self.body):
            s += " row #{}: {}\n".format(i, str(r))
        return s

    def get_key(self) -> str:
        if not self.key:
            self.key = str(self)
        return self.key

    def non_empty_rows(self) -> int:
        return sum(
            1 for r in self.body
            if r.cells and any(c.value_tokens for c in r.cells)
        )

    def to_dpr_json(self):
        out = {
            "caption": self.caption,
            "rows": [r.to_dpr_json(i) for i, r in enumerate(self.body)],
        }
        if self.gold_match:
            out["gold_match"] = 1
        return out


class NQTableParser:
    """Token/html-mask stream → list of Table (nested tables flattened into
    the result list AND attached to their parent cell)."""

    def __init__(self, tokens, is_html_mask, title):
        self.tokens = tokens
        self.is_html_mask = is_html_mask
        self.title = title
        self.all_tables: list[Table] = []
        self.current_table: Table | None = None
        self.tables_stack: deque = deque()

    def parse(self) -> list[Table]:
        self.all_tables = []
        self.tables_stack = deque()
        for t, is_html in zip(self.tokens, self.is_html_mask):
            if not is_html:
                self._on_content(t)
                continue
            if "<Table" in t:
                self._on_table_start()
            elif t == "</Table>":
                self._on_table_end()
            elif "<Tr" in t:
                self._on_row_start()
            elif "<Td" in t or "<Th" in t:
                self._on_cell_start()
        return self.all_tables

    def _on_table_start(self):
        caption = self.title
        parent = self.current_table
        if parent:
            self.tables_stack.append(parent)
            caption = parent.caption
            if parent.body and parent.body[-1].cells:
                cell = parent.body[-1].cells[-1]
                caption += " | " + " ".join(cell.value_tokens)
        t = Table(caption)
        self.current_table = t
        self.all_tables.append(t)

    def _on_table_end(self):
        t = self.current_table
        if t and self.tables_stack:
            self.current_table = self.tables_stack.pop()
            if self.current_table.body:
                self.current_table.body[-1].cells[-1].nested_tables.append(t)

    def _on_row_start(self):
        self.current_table.body.append(Row())

    def _on_cell_start(self):
        self.current_table.body[-1].cells.append(Cell())

    def _on_content(self, token: str):
        if self.current_table is None:
            return
        if self.current_table.body:
            row = self.current_table.body[-1]
            if row.cells:
                row.cells[-1].value_tokens.append(token)
        else:  # content before the first row extends the caption
            self.current_table.caption += " " + token


_ISSUES_MARKER = "( hide ) This section has multiple issues"

TABLE_SCHEMA = pa.schema(
    [
        ("key_sha", pa.string()),
        ("caption", pa.string()),
        ("table_json", pa.string()),  # to_dpr_json
        ("n_rows", pa.int64()),
        ("kind", pa.string()),  # regular | single_row | issues | nested
    ]
)


def parse_tables_batch(batch: pa.Table) -> pa.Table:
    """(tokens: list<string>, html_mask: list<int>, title) rows → one row
    per parsed table, classified like the reference's counters."""
    out: list[dict] = []
    toks_col = batch["tokens"].to_pylist()
    mask_col = batch["html_mask"].to_pylist()
    title_col = batch["title"].to_pylist()
    for tokens, mask, title in zip(toks_col, mask_col, title_col):
        if _ISSUES_MARKER in " ".join(tokens):
            out.append(
                {"key_sha": "", "caption": title, "table_json": "",
                 "n_rows": 0, "kind": "issues"}
            )
            continue
        tables = NQTableParser(tokens, mask, title).parse()
        for i, t in enumerate(tables):
            kind = "regular" if t.non_empty_rows() > 1 else "single_row"
            if i > 0:
                kind = f"nested_{kind}"
            out.append(
                {
                    "key_sha": hashlib.sha256(
                        t.get_key().encode()
                    ).hexdigest(),
                    "caption": t.caption,
                    "table_json": json.dumps(t.to_dpr_json()),
                    "n_rows": len(t.body),
                    "kind": kind,
                }
            )
    return pa.Table.from_pylist(out, schema=TABLE_SCHEMA)


def read_nq_tables(ds):
    """S6/M19: jsonl-shaped Dataset (tokens, html_mask, title) → deduped
    regular tables Dataset (TABLE_SCHEMA). Nested tables participate like
    the reference (``tables[1:]`` also enter the dict when regular);
    single-row / issue pages are filtered; first-wins dedup by table key."""
    from .._shipping import ensure_shippable

    ensure_shippable()
    parsed = ds.map_batches(parse_tables_batch, batch_format="pyarrow")
    regular = parsed.filter(
        lambda r: r["kind"] in ("regular", "nested_regular")
    )

    def first_wins(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    return regular.groupby("key_sha").map_groups(
        first_wins, batch_format="pyarrow"
    )


def linearize_row(row: dict) -> tuple[str, int]:
    """Reference ``_linearize_row`` (``biencoder_data.py:556-560``):
    cells joined ", "; word count by space-split of each value."""
    values = [c["value"] for c in row["columns"]]
    return ", ".join(values), sum(len(v.split(" ")) for v in values)


def split_table(t: dict, max_length: int) -> list[str]:
    """Reference ``split_table`` (``biencoder_data.py:467-501``): first
    non-empty row becomes the header repeated in every chunk; greedy row
    packing until ``max_length`` words."""
    rows = t["rows"]
    header = None
    header_len = 0
    start_row = 0
    for i, r in enumerate(rows):
        row_lin, row_len = linearize_row(r)
        if len(row_lin) > 1:
            header = row_lin
            header_len += row_len
            start_row = i
            break
    chunks: list[str] = []
    current_rows = [header]
    current_len = header_len
    for i in range(start_row + 1, len(rows)):
        row_lin, row_len = linearize_row(rows[i])
        if len(row_lin) > 1:
            current_rows.append(row_lin)
            current_len += row_len
        if current_len >= max_length:
            chunks.append("\n".join(current_rows) + "\n")
            current_rows = [header]
            current_len = header_len
    if len(current_rows) > 1:
        chunks.append("\n".join(current_rows) + "\n")
    return chunks


def get_table_string_for_answer_check(t: dict) -> str:
    """Reference ``biencoder_data.py:392-398`` (no caption; the trailing
    ``" . "`` after the row loop is part of the contract — an answer
    ending in '.' can match across it)."""
    text = ""
    for r in t["rows"]:
        text += " . ".join(c["value"] for c in r["columns"])
    text += " . "
    return text


def split_tables_to_chunks(tables_ds, max_table_len: int = 100):
    """M17: tables Dataset (TABLE_SCHEMA) → chunk Dataset (table_key_sha,
    chunk_seq, text, title) via a 1→N map_batches — the reference loops a
    driver dict and hands out a global running chunk_id
    (``biencoder_data.py:563-580``); (key_sha, chunk_seq) is the
    parallelism-stable equivalent."""
    from .._shipping import ensure_shippable

    ensure_shippable()

    def to_chunks(batch: pa.Table) -> pa.Table:
        keys, seqs, texts, titles = [], [], [], []
        for key, cap, tj in zip(
            batch["key_sha"].to_pylist(),
            batch["caption"].to_pylist(),
            batch["table_json"].to_pylist(),
        ):
            t = json.loads(tj)
            for s, chunk in enumerate(split_table(t, max_table_len)):
                keys.append(key)
                seqs.append(s)
                texts.append(chunk)
                titles.append(cap)
        return pa.table(
            {
                "table_key_sha": pa.array(keys, pa.string()),
                "chunk_seq": pa.array(seqs, pa.int64()),
                "text": pa.array(texts, pa.large_string()),
                "title": pa.array(titles, pa.string()),
            }
        )

    return tables_ds.map_batches(to_chunks, batch_format="pyarrow")
