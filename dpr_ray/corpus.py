"""Corpus sources in the engine's input shape (BASELINE.json input_hint):

    (repo: string, path: string, commit: string, lang: string, content: string)

Two deterministic sources, no external data:

- ``corpus_from_documents(sf_dir)`` — derives the corpus from the
  driver-generated ``documents.parquet`` table with a pure, SQL-expressible
  row mapping, so DuckDB oracle queries can reconstruct the identical corpus
  from the registered ``documents`` view (see ``corpus_sql()``).
- ``synth_corpus(n_docs, seed)`` — self-synthesized fixture corpus with
  controlled vocabulary: Zipf head-term skew, per-doc rare terms, planted
  answer substrings, unicode/NFD edge cases (FIXTURES.md F1). Used by unit
  tests where we need to know ground truth by construction.

Analogous to DPR's ctx sources (``dpr/data/retriever_data.py:253-287``): each
row is a passage; ``ext_id = repo + "/" + path`` is the id-prefix analog
(``retriever_data.py:280-283``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _map_documents_batch(batch: pa.Table) -> pa.Table:
    """documents row → corpus row. Pure Arrow kernels; mirrored by corpus_sql()."""
    doc_id = batch["doc_id"]
    ids = pc.cast(doc_id, pa.string())
    return pa.table(
        {
            "repo": batch["source"],
            "path": pc.binary_join_element_wise("doc/", ids, ".txt", ""),
            "commit": pc.utf8_lpad(ids, 40, "0"),
            "lang": batch["lang"],
            "content": pc.cast(batch["text"], pa.large_string()),
            "docid": pc.cast(doc_id, pa.uint64()),
        }
    )


def corpus_from_documents(sf_dir: str) -> ray.data.Dataset:
    """Deterministic input_hint-shaped corpus over the documents table.

    ``docid`` is carried from ``doc_id`` (already dense and unique) so the
    DuckDB oracle can address documents without replicating the engine's
    docid-assignment pass.
    """
    from .util import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    return ds.map_batches(_map_documents_batch, batch_format="pyarrow")


CORPUS_SQL = """
SELECT source AS repo,
       'doc/' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
       lpad(CAST(doc_id AS VARCHAR), 40, '0') AS "commit",
       lang,
       text AS content,
       doc_id AS docid
FROM documents
"""


# --- self-synthesized fixture corpus (FIXTURES.md F1) -----------------------

_HEAD_VOCAB = [
    "def", "return", "import", "class", "self", "for", "if", "else", "while",
    "int", "void", "static", "const", "let", "fn", "match", "struct", "impl",
    "print", "len", "range", "list", "dict", "map", "filter", "lambda",
]
_LANGS = ["py", "c", "rs", "md", "go"]
_UNICODE_SPICE = ["café", "café", "naïve", "它的", "ünïcode", "’quote’"]


def synth_corpus_table(n_docs: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic code-like corpus with Zipf head-term skew,
    per-doc rare terms (``rare_tok_{i}``), planted answers
    (``answer_{i % 17}``) and unicode edge cases."""
    rng = np.random.default_rng(seed)
    zipf_w = 1.0 / np.arange(1, len(_HEAD_VOCAB) + 1, dtype=np.float64)
    zipf_w /= zipf_w.sum()
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in range(n_docs):
        n_tok = int(rng.integers(5, 120))
        toks = list(rng.choice(_HEAD_VOCAB, size=n_tok, p=zipf_w))
        toks.append(f"rare_tok_{i}")
        if i % 3 == 0:
            toks.append(f"answer_{i % 17}")
        if i % 11 == 0:
            toks.append(_UNICODE_SPICE[i % len(_UNICODE_SPICE)])
        rng.shuffle(toks)
        repo = f"org{i % 7}/proj{i % 13}"
        path = f"src/file_{i}.{_LANGS[i % len(_LANGS)]}"
        repos.append(repo)
        paths.append(path)
        commits.append(hashlib.sha1(f"{repo}/{path}@{seed}".encode()).hexdigest())
        langs.append(_LANGS[i % len(_LANGS)])
        contents.append(" ".join(toks))
    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.large_string()),
        }
    )


def synth_corpus(n_docs: int, seed: int = 42, parallelism: int = 4) -> ray.data.Dataset:
    tbl = synth_corpus_table(n_docs, seed)
    return ray.data.from_arrow(tbl).repartition(parallelism)
