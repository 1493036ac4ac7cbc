"""File → passage chunking (the code-corpus analog of DPR's table→chunk
splitting, ``split_tables_to_chunks`` / ``split_table``,
``dpr/data/biencoder_data.py:467-501,563-580``): a document longer than
``max_words`` tokens becomes ceil(n/max_words) passages with a running
``chunk_seq``; DPR repeats the table header per chunk — the analog here is
prefixing each chunk with the file's title when ``prefix_title=True``.

flat_map shape: 1 row → N rows, expressed as a map_batches that returns
more rows than it received (vectorized, no ds.flat_map per-row calls).
"""

from __future__ import annotations

import pyarrow as pa

from .. import analyzer
from .._shipping import ensure_shippable


class ChunkDocuments:
    def __init__(
        self,
        max_words: int = 100,
        id_col: str = "docid",
        text_col: str = "content",
        title_col: str | None = None,
        prefix_title: bool = False,
    ):
        self.max_words = max_words
        self.id_col = id_col
        self.text_col = text_col
        self.title_col = title_col
        self.prefix_title = prefix_title

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        titles = (
            batch[self.title_col].to_pylist()
            if self.title_col and self.prefix_title
            else None
        )
        out_id, out_seq, out_text, out_n = [], [], [], []
        w = self.max_words
        for i, toks in enumerate(
            analyzer.tokenize_batch(batch[self.text_col].to_pylist())
        ):
            n = len(toks)
            seq = 0
            for s in range(0, max(n, 1), w):
                chunk = toks[s : s + w]
                text = " ".join(chunk)
                if titles is not None:
                    text = f"{titles[i]} {text}" if text else titles[i]
                out_id.append(ids[i])
                out_seq.append(seq)
                out_text.append(text)
                out_n.append(len(chunk))
                seq += 1
        return pa.table(
            {
                "docid": pa.array(out_id, pa.int64()),
                "chunk_seq": pa.array(out_seq, pa.int64()),
                "chunk_text": pa.array(out_text, pa.string()),
                "n_words": pa.array(out_n, pa.int64()),
            }
        )


def chunk_documents(ds, **kwargs):
    ensure_shippable()
    return ds.map_batches(ChunkDocuments(**kwargs), batch_format="pyarrow")
