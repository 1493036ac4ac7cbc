"""NQ-tables parity (M16/M17/M18/M19/S6) vs reference
``dpr/data/biencoder_data.py``: parser nesting/caption semantics, key
stringification, dedup + filtering pipeline, linearization and chunk
packing."""

import json

import pyarrow as pa

from dpr_ray.stages import tables as T


def _stream(pairs):
    toks = [p[0] for p in pairs]
    mask = [p[1] for p in pairs]
    return toks, mask


def _simple_table_stream(cells_by_row, extra=()):
    pairs = [("<Table>", 1)]
    for row in cells_by_row:
        pairs.append(("<Tr>", 1))
        for cell in row:
            pairs.append(("<Td>", 1))
            pairs.extend((tok, 0) for tok in cell.split())
            pairs.append(("</Td>", 1))
        pairs.append(("</Tr>", 1))
    pairs.extend(extra)
    pairs.append(("</Table>", 1))
    return pairs


def test_parser_basic_and_key():
    toks, mask = _stream(_simple_table_stream([["a b", "c"], ["d", "e"]]))
    tables = T.NQTableParser(toks, mask, "Ti").parse()
    assert len(tables) == 1
    t = tables[0]
    assert t.caption == "Ti"
    assert [str(r) for r in t.body] == ["a b| c", "d| e"]
    # reference key format (biencoder_data.py:218-228)
    assert t.get_key() == "<T>: Ti\n rows:\n row #0: a b| c\n row #1: d| e\n"
    assert t.non_empty_rows() == 2


def test_parser_caption_prefix_content():
    # content before the first row extends the caption (biencoder_data.py:335-337)
    pairs = [("<Table>", 1), ("intro", 0), ("words", 0)]
    pairs += _simple_table_stream([["x"]])[1:]  # reuse row part + </Table>
    toks, mask = _stream(pairs)
    t = T.NQTableParser(toks, mask, "Cap").parse()[0]
    assert t.caption == "Cap intro words"


def test_parser_nested_table():
    inner = _simple_table_stream([["i1", "i2"], ["i3", "i4"]])
    pairs = [("<Table>", 1), ("<Tr>", 1), ("<Td>", 1), ("outer", 0)]
    pairs += inner
    pairs += [("</Td>", 1), ("</Tr>", 1), ("</Table>", 1)]
    toks, mask = _stream(pairs)
    tables = T.NQTableParser(toks, mask, "Top").parse()
    assert len(tables) == 2
    outer, nested = tables
    # nested caption = parent caption + " | " + enclosing cell tokens
    assert nested.caption == "Top | outer"
    # nested table attached to the enclosing cell
    assert outer.body[0].cells[0].nested_tables == [nested]


def test_read_nq_tables_pipeline(ray_session):
    import ray.data

    def stream_row(cells, title):
        toks, mask = _stream(_simple_table_stream(cells))
        return {"tokens": toks, "html_mask": mask, "title": title}

    rows = [
        stream_row([["a", "b"], ["c", "d"]], "t1"),
        stream_row([["a", "b"], ["c", "d"]], "t1"),   # exact dup → dedup
        stream_row([["only one row"]], "single"),     # filtered
        {
            "tokens": "( hide ) This section has multiple issues".split(),
            "html_mask": [0] * 8,
            "title": "bad",
        },                                            # issues page → skipped
        stream_row([["x", "y"], ["z", "w"]], "t2"),
    ]
    out = T.read_nq_tables(ray.data.from_items(rows)).to_pandas()
    assert len(out) == 2  # t1 (deduped) + t2
    assert set(out["caption"]) == {"t1", "t2"}


def test_linearize_and_split():
    t = {
        "caption": "cap",
        "rows": [
            {"row": 0, "columns": [{"col": 0, "value": "h1 h2"},
                                   {"col": 1, "value": "h3"}]},
            {"row": 1, "columns": [{"col": 0, "value": "a b c"},
                                   {"col": 1, "value": "d"}]},
            {"row": 2, "columns": [{"col": 0, "value": "e f"},
                                   {"col": 1, "value": "g"}]},
        ],
    }
    lin, n = T.linearize_row(t["rows"][0])
    assert lin == "h1 h2, h3" and n == 3
    # max_length 7: header(3) + row1(4) = 7 ≥ 7 → chunk; header + row2(3) → tail
    chunks = T.split_table(t, 7)
    assert chunks == ["h1 h2, h3\na b c, d\n", "h1 h2, h3\ne f, g\n"]
    # trailing " . " is the reference contract (biencoder_data.py:396,
    # appended AFTER the row loop): an answer ending in '.' can match
    # across it
    assert T.get_table_string_for_answer_check(t) == (
        "h1 h2 . h3a b c . de f . g . "
    )


def test_split_tables_to_chunks_ds(ray_session):
    import ray.data

    toks, mask = _stream(
        _simple_table_stream([["h1 h2", "h3"], ["a b c", "d"], ["e f", "g"]])
    )
    tbls = T.read_nq_tables(
        ray.data.from_items([{"tokens": toks, "html_mask": mask, "title": "x"}])
    )
    chunks = T.split_tables_to_chunks(tbls, max_table_len=7).to_pandas()
    assert list(chunks["chunk_seq"]) == [0, 1]
    assert chunks.loc[0, "text"].startswith("h1 h2, h3\n")
    assert set(chunks["title"]) == {"x"}
