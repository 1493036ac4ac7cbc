"""Compressed-meta validation, answer spans, chunk-level hits, biencoder
training-sample reader."""

import json

import pyarrow as pa

from dpr_ray.eval import spans


def test_find_answer_spans():
    p = "a b c a b".split()
    assert spans.find_answer_spans(p, ["a", "b"]) == [(0, 1), (3, 4)]
    assert spans.find_answer_spans(p, ["c"]) == [(2, 2)]
    assert spans.find_answer_spans(p, ["z"]) == []
    assert spans.find_answer_spans(p, []) == []


def test_find_answer_spans_text_unicode():
    got = spans.find_answer_spans_text("the Café is open", "café")
    assert got == [(1, 1)]


def test_attach_meta_roundtrip_and_match(ray_session):
    import ray

    from dpr_ray.eval.meta import AttachHasAnswerFromMeta, attach_meta

    batch = pa.table(
        {
            "qid": ["q0", "q1"],
            "title": ["T ans0", "T2"],
            "content": ["body text here", "other text"],
        }
    )
    with_meta = attach_meta(batch)
    ans_ref = ray.put({"q0": ["ans0"], "q1": ["zzz"]})
    out = AttachHasAnswerFromMeta(ans_ref)(with_meta).to_pylist()
    # q0's answer appears only in the TITLE — meta path prepends it
    assert out[0]["has_answer"] is True
    assert out[1]["has_answer"] is False


def test_chunk_level_hits(ray_session):
    import ray.data

    rows = [
        # doc A: chunk hit at rank 3; doc A also misses at rank 1
        {"qid": "q", "rank": 1, "has_answer": False, "parent_docid": "A"},
        {"qid": "q", "rank": 3, "has_answer": True, "parent_docid": "A"},
        # doc B: no hits
        {"qid": "q", "rank": 2, "has_answer": False, "parent_docid": "B"},
    ]
    out = spans.chunk_level_hits(ray.data.from_items(rows)).to_pandas()
    got = {r.parent: r.best_hit for r in out.itertuples()}
    assert got == {"A": 3, "B": 0}


def test_read_biencoder_json(tmp_path):
    from dpr_ray.sources.qa_sources import read_biencoder_json

    p = tmp_path / "train.json"
    p.write_text(
        json.dumps(
            [
                {
                    "question": "q with pos",
                    "answers": ["a"],
                    "positive_ctxs": [{"title": "t", "text": "x"}],
                    "negative_ctxs": [],
                    "hard_negative_ctxs": [{"title": "h", "text": "y"}],
                },
                {"question": "no positives", "answers": [], "positive_ctxs": []},
            ]
        )
    )
    t = read_biencoder_json(str(p))
    assert t.num_rows == 1  # positive-ctx filter (biencoder_data.py:77-78)
    assert t["hard_negative_ctxs"][0][0]["title"].as_py() == "h"
    t2 = read_biencoder_json(str(p), require_positive=False)
    assert t2.num_rows == 2


def test_meta_title_separator_blocks_boundary_spans():
    """The reference's ' . ' title separator (qa_validation.py:167) is
    load-bearing: a string answer spanning the title/text boundary must
    NOT count as a contiguous token subsequence. A plain space joined
    'New York' + 'City council' into a false 'York City' hit."""
    import ray

    from dpr_ray.eval.meta import AttachHasAnswerFromMeta, attach_meta

    tbl = pa.table(
        {
            "qid": ["q1"],
            "title": ["New York"],
            "content": ["City council met today"],
        }
    )
    tbl = attach_meta(tbl)
    ref = ray.put({"q1": ["York City"]})
    out = AttachHasAnswerFromMeta(ref, match="string")(tbl)
    assert out["has_answer"].to_pylist() == [False]
    # sanity: an answer inside the text still matches
    ref2 = ray.put({"q1": ["city council"]})
    out2 = AttachHasAnswerFromMeta(ref2, match="string")(tbl)
    assert out2["has_answer"].to_pylist() == [True]
    # unknown match mode is LOUD, not silently-regex
    import pytest

    with pytest.raises(KeyError):
        AttachHasAnswerFromMeta(ref, match="kilt")(tbl)


def test_has_answer_regex_normalizes_pattern():
    """The regex PATTERN is NFD-normalized like the text
    (qa_validation.py:197-198 _normalize(single_answer)): a composed
    'café' pattern must match a passage containing café in any form."""
    import unicodedata

    from dpr_ray.eval.qa import has_answer_regex

    composed = unicodedata.normalize("NFC", "café")
    decomposed = unicodedata.normalize("NFD", "café")
    assert has_answer_regex([composed], f"le {decomposed} est bon")
    assert has_answer_regex([composed], f"le {composed} est bon")
    # a malformed pattern matches nothing rather than raising
    assert not has_answer_regex(["([unclosed"], "anything")
