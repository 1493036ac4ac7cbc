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
