"""Eval surface: has_answer semantics, top_k_hits metric conformance
(FIXTURES.md F8), sources, end-to-end retrieve_and_evaluate."""

import json

import pyarrow as pa
import pytest

from dpr_ray.eval import qa


def test_normalize_answer_reference_order():
    # lower → strip punct → articles → squeeze (qa_validation.py:218-232)
    assert qa.normalize_answer("The  Cat!") == "cat"
    assert qa.normalize_answer("a.b") == "ab"  # punct gone BEFORE article pass
    assert qa.normalize_answer("An apple") == "apple"


def test_exact_match():
    assert qa.exact_match_score("The Cat", "cat!")
    assert not qa.exact_match_score("a cat", "a dog")


def test_has_answer_string_token_subsequence():
    assert qa.has_answer_string(["big cat"], "one big cat sat")
    assert not qa.has_answer_string(["big sat"], "one big cat sat")
    # uncased + NFD
    assert qa.has_answer_string(["CAFÉ"], "best café here")
    # punctuation tokens must align
    assert qa.has_answer_string(["it's"], "so it's done")
    assert not qa.has_answer_string([""], "anything")


def test_has_answer_regex():
    assert qa.has_answer_regex([r"ca[tf]é?"], "the café")
    assert not qa.has_answer_regex([r"^xyz$"], "abc")
    assert not qa.has_answer_regex([r"(unclosed"], "anything (unclosed here")


def test_top_k_hits_vectors(ray_session):
    """F8: hand-built hit matrices with known cumulative outputs."""
    import ray.data

    rows = []
    # q0: first hit at rank 2; q1: no hits; q2: hit at rank 1 (also rank 3)
    hits = {"q0": [False, True, False], "q1": [False] * 3, "q2": [True, False, True]}
    for qid, flags in hits.items():
        for r, h in enumerate(flags, start=1):
            rows.append({"qid": qid, "rank": r, "has_answer": h})
    ds = ray.data.from_items(rows)
    m = qa.top_k_hits(ds, n_queries=3, k=3)
    assert m["top_k_hits"] == [1, 2, 2]
    assert m["top_k_accuracy"] == [1 / 3, 2 / 3, 2 / 3]


def test_sources_roundtrip(tmp_path):
    from dpr_ray.sources import qa_sources as src

    csv_p = tmp_path / "qa.tsv"
    csv_p.write_text('who is x\t["a", "b c"]\nwhat’s y\t["z"]\n')
    t = src.read_qa_csv(str(csv_p))
    assert t.num_rows == 2
    assert t["answers"][0].as_py() == ["a", "b c"]
    assert t["question"][1].as_py() == "what's y"  # normalize_question

    jl = tmp_path / "qa.jsonl"
    jl.write_text(
        json.dumps({"id": "7", "question": "q1", "answers": ["x"]})
        + "\n"
        + json.dumps({"question": "q2", "answers": []})
        + "\n"
    )
    t2 = src.read_qa_jsonl(str(jl))
    assert t2["qid"].to_pylist() == ["7", "q1"]

    kl = tmp_path / "kilt.jsonl"
    kl.write_text(
        json.dumps({"id": "k1", "input": "kq", "output": [{"answer": "a1"}, {"provenance": []}]})
        + "\n"
    )
    t3 = src.read_kilt_jsonl(str(kl))
    assert t3["answers"][0].as_py() == ["a1"]

    ctx = tmp_path / "ctx.tsv"
    ctx.write_text('id\ttext\ttitle\n1\t"hello world"\tT1\n2\tplain\tT2\n')
    c = src.read_ctx_tsv(str(ctx), id_prefix="wiki:")
    assert c.num_rows == 2
    assert c["content"][0].as_py() == "hello world"  # quotes stripped
    assert c["repo"][0].as_py() == "wiki"


@pytest.mark.parametrize("match", ["string", "regex"])
def test_retrieve_and_evaluate_end_to_end(ray_session, tmp_path, match):
    import ray.data

    from dpr_ray import corpus as corpus_mod
    from dpr_ray.index.build import build_index
    from dpr_ray.pipelines import retrieve_and_evaluate

    tbl = corpus_mod.synth_corpus_table(90, seed=5)
    index_dir = str(tmp_path / "idx")
    build_index(
        ray.data.from_arrow(tbl).repartition(3), index_dir, docid_strategy="hash64"
    )
    # planted: docs with i % 3 == 0 contain "answer_{i%17}"
    queries = pa.table(
        {
            "qid": pa.array(["q0", "q1"]),
            "question": pa.array(["answer_0", "no_such_term_xq"]),
            "answers": pa.array(
                [["answer_0"], ["nothing matches this"]], pa.list_(pa.string())
            ),
        }
    )
    out_json = str(tmp_path / "results.json")
    res, metrics = retrieve_and_evaluate(
        queries, index_dir, k=10, match=match, out_json=out_json
    )
    assert metrics["n_queries"] == 2
    # q0's planted answer must be found at rank 1 (its docs contain the term)
    assert metrics["top_k_hits"][0] >= 1
    data = json.load(open(out_json))
    assert len(data) == 1 or len(data) == 2  # q1 may return 0 ctxs → dropped by groupby
    q0 = [d for d in data if d["question"] == "answer_0"][0]
    assert q0["ctxs"][0]["has_answer"] is True
    scores = [float(c["score"]) for c in q0["ctxs"]]
    assert scores == sorted(scores, reverse=True)
