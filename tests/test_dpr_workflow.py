"""The 'switching user' integration test: the reference's CLI workflow —
ctx TSV source → index build → QA TSV query set → top-k retrieval →
has_answer validation → top-k-hits metrics → ranked results JSON — run
end-to-end on this engine with the same file shapes DPR consumes
(``dense_retriever.py`` main path; SURVEY §3.2)."""

import json

import pytest


@pytest.mark.parametrize("method", ["taat", "bmw"])
def test_dpr_style_workflow(ray_session, tmp_path, method):
    import ray.data

    from dpr_ray.index.build import build_index
    from dpr_ray.pipelines import retrieve_and_evaluate
    from dpr_ray.sources.qa_sources import read_ctx_tsv, read_qa_csv

    # 1. passage TSV exactly as DPR's CsvCtxSrc reads it (id\ttext\ttitle)
    ctx = tmp_path / "psgs.tsv"
    rows = ["id\ttext\ttitle"]
    for i in range(30):
        marker = f"special answer{i % 5} token" if i % 2 == 0 else "plain filler"
        rows.append(f'{i}\t"passage {i} has {marker} words here"\tTitle {i}')
    ctx.write_text("\n".join(rows) + "\n")

    # 2. QA TSV as DPR's CsvQASrc reads it (question \t answers-literal)
    qa = tmp_path / "qa.tsv"
    qa.write_text(
        'where is answer0\t["answer0"]\n'
        "find answer3 please\t['answer3']\n"
        'nothing here matches\t["qqqq zzzz"]\n'
    )

    corpus = ray.data.from_arrow(read_ctx_tsv(str(ctx), id_prefix="wiki:"))
    index_dir = str(tmp_path / "idx")
    stats = build_index(corpus, index_dir, docid_strategy="hash64")
    assert stats["N"] == 30

    queries = read_qa_csv(str(qa))
    out_json = str(tmp_path / "results.json")
    res, metrics = retrieve_and_evaluate(
        queries, index_dir, k=10, method=method, out_json=out_json
    )

    # planted answers are retrievable and validated
    assert metrics["n_queries"] == 3
    assert metrics["top_k_hits"][-1] == 2  # two queries hit, one cannot
    data = json.load(open(out_json))
    by_q = {d["question"]: d for d in data}
    assert by_q["where is answer0"]["ctxs"][0]["has_answer"] is True
    top_ctx = by_q["where is answer0"]["ctxs"][0]
    assert top_ctx["id"].startswith("wiki/")  # id-prefix namespace survived
    assert top_ctx["title"].startswith("wiki/")
    # scores are 6-decimal strings in descending order (F5 format)
    scores = [float(c["score"]) for c in by_q["find answer3 please"]["ctxs"]]
    assert scores == sorted(scores, reverse=True)
    assert all("." in c["score"] for c in by_q["where is answer0"]["ctxs"])
