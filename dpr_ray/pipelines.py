"""End-to-end retrieval pipelines (the ``dense_retriever.py`` main-path
analog, SURVEY §3.2): queries → top-k → doc join → has_answer → metrics +
ranked results JSON."""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data

from ._shipping import ensure_shippable
from .config import DEFAULT_TOP_K
from .eval import qa
from .query.executor import search_pipeline
from .util import auto_pool


def retrieve_and_evaluate(
    queries: pa.Table,
    index_dir: str,
    k: int = DEFAULT_TOP_K,
    match: str = "string",
    method: str = "taat",
    out_json: str | None = None,
    concurrency=None,
):
    """queries table (qid, question, answers) → (result Dataset, metrics).

    Result Dataset rows: qid, question, rank, docid, score, ext_id, title,
    content, has_answer — the flattened form of the reference's output JSON.
    Metrics replicate ``top_k_hits`` accuracy (``qa_validation.py:72-79``).
    """
    ensure_shippable()
    answers_map = {
        qid: ans
        for qid, ans in zip(
            queries["qid"].to_pylist(), queries["answers"].to_pylist()
        )
    }
    answers_ref = ray.put(answers_map)
    qds = ray.data.from_arrow(queries.select(["qid", "question"]))
    res = search_pipeline(
        qds, index_dir, k=k, method=method, concurrency=concurrency,
        with_docs=True, doc_columns=["ext_id", "title", "content"],
    )
    res = res.map_batches(
        qa.AttachHasAnswer,
        fn_constructor_kwargs={"answers_ref": answers_ref, "match": match},
        batch_format="pyarrow",
        concurrency=auto_pool(0.5),
    )
    # result set is query-scale (n_queries × k rows): pin it so metrics and
    # the results sink don't recompute the whole retrieval
    res = res.materialize()
    metrics = qa.top_k_hits(res, n_queries=queries.num_rows, k=k)
    if out_json:
        qa.save_results(res, out_json, answers_ref)
    return res, metrics
