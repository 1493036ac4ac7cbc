"""Reader ETL (M20/J3) semantics vs the reference's
``preprocess_retriever_data`` (``dpr/data/reader_data.py:234-317``):
pos/neg selection, span shifting by |question ⊕ title|, skip-no-positives,
gold-page-only preference and gold injection, eval-mode capping."""

import json

import pyarrow as pa
import pytest


def _results_table(rows):
    return pa.table(
        {
            "qid": pa.array([r[0] for r in rows]),
            "question": pa.array([r[1] for r in rows]),
            "rank": pa.array([r[2] for r in rows], pa.int64()),
            "docid": pa.array([r[3] for r in rows], pa.int64()),
            "title": pa.array([r[4] for r in rows]),
            "content": pa.array([r[5] for r in rows]),
        }
    )


@pytest.fixture()
def etl(ray_session):
    import ray

    from dpr_ray.eval import reader_etl as m

    def run(rows, answers, **kw):
        import ray.data

        ds = ray.data.from_arrow(_results_table(rows))
        out = m.preprocess_retriever_results(
            ds, ray.put(answers), **kw
        ).to_pandas()
        if out.empty:
            return out
        return out.sort_values(["qid", "rank"]).reset_index(drop=True)

    return run


def test_spans_shift_and_roles(etl):
    rows = [
        # question "x y" (2 toks), title "t" (1 tok) → shift 3
        ("q1", "x y", 1, 10, "t", "a b c a b"),   # spans of "a b" at 0 and 3
        ("q1", "x y", 2, 11, "t", "c c c"),       # no span → negative
    ]
    out = etl(rows, {"q1": ["a b"]})
    assert list(out["role"]) == ["pos", "neg"]
    pos = out.iloc[0]
    assert pos["passage_offset"] == 3
    assert pos["n_spans"] == 2
    assert (pos["span0_start"], pos["span0_end"]) == (3, 4)  # 0-based + shift
    neg = out.iloc[1]
    assert neg["n_spans"] == 0 and neg["span0_start"] == -1


def test_skip_no_positives(etl):
    rows = [("q1", "x", 1, 10, "t", "c c c")]
    out = etl(rows, {"q1": ["zz"]})
    assert len(out) == 0  # whole sample dropped (reader_data.py:301-304)


def test_eval_mode_no_positives_selected(etl):
    rows = [("q1", "x", r, 10 + r, "t", "a b") for r in range(1, 4)]
    out = etl(rows, {"q1": ["a b"]}, is_train=False)
    assert list(out["role"]) == ["neg"] * 3  # eval: all passages, no pos split


def test_gold_page_preference_and_injection(etl, tmp_path, ray_session):
    import ray

    from dpr_ray.eval.reader_etl import ReaderCfg, load_gold_passages

    gold_file = tmp_path / "gold.json"
    gold_file.write_text(
        json.dumps(
            {
                "data": [
                    {
                        "question": "x",
                        "question_tokens": "x",
                        "title": "Gold Title",
                        "context": "a b gold",
                        "example_id": 1,
                    }
                ]
            }
        )
    )
    gold = load_gold_passages(str(gold_file))
    assert gold[0]["x"]["title"] == "gold title"  # lowered (reader_data.py:551)
    rows = [
        ("q1", "x", 1, 10, "other", "a b c"),      # hit, wrong page
        ("q1", "x", 2, 11, "gold title", "a b d"),  # hit, gold page → preferred
    ]
    out = etl(rows, {"q1": ["a b"]}, gold_ref=ray.put(gold))
    assert list(out[out["role"] == "pos"]["docid"]) == [11]
    # injection: gold passage text absent from positives → appended (docid -1)
    out2 = etl(
        rows,
        {"q1": ["a b"]},
        gold_ref=ray.put(gold),
        cfg=ReaderCfg(include_gold_passage=True),
    )
    assert -1 in set(out2[out2["role"] == "pos"]["docid"])


def test_reader_predictions_and_em(ray_session, tmp_path):
    """S12/A3 semantics: relevance-ranked passage visit, threshold-filtered
    first span, EM@k aggregation, prediction JSON shape."""
    import json

    import numpy as np
    import ray
    import ray.data

    from dpr_ray.eval.reader_predict import (
        reader_em_at_k,
        reader_predictions,
        save_reader_predictions,
    )

    def logits(n, best):
        s = np.full(n, -5.0)
        s[best] = 5.0
        return s.tolist()

    rows = [
        # q1: passage rank 2 has HIGHER relevance; its best span is "right
        # answer". rank 1 contains "wrong one".
        {"qid": "q1", "question": "q?", "rank": 1, "relevance_logit": 1.0,
         "tokens": ["the", "wrong", "one", "here"],
         "start_logits": logits(4, 1), "end_logits": logits(4, 2)},
        {"qid": "q1", "question": "q?", "rank": 2, "relevance_logit": 9.0,
         "tokens": ["a", "right", "answer", "x"],
         "start_logits": logits(4, 1), "end_logits": logits(4, 2)},
    ]
    ds = ray.data.from_items(rows)
    pred = reader_predictions(ds, passage_thresholds=[1, 2]).to_pandas()
    pred = pred.sort_values("top_k").reset_index(drop=True)
    # threshold 1: only rank-1 passage eligible → "wrong one"
    assert pred.loc[0, "prediction_text"] == "wrong one"
    # threshold 2: the higher-relevance rank-2 passage wins → "right answer"
    assert pred.loc[1, "prediction_text"] == "right answer"

    ans_ref = ray.put({"q1": ["right answer"]})
    pred_ds = reader_predictions(ds, passage_thresholds=[1, 2])
    em = reader_em_at_k(pred_ds, ans_ref)
    assert em == {1: 0.0, 2: 1.0}

    out = tmp_path / "preds.json"
    n = save_reader_predictions(
        reader_predictions(ds, passage_thresholds=[1, 2]), str(out), ans_ref
    )
    assert n == 1
    data = json.loads(out.read_text())
    assert data[0]["gold_answers"] == ["right answer"]
    assert [p["top_k"] for p in data[0]["predictions"]] == [1, 2]
    assert data[0]["predictions"][1]["prediction"]["text"] == "right answer"
