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
