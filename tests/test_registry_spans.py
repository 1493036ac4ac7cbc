"""Extension registry (§2.11) + reader best-span selection (M21)."""

import numpy as np
import pytest

from dpr_ray import registry
from dpr_ray.eval.spans import select_best_spans


def test_registry_builtins():
    tok = registry.create("analyzer", {"name": "simple"})
    assert tok("Hello World") == ["hello", "world"]
    cased = registry.create("analyzer", {"name": "simple_cased"})
    assert cased("Hello") == ["Hello"]
    p = registry.create("scorer", {"name": "bm25", "k1": 1.2})
    assert p.k1 == 1.2 and p.b == 0.4
    assert "csv" in registry.available("query_source")


def test_registry_custom_and_errors():
    @registry.register("analyzer", "upper")
    def _upper():
        return lambda s: s.upper().split()

    assert registry.create("analyzer", {"name": "upper"})("a b") == ["A", "B"]
    with pytest.raises(KeyError, match="no 'analyzer' named 'nope'"):
        registry.create("analyzer", {"name": "nope"})


def test_select_best_spans_basic():
    start = np.array([0.0, 5.0, 0.0, 1.0])
    end = np.array([0.0, 0.0, 5.0, 2.0])
    spans = select_best_spans(start, end, max_answer_length=3, top_spans=2)
    # best: start=1,end=2 (score 10); next non-overlapping: (3,3) score 3
    assert spans[0][:2] == (1, 2) and spans[0][2] == 10.0
    assert spans[1][:2] == (3, 3) and spans[1][2] == 3.0


def test_select_best_spans_overlap_and_length():
    start = np.array([3.0, 2.9, 0.0])
    end = np.array([0.0, 3.0, 2.9])
    # (0,1)=6.0 best; (1,2) overlaps; (2,2) next valid non-overlap
    spans = select_best_spans(start, end, max_answer_length=2, top_spans=3)
    assert spans[0][:2] == (0, 1)
    assert all(not (s <= 1 and 0 <= e) or (s, e) == (0, 1) for s, e, _ in spans)
    # max length respected
    spans1 = select_best_spans(start, end, max_answer_length=1, top_spans=1)
    assert spans1[0][0] == spans1[0][1]
