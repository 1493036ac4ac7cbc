"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in dpr_ray) calls ray.init()/ray.shutdown(). UDFs ship by value
(dpr_ray._shipping) so workers don't need the repo on sys.path.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dpr_ray import entrypoints  # noqa: E402


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: corpus → BM25 index →
    top-k retrieval for the embedded query set → has_answer validation →
    flattened ranked results (qid, question, rank, docid, score, ext_id,
    title, content, has_answer)."""
    return entrypoints.flagship_entry("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 plus
    the training-data ops (dedup / ANN / text analysis / windows /
    multimodal plumbing)."""
    return entrypoints.queries_dict()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names; floats emitted
    as round(x*1e6) BIGINT on both sides). Every queries() key has an
    oracle — including the hash/LSH/k-means and synthetic-media ops, whose
    seeded decision chains are replayed exactly in SQL."""
    return entrypoints.oracle_sql_dict()
