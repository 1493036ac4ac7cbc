"""Connected components / dedup_clusters: min-label propagation vs a
driver-side union-find ground truth, across chain (max-diameter), star,
clique, disjoint and empty graphs."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from dpr_ray.stages.components import (
    assign_clusters,
    connected_components,
    dedup_clusters,
)


def _uf_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _edges_ds(edges):
    a, b = zip(*edges) if edges else ((), ())
    return ray.data.from_arrow(
        pa.table(
            {
                "docid_a": pa.array(list(a), pa.int64()),
                "docid_b": pa.array(list(b), pa.int64()),
            }
        )
    )


def _cc_dict(edges, **kw):
    out = connected_components(_edges_ds(edges), **kw).to_pandas()
    return dict(zip(out["node"], out["label"]))


@pytest.mark.parametrize("limit", [2_000_000, 0])  # driver UF / distributed
@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7)],  # chain
        [(10, 1), (10, 2), (10, 3), (10, 4)],  # star, hub not min
        [(1, 2), (1, 3), (2, 3), (7, 8), (8, 9), (7, 9)],  # two cliques
        [(5, 5)],  # self loop
        [(3, 1), (1, 3), (2, 9)],  # duplicates / reversed
    ],
)
def test_cc_matches_union_find(ray_session, edges, limit):
    assert _cc_dict(edges, driver_edge_limit=limit) == _uf_labels(edges)


def test_cc_empty(ray_session):
    out = connected_components(_edges_ds([]))
    assert out.count() == 0
    # Ray's to_pandas drops columns on 0-row datasets; check the schema
    assert out.schema().names == ["node", "label"]


@pytest.mark.parametrize("limit", [2_000_000, 0])
def test_cc_random_graph(ray_session, limit):
    rng = np.random.default_rng(7)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 60, size=(120, 2))
    ]
    assert _cc_dict(edges, driver_edge_limit=limit) == _uf_labels(edges)


def test_assign_clusters_covers_singletons(ray_session):
    docs = ray.data.from_arrow(
        pa.table({"docid": pa.array([1, 2, 3, 4, 5, 6], pa.int64())})
    )
    out = dedup_clusters(docs, _edges_ds([(2, 4), (4, 6)])).to_pandas()
    got = dict(zip(out["docid"], out["cluster_id"]))
    assert got == {1: 1, 2: 2, 3: 3, 4: 2, 5: 5, 6: 2}
    canon = dict(zip(out["docid"], out["is_canonical"]))
    assert canon == {1: 1, 2: 1, 3: 1, 4: 0, 5: 1, 6: 0}


def test_assign_clusters_no_edges(ray_session):
    docs = ray.data.from_arrow(
        pa.table({"docid": pa.array([7, 8], pa.int64())})
    )
    out = assign_clusters(
        docs, connected_components(_edges_ds([]))
    ).to_pandas()
    assert dict(zip(out["docid"], out["cluster_id"])) == {7: 7, 8: 8}


def test_max_rounds_cap_warns(ray_session, caplog):
    # a 12-chain needs ~11 rounds; cap at 2 → warning, labels an upper bound
    edges = [(i, i + 1) for i in range(1, 12)]
    with caplog.at_level("WARNING", logger="dpr_ray.components"):
        out = connected_components(
            _edges_ds(edges), max_rounds=2, driver_edge_limit=0
        ).to_pandas()
    assert any("max_rounds" in r.message for r in caplog.records)
    full = _uf_labels(edges)
    got = dict(zip(out["node"], out["label"]))
    assert all(got[n] >= full[n] for n in full)  # upper bound on canonical
