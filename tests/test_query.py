"""Query conformance: TAAT and block-max WAND must be rank- AND
score-identical (bitwise float64) to the brute-force oracle (SURVEY §5)."""

import numpy as np
import pytest

from dpr_ray import corpus as corpus_mod
from dpr_ray.config import BM25Params
from dpr_ray.index.build import build_index
from dpr_ray.query import executor as qe
from dpr_ray.query.oracle import BruteForceBM25

N_DOCS = 150

QUERIES = [
    "def return",                      # head terms, many ties
    "rare_tok_3",                      # singleton term
    "answer_5 def",                    # mixed selectivity
    "rare_tok_1 rare_tok_2 rare_tok_3",  # disjoint singletons
    "zzz_not_in_corpus",               # df = 0
    "def def def",                     # duplicate query terms collapse
    "café",                            # unicode NFD
    "’quote’",                         # punctuation tokens
    "import class struct impl fn",     # many terms
    "",                                # empty query
]


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    import ray.data

    tbl = corpus_mod.synth_corpus_table(N_DOCS, seed=3)
    index_dir = str(tmp_path_factory.mktemp("qidx"))
    build_index(
        ray.data.from_arrow(tbl).repartition(4), index_dir,
        docid_strategy="hash64", group_budget=40, sample_mod=2, block_size=16,
    )
    from dpr_ray.stages.featurize import docid_from_ext_id

    ext = [f"{r}/{p}" for r, p in zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist())]
    oracle = BruteForceBM25(
        [docid_from_ext_id(e) for e in ext], tbl["content"].to_pylist(), BM25Params()
    )
    return index_dir, oracle


@pytest.mark.parametrize("method", ["taat", "bmw"])
def test_rank_and_score_identical(setup, method):
    index_dir, oracle = setup
    ex = qe.QueryExecutor(index_dir, k=25, method=method)
    import pyarrow as pa

    batch = pa.table(
        {
            "qid": pa.array([f"q{i}" for i in range(len(QUERIES))]),
            "question": pa.array(QUERIES),
        }
    )
    res = ex(batch).to_pylist()
    by_qid = {}
    for r in res:
        by_qid.setdefault(r["qid"], []).append(r)
    for i, q in enumerate(QUERIES):
        expected = oracle.top_k(q, 25)
        got = sorted(by_qid.get(f"q{i}", []), key=lambda r: r["rank"])
        assert len(got) == len(expected), (method, q)
        for rank, (r, (edoc, escore)) in enumerate(zip(got, expected), start=1):
            assert r["rank"] == rank
            assert r["docid"] == edoc, (method, q, rank)
            assert r["score"] == escore, (method, q, rank)  # bitwise


def test_small_k_pruning(setup):
    """k=3 exercises real WAND pruning (θ rises fast)."""
    index_dir, oracle = setup
    import pyarrow as pa

    for method in ["taat", "bmw"]:
        ex = qe.QueryExecutor(index_dir, k=3, method=method)
        batch = pa.table({"qid": pa.array(["a"]), "question": pa.array(["def import class"])})
        got = ex(batch).to_pylist()
        expected = oracle.top_k("def import class", 3)
        assert [(r["docid"], r["score"]) for r in got] == [
            (d, s) for d, s in expected
        ], method


def test_search_pipeline_with_docs(setup):
    index_dir, oracle = setup
    import ray.data

    qds = ray.data.from_items(
        [{"qid": "q0", "question": "rare_tok_7"}, {"qid": "q1", "question": "def"}]
    )
    res = qe.search_pipeline(
        qds, index_dir, k=5, with_docs=True, doc_columns=["ext_id", "title", "content"]
    ).take_all()
    from dpr_ray.stages.featurize import docid_from_ext_id

    assert res
    for r in res:
        # join invariant: the attached doc really is the scored doc
        assert docid_from_ext_id(r["ext_id"]) == r["docid"]
        assert r["title"] == r["ext_id"] and r["content"]
    # note: "rare_tok_7" tokenizes to [rare, _, tok, _, 7] under the DPR
    # analyzer (underscore splits) — ranks match the oracle:
    got0 = [r["docid"] for r in sorted(
        (r for r in res if r["qid"] == "q0"), key=lambda r: r["rank"])]
    assert got0 == [d for d, _s in oracle.top_k("rare_tok_7", 5)]


def test_doc_join_copartitioned_matches_probe(setup):
    """The range-co-partitioned doc join must produce IDENTICAL joined
    content to the per-batch probe DocJoin, on hash64 docids (near 2^63 —
    the uint64 searchsorted/tag edge) with multi-query result sets."""
    index_dir, _oracle = setup
    import pandas as pd
    import ray.data

    qds = ray.data.from_items(
        [
            {"qid": "q0", "question": "def return"},
            {"qid": "q1", "question": "rare_tok_3"},
            {"qid": "q2", "question": "import class struct impl fn"},
        ]
    )
    cols = ["ext_id", "title", "content"]
    probe = (
        qe.search_pipeline(
            qds, index_dir, k=20, with_docs=True, doc_columns=cols
        )
        .to_pandas()
        .sort_values(["qid", "rank"], ignore_index=True)
    )
    qds2 = ray.data.from_items(
        [
            {"qid": "q0", "question": "def return"},
            {"qid": "q1", "question": "rare_tok_3"},
            {"qid": "q2", "question": "import class struct impl fn"},
        ]
    )
    copart = (
        qe.search_pipeline(
            qds2, index_dir, k=20, with_docs=True, doc_columns=cols,
            doc_join_mode="copartition",
        )
        .to_pandas()
        .sort_values(["qid", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(probe, copart)
    assert len(probe) > 0 and set(cols) <= set(probe.columns)


@pytest.mark.skipif(
    not __import__("os").environ.get("DPR_RAY_SLOW"),
    reason="10k-doc conformance: run with DPR_RAY_SLOW=1",
)
def test_rank_identical_at_10k_docs(ray_session, tmp_path_factory):
    """FIXTURES.md correctness scale: 10k docs, rank- and score-identical
    to the brute-force oracle for both methods on a mixed query set."""
    import ray.data

    tbl = corpus_mod.synth_corpus_table(10_000, seed=77)
    index_dir = str(tmp_path_factory.mktemp("qidx10k"))
    build_index(
        ray.data.from_arrow(tbl).repartition(8), index_dir,
        docid_strategy="hash64", group_budget=2000, sample_mod=4,
    )
    from dpr_ray.stages.featurize import docid_from_ext_id

    ext = [f"{r}/{p}" for r, p in zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist())]
    oracle = BruteForceBM25(
        [docid_from_ext_id(e) for e in ext], tbl["content"].to_pylist(), BM25Params()
    )
    queries = ["def return", "rare class", "answer_12", "import fn struct impl",
               "café", "the a an", "tok 9999"]
    import pyarrow as pa

    batch = pa.table(
        {"qid": [f"q{i}" for i in range(len(queries))], "question": queries}
    )
    for method in ["taat", "bmw"]:
        res = qe.QueryExecutor(index_dir, k=50, method=method)(batch).to_pylist()
        by_qid = {}
        for r in res:
            by_qid.setdefault(r["qid"], []).append(r)
        for i, q in enumerate(queries):
            expected = oracle.top_k(q, 50)
            got = sorted(by_qid.get(f"q{i}", []), key=lambda r: r["rank"])
            assert [(r["docid"], r["score"]) for r in got] == expected, (method, q)


def test_maxscore_exact_vs_oracle(ray_session, tmp_path):
    """MaxScore pruned scoring must stay bitwise-identical to the oracle,
    including on mixed-selectivity queries where pruning actually fires
    (dense docid space so the pruned path is eligible)."""
    import pyarrow as pa
    import ray.data

    tbl = corpus_mod.synth_corpus_table(400, seed=55)
    tbl = tbl.append_column(
        "docid", pa.array(range(400), pa.uint64())
    )
    index_dir = str(tmp_path / "idx")
    build_index(
        ray.data.from_arrow(tbl).repartition(4), index_dir,
        docid_strategy="provided",
    )
    oracle = BruteForceBM25(
        list(range(400)), tbl["content"].to_pylist(), BM25Params()
    )
    ex = qe.QueryExecutor(index_dir, k=10, method="maxscore")
    assert ex.store.dense_size > 0  # pruned path actually eligible
    queries = [
        "def",                              # single term
        "def return import class self",     # all-head
        "answer_3 def return",              # rare + head (pruning fires)
        "rare def for while if int void",   # mixed many terms
        "zzz_missing def",
        "",
    ]
    batch = pa.table(
        {"qid": [f"m{i}" for i in range(len(queries))], "question": queries}
    )
    res = ex(batch).to_pylist()
    by_qid = {}
    for r in res:
        by_qid.setdefault(r["qid"], []).append(r)
    for i, q in enumerate(queries):
        expected = oracle.top_k(q, 10)
        got = sorted(by_qid.get(f"m{i}", []), key=lambda r: r["rank"])
        assert [(r["docid"], r["score"]) for r in got] == expected, q


@pytest.fixture(scope="module")
def setup_dense(ray_session, tmp_path_factory):
    """Same corpus with PROVIDED dense docids — exercises the dense
    accumulator paths (taat/maxscore/pruned-bmw) instead of the sparse
    fallbacks."""
    import pyarrow as pa
    import ray.data

    tbl = corpus_mod.synth_corpus_table(N_DOCS, seed=3)
    tbl = tbl.append_column(
        "docid", pa.array(np.arange(N_DOCS, dtype=np.uint64), pa.uint64())
    )
    index_dir = str(tmp_path_factory.mktemp("qidx_dense"))
    build_index(
        ray.data.from_arrow(tbl).repartition(4), index_dir,
        docid_strategy="provided", group_budget=40, sample_mod=2, block_size=16,
    )
    oracle = BruteForceBM25(
        list(range(N_DOCS)), tbl["content"].to_pylist(), BM25Params()
    )
    return index_dir, oracle


@pytest.mark.parametrize("method", ["taat", "maxscore", "bmw"])
def test_dense_paths_bitwise_identical(setup_dense, method):
    """pruned_topk_dense (bmw on dense ids) and maxscore must be bitwise
    float64-equal to the oracle, including at tiny block_size where block
    pruning actually skips ranges."""
    index_dir, oracle = setup_dense
    ex = qe.QueryExecutor(index_dir, k=25, method=method)
    import pyarrow as pa

    batch = pa.table(
        {
            "qid": pa.array([f"q{i}" for i in range(len(QUERIES))]),
            "question": pa.array(QUERIES),
        }
    )
    assert ex.store.dense_size > 0  # the dense path is actually in play
    res = ex(batch).to_pylist()
    by_qid = {}
    for r in res:
        by_qid.setdefault(r["qid"], []).append(r)
    for i, q in enumerate(QUERIES):
        expected = oracle.top_k(q, 25)
        got = sorted(by_qid.get(f"q{i}", []), key=lambda r: r["rank"])
        assert len(got) == len(expected), (method, q)
        for rank, (r, (edoc, escore)) in enumerate(zip(got, expected), start=1):
            assert r["rank"] == rank
            assert r["docid"] == edoc, (method, q, rank)
            assert r["score"] == escore, (method, q, rank)  # bitwise


def test_dedup_queries_identical(setup_dense, ray_session):
    """search_pipeline(dedup_queries=True) must emit the identical per-qid
    result set as the direct path (signature-keyed fan-out is exact)."""
    import pyarrow as pa
    import ray.data

    index_dir, _oracle = setup_dense
    from dpr_ray.query.executor import search_pipeline

    rows = [
        {"qid": f"q{i}", "question": q}
        for i, q in enumerate(QUERIES * 3)  # duplicates across qids
    ]

    def run(dedup):
        qds = ray.data.from_items(rows).repartition(4)
        df = search_pipeline(
            index_dir=index_dir, queries_ds=qds, k=7, dedup_queries=dedup
        ).to_pandas()
        return df.sort_values(["qid", "rank"]).reset_index(drop=True)[
            ["qid", "rank", "docid", "score"]
        ]

    a, b = run(False), run(True)
    assert a.equals(b)


@pytest.mark.parametrize("setup_name", ["setup_dense", "setup"])
def test_doc_sharded_identical(setup_name, request, ray_session):
    """doc_shards=3 must emit the identical (bitwise) per-qid result set:
    per-shard block-filtered decode + (-score, docid) k-way merge, on both
    dense (provided) and sparse (hash64) docid spaces."""
    import ray.data

    index_dir, _oracle = request.getfixturevalue(setup_name)
    from dpr_ray.query.executor import search_pipeline

    rows = [{"qid": f"q{i}", "question": q} for i, q in enumerate(QUERIES)]

    def run(shards):
        qds = ray.data.from_items(rows).repartition(2)
        df = search_pipeline(
            qds, index_dir, k=7, doc_shards=shards
        ).to_pandas()
        return df.sort_values(["qid", "rank"]).reset_index(drop=True)[
            ["qid", "rank", "docid", "score"]
        ]

    a, b = run(None), run(3)
    assert a.equals(b)


def _mk_head_entries(seed, n_docs, dfs, tie_level=None):
    """Synthetic head-term (docids, contrib, ub) entries; optionally snap
    contributions to a coarse grid so exact k-boundary ties occur."""
    entries = []
    rng = np.random.default_rng(seed)
    dl = rng.integers(20, 2000, size=n_docs).astype(np.float64)
    for i, df in enumerate(dfs):
        r = np.random.default_rng(seed * 100 + i)
        d = np.sort(r.choice(n_docs, size=df, replace=False)).astype(np.int64)
        c = (1.0 + 0.2 * i) / (1.0 + 0.4 * dl[d] / dl.mean())
        if tie_level:
            c = np.ceil(c * tie_level) / tie_level  # many exact ties
        entries.append((d, c, float(c.max())))
    return entries


@pytest.mark.parametrize("tie_level", [None, 8])
def test_impact_expand_bitwise_vs_taat(tie_level):
    """Impact-ordered head-only expansion must equal plain dense TAAT
    bitwise — docids AND float64 scores — including under heavy exact
    ties at the k-boundary (the (-score, docid) total-order contract),
    across sizes that exercise both early-stop and full-exhaustion."""
    for seed, n_docs, dfs, k in [
        (3, 5000, [3000, 2500, 2000], 10),
        (4, 5000, [4999, 4998], 25),
        (5, 300, [200, 150, 120, 100], 50),
        (6, 64, [60, 50], 64),  # k >= union: exhaustion path
    ]:
        entries = _mk_head_entries(seed, n_docs, dfs, tie_level)
        buf = np.zeros(n_docs, np.float64)
        ids = np.arange(n_docs, dtype=np.uint64)
        want = qe.taat_topk_dense([(e[0], e[1]) for e in entries], k, buf, ids)
        perms = [np.lexsort((e[0], -e[1])).astype(np.int32) for e in entries]
        got = qe._impact_expand(entries, k, buf, ids, perms)
        assert np.array_equal(
            np.asarray(want[0], np.uint64), np.asarray(got[0], np.uint64)
        ), (seed, tie_level)
        assert np.array_equal(want[1], got[1]), (seed, tie_level)  # bitwise
        # dense posmap fast path must be bitwise-identical too
        posmaps = []
        for e in entries:
            pm = np.full(n_docs, -1, np.int32)
            pm[e[0]] = np.arange(len(e[0]), dtype=np.int32)
            posmaps.append(pm)
        gotp = qe._impact_expand(entries, k, buf, ids, perms, posmaps)
        assert np.array_equal(
            np.asarray(want[0], np.uint64), np.asarray(gotp[0], np.uint64)
        ), (seed, tie_level)
        assert np.array_equal(want[1], gotp[1]), (seed, tie_level)
        # flat contributions: must fall back, still exact
        flat = [(e[0], np.full(len(e[0]), 0.25), 0.25) for e in entries]
        wantf = qe.taat_topk_dense([(e[0], e[1]) for e in flat], k, buf, ids)
        permsf = [np.lexsort((e[0], -e[1])).astype(np.int32) for e in flat]
        gotf = qe._impact_expand(flat, k, buf, ids, permsf)
        assert np.array_equal(
            np.asarray(wantf[0], np.uint64), np.asarray(gotf[0], np.uint64)
        )
        assert np.array_equal(wantf[1], gotf[1])


def test_executor_head_only_uses_impact_cache(setup_dense):
    """A head-only multi-term maxscore query must populate the per-term
    impact cache (proving the impact path ran) and emit output identical
    to the taat executor."""
    index_dir, _oracle = setup_dense
    import pyarrow as pa

    # head-only: the corpus generator's highest-df terms
    q = "the of and"
    batch = pa.table({"qid": pa.array(["h1"]), "question": pa.array([q])})
    ex_m = qe.QueryExecutor(index_dir, k=25, method="maxscore")
    ex_t = qe.QueryExecutor(index_dir, k=25, method="taat")
    rm = ex_m(batch).to_pylist()
    rt = ex_t(batch).to_pylist()
    assert rm == rt
    present = [t for t in ("the", "of", "and") if ex_m.store.scored(t) is not None]
    if len(present) >= 2:  # head-only bail engaged → perms were built
        assert len(ex_m.store._impact) >= 1


def test_batched_taat_bitwise_vs_unbatched(setup_dense, monkeypatch):
    """The term-major batched TAAT (taat_topk_dense_multi via the deferred
    pool) must be bitwise-identical to the per-query dense path
    (DPR_BATCH_ACCUM_MB=0 disables batching), for both taat and maxscore,
    on a batch with heavy term sharing and duplicate term-sets."""
    index_dir, _oracle = setup_dense
    import pyarrow as pa

    qs = QUERIES + QUERIES[:3] + ["def return class", "def return class"]
    batch = pa.table(
        {
            "qid": pa.array([f"b{i}" for i in range(len(qs))]),
            "question": pa.array(qs),
        }
    )
    monkeypatch.setenv("DPR_BATCH_MIN_ACCUM_MB", "0")  # tiny test corpus
    for method in ("taat", "maxscore"):
        monkeypatch.setenv("DPR_BATCH_ACCUM_MB", "0")
        plain = qe.QueryExecutor(
            index_dir, k=25, method=method, result_cache=0
        )(batch).to_pylist()
        monkeypatch.delenv("DPR_BATCH_ACCUM_MB")
        ex = qe.QueryExecutor(index_dir, k=25, method=method, result_cache=0)
        assert ex.store.multi_group_size() >= 2
        batched = ex(batch).to_pylist()
        assert batched == plain, method
        if method == "taat":
            # the deferred pool must actually have been exercised
            assert ex.store._multi_buf is not None


def test_taat_topk_dense_multi_unit(ray_session):
    """Direct unit check: grouped accumulation == per-query accumulation
    on synthetic entries with shared terms."""
    rng = np.random.default_rng(11)
    n = 500
    buf = np.zeros(n, np.float64)
    ids = np.arange(n, dtype=np.uint64)
    terms = {}
    for name in "abcdef":
        d = np.sort(
            rng.choice(n, size=int(rng.integers(20, 300)), replace=False)
        ).astype(np.int64)
        c = rng.random(len(d)) * 3
        terms[name] = (d, c)
    queries = [["a", "b", "c"], ["b", "d"], ["a", "c", "e", "f"], ["d", "f"]]
    want = [
        qe.taat_topk_dense([terms[t] for t in q], 10, buf, ids)
        for q in queries
    ]
    bufs = np.zeros((len(queries), n), np.float64)
    got = qe.taat_topk_dense_multi(
        [[(t, terms[t]) for t in q] for q in queries], 10, bufs, ids
    )
    for w, g in zip(want, got):
        assert np.array_equal(w[0], g[0])
        assert np.array_equal(w[1], g[1])  # bitwise
    assert not bufs.any()  # reset after extraction


@pytest.mark.parametrize("method", ["taat", "maxscore", "bmw"])
def test_degenerate_query_inputs(setup, method):
    """Degenerate inputs must be consistent across all three methods:
    a zero-row query batch and k=0 return 0 rows with the canonical
    schema (BMW's theta() used to index heap[0] of an empty heap at
    k=0), an empty docid window returns 0 rows, and k > N returns
    every positive-scoring doc in oracle order."""
    import pyarrow as pa

    index_dir, oracle = setup
    q = "def return import value"
    qb = pa.table({"qid": ["a"], "question": [q]})
    empty = pa.table(
        {"qid": pa.array([], pa.string()), "question": pa.array([], pa.string())}
    )
    out0 = qe.QueryExecutor(index_dir, k=5, method=method)(empty)
    assert out0.num_rows == 0
    assert out0.schema.names == ["qid", "question", "rank", "docid", "score"]
    assert qe.QueryExecutor(index_dir, k=0, method=method)(qb).num_rows == 0
    lo = int(oracle.docids[len(oracle.docids) // 2])
    assert qe.QueryExecutor(
        index_dir, k=5, method=method, docid_range=(lo, lo)
    )(qb).num_rows == 0
    big = qe.QueryExecutor(index_dir, k=10 * N_DOCS, method=method)(qb)
    want = oracle.top_k(q, 10 * N_DOCS)
    got = [(int(r["docid"]), float(r["score"])) for r in big.to_pylist()]
    assert got == want
    # reversed range: loud ValueError at construction, not an opaque numpy
    # "negative dimensions" error deep in the decode path
    with pytest.raises(ValueError, match="docid_range"):
        qe.QueryExecutor(index_dir, k=5, method=method, docid_range=(lo, 5))


@pytest.mark.parametrize("method", ["taat", "maxscore", "bmw"])
def test_degenerate_query_inputs_dense(setup_dense, method):
    """The same degenerate contract on a DENSE (provided-ordinal) index —
    the dense np.partition paths sized kth as len(x) - k, which indexed
    one past the end at k=0 (the original k=0 guard only covered the
    sparse bmw_topk fallback, and the sparse fixture above never reaches
    the dense twins). Also pins the boundary windows the validation
    admits: [0, 0) and [2^64, 2^64) serve 0 rows on every method."""
    import pyarrow as pa

    index_dir, oracle = setup_dense
    q = "def return import value"
    qb = pa.table({"qid": ["a"], "question": [q]})
    ex = qe.QueryExecutor(index_dir, k=0, method=method)
    assert ex.store.dense_size > 0  # the dense path is actually in play
    out = ex(qb)
    assert out.num_rows == 0
    assert out.schema.names == ["qid", "question", "rank", "docid", "score"]
    for window in [(0, 0), (1 << 64, 1 << 64)]:
        assert qe.QueryExecutor(
            index_dir, k=5, method=method, docid_range=window
        )(qb).num_rows == 0


def test_doc_shards_past_corpus_size(ray_session, tmp_path):
    """search_pipeline with doc_shards > max_docid + 1 hands some shards
    empty [lo, lo) windows (a 3-doc corpus at doc_shards=4 computes edges
    [0, 0, 1, 2, 3], giving shard 0 the window [0, 0)) — the merged top-k
    must equal the unsharded result exactly, with no duplicated docids."""
    import pyarrow as pa
    import ray.data

    tbl = corpus_mod.synth_corpus_table(3, seed=11)
    tbl = tbl.append_column("docid", pa.array(range(3), pa.uint64()))
    index_dir = str(tmp_path / "idx3")
    build_index(
        ray.data.from_arrow(tbl).repartition(2), index_dir,
        docid_strategy="provided", group_budget=4, sample_mod=1,
    )
    oracle = BruteForceBM25(
        list(range(3)), tbl["content"].to_pylist(), BM25Params()
    )
    q = "def return import class"
    qds = ray.data.from_arrow(pa.table({"qid": ["a"], "question": [q]}))
    res = (
        qe.search_pipeline(qds, index_dir, k=3, method="taat", doc_shards=4)
        .to_pandas()
        .sort_values("rank")
    )
    assert res["docid"].is_unique
    got = [(int(d), float(s)) for d, s in zip(res["docid"], res["score"])]
    assert got == oracle.top_k(q, 3)


def test_warm_refs_dropped_under_docid_range(setup_dense):
    """warm entries are UNSHARDED absolute-docid decodes: a ranged store
    must drop them (mirror of the banned-docids guard). Pre-fix, a dense
    ranged store scattered absolute warm docids into its span-sized
    buffer (IndexError past the span, silently wrong docids inside it),
    and a sparse ranged store served full-corpus results. warm_refs +
    docid_range must equal the cold ranged executor bitwise."""
    import pyarrow as pa

    from dpr_ray import analyzer

    index_dir, _oracle = setup_dense
    terms = sorted({t for q in QUERIES for t in analyzer.tokenize(q)})
    refs = qe.warm_posting_refs(index_dir, terms, chunks=2)
    batch = pa.table(
        {
            "qid": pa.array([f"q{i}" for i in range(len(QUERIES))]),
            "question": pa.array(QUERIES),
        }
    )
    # lo > 0 windows: absolute warm ids would mis-rebase (dense) or
    # escape the window (sparse BMW)
    for method in ("taat", "maxscore", "bmw"):
        for rng in [(N_DOCS // 3, N_DOCS), (10, 40), (0, N_DOCS // 2)]:
            cold = qe.QueryExecutor(
                index_dir, k=10, method=method, docid_range=rng
            )(batch).to_pylist()
            warm = qe.QueryExecutor(
                index_dir, k=10, method=method, docid_range=rng,
                warm_refs=refs,
            )(batch).to_pylist()
            assert warm == cold, (method, rng)


def test_cache_terms_env_knob(setup, monkeypatch):
    """DPR_CACHE_TERMS must reach the serving path: QueryExecutor's old
    hardcoded default (50_000) silently shadowed the env knob that
    large-corpus deployments use to cap per-actor raw-rows cache."""
    index_dir, _oracle = setup
    monkeypatch.setenv("DPR_CACHE_TERMS", "7")
    assert qe.QueryExecutor(index_dir, k=5).store._cache_terms == 7
    # explicit argument still wins over the env
    assert (
        qe.QueryExecutor(index_dir, k=5, cache_terms=3).store._cache_terms
        == 3
    )


def test_search_pipeline_sharded_validation(setup, ray_session, tmp_path):
    """doc_shards composition guards: dedup_queries doesn't compose with
    sharding (refuse loudly, never silently drop the requested dedup);
    a stats.json missing max_docid must refuse sharding (defaulting to 0
    made every shard a near-empty window — silent wrong results)."""
    import json
    import os
    import shutil

    import pyarrow as pa
    import pytest as _pytest
    import ray.data

    index_dir, _oracle = setup
    qds = ray.data.from_arrow(
        pa.table({"qid": ["a"], "question": ["def return"]})
    )
    with _pytest.raises(ValueError, match="dedup_queries"):
        qe.search_pipeline(qds, index_dir, doc_shards=2, dedup_queries=True)
    d2 = str(tmp_path / "no_maxdocid")
    shutil.copytree(index_dir, d2)
    with open(os.path.join(d2, "stats.json")) as f:
        st = json.load(f)
    st.pop("max_docid")
    with open(os.path.join(d2, "stats.json"), "w") as f:
        json.dump(st, f)
    with _pytest.raises(ValueError, match="max_docid"):
        qe.search_pipeline(qds, d2, doc_shards=2)


def test_shard_concurrency_clamps_minimums():
    """Caller concurrency applies per shard pool, but pool MINIMUMS must
    not sum to (or past) the cluster's CPUs: the shard pools feed the
    per-qid top-k merge shuffle in the same streaming execution, and held
    minimums starve it (the measured actor-pool-after-shuffle deadlock).
    Maximums are autoscaling demand and pass through."""
    from dpr_ray.query.executor import _shard_concurrency

    # default: 1 .. (total-1)//shards
    assert _shard_concurrency(None, 16, 4) == (1, 3)
    assert _shard_concurrency(None, 4, 2) == (1, 1)
    # explicit tuple within budget: untouched
    assert _shard_concurrency((1, 2), 4, 2) == (1, 2)
    assert _shard_concurrency((2, 8), 16, 4) == (2, 8)
    # min over budget: clamped, max preserved
    assert _shard_concurrency((8, 8), 16, 4) == (3, 8)
    # int = fixed pool: min clamped, original size stays the max
    assert _shard_concurrency(8, 16, 4) == (3, 8)
    # degenerate tiny cluster: min never below 1
    assert _shard_concurrency((4, 4), 2, 3) == (1, 4)
