"""DPR-parity small operators: chunking, passage normalization, zlib meta,
ASR join, ctx-source union, dedup unit behavior with planted duplicates,
multimodal plumbing, ANN recall."""

import numpy as np
import pyarrow as pa

from dpr_ray import compat


def test_normalize_passage():
    assert compat.normalize_passage('"a\nb’s"') == "a b's"


def test_process_question_suffix():
    assert compat.process_question("what’s x", " [SEP]") == "what's x [SEP]"


def test_meta_roundtrip():
    t = "some passage text ünïcode"
    assert compat.decompress_meta(compat.compress_meta(t)) == t


def test_join_asr():
    qa = pa.table(
        {
            "qid": ["a", "b", "c"],
            "question": ["qa", "qb", "qc"],
            "answers": pa.array([["1"], ["2"], ["3"]], pa.list_(pa.string())),
        }
    )
    asr = pa.table({"qid": ["b", "a"], "transcript": ["QB’s asr", "QA asr"]})
    out = compat.join_asr_transcripts(qa, asr)
    assert out.num_rows == 2
    got = {r["qid"]: r["question"] for r in out.to_pylist()}
    assert got == {"a": "QA asr", "b": "QB's asr"}  # normalized ’


def test_chunking(ray_session):
    import ray.data

    from dpr_ray.stages.chunking import chunk_documents

    tbl = pa.table(
        {
            "docid": pa.array([1, 2], pa.int64()),
            "content": ["w0 w1 w2 w3 w4 w5 w6", "a b"],
        }
    )
    out = chunk_documents(
        ray.data.from_arrow(tbl), max_words=3
    ).to_pandas().sort_values(["docid", "chunk_seq"]).reset_index(drop=True)
    assert list(out["chunk_seq"]) == [0, 1, 2, 0]
    assert list(out["n_words"]) == [3, 3, 1, 2]
    assert out["chunk_text"][2] == "w6"
    # reassembly invariant: chunks concatenate back to the token stream
    joined = " ".join(out[out["docid"] == 1]["chunk_text"])
    assert joined == "w0 w1 w2 w3 w4 w5 w6"


def test_union_ctx_sources(ray_session):
    import ray.data

    from dpr_ray import corpus as corpus_mod
    from dpr_ray.stages.featurize import Featurize

    a = corpus_mod.synth_corpus_table(10, seed=1)
    b = corpus_mod.synth_corpus_table(10, seed=2)
    # namespace the second source (id_prefix analog)
    b = b.set_column(
        b.schema.get_field_index("repo"), "repo",
        pa.array(["other/" + r for r in b["repo"].to_pylist()]),
    )
    u = compat.union_ctx_sources(
        ray.data.from_arrow(a), ray.data.from_arrow(b)
    ).map_batches(Featurize(docid_strategy="hash64"), batch_format="pyarrow")
    rows = u.to_pandas()
    assert len(rows) == 20
    assert rows["ext_id"].nunique() == 20
    assert rows["docid"].nunique() == 20


def test_exact_dedup_with_planted_dups(ray_session):
    import ray.data

    from dpr_ray.stages.dedup import exact_dedup

    tbl = pa.table(
        {
            "docid": pa.array([5, 3, 9, 7], pa.int64()),
            "content": ["same text", "same text", "unique", "same text"],
        }
    )
    out = exact_dedup(ray.data.from_arrow(tbl)).to_pandas()
    dup = out[out["n_dups"] == 3]
    assert len(dup) == 1 and int(dup["docid_keep"].iloc[0]) == 3  # first-wins = min id
    assert len(out) == 2


def test_minhash_finds_planted_near_dups(ray_session):
    import ray.data

    from dpr_ray.stages.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(f"tok{i}" for i in range(59)) + " tokX"  # ~0.93 jaccard
    far = " ".join(f"other{i}" for i in range(60))
    tbl = pa.table(
        {
            "docid": pa.array([1, 2, 3], pa.int64()),
            "content": [base, near, far],
        }
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/docs.parquet"
        import pyarrow.parquet as pq

        pq.write_table(tbl, src)
        mh = minhash_lsh_pairs(
            ray.data.from_arrow(tbl), threshold=0.5, source_parquet=src
        ).to_pandas()
    assert len(mh) == 1
    assert (int(mh["docid_a"][0]), int(mh["docid_b"][0])) == (1, 2)
    ng = ngram_jaccard_pairs(ray.data.from_arrow(tbl), threshold=0.5).to_pandas()
    assert len(ng) == 1
    assert abs(float(ng["jaccard"][0]) - float(mh["jac_i6"][0] if "jac_i6" in mh else mh["jaccard"][0])) < 1e-9


def test_simhash_near_dup_close_hamming(ray_session):
    import ray.data

    from dpr_ray.stages.dedup import simhash_fingerprints

    base = " ".join(f"tok{i}" for i in range(100))
    near = " ".join(f"tok{i}" for i in range(99)) + " tokX"
    far = " ".join(f"zz{i}" for i in range(100))
    tbl = pa.table(
        {"docid": pa.array([1, 2, 3], pa.int64()), "content": [base, near, far]}
    )
    out = simhash_fingerprints(ray.data.from_arrow(tbl)).to_pandas()
    h = {int(r.docid): int(r.simhash) for r in out.itertuples()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(h[1], h[2]) < ham(h[1], h[3])
    assert ham(h[1], h[2]) <= 6


def test_lsh_knn_recall(ray_session):
    import ray.data

    from dpr_ray.stages.ann import brute_force_knn, lsh_knn

    rng = np.random.default_rng(5)
    n, d = 400, 32
    mat = rng.standard_normal((n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
        }
    )
    qids = list(range(5))
    qm = mat[:5].astype(np.float64)
    ds = ray.data.from_arrow(tbl)
    bf = brute_force_knn(ds, qids, qm, k=10).to_pandas()
    ap = lsh_knn(ds, qids, qm, k=10, n_bits=4, n_probe=4).to_pandas()
    recall = 0.0
    for q in qids:
        truth = set(bf[bf["qid"] == q]["vec_id"])
        got = set(ap[ap["qid"] == q]["vec_id"])
        recall += len(truth & got) / len(truth)
    recall /= len(qids)
    assert recall >= 0.5  # multiprobe LSH recall floor on random data


def test_multimodal_plumbing(ray_session):
    import ray.data

    from dpr_ray import corpus as corpus_mod
    from dpr_ray.stages.multimodal import DecodeImage, media_pipeline

    tbl = corpus_mod.synth_corpus_table(20, seed=4)
    tbl = tbl.append_column("docid", pa.array(range(20), pa.int64()))
    ds = ray.data.from_arrow(tbl)
    decoded, feats = media_pipeline(ds, fake_decode=True)
    dec = decoded.to_pandas()
    assert len(dec) == 20 and (dec["n_bytes"] == 2048).all()
    f = feats.to_pandas()
    assert len(f) == 20 and all(len(v) == 32 for v in f["feature"])
    # determinism: second run identical
    dec2 = media_pipeline(ds, fake_decode=True)[0].to_pandas()
    assert dec.sort_values("media_id").reset_index(drop=True).equals(
        dec2.sort_values("media_id").reset_index(drop=True)
    )
    # real decode is explicitly stubbed
    import pytest

    with pytest.raises(NotImplementedError):
        DecodeImage(fake=False)(
            pa.table({"media_id": [1], "payload": [b"x"]})
        )


def test_ivf_knn_recall(ray_session):
    import ray.data

    from dpr_ray.stages.ann import brute_force_knn, ivf_knn

    rng = np.random.default_rng(11)
    n, d = 400, 32
    mat = rng.standard_normal((n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
        }
    )
    qids = list(range(5))
    qm = mat[:5].astype(np.float64)
    ds = ray.data.from_arrow(tbl)
    bf = brute_force_knn(ds, qids, qm, k=10).to_pandas()
    ivf = ivf_knn(ds, qids, qm, k=10, n_lists=8, n_probe=4).to_pandas()
    recall = 0.0
    for q in qids:
        truth = set(bf[bf["qid"] == q]["vec_id"])
        got = set(ivf[ivf["qid"] == q]["vec_id"])
        recall += len(truth & got) / len(truth)
    recall /= len(qids)
    assert recall >= 0.5
    # determinism: second run identical
    ivf2 = ivf_knn(ds, qids, qm, k=10, n_lists=8, n_probe=4).to_pandas()
    assert ivf.sort_values(["qid", "rank"]).reset_index(drop=True).equals(
        ivf2.sort_values(["qid", "rank"]).reset_index(drop=True)
    )


def test_embedding_near_dup_exact_vs_lsh(ray_session):
    """The LSH-bucketed scale path must find (nearly) all pairs the exact
    block-grid finds at a high threshold, with identical cos_i6 values."""
    import ray.data

    from dpr_ray.stages.ann import embedding_near_dup_pairs

    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 32))
    vecs, ids = [], []
    vid = 0
    for i in range(40):
        for _ in range(3):  # 3 near-copies per base → planted near-dup pairs
            vecs.append(base[i] + rng.standard_normal(32) * 0.02)
            ids.append(vid)
            vid += 1
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float64())),
        }
    )
    exact = embedding_near_dup_pairs(
        ray.data.from_arrow(tbl), threshold=0.95, method="exact", block_rows=32
    ).to_pandas()
    lsh = embedding_near_dup_pairs(
        ray.data.from_arrow(tbl), threshold=0.95, method="lsh",
        lsh_tables=12, lsh_bits=8,
    ).to_pandas()
    e_pairs = set(zip(exact["id_a"], exact["id_b"]))
    l_pairs = set(zip(lsh["id_a"], lsh["id_b"]))
    assert len(e_pairs) >= 40 * 3  # every clone pair found by exact
    assert l_pairs <= e_pairs  # LSH verifies exactly: no false positives
    assert len(l_pairs & e_pairs) / len(e_pairs) >= 0.9  # recall bound
    e_i6 = dict(zip(zip(exact["id_a"], exact["id_b"]), exact["cos_i6"]))
    l_i6 = dict(zip(zip(lsh["id_a"], lsh["id_b"]), lsh["cos_i6"]))
    assert all(e_i6[p] == l_i6[p] for p in l_pairs)


def test_convert_to_kilt(ray_session):
    import json

    import ray
    import ray.data

    res = pa.table(
        {
            "qid": ["q1", "q1", "q2"],
            "question": ["who", "who", "what"],
            "rank": pa.array([2, 1, 1], pa.int64()),
            "docid": pa.array([10, 11, 12], pa.int64()),
        }
    )
    id_map = {10: ("w10", 3), 11: ("w11", 7), 12: ("w12", 1)}
    out = compat.convert_to_kilt(
        ray.data.from_arrow(res),
        ray.put(id_map),
        ray.put({"who": 901}),
    ).to_pandas().sort_values("input").reset_index(drop=True)
    assert list(out["id"]) == ["q2", "901"]  # gold id when mapped, else qid
    prov = json.loads(out.loc[1, "output"])[0]["provenance"]
    assert prov == [  # rank order, not input order
        {"wikipedia_id": "w11", "end_paragraph_id": 7},
        {"wikipedia_id": "w10", "end_paragraph_id": 3},
    ]


def test_multi_set_batches(ray_session):
    import ray.data

    a = ray.data.from_items([{"v": i, "src": "a"} for i in range(8)])
    b = ray.data.from_items([{"v": i, "src": "b"} for i in range(4)])
    out = list(compat.multi_set_batches([a, b], batch_size=2, shuffle_seed=7))
    # quotas: 4 batches from a, 2 from b; every batch single-source
    assert len(out) == 6
    assert sum(1 for _t, s in out if s == 0) == 4
    assert sum(1 for _t, s in out if s == 1) == 2
    for t, s in out:
        assert set(t["src"].to_pylist()) == {"a" if s == 0 else "b"}
    # deterministic schedule per (seed, epoch)
    order1 = [s for _t, s in out]
    order2 = [s for _t, s in
              compat.multi_set_batches([a, b], batch_size=2, shuffle_seed=7)]
    assert order1 == order2
    order3 = [s for _t, s in
              compat.multi_set_batches([a, b], batch_size=2, shuffle_seed=7,
                                       epoch=1)]
    assert order1 != order3  # epoch reshuffles
    # sampling_rates scale per-source quotas
    half = list(compat.multi_set_batches([a, b], batch_size=2,
                                         sampling_rates=[0.5, 1.0]))
    assert sum(1 for _t, s in half if s == 0) == 2


def test_sq8_knn_recall_and_codes(ray_session):
    import ray.data

    from dpr_ray.stages.ann import (
        brute_force_knn,
        sq8_encode,
        sq8_knn,
        sq8_minmax,
    )

    rng = np.random.default_rng(11)
    n, d = 400, 32
    mat = rng.standard_normal((n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl)

    mn, mx = sq8_minmax(ds)
    assert np.allclose(mn, mat.astype(np.float64).min(axis=0))
    assert np.allclose(mx, mat.astype(np.float64).max(axis=0))

    enc = sq8_encode(ds, mn, mx).to_pandas().set_index("vec_id").sort_index()
    codes = np.array(enc["codes"].tolist(), dtype=np.int64)
    assert codes.shape == (n, d)
    assert codes.min() >= 0 and codes.max() <= 255
    # dequantization error bounded by half a quantization step per dim
    deq = mn + codes.astype(np.float64) * (mx - mn) / 255.0
    step = (mx - mn) / 255.0
    assert (np.abs(deq - mat.astype(np.float64)) <= step / 2 + 1e-12).all()

    # 8-bit quantization of smooth random data barely moves cosine top-k
    qids = list(range(5))
    qm = mat[:5].astype(np.float64)
    bf = brute_force_knn(ds, qids, qm, k=10).to_pandas()
    sq = sq8_knn(ds, qids, qm, k=10).to_pandas()
    recall = 0.0
    for q in qids:
        truth = set(bf[bf["qid"] == q]["vec_id"])
        recall += len(truth & set(sq[sq["qid"] == q]["vec_id"])) / len(truth)
    recall /= len(qids)
    assert recall >= 0.9


def test_pq_knn_codes_and_recall(ray_session):
    import ray.data

    from dpr_ray.stages.ann import PQPlan, brute_force_knn, pq_knn

    rng = np.random.default_rng(23)
    n, d = 400, 32
    mat = rng.standard_normal((n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl)

    plan = PQPlan(list(range(256)), mat[:256].astype(np.float64), m=4, ksub=8)
    codes = plan.assign(mat.astype(np.float64))
    assert codes.shape == (n, 4)
    assert codes.min() >= 0 and codes.max() < 8
    # reconstruction = concatenated centroids of the assigned codes
    rec = plan.reconstruct(codes)
    assert rec.shape == (n, d)
    for sub in range(4):
        lo = sub * 8
        assert np.array_equal(
            rec[:, lo : lo + 8], plan.centroids[sub][codes[:, sub]]
        )
    # identical inputs get identical codes (determinism across calls)
    assert np.array_equal(codes, plan.assign(mat.astype(np.float64)))

    qids = list(range(5))
    qm = mat[:5].astype(np.float64)
    bf = brute_force_knn(ds, qids, qm, k=10).to_pandas()
    pq_res = pq_knn(ds, qids, qm, k=10, m=4, ksub=8, train_cutoff=256).to_pandas()
    recall = 0.0
    for q in qids:
        truth = set(bf[bf["qid"] == q]["vec_id"])
        recall += len(truth & set(pq_res[pq_res["qid"] == q]["vec_id"])) / len(truth)
    recall /= len(qids)
    # 4x8 codebooks on random 32-d data: coarse but must beat chance by far
    assert recall >= 0.2, recall


def test_ivfpq_knn_recall(ray_session):
    import ray.data

    from dpr_ray.stages.ann import brute_force_knn, ivfpq_knn, pq_knn

    rng = np.random.default_rng(31)
    n, d = 400, 32
    mat = rng.standard_normal((n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    qids = list(range(5))
    qm = mat[:5].astype(np.float64)
    bf = brute_force_knn(ds, qids, qm, k=10).to_pandas()
    pq_full = pq_knn(ds, qids, qm, k=10, m=4, ksub=8, train_cutoff=256).to_pandas()
    ivfpq = ivfpq_knn(
        ds, qids, qm, k=10, n_lists=8, n_probe=8, m=4, ksub=8, train_cutoff=256
    ).to_pandas()
    # probing ALL lists makes IVFPQ == plain PQ (the IVF stage only filters)
    a = ivfpq.sort_values(["qid", "rank"]).reset_index(drop=True)
    b = pq_full.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert a[["qid", "vec_id"]].equals(b[["qid", "vec_id"]])
    # with fewer probes: still beats chance by far
    part = ivfpq_knn(
        ds, qids, qm, k=10, n_lists=8, n_probe=3, m=4, ksub=8, train_cutoff=256
    ).to_pandas()
    recall = 0.0
    for q in qids:
        truth = set(bf[bf["qid"] == q]["vec_id"])
        recall += len(truth & set(part[part["qid"] == q]["vec_id"])) / len(truth)
    recall /= len(qids)
    assert recall >= 0.15, recall


def test_ivfpq_by_residual(ray_session):
    """by_residual=True (FAISS IndexIVFPQ default): PQ over
    x - centroid[assign(x)], centroid added back at reconstruction. On
    clustered data the residual codebooks quantize finer than raw-vector
    codebooks, so full-probe recall vs brute force must be at least as
    good; and it must be a genuinely different code path (different
    scores than by_residual=False)."""
    import ray.data

    from dpr_ray.stages.ann import brute_force_knn, ivfpq_knn

    rng = np.random.default_rng(53)
    n, d, n_clu = 400, 32, 8
    centers = rng.standard_normal((n_clu, d)) * 4.0
    mat = (
        centers[rng.integers(0, n_clu, n)] + rng.standard_normal((n, d)) * 0.3
    ).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in mat], pa.list_(pa.float32())
            ),
        }
    )
    ds = ray.data.from_arrow(tbl)
    qids = list(range(5))
    qm = mat[:5].astype(np.float64)
    bf = brute_force_knn(ds, qids, qm, k=10).to_pandas()
    kw = dict(
        k=10, n_lists=n_clu, n_probe=n_clu, m=4, ksub=8, train_cutoff=256
    )
    raw = ivfpq_knn(ds, qids, qm, **kw).to_pandas()
    res = ivfpq_knn(ds, qids, qm, by_residual=True, **kw).to_pandas()

    def recall(out):
        r = 0.0
        for q in qids:
            truth = set(bf[bf["qid"] == q]["vec_id"])
            r += len(truth & set(out[out["qid"] == q]["vec_id"])) / len(truth)
        return r / len(qids)

    assert recall(res) >= recall(raw)
    assert recall(res) >= 0.25
    r_ = res.sort_values(["qid", "rank"]).reset_index(drop=True)
    w_ = raw.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert not r_[["vec_id", "sim"]].equals(w_[["vec_id", "sim"]])


def test_semdedup_vs_brute(ray_session):
    """SemDeDup: keep=0 exactly for vectors with a lower-id same-cluster
    neighbor at round9-cos >= eps; dup_of = the smallest such id. Verified
    against an in-process brute force using the same IVFPlan assignment,
    on clustered data with planted exact duplicates."""
    import ray.data

    from dpr_ray.stages.ann import IVFPlan, _normalize, semdedup
    from dpr_ray.util import round_half_away

    rng = np.random.default_rng(17)
    n, d, n_clu = 300, 32, 6
    centers = rng.standard_normal((n_clu, d)) * 4.0
    mat = (
        centers[rng.integers(0, n_clu, n)] + rng.standard_normal((n, d)) * 0.5
    ).astype(np.float32)
    mat[250] = mat[20]  # planted exact duplicates (same cluster by value)
    mat[251] = mat[20]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in mat], pa.list_(pa.float32())
            ),
        }
    )
    eps = 0.98
    got = (
        semdedup(
            ray.data.from_arrow(tbl).repartition(5),
            eps=eps, n_lists=n_clu, iters=4, train_cutoff=200,
        )
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    assert len(got) == n
    # brute force with the same deterministic plan
    sample = mat[:200].astype(np.float64)
    plan = IVFPlan(list(range(200)), sample, n_lists=n_clu, iters=4)
    cl = plan.assign(mat.astype(np.float64))
    nm = _normalize(mat.astype(np.float64))
    sims = round_half_away(nm @ nm.T, 9)
    for i in range(n):
        js = [
            j for j in range(i)
            if cl[j] == cl[i] and sims[i, j] >= eps
        ]
        row = got.iloc[i]
        assert row.cluster_id == cl[i]
        assert row.keep == (0 if js else 1)
        assert row.dup_of == (min(js) if js else -1)
    # the planted exact duplicates were pruned (dup_of may be an even
    # lower-id near-dup in the same tight cluster, not necessarily 20)
    assert got.iloc[250].keep == 0 and got.iloc[251].keep == 0
    assert got.iloc[250].cluster_id == got.iloc[20].cluster_id


def test_semdedup_degenerate_cluster_guard(ray_session):
    """Pathological embeddings that collapse into ONE cluster must not
    materialize an O(n²) sims matrix: with cluster_row_budget=50 a
    200-row cluster is subsplit into 4 contiguous id-order segments and
    pairs are compared within a segment only (the documented, warned
    approximation). Verified against an in-process per-segment brute
    force: keep=1 exactly at each segment head, dup_of = the smallest
    same-segment lower id at round9-cos >= eps."""
    import ray.data

    from dpr_ray.stages.ann import _normalize, semdedup
    from dpr_ray.util import round_half_away

    rng = np.random.default_rng(3)
    n, d, budget = 200, 16, 50
    base = rng.standard_normal(d)
    mat = (base + rng.standard_normal((n, d)) * 1e-3).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in mat], pa.list_(pa.float32())
            ),
        }
    )
    eps = 0.9
    got = (
        semdedup(
            ray.data.from_arrow(tbl).repartition(4),
            eps=eps, n_lists=1, iters=2, train_cutoff=120,
            cluster_row_budget=budget,
        )
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    assert len(got) == n
    assert (got["cluster_id"] == 0).all()
    nm = _normalize(mat.astype(np.float64))
    sims = round_half_away(nm @ nm.T, 9)
    for i in range(n):
        seg = i // budget
        js = [
            j for j in range(seg * budget, i) if sims[i, j] >= eps
        ]
        row = got.iloc[i]
        assert row.keep == (0 if js else 1), i
        assert row.dup_of == (min(js) if js else -1), i
    # only the 4 segment heads survive (all vectors are near-identical)
    assert got["keep"].sum() == 4
    assert set(got[got["keep"] == 1]["vec_id"]) == {0, 50, 100, 150}


def test_quantized_knn_survive_empty_blocks(ray_session):
    """A filter that empties whole blocks must not crash the quantized
    scorers ((0,0) matrices broadcast against (d,) params)."""
    import ray.data

    from dpr_ray.stages.ann import ivfpq_knn, sq8_knn

    rng = np.random.default_rng(7)
    n, d = 120, 16
    mat = rng.standard_normal((n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
        }
    )
    # 8 blocks; the filter empties the low-id blocks entirely
    ds = ray.data.from_arrow(tbl).repartition(8).filter(expr="vec_id >= 100")
    qids = [0, 1]
    qm = mat[:2].astype(np.float64)
    full = ray.data.from_arrow(tbl).repartition(8)
    out = sq8_knn(ds, qids, qm, k=5, minmax_ds=full).to_pandas()
    assert len(out) == 10 and (out["vec_id"] >= 100).all()
    out2 = ivfpq_knn(
        ds, qids, qm, k=5, n_lists=4, n_probe=4, m=4, ksub=4, train_cutoff=110
    ).to_pandas()
    assert len(out2) == 10 and (out2["vec_id"] >= 100).all()


def test_minhash_lsh_guards(ray_session, tmp_path):
    import pytest
    """minhash_lsh_pairs failure-policy edges: (1) zero-shingle docs
    (< k tokens) are skipped at band emit — they all share the sentinel
    signature, so one band bucket would otherwise hold every short doc
    (O(m²) candidates that verification rejects anyway); results are
    unchanged. (2) source_parquet is REQUIRED — verifying against silently
    empty shingle sets always returned zero pairs. (3) a candidate docid
    with no row in the source parquet is a loud error (the doc-join
    policy). (4) threshold <= 0 (all-pairs semantics) is refused."""
    import pyarrow.parquet as pq
    import ray.data

    from dpr_ray.stages.dedup import minhash_lsh_pairs

    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(f"tok{i}" for i in range(59)) + " tokX"
    far = " ".join(f"other{i}" for i in range(60))
    # docids 4..9: zero-shingle docs (under k=3 tokens)
    tbl = pa.table(
        {
            "docid": pa.array(list(range(1, 10)), pa.int64()),
            "content": [base, near, far, "", "a", "a b", "", "xy", "p q"],
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)
    mh = minhash_lsh_pairs(
        ray.data.from_arrow(tbl), threshold=0.5, source_parquet=src
    ).to_pandas()
    assert len(mh) == 1
    assert (int(mh["docid_a"][0]), int(mh["docid_b"][0])) == (1, 2)

    with pytest.raises(ValueError, match="source_parquet"):
        minhash_lsh_pairs(ray.data.from_arrow(tbl), threshold=0.5)
    with pytest.raises(ValueError, match="threshold"):
        minhash_lsh_pairs(
            ray.data.from_arrow(tbl), threshold=0.0, source_parquet=src
        )

    # candidate docid missing from the verification source: loud, not a
    # silent empty shingle set (which would report jaccard 0)
    src_missing = str(tmp_path / "missing.parquet")
    pq.write_table(tbl.filter(pa.array([d != 2 for d in range(1, 10)])),
                   src_missing)
    with pytest.raises(Exception, match="no row"):
        minhash_lsh_pairs(
            ray.data.from_arrow(tbl), threshold=0.5,
            source_parquet=src_missing,
        ).to_pandas()


def test_lsh_knn_excludes_before_topk(ray_session):
    """BucketTopK must drop exclude_ids BEFORE bucket-local top-k
    selection (the _BatchTopK contract): filtered after, an excluded id
    consumed a top-k slot and a valid rank-(k+1) neighbor was silently
    lost — with k excluded ids atop one bucket, the bucket contributed
    nothing at all."""
    import ray.data

    from dpr_ray.stages import ann

    rng = np.random.default_rng(5)
    d = 16
    base = rng.standard_normal(d)
    # 8 vectors near one direction → same LSH bucket with high probability;
    # ids 0..7 in DECREASING similarity to the query (=base)
    vecs = [base + 0.01 * i * rng.standard_normal(d) for i in range(8)]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(8), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float64())),
        }
    )
    qm = np.asarray([base])
    k = 2
    full = ann.lsh_knn(
        ray.data.from_arrow(tbl), [100], qm, k=k, n_bits=2, n_probe=4,
    ).to_pandas()
    assert len(full) == k
    top2 = set(int(v) for v in full["vec_id"])
    ex = ann.lsh_knn(
        ray.data.from_arrow(tbl), [100], qm, k=k, n_bits=2, n_probe=4,
        exclude_ids=top2,
    ).to_pandas()
    # the excluded pair must vanish AND the next neighbors must fill the
    # k slots (pre-fix: buckets whose local top-k was all-excluded
    # contributed nothing)
    got = set(int(v) for v in ex["vec_id"])
    assert not (got & top2)
    assert len(ex) == k


def test_knn_and_linalg_survive_zero_row_blocks(ray_session):
    """Zero-row blocks (upstream filter, empty parquet fragment) must not
    crash the matrix stages: a (0,0) matrix matmul'd against (d,·) plan
    matrices raises, and EmitBuckets building its hyperplanes from an
    empty first batch poisons the actor for every later batch."""
    import ray.data

    from dpr_ray.stages import ann, linalg

    rng = np.random.default_rng(6)
    n, d = 30, 8
    mat = rng.standard_normal((n, d))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat],
                                  pa.list_(pa.float64())),
        }
    )
    empty = tbl.slice(0, 0)
    # empty FIRST block, then data (from_arrow keeps table order)
    ds = ray.data.from_arrow([empty, tbl, empty])
    qm = mat[:2]
    for fn, kw in (
        (ann.lsh_knn, {}),
        (ann.ivf_knn, {"train_cutoff": n, "n_lists": 2}),
    ):
        res = fn(ds, [0, 1], qm, k=3, **kw).to_pandas()
        assert len(res) > 0, fn.__name__
        # rank-1 of each query is itself (cos=1)
        r1 = res[res["rank"] == 1]
        assert set(int(v) for v in r1["vec_id"]) == {0, 1}, fn.__name__
    pairs = ann.embedding_near_dup_pairs(
        ds, threshold=0.99, method="lsh"
    ).to_pandas()
    assert len(pairs) >= 0  # no crash; planes built from a real batch
    n2, sx, sxx = linalg.gram_partials(ds)
    assert n2 == n and sx.shape == (d,) and sxx.shape == (d, d)
    wh = linalg.pca_whiten(ds).to_pandas()
    assert len(wh) == n


def test_multi_set_batches_upsamples_by_cycling(ray_session):
    """sampling_rates > 1 must deliver the full scheduled quota by
    CYCLING the exhausted source (the reference's itertools.cycle in
    iterate_ds_sampled_data) — next(it, None) silently under-delivered
    half the slots before."""
    import ray.data

    from dpr_ray.compat import multi_set_batches

    a = ray.data.from_arrow(pa.table({"x": list(range(8))}))    # 4 batches @2
    b = ray.data.from_arrow(pa.table({"x": list(range(100, 104))}))  # 2
    got = list(multi_set_batches([a, b], batch_size=2,
                                 sampling_rates=[2.0, 1.0], shuffle=False))
    srcs = [s for _, s in got]
    assert srcs.count(0) == 8, srcs  # 4 batches × rate 2.0, cycled
    assert srcs.count(1) == 2, srcs
    rows_a = sum(t.num_rows for t, s in got if s == 0)
    assert rows_a == 16  # each source row delivered exactly rate× times


def test_qa_csv_and_ctx_tsv_edge_cells(tmp_path):
    """read_qa_csv: a non-list literal answers cell is ONE answer (the
    reference's bare eval would crash on ints and char-iterate quoted
    strings — documented divergence); a non-literal cell stays the raw
    string. read_ctx_tsv: strip('\"') like the reference
    (retriever_data.py:284) — asymmetric quotes removed too."""
    from dpr_ray.sources.qa_sources import read_ctx_tsv, read_qa_csv

    qa = tmp_path / "qa.tsv"
    qa.write_text(
        "what year\t1984\n"
        "capital\t'Paris'\n"
        "list q\t['a', 'b']\n"
        "raw q\tnot a literal\n"
    )
    t = read_qa_csv(str(qa))
    assert t["answers"].to_pylist() == [
        ["1984"], ["Paris"], ["a", "b"], ["not a literal"]
    ]

    # quote cases that SURVIVE csv parsing (leading quotes are csv's
    # own quoting, consumed before strip sees the field — identical in
    # the reference, which also uses a default csv.reader)
    ctx = tmp_path / "ctx.tsv"
    ctx.write_text(
        "id\ttext\ttitle\n"
        '1\tDarth Vader"\tSW\n'   # trailing stray quote
        '2\tx""\tT\n'             # doubled trailing quotes
        '3\t"quoted"\tU\n'        # csv-quoted: already clean
    )
    c = read_ctx_tsv(str(ctx))
    assert c["content"].to_pylist() == ["Darth Vader", "x", "quoted"]
