"""curate_corpus: every keep-rule exercised on a hand-built corpus."""

import pyarrow as pa
import ray

from dpr_ray.stages.curation import curate_corpus
from dpr_ray.stages.dedup import ngram_jaccard_pairs

GOOD = "the quick brown fox jumps over the lazy dog near the quiet river " * 2
DUP = GOOD + "extra tail words here"
SHORT = "tiny doc"
JUNK = "a a a a a a a a a a a a a a a a a a a a a a a a a a a a a a"


def _corpus():
    return ray.data.from_arrow(
        pa.table(
            {
                "docid": pa.array([1, 2, 3, 4], pa.int64()),
                "content": pa.array([GOOD, DUP, SHORT, JUNK], pa.string()),
            }
        )
    )


def test_curation_rules(ray_session):
    docs = _corpus()
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    out = (
        curate_corpus(docs, pairs, min_quality_i6=100_000, min_tokens=10)
        .to_pandas()
        .set_index("docid")
    )
    assert len(out) == 4
    # doc 1: good text, canonical of the {1,2} near-dup cluster → kept
    assert out.loc[1, "keep"] == 1 and out.loc[1, "is_canonical"] == 1
    # doc 2: near-dup of 1 (Jaccard > 0.5) → not canonical, dropped
    assert out.loc[2, "is_canonical"] == 0 and out.loc[2, "keep"] == 0
    # doc 3: too short
    assert out.loc[3, "n_tokens"] < 10 and out.loc[3, "keep"] == 0
    # doc 4: one repeated token → distinct ratio floor, quality below min
    assert out.loc[4, "quality_i6"] < 100_000 and out.loc[4, "keep"] == 0
    # audit columns always populated
    assert (out["lang_pred"] != "").all()


def test_curation_no_pairs(ray_session):
    docs = _corpus()
    empty = ray.data.from_arrow(
        pa.table(
            {
                "docid_a": pa.array([], pa.int64()),
                "docid_b": pa.array([], pa.int64()),
            }
        )
    )
    out = curate_corpus(docs, empty).to_pandas()
    assert (out["is_canonical"] == 1).all()


def test_duplicate_spans(ray_session):
    from dpr_ray.stages.dedup import duplicate_spans

    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = ray.data.from_arrow(
        pa.table(
            {
                "docid": pa.array([1, 2, 3, 4], pa.int64()),
                "content": pa.array(
                    [
                        f"start {span} end",
                        f"other prefix {span}",
                        "completely different words here nothing repeated at all",
                        f"{span} {span}",  # twice in one doc
                    ],
                    pa.string(),
                ),
            }
        )
    )
    out = duplicate_spans(docs, window=8).to_pandas()
    # windows inside the shared span region occur across docs 1, 2, 4; the
    # EXACT 8-token span itself appears in all three (4 occurrences: doc 4
    # has it twice)
    assert len(out) > 0
    assert (out["n_docs"] >= 2).all()
    top = out.sort_values(["n_docs", "n_occ"], ascending=False).iloc[0]
    assert top["n_docs"] == 3 and top["n_occ"] >= 4

def test_ngram_hashed_matches_string_variant(ray_session):
    """The 62-bit hashed-shingle variant must produce the identical pair
    set and jaccard values as the exact string variant (collisions are
    ~2^-62 per shingle pair; impossible on a 4-doc corpus)."""
    from dpr_ray.stages.dedup import ngram_jaccard_pairs_hashed

    docs = _corpus()
    want = (
        ngram_jaccard_pairs(docs, threshold=0.2)
        .to_pandas()
        .sort_values(["docid_a", "docid_b"])
        .reset_index(drop=True)
    )
    got = (
        ngram_jaccard_pairs_hashed(docs, threshold=0.2)
        .to_pandas()
        .sort_values(["docid_a", "docid_b"])
        .reset_index(drop=True)
    )
    assert len(want) > 0
    assert want.equals(got)

def test_decontaminate(ray_session):
    """Corpus doc 1 contains the eval span twice (2 hits), doc 2 is clean,
    doc 3 is shorter than the window (0 spans, 0 hits)."""
    from dpr_ray.stages.dedup import decontaminate

    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    test = ray.data.from_arrow(
        pa.table(
            {
                "docid": pa.array([100], pa.int64()),
                "content": pa.array([f"question about {span} indeed"], pa.string()),
            }
        )
    )
    corpus = ray.data.from_arrow(
        pa.table(
            {
                "docid": pa.array([1, 2, 3], pa.int64()),
                "content": pa.array(
                    [
                        f"{span} filler words {span}",
                        "completely different words here nothing repeated at all today",
                        "tiny doc",
                    ],
                    pa.string(),
                ),
            }
        )
    )
    out = (
        decontaminate(corpus, test, window=8)
        .to_pandas()
        .set_index("docid")
        .sort_index()
    )
    assert out.loc[1, "n_hits"] >= 2 and out.loc[1, "contaminated"] == 1
    assert out.loc[2, "n_hits"] == 0 and out.loc[2, "contaminated"] == 0
    assert out.loc[3, "n_spans"] == 0 and out.loc[3, "contaminated"] == 0

def test_repetition_stats(ray_session):
    from dpr_ray.stages.text_stats import RepetitionStats

    docs = ray.data.from_arrow(
        pa.table(
            {
                "docid": pa.array([1, 2, 3], pa.int64()),
                "content": pa.array(
                    [
                        "spam ham " * 10,          # one 2-gram dominates
                        "all these tokens appear only once here",
                        "x",                        # shorter than any window
                    ],
                    pa.string(),
                ),
            }
        )
    )
    out = (
        docs.map_batches(RepetitionStats(), batch_format="pyarrow")
        .to_pandas()
        .set_index("docid")
        .sort_index()
    )
    # doc 1: 20 tokens, 19 2-gram positions; "spam ham" occurs 10x
    assert abs(out.loc[1, "top2_frac"] - round(10 / 19, 6)) < 1e-9
    # every 3-gram position in doc 1 repeats (all spans are one of 2 kinds)
    assert out.loc[1, "dup3_frac"] == 1.0
    # doc 2: no repeated 2/3-grams -> top2 covers 1 position, dup3 = 0
    assert abs(out.loc[2, "top2_frac"] - round(1 / 6, 6)) < 1e-9
    assert out.loc[2, "dup3_frac"] == 0.0
    # doc 3: no windows at all
    assert out.loc[3, "top2_frac"] == 0.0 and out.loc[3, "dup3_frac"] == 0.0

def test_unigram_logprob(ray_session):
    import math

    from dpr_ray.stages.text_stats import unigram_logprob

    docs = ray.data.from_arrow(
        pa.table(
            {
                "docid": pa.array([1, 2, 3], pa.int64()),
                "content": pa.array(
                    ["the cat sat", "the the the", ""], pa.string()
                ),
            }
        )
    )
    out = (
        unigram_logprob(docs).to_pandas().set_index("docid").sort_index()
    )
    # corpus: the=4, cat=1, sat=1; total=6, V=3; p(t) = (cf+1)/9
    p = {"the": 5 / 9, "cat": 2 / 9, "sat": 2 / 9}
    exp1 = -(math.log(p["the"]) + math.log(p["cat"]) + math.log(p["sat"])) / 3
    exp2 = -math.log(p["the"])
    assert abs(out.loc[1, "nll"] - round(exp1, 6)) < 1e-9
    assert abs(out.loc[2, "nll"] - round(exp2, 6)) < 1e-9
    assert out.loc[3, "nll"] == 0.0 and out.loc[3, "n_tokens"] == 0
    # rare-token doc scores higher nll than the repetitive head-token doc
    assert out.loc[1, "nll"] > out.loc[2, "nll"]

    # vocab_cap: tail terms scored as unseen (cf=0), V unchanged
    capped = (
        unigram_logprob(docs, vocab_cap=1)
        .to_pandas()
        .set_index("docid")
        .sort_index()
    )
    exp1c = -(math.log(5 / 9) + 2 * math.log(1 / 9)) / 3
    assert abs(capped.loc[1, "nll"] - round(exp1c, 6)) < 1e-9
    assert capped.loc[2, "nll"] == out.loc[2, "nll"]

def test_unigram_lm_pull_bounded(ray_session):
    """The LM collection must never pull the full vocabulary to the driver:
    with vocab_cap=V the take_all sees at most V+1 rows (top-V + one stats
    sentinel), while V/total still count the UNCAPPED vocabulary."""
    from dpr_ray.stages.text_stats import _collect_lm, _partial_term_counts

    docs = ray.data.from_arrow(
        pa.table(
            {
                "docid": pa.array(list(range(40)), pa.int64()),
                "content": pa.array(
                    [f"common w{i} w{i} unique{i}" for i in range(40)],
                    pa.string(),
                ),
            }
        )
    ).repartition(8)
    summed = _partial_term_counts(docs, "content")
    cf, total, vocab, pulled = _collect_lm(summed, vocab_cap=3)
    assert pulled <= 3 + 1
    assert len(cf) == 3
    assert cf["common"] == 40  # global head term survives the local caps
    assert vocab == 81  # common + 40×w{i} + 40×unique{i} — uncapped V
    assert total == 40 * 4
    # uncapped path unchanged
    cf_all, total_all, vocab_all, _ = _collect_lm(
        _partial_term_counts(docs, "content"), None
    )
    assert len(cf_all) == 81 and total_all == total and vocab_all == vocab
    assert all(cf_all[t] == c for t, c in cf.items())


def test_tfidf_topk_hand_computed(ray_session):
    import math

    from dpr_ray.stages.text_stats import tfidf_topk

    docs = ray.data.from_arrow(
        pa.table(
            {
                "docid": pa.array([1, 2, 3], pa.int64()),
                "content": pa.array(
                    ["cat cat dog", "dog fish", "fish fish fish"],
                    pa.string(),
                ),
            }
        )
    ).repartition(3)
    out = (
        tfidf_topk(docs, k=2)
        .to_pandas()
        .sort_values(["docid", "rank"], ignore_index=True)
    )
    # N=3; df: cat=1, dog=2, fish=2
    def i6(tf, df):
        return round(round(tf * math.log(3 / df), 9) * 1e6)

    assert len(out) == 5  # doc 3 has a single distinct term
    d1 = out[out.docid == 1]
    assert list(d1.term) == ["cat", "dog"]  # 2·ln3 > 1·ln1.5
    assert list(d1.tfidf_i6) == [i6(2, 1), i6(1, 2)]
    assert list(d1["rank"]) == [1, 2]
    d3 = out[out.docid == 3]
    assert list(d3.term) == ["fish"] and d3.iloc[0].tfidf_i6 == i6(3, 2)
    # doc 2: dog and fish tie at 1·ln(1.5) → term asc breaks the tie
    d2 = out[out.docid == 2]
    assert list(d2.term) == ["dog", "fish"]
    assert list(d2.tf) == [1, 1] and list(d2.df) == [2, 2]


def test_bpe_pattern_re2_parity():
    """BPE_PATTERN must mean the same thing to python re (engine) and
    DuckDB's RE2 (oracle) — disjoint char-class branches guarantee it;
    this guards the pattern against edits that break the property."""
    import re

    import duckdb

    from dpr_ray.entrypoints import BPE_PATTERN

    cases = [
        "", " ", "a b", "don't stop-me now!!", "é ü ñ 漢字", "x1y2z3",
        "...---...", "tab\tnewline\nmix  spaces", "a" * 100 + "!" + "9" * 50,
        # chars where python \s and RE2 \s DISAGREE — the pattern must use
        # an explicit whitespace class so both engines see the same thing
        "a\vb", "a\x1cb", "a\x1db", "a\xa0b", "x y", "\v\v", "a\x85b",
    ]
    con = duckdb.connect()
    pat = re.compile(BPE_PATTERN)
    for t in cases:
        py = len(pat.findall(t))
        sql = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [t, BPE_PATTERN]
        ).fetchone()[0]
        assert py == sql, (t, py, sql)


def test_curate_job_empty_keepset(tmp_path):
    """curate_job with a quality bar nothing can clear: the verdicts
    phase writes only keep=0/, the corpus phase must short-circuit
    (no keep=1/ directory exists) instead of crashing, and a rerun
    resumes both phases from markers. Subprocess with its own Ray
    session from an off-path cwd (the shipping-trap drive pattern)."""
    import json
    import os
    import subprocess
    import sys

    out_dir = str(tmp_path / "curated")
    cmd = [
        sys.executable, "/root/repo/tools/curate_job.py",
        "--docs", "/root/testdata/sf0.001/documents.parquet",
        "--id-col", "doc_id", "--text-col", "text",
        "--out-dir", out_dir, "--write-corpus",
        "--min-quality-i6", "2000000",  # quality_i6 <= 1e6 → keep nobody
        "--num-cpus", "2",
    ]
    env = dict(os.environ, RAY_ADDRESS="local")
    r1 = subprocess.run(cmd, cwd=str(tmp_path), capture_output=True,
                        text=True, timeout=300, env=env)
    assert r1.returncode == 0, r1.stdout + r1.stderr
    rep1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert rep1["kept_rows"] == 0
    assert not os.path.isdir(os.path.join(out_dir, "verdicts", "keep=1"))
    assert os.path.exists(os.path.join(out_dir, "verdicts", "_SUCCESS"))
    assert os.path.exists(os.path.join(out_dir, "corpus", "_SUCCESS"))
    # rerun: both phases resume from markers, nothing recomputed
    r2 = subprocess.run(cmd, cwd=str(tmp_path), capture_output=True,
                        text=True, timeout=300, env=env)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    rep2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert rep2["verdicts"] == "resumed (marker present)"
    assert rep2["corpus"] == "resumed (marker present)"
    # markers are SIGNED: a rerun with a different quality bar must
    # RECOMPUTE, not serve the stale all-dropped verdicts (the unsigned-
    # marker staleness class fixed on every index resume marker)
    cmd3 = list(cmd)
    cmd3[cmd3.index("--min-quality-i6") + 1] = "0"  # keep everybody
    r3 = subprocess.run(cmd3, cwd=str(tmp_path), capture_output=True,
                        text=True, timeout=300, env=env)
    assert r3.returncode == 0, r3.stdout + r3.stderr
    rep3 = json.loads(r3.stdout.strip().splitlines()[-1])
    assert "verdict_rows" in rep3, rep3  # recomputed, not resumed
    assert rep3["kept_rows"] > 0, rep3


def test_qualitylang_fused_equals_separate_stages(ray_session):
    """QualityLang tokenizes ONCE and must stay byte-identical to running
    TextQuality and LangId separately (each of which tokenizes itself)."""
    import pyarrow as pa

    from dpr_ray.stages.curation import QualityLang
    from dpr_ray.stages.text_stats import LangId, TextQuality

    tbl = pa.table(
        {
            "docid": pa.array([1, 2, 3, 4], pa.int64()),
            "content": [
                "the quick brown fox the the",
                "le chat et le chien et le",
                "",
                "zzz qqq zzz qqq unique tokens here altogether now",
            ],
        }
    )
    fused = QualityLang()(tbl)
    q = TextQuality()(tbl)
    lang = LangId()(tbl)
    for c in q.column_names:
        assert fused[c].equals(q[c]), c
    assert fused["lang_pred"].equals(lang["lang_pred"])


def test_curate_job_uint64_ids_kept_exactly(tmp_path):
    """KeepFilter must compare ids in int64 exactly: int64 keep-ids vs a
    raw uint64 id column promoted searchsorted/== to float64 and SILENTLY
    dropped kept docs with adjacent ids >= 2^53 (both rounded to the same
    float). Adjacent 2^60 ids with a keep-everything bar: every doc must
    reach the written corpus."""
    import json
    import os
    import subprocess
    import sys

    import numpy as np
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    n = 6
    ids = np.array([1, 2, (1 << 60), (1 << 60) + 1, (1 << 60) + 2, 7],
                   np.uint64)
    docs = pa.table(
        {
            "doc_id": pa.array(ids, pa.uint64()),
            # English stopwords so lang_pred != 'und' (the keep rule
            # drops undetermined-language docs regardless of quality)
            "text": [
                "the and of is in " + " ".join(
                    f"tok{i}w{j}" for j in range(30)
                ) for i in range(n)
            ],
        }
    )
    dpath = str(tmp_path / "docs.parquet")
    pq.write_table(docs, dpath)
    out_dir = str(tmp_path / "curated")
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/curate_job.py",
         "--docs", dpath, "--out-dir", out_dir, "--write-corpus",
         "--min-quality-i6", "0", "--min-tokens", "1", "--num-cpus", "2"],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=300,
        env=dict(os.environ, RAY_ADDRESS="local"),
    )
    assert r.returncode == 0, r.stdout + r.stderr
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["kept_rows"] == n, rep
    back = pads.dataset(
        os.path.join(out_dir, "corpus"), partitioning="hive"
    ).to_table(columns=["doc_id"])
    got = sorted(int(v) for v in back["doc_id"].to_pylist())
    assert got == sorted(int(v) for v in ids), got
