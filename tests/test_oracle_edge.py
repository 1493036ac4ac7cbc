"""Oracle-parity sweep over structurally extreme IN-CONTRACT text.

The SQL oracles mirror the engine over the input_hint corpus shape
(non-empty docs of non-empty single-space-separated lowercase-ASCII
tokens — see the oracle-text-contract note in dpr_ray/entrypoints.py).
This sweep rewrites 60 of sf0.001's 500 documents with extreme shapes
that stay inside that contract — a 10k-char single token, one token
repeated 500x, 2000 distinct tokens in one doc, single-char docs,
numeric tokens with leading zeros, head-term floods — and runs the full
57-entry tools/check_oracle.py comparison. Any failure is a REAL
engine↔oracle divergence, not a fixture-shape artifact (out-of-contract
text intentionally diverges: the space-split oracle keeps empty pieces
the analyzer drops).

Also pinned here fast: the Horner-hash SQL must be TOTAL on
out-of-contract text — DuckDB's unicode('') is -1, which used to crash
the hashed-shingle oracle with a negative left-shift on any corpus
containing an empty token.
"""

import glob
import os
import subprocess
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EDGE = [
    "x" * 10000,
    ("dup " * 500).strip(),
    "a",
    "0 1 2 3 4 5 6 7 8 9 00 01 000",
    "z9 9z a0a 0a0",
    ("a b " * 400).strip(),
    " ".join(f"w{i}" for i in range(2000)),
    "the the the scan scan merge",
    ("q " * 63).strip(),
    "single",
]


def _write_edge_fixture(dst: str) -> None:
    src = "/root/testdata/sf0.001"
    os.makedirs(dst, exist_ok=True)
    for p in glob.glob(os.path.join(src, "*.parquet")):
        base = os.path.basename(p)
        if base != "documents.parquet":
            t = pq.read_table(p)
            pq.write_table(t, os.path.join(dst, base))
    t = pq.read_table(os.path.join(src, "documents.parquet"))
    texts = t["text"].to_pylist()
    for i in range(60):
        texts[(i * 8 + 3) % len(texts)] = (
            EDGE[i % len(EDGE)] + (f" tail{i}" if i % 3 else "")
        ).strip()
    pq.write_table(
        pa.table(
            {
                "doc_id": t["doc_id"],
                "text": pa.array(texts, pa.string()),
                "lang": t["lang"],
                "source": t["source"],
                "n_chars": pa.array([len(x) for x in texts], pa.int64()),
            }
        ),
        os.path.join(dst, "documents.parquet"),
    )


@pytest.mark.skipif(
    not os.environ.get("DPR_RAY_SLOW"),
    reason="full 57-entry edge-text oracle sweep: run with DPR_RAY_SLOW=1",
)
def test_oracle_parity_on_edge_text(tmp_path):
    if not os.path.isdir("/root/testdata/sf0.001"):
        pytest.skip("testdata not present")
    dst = str(tmp_path / "sf_edge")
    _write_edge_fixture(dst)
    # subprocess: check_oracle owns its own Ray session (driver protocol)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"), dst],
        capture_output=True, text=True, timeout=900, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert "FAILURES: none" in r.stdout, r.stdout[-3000:]


def test_horner_hash_sql_total_on_empty_tokens():
    """unicode('') = -1 in DuckDB; the rolling-hash SQL must map an empty
    token to 0 (the python fold over zero characters) instead of shifting
    a negative. Checks value parity per token, python vs SQL."""
    from dpr_ray.entrypoints import _ROLL131

    def py_roll(tok: str) -> int:
        h = 0
        for c in tok:
            h = (h * 131 + ord(c)) % 2147483647
        return h

    con = duckdb.connect()
    for tok in ["", "a", "abc", "x" * 500, "0", "\x00y", "café", "日本"]:
        got = con.execute(
            "SELECT " + _ROLL131.format(s="?"), [tok]
        ).fetchone()[0]
        assert got == py_roll(tok), repr(tok)
