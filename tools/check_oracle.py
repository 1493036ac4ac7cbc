"""Driver-style harness: run every queries() entry at a given sf and compare
against oracle_sql() via DuckDB (row count + DTYPE + sorted-column value
equality). The dtype check mirrors the driver's type-aware hash: a DuckDB
HUGEINT (windowed/plain sum() over integers) coerces to float64/object in
pandas while the engine emits int64 — values compare equal but the driver's
hash differs (the round-2 pack_bins escape). Any such drift must fail HERE.
Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(obj):
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def raw_dtypes(df: pd.DataFrame) -> dict[str, str]:
    """Pre-coercion dtypes: the driver hashes typed values, so an
    object/float oracle column (e.g. DuckDB HUGEINT via pandas) must not
    silently compare equal to an engine int64 column after str()-coercion."""
    return {c: str(df[c].dtype) for c in sorted(df.columns)}


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got_raw = to_pandas(fn(sf_dir))
            got = canon(got_raw)
        except Exception as e:
            failures.append(name)
            print(f"[FAIL-run ] {name}: {type(e).__name__}: {e}")
            continue
        sql = sqls.get(name)
        if sql is None:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            exp_raw = con.sql(sql).df()
            exp = canon(exp_raw)
        except Exception as e:
            failures.append(name)
            print(f"[FAIL-sql ] {name}: {type(e).__name__}: {e}")
            continue
        if list(got.columns) != list(exp.columns):
            failures.append(name)
            print(f"[FAIL-cols] {name}: ray={list(got.columns)} sql={list(exp.columns)}")
            continue
        gd, ed = raw_dtypes(got_raw), raw_dtypes(exp_raw)
        if gd != ed:
            failures.append(name)
            diff = {c: (gd[c], ed[c]) for c in gd if gd[c] != ed.get(c)}
            print(f"[FAIL-type] {name}: ray_vs_sql dtypes differ: {diff}")
            continue
        if len(got) != len(exp):
            failures.append(name)
            print(f"[FAIL-rows] {name}: ray={len(got)} sql={len(exp)}")
            continue
        eq = True
        for c in got.columns:
            a, b = got[c].to_numpy(), exp[c].to_numpy()
            col_eq = (
                np.allclose(a, b, rtol=0, atol=0, equal_nan=True)
                if np.issubdtype(a.dtype, np.number) and np.issubdtype(b.dtype, np.number)
                else bool((a == b).all())
            )
            if not col_eq:
                eq = False
                bad = np.flatnonzero(a != b)[:3] if a.dtype == b.dtype else []
                print(f"[FAIL-val ] {name}.{c}: first diffs idx={list(bad)}")
                for i in list(bad):
                    print(f"    ray={got.iloc[i].to_dict()}")
                    print(f"    sql={exp.iloc[i].to_dict()}")
        if eq:
            print(f"[OK       ] {name}: {len(got)} rows")
        else:
            failures.append(name)
    ray.shutdown()
    print("FAILURES:", failures if failures else "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
