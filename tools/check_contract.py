"""Local stand-in for the driver's correctness check: run every
queries() entry at a given sf_dir, run its oracle_sql() in DuckDB over
the same parquet tables, and compare row-count + schema + sorted values.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(result):
    import pyarrow as pa
    import ray.data
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == np.uint64:
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name, ray_df, sql_df, float_tol=1e-9):
    a, b = normalize(ray_df), normalize(sql_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH: ray={list(a.columns)} sql={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH: ray={len(a)} sql={len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            ok = np.allclose(av.astype(float), bv.astype(float),
                             atol=float_tol, rtol=0, equal_nan=True)
            exact = (av.astype(float) == bv.astype(float)) | (
                np.isnan(av.astype(float)) & np.isnan(bv.astype(float)))
            if not ok:
                bad = np.flatnonzero(~np.isclose(av.astype(float), bv.astype(float),
                                                 atol=float_tol, rtol=0))[:3]
                return (f"VALUE MISMATCH col={c} rows={bad.tolist()} "
                        f"ray={av[bad]} sql={bv[bad]}")
            if not exact.all():
                print(f"    note[{name}.{c}]: {int((~exact).sum())} float "
                      f"rows differ in low bits (within tol)")
        else:
            if not (pd.Series(av).astype(object) == pd.Series(bv).astype(object)).all():
                bad = np.flatnonzero(pd.Series(av).astype(object).to_numpy()
                                     != pd.Series(bv).astype(object).to_numpy())[:3]
                return (f"VALUE MISMATCH col={c} rows={bad.tolist()} "
                        f"ray={av[bad]} sql={bv[bad]}")
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(ray_df)} rows ({dt:.1f}s) [rows-only]")
            continue
        sql_df = con.execute(oracles[name]).fetchdf()
        err = compare(name, ray_df, sql_df)
        if err:
            failures.append(name)
            print(f"FAIL  {name}: {err} ({dt:.1f}s)")
        else:
            print(f"ok    {name}: {len(ray_df)} rows ({dt:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
