"""Local stand-in for the driver's correctness gate: run every QUERIES entry
and compare with ORACLE SQL via DuckDB (row count + order-insensitive values).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return pd.DataFrame(res)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                df[c] = df[c].map(repr)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    a, b = canon(ray_df), canon(sql_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH ray={list(a.columns)} sql={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH ray={len(a)} sql={len(b)}"
    # dtype *kind* must agree too: the driver hashes exact values, so an
    # int64 engine column vs a float64 oracle column (e.g. DuckDB HUGEINT
    # windowed sums) hash-fails even when every value is numerically equal.
    # pandas == coerces int vs float, which masked exactly that in round 3.
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if ka != kb and {ka, kb} <= {"i", "u", "f"} and "f" in {ka, kb}:
            return f"DTYPE MISMATCH col={c} ray={a[c].dtype} sql={b[c].dtype}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating):
            ok = np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True)
        else:
            ok = (pd.Series(av).fillna("<null>") == pd.Series(bv).fillna("<null>")).all()
        if not ok:
            bad = np.flatnonzero(pd.Series(av).fillna("<null>").ne(pd.Series(bv).fillna("<null>")))[:3]
            return f"VALUE MISMATCH col={c} rows={bad.tolist()} ray={av[bad][:3]} sql={bv[bad][:3]}"
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from logparser_ray.queries import ORACLE, QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} RAY ERROR: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in ORACLE:
            print(f"{name:28s} rows-only: {len(ray_df)} rows, cols={list(ray_df.columns)[:6]}")
            continue
        try:
            sql_df = con.sql(ORACLE[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} SQL ERROR: {e}")
            failures += 1
            continue
        verdict = compare(name, ray_df, sql_df)
        print(f"{name:28s} {verdict}  ({len(ray_df)} rows)")
        if verdict != "OK":
            failures += 1
    ray.shutdown()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
