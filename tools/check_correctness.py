"""Local simulation of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf_dir, runs the matching
``oracle_sql()`` in DuckDB over the same parquet tables, and compares
row count + schema (column names) + order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
       python tools/check_correctness.py --coverage CORRECTNESS_rNN.json

``--coverage`` fails loudly when a registered ``queries()`` entry has no
row in the given driver artifact (round 4 silently dropped the last two
registry entries — VERDICT r04 §Missing 1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    import pyarrow as pa

    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    raise TypeError(type(obj))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                ok = ((av.astype(float) - bv.astype(float)).abs() < 1e-9) | (
                    av.isna() & bv.isna()
                )
            else:
                ok = (av.astype(str) == bv.astype(str))
            if not ok.all():
                i = (~ok).idxmax()
                problems.append(
                    f"values[{c}] first mismatch at row {i}: ray={av[i]!r} sql={bv[i]!r}"
                )
    return problems


def check_coverage(artifact_path: str) -> int:
    """Assert the driver artifact has a row for every registered query."""
    import json

    import __ray_entry__ as E

    registered = list(E.queries().keys())
    with open(artifact_path) as f:
        data = json.load(f)
    # the driver artifact is either {"queries": {name: {...}}} or a flat
    # {name: {...}} mapping — accept both shapes
    rows = data.get("queries", data) if isinstance(data, dict) else {}
    covered = set(rows.keys()) if isinstance(rows, dict) else set()
    missing = [q for q in registered if q not in covered]
    extra = sorted(covered - set(registered))
    print(f"registered={len(registered)} covered={len(covered & set(registered))}")
    if extra:
        print("extra (in artifact, not registered):", extra)
    if missing:
        print("MISSING from driver artifact:", missing)
        return 1
    print("coverage OK: every registered query has a driver row")
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--coverage":
        return check_coverage(sys.argv[2])
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok*   {name}: rows={len(ray_df)} ({dt:.1f}s) [rows-only]")
            continue
        try:
            sql_df = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            n_fail += 1
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems))
        else:
            print(f"ok    {name}: rows={len(ray_df)} ({dt:.1f}s)")
    ray.shutdown()
    print("FAILURES:", n_fail)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
