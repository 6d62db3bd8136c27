"""Driver-mimicking correctness harness: run every ``queries()`` entry and its
DuckDB oracle side-by-side, compare row count, column names, and
order-insensitive values. Usage: python tools/check_queries.py [sf_dir] [names...]"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        return f"SCHEMA ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}"
    if len(ray_df) != len(sql_df):
        return f"ROWS ray={len(ray_df)} sql={len(sql_df)}"
    a, b = canon(ray_df), canon(sql_df)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
    except AssertionError as e:
        return "VALUES " + str(e).splitlines()[0]
    return "OK"


def run_checks(sf_dir: str, only: set[str] | None = None) -> int:
    """Run every (or ``only`` the named) registry query against its DuckDB
    oracle; print one verdict line each; return the failure count. Ray must
    already be initialised by the caller (CLI main below / pytest fixture)."""
    from odibel_ray.pipelines.queries import ORACLES, QUERIES, ensure_transcript_log

    ensure_transcript_log(sf_dir)
    oracles = ORACLES(sf_dir)

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    import time

    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name:32s} RAY-ERROR {str(e).splitlines()[-1][:160]}")
            failures += 1
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"{name:32s} rows-only rows={len(ray_df)} ({dt:.1f}s)")
            continue
        try:
            sql_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"{name:32s} SQL-ERROR {str(e).splitlines()[-1][:160]}")
            failures += 1
            continue
        verdict = compare(name, ray_df, sql_df)
        print(f"{name:32s} {verdict} rows={len(ray_df)} ({dt:.1f}s)")
        if verdict != "OK":
            failures += 1
    return failures


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    return run_checks(sf_dir, only)


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(1 if rc else 0)
