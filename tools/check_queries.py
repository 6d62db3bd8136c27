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


def _dtype_class(t: pa.DataType) -> str:
    """Collapse an Arrow type to the equivalence class the driver's
    type-sensitive value hash distinguishes. Only same-class widening
    (e.g. int32 -> int64) is considered equivalent; decimal128 (DuckDB
    HUGEINT from ``sum(BIGINT)``) is its own class so mistyped oracles
    go red here exactly as they do in the driver."""
    if pa.types.is_signed_integer(t):
        return "int"
    if pa.types.is_unsigned_integer(t):
        return "uint"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def dtype_check(ray_tbl: pa.Table, sql_tbl: pa.Table) -> str | None:
    """Return an error string when any shared column's Arrow type class
    differs between the Ray result and the DuckDB oracle result."""
    sql_types = {f.name: f.type for f in sql_tbl.schema}
    for f in ray_tbl.schema:
        st = sql_types.get(f.name)
        if st is None:
            continue
        rc, sc = _dtype_class(f.type), _dtype_class(st)
        # an all-NULL column (e.g. CAST(NULL ...) edge) matches anything
        if "null" in (rc, sc):
            continue
        if rc != sc:
            return f"DTYPE col={f.name} ray={f.type} sql={st}"
    return None


def to_arrow(ray_res) -> pa.Table:
    """Materialize a queries() result (Dataset / DataFrame / Table) as Arrow."""
    if isinstance(ray_res, pa.Table):
        return ray_res
    if isinstance(ray_res, pd.DataFrame):
        return pa.Table.from_pandas(ray_res, preserve_index=False)
    import ray as _ray

    parts = list(_ray.get(ray_res.to_arrow_refs()))
    return pa.concat_tables(parts, promote_options="default") if parts else pa.table({})


def compare(name: str, ray_tbl: pa.Table, sql_rel) -> str:
    """ray_tbl: materialized Arrow result; sql_rel: duckdb relation result."""
    sql_tbl = sql_rel.arrow() if hasattr(sql_rel, "arrow") else sql_rel
    ray_df, sql_df = ray_tbl.to_pandas(), sql_tbl.to_pandas()
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        return f"SCHEMA ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}"
    if len(ray_df) != len(sql_df):
        return f"ROWS ray={len(ray_df)} sql={len(sql_df)}"
    err = dtype_check(ray_tbl, sql_tbl)
    if err:
        return err
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
            ray_tbl = to_arrow(fn(sf_dir))
            n_rows = ray_tbl.num_rows
        except Exception as e:
            print(f"{name:32s} RAY-ERROR {str(e).splitlines()[-1][:160]}")
            failures += 1
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"{name:32s} rows-only rows={n_rows} ({dt:.1f}s)")
            continue
        try:
            sql_rel = con.execute(sql)
        except Exception as e:
            print(f"{name:32s} SQL-ERROR {str(e).splitlines()[-1][:160]}")
            failures += 1
            continue
        verdict = compare(name, ray_tbl, sql_rel)
        print(f"{name:32s} {verdict} rows={n_rows} ({dt:.1f}s)")
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
