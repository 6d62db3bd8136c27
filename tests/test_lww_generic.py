"""Key-generic LWW kernels vs DuckDB window-function oracles on the events
table (SURVEY.md §5 golden-output pattern, oracle = SQL instead of fixtures)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
KEYS = ["user_id", "event_type"]


def _changes():
    from odibel_ray.pipelines.queries import _events_as_changes

    return _events_as_changes(SF)


def _sql(q: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return con.execute(q).fetchdf()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), ignore_index=True)


def _assert_match(ds, sql):
    ray_df = _canon(ds.to_pandas())
    sql_df = _canon(_sql(sql))
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False, atol=1e-9, rtol=0)


CTE = """
WITH ev AS (
  SELECT user_id, event_type, event_id, round(value, 6) AS value, ts,
         CASE WHEN event_id % 17 = 0 THEN 'D' ELSE 'U' END AS op
  FROM events
)
"""


def test_keep_last_per_key_unit():
    from odibel_ray.cdc.lww import keep_last_per_key

    t = pa.table(
        {
            "k": ["a", "a", "b", "b", "b"],
            "lsn": [2, 1, 5, 9, 7],
            "v": [20, 10, 50, 90, 70],
        }
    )
    out = keep_last_per_key(t, ["k"], "lsn")
    assert out.to_pydict() == {"k": ["a", "b"], "lsn": [2, 9], "v": [20, 90]}


def test_lww_latest_matches_sql(ray_session):
    from odibel_ray.cdc.lww import lww_latest

    _assert_match(
        lww_latest(_changes(), KEYS, lsn_col="event_id"),
        CTE
        + """
SELECT user_id, event_type, event_id, value, ts
FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) rn FROM ev)
WHERE rn = 1 AND op <> 'D'
""",
    )


def test_lww_precompact_invariant(ray_session):
    """Pre-compaction (shuffle combiner) must not change the result."""
    from odibel_ray.cdc.lww import lww_latest

    a = _canon(lww_latest(_changes(), KEYS, lsn_col="event_id", precompact=True).to_pandas())
    b = _canon(lww_latest(_changes(), KEYS, lsn_col="event_id", precompact=False).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_bucket_count_invariance(ray_session):
    """Same result at 2 and 64 buckets (SURVEY.md §5 item 5)."""
    from odibel_ray.cdc.lww import lww_latest

    a = _canon(lww_latest(_changes(), KEYS, lsn_col="event_id", num_buckets=2).to_pandas())
    b = _canon(lww_latest(_changes(), KEYS, lsn_col="event_id", num_buckets=64).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_change_windows_matches_sql(ray_session):
    from odibel_ray.cdc.lww import change_windows

    ds = change_windows(
        _changes().select_columns(["op", "event_id", "user_id", "event_type", "value"]),
        KEYS,
        lsn_col="event_id",
    )
    _assert_match(
        ds,
        CTE
        + """
SELECT user_id, event_type, value, lsn_start, lsn_end FROM (
  SELECT user_id, event_type, value, event_id AS lsn_start,
         coalesce(lead(event_id) OVER (PARTITION BY user_id, event_type ORDER BY event_id),
                  9223372036854775807) AS lsn_end,
         op
  FROM ev)
WHERE op <> 'D'
""",
    )


def test_outer_diff_classification(ray_session):
    import ray.data as rd

    from odibel_ray.cdc.lww import outer_diff

    left = rd.from_arrow(
        pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    )
    right = rd.from_arrow(
        pa.table({"k": [2, 3, 4], "v": ["b", "CHANGED", "d"]})
    )
    rows = {(r["k"], r["diff"]) for r in outer_diff(left, right, ["k"], ["v"]).take_all()}
    assert rows == {(1, "deleted"), (3, "changed"), (4, "added")}


def test_change_feed_before_after(ray_session):
    import ray.data as rd

    from odibel_ray.cdc.lww import change_feed

    old = rd.from_arrow(
        pa.table({"k": [1, 2, 3, 5], "v": ["a", "b", "c", None]})
    )
    new = rd.from_arrow(
        pa.table({"k": [2, 3, 4, 5], "v": ["b", "CHANGED", "d", None]})
    )
    rows = {
        (r["k"], r["change"], r["v_before"], r["v_after"])
        for r in change_feed(old, new, ["k"], ["v"]).take_all()
    }
    # k=2 unchanged, k=5 null==null unchanged -> neither emitted
    assert rows == {
        (1, "delete", "a", None),
        (3, "update", "c", "CHANGED"),
        (4, "insert", None, "d"),
    }
