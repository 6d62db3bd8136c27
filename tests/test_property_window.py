"""Property-based conformance of the window kernels: on arbitrary keyed
tables (duplicate order values, tiny/empty partitions, single-row inputs)
lag / rank / cumsum / moving-sum must match DuckDB's window functions."""

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

rows_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),    # key
        st.integers(min_value=0, max_value=8),    # order value (ties likely)
        st.integers(min_value=-50, max_value=50), # value
    ),
    min_size=1,
    max_size=60,
)


def _table(rows):
    k, o, v = zip(*rows)
    n = len(rows)
    return pa.table({
        "k": pa.array(k, pa.int64()),
        "o": pa.array(o, pa.int64()),
        "tie": pa.array(range(n), pa.int64()),  # unique → deterministic order
        "v": pa.array(v, pa.int64()),
    })


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_st, kind=st.sampled_from(["lag", "lead", "row_number",
                                           "rank", "dense_rank", "cumsum",
                                           "moving3"]))
def test_window_kernels_match_duckdb(ray_session, rows, kind):
    import ray.data as rd

    from odibel_ray.ops.aggregates import (
        window_cumsum,
        window_lag,
        window_moving_sum,
        window_rank,
    )

    t = _table(rows)
    ds = rd.from_arrow(t).repartition(3)
    if kind in ("lag", "lead"):
        off = 1 if kind == "lag" else -1
        got = window_lag(ds, ["k"], "o", ["v"], tie_cols=["tie"],
                         offset=off, num_buckets=4)
        out_col, sqlf = "v_prev", ("lag(v)" if kind == "lag" else "lead(v)")
        order = "ORDER BY o, tie"
    elif kind in ("row_number", "rank", "dense_rank"):
        got = window_rank(ds, ["k"], "o", kind=kind, tie_cols=["tie"],
                          num_buckets=4)
        out_col, sqlf = kind, f"{kind}()"
        order = "ORDER BY o, tie" if kind == "row_number" else "ORDER BY o"
    elif kind == "cumsum":
        got = window_cumsum(ds, ["k"], "o", "v", tie_cols=["tie"],
                            num_buckets=4)
        out_col, sqlf = "v_running", "sum(v)"
        order = "ORDER BY o, tie ROWS UNBOUNDED PRECEDING"
    else:
        got = window_moving_sum(ds, ["k"], "o", "v", 3, tie_cols=["tie"],
                                num_buckets=4)
        out_col, sqlf = "v_moving3", "sum(v)"
        order = "ORDER BY o, tie ROWS BETWEEN 2 PRECEDING AND CURRENT ROW"

    gdf = got.to_pandas().sort_values(["k", "o", "tie"], ignore_index=True)
    want = duckdb.arrow(t).query(
        "t", f"SELECT k, o, tie, v, {sqlf} OVER (PARTITION BY k {order}) AS r "
             "FROM t ORDER BY k, o, tie"
    ).fetchdf()
    np.testing.assert_array_equal(
        gdf[out_col].fillna(-999).to_numpy(), want.r.fillna(-999).to_numpy()
    )
