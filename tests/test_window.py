"""window_lag (SQL LAG OVER PARTITION BY) and multi-key partition
boundaries (odibel_ray/ops/aggregates.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from odibel_ray.ops.aggregates import sessionize, window_lag


def test_window_lag_matches_duckdb(ray_session):
    rng = np.random.default_rng(5)
    n = 2000
    t = pa.table({
        "k": rng.integers(0, 50, n).astype(np.int64),
        "o": rng.permutation(n).astype(np.int64),
        "v": rng.integers(0, 1000, n).astype(np.int64),
    })
    got = (
        window_lag(ray.data.from_arrow(t).repartition(4), ["k"], "o", ["v"],
                   num_buckets=8)
        .to_pandas().sort_values(["k", "o"], ignore_index=True)
    )
    import duckdb
    want = duckdb.arrow(t).query(
        "t", "SELECT k, o, v, lag(v) OVER (PARTITION BY k ORDER BY o) AS v_prev "
             "FROM t ORDER BY k, o"
    ).fetchdf()
    assert got.v_prev.isna().equals(want.v_prev.isna())
    np.testing.assert_array_equal(
        got.v_prev.fillna(-1).to_numpy(), want.v_prev.fillna(-1).to_numpy()
    )


def test_window_lag_multi_key_and_multi_col(ray_session):
    t = pa.table({
        "a": ["x", "x", "x", "y"], "b": [1, 1, 2, 1],
        "o": [2, 1, 1, 1], "v": [20, 10, 99, 7], "s": ["B", "A", "C", "D"],
    })
    got = (
        window_lag(ray.data.from_arrow(t), ["a", "b"], "o", ["v", "s"],
                   num_buckets=2)
        .to_pandas().sort_values(["a", "b", "o"], ignore_index=True)
    )
    # partitions: (x,1) -> rows o=1,2 ; (x,2) and (y,1) are singletons
    assert got.v_prev.tolist()[0] != got.v_prev.tolist()[0]  # NaN first row
    assert got.v_prev.tolist()[1] == 10 and got.s_prev.tolist()[1] == "A"
    assert np.isnan(got.v_prev.tolist()[2]) and np.isnan(got.v_prev.tolist()[3])


def test_window_lag_tie_cols_deterministic(ray_session):
    t = pa.table({"k": ["a"] * 3, "o": [1, 1, 1], "tie": [3, 1, 2],
                  "v": [30, 10, 20]})
    got = (
        window_lag(ray.data.from_arrow(t), ["k"], "o", ["v"],
                   tie_cols=["tie"], num_buckets=1)
        .to_pandas().sort_values("tie", ignore_index=True)
    )
    assert got.v_prev.fillna(-1).tolist() == [-1, 10, 20]


def test_window_lag_offset_and_lead(ray_session):
    rng = np.random.default_rng(11)
    n = 800
    t = pa.table({
        "k": rng.integers(0, 20, n).astype(np.int64),
        "o": rng.permutation(n).astype(np.int64),
        "v": rng.integers(0, 100, n).astype(np.int64),
    })
    import duckdb
    for off, sqlw in [(2, "lag(v, 2)"), (-1, "lead(v, 1)")]:
        got = (
            window_lag(ray.data.from_arrow(t).repartition(3), ["k"], "o",
                       ["v"], offset=off, num_buckets=4)
            .to_pandas().sort_values(["k", "o"], ignore_index=True)
        )
        want = duckdb.arrow(t).query(
            "t", f"SELECT k, o, v, {sqlw} OVER (PARTITION BY k ORDER BY o) "
                 "AS v_prev FROM t ORDER BY k, o"
        ).fetchdf()
        np.testing.assert_array_equal(
            got.v_prev.fillna(-1).to_numpy(), want.v_prev.fillna(-1).to_numpy()
        )


def test_window_cumsum_matches_duckdb(ray_session):
    rng = np.random.default_rng(9)
    n = 1500
    t = pa.table({
        "k": rng.integers(0, 40, n).astype(np.int64),
        "o": rng.permutation(n).astype(np.int64),
        "v": rng.integers(-50, 50, n).astype(np.int64),
    })
    from odibel_ray.ops.aggregates import window_cumsum
    got = (
        window_cumsum(ray.data.from_arrow(t).repartition(4), ["k"], "o", "v",
                      num_buckets=8)
        .to_pandas().sort_values(["k", "o"], ignore_index=True)
    )
    import duckdb
    want = duckdb.arrow(t).query(
        "t", "SELECT k, o, v, sum(v) OVER (PARTITION BY k ORDER BY o "
             "ROWS UNBOUNDED PRECEDING) AS v_running FROM t ORDER BY k, o"
    ).fetchdf()
    np.testing.assert_array_equal(got.v_running.to_numpy(),
                                  want.v_running.to_numpy())


def test_pivot_counts_and_sums(ray_session):
    from odibel_ray.ops.aggregates import pivot_counts
    t = pa.table({
        "u": [1, 1, 1, 2, 2, 3],
        "c": ["a", "a", "b", "b", "zz", None],  # zz/None outside categories
        "v": [10, 20, 5, 7, 99, 99],
    })
    got = (
        pivot_counts(ray.data.from_arrow(t).repartition(3), ["u"], "c",
                     ["a", "b"])
        .to_pandas().sort_values("u", ignore_index=True)
    )
    assert got.n_a.tolist() == [2, 0, 0]
    assert got.n_b.tolist() == [1, 1, 0]
    sums = (
        pivot_counts(ray.data.from_arrow(t), ["u"], "c", ["a", "b"],
                     value_col="v")
        .to_pandas().sort_values("u", ignore_index=True)
    )
    assert sums.n_a.tolist() == [30, 0, 0]
    assert sums.n_b.tolist() == [5, 7, 0]


def test_window_rank_kinds_match_duckdb(ray_session):
    from odibel_ray.ops.aggregates import window_rank
    rng = np.random.default_rng(8)
    n = 1200
    t = pa.table({
        "k": rng.integers(0, 30, n).astype(np.int64),
        "o": rng.integers(0, 15, n).astype(np.int64),  # many ties
        "tie": np.arange(n, dtype=np.int64),
    })
    import duckdb
    for kind, sqlf in [("row_number", "row_number()"), ("rank", "rank()"),
                       ("dense_rank", "dense_rank()")]:
        order = "ORDER BY o, tie" if kind == "row_number" else "ORDER BY o"
        got = (
            window_rank(ray.data.from_arrow(t).repartition(3), ["k"], "o",
                        kind=kind, tie_cols=["tie"], num_buckets=4)
            .to_pandas().sort_values(["k", "o", "tie"], ignore_index=True)
        )
        want = duckdb.arrow(t).query(
            "t", f"SELECT k, o, tie, {sqlf} OVER (PARTITION BY k {order}) "
                 "AS r FROM t ORDER BY k, o, tie"
        ).fetchdf()
        np.testing.assert_array_equal(got[kind].to_numpy(),
                                      want.r.to_numpy(), err_msg=kind)


def test_rollup_counts_matches_duckdb(ray_session):
    from odibel_ray.ops.aggregates import rollup_counts
    rng = np.random.default_rng(4)
    n = 500
    t = pa.table({
        "a": rng.choice(["x", "y", "z"], n).tolist(),
        "b": rng.integers(0, 4, n).astype(np.int64),
        "v": rng.integers(0, 100, n).astype(np.int64),
    })
    got = (
        rollup_counts(ray.data.from_arrow(t).repartition(3), ["a", "b"],
                      value_col="v")
        .to_pandas()
        .sort_values(["a", "b", "n"], ignore_index=True, na_position="last")
    )
    import duckdb
    want = duckdb.arrow(t).query(
        "t", "SELECT a, b, count(*) AS n, sum(v) AS sum_v FROM t "
             "GROUP BY ROLLUP (a, b) ORDER BY a NULLS LAST, b NULLS LAST, n"
    ).fetchdf()
    assert len(got) == len(want)
    np.testing.assert_array_equal(got.n.to_numpy(), want.n.to_numpy())
    np.testing.assert_array_equal(got.sum_v.to_numpy(),
                                  want.sum_v.astype("int64").to_numpy())
    assert got.a.isna().sum() == 1 and got.b.isna().sum() == 4  # 3 subtotals + total


def test_window_sums_skip_nulls_like_sql(ray_session):
    # SQL SUM OVER skips NULL values; the running/moving sum is NULL only
    # while the frame has seen no non-null value. Int columns stay exact.
    from odibel_ray.ops.aggregates import window_cumsum, window_moving_sum
    import duckdb
    t = pa.table({
        "k": ["a", "a", "a", "a", "b", "b", "c"],
        "o": [1, 2, 3, 4, 1, 2, 1],
        "v": pa.array([None, 3, None, 4, 10, None, None], pa.int64()),
    })
    got = (
        window_cumsum(ray.data.from_arrow(t).repartition(2), ["k"], "o", "v",
                      num_buckets=2)
        .to_pandas().sort_values(["k", "o"], ignore_index=True)
    )
    want = duckdb.arrow(t).query(
        "t", "SELECT k, o, sum(v) OVER (PARTITION BY k ORDER BY o "
             "ROWS UNBOUNDED PRECEDING) AS r FROM t ORDER BY k, o"
    ).fetchdf()
    np.testing.assert_array_equal(got.v_running.to_numpy(dtype=float),
                                  want.r.to_numpy(dtype=float))
    got = (
        window_moving_sum(ray.data.from_arrow(t).repartition(2), ["k"], "o",
                          "v", 2, num_buckets=2)
        .to_pandas().sort_values(["k", "o"], ignore_index=True)
    )
    want = duckdb.arrow(t).query(
        "t", "SELECT k, o, sum(v) OVER (PARTITION BY k ORDER BY o "
             "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS m "
             "FROM t ORDER BY k, o"
    ).fetchdf()
    np.testing.assert_array_equal(got.v_moving2.to_numpy(dtype=float),
                                  want.m.to_numpy(dtype=float))


def test_window_rank_null_order_values_are_peers(ray_session):
    # SQL rank/dense_rank treat NULL order values as equal (peers)
    from odibel_ray.ops.aggregates import window_rank
    import duckdb
    t = pa.table({
        "k": ["a"] * 5,
        "o": pa.array([3, None, None, 3, 1], pa.int64()),
        "tie": [0, 1, 2, 3, 4],
    })
    for kind in ("rank", "dense_rank"):
        got = (
            window_rank(ray.data.from_arrow(t), ["k"], "o", kind=kind,
                        tie_cols=["tie"], num_buckets=1)
            .to_pandas().sort_values(["o", "tie"], ignore_index=True,
                                     na_position="last")
        )
        want = duckdb.arrow(t).query(
            "t", f"SELECT o, tie, {kind}() OVER (PARTITION BY k ORDER BY o) "
                 "AS r FROM t ORDER BY o NULLS LAST, tie"
        ).fetchdf()
        np.testing.assert_array_equal(got[kind].to_numpy(),
                                      want.r.to_numpy(), err_msg=kind)


def test_rollup_counts_empty_input(ray_session):
    # SQL GROUP BY ROLLUP/CUBE over zero rows: one grand-total row, COUNT 0
    from odibel_ray.ops.aggregates import rollup_counts
    t = pa.table({"a": pa.array([], pa.string()),
                  "b": pa.array([], pa.string()),
                  "v": pa.array([], pa.float64())})
    for grouping in ("rollup", "cube"):
        rows = rollup_counts(ray.data.from_arrow(t), ["a", "b"],
                             value_col="v", grouping=grouping).take_all()
        assert len(rows) == 1, grouping
        assert rows[0]["a"] is None and rows[0]["b"] is None
        assert rows[0]["n"] == 0 and rows[0]["sum_v"] is None


def test_window_moving_sum_matches_duckdb(ray_session):
    from odibel_ray.ops.aggregates import window_moving_sum
    rng = np.random.default_rng(14)
    n = 1000
    t = pa.table({
        "k": rng.integers(0, 25, n).astype(np.int64),
        "o": rng.permutation(n).astype(np.int64),
        "v": rng.integers(-20, 20, n).astype(np.int64),
    })
    import duckdb
    for w in (1, 3, 7):
        got = (
            window_moving_sum(ray.data.from_arrow(t).repartition(3), ["k"],
                              "o", "v", w, num_buckets=4)
            .to_pandas().sort_values(["k", "o"], ignore_index=True)
        )
        want = duckdb.arrow(t).query(
            "t", f"SELECT k, o, v, sum(v) OVER (PARTITION BY k ORDER BY o "
                 f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS m "
                 "FROM t ORDER BY k, o"
        ).fetchdf()
        np.testing.assert_array_equal(
            got[f"v_moving{w}"].to_numpy(), want.m.to_numpy(), err_msg=str(w)
        )


def test_window_lag_null_keys_one_partition(ray_session):
    # SQL PARTITION BY groups NULL keys together — null-safe boundaries
    t = pa.table({"k": [None, None, "a"], "o": [1, 2, 1], "v": [10, 20, 5]})
    got = (
        window_lag(ray.data.from_arrow(t), ["k"], "o", ["v"], num_buckets=1)
        .to_pandas().sort_values(["o", "v"], ignore_index=True)
    )
    by_v = got.set_index("v")["v_prev"]
    assert np.isnan(by_v[10]) and by_v[20] == 10  # nulls share a partition
    assert np.isnan(by_v[5])


def test_cube_counts_matches_duckdb(ray_session):
    from odibel_ray.ops.aggregates import rollup_counts
    rng = np.random.default_rng(6)
    n = 400
    t = pa.table({
        "a": rng.choice(["x", "y"], n).tolist(),
        "b": rng.integers(0, 3, n).astype(np.int64),
        "v": rng.integers(0, 50, n).astype(np.int64),
    })
    got = (
        rollup_counts(ray.data.from_arrow(t).repartition(2), ["a", "b"],
                      value_col="v", grouping="cube")
        .to_pandas()
        .sort_values(["a", "b", "n"], ignore_index=True, na_position="last")
    )
    import duckdb
    want = duckdb.arrow(t).query(
        "t", "SELECT a, b, count(*) AS n, sum(v) AS sum_v FROM t "
             "GROUP BY CUBE (a, b) ORDER BY a NULLS LAST, b NULLS LAST, n"
    ).fetchdf()
    assert len(got) == len(want)
    np.testing.assert_array_equal(got.n.to_numpy(), want.n.to_numpy())
    np.testing.assert_array_equal(got.sum_v.to_numpy(),
                                  want.sum_v.astype("int64").to_numpy())


def test_sessionize_multi_key_boundaries(ray_session):
    # regression: a boundary is where ANY key component differs — (a,1)->(a,2)
    # must start a new partition even though the first key is equal
    t = pa.table({"k": ["a", "a", "a", "a"], "j": [1, 1, 2, 2],
                  "ts": [0, 5, 6, 100], "eid": [0, 1, 2, 3]})
    out = (
        sessionize(ray.data.from_arrow(t), ["k", "j"], "ts", gap_us=10,
                   tie_cols=["eid"])
        .to_pandas().sort_values("eid", ignore_index=True)
    )
    assert out.session_id.tolist() == [0, 0, 0, 1]


def test_grouping_sets_matches_duckdb(ray_session):
    from odibel_ray.ops.aggregates import rollup_counts
    rng = np.random.default_rng(8)
    n = 400
    t = pa.table({
        "a": rng.choice(["x", "y", "z"], n).tolist(),
        "b": rng.integers(0, 3, n).astype(np.int64),
        "v": rng.integers(0, 50, n).astype(np.int64),
    })
    # includes a duplicate set — SQL emits the duplicate subtotal rows too
    sets = [["a", "b"], ["b"], [], ["b"]]
    got = (
        rollup_counts(ray.data.from_arrow(t).repartition(2), ["a", "b"],
                      value_col="v", grouping="sets", sets=sets)
        .to_pandas()
        .sort_values(["a", "b", "n"], ignore_index=True, na_position="last")
    )
    import duckdb
    want = duckdb.arrow(t).query(
        "t", "SELECT a, b, count(*) AS n, sum(v) AS sum_v FROM t "
             "GROUP BY GROUPING SETS ((a, b), (b), (), (b)) "
             "ORDER BY a NULLS LAST, b NULLS LAST, n"
    ).fetchdf()
    assert len(got) == len(want)
    np.testing.assert_array_equal(got.n.to_numpy(), want.n.to_numpy())
    np.testing.assert_array_equal(got.sum_v.to_numpy(),
                                  want.sum_v.astype("int64").to_numpy())


def test_grouping_sets_validation(ray_session):
    from odibel_ray.ops.aggregates import rollup_counts
    t = pa.table({"a": ["x"], "b": [1], "v": [2]})
    ds = ray.data.from_arrow(t)
    with pytest.raises(ValueError, match="requires sets"):
        rollup_counts(ds, ["a", "b"], grouping="sets")
    with pytest.raises(ValueError, match="not a subset"):
        rollup_counts(ds, ["a", "b"], grouping="sets", sets=[["a", "zz"]])
    with pytest.raises(ValueError, match="only valid"):
        rollup_counts(ds, ["a", "b"], grouping="rollup", sets=[["a"]])
    with pytest.raises(ValueError, match="at least one"):
        rollup_counts(ds, ["a", "b"], grouping="sets", sets=[]).take_all()


def test_grouping_sets_total_only(ray_session):
    from odibel_ray.ops.aggregates import rollup_counts
    t = pa.table({"a": ["x", "y"], "b": [1, 2], "v": [5, 7]})
    rows = rollup_counts(ray.data.from_arrow(t), ["a", "b"], value_col="v",
                         grouping="sets", sets=[[]]).take_all()
    assert len(rows) == 1
    assert rows[0]["a"] is None and rows[0]["n"] == 2 and rows[0]["sum_v"] == 12


def test_window_ntile_remainder_rule(ray_session):
    """SQL NTILE: first size%n tiles get one extra row; n > size gives
    row i tile i+1."""
    import pyarrow as pa
    import ray.data as rd

    from odibel_ray.ops.aggregates import window_ntile

    t = pa.table(
        {"k": pa.array(["a"] * 7 + ["b"] * 2),
         "o": pa.array(list(range(7)) + [0, 1], pa.int64())}
    )
    rows = window_ntile(
        rd.from_arrow(t), ["k"], "o", 3, out="t3"
    ).take_all()
    got = {(r["k"], r["o"]): r["t3"] for r in rows}
    # size 7, n 3 -> tiles of 3,2,2
    assert [got[("a", i)] for i in range(7)] == [1, 1, 1, 2, 2, 3, 3]
    # size 2, n 3 -> rows get tiles 1, 2
    assert [got[("b", i)] for i in range(2)] == [1, 2]


def test_window_percent_rank_ties_and_singleton(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from odibel_ray.ops.aggregates import window_percent_rank

    t = pa.table(
        {"k": pa.array(["a"] * 5 + ["s"]),
         "o": pa.array([10, 10, 20, 20, 30, 1], pa.int64()),
         "i": pa.array(range(6), pa.int64())}
    )
    rows = window_percent_rank(
        rd.from_arrow(t), ["k"], "o", tie_cols=["i"], out="pr"
    ).take_all()
    got = {r["i"]: r["pr"] for r in rows}
    # ranks: 1,1,3,3,5 over size 5 -> (r-1)/4
    assert [got[i] for i in range(5)] == [0.0, 0.0, 0.5, 0.5, 1.0]
    assert got[5] == 0.0  # single-row partition


def test_window_partition_values_full_frame(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from odibel_ray.ops.aggregates import window_partition_values

    t = pa.table(
        {"k": pa.array(["a", "a", "a", "b"]),
         "o": pa.array([3, 1, 2, 9], pa.int64()),
         "v": pa.array(["x3", "x1", "x2", "y"], pa.string())}
    )
    rows = window_partition_values(
        rd.from_arrow(t), ["k"], "o", "v"
    ).take_all()
    got = {(r["k"], r["o"]): (r["first_value"], r["last_value"]) for r in rows}
    assert got[("a", 1)] == ("x1", "x3")
    assert got[("a", 3)] == ("x1", "x3")
    assert got[("b", 9)] == ("y", "y")
