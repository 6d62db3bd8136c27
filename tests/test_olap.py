"""OLAP operator classes: melt (UNPIVOT), group_mode, bag set ops."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from odibel_ray.ops.aggregates import group_mode, melt
from odibel_ray.ops.relational import bag_set_op


def test_melt_inverse_of_wide(ray_session):
    t = pa.table({"id": [1, 2], "a": [10, 20], "b": [1, 2], "c": [0, 5]})
    got = (
        melt(ray.data.from_arrow(t).repartition(2), ["id"], ["a", "b", "c"])
        .to_pandas().sort_values(["id", "variable"], ignore_index=True)
    )
    assert len(got) == 6
    assert got[got.id == 1].set_index("variable")["value"].to_dict() == {
        "a": 10, "b": 1, "c": 0
    }


def test_melt_promotes_value_types(ray_session):
    t = pa.table({"id": [1], "i": [7], "f": [2.5]})
    got = melt(ray.data.from_arrow(t), ["id"], ["i", "f"]).to_pandas()
    assert got.value.dtype == np.float64
    assert sorted(got.value.tolist()) == [2.5, 7.0]


def test_group_mode_ties_break_to_smallest(ray_session):
    t = pa.table({"k": [1, 1, 1, 1, 2, 2],
                  "v": ["b", "b", "a", "a", "z", "z"]})
    got = (
        group_mode(ray.data.from_arrow(t).repartition(3), ["k"], "v")
        .to_pandas().sort_values("k", ignore_index=True)
    )
    assert got.mode_v.tolist() == ["a", "z"]  # 2-2 tie -> smallest value
    assert got.n.tolist() == [2, 2]


def test_group_mode_matches_duckdb_rule(ray_session):
    rng = np.random.default_rng(2)
    n = 3000
    t = pa.table({
        "k": rng.integers(0, 60, n).astype(np.int64),
        "v": rng.choice(["a", "b", "c", "d"], n).tolist(),
    })
    got = (
        group_mode(ray.data.from_arrow(t).repartition(4), ["k"], "v")
        .to_pandas().sort_values("k", ignore_index=True)
    )
    import duckdb
    want = duckdb.arrow(t).query(
        "t", "SELECT k, v AS mode_v, n FROM ("
             "SELECT k, v, count(*) AS n, row_number() OVER ("
             "PARTITION BY k ORDER BY count(*) DESC, v ASC) AS rn "
             "FROM t GROUP BY k, v) WHERE rn = 1 ORDER BY k"
    ).fetchdf()
    assert got.mode_v.tolist() == want.mode_v.tolist()
    assert got.n.tolist() == want.n.tolist()


def test_pivot_counts_float_measure_and_nulls(ray_session):
    from odibel_ray.ops.aggregates import pivot_counts
    t = pa.table({
        "u": [1, 1, 2],
        "c": ["a", "a", "b"],
        "v": pa.array([1.5, None, 2.25], pa.float64()),  # null skipped by SUM
    })
    got = (
        pivot_counts(ray.data.from_arrow(t), ["u"], "c", ["a", "b"],
                     value_col="v")
        .to_pandas().sort_values("u", ignore_index=True)
    )
    assert got.n_a.tolist() == [1.5, 0.0]
    assert got.n_b.tolist() == [0.0, 2.25]


def test_bag_set_op_multiset_semantics(ray_session):
    a = ray.data.from_arrow(pa.table({"x": ["p"] * 3 + ["q", "r"]}))
    b = ray.data.from_arrow(pa.table({"x": ["p", "p", "q", "q", "s"]}))
    inter = bag_set_op(a, b, ["x"], op="intersect").to_pandas()
    assert inter.x.value_counts().to_dict() == {"p": 2, "q": 1}
    exc = bag_set_op(a, b, ["x"], op="except").to_pandas()
    assert exc.x.value_counts().to_dict() == {"p": 1, "r": 1}
    # multi-column tuples
    a2 = ray.data.from_arrow(pa.table({"x": ["p", "p"], "y": [1, 2]}))
    b2 = ray.data.from_arrow(pa.table({"x": ["p"], "y": [2]}))
    got = bag_set_op(a2, b2, ["x", "y"], op="except").to_pandas()
    assert got.to_dict("records") == [{"x": "p", "y": 1}]


def test_bag_set_op_rejects_unknown_op(ray_session):
    a = ray.data.from_arrow(pa.table({"x": [1]}))
    with pytest.raises(ValueError, match="unknown bag set op"):
        bag_set_op(a, a, ["x"], op="union")
