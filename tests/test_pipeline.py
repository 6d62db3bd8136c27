"""Pipeline orchestration (cdc/pipeline.py): topo-ordered refresh of a DAG
of maintained tables (derived → mview, joinview over the derived silver),
plus the tail_log(downstream=...) integration."""

import json
import os

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from odibel_ray.cdc import (
    create_derived,
    create_join_view,
    incremental_apply,
    plan_pipeline,
    refresh_pipeline,
    replay_publish,
)
from odibel_ray.cdc.mview import create_view, read_view
from odibel_ray.cdc.joinview import read_join_view
from odibel_ray.cdc.sink import publish_dataset, read_published
from odibel_ray.datagen import split_log
from odibel_ray.oracle import replay_oracle

SPEC = {
    "where": [["score", ">=", 0.5]],
    "columns": ["role", "score"],
    "derive": {"text_len": ["len", "text"]},
}
GOLD = {"group_keys": ["role"], "aggs": {"n": ("count", ""), "sum_len": ("sum", "text_len")}}
KEYS = ["conv_id", "turn_idx"]


@pytest.fixture()
def dag(small_log, tmp_path):
    """bronze → silver (derived) → gold (mview); silver ⟕ role-dim (joinview)."""
    prefix = str(tmp_path / "prefix")
    split_log(small_log["log_dir"], prefix, frac=0.6)
    plog = os.path.join(prefix, "change_log")
    bronze = str(tmp_path / "bronze")
    replay_publish(plog, bronze, num_buckets=4, run_id="r1")
    silver = str(tmp_path / "silver")
    create_derived(bronze, silver, transform=SPEC, num_buckets=4, run_id="d0")
    gold = str(tmp_path / "gold")
    create_view(silver, gold, **GOLD, run_id="g0")
    dim_dir = str(tmp_path / "dim")
    roles = ["user", "assistant", "system", "tool"]
    publish_dataset(
        rd.from_arrow(pa.table({
            "role": roles, "rank": pa.array([len(r) for r in roles], pa.int64()),
        })),
        dim_dir, key_cols=["role"], num_buckets=2, run_id="p1",
    )
    view = str(tmp_path / "view")
    create_join_view(silver, dim_dir, view, on="role",
                     left_columns=["score", "text_len"], num_buckets=4, run_id="j0")
    return {"log": small_log["log_dir"], "bronze": bronze, "silver": silver,
            "gold": gold, "view": view, "dim": dim_dir}


def _silver_expected(oracle_t) -> pd.DataFrame:
    df = oracle_t.to_pandas()
    df = df[df["score"] >= 0.5]
    out = df[KEYS + ["role", "score"]].copy()
    out["text_len"] = df["text"].str.len()
    return out


def test_plan_orders_dependencies(ray_session, dag):
    # shuffled input: view and gold before silver — the plan reorders
    order = [n["table"] for n in plan_pipeline([dag["view"], dag["gold"], dag["silver"]])]
    assert order.index(dag["silver"]) < order.index(dag["gold"])
    assert order.index(dag["silver"]) < order.index(dag["view"])
    kinds = {n["table"]: n["kind"] for n in plan_pipeline([dag["silver"], dag["view"]])}
    assert kinds == {dag["silver"]: "derived", dag["view"]: "joinview"}
    with pytest.raises(ValueError, match="not a maintained table"):
        plan_pipeline([dag["bronze"]])


def test_refresh_pipeline_converges_all(ray_session, dag, oracle_final, tmp_path):
    incremental_apply(dag["log"], dag["bronze"], run_id="r2")
    sp = str(tmp_path / "sp.json")
    res = refresh_pipeline(
        [dag["view"], dag["gold"], dag["silver"]], run_id="p1", savepoint=sp
    )
    assert all(r["refreshed"] for r in res["results"].values())
    exp_silver = _silver_expected(oracle_final)
    got_silver = (
        read_published(dag["silver"], system=True).to_pandas()
        .sort_values(KEYS).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got_silver[exp_silver.columns.tolist()],
        exp_silver.sort_values(KEYS).reset_index(drop=True),
        check_dtype=False, atol=1e-9,
    )
    exp_gold = (
        exp_silver.assign(text_len=lambda d: d.text_len.astype("int64"))
        .groupby("role", as_index=False)
        .agg(n=("role", "size"), sum_len=("text_len", "sum"))
        .sort_values("role").reset_index(drop=True)
    )
    got_gold = read_view(dag["gold"]).to_pandas().sort_values("role").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_gold[["role", "n", "sum_len"]], exp_gold, check_dtype=False
    )
    got_view = (
        read_join_view(dag["view"]).to_pandas().sort_values(KEYS).reset_index(drop=True)
    )
    exp_view = exp_silver.copy()
    exp_view["rank"] = exp_view["role"].str.len()
    pd.testing.assert_frame_equal(
        got_view[exp_view.columns.tolist()],
        exp_view[["conv_id", "turn_idx", "role", "score", "text_len", "rank"]]
        .sort_values(KEYS).reset_index(drop=True),
        check_dtype=False, atol=1e-9,
    )
    # the savepoint pinned all three post-refresh states
    with open(sp) as f:
        pins = json.load(f)["tables"]
    assert set(pins) == {"view", "gold", "silver"}


def test_cycle_detection(ray_session, dag, tmp_path):
    # force a cycle by hand-editing the silver meta to point at the view
    meta_path = os.path.join(dag["silver"], "_derived.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["base"] = dag["view"]
    meta["base_rel"] = os.path.relpath(dag["view"], dag["silver"])
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="cycle"):
        plan_pipeline([dag["silver"], dag["view"]])


def test_tail_with_downstream(ray_session, dag, oracle_final):
    """tail_log keeps the whole DAG current: each applying micro-batch is
    followed by a topo refresh of silver/gold/view."""
    from odibel_ray.cdc.tail import tail_log

    res = tail_log(
        dag["log"], dag["bronze"], max_rounds=4, stop_when_idle=1,
        downstream=[dag["gold"], dag["view"], dag["silver"]], snapshots=4,
    )
    assert any(r["mode"] == "downstream" for r in res["history"])
    exp_silver = _silver_expected(oracle_final)
    got_view = (
        read_join_view(dag["view"]).to_pandas().sort_values(KEYS).reset_index(drop=True)
    )
    assert len(got_view) == len(exp_silver)
    got_gold = read_view(dag["gold"]).to_pandas()
    assert got_gold["n"].sum() == len(exp_silver)


def test_pipeline_modes_mor(ray_session, dag, oracle_final):
    """modes={table: 'mor'}: the node's refresh appends deltas instead of
    rewriting buckets; the DAG still converges."""
    from odibel_ray.cdc.sink import load_manifests

    incremental_apply(dag["log"], dag["bronze"], run_id="r2")
    res = refresh_pipeline(
        [dag["gold"], dag["silver"], dag["view"]], run_id="p1",
        modes={dag["silver"]: "mor"},
    )
    assert all(r["refreshed"] for r in res["results"].values())
    assert any(m.get("deltas") for m in load_manifests(dag["silver"]).values())
    exp = _silver_expected(oracle_final)
    got = (
        read_published(dag["silver"], system=True).to_pandas()
        .sort_values(KEYS).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[exp.columns.tolist()], exp.sort_values(KEYS).reset_index(drop=True),
        check_dtype=False, atol=1e-9,
    )


def test_refresh_pipeline_parallel_levels(ray_session, dag, oracle_final):
    """max_parallel: gold and the join view (both level-1 off silver)
    refresh concurrently and the DAG still converges to the recompute."""
    incremental_apply(dag["log"], dag["bronze"], run_id="r2")
    res = refresh_pipeline(
        [dag["view"], dag["gold"], dag["silver"]], run_id="p1",
        chain_feeds=True, max_parallel=4,
    )
    assert all(r["refreshed"] for r in res["results"].values())
    exp = _silver_expected(oracle_final)
    got_view = (
        read_join_view(dag["view"]).to_pandas().sort_values(KEYS).reset_index(drop=True)
    )
    assert len(got_view) == len(exp)
    got_gold = read_view(dag["gold"]).to_pandas()
    assert got_gold["n"].sum() == len(exp)
