"""Incrementally-maintained JOIN views (cdc/joinview.py): fact ⟕/⨝ dimension
kept current from either side's changes — left-driven (change feed / snapshot
diff), right-driven (dimension upserts/deletes propagate through the reverse
fk lookup), and the snapshot-expired full-recompute fallback."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from odibel_ray.cdc import (
    create_join_view,
    incremental_apply,
    read_join_view,
    refresh_join_view,
    replay_publish,
)
from odibel_ray.cdc.sink import publish_dataset, upsert_published
from odibel_ray.datagen import split_log
from odibel_ray.oracle import replay_oracle

KEYS = ["conv_id", "turn_idx"]
LEFT_COLS = ["role", "score", "tool_name"]


def _dim_table(oracle_t) -> pa.Table:
    """Deterministic dimension over the tool vocabulary: every tool_name the
    converged state carries, kind = upper, weight = len."""
    tools = sorted({t for t in oracle_t.column("tool_name").to_pylist() if t is not None})
    return pa.table(
        {
            "tool_name": tools,
            "tool_kind": [t.upper() for t in tools],
            "weight": pa.array([len(t) for t in tools], pa.int64()),
        }
    )


def _expected(oracle_t, dim: pa.Table, how: str) -> pd.DataFrame:
    left = oracle_t.to_pandas()[KEYS + LEFT_COLS]
    d = dim.to_pandas()
    out = left.merge(d, on="tool_name", how="left" if how == "left" else "inner")
    return out.sort_values(KEYS).reset_index(drop=True)


def _got(view_dir) -> pd.DataFrame:
    return read_join_view(view_dir).to_pandas().sort_values(KEYS).reset_index(drop=True)


def _assert_matches(view_dir, oracle_t, dim, how="left"):
    got, exp = _got(view_dir), _expected(oracle_t, dim, how)
    assert list(got.columns) == KEYS + LEFT_COLS + ["tool_kind", "weight"]
    pd.testing.assert_frame_equal(
        got[exp.columns.tolist()], exp, check_dtype=False, atol=1e-9
    )


@pytest.fixture()
def based(small_log, oracle_final, tmp_path):
    """60%-prefix fact table + a tool dimension published as generic tables."""
    prefix = str(tmp_path / "prefix")
    split_log(small_log["log_dir"], prefix, frac=0.6)
    plog = os.path.join(prefix, "change_log")
    base = str(tmp_path / "base")
    replay_publish(plog, base, num_buckets=4, run_id="r1")
    dim_dir = str(tmp_path / "dim")
    dim = _dim_table(oracle_final)  # full-log vocabulary, so the tail adds no tool
    publish_dataset(
        rd.from_arrow(dim), dim_dir, key_cols=["tool_name"], num_buckets=2, run_id="p1"
    )
    return {"log": small_log["log_dir"], "plog": plog, "base": base,
            "dim_dir": dim_dir, "dim": dim}


@pytest.mark.parametrize("how", ["left", "inner"])
def test_create_matches_join(ray_session, based, tmp_path, how):
    out = str(tmp_path / "jv")
    r = create_join_view(
        based["base"], based["dim_dir"], out, on="tool_name", how=how,
        left_columns=["role", "score"], num_buckets=4, run_id="j0",
    )
    assert r["left_version"] == 1 and r["right_version"] == 1
    _assert_matches(out, replay_oracle(based["plog"]), based["dim"], how=how)


@pytest.mark.parametrize("use_feed", [False, True])
def test_left_driven_refresh(ray_session, based, oracle_final, tmp_path, use_feed):
    """Apply the 40% tail to the fact table; the refresh recomputes only
    dirty left keys (feed-driven or left snapshot diff) and converges."""
    out = str(tmp_path / "jv")
    create_join_view(
        based["base"], based["dim_dir"], out, on="tool_name",
        left_columns=["role", "score"], num_buckets=4, run_id="j0",
    )
    feed = str(tmp_path / "feed") if use_feed else None
    kw = dict(feed_dir=feed) if use_feed else {}
    incremental_apply(based["log"], based["base"], run_id="r2", **kw)
    r = refresh_join_view(out, run_id="j1", left_feed=feed)
    assert r["refreshed"] and r["rows_upserted"] > 0
    _assert_matches(out, oracle_final, based["dim"])


@pytest.mark.parametrize("how", ["left", "inner"])
def test_right_driven_refresh(ray_session, based, tmp_path, how):
    """Upsert + delete dimension rows: every fact row referencing a changed
    tool is found through the reverse lookup and rewritten — updates pick up
    the new value, deletes null out ('left') or drop ('inner') the row."""
    out = str(tmp_path / "jv")
    create_join_view(
        based["base"], based["dim_dir"], out, on="tool_name", how=how,
        left_columns=["role", "score"], num_buckets=4, run_id="j0",
    )
    tools = based["dim"].column("tool_name").to_pylist()
    upd_tool = next(t for t in tools if t)  # update one real tool
    del_tool = next(t for t in tools if t and t != upd_tool)  # delete another
    upsert_published(
        rd.from_arrow(pa.table({
            "tool_name": [upd_tool], "tool_kind": ["CHANGED"],
            "weight": pa.array([100], pa.int64()),
        })),
        based["dim_dir"],
        deletes=rd.from_arrow(pa.table({"tool_name": [del_tool]})),
        run_id="u1",
    )
    r = refresh_join_view(out, run_id="j1")
    assert r["refreshed"] and (r["rows_upserted"] > 0 or r["rows_deleted"] > 0)
    df = based["dim"].to_pandas()
    df.loc[df.tool_name == upd_tool, ["tool_kind", "weight"]] = ["CHANGED", 100]
    dim_after = pa.Table.from_pandas(df[df.tool_name != del_tool], preserve_index=False)
    _assert_matches(out, replay_oracle(based["plog"]), dim_after, how=how)
    if how == "inner":
        assert r["rows_deleted"] > 0  # facts referencing the deleted tool left the view


def test_both_sides_in_one_refresh(ray_session, based, oracle_final, tmp_path):
    out = str(tmp_path / "jv")
    create_join_view(
        based["base"], based["dim_dir"], out, on="tool_name",
        left_columns=["role", "score"], num_buckets=4, run_id="j0",
    )
    incremental_apply(based["log"], based["base"], run_id="r2")
    upd_tool = next(t for t in based["dim"].column("tool_name").to_pylist() if t)
    upsert_published(
        rd.from_arrow(pa.table({
            "tool_name": [upd_tool], "tool_kind": ["CHANGED"],
            "weight": pa.array([100], pa.int64()),
        })),
        based["dim_dir"], run_id="u1",
    )
    refresh_join_view(out, run_id="j1")
    df = based["dim"].to_pandas()
    df.loc[df.tool_name == upd_tool, ["tool_kind", "weight"]] = ["CHANGED", 100]
    _assert_matches(out, oracle_final, pa.Table.from_pandas(df, preserve_index=False))


def test_noop_refresh(ray_session, based, tmp_path):
    out = str(tmp_path / "jv")
    create_join_view(
        based["base"], based["dim_dir"], out, on="tool_name",
        left_columns=["role", "score"], num_buckets=4, run_id="j0",
    )
    before = _got(out)
    r = refresh_join_view(out, run_id="j1")
    assert r == {"refreshed": False, "left_version": 1, "right_version": 1}
    pd.testing.assert_frame_equal(_got(out), before)


def test_expired_snapshot_full_refresh(ray_session, based, oracle_final, tmp_path):
    """Apply twice with keep_last=1 retention so the pinned left version
    expires — the refresh falls back to a full recompute and still
    converges."""
    from odibel_ray.cdc.sink import enable_snapshots

    out = str(tmp_path / "jv")
    create_join_view(
        based["base"], based["dim_dir"], out, on="tool_name",
        left_columns=["role", "score"], num_buckets=4, run_id="j0",
    )
    enable_snapshots(based["base"], keep_last=1)
    mid = str(tmp_path / "mid")
    split_log(based["log"], mid, frac=0.8)
    incremental_apply(os.path.join(mid, "change_log"), based["base"], run_id="r2")
    incremental_apply(based["log"], based["base"], run_id="r3")
    r = refresh_join_view(out, run_id="j1")
    assert r["refreshed"] and r.get("strategy") == "full"
    _assert_matches(out, oracle_final, based["dim"])


def test_collision_and_bad_on_rejected(ray_session, based, tmp_path):
    with pytest.raises(ValueError, match="collide"):
        create_join_view(
            based["base"], based["dim_dir"], str(tmp_path / "a"), on="tool_name",
            right_columns={"tool_kind": "role"},  # collides with left 'role'
        )
    with pytest.raises(ValueError, match="key columns"):
        create_join_view(
            based["base"], based["dim_dir"], str(tmp_path / "b"),
            on=["tool_name", "role"],  # dim has a single key column
        )


def test_join_on_left_key_column(ray_session, tmp_path):
    # joining ON a left KEY column must not duplicate it in the view schema
    left = pa.table({"k": ["a", "b", "c"], "v": [1, 2, 3]})
    right = pa.table({"k": ["a", "c"], "label": ["A", "C"]})
    ldir, rdir = str(tmp_path / "lkey"), str(tmp_path / "rkey")
    publish_dataset(rd.from_arrow(left), ldir, key_cols=["k"], num_buckets=2,
                    run_id="l1")
    publish_dataset(rd.from_arrow(right), rdir, key_cols=["k"], num_buckets=2,
                    run_id="r1")
    vdir = str(tmp_path / "vkey")
    create_join_view(ldir, rdir, vdir, on="k", how="left", run_id="v1")
    got = read_join_view(vdir).to_pandas().sort_values("k", ignore_index=True)
    assert list(got.columns).count("k") == 1
    assert got["label"].tolist() == ["A", None, "C"]
    # a refresh over the key-joined view stays healthy
    upsert_published(rd.from_arrow(pa.table({"k": ["b"], "v": [20]})), ldir,
                     run_id="l2")
    refresh_join_view(vdir, run_id="v2")
    got = read_join_view(vdir).to_pandas().sort_values("k", ignore_index=True)
    assert got["v"].tolist() == [1, 20, 3]
