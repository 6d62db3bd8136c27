"""Incremental materialized views (cdc/mview.py) + the generic upsert
(sink.upsert_published) they write through."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from odibel_ray.cdc import (
    create_view,
    incremental_apply,
    read_published,
    read_view,
    refresh_view,
    replay_publish,
    upsert_published,
)
from odibel_ray.cdc.sink import list_snapshots, publish_dataset
from odibel_ray.datagen import split_log
from odibel_ray.oracle import replay_oracle
from tests.conftest import collect_sorted

CONV_SPEC = dict(
    group_keys=["conv_id"],
    aggs={
        "n_turns": ("count", ""),
        "max_turn": ("max", "turn_idx"),
        "sum_score": ("sum", "score"),
        "avg_score": ("mean", "score"),
    },
)
ROLE_SPEC = dict(
    group_keys=["role"],
    aggs={
        "n_turns": ("count", ""),
        "sum_score": ("sum", "score"),
        "avg_score": ("mean", "score"),
    },
)


def _expected(oracle_t: pa.Table, group: str, spec: dict) -> pd.DataFrame:
    """Pandas recompute of the view over a converged oracle table, with SQL
    null semantics for all-null sums."""
    df = oracle_t.to_pandas()
    aggs = {}
    for out, (fn, src) in spec["aggs"].items():
        if fn == "count":
            aggs[out] = (group, "size")
        else:
            aggs[out] = (src, {"sum": "sum", "mean": "mean", "min": "min", "max": "max"}[fn])
    exp = df.groupby(group).agg(**aggs).reset_index()
    for out, (fn, src) in spec["aggs"].items():
        if fn == "sum":
            cnt = df.groupby(group)[src].count()
            exp.loc[exp[group].map(cnt).fillna(0) == 0, out] = np.nan
    return exp.sort_values(group).reset_index(drop=True)


def _got(view_out: str, group: str) -> pd.DataFrame:
    return read_view(view_out).to_pandas().sort_values(group).reset_index(drop=True)


@pytest.fixture()
def based(small_log, tmp_path):
    """60%-prefix base table published at 4 buckets, plus the full log."""
    prefix = str(tmp_path / "prefix")
    split_log(small_log["log_dir"], prefix, frac=0.6)
    plog = os.path.join(prefix, "change_log")
    out = str(tmp_path / "base")
    replay_publish(plog, out, num_buckets=4, run_id="r1")
    return {"log": small_log["log_dir"], "plog": plog, "base": out, "tmp": tmp_path}


def _assert_matches(view, oracle_t, group, spec):
    got = _got(view, group)
    exp = _expected(oracle_t, group, spec)
    pd.testing.assert_frame_equal(
        got[exp.columns.tolist()], exp, check_dtype=False, atol=1e-9
    )


def test_create_view_matches_recompute(ray_session, based, tmp_path):
    view = str(tmp_path / "view")
    r = create_view(based["base"], view, **CONV_SPEC, num_buckets=4, run_id="v0")
    assert r["base_version"] == 1  # create pinned the base via bootstrap snapshot
    _assert_matches(view, replay_oracle(based["plog"]), "conv_id", CONV_SPEC)


@pytest.mark.parametrize("strategy", ["rescan", "delta"])
def test_refresh_converges(ray_session, based, oracle_final, tmp_path, strategy):
    """create at the prefix state → apply the tail → refresh: the view must
    equal a recompute over the fully-applied base, for both strategies."""
    spec = ROLE_SPEC if strategy == "delta" else CONV_SPEC
    group = spec["group_keys"][0]
    view = str(tmp_path / "view")
    create_view(based["base"], view, **spec, num_buckets=4, run_id="v0")
    incremental_apply(based["log"], based["base"], run_id="r2")
    r = refresh_view(view, run_id="v1", strategy=strategy)
    assert r["refreshed"] and r["strategy"] == strategy and r["base_version"] == 2
    _assert_matches(view, oracle_final, group, spec)


def test_refresh_rescan_handles_minmax_and_deletes(ray_session, based, oracle_final, tmp_path):
    """conv-level view: the tail deletes whole conversations (groups vanish
    from the view) and max_turn moves — rescan handles both."""
    view = str(tmp_path / "view")
    create_view(based["base"], view, **CONV_SPEC, num_buckets=4, run_id="v0")
    before = set(_got(view, "conv_id")["conv_id"])
    incremental_apply(based["log"], based["base"], run_id="r2")
    r = refresh_view(view, run_id="v1", strategy="rescan")
    after = set(_got(view, "conv_id")["conv_id"])
    expected_after = set(oracle_final["conv_id"].to_pylist())
    assert after == expected_after
    assert r["groups_deleted"] == len(before - expected_after)
    _assert_matches(view, oracle_final, "conv_id", CONV_SPEC)


def test_refresh_delta_from_write_time_feed(ray_session, based, oracle_final, tmp_path):
    """The scale path: incremental_apply emits a CDF carrying the view's
    source columns (feed_values) and the delta refresh consumes it with NO
    base read — result identical to the snapshot-diff refresh."""
    view = str(tmp_path / "view")
    create_view(based["base"], view, **ROLE_SPEC, num_buckets=4, run_id="v0")
    feed = str(tmp_path / "feed")
    incremental_apply(
        based["log"], based["base"], run_id="r2", feed_dir=feed,
        feed_values=["role", "score"],
    )
    r = refresh_view(view, run_id="v1", strategy="delta", feed=feed)
    assert r["refreshed"] and r["strategy"] == "delta"
    _assert_matches(view, oracle_final, "role", ROLE_SPEC)


def test_refresh_noop_and_validation(ray_session, based, tmp_path):
    view = str(tmp_path / "view")
    create_view(based["base"], view, **CONV_SPEC, num_buckets=4, run_id="v0")
    assert refresh_view(view, run_id="v1")["refreshed"] is False
    with pytest.raises(ValueError, match="delta.*maintains only"):
        refresh_view(view, run_id="v1", strategy="delta")  # has max agg
    with pytest.raises(ValueError, match="strategy"):
        refresh_view(view, run_id="v1", strategy="bogus")


def test_refresh_delta_repeated_applies_telescope(ray_session, small_log, tmp_path):
    """Two successive applies each emitting a feed; one delta refresh over the
    CONCATENATED feeds must converge (per-group deltas telescope across the
    intermediate state)."""
    log = small_log["log_dir"]
    p1 = str(tmp_path / "p40")
    p2 = str(tmp_path / "p70")
    split_log(log, p1, frac=0.4)
    split_log(log, p2, frac=0.7)
    base = str(tmp_path / "base")
    replay_publish(os.path.join(p1, "change_log"), base, num_buckets=4, run_id="r1")
    view = str(tmp_path / "view")
    create_view(base, view, **ROLE_SPEC, num_buckets=4, run_id="v0")
    feed = str(tmp_path / "feed")
    incremental_apply(
        os.path.join(p2, "change_log"), base, run_id="r2", feed_dir=feed,
        feed_values=["role", "score"],
    )
    incremental_apply(log, base, run_id="r3", feed_dir=feed, feed_values=["role", "score"])
    refresh_view(view, run_id="v1", strategy="delta", feed=feed)
    _assert_matches(view, replay_oracle(log), "role", ROLE_SPEC)


def test_full_refresh_fallback_when_pin_expired(ray_session, based, oracle_final, tmp_path):
    """Expire the pinned base version (keep_last=1 retention) — refresh must
    fall back to a full recompute and still converge."""
    from odibel_ray.cdc.sink import enable_snapshots

    enable_snapshots(based["base"], keep_last=1)
    view = str(tmp_path / "view")
    create_view(based["base"], view, **CONV_SPEC, num_buckets=4, run_id="v0")
    incremental_apply(based["log"], based["base"], run_id="r2")  # v1 expires here
    versions = {s["version"] for s in list_snapshots(based["base"])}
    assert 1 not in versions
    r = refresh_view(view, run_id="v1", strategy="rescan")
    assert r["refreshed"] and r["strategy"] == "full"
    _assert_matches(view, oracle_final, "conv_id", CONV_SPEC)


# ---------------------------------------------------------------------------
# upsert_published
# ---------------------------------------------------------------------------


def _small_table(rows):
    return pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.string()),
            "v": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


@pytest.fixture()
def generic_table(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "gt")
    ds = rd.from_arrow(_small_table([("a", 1), ("b", 2), ("c", 3), ("d", 4)]))
    publish_dataset(ds, out, key_cols=["k"], num_buckets=2, run_id="p0")
    return out


def _read_generic(out):
    return collect_sorted(read_published(out, system=True), ["k"])


def test_upsert_update_insert_delete(ray_session, generic_table):
    import ray.data as rd

    ups = rd.from_arrow(_small_table([("b", 20), ("e", 5)]))  # update b, insert e
    dels = rd.from_arrow(pa.table({"k": pa.array(["c"], pa.string())}))
    r = upsert_published(ups, generic_table, deletes=dels, run_id="u1")
    got = _read_generic(generic_table)
    assert got.to_pydict() == {"k": ["a", "b", "d", "e"], "v": [1, 20, 4, 5]}
    assert r["rows_total"] == 4
    # untouched buckets keep their files; only touched ones were rewritten
    assert r["buckets_rewritten"] <= 2


def test_upsert_is_idempotent(ray_session, generic_table):
    import ray.data as rd

    ups = rd.from_arrow(_small_table([("b", 20)]))
    dels = rd.from_arrow(pa.table({"k": pa.array(["c"], pa.string())}))
    upsert_published(ups, generic_table, deletes=dels, run_id="u1")
    first = _read_generic(generic_table)
    upsert_published(ups, generic_table, deletes=dels, run_id="u1-retry")
    assert _read_generic(generic_table).equals(first)


def test_upsert_rejects_missing_columns_and_non_generic(ray_session, generic_table, tmp_path):
    import ray.data as rd

    bad = rd.from_arrow(pa.table({"k": pa.array(["x"], pa.string())}))  # no "v"
    with pytest.raises(Exception, match="missing table columns"):
        upsert_published(bad, generic_table, run_id="u2")
    with pytest.raises(FileNotFoundError, match="generic"):
        upsert_published(bad, str(tmp_path / "nope"), run_id="u2")


def test_view_rejects_null_group_keys(ray_session, tmp_path):
    # Arrow joins never match NULL keys, so incremental maintenance of a NULL
    # group would silently corrupt it — create_view refuses loudly instead
    import ray.data as rd

    from odibel_ray.cdc.mview import create_view

    base = str(tmp_path / "nullbase")
    publish_dataset(
        rd.from_arrow(pa.table({"k": ["a", "b", "c"],
                                "g": ["x", None, "y"],
                                "v": [1, 2, 3]})),
        base, key_cols=["k"], num_buckets=2, run_id="b1",
    )
    with pytest.raises((ValueError, Exception), match="NULL"):
        create_view(base, str(tmp_path / "nullview"),
                    group_keys=["g"], aggs={"n": ("count", "")}, run_id="v1")


def test_delta_refresh_int_sums_exact_beyond_2_53(ray_session, tmp_path):
    # integer sums must not round through float64: deltas on values near
    # 2^60 stay exact end-to-end
    import ray.data as rd

    from odibel_ray.cdc.mview import create_view, read_view, refresh_view

    big = 1 << 60
    base = str(tmp_path / "bigbase")
    publish_dataset(
        rd.from_arrow(pa.table({"k": ["a", "b"], "g": ["x", "x"],
                                "v": pa.array([big, 7], pa.int64())})),
        base, key_cols=["k"], num_buckets=2, run_id="b1",
    )
    view = str(tmp_path / "bigview")
    create_view(base, view, group_keys=["g"], aggs={"s": ("sum", "v")},
                run_id="v1")
    upsert_published(
        rd.from_arrow(pa.table({"k": ["c"], "g": ["x"],
                                "v": pa.array([3], pa.int64())})),
        base, run_id="b2",
    )
    refresh_view(view, strategy="delta", run_id="v2")
    rows = read_view(view).take_all()
    assert rows[0]["s"] == big + 7 + 3  # float64 would round this
