"""Medallion composition: bronze (replayed transcript table) → silver
(row-level derived table, cdc/derived.py) → gold (aggregate materialized
view, cdc/mview.py). Derived tables and views are both generic published
tables, so each can be the other's base — this pins that the whole chain
stays incrementally maintainable: one apply to bronze, one O(feed) silver
refresh, one snapshot-diff gold refresh, no full recompute anywhere."""

import os

import pandas as pd
import pytest

from odibel_ray.cdc import (
    create_derived,
    incremental_apply,
    read_derived,
    refresh_derived,
    replay_publish,
)
from odibel_ray.cdc.mview import create_view, read_view, refresh_view
from odibel_ray.datagen import split_log
from odibel_ray.oracle import replay_oracle

SILVER_SPEC = {
    "where": [["score", ">=", 0.5]],
    "columns": ["role", "score"],
    "derive": {"text_len": ["len", "text"], "role_uc": ["upper", "role"]},
}
FEED_VALUES = ["role", "score", "text"]
GOLD_SPEC = {
    "group_keys": ["role_uc"],
    "aggs": {
        "n_rows": ("count", ""),
        "sum_score": ("sum", "score"),
        "avg_len": ("mean", "text_len"),
    },
}


def _expected_gold(oracle_t) -> pd.DataFrame:
    """Pandas recompute: silver transform over the converged oracle state,
    then the gold GROUP BY."""
    df = oracle_t.to_pandas()
    df = df[df["score"] >= 0.5].copy()
    df["text_len"] = df["text"].str.len()
    df["role_uc"] = df["role"].str.upper()
    g = df.groupby("role_uc")
    out = pd.DataFrame(
        {
            "n_rows": g.size(),
            "sum_score": g["score"].sum(),
            "avg_len": g["text_len"].mean(),
        }
    ).reset_index()
    return out.sort_values("role_uc").reset_index(drop=True)


def _got_gold(gold_dir) -> pd.DataFrame:
    df = read_view(gold_dir).to_pandas()
    return df.sort_values("role_uc").reset_index(drop=True)


def _assert_gold_matches(gold_dir, oracle_t):
    got, exp = _got_gold(gold_dir), _expected_gold(oracle_t)
    pd.testing.assert_frame_equal(
        got[exp.columns.tolist()], exp, check_dtype=False, atol=1e-9
    )


@pytest.fixture()
def medallion(small_log, tmp_path):
    """Bronze at the 60%-prefix state, silver + gold created over it."""
    prefix = str(tmp_path / "prefix")
    split_log(small_log["log_dir"], prefix, frac=0.6)
    bronze = str(tmp_path / "bronze")
    replay_publish(os.path.join(prefix, "change_log"), bronze, num_buckets=4, run_id="r1")
    silver = str(tmp_path / "silver")
    create_derived(bronze, silver, transform=SILVER_SPEC, num_buckets=4, run_id="s0")
    gold = str(tmp_path / "gold")
    create_view(silver, gold, **GOLD_SPEC, num_buckets=4, run_id="g0")
    return {"log": small_log["log_dir"], "bronze": bronze, "silver": silver, "gold": gold}


def test_create_chain_matches_recompute(ray_session, medallion, tmp_path):
    """At create time gold already equals the recompute over the prefix."""
    prefix_log = os.path.join(str(tmp_path / "prefix"), "change_log")
    _assert_gold_matches(medallion["gold"], replay_oracle(prefix_log))


@pytest.mark.parametrize("gold_strategy", ["rescan", "delta"])
def test_refresh_chain_converges(ray_session, medallion, oracle_final, gold_strategy, tmp_path):
    """Apply the tail to bronze (write-time feed) → silver 'feed' refresh
    (no base read) → gold refresh off the silver snapshot diff (feed=None):
    the gold table must equal a from-scratch recompute."""
    feed = str(tmp_path / "feed")
    incremental_apply(
        medallion["log"], medallion["bronze"], run_id="r2",
        feed_dir=feed, feed_values=FEED_VALUES, feed_lsn=True,
    )
    r_s = refresh_derived(medallion["silver"], run_id="s1", strategy="feed", feed=feed)
    assert r_s["refreshed"]
    r_g = refresh_view(medallion["gold"], run_id="g1", strategy=gold_strategy)
    assert r_g["refreshed"]
    _assert_gold_matches(medallion["gold"], oracle_final)


def test_two_cycle_chain_stays_converged(ray_session, small_log, tmp_path):
    """Two successive apply→refresh→refresh cycles (60%→80%→100%): the gold
    view tracks through both without any full recompute."""
    log = small_log["log_dir"]
    p60, p80 = str(tmp_path / "p60"), str(tmp_path / "p80")
    split_log(log, p60, frac=0.6)
    split_log(log, p80, frac=0.8)
    bronze = str(tmp_path / "bronze")
    replay_publish(os.path.join(p60, "change_log"), bronze, num_buckets=4, run_id="r1")
    silver = str(tmp_path / "silver")
    create_derived(bronze, silver, transform=SILVER_SPEC, num_buckets=4, run_id="s0")
    gold = str(tmp_path / "gold")
    create_view(silver, gold, **GOLD_SPEC, num_buckets=4, run_id="g0")
    for i, lg in enumerate((os.path.join(p80, "change_log"), log), start=1):
        feed = str(tmp_path / f"feed{i}")
        incremental_apply(
            lg, bronze, run_id=f"r{i + 1}", feed_dir=feed,
            feed_values=FEED_VALUES, feed_lsn=True,
        )
        refresh_derived(silver, run_id=f"s{i}", strategy="feed", feed=feed)
        refresh_view(gold, run_id=f"g{i}", strategy="delta")
        oracle_t = replay_oracle(lg)
        _assert_gold_matches(gold, oracle_t)
        # the silver hop stays converged too
        got = read_derived(silver).to_pandas()
        df = oracle_t.to_pandas()
        assert len(got) == int((df["score"] >= 0.5).sum())
