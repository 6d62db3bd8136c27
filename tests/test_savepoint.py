"""Cross-table savepoints (cdc/savepoint.py): one consistent version pin
across several published tables, surviving each table's retention policy."""

import os

import pytest

from odibel_ray.cdc import (
    create_derived,
    create_savepoint,
    drop_savepoint,
    incremental_apply,
    read_savepoint,
    refresh_derived,
    replay_publish,
)
from odibel_ray.cdc.savepoint import load_savepoint, pinned_versions
from odibel_ray.cdc.sink import enable_snapshots, list_snapshots, read_published, vacuum
from odibel_ray.datagen import split_log
from odibel_ray.oracle import replay_oracle

SPEC = {"where": [["score", ">=", 0.5]], "columns": ["role", "score"]}
FEED_VALUES = ["role", "score", "text"]


@pytest.fixture()
def lake(small_log, tmp_path):
    """Bronze + silver at the 60%-prefix state."""
    prefix = str(tmp_path / "prefix")
    split_log(small_log["log_dir"], prefix, frac=0.6)
    plog = os.path.join(prefix, "change_log")
    bronze = str(tmp_path / "bronze")
    replay_publish(plog, bronze, num_buckets=4, run_id="r1")
    silver = str(tmp_path / "silver")
    create_derived(bronze, silver, transform=SPEC, num_buckets=4, run_id="s0")
    return {"log": small_log["log_dir"], "plog": plog, "bronze": bronze, "silver": silver}


def test_savepoint_pins_consistent_cut(ray_session, lake, tmp_path):
    """Pin both tables, keep writing; reads through the savepoint still see
    the pinned (mutually consistent) states."""
    sp = str(tmp_path / "release-1")
    info = create_savepoint(sp, {"bronze": lake["bronze"], "silver": lake["silver"]})
    assert set(info["tables"]) == {"bronze", "silver"}

    feed = str(tmp_path / "feed")
    incremental_apply(lake["log"], lake["bronze"], run_id="r2",
                      feed_dir=feed, feed_values=FEED_VALUES)
    refresh_derived(lake["silver"], run_id="s1", feed=feed)

    prefix_oracle = replay_oracle(lake["plog"]).to_pandas()
    assert read_savepoint(sp, "bronze").count() == len(prefix_oracle)
    n_silver = int((prefix_oracle["score"] >= 0.5).sum())
    assert read_savepoint(sp, "silver").count() == n_silver
    # live reads see the post-apply states
    final = replay_oracle(lake["log"]).to_pandas()
    assert read_published(lake["bronze"]).count() == len(final)
    # read_kwargs pass through
    assert read_savepoint(sp, "bronze", columns=["conv_id"]).schema().names == ["conv_id"]
    with pytest.raises(KeyError, match="gold"):
        read_savepoint(sp, "gold")


def test_restore_savepoint_rolls_back_all_members(ray_session, lake, tmp_path):
    """Multi-table rollback: mutate bronze AND silver past the savepoint,
    restore, and both LIVE tables match the pinned cut again; a re-run of the
    restore is a no-op (idempotent), and the savepoint stays valid."""
    from odibel_ray.cdc import restore_savepoint

    sp = str(tmp_path / "release-2")
    create_savepoint(sp, {"bronze": lake["bronze"], "silver": lake["silver"]})
    pinned_bronze = read_published(lake["bronze"]).to_pandas()
    pinned_silver = read_published(lake["silver"]).to_pandas()

    feed = str(tmp_path / "feed2")
    incremental_apply(lake["log"], lake["bronze"], run_id="r2",
                      feed_dir=feed, feed_values=FEED_VALUES)
    refresh_derived(lake["silver"], run_id="s1", feed=feed)
    assert read_published(lake["bronze"]).count() != len(pinned_bronze)

    res = restore_savepoint(sp)
    assert set(res["tables"]) == {"bronze", "silver"}
    for table, want in [("bronze", pinned_bronze), ("silver", pinned_silver)]:
        got = read_published(lake[table]).to_pandas()
        key = [c for c in ("conv_id", "turn_idx") if c in got.columns]
        assert got.sort_values(key, ignore_index=True).equals(
            want.sort_values(key, ignore_index=True)
        ), table

    restore_savepoint(sp)  # re-runnable
    assert read_published(lake["bronze"]).count() == len(pinned_bronze)
    assert read_savepoint(sp, "silver").count() == len(pinned_silver)


def test_pinned_version_survives_retention(ray_session, lake, tmp_path):
    """keep_last=1 would expire the pinned version; the pin keeps it (and
    its data files) until the savepoint is dropped."""
    enable_snapshots(lake["bronze"], keep_last=1)
    sp = str(tmp_path / "hold")
    info = create_savepoint(sp, {"bronze": lake["bronze"]})
    v = info["tables"]["bronze"]["version"]
    # two more publishes; with keep_last=1 both would sweep v away
    p80 = str(tmp_path / "p80")
    split_log(lake["log"], p80, frac=0.8)
    incremental_apply(os.path.join(p80, "change_log"), lake["bronze"], run_id="r2")
    incremental_apply(lake["log"], lake["bronze"], run_id="r3")
    retained = {s["version"] for s in list_snapshots(lake["bronze"])}
    assert v in retained and len(retained) >= 2
    assert pinned_versions(lake["bronze"]) == {v: ["hold"]}
    # the pinned version still READS correctly (files survived the sweeps)
    assert read_savepoint(sp, "bronze").count() == replay_oracle(lake["plog"]).num_rows

    # dropping the savepoint releases the pin; vacuum expires the version
    drop_savepoint(sp)
    assert pinned_versions(lake["bronze"]) == {}
    vacuum(lake["bronze"], keep_snapshots=1)
    assert v not in {s["version"] for s in list_snapshots(lake["bronze"])}
    assert not os.path.exists(sp + ".json")


def test_savepoint_records_current_state(ray_session, lake, tmp_path):
    """A table whose snapshots lag its live state gets a fresh snapshot at
    savepoint time — the pin is the CURRENT state, not a stale version."""
    # bronze was published without snapshots: enabling pins v1 = current.
    incremental_apply(lake["log"], lake["bronze"], run_id="r2")  # still no snaps
    sp = str(tmp_path / "cut")
    create_savepoint(sp, {"bronze": lake["bronze"]})
    assert read_savepoint(sp, "bronze").count() == replay_oracle(lake["log"]).num_rows


def test_savepoint_idempotent_and_validation(ray_session, lake, tmp_path):
    sp = str(tmp_path / "r1")
    a = create_savepoint(sp, {"bronze": lake["bronze"]})
    b = create_savepoint(sp, {"bronze": lake["bronze"]})  # re-run overwrites
    assert a["tables"] == b["tables"]
    assert load_savepoint(sp)["name"] == "r1"
    with pytest.raises(ValueError, match="at least one table"):
        create_savepoint(str(tmp_path / "x"), {})


def test_savepoint_same_basename_and_member_removal(ray_session, lake, tmp_path):
    """Pins are keyed by (name, manifest path): a second savepoint whose
    manifest shares a basename must not clobber the first's pins, and
    re-creating a savepoint with a member removed unpins that member."""
    sp1 = create_savepoint(str(tmp_path / "rel-07" / "cut.json"),
                           {"bronze": lake["bronze"], "silver": lake["silver"]})
    v1 = sp1["tables"]["bronze"]["version"]
    incremental_apply(lake["log"], lake["bronze"], run_id="r2")
    sp2 = create_savepoint(str(tmp_path / "rel-08" / "cut.json"),
                           {"bronze": lake["bronze"]})
    v2 = sp2["tables"]["bronze"]["version"]
    assert v2 != v1
    pins = pinned_versions(lake["bronze"])
    assert v1 in pins and v2 in pins  # same basename did not clobber

    # re-create rel-07 WITHOUT silver: its old pins (incl. the dropped
    # member's) are removed; rel-08's pin survives
    create_savepoint(str(tmp_path / "rel-07" / "cut.json"),
                     {"bronze": lake["bronze"]})
    assert pinned_versions(lake["silver"]) == {}
    pins = pinned_versions(lake["bronze"])
    assert v1 not in pins and v2 in pins
