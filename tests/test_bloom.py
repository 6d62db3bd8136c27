"""Bloom-filter sidecar skipping: equality pruning where zone maps can't bite."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from odibel_ray.cdc import (
    compact_published,
    publish_dataset,
    read_published,
    replay_publish,
    upsert_published,
    vacuum,
)
from odibel_ray.cdc.skipping import BLOOM_SUFFIX
from tests.conftest import collect_sorted

KEYS = ["conv_id", "turn_idx"]


@pytest.fixture()
def bloom_table(ray_session, small_log, tmp_path):
    base = str(tmp_path / "base")
    out = str(tmp_path / "tbl")
    replay_publish(small_log["log_dir"], base, num_buckets=4, run_id="r1")
    publish_dataset(read_published(base), out, key_cols=KEYS, num_buckets=8,
                    run_id="g1", bloom_cols=["text"])
    return out


def _sidecars(out):
    return sorted(glob.glob(os.path.join(out, "part-*.parquet" + BLOOM_SUFFIX)))


def test_bloom_prunes_equality_probe(bloom_table):
    full = collect_sorted(read_published(bloom_table), KEYS)
    probe = full["text"][len(full) // 2].as_py()
    n_match = pc.sum(
        pc.equal(full["text"], probe).cast("int64")
    ).as_py()
    assert len(_sidecars(bloom_table)) == 8  # every bucket published a bloom

    stats: dict = {}
    got = read_published(bloom_table, where=[("text", "==", probe)],
                         prune_stats=stats)
    rows = got.take_all()
    assert len(rows) == n_match and all(r["text"] == probe for r in rows)
    # texts are near-unique → the probe's owner file(s) plus rare false
    # positives; with 8 files an unpruned read would open all 8
    assert stats["files_read"] < stats["files_total"] == 8
    assert stats["files_read"] <= 3


def test_bloom_never_false_negative(bloom_table):
    full = collect_sorted(read_published(bloom_table), KEYS)
    texts = full["text"].to_pylist()
    for probe in texts[:: max(1, len(texts) // 30)]:
        got = read_published(bloom_table, where=[("text", "==", probe)]).take_all()
        assert any(r["text"] == probe for r in got)


def test_bloom_refreshes_on_upsert_and_sweeps(bloom_table, ray_session):
    import ray.data as rd

    full = collect_sorted(read_published(bloom_table), KEYS)
    one = full.slice(0, 1)
    one = one.set_column(one.schema.get_field_index("text"), "text",
                         pa.array(["BLOOM-FRESH-VALUE"]))
    row = {c: one[c][0].as_py() for c in one.column_names}
    upsert_published(rd.from_arrow(one), bloom_table, run_id="u1")

    stats: dict = {}
    got = read_published(bloom_table, where=[("text", "==", "BLOOM-FRESH-VALUE")],
                         prune_stats=stats).take_all()
    assert [ (r["conv_id"], r["turn_idx"]) for r in got ] == [
        (row["conv_id"], row["turn_idx"]) ]
    assert stats["files_read"] <= 2  # fresh bloom routes to the one rewritten file
    # every live data file still has exactly one sidecar; no widows
    live = {os.path.basename(f) for f in glob.glob(os.path.join(bloom_table, "part-*.parquet"))}
    for sc in _sidecars(bloom_table):
        assert os.path.basename(sc)[: -len(BLOOM_SUFFIX)] in live
    assert len(_sidecars(bloom_table)) == 8
    vacuum(bloom_table)
    assert len(_sidecars(bloom_table)) == 8


def test_bloom_layout_is_pinned(bloom_table, ray_session, small_log, tmp_path):
    with pytest.raises(ValueError, match="bloom_cols"):
        publish_dataset(read_published(bloom_table), bloom_table,
                        key_cols=KEYS, run_id="g2", bloom_cols=["role"])


def test_bloom_survives_mor_compaction(bloom_table, ray_session):
    import ray.data as rd

    full = collect_sorted(read_published(bloom_table), KEYS)
    one = full.slice(0, 1)
    one = one.set_column(one.schema.get_field_index("text"), "text",
                         pa.array(["MOR-DELTA-VALUE"]))
    upsert_published(rd.from_arrow(one), bloom_table, run_id="m1", mode="mor")
    # MOR bucket reads are not bloom-pruned, but still correct
    got = read_published(bloom_table, where=[("text", "==", "MOR-DELTA-VALUE")]).take_all()
    assert len(got) == 1
    compact_published(bloom_table, run_id="c1", min_deltas=1)
    stats: dict = {}
    got = read_published(bloom_table, where=[("text", "==", "MOR-DELTA-VALUE")],
                         prune_stats=stats).take_all()
    assert len(got) == 1
    assert stats["files_read"] <= 2  # compaction rebuilt the bucket's bloom
