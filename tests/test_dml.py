"""Predicate DML (DELETE FROM / UPDATE ... SET ... WHERE) on published tables."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from odibel_ray.cdc import (
    delete_published,
    publish_dataset,
    read_published,
    replay_publish,
    update_published,
)
from tests.conftest import collect_sorted

KEYS = ["conv_id", "turn_idx"]


@pytest.fixture()
def generic_table(ray_session, small_log, tmp_path):
    """A generic published copy of the converged replay state."""
    base = str(tmp_path / "base")
    out = str(tmp_path / "tbl")
    replay_publish(small_log["log_dir"], base, num_buckets=4, run_id="r1")
    publish_dataset(read_published(base), out, key_cols=KEYS, num_buckets=4,
                    run_id="g1")
    return out


def _table(out):
    return collect_sorted(read_published(out), KEYS)


def test_delete_where_sql_null_semantics(generic_table):
    before = _table(generic_table)
    # predicate rows with score IS NULL must SURVIVE (SQL WHERE: NULL fails)
    n_null = pc.sum(pc.is_null(before["score"]).cast(pa.int64())).as_py() or 0
    matches = before.filter(
        pc.fill_null(pc.less(before["score"], 0.3), False)
    )
    assert len(matches) > 0  # the scenario must actually delete something

    res = delete_published(generic_table, [("score", "<", 0.3)], run_id="d1")
    assert res["rows_deleted"] == len(matches)

    after = _table(generic_table)
    expect = before.filter(
        pc.invert(pc.fill_null(pc.less(before["score"], 0.3), False))
    )
    assert after.equals(expect)
    # NULL-score rows all survived
    assert (pc.sum(pc.is_null(after["score"]).cast(pa.int64())).as_py() or 0) == n_null


def test_delete_is_idempotent_and_counts_zero(generic_table):
    delete_published(generic_table, [("role", "==", "tool")], run_id="d1")
    after1 = _table(generic_table)
    res2 = delete_published(generic_table, [("role", "==", "tool")], run_id="d2")
    assert res2["rows_deleted"] == 0 and res2["buckets_rewritten"] == 0
    assert _table(generic_table).equals(after1)


def test_delete_refuses_empty_predicate_and_nongeneric(ray_session, small_log, tmp_path):
    base = str(tmp_path / "base")
    replay_publish(small_log["log_dir"], base, num_buckets=4, run_id="r1")
    with pytest.raises(FileNotFoundError, match="generic"):
        delete_published(base, [("role", "==", "tool")])
    out = str(tmp_path / "tbl")
    publish_dataset(read_published(base), out, key_cols=KEYS, num_buckets=4,
                    run_id="g1")
    with pytest.raises(ValueError, match="empty predicate"):
        delete_published(out, [])


def test_update_literal_and_fn(generic_table):
    before = _table(generic_table)
    hit = pc.fill_null(pc.equal(before["role"], "tool"), False)
    assert pc.sum(hit.cast(pa.int64())).as_py() > 0

    res = update_published(
        generic_table,
        {"tool_name": "REDACTED", "text": ("upper", "text")},
        [("role", "==", "tool")],
        run_id="u1",
    )
    assert res["rows_updated"] == pc.sum(hit.cast(pa.int64())).as_py()

    after = _table(generic_table)
    assert len(after) == len(before)
    exp_tool = pc.if_else(hit, pa.scalar("REDACTED"), before["tool_name"])
    exp_text = pc.if_else(hit, pc.utf8_upper(before["text"]), before["text"])
    assert after["tool_name"].combine_chunks().equals(exp_tool.combine_chunks())
    assert after["text"].combine_chunks().equals(exp_text.combine_chunks())
    # untouched columns identical
    for c in ("conv_id", "turn_idx", "role", "score", "ts"):
        assert after[c].equals(before[c])


def test_update_validation(generic_table):
    with pytest.raises(ValueError, match="key column"):
        update_published(generic_table, {"conv_id": "x"}, [("role", "==", "tool")])
    with pytest.raises(ValueError, match="unknown column"):
        update_published(generic_table, {"nope": 1}, [("role", "==", "tool")])
    with pytest.raises(ValueError, match="SET function"):
        update_published(generic_table, {"text": ("sqrt", "score")},
                         [("role", "==", "tool")])
    with pytest.raises(ValueError, match="at least one"):
        update_published(generic_table, {}, [("role", "==", "tool")])


def test_update_without_where_touches_all_rows(generic_table):
    before = _table(generic_table)
    res = update_published(generic_table, {"score": 1.0}, [], run_id="u1")
    assert res["rows_updated"] == len(before)
    after = _table(generic_table)
    assert pc.all(pc.equal(after["score"], 1.0)).as_py()
    assert after["text"].equals(before["text"])


def test_update_zero_matches_is_noop(generic_table):
    before = _table(generic_table)
    res = update_published(generic_table, {"score": 0.0},
                           [("role", "==", "no-such-role")], run_id="u1")
    assert res["rows_updated"] == 0 and res["buckets_rewritten"] == 0
    assert _table(generic_table).equals(before)


def test_delete_emits_change_feed(generic_table, tmp_path):
    feed = str(tmp_path / "feed")
    res = delete_published(generic_table, [("role", "==", "tool")],
                           run_id="d1", feed_dir=feed)
    assert res["rows_deleted"] > 0
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(os.path.join(feed, "bucket=*", "*.parquet"))
    assert files
    t = pa.concat_tables([pq.read_table(f) for f in files])
    assert len(t) == res["rows_deleted"]
    assert set(t["change"].to_pylist()) == {"delete"}


def test_dml_mor_mode(generic_table):
    """DELETE/UPDATE with mode='mor' stage per-bucket deltas (no base
    rewrite); readers LWW-merge and compaction folds them back."""
    from odibel_ray.cdc import compact_published
    from odibel_ray.cdc.sink import load_manifests

    before = _table(generic_table)
    res = delete_published(generic_table, [("role", "==", "tool")],
                           run_id="d1", mode="mor")
    assert res["rows_deleted"] > 0
    assert any(m.get("deltas") for m in load_manifests(generic_table).values())
    after = _table(generic_table)
    assert len(after) == len(before) - res["rows_deleted"]
    assert "tool" not in set(after["role"].to_pylist())

    res = update_published(generic_table, {"score": 0.0},
                           [("role", "==", "user")], run_id="u1", mode="mor")
    assert res["rows_updated"] > 0
    compact_published(generic_table, run_id="c1", min_deltas=1)
    final = _table(generic_table)
    assert not any(m.get("deltas") for m in load_manifests(generic_table).values())
    assert len(final) == len(after)
    import pyarrow.compute as _pc
    users = final.filter(_pc.equal(final["role"], "user"))
    assert len(users) == res["rows_updated"]
    assert _pc.all(_pc.equal(users["score"], 0.0)).as_py()
