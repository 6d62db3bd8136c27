"""MERGE INTO (conditional matched/not-matched merge) on published tables.

The reference has no mutation surface (every correction re-runs a full
extraction, ``transform/TKGModelMgr.scala``); ``merge_published`` is the
Delta-Lake / SQL:2003 MERGE analog over the generic published-table layout.
"""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from odibel_ray.cdc import merge_published, publish_dataset, read_published


def _publish(tmp_path, tbl, name="tbl", num_buckets=4):
    import ray.data as rd

    out = str(tmp_path / name)
    publish_dataset(rd.from_arrow(tbl), out, key_cols=["k"],
                    num_buckets=num_buckets, run_id="g1")
    return out


BASE = pa.table({
    "k": ["a", "b", "c", "d"],
    "v": [1, 2, 3, 4],
    "score": [0.1, 0.9, 0.5, None],
})


def _rows(out):
    t = read_published(out).take_all()
    return sorted((r["k"], r["v"], r["score"]) for r in t)


def test_merge_full_surface(ray_session, tmp_path):
    """All three WHEN clauses at once, with column-vs-column conditions and
    SQL NULL semantics (d's NULL score fails no clause it isn't in; b's
    matched condition is false so b keeps its stored row)."""
    import ray.data as rd

    out = _publish(tmp_path, BASE)
    src = pa.table({"k": ["a", "b", "e"], "v": [10, 20, 50],
                    "score": [0.95, 0.2, 0.7]})
    res = merge_published(
        rd.from_arrow(src), out,
        when_matched="update",
        matched_condition=[(("t", "score"), "<", ("s", "score"))],
        when_not_matched="insert",
        when_not_matched_by_source="delete",
        not_matched_by_source_condition=[(("t", "v"), ">=", 4)],
        run_id="m1",
    )
    assert (res["rows_updated"], res["rows_inserted"], res["rows_deleted"]) == (1, 1, 1)
    assert _rows(out) == [
        ("a", 10, 0.95),   # matched, 0.1 < 0.95 → updated
        ("b", 2, 0.9),     # matched, 0.9 < 0.2 false → kept
        ("c", 3, 0.5),     # not matched by source, v=3 < 4 → kept
        ("e", 50, 0.7),    # not matched → inserted
    ]                      # d: not matched by source, v=4 ≥ 4 → deleted


def test_merge_null_condition_keeps_row(ray_session, tmp_path):
    """A matched row whose condition evaluates NULL is left unchanged."""
    import ray.data as rd

    out = _publish(tmp_path, BASE)
    src = pa.table({"k": ["d"], "v": [40], "score": [0.4]})
    res = merge_published(
        rd.from_arrow(src), out,
        matched_condition=[(("t", "score"), "<", ("s", "score"))],  # NULL < 0.4 → NULL
        when_not_matched=None,
        run_id="m1",
    )
    assert res["rows_updated"] == 0
    assert ("d", 4, None) in _rows(out)


def test_merge_matched_delete_and_insert_condition(ray_session, tmp_path):
    import ray.data as rd

    out = _publish(tmp_path, BASE)
    src = pa.table({"k": ["a", "e", "f"], "v": [0, 50, 60],
                    "score": [0.0, 0.7, None]})
    res = merge_published(
        rd.from_arrow(src), out,
        when_matched="delete",
        when_not_matched="insert",
        not_matched_condition=[(("s", "score"), "not_null")],
        run_id="m1",
    )
    assert (res["rows_updated"], res["rows_inserted"], res["rows_deleted"]) == (0, 1, 1)
    assert _rows(out) == [("b", 2, 0.9), ("c", 3, 0.5), ("d", 4, None),
                          ("e", 50, 0.7)]  # a deleted; f's NULL score fails insert cond


def test_merge_cardinality_violation(ray_session, tmp_path):
    import ray.data as rd

    out = _publish(tmp_path, BASE)
    src = pa.table({"k": ["a", "a"], "v": [1, 2], "score": [0.1, 0.2]})
    with pytest.raises(Exception, match="multiple rows"):
        merge_published(rd.from_arrow(src), out, run_id="m1")


def test_merge_into_empty_table_inserts(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "empty")
    publish_dataset(rd.from_arrow(BASE.slice(0, 0)), out, key_cols=["k"],
                    num_buckets=4, run_id="g1")
    res = merge_published(rd.from_arrow(BASE), out, run_id="m1")
    assert res["rows_inserted"] == 4
    assert _rows(out) == [("a", 1, 0.1), ("b", 2, 0.9), ("c", 3, 0.5), ("d", 4, None)]


def test_merge_idempotent_rerun(ray_session, tmp_path):
    """Re-running the same MERGE converges (update clause re-applies the same
    rows; inserts are now matched rows replacing themselves)."""
    import ray.data as rd

    out = _publish(tmp_path, BASE)
    src = pa.table({"k": ["a", "e"], "v": [10, 50], "score": [0.95, 0.7]})
    merge_published(rd.from_arrow(src), out, run_id="m1")
    first = _rows(out)
    merge_published(rd.from_arrow(src), out, run_id="m2")
    assert _rows(out) == first


def test_merge_mor_mode_stages_deltas(ray_session, tmp_path):
    import ray.data as rd

    from odibel_ray.cdc.sink import load_manifests

    out = _publish(tmp_path, BASE)
    src = pa.table({"k": ["a", "e"], "v": [10, 50], "score": [0.95, 0.7]})
    merge_published(rd.from_arrow(src), out, mode="mor", run_id="m1")
    assert any(m.get("deltas") for m in load_manifests(out).values())
    assert _rows(out) == [("a", 10, 0.95), ("b", 2, 0.9), ("c", 3, 0.5),
                          ("d", 4, None), ("e", 50, 0.7)]


def test_merge_validation_errors(ray_session, tmp_path):
    import ray.data as rd

    out = _publish(tmp_path, BASE)
    src = rd.from_arrow(pa.table({"k": ["a"], "v": [1], "score": [0.1]}))
    with pytest.raises(ValueError, match="at least one action"):
        merge_published(src, out, when_matched=None, when_not_matched=None)
    with pytest.raises(ValueError, match="column ref"):
        merge_published(src, out, matched_condition=[(1, "<", 2)])
    with pytest.raises(ValueError, match="cannot reference"):
        merge_published(src, out, when_not_matched="insert",
                        not_matched_condition=[(("t", "v"), ">", 1)])
    with pytest.raises(ValueError, match="not in source"):
        merge_published(src, out, matched_condition=[(("s", "nope"), ">", 1)])
    with pytest.raises(ValueError, match="not in table"):
        merge_published(src, out, matched_condition=[(("t", "nope"), ">", 1)])


def test_merge_no_op_returns_zero(ray_session, tmp_path):
    import ray.data as rd

    out = _publish(tmp_path, BASE)
    # matched-only merge whose condition never holds: nothing to do
    src = pa.table({"k": ["a"], "v": [1], "score": [0.0]})
    res = merge_published(
        rd.from_arrow(src), out, when_not_matched=None,
        matched_condition=[(("t", "score"), "<", ("s", "score"))],
        run_id="m1",
    )
    assert res == {"rows_updated": 0, "rows_inserted": 0, "rows_deleted": 0,
                   "buckets_rewritten": 0, "run_id": "m1"}
    assert _rows(out) == [("a", 1, 0.1), ("b", 2, 0.9), ("c", 3, 0.5), ("d", 4, None)]


KILL_MERGE_SCRIPT = r"""
import sys, ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
from odibel_ray.cdc.dml import merge_published
merge_published(rd.read_parquet(sys.argv[1]), sys.argv[2], run_id="victim")
"""


def test_merge_kill_resume_converges(ray_session, tmp_path):
    """SIGKILL a MERGE mid-publish (some buckets flipped, some not); re-running
    the merge converges to the full merged state — full-row updates are
    idempotent and already-inserted rows re-classify as matched no-ops."""
    import os
    import signal
    import subprocess
    import sys as _sys
    import time

    import pyarrow.parquet as pq_
    import ray.data as rd

    from odibel_ray.cdc.sink import load_manifests

    out = str(tmp_path / "tbl")
    n = 64
    base = pa.table({"k": [f"k{i:03d}" for i in range(n)],
                     "v": [0] * n, "score": [0.5] * n})
    publish_dataset(rd.from_arrow(base), out, key_cols=["k"], num_buckets=8,
                    run_id="g1")
    src_path = str(tmp_path / "src.parquet")
    pq_.write_table(pa.table({
        "k": [f"k{i:03d}" for i in range(n)] + ["new1", "new2"],
        "v": [1] * n + [1, 1],
        "score": [0.9] * (n + 2),
    }), src_path)

    env = dict(os.environ, ODIBEL_TEST_PUBLISH_DELAY="0.8",
               RAY_ADDRESS="local", PYTHONPATH="/root/repo")
    proc = subprocess.Popen(
        [_sys.executable, "-c", KILL_MERGE_SCRIPT, src_path, out],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            done = [b for b, m in load_manifests(out).items()
                    if m.get("run_id") == "victim"]
            if len(done) >= 2:
                break
            if proc.poll() is not None:
                break
            time.sleep(0.05)
        assert proc.poll() is None, "victim finished before we could kill it"
        proc.send_signal(signal.SIGKILL)
    finally:
        proc.wait(timeout=60)

    flipped = {b for b, m in load_manifests(out).items()
               if m.get("run_id") == "victim"}
    assert 0 < len(flipped) < 8, f"expected a partial merge, got {len(flipped)}"

    res = merge_published(rd.read_parquet(src_path), out, run_id="resume")
    assert res["rows_updated"] + res["rows_inserted"] == n + 2
    got = sorted((r["k"], r["v"], r["score"])
                 for r in read_published(out).take_all())
    want = sorted([(f"k{i:03d}", 1, 0.9) for i in range(n)]
                  + [("new1", 1, 0.9), ("new2", 1, 0.9)])
    assert got == want


def test_merge_key_column_conditions(ray_session, tmp_path):
    # conditions referencing a target KEY column (the only way to gate a
    # NOT-MATCHED-BY-SOURCE delete on key values) read the plain key column
    # through the classify join instead of crashing on a missing __t_ rename
    import ray.data as rd

    out = _publish(tmp_path, BASE)
    src = pa.table({"k": ["a"], "v": [10], "score": [0.2]})
    merge_published(
        rd.from_arrow(src), out,
        when_matched="update",
        matched_condition=[(("t", "k"), "==", "a")],
        when_not_matched=None,
        when_not_matched_by_source="delete",
        not_matched_by_source_condition=[(("t", "k"), "==", "b")],
        run_id="m-key",
    )
    assert _rows(out) == [("a", 10, 0.2), ("c", 3, 0.5), ("d", 4, None)]


def test_merge_empty_table_condition_validation(ray_session, tmp_path):
    # an empty target must reject unknown target-condition columns with the
    # module's clear ValueError, not a raw KeyError from schema construction
    import ray.data as rd

    out = _publish(tmp_path, BASE.slice(0, 0))
    with pytest.raises(ValueError, match="not in table"):
        merge_published(
            rd.from_arrow(BASE), out,
            matched_condition=[(("t", "nope"), "==", 1)],
            run_id="m-empty-cond",
        )
