"""Shallow CLONE: hardlinked, fully independent copy of a published table."""

import os

import pyarrow as pa
import pytest

from odibel_ray.cdc import publish_dataset, read_published, upsert_published
from odibel_ray.cdc.maintain import clone_table
from odibel_ray.cdc.sink import (
    compact_published,
    enable_snapshots,
    list_snapshots,
    load_manifests,
    vacuum,
)

BASE = pa.table({"k": ["a", "b", "c", "d"], "v": [1, 2, 3, 4]})


def _publish(tmp_path, name="src"):
    import ray.data as rd

    out = str(tmp_path / name)
    publish_dataset(rd.from_arrow(BASE), out, key_cols=["k"], num_buckets=2,
                    run_id="g1")
    return out


def _rows(out, **kw):
    return sorted((r["k"], r["v"]) for r in read_published(out, **kw).take_all())


def test_clone_is_hardlinked_and_independent(ray_session, tmp_path):
    import ray.data as rd

    src = _publish(tmp_path)
    dst = str(tmp_path / "dst")
    res = clone_table(src, dst, run_id="c1")
    assert res["rows_total"] == 4 and res["files_linked"] == 2
    assert _rows(dst) == _rows(src)
    # data files share an inode (zero bytes copied)
    m = load_manifests(dst)
    f = os.path.join(dst, next(iter(m.values()))["file"])
    assert os.stat(f).st_nlink == 2

    # mutate the CLONE: the source must not move
    upsert_published(rd.from_arrow(pa.table({"k": ["a"], "v": [100]})), dst,
                     run_id="u1")
    assert _rows(dst) == [("a", 100), ("b", 2), ("c", 3), ("d", 4)]
    assert _rows(src) == [("a", 1), ("b", 2), ("c", 3), ("d", 4)]

    # mutate the SOURCE and vacuum it: the clone must not move
    upsert_published(rd.from_arrow(pa.table({"k": ["b"], "v": [200]})), src,
                     run_id="u2")
    vacuum(src)
    vacuum(dst)
    assert _rows(src) == [("a", 1), ("b", 200), ("c", 3), ("d", 4)]
    assert _rows(dst) == [("a", 100), ("b", 2), ("c", 3), ("d", 4)]


def test_clone_version_as_of(ray_session, tmp_path):
    import ray.data as rd

    src = _publish(tmp_path)
    enable_snapshots(src, keep_last=5)
    upsert_published(rd.from_arrow(pa.table({"k": ["a"], "v": [100]})), src,
                     run_id="u1")
    v0 = list_snapshots(src)[0]["version"]
    dst = str(tmp_path / "dst")
    res = clone_table(src, dst, version=v0, run_id="c1")
    assert res["version"] == v0
    assert _rows(dst) == [("a", 1), ("b", 2), ("c", 3), ("d", 4)]
    assert _rows(src) == [("a", 100), ("b", 2), ("c", 3), ("d", 4)]
    # the clone carries no snapshot history of its own
    assert list_snapshots(dst) == []


def test_clone_mor_table_copies_deltas(ray_session, tmp_path):
    import ray.data as rd

    src = _publish(tmp_path)
    upsert_published(rd.from_arrow(pa.table({"k": ["a", "e"], "v": [100, 5]})),
                     src, run_id="u1", mode="mor")
    dst = str(tmp_path / "dst")
    res = clone_table(src, dst, run_id="c1")
    assert res["files_copied"] >= 1  # the delta files
    assert _rows(dst) == [("a", 100), ("b", 2), ("c", 3), ("d", 4), ("e", 5)]
    # compacting the clone folds ITS deltas; the source keeps its own
    compact_published(dst, run_id="k1")
    assert not any(m.get("deltas") for m in load_manifests(dst).values())
    assert any(m.get("deltas") for m in load_manifests(src).values())
    assert _rows(src) == _rows(dst)


def test_clone_refuses_existing_table(ray_session, tmp_path):
    src = _publish(tmp_path)
    with pytest.raises(FileExistsError):
        clone_table(src, src)
    with pytest.raises(FileNotFoundError):
        clone_table(str(tmp_path / "nope"), str(tmp_path / "dst"))


def test_catalog_reports_clone_lineage(ray_session, tmp_path):
    from odibel_ray.cdc.maintain import catalog

    src = _publish(tmp_path, name="src")
    clone_table(src, str(tmp_path / "dst"), run_id="c1")
    rows = {r["table"]: r for r in catalog(str(tmp_path))}
    dst_row = rows[str(tmp_path / "dst")]
    assert dst_row["kind"] == "generic-clone"
    assert dst_row["cloned_from"]["table"] == src
    assert "cloned_from" not in rows[src]


def test_clone_resumes_after_partial_crash(ray_session, tmp_path):
    # simulate a mid-clone crash: some bucket files already hardlinked into
    # dst but no dst table manifest yet — re-running must converge instead
    # of dying on FileExistsError/SameFileError
    src = _publish(tmp_path, "src-resume")
    dst = str(tmp_path / "dst-resume")
    m = next(iter(load_manifests(src).values()))
    partial = os.path.join(dst, m["file"])
    os.makedirs(os.path.dirname(partial), exist_ok=True)
    os.link(os.path.join(src, m["file"]), partial)

    res = clone_table(src, dst, run_id="c-resume")
    assert res["buckets"] == 2
    assert _rows(dst) == _rows(src)
