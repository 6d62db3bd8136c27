"""Datagen determinism + oracle replay semantics (LWW, tombstone, schema, skip)."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from odibel_ray.datagen import generate_change_log
from odibel_ray.oracle import replay_oracle


def read_log(log_dir):
    return pads.dataset(log_dir, format="parquet", partitioning="hive").to_table()


def test_datagen_deterministic(tmp_path):
    a = generate_change_log(str(tmp_path / "a"), n_convs=30, max_turns=10, seed=7)
    b = generate_change_log(str(tmp_path / "b"), n_convs=30, max_turns=10, seed=7)
    ta, tb = read_log(a["log_dir"]), read_log(b["log_dir"])
    assert ta.sort_by("lsn").equals(tb.sort_by("lsn"))
    assert a["n_events"] == b["n_events"]


def test_lsn_monotonic_per_partition(small_log):
    t = read_log(small_log["log_dir"])
    parts = t["part"].to_pylist()
    lsns = t["lsn"].to_pylist()
    by_part = {}
    for p, l in zip(parts, lsns):
        by_part.setdefault(p, []).append(l)
    for p, ls in by_part.items():
        arr = np.array(sorted(ls))
        assert (np.diff(arr) > 0).all(), f"duplicate lsn in part {p}"


def test_log_has_all_op_kinds_and_malformed(small_log):
    t = read_log(small_log["log_dir"])
    ops = set(t["op"].to_pylist())
    assert ops == {"I", "U", "D", "S"}
    conv = t["conv_id"].to_pylist()
    op = t["op"].to_pylist()
    n_malformed = sum(1 for c, o in zip(conv, op) if c is None and o != "S")
    assert n_malformed == small_log["n_malformed"] > 0


def test_oracle_schema_evolution(small_log, oracle_final):
    final = oracle_final
    assert final.schema.field("turn_idx").type == pa.int64()  # widen applied
    assert "tool_name" in final.schema.names and "tool" not in final.schema.names
    assert "score" in final.schema.names
    # per-turn text non-null for live rows (the conformance invariant column)
    assert final["text"].null_count == 0


def test_oracle_malformed_never_deletes(tmp_path):
    """A null-key U event between two versions must not remove the row."""
    rows = [
        dict(op="I", lsn=0, conv_id="c", turn_idx=0, role="user", text="v0",
             tool="t", tool_name=None, score=None, schema_change=None),
        dict(op="U", lsn=1, conv_id=None, turn_idx=None, role=None, text=None,
             tool=None, tool_name=None, score=None, schema_change=None),  # malformed
        dict(op="U", lsn=2, conv_id="c", turn_idx=0, role="user", text="v1",
             tool="t2", tool_name=None, score=None, schema_change=None),
    ]
    _write_micro_log(tmp_path, rows)
    out = replay_oracle(str(tmp_path / "change_log"))
    assert out.num_rows == 1
    assert out["text"][0].as_py() == "v1"
    assert out["tool_name"][0].as_py() == "t2"  # no rename event → physical tool col


def test_oracle_delete_then_reinsert(tmp_path):
    rows = [
        dict(op="I", lsn=0, conv_id="c", turn_idx=0, role="user", text="v0",
             tool=None, tool_name=None, score=None, schema_change=None),
        dict(op="D", lsn=1, conv_id="c", turn_idx=0, role=None, text=None,
             tool=None, tool_name=None, score=None, schema_change=None),
        dict(op="I", lsn=2, conv_id="c", turn_idx=1, role="user", text="other",
             tool=None, tool_name=None, score=None, schema_change=None),
    ]
    _write_micro_log(tmp_path, rows)
    out = replay_oracle(str(tmp_path / "change_log"))
    assert out.num_rows == 1 and out["turn_idx"][0].as_py() == 1


def test_oracle_schema_order_sensitivity(tmp_path):
    """score written before add_column is dropped; after it, kept. tool value
    carries over through the rename; post-rename writes to old col are lost."""
    rows = [
        dict(op="I", lsn=0, conv_id="a", turn_idx=0, role="user", text="a0",
             tool="early", tool_name=None, score=0.5, schema_change=None),
        dict(op="S", lsn=1, conv_id=None, turn_idx=None, role=None, text=None, tool=None,
             tool_name=None, score=None,
             schema_change=json.dumps({"kind": "add_column", "name": "score", "type": "double"})),
        dict(op="I", lsn=2, conv_id="b", turn_idx=0, role="user", text="b0",
             tool="mid", tool_name=None, score=0.25, schema_change=None),
        dict(op="S", lsn=3, conv_id=None, turn_idx=None, role=None, text=None, tool=None,
             tool_name=None, score=None,
             schema_change=json.dumps({"kind": "rename_column", "from": "tool", "to": "tool_name"})),
        dict(op="U", lsn=4, conv_id="b", turn_idx=0, role="user", text="b1",
             tool=None, tool_name="late", score=0.75, schema_change=None),
        # stale producer: writes old column after rename → logically lost
        dict(op="U", lsn=5, conv_id="a", turn_idx=0, role="user", text="a1",
             tool="stale", tool_name=None, score=None, schema_change=None),
    ]
    _write_micro_log(tmp_path, rows)
    out = replay_oracle(str(tmp_path / "change_log")).to_pylist()
    by_key = {(r["conv_id"], r["turn_idx"]): r for r in out}
    a = by_key[("a", 0)]
    assert a["text"] == "a1" and a["tool_name"] is None and a["score"] is None
    b = by_key[("b", 0)]
    assert b["text"] == "b1" and b["tool_name"] == "late" and b["score"] == 0.75


def _write_micro_log(tmp_path, rows, part=0):
    from odibel_ray.datagen import LOG_SCHEMA, BASE_EPOCH_US

    for r in rows:
        r.setdefault("ts", BASE_EPOCH_US + r["lsn"] * 1_000_000)
    cols = {f.name: [r.get(f.name) for r in rows] for f in LOG_SCHEMA}
    t = pa.table({k: pa.array(v, LOG_SCHEMA.field(k).type) for k, v in cols.items()})
    pdir = tmp_path / "change_log" / f"part={part}"
    pdir.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(pdir / "log-00000.parquet"))
