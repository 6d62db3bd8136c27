"""Stdin/pipe streaming source (spool → micro-batch upsert) + heartbeat."""

import io
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _jsonl_from_log(log_dir: str, drop_lsn: bool = False) -> bytes:
    """Serialize a generated change log to an LSN-ordered JSONL byte stream —
    the shape a live binlog feed pipes in."""
    import glob

    tables = []
    for f in sorted(glob.glob(os.path.join(log_dir, "part=*", "*.parquet"))):
        tables.append(pq.read_table(f))
    t = pa.concat_tables(tables, promote_options="default")
    t = t.take(pa.compute.sort_indices(t, sort_keys=[("lsn", "ascending")]))
    rows = t.to_pylist()
    out = []
    for r in rows:
        if r.get("ts") is not None:
            r["ts"] = r["ts"].isoformat()
        if drop_lsn:
            r.pop("lsn", None)
        out.append(json.dumps({k: v for k, v in r.items() if v is not None}))
    return ("\n".join(out) + "\n").encode()


def _fixture_log(tmp_path, n_convs=60):
    from odibel_ray.datagen import generate_change_log

    out = str(tmp_path / "gen")
    info = generate_change_log(out, n_convs=n_convs, max_turns=12, num_parts=4,
                               seed=3)
    return info["log_dir"], info["n_events"]


def test_spool_jsonl_roundtrip(ray_session, tmp_path):
    """Spooled WAL holds exactly the piped events, key-aligned by part."""
    from odibel_ray.sources.stream import spool_jsonl

    log_dir, n_events = _fixture_log(tmp_path)
    payload = _jsonl_from_log(log_dir)
    spool = str(tmp_path / "spool")
    info = spool_jsonl(io.BytesIO(payload), spool, num_parts=4, batch_rows=500)
    assert info["n_events"] == n_events

    # every conv_id lives in exactly one part (key alignment)
    import glob

    seen: dict[str, set] = {}
    n_data = 0
    n_s_per_part: dict[str, int] = {}
    for f in glob.glob(os.path.join(spool, "part=*", "*.parquet")):
        part = os.path.basename(os.path.dirname(f))
        t = pq.read_table(f, columns=["conv_id", "op"])
        ops = np.array(t["op"].to_pylist())
        n_s_per_part[part] = n_s_per_part.get(part, 0) + int((ops == "S").sum())
        n_data += int((ops != "S").sum())
        for c in t["conv_id"].to_pylist():
            if c is not None:
                seen.setdefault(c, set()).add(part)
    assert all(len(parts) == 1 for parts in seen.values())
    # S events replicate to every part equally
    assert len(set(n_s_per_part.values())) == 1


def test_tail_stream_converges_to_oracle(ray_session, tmp_path):
    """Pipe → spool → incremental upserts must converge to the single-threaded
    oracle replay of the spooled log (per-turn text equality)."""
    import pandas as pd

    from odibel_ray.cdc.sink import read_published
    from odibel_ray.oracle import replay_oracle
    from odibel_ray.sources.stream import tail_stream

    log_dir, n_events = _fixture_log(tmp_path)
    payload = _jsonl_from_log(log_dir)
    spool = str(tmp_path / "spool")
    table = str(tmp_path / "table")
    res = tail_stream(
        io.BytesIO(payload), table, spool_dir=spool, num_parts=4,
        batch_rows=150, num_buckets=8,
    )
    assert res["n_events"] == n_events
    assert res["applies"] >= 2  # several micro-batch rounds actually ran

    # applied micro-batches are archived out of the spool (per-round IO stays
    # O(new events)); the oracle replays the archive, which holds them all
    archive = spool + "_applied"
    assert os.path.isdir(archive) and not any(
        f.endswith(".parquet")
        for _, _, fs in os.walk(spool)
        for f in fs
    ), "applied stream files must move to the archive"

    got = (
        read_published(table)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    want = (
        replay_oracle(archive)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "text"]], want[["conv_id", "turn_idx", "text"]]
    )
    assert len(got) == res["rows_total"]


def test_tail_stream_resume_mid_pipe(ray_session, tmp_path):
    """Kill-resume shape: stream the first half, then re-start with the second
    half — spool sequence state resumes and the final table equals a
    one-shot run."""
    import pandas as pd

    from odibel_ray.cdc.sink import read_published
    from odibel_ray.sources.stream import tail_stream

    log_dir, _ = _fixture_log(tmp_path)
    payload = _jsonl_from_log(log_dir)
    lines = payload.splitlines(keepends=True)
    half = len(lines) // 2
    spool = str(tmp_path / "spool")
    table = str(tmp_path / "table")
    tail_stream(io.BytesIO(b"".join(lines[:half])), table, spool_dir=spool,
                num_parts=4, batch_rows=400, num_buckets=8)
    tail_stream(io.BytesIO(b"".join(lines[half:])), table, spool_dir=spool,
                num_parts=4, batch_rows=400, num_buckets=8)

    spool2 = str(tmp_path / "spool2")
    table2 = str(tmp_path / "table2")
    tail_stream(io.BytesIO(payload), table2, spool_dir=spool2, num_parts=4,
                batch_rows=400, num_buckets=8)

    a = read_published(table).to_pandas().sort_values(
        ["conv_id", "turn_idx"], ignore_index=True)
    b = read_published(table2).to_pandas().sort_values(
        ["conv_id", "turn_idx"], ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_tail_stream_applies_leftover_spool_on_empty_repipe(ray_session, tmp_path):
    """Killed-after-spool resume: micro-batches sit in the spool but were
    never applied, and the re-piped remainder is EMPTY. tail_stream must
    still converge the leftovers (the final apply keys off pending files,
    not off this stream's event count)."""
    import pandas as pd

    from odibel_ray.cdc.sink import read_published
    from odibel_ray.sources.stream import spool_jsonl, tail_stream

    log_dir, _ = _fixture_log(tmp_path)
    payload = _jsonl_from_log(log_dir)
    spool = str(tmp_path / "spool")
    table = str(tmp_path / "table")
    # simulate the killed run: events spooled, no apply ever happened
    spool_jsonl(io.BytesIO(payload), spool, num_parts=4, batch_rows=400)
    res = tail_stream(io.BytesIO(b""), table, spool_dir=spool, num_parts=4,
                      batch_rows=400, num_buckets=8)
    assert res["n_events"] == 0 and res["applies"] == 1
    assert res["rows_total"] > 0

    spool2 = str(tmp_path / "spool2")
    table2 = str(tmp_path / "table2")
    tail_stream(io.BytesIO(payload), table2, spool_dir=spool2, num_parts=4,
                batch_rows=400, num_buckets=8)
    a = read_published(table).to_pandas().sort_values(
        ["conv_id", "turn_idx"], ignore_index=True)
    b = read_published(table2).to_pandas().sort_values(
        ["conv_id", "turn_idx"], ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_spool_assigns_arrival_lsn(ray_session, tmp_path):
    """A feed without binlog positions gets monotone arrival-order LSNs."""
    from odibel_ray.sources.stream import spool_jsonl

    rows = [
        {"op": "I", "conv_id": f"c{i % 3}", "turn_idx": i, "role": "user",
         "text": f"t{i}", "ts": "2024-01-01T00:00:00"}
        for i in range(20)
    ]
    payload = ("\n".join(json.dumps(r) for r in rows) + "\n").encode()
    spool = str(tmp_path / "spool")
    info = spool_jsonl(io.BytesIO(payload), spool, num_parts=2, batch_rows=7)
    assert info["n_events"] == 20
    assert info["last_lsn"] == 19

    import glob

    got = []
    for f in glob.glob(os.path.join(spool, "part=*", "*.parquet")):
        t = pq.read_table(f, columns=["turn_idx", "lsn"])
        got += list(zip(t["turn_idx"].to_pylist(), t["lsn"].to_pylist()))
    # arrival order == emission order: lsn must equal the row index
    assert sorted(got) == [(i, i) for i in range(20)]


def test_throughput_monitor_reports():
    import time

    from odibel_ray.monitor import ThroughputMonitor

    msgs = []
    with ThroughputMonitor(0.05, what="events", emit=msgs.append) as mon:
        for _ in range(4):
            mon.add(250)
            time.sleep(0.06)
    assert mon.total == 1000
    # at least one live heartbeat plus the final summary line
    assert len(msgs) >= 2
    assert any("heartbeat" in m for m in msgs)
    assert msgs[-1].startswith("done: 1000 events")

    # interval 0: inert, still counts and summarizes
    m2 = []
    with ThroughputMonitor(0.0, emit=m2.append) as mon:
        mon.add(5)
    assert mon.total == 5 and len(m2) == 1
