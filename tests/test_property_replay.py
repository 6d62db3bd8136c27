"""Property-based replay conformance: arbitrary small change logs → the
distributed replay must equal the single-threaded oracle (hypothesis)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from odibel_ray.datagen import LOG_SCHEMA
from odibel_ray.oracle import replay_oracle
from tests.conftest import collect_sorted

KEYS = ["conv_id", "turn_idx"]


def _write_log(tmpdir: str, events: list[dict], num_parts: int = 2) -> str:
    """Write an event list as a hive-partitioned log; partition by key hash
    (key-aligned, as the engine requires), lsn = position."""
    log_dir = os.path.join(tmpdir, "change_log")
    rows_by_part: dict[int, list[dict]] = {p: [] for p in range(num_parts)}
    for lsn, ev in enumerate(events):
        conv = ev["conv"]
        part = (hash(conv) & 0x7FFFFFFF) % num_parts if conv is not None else lsn % num_parts
        rows_by_part[part].append(
            {
                "op": ev["op"],
                "lsn": lsn,
                "conv_id": conv,
                "turn_idx": ev["turn"],
                "role": "user",
                "text": ev.get("text"),
                "tool": ev.get("tool"),
                "tool_name": None,
                "score": None,
                "ts": 1_700_000_000_000_000 + lsn,
                "schema_change": None,
            }
        )
    for p, rows in rows_by_part.items():
        pdir = os.path.join(log_dir, f"part={p}")
        os.makedirs(pdir, exist_ok=True)
        t = (
            pa.Table.from_pylist(rows, schema=LOG_SCHEMA)
            if rows
            else LOG_SCHEMA.empty_table()
        )
        pq.write_table(t, os.path.join(pdir, "log-00000.parquet"))
    return log_dir


event_st = st.fixed_dictionaries(
    {
        "op": st.sampled_from(["I", "U", "D", "U"]),
        "conv": st.one_of(st.none(), st.sampled_from([f"c{i}" for i in range(4)])),
        "turn": st.one_of(st.none(), st.integers(0, 3)),
        "text": st.text(alphabet="abxy ", min_size=0, max_size=6),
        "tool": st.one_of(st.none(), st.sampled_from(["s", "p"])),
    }
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(event_st, min_size=0, max_size=40))
def test_replay_matches_oracle_on_random_logs(ray_session, tmp_path_factory, events):
    from odibel_ray.cdc.apply import replay_dataset, replay_partitioned

    tmpdir = str(tmp_path_factory.mktemp("prop"))
    log = _write_log(tmpdir, events)
    oracle = replay_oracle(log)
    got_shuffle = collect_sorted(replay_dataset(log), KEYS)
    got_shard = collect_sorted(replay_partitioned(log), KEYS)
    for got in (got_shuffle, got_shard):
        if oracle.num_rows == 0:
            assert got.num_rows == 0
        else:
            assert got.select(oracle.column_names).equals(oracle)


# ---------------------------------------------------------------------------
# schema-evolution fuzz: random interleavings of S events (any kind, any
# partition, duplicates, before-any-data) with I/U/D rows carrying BOTH the
# pre- and post-evolution payload columns — engine must equal the oracle
# ---------------------------------------------------------------------------

def _write_mixed_log(tmpdir: str, events: list[dict], num_parts: int = 2) -> str:
    import json

    log_dir = os.path.join(tmpdir, "change_log")
    rows_by_part: dict[int, list[dict]] = {p: [] for p in range(num_parts)}
    for lsn, ev in enumerate(events):
        if ev["op"] == "S":
            change = {
                "add": {"kind": "add_column", "name": "score",
                        "type": "double"},
                "rename": {"kind": "rename_column", "from": "tool",
                           "to": "tool_name"},
                "widen": {"kind": "widen_type", "column": "turn_idx",
                          "from": "int32", "to": "int64"},
            }[ev["kind"]]
            rows_by_part[ev["part"] % num_parts].append(
                {"op": "S", "lsn": lsn, "conv_id": None, "turn_idx": None,
                 "role": None, "text": None, "tool": None, "tool_name": None,
                 "score": None, "ts": 1_700_000_000_000_000 + lsn,
                 "schema_change": json.dumps(change)}
            )
            continue
        conv = ev["conv"]
        part = (hash(conv) & 0x7FFFFFFF) % num_parts if conv is not None else lsn % num_parts
        rows_by_part[part].append(
            {"op": ev["op"], "lsn": lsn, "conv_id": conv,
             "turn_idx": ev["turn"], "role": "user", "text": ev.get("text"),
             "tool": ev.get("tool"), "tool_name": ev.get("tool_name"),
             "score": ev.get("score"),
             "ts": 1_700_000_000_000_000 + lsn, "schema_change": None}
        )
    for p, rows in rows_by_part.items():
        pdir = os.path.join(log_dir, f"part={p}")
        os.makedirs(pdir, exist_ok=True)
        t = (pa.Table.from_pylist(rows, schema=LOG_SCHEMA)
             if rows else LOG_SCHEMA.empty_table())
        pq.write_table(t, os.path.join(pdir, "log-00000.parquet"))
    return log_dir


data_event_st = st.fixed_dictionaries(
    {
        "op": st.sampled_from(["I", "U", "D", "U"]),
        "conv": st.one_of(st.none(), st.sampled_from([f"c{i}" for i in range(4)])),
        "turn": st.one_of(st.none(), st.integers(0, 3)),
        "text": st.text(alphabet="abxy ", min_size=0, max_size=6),
        "tool": st.one_of(st.none(), st.sampled_from(["s", "p"])),
        "tool_name": st.one_of(st.none(), st.sampled_from(["S2", "P2"])),
        "score": st.one_of(st.none(), st.sampled_from([0.25, 0.5, 0.75])),
    }
)
schema_event_st = st.fixed_dictionaries(
    {
        "op": st.just("S"),
        "kind": st.sampled_from(["add", "rename", "widen"]),
        "part": st.integers(0, 1),
    }
)


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,  # deterministic draws: the CI gate never explores
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(st.one_of(data_event_st, schema_event_st),
                       min_size=0, max_size=40))
def test_replay_matches_oracle_under_schema_fuzz(
    ray_session, tmp_path_factory, events
):
    from odibel_ray.cdc.apply import replay_dataset, replay_partitioned

    tmpdir = str(tmp_path_factory.mktemp("fuzzs"))
    log_dir = _write_mixed_log(tmpdir, events)
    oracle = replay_oracle(log_dir)
    got_shuffle = collect_sorted(replay_dataset(log_dir), KEYS)
    got_shard = collect_sorted(replay_partitioned(log_dir), KEYS)
    for got in (got_shuffle, got_shard):
        if oracle.num_rows == 0:
            assert got.num_rows == 0
        else:
            assert got.select(oracle.column_names).equals(oracle)


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,  # deterministic draws: the CI gate never explores
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(st.one_of(data_event_st, schema_event_st),
                    min_size=6, max_size=36),
    cuts=st.lists(st.floats(0.1, 0.9), min_size=1, max_size=3, unique=True),
    mode=st.sampled_from(["cow", "mor"]),
)
def test_incremental_slicing_converges_under_fuzz(
    ray_session, tmp_path_factory, events, cuts, mode
):
    """ANY random log (schema fuzz included) applied through the
    exactly-once sink as ANY random sequence of micro-batch slices, in
    either write mode, must converge to the single-threaded oracle — the
    replay-equivalence property the tailing CDC engine rests on."""
    from odibel_ray.cdc import incremental_apply, read_published, replay_publish
    from odibel_ray.datagen import slice_log

    tmpdir = str(tmp_path_factory.mktemp("fuzzinc"))
    log_dir = _write_mixed_log(tmpdir, events)
    oracle = replay_oracle(log_dir)

    fracs = sorted(set(round(c, 3) for c in cuts)) + [1.0]
    slices_root = os.path.join(tmpdir, "slices")
    slice_log(log_dir, slices_root, fracs)
    from odibel_ray.cdc.sink import TABLE_MANIFEST

    table = os.path.join(tmpdir, "tbl")
    for i in range(len(fracs)):
        sl = os.path.join(slices_root, f"slice-{i:03d}", "change_log")
        if not os.path.exists(os.path.join(table, TABLE_MANIFEST)):
            # bootstrap iff the table manifest is absent, exactly like
            # tail_stream._apply — a schema-only prefix publishes zero
            # buckets but persists the timeline, which incremental applies
            # must then merge, never overwrite
            replay_publish(sl, table, num_buckets=4, run_id=f"s{i}")
        else:
            incremental_apply(sl, table, run_id=f"s{i}", mode=mode)
    try:
        got = collect_sorted(read_published(table), KEYS)
    except FileNotFoundError:
        # a log with zero valid data events publishes zero buckets — the
        # sink's empty-table contract; the oracle must agree it is empty
        assert oracle.num_rows == 0
        return
    if oracle.num_rows == 0:
        assert got.num_rows == 0
    else:
        assert got.select(oracle.column_names).equals(oracle)
