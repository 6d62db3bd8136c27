"""Single-threaded dict-based oracle replay (FIXTURES.md F3/F4 golden output).

Independent, deliberately-simple re-implementation of the replay semantics so
the Ray Data engine can be conformance-checked against it (the golden-rows
pattern of the reference's TKGTestSuite,
``/root/reference/src/test/scala/ai/scads/odibel/dbpedia/temporal/TKGTestSuite.scala:95-128``).

Semantics (per partition, events in LSN order):

- ``S``: advance the partition's logical schema (add / rename / widen).
- malformed (null ``conv_id`` or ``turn_idx`` and op != S, or unknown op):
  **skip, never delete** — reference rule ``DBpediaTKGExtraction.scala:184-195``.
- ``D``: tombstone the key.
- ``I``/``U``: full-row last-writer-wins upsert; the payload is interpreted
  under the schema active *at that event's LSN* — a ``score`` written before
  ``add_column`` is dropped; the logical tool value comes from physical
  ``tool`` before the rename and from ``tool_name`` after it.

Final converged schema (all three schema events applied):
``conv_id:string, turn_idx:int64, role:string, text:string, tool_name:string,
score:double, ts:timestamp[us]``, sorted by ``(conv_id, turn_idx)``.

The history variant mirrors ``TemporalExtractionResult`` windows
(``.../data/TemporalExtractionResult.scala:13``): one row per (key, version)
with ``lsn_start/lsn_end`` + ``ts_start/ts_end``; live rows carry
``lsn_end = INT64_MAX`` (sentinel, ``TemporalWindowBuilder.scala:92``) and
``ts_end = TS_SENTINEL_US`` ('9999-12-31T23:59:59', the reference's overflow
fallback at ``transform/SerUtil.scala:16-25``).
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.dataset as pads

INT64_MAX = (1 << 63) - 1
# 9999-12-31T23:59:59 UTC in microseconds (SerUtil.scala:16-25 fallback)
TS_SENTINEL_US = 253_402_300_799_000_000

FINAL_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int64()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool_name", pa.string()),
        ("score", pa.float64()),
        ("ts", pa.timestamp("us")),
    ]
)

HISTORY_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int64()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool_name", pa.string()),
        ("score", pa.float64()),
        ("lsn_start", pa.int64()),
        ("lsn_end", pa.int64()),
        ("ts_start", pa.timestamp("us")),
        ("ts_end", pa.timestamp("us")),
    ]
)


def read_log(log_dir: str) -> pa.Table:
    """Read the whole hive-partitioned change log (small scales only)."""
    return pads.dataset(log_dir, format="parquet", partitioning="hive").to_table()


class _PartSchema:
    """Logical schema state of one partition as S events are applied."""

    def __init__(self) -> None:
        self.score_added = False
        self.tool_renamed = False
        self.turn_widened = False

    def apply(self, change_json: str) -> None:
        c = json.loads(change_json)
        kind = c.get("kind")
        if kind == "add_column":
            self.score_added = True
        elif kind == "rename_column":
            self.tool_renamed = True
        elif kind == "widen_type":
            self.turn_widened = True


def replay_oracle(log_dir: str, history: bool = False) -> pa.Table:
    """Replay the log single-threaded; return the converged (or history) table."""
    tbl = read_log(log_dir)
    cols = {name: tbl[name].to_pylist() for name in tbl.column_names}
    n = len(tbl)
    order = sorted(range(n), key=lambda i: cols["lsn"][i])

    schemas: dict[int, _PartSchema] = {}
    live: dict[tuple, dict] = {}  # key -> row state
    windows: list[dict] = []  # closed history windows

    def close_window(key: tuple, row: dict, end_lsn: int, end_ts) -> None:
        windows.append(
            {**row, "lsn_end": end_lsn, "ts_end": end_ts}
        )

    for i in order:
        part = int(cols["part"][i])
        op = cols["op"][i]
        lsn = cols["lsn"][i]
        sch = schemas.setdefault(part, _PartSchema())
        if op == "S":
            sch.apply(cols["schema_change"][i])
            continue
        conv, turn = cols["conv_id"][i], cols["turn_idx"][i]
        if conv is None or turn is None or op not in ("I", "U", "D"):
            continue  # malformed: skip, never delete
        key = (conv, int(turn))
        ts = cols["ts"][i]
        if op == "D":
            prev = live.pop(key, None)
            if history and prev is not None:
                close_window(key, prev, lsn, ts)
            continue
        tool_value = cols["tool_name"][i] if sch.tool_renamed else cols["tool"][i]
        score_value = cols["score"][i] if sch.score_added else None
        row = {
            "conv_id": conv,
            "turn_idx": int(turn),
            "role": cols["role"][i],
            "text": cols["text"][i],
            "tool_name": tool_value,
            "score": score_value,
            "lsn_start": lsn,
            "ts_start": ts,
            "ts": ts,
        }
        prev = live.get(key)
        if history and prev is not None:
            close_window(key, prev, lsn, ts)
        live[key] = row

    if not history:
        rows = sorted(live.values(), key=lambda r: (r["conv_id"], r["turn_idx"]))
        return pa.Table.from_pylist(
            [{k: r[k] for k in FINAL_SCHEMA.names} for r in rows], schema=FINAL_SCHEMA
        )

    import datetime as _dt

    sentinel_ts = _dt.datetime(9999, 12, 31, 23, 59, 59)
    for key, row in live.items():
        windows.append({**row, "lsn_end": INT64_MAX, "ts_end": sentinel_ts})
    windows.sort(key=lambda r: (r["conv_id"], r["turn_idx"], r["lsn_start"]))
    return pa.Table.from_pylist(
        [{k: r[k] for k in HISTORY_SCHEMA.names} for r in windows], schema=HISTORY_SCHEMA
    )
