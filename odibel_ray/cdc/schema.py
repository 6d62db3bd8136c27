"""Schema-evolution timeline: per-partition ordered list of schema changes.

The reference re-casts evolving columns on every read (cast-on-read at
``/root/reference/src/main/scala/ai/scads/odibel/datasets/wikitext/eval/SnapshotEval.scala:42-43``,
``eval/OutputEval.scala:89-90``). We formalize that: ``S`` events form a tiny
per-partition timeline (a schema change at LSN *L* in partition *p* governs all
events of *p* with ``lsn >= L``); the timeline is broadcast to every task and
payload columns are mapped **vectorized** per batch — no per-row Python.

Schema events are metadata-scale (a handful per partition at any data size), so
collecting them on the driver is scale-safe.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np
import pyarrow.compute as pc
import pyarrow.dataset as pads


@dataclass
class SchemaTimeline:
    """Per-partition LSN thresholds for each supported schema-change kind.

    ``add_lsn[p]`` / ``rename_lsn[p]`` / ``widen_lsn[p]`` = the LSN of the
    corresponding ``S`` event in partition ``p`` (INT64_MAX if never applied —
    threshold semantics: the change is active for events with ``lsn >= value``).
    ``changes`` keeps the raw ordered records for manifests / incremental runs.
    """

    add_lsn: dict[int, int] = field(default_factory=dict)
    rename_lsn: dict[int, int] = field(default_factory=dict)
    widen_lsn: dict[int, int] = field(default_factory=dict)
    changes: list[dict] = field(default_factory=list)

    INT64_MAX = (1 << 63) - 1

    def add_change(self, part: int, lsn: int, change_json: str) -> None:
        c = json.loads(change_json)
        kind = c.get("kind")
        rec = {"part": int(part), "lsn": int(lsn), **c}
        self.changes.append(rec)
        if kind == "add_column":
            self.add_lsn.setdefault(part, lsn)
        elif kind == "rename_column":
            self.rename_lsn.setdefault(part, lsn)
        elif kind == "widen_type":
            self.widen_lsn.setdefault(part, lsn)

    # ---- vectorized threshold lookup ------------------------------------
    def _threshold_array(self, d: dict[int, int], parts: np.ndarray) -> np.ndarray:
        if not d:
            return np.full(len(parts), self.INT64_MAX, dtype=np.int64)
        max_p = max(int(parts.max(initial=0)), max(d))
        thr = np.full(max_p + 1, self.INT64_MAX, dtype=np.int64)
        for p, l in d.items():
            thr[p] = l
        return thr[parts]

    def active_masks(self, parts: np.ndarray, lsns: np.ndarray):
        """Return (score_added, tool_renamed) boolean masks for a batch."""
        return (
            lsns >= self._threshold_array(self.add_lsn, parts),
            lsns >= self._threshold_array(self.rename_lsn, parts),
        )

    # ---- (de)serialization for manifests ---------------------------------
    def to_json(self) -> str:
        return json.dumps(self.changes)

    @classmethod
    def from_json(cls, s: str) -> "SchemaTimeline":
        tl = cls()
        for rec in json.loads(s):
            tl.add_change(rec["part"], rec["lsn"], json.dumps(rec))
        return tl

    def merged_with(self, other: "SchemaTimeline") -> "SchemaTimeline":
        """Union of two timelines, deduplicated: a crash-resume can re-extract
        an S event the stored timeline already holds (the timeline is
        persisted BEFORE bucket watermarks advance, so it may run ahead of a
        failed apply) — merging must be idempotent."""
        tl = SchemaTimeline()
        seen: set[str] = set()
        for rec in self.changes + other.changes:
            key = json.dumps(rec, sort_keys=True)
            if key in seen:
                continue
            seen.add(key)
            tl.add_change(rec["part"], rec["lsn"], json.dumps(rec))
        return tl


def extract_timeline(log_dir: str, min_lsn_by_part: dict[int, int] | None = None) -> SchemaTimeline:
    """Build the schema timeline from the ``_schema_events.parquet`` sidecar
    (the schema-registry channel, O(#schema events)); falls back to a filtered
    scan of the data log for sidecar-less logs.

    ``min_lsn_by_part`` restricts to not-yet-applied events (incremental runs).
    """
    import os

    import pyarrow.parquet as pq

    sidecar = os.path.join(log_dir, "_schema_events.parquet")
    if os.path.exists(sidecar):
        t = pq.read_table(sidecar)
    else:
        dset = pads.dataset(log_dir, format="parquet", partitioning="hive")
        t = dset.to_table(
            filter=pc.field("op") == "S", columns=["lsn", "schema_change", "part"]
        )
    tl = SchemaTimeline()
    parts = t["part"].to_pylist()
    lsns = t["lsn"].to_pylist()
    chs = t["schema_change"].to_pylist()
    order = sorted(range(len(lsns)), key=lambda i: lsns[i])
    for i in order:
        p = int(parts[i])
        if min_lsn_by_part is not None and lsns[i] <= min_lsn_by_part.get(p, -1):
            continue
        tl.add_change(p, lsns[i], chs[i])
    return tl
