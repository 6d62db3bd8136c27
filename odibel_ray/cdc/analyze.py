"""ANALYZE TABLE — per-column statistics for published tables.

The reference computes its per-property statistics as a one-off Spark job it
re-runs from scratch every time (``eval/PropertyEval.scala:40-60``); a
lakehouse engine instead ANALYZEs a table once and persists the column
statistics with it (`Delta ANALYZE` / engine catalogs), where cost-based
choices — broadcast-vs-bucketed join sides, salt factors, bloom sizing —
can read them without a scan.

One distributed pass computes, per column: row/null counts, typed min/max,
and the number of distinct values. NDV has two methods:

- ``method="hll"`` (default) — mergeable HyperLogLog registers
  (`ops/sketches.py`), O(2^p) bytes per column regardless of cardinality;
  the only sane choice at 10^10 rows.
- ``method="exact"`` — per-batch distinct 64-bit value hashes, merged on
  the driver. Memory is O(NDV) and the count is exact up to 64-bit hash
  collisions (≪ 1e-9 at any testable scale); used by the oracle-pinned
  query so the engine's statistics are checkable against SQL
  ``COUNT(DISTINCT ...)``.

Statistics persist to ``<table>/_colstats.json`` (with the table version
they reflect) and surface through ``describe``.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

COLSTATS_FILE = "_colstats.json"


def _batch_partial(t: pa.Table, cols: list[str], method: str) -> pa.Table:
    """One row of typed per-column partials for this batch."""
    import pandas as pd

    from odibel_ray.ops.sketches import _hll_registers

    out: dict = {"_rows": pa.array([len(t)], pa.int64())}
    for c in cols:
        arr = t[c].combine_chunks()
        out[f"{c}__nulls"] = pa.array([arr.null_count], pa.int64())
        valid = arr.drop_null()
        if len(valid):
            out[f"{c}__min"] = pa.array([pc.min(valid).as_py()], arr.type)
            out[f"{c}__max"] = pa.array([pc.max(valid).as_py()], arr.type)
        else:
            out[f"{c}__min"] = pa.nulls(1, arr.type)
            out[f"{c}__max"] = pa.nulls(1, arr.type)
        uniq = valid.unique()
        h = pd.util.hash_array(
            uniq.to_numpy(zero_copy_only=False), categorize=False
        )
        if method == "exact":
            out[f"{c}__ndv"] = pa.array([np.unique(h).tobytes()], pa.large_binary())
        else:
            out[f"{c}__ndv"] = pa.array(
                [_hll_registers(h, 14).tobytes()], pa.large_binary()
            )
    return pa.table(out)


def analyze_published(
    out_dir: str,
    columns: list[str] | None = None,
    *,
    method: str = "hll",
    batch_size: int = 65536,
    persist: bool = True,
) -> dict:
    """Compute (and by default persist) per-column statistics of a published
    table: rows, nulls, typed min/max, NDV. Returns
    ``{column: {"nulls": n, "ndv": n, "min": v, "max": v}, ...}`` plus a
    ``"_table"`` entry with row count, method and the snapshot version the
    statistics reflect (when snapshots are enabled)."""
    from odibel_ray.cdc.sink import list_snapshots, read_published
    from odibel_ray.ops.sketches import _hll_estimate

    if method not in ("hll", "exact"):
        raise ValueError("method must be 'hll' or 'exact'")
    ds = read_published(out_dir, columns=columns)
    cols = list(columns) if columns is not None else list(ds.schema().names)

    partials_ds = ds.map_batches(
        lambda t: _batch_partial(t, cols, method),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    import ray

    parts = [ray.get(r) for r in partials_ds.to_arrow_refs()]
    parts = [p for p in parts if p.num_rows]
    merged = pa.concat_tables(parts, promote_options="default") if parts else None

    stats: dict = {}
    rows_total = int(pc.sum(merged["_rows"]).as_py() or 0) if merged is not None else 0
    for c in cols:
        if merged is None:
            stats[c] = {"nulls": 0, "ndv": 0, "min": None, "max": None}
            continue
        nulls = int(pc.sum(merged[f"{c}__nulls"]).as_py() or 0)
        mn = pc.min(merged[f"{c}__min"]).as_py()
        mx = pc.max(merged[f"{c}__max"]).as_py()
        blobs = [b.as_py() for b in merged[f"{c}__ndv"] if b.is_valid]
        if method == "exact":
            hs = (
                np.unique(np.concatenate([np.frombuffer(b, np.uint64) for b in blobs]))
                if blobs
                else np.array([], np.uint64)
            )
            ndv = int(len(hs))
        else:
            regs = np.zeros(1 << 14, dtype=np.uint8)
            for b in blobs:
                regs = np.maximum(regs, np.frombuffer(b, np.uint8))
            ndv = int(round(_hll_estimate(regs)))
        stats[c] = {"nulls": nulls, "ndv": ndv, "min": mn, "max": mx}
    snaps = list_snapshots(out_dir)
    stats["_table"] = {
        "rows": rows_total,
        "method": method,
        "version": snaps[-1]["version"] if snaps else None,
    }
    if persist:
        tmp = os.path.join(out_dir, COLSTATS_FILE + ".tmp")
        with open(tmp, "w") as f:
            json.dump(stats, f, default=str)
        os.replace(tmp, os.path.join(out_dir, COLSTATS_FILE))
    return stats


def load_column_stats(out_dir: str) -> dict | None:
    """Previously persisted ANALYZE output, or None. Callers should compare
    the ``_table.version`` pin against the live table before trusting it."""
    path = os.path.join(out_dir, COLSTATS_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)
