"""Deterministic synthetic transcript change-log generator (FIXTURES.md F1/F2).

Produces a partitioned Parquet CDC log over a multi-turn conversation
transcript table keyed by ``(conv_id, turn_idx)``:

- directory layout ``<out>/change_log/part=<k>/log-<i>.parquet`` — ``part`` is a
  hive partition column, the per-partition WAL id (analog of the reference's
  ``repartition(parts, pid)`` sharding,
  ``/root/reference/src/main/scala/ai/scads/odibel/datasets/wikitext/utils/FlatPageRevisionPartitioner.scala:22-23``);
- ``lsn`` is strictly monotonic within each partition (globally monotonic too,
  which implies per-partition monotonic — analog of revision id ``rId``,
  ``.../data/PageRevision.scala:8``);
- ops: ``I`` insert, ``U`` update (full-row payload, LWW), ``D`` delete,
  ``S`` schema change. Malformed events (null key, op != S) must be skipped by
  the engine, never applied as deletes (the reference's failed-revision rule,
  ``.../DBpediaTKGExtraction.scala:184-195``).

Schema evolution (three ``S`` events, one copy per partition so each partition
applies them at its own LSN position):

1. ``add_column``  {"name": "score", "type": "double"} — payload values written
   to ``score`` *before* this event's LSN did not exist logically and must be
   dropped (the generator emits some early ``score`` values on purpose).
2. ``rename_column`` {"from": "tool", "to": "tool_name"} — values carry over
   (ALTER TABLE RENAME semantics). Events after the rename write the physical
   ``tool_name`` column; a small fraction of "stale producer" events after the
   rename still write ``tool`` (their tool value is logically lost).
3. ``widen_type`` {"column": "turn_idx", "from": "int32", "to": "int64"} —
   output type widening.

The physical log schema is fixed (Parquet needs one schema per file); the
*logical* schema at a given LSN is what the ``S`` timeline defines. Physical
columns ``tool_name``/``score`` exist from the start as nullable payload slots.

Fully vectorized (numpy) so bench-scale logs (millions of events) generate in
seconds. Deterministic for a given parameter set.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# physical schema of every log file (FIXTURES.md F2 + the two evolution payload slots)
LOG_SCHEMA = pa.schema(
    [
        ("op", pa.string()),
        ("lsn", pa.int64()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("tool_name", pa.string()),
        ("score", pa.float64()),
        ("ts", pa.timestamp("us")),
        ("schema_change", pa.string()),
    ]
)

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["", "search", "python", "browser", "calculator", "editor"])

BASE_EPOCH_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, fixed
TS_STEP_US = 1_000_000  # 1s per LSN → ts monotonic with lsn


def _hash_conv_index(idx: np.ndarray, num_parts: int) -> np.ndarray:
    """Deterministic partition for conv index (Knuth multiplicative hash)."""
    return ((idx.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)) % np.uint64(
        num_parts
    )


def generate_change_log(
    out_dir: str,
    *,
    n_convs: int = 200,
    max_turns: int = 50,
    seed: int = 42,
    num_parts: int = 4,
    update_factor: float = 0.4,
    delete_frac: float = 0.05,
    malformed_frac: float = 0.01,
    files_per_part: int = 2,
    overwrite: bool = True,
) -> dict:
    """Write ``<out_dir>/change_log/part=<k>/log-<i>.parquet``; return a summary dict."""
    rng = np.random.default_rng(seed)

    # ---- base table keys -------------------------------------------------
    nturns = rng.integers(1, max_turns + 1, size=n_convs)
    conv_idx = np.repeat(np.arange(n_convs), nturns)  # per base row
    turn_idx = np.concatenate([np.arange(n) for n in nturns]).astype(np.int64)
    n_base = len(conv_idx)

    conv_names = np.array([f"conv_{i:08d}" for i in range(n_convs)])
    conv_part = _hash_conv_index(np.arange(n_convs), num_parts).astype(np.int64)

    # Zipf-ish weight per base row (hot conversations get most updates)
    conv_rank = rng.permutation(n_convs)  # rank 0 = hottest
    row_w = 1.0 / (conv_rank[conv_idx] + 1.0)
    row_w /= row_w.sum()

    # ---- event stream (data events only, positions 0..n_ev-1) -----------
    n_upd = int(update_factor * n_base * 2)  # several updates per hot key
    n_del = int(delete_frac * n_base)
    n_reins = n_del // 2

    ins_order = rng.permutation(n_base)
    upd_rows = rng.choice(n_base, size=n_upd, replace=True, p=row_w)
    del_rows = rng.choice(n_base, size=n_del, replace=False)
    reins_rows = del_rows[:n_reins]

    # tail = shuffled updates+deletes; re-inserts appended at the end (a U after
    # a D legally re-creates the row under full-row LWW upsert semantics).
    tail_rows = np.concatenate([upd_rows, del_rows])
    tail_ops = np.concatenate([np.full(n_upd, "U"), np.full(n_del, "D")])
    perm = rng.permutation(len(tail_rows))
    tail_rows, tail_ops = tail_rows[perm], tail_ops[perm]
    tail_rows = np.concatenate([tail_rows, reins_rows])
    tail_ops = np.concatenate([tail_ops, np.full(n_reins, "I")])

    rows = np.concatenate([ins_order, tail_rows])
    ops = np.concatenate([np.full(n_base, "I"), tail_ops]).astype(object)
    n_ev = len(rows)

    # schema events at fixed fractions of the data-event sequence
    schema_pos = np.array([int(0.35 * n_ev), int(0.55 * n_ev), int(0.75 * n_ev)])
    schema_json = [
        json.dumps({"kind": "add_column", "name": "score", "type": "double"}),
        json.dumps({"kind": "rename_column", "from": "tool", "to": "tool_name"}),
        json.dumps({"kind": "widen_type", "column": "turn_idx", "from": "int32", "to": "int64"}),
    ]

    # ---- payload columns (vectorized, Arrow kernels for the wide strings) -
    ev_conv_i = conv_idx[rows]
    ev_turn = turn_idx[rows]
    ev_part = conv_part[ev_conv_i]
    ev_role = ROLES[(ev_conv_i + ev_turn) % len(ROLES)]
    version = np.arange(n_ev)
    # large_string: at bench scale (10^8+ events) the text column exceeds the
    # 2 GiB int32-offset limit of `string`; per-partition parquet files read
    # back as plain `string` chunks, so consumers are unaffected.
    conv_pa = pc.cast(pa.array(conv_names[ev_conv_i]), pa.large_string())
    ev_text = pc.binary_join_element_wise(
        pa.scalar("text-", pa.large_string()),
        conv_pa,
        pa.scalar("-", pa.large_string()),
        pc.cast(pa.array(ev_turn, pa.int64()), pa.large_string()),
        pa.scalar("-v", pa.large_string()),
        pc.cast(pa.array(version, pa.int64()), pa.large_string()),
        pa.scalar("", pa.large_string()),
    )
    tool_val = pa.array(TOOLS[(ev_conv_i * 7 + ev_turn * 3 + version) % len(TOOLS)])

    is_del = ops == "D"
    after_rename = np.arange(n_ev) >= schema_pos[1]
    stale = rng.random(n_ev) < 0.02  # post-rename writers still using old column
    write_tool_name = after_rename & ~stale
    has_score = rng.random(n_ev) < 0.5
    score_val = np.round(rng.random(n_ev), 6)

    part_col = ev_part.copy()

    # malformed: null key on random non-insert positions, op forced to 'U'
    n_bad = int(malformed_frac * n_ev)
    bad_mask = np.zeros(n_ev, dtype=bool)
    if n_bad and n_ev > n_base:
        bad_pos = rng.choice(np.arange(n_base, n_ev), size=min(n_bad, n_ev - n_base), replace=False)
        bad_mask[bad_pos] = True
        ops[bad_pos] = "U"
    else:
        bad_pos = np.array([], dtype=np.int64)

    # ---- LSN assignment (vectorized splice of schema events) -------------
    # data event at position i has `k = #schema positions <= i` schema batches
    # before it; each schema batch occupies `num_parts` LSNs.
    k_before = np.searchsorted(schema_pos, np.arange(n_ev), side="right")
    data_lsn = np.arange(n_ev) + k_before * num_parts
    # k-th schema event batch starts at lsn schema_pos[k] + k*num_parts
    schema_base_lsn = schema_pos + np.arange(3) * num_parts
    part_col[bad_mask] = data_lsn[bad_mask] % num_parts

    # ---- assemble data table (Arrow if_else instead of object arrays) ----
    bad_pa = pa.array(bad_mask)
    del_pa = pa.array(is_del)
    null_str = pa.nulls(n_ev, pa.string())

    def masked(col, mask_pa):
        return pc.if_else(mask_pa, pa.nulls(n_ev, col.type), col)

    data_tbl = pa.table(
        {
            "op": pa.array(ops.astype("U1")),
            "lsn": pa.array(data_lsn, pa.int64()),
            "conv_id": masked(conv_pa, bad_pa),
            "turn_idx": masked(pa.array(ev_turn, pa.int32()), bad_pa),
            "role": masked(pa.array(ev_role), del_pa),
            "text": masked(ev_text, del_pa),
            "tool": pc.if_else(pc.or_(del_pa, pa.array(write_tool_name)), null_str, tool_val),
            "tool_name": pc.if_else(
                pc.or_(del_pa, pa.array(~write_tool_name)), null_str, tool_val
            ),
            "score": pc.if_else(
                pc.or_(del_pa, pa.array(~has_score)),
                pa.nulls(n_ev, pa.float64()),
                pa.array(score_val, pa.float64()),
            ),
            "schema_change": null_str,
            "part": pa.array(part_col.astype(np.int64), pa.int64()),
        }
    )
    # turn_idx nulling for bad rows only (key null => malformed)
    ns = 3 * num_parts
    srows_tbl = pa.table(
        {
            "op": pa.array(["S"] * ns),
            "lsn": pa.array(
                (schema_base_lsn[:, None] + np.arange(num_parts)[None, :]).ravel(), pa.int64()
            ),
            "conv_id": pa.nulls(ns, pa.large_string()),
            "turn_idx": pa.nulls(ns, pa.int32()),
            "role": pa.nulls(ns, pa.string()),
            "text": pa.nulls(ns, pa.large_string()),
            "tool": pa.nulls(ns, pa.string()),
            "tool_name": pa.nulls(ns, pa.string()),
            "score": pa.nulls(ns, pa.float64()),
            "schema_change": pa.array(np.repeat(np.array(schema_json, dtype=object), num_parts)),
            "part": pa.array(np.tile(np.arange(num_parts), 3), pa.int64()),
        }
    )
    tbl = pa.concat_tables([data_tbl, srows_tbl]).combine_chunks()
    lsn_all = tbl["lsn"].to_numpy(zero_copy_only=False)
    ts_all = BASE_EPOCH_US + lsn_all * TS_STEP_US
    tbl = tbl.add_column(
        tbl.schema.get_field_index("schema_change"),
        "ts",
        pa.array(ts_all, pa.timestamp("us")),
    )

    # ---- write hive-partitioned, files sorted by lsn within partition ----
    # single global lexsort by (part, lsn), then contiguous slices per part —
    # O(n log n) once instead of num_parts full-table filters.
    log_dir = os.path.join(out_dir, "change_log")
    if overwrite and os.path.exists(log_dir):
        shutil.rmtree(log_dir)

    part_all = tbl["part"].to_numpy(zero_copy_only=False)
    lsn_np = tbl["lsn"].to_numpy(zero_copy_only=False)
    order = np.lexsort((lsn_np, part_all))
    tbl = tbl.take(pa.array(order))
    part_sorted = part_all[order]
    bounds = np.searchsorted(part_sorted, np.arange(num_parts + 1))
    for p in range(num_parts):
        part_tbl = tbl.slice(bounds[p], bounds[p + 1] - bounds[p]).drop(["part"])
        pdir = os.path.join(log_dir, f"part={p}")
        os.makedirs(pdir, exist_ok=True)
        n = len(part_tbl)
        splits = np.linspace(0, n, files_per_part + 1).astype(int)
        for f in range(files_per_part):
            chunk = part_tbl.slice(splits[f], splits[f + 1] - splits[f])
            # store_schema=False: don't embed the Arrow schema, so readers get
            # plain `string` columns back (large_string is a generation-side
            # detail for >2GiB offset headroom)
            pq.write_table(
                chunk, os.path.join(pdir, f"log-{f:05d}.parquet"), store_schema=False
            )

    # sidecar: schema (`S`) events only — the schema-registry channel. Readers
    # use it to build the evolution timeline without scanning the data log
    # (underscore prefix => ignored by parquet dataset discovery).
    s_mask = pc.equal(tbl["op"], "S")
    pq.write_table(
        tbl.filter(s_mask).select(["lsn", "schema_change", "part"]),
        os.path.join(log_dir, "_schema_events.parquet"),
    )

    return {
        "log_dir": log_dir,
        "n_events": int(len(tbl)),
        "max_lsn": int(lsn_all.max()),
        "n_base_rows": int(n_base),
        "n_convs": int(n_convs),
        "num_parts": int(num_parts),
        "n_malformed": int(len(bad_pos)),
        "schema_event_kinds": ["add_column", "rename_column", "widen_type"],
    }


def split_log(log_dir: str, out_prefix_dir: str, frac: float = 0.7, *, overwrite: bool = True) -> int:
    """Split an existing change log at a global LSN cutoff into a *prefix* log
    (events with ``lsn <= cutoff``) written under ``out_prefix_dir/change_log``.

    Used by incremental-apply tests: publish the prefix, then incrementally
    apply the full log — the result must equal a from-scratch replay. Returns
    the cutoff LSN.
    """
    import pyarrow.dataset as pads

    src = pads.dataset(log_dir, format="parquet", partitioning="hive")
    tbl = src.to_table()
    lsns = np.sort(tbl["lsn"].to_numpy(zero_copy_only=False))
    cutoff = int(lsns[int(frac * (len(lsns) - 1))])

    prefix_dir = os.path.join(out_prefix_dir, "change_log")
    if overwrite and os.path.exists(prefix_dir):
        shutil.rmtree(prefix_dir)
    parts = np.unique(pc.cast(tbl["part"], pa.int64()).to_numpy(zero_copy_only=False))
    for p in parts:
        mask = pc.and_(
            pc.equal(pc.cast(tbl["part"], pa.int64()), int(p)),
            pc.less_equal(tbl["lsn"], cutoff),
        )
        chunk = tbl.filter(mask).sort_by("lsn").drop(["part"])
        pdir = os.path.join(prefix_dir, f"part={int(p)}")
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(chunk, os.path.join(pdir, "log-00000.parquet"))
    return cutoff


def slice_log(
    log_dir: str, out_dir: str, fracs: list[float], *, overwrite: bool = True
) -> list[str]:
    """Split a change log into CONSECUTIVE LSN-range slices — the shape a
    live tail consumes (each slice holds only the events that "landed" since
    the previous one, unlike :func:`split_log`'s cumulative prefix). Slice k
    covers ``(cutoff(fracs[k-1]), cutoff(fracs[k])]``; the first slice starts
    from the smallest LSN. The ``_schema_events.parquet`` sidecar is copied
    into every slice verbatim: schema thresholds are compared per-event LSN,
    so pre-recording a future S event is harmless, and the incremental
    apply's timeline merge is deduplicated.

    Returns the slice directories (each a valid hive-partitioned log dir).
    Driver-side materialization like ``split_log`` — a test/bench fixture
    tool, not an engine path."""
    import pyarrow.dataset as pads

    src = pads.dataset(log_dir, format="parquet", partitioning="hive")
    tbl = src.to_table()
    lsns = np.sort(tbl["lsn"].to_numpy(zero_copy_only=False))
    cutoffs = [int(lsns[int(f * (len(lsns) - 1))]) for f in fracs]
    parts = np.unique(pc.cast(tbl["part"], pa.int64()).to_numpy(zero_copy_only=False))
    sidecar = os.path.join(log_dir, "_schema_events.parquet")
    out_dirs = []
    prev = int(lsns[0]) - 1
    for k, cut in enumerate(cutoffs):
        sdir = os.path.join(out_dir, f"slice-{k:03d}", "change_log")
        if overwrite and os.path.exists(sdir):
            shutil.rmtree(sdir)
        in_range = pc.and_(pc.greater(tbl["lsn"], prev), pc.less_equal(tbl["lsn"], cut))
        sl = tbl.filter(in_range)
        for p in parts:
            chunk = (
                sl.filter(pc.equal(pc.cast(sl["part"], pa.int64()), int(p)))
                .sort_by("lsn")
                .drop(["part"])
            )
            pdir = os.path.join(sdir, f"part={int(p)}")
            os.makedirs(pdir, exist_ok=True)
            pq.write_table(chunk, os.path.join(pdir, "log-00000.parquet"))
        if os.path.exists(sidecar):
            shutil.copyfile(sidecar, os.path.join(sdir, "_schema_events.parquet"))
        out_dirs.append(sdir)
        prev = cut
    return out_dirs
