"""Key-generic LWW replay kernels — the transcript-agnostic core of the engine.

The transcript pipeline (:mod:`odibel_ray.cdc.apply`) binds these semantics to
the ``(conv_id, turn_idx)`` key and the schema-evolution timeline; this module
exposes the same per-key last-writer-wins machinery for *any* key columns and
LSN column, so any ordered change stream (e.g. the ``events`` test table
re-interpreted as a binlog) replays through the identical code path.

Reference semantics being reproduced (see SURVEY.md §2.3):

- per-key upsert state + keep-latest — ``TemporalWindowBuilder.scala:37-50``
  (the HashMap ``put`` overwrite is our sort + neighbor-compare keep-last mask);
- delete closes the key — tombstone rows dropped at convergence;
- validity windows ``[lsn, next_lsn)`` with ``INT64_MAX`` open-window sentinel —
  ``TemporalWindowBuilder.scala:89-99`` / ``data/TemporalExtractionResult.scala:13``;
- snapshot-at-T containment filter — ``eval/EvalFunctions.scala:66-84``;
- full-outer-join diff classification — ``eval/SnapshotEval.scala:132-160``.

Everything is vectorized Arrow/numpy; no per-row Python in any hot path. The
shuffle key is ``hash(key columns) % num_buckets`` — all events of one key land
in one group, so group-local sort gives a total per-key order (Ray Data gives
no intra-block order guarantee; SURVEY.md §7 "hard parts" (a)).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

INT64_MAX = (1 << 63) - 1
_MIX = np.uint64(0x9E3779B97F4A7C15)  # 64-bit golden-ratio mix for key combining


def bucket_of_keys(
    t: pa.Table, keys: Sequence[str], num_buckets: int
) -> np.ndarray:
    """Deterministic per-row bucket from one or more key columns (vectorized)."""
    # num_buckets must be resolved DRIVER-SIDE (tuning.default_num_buckets)
    # before this ships in a closure: resolving per-task would let a cluster
    # resize mid-run split one key across two bucket values.
    if num_buckets is None:
        raise TypeError("num_buckets unresolved — call tuning.default_num_buckets driver-side")
    h = np.zeros(len(t), dtype=np.uint64)
    for k in keys:
        col = t[k].to_numpy(zero_copy_only=False)
        h = h * _MIX + pd.util.hash_array(col, categorize=False)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _same_next_key_mask(t: pa.Table, keys: Sequence[str]) -> np.ndarray:
    """``same[i]`` = row i and i+1 share the key (t sorted by keys, 1 chunk).

    Null-SAFE: ``null == null`` counts as the same key (SQL ``IS NOT
    DISTINCT FROM``), matching the modules' null-equality rule for compare
    columns — otherwise every null-keyed row looks distinct and LWW keeps
    all of its stale versions (``sort_indices`` groups nulls together, so
    the neighbor compare is valid for them too)."""
    n = len(t)
    same = np.ones(max(n - 1, 0), dtype=bool)
    for k in keys:
        hi, lo = t[k].slice(1), t[k].slice(0, n - 1)
        eq = pc.fill_null(pc.equal(hi, lo), False)
        both_null = pc.and_(pc.is_null(hi), pc.is_null(lo))
        same &= pc.or_(eq, both_null).to_numpy(zero_copy_only=False)
    return same


def keep_last_per_key(t: pa.Table, keys: Sequence[str], lsn_col: str = "lsn") -> pa.Table:
    """Sort by (keys, lsn) and keep the max-LSN row per key. Vectorized LWW."""
    if len(t) <= 1:
        return t
    t = t.combine_chunks()
    sort_keys = [(k, "ascending") for k in (*keys, lsn_col)]
    t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
    n = len(t)
    mask = np.ones(n, dtype=bool)
    mask[: n - 1] = ~_same_next_key_mask(t, keys)
    return t.filter(pa.array(mask))


def lww_latest(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    *,
    lsn_col: str = "lsn",
    op_col: str = "op",
    delete_op: str = "D",
    num_buckets: int | None = None,
    precompact: bool = True,
    batch_size: int = 65536,
    drop_op: bool = True,
    salt: int | None = None,
) -> "ray.data.Dataset":
    """Converged LWW state of a change stream: latest row per key, tombstones
    dropped. ``ds`` must carry ``keys``, ``lsn_col`` and ``op_col`` columns.

    ``precompact`` runs the within-batch combiner before the shuffle (keeps
    tombstones — they must survive to the final merge), cutting shuffle volume
    by the update ratio.

    ``salt``: hot-key sub-partitioning (SURVEY.md §4 "skew"). Stage 1 compacts
    per ``(bucket, salt = lsn % salt)`` — a hot key's events split across
    ``salt`` groups, each keeping its own max-LSN row *including tombstones* —
    then stage 2 re-merges per bucket over the (≤ salt rows per key) residue.
    LWW keep-last is associative in LSN order, so the result is identical.
    """
    from odibel_ray.tuning import default_num_buckets

    num_buckets = default_num_buckets(num_buckets)
    keys = list(keys)

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        b = bucket_of_keys(t, keys, num_buckets)
        t = t.append_column("bucket", pa.array(b, pa.int64()))
        if salt:
            s = t[lsn_col].to_numpy(zero_copy_only=False) % salt
            t = t.append_column("salt", pa.array(s.astype(np.int64)))
        return t

    def compact(t: pa.Table) -> pa.Table:
        return keep_last_per_key(t, keys, lsn_col)

    def compact_drop_salt(t: pa.Table) -> pa.Table:
        return keep_last_per_key(t, keys, lsn_col).drop_columns(["salt"])

    def finish(t: pa.Table) -> pa.Table:
        t = keep_last_per_key(t, keys, lsn_col)
        t = t.filter(pc.not_equal(t[op_col], delete_op))
        drop = ["bucket"] + ([op_col] if drop_op else [])
        return t.drop_columns(drop)

    ds = ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=batch_size)
    if precompact:
        ds = ds.map_batches(compact, batch_format="pyarrow", batch_size=batch_size)
    if salt:
        ds = ds.groupby(["bucket", "salt"]).map_groups(
            compact_drop_salt, batch_format="pyarrow"
        )
    return ds.groupby("bucket").map_groups(finish, batch_format="pyarrow")


def snapshot_at(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    at_lsn: int,
    **kwargs,
) -> "ray.data.Dataset":
    """Converged state as of ``lsn <= at_lsn`` (time-travel read of the stream;
    snapshot filter analog of ``eval/EvalFunctions.scala:66-84``)."""
    lsn_col = kwargs.get("lsn_col", "lsn")
    ds = ds.filter(expr=f"{lsn_col} <= {int(at_lsn)}")
    return lww_latest(ds, keys, **kwargs)


def change_windows(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    *,
    lsn_col: str = "lsn",
    op_col: str = "op",
    delete_op: str = "D",
    num_buckets: int | None = None,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Version-history windows: every non-delete event opens ``[lsn, next_lsn)``
    for its key; the live version carries ``lsn_end = INT64_MAX`` (open-window
    sentinel, ``TemporalWindowBuilder.scala:92``). Deletes close the previous
    window and emit no row."""
    from odibel_ray.tuning import default_num_buckets

    num_buckets = default_num_buckets(num_buckets)
    keys = list(keys)

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        b = bucket_of_keys(t, keys, num_buckets)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    def windows(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        sort_keys = [(k, "ascending") for k in (*keys, lsn_col)]
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        n = len(t)
        lsn = t[lsn_col].to_numpy(zero_copy_only=False)
        next_same = np.zeros(n, dtype=bool)
        if n > 1:
            next_same[: n - 1] = _same_next_key_mask(t, keys)
        lsn_end = np.where(next_same, np.roll(lsn, -1), INT64_MAX)
        out = t.rename_columns(
            [c if c != lsn_col else "lsn_start" for c in t.column_names]
        ).append_column("lsn_end", pa.array(lsn_end, pa.int64()))
        out = out.filter(pc.not_equal(out[op_col], delete_op))
        return out.drop_columns(["bucket", op_col])

    ds = ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=batch_size)
    return ds.groupby("bucket").map_groups(windows, batch_format="pyarrow")


def change_feed(
    old: "ray.data.Dataset",
    new: "ray.data.Dataset",
    keys: Sequence[str],
    values: Sequence[str],
    *,
    num_buckets: int | None = None,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Row-level change-data-feed between two converged table states: one row
    per key that was inserted, updated or deleted going ``old -> new``, with
    before/after values (the CDF read a lakehouse sink exposes downstream;
    before/after extension of the ``SnapshotEval.calculateDiffDF`` diff,
    ``eval/SnapshotEval.scala:132-160``).

    Output columns: ``*keys, change ('insert'|'update'|'delete'),
    {v}_before, {v}_after for v in values``. Inserts carry null ``_before``,
    deletes null ``_after``; updates are keys present on both sides where any
    value column differs (null == null counts as equal).

    Same single-exchange shape as :func:`outer_diff`: tag each side, union,
    shuffle once on the key hash, pair rows group-locally — no join operator,
    so at 100 TB the cost is one all-to-all over ``keys + values`` only.
    Both inputs must be converged states (at most one row per key per side).
    """
    from odibel_ray.tuning import default_num_buckets

    num_buckets = default_num_buckets(num_buckets)
    keys, values = list(keys), list(values)

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            t = t.combine_chunks().select(keys + values)
            t = t.append_column("_side", pa.array(np.full(len(t), side, np.int64)))
            b = bucket_of_keys(t, keys, num_buckets)
            return t.append_column("bucket", pa.array(b, pa.int64()))

        return f

    def feed(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        sort_keys = [(k, "ascending") for k in keys] + [("_side", "ascending")]
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        n = len(t)
        same_next = np.zeros(n, dtype=bool)
        if n > 1:
            same_next[: n - 1] = _same_next_key_mask(t, keys)
        same_prev = np.roll(same_next, 1)
        same_prev[0] = False
        side = t["_side"].to_numpy(zero_copy_only=False)
        paired = same_next | same_prev
        only_old = (~paired) & (side == -1)
        only_new = (~paired) & (side == 1)
        differs = np.zeros(n, dtype=bool)
        if n > 1:
            d = np.zeros(n - 1, dtype=bool)
            for c in values:
                col = t[c]
                eq = pc.equal(col.slice(1), col.slice(0, n - 1))
                both_null = pc.and_(
                    pc.is_null(col.slice(1)), pc.is_null(col.slice(0, n - 1))
                )
                eqv = pc.or_(pc.fill_null(eq, False), both_null).to_numpy(
                    zero_copy_only=False
                )
                d |= ~eqv
            differs[: n - 1] = d & same_next[: n - 1]
        changed_old = differs & same_next & (side == -1)
        idx = np.arange(n)
        del_rows = t.take(pa.array(idx[only_old]))
        ins_rows = t.take(pa.array(idx[only_new]))
        upd_old_idx = idx[changed_old]
        upd_old = t.take(pa.array(upd_old_idx))
        upd_new = t.take(pa.array(upd_old_idx + 1))

        def mk(key_src: pa.Table, before: pa.Table | None, after: pa.Table | None,
               label: str) -> pa.Table:
            m = len(key_src)
            arrs = [key_src[k] for k in keys]
            names = list(keys)
            arrs.append(pa.array(np.full(m, label, dtype=object), pa.string()))
            names.append("change")
            for v in values:
                vt = t.schema.field(v).type
                arrs.append(before[v] if before is not None else pa.nulls(m, vt))
                names.append(f"{v}_before")
                arrs.append(after[v] if after is not None else pa.nulls(m, vt))
                names.append(f"{v}_after")
            return pa.table(dict(zip(names, arrs)))

        return pa.concat_tables(
            [
                mk(del_rows, del_rows, None, "delete"),
                mk(ins_rows, None, ins_rows, "insert"),
                mk(upd_old, upd_old, upd_new, "update"),
            ]
        )

    tagged = old.map_batches(tag(-1), batch_format="pyarrow", batch_size=batch_size).union(
        new.map_batches(tag(1), batch_format="pyarrow", batch_size=batch_size)
    )
    return tagged.groupby("bucket").map_groups(feed, batch_format="pyarrow")


def outer_diff(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    keys: Sequence[str],
    compare: Sequence[str],
    *,
    num_buckets: int | None = None,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Full-outer-join diff of two keyed tables → one row per differing key with
    ``diff ∈ {'added', 'deleted', 'changed'}`` (``SnapshotEval.calculateDiffDF``
    analog, ``eval/SnapshotEval.scala:132-160``; used as the conformance check
    between an engine table and an oracle table).

    Implemented without a join operator: tag each side (+1/-1), union, shuffle
    once on the key hash, and classify per group — one all-to-all instead of a
    join's two.
    """
    from odibel_ray.tuning import default_num_buckets

    num_buckets = default_num_buckets(num_buckets)
    keys, compare = list(keys), list(compare)

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            t = t.combine_chunks().select(keys + compare)
            t = t.append_column("_side", pa.array(np.full(len(t), side, np.int64)))
            b = bucket_of_keys(t, keys, num_buckets)
            return t.append_column("bucket", pa.array(b, pa.int64()))

        return f

    def classify(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        sort_keys = [(k, "ascending") for k in keys] + [("_side", "ascending")]
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        n = len(t)
        same_next = np.zeros(n, dtype=bool)
        if n > 1:
            same_next[: n - 1] = _same_next_key_mask(t, keys)
        same_prev = np.roll(same_next, 1)
        same_prev[0] = False
        side = t["_side"].to_numpy(zero_copy_only=False)
        # paired keys: rows where both sides present (same key as neighbor)
        paired = same_next | same_prev
        only_left = (~paired) & (side == -1)
        only_right = (~paired) & (side == 1)
        # changed: paired and any compare column differs from the neighbor row
        differs = np.zeros(n, dtype=bool)
        if n > 1:
            d = np.zeros(n - 1, dtype=bool)
            for c in compare:
                col = t[c]
                eq = pc.equal(col.slice(1), col.slice(0, n - 1))
                # null == null counts as equal for diff purposes
                both_null = pc.and_(
                    pc.is_null(col.slice(1)), pc.is_null(col.slice(0, n - 1))
                )
                eqv = pc.or_(pc.fill_null(eq, False), both_null).to_numpy(
                    zero_copy_only=False
                )
                d |= ~eqv
            differs[: n - 1] = d & same_next[: n - 1]
        changed_first = differs & same_next & (side == -1)
        label = np.full(n, "", dtype=object)
        label[only_left] = "deleted"
        label[only_right] = "added"
        label[changed_first] = "changed"
        keep = only_left | only_right | changed_first
        out = t.select(keys).append_column("diff", pa.array(label, pa.string()))
        return out.filter(pa.array(keep))

    tagged = left.map_batches(tag(-1), batch_format="pyarrow", batch_size=batch_size).union(
        right.map_batches(tag(1), batch_format="pyarrow", batch_size=batch_size)
    )
    return tagged.groupby("bucket").map_groups(classify, batch_format="pyarrow")
