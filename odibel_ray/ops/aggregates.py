"""Aggregation pipelines (SURVEY.md §2.5) — time buckets, distinct counts,
two-level groupbys, per-group stats with exact quantiles, ±1 change streams.

All group-bys pre-aggregate inside ``map_batches`` where the combiner is
associative (counts, sums, min/max) so the shuffle moves partial rows, not
events — the reference relied on Spark's own partial aggregation; Ray Data's
``groupby().aggregate`` does hash-partial too, but the explicit derive-column
step (time bucket, degree) happens vectorized before it.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def with_time_bucket(
    ds: "ray.data.Dataset",
    ts_col: str,
    unit: str = "day",
    out_col: str = "bucket_ts",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Add a truncated-time string column (``from_unixtime``/``year``/``date_format``
    analogs, ``eval/EvalFunctions.scala:89,111,174``). ``unit`` ∈ {year, month,
    day, hour}. String output so it hash-compares exactly against SQL
    ``strftime`` — no float/tz ambiguity."""
    fmt = {"year": "%Y", "month": "%Y-%m", "day": "%Y-%m-%d", "hour": "%Y-%m-%d %H"}[unit]

    def f(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        return t.append_column(out_col, pc.strftime(t[ts_col], format=fmt))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def _partition_firsts(t: pa.Table, keys: Sequence[str], n: int) -> np.ndarray:
    """Boolean mask of partition-first rows over a table SORTED by ``keys``:
    row 0 and every row where ANY key component differs from the previous
    row. Null-safe SQL semantics — NULL keys form ONE partition (two
    adjacent nulls are equal), matching PARTITION BY."""
    first = np.zeros(n, dtype=bool)
    first[0] = True
    for k in keys:
        a, b = t[k].slice(1), t[k].slice(0, n - 1)
        eq = pc.fill_null(pc.equal(a, b), False).to_numpy(zero_copy_only=False)
        both_null = pc.and_(pc.is_null(a), pc.is_null(b)).to_numpy(
            zero_copy_only=False
        )
        first[1:] |= ~(eq | both_null)
    return first


def _window_bucketed(ds, keys, num_buckets, batch_size, local):
    """Shared scaffold of the window kernels (lag/cumsum/moving_sum/rank):
    tag each row with a key-hash bucket (a partition never splits across
    buckets), one groupby exchange, then the per-bucket vectorized kernel."""
    from odibel_ray.cdc.lww import bucket_of_keys

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        b = bucket_of_keys(t, keys, num_buckets)
        return t.append_column("_wbucket", pa.array(b, pa.int64()))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow",
                              batch_size=batch_size)
    return bucketed.groupby("_wbucket").map_groups(local, batch_format="pyarrow")


def sessionize(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    ts_col: str,
    *,
    gap_us: int,
    tie_cols: Sequence[str] = (),
    out: str = "session_id",
    num_buckets: int = 64,
    batch_size: int = 65536,
    emit: str = "events",
    agg_col: str | None = None,
) -> "ray.data.Dataset":
    """Gap-based sessionization (the streaming session-window the reference
    lacks): a new session starts when the time since the key's previous event
    exceeds ``gap_us``. Emits a per-key 0-based ``session_id``.

    One key-hash shuffle; within each bucket the kernel is a vectorized sort +
    lag-diff + segmented cumulative sum — equivalent to the SQL
    ``sum(gap_break) OVER (PARTITION BY key ORDER BY ts)`` window, so exactly
    oracle-checkable. ``tie_cols`` pin a deterministic order for equal
    timestamps.

    ``emit='sessions'`` aggregates INSIDE the kernel (sessions never cross
    buckets): one row per session with ``n_events`` and, when ``agg_col`` is
    given, ``min_<agg_col>`` — avoiding a second high-cardinality groupby
    shuffle for per-session stats.
    """
    from odibel_ray.cdc.lww import bucket_of_keys

    keys = list(keys)
    tie_cols = list(tie_cols)

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        b = bucket_of_keys(t, keys, num_buckets)
        return t.append_column("_sbucket", pa.array(b, pa.int64()))

    def local(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        sort_keys = [(k, "ascending") for k in keys + [ts_col] + tie_cols]
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        n = len(t)
        if n == 0:
            base_t = t.drop_columns(["_sbucket"])
            if emit == "events":
                return base_t.append_column(out, pa.array([], pa.int64()))
            res = base_t.select(keys).append_column(out, pa.array([], pa.int64()))
            res = res.append_column("n_events", pa.array([], pa.int64()))
            if agg_col is not None:
                res = res.append_column(
                    f"min_{agg_col}", pa.array([], base_t[agg_col].type)
                )
            return res
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        key_change = _partition_firsts(t, keys, n)
        # row 0 and every key boundary start a session; within a key, a gap does
        new_sess = key_change.copy()
        new_sess[1:] |= (ts[1:] - ts[:-1]) > gap_us
        new_sess[0] = True
        sid_global = np.cumsum(new_sess) - 1
        base = np.where(key_change, sid_global, 0)
        base = np.maximum.accumulate(base)  # sid at each key's first row
        sid = (sid_global - base).astype(np.int64)
        if emit == "events":
            return t.drop_columns(["_sbucket"]).append_column(out, pa.array(sid))
        seg_starts = np.flatnonzero(new_sess)
        counts = np.diff(np.append(seg_starts, n)).astype(np.int64)
        take = pa.array(seg_starts.astype(np.int64))
        res = t.select(keys).take(take)
        res = res.append_column(out, pa.array(sid[seg_starts]))
        res = res.append_column("n_events", pa.array(counts))
        if agg_col is not None:
            vals = t[agg_col].to_numpy(zero_copy_only=False)
            res = res.append_column(
                f"min_{agg_col}", pa.array(np.minimum.reduceat(vals, seg_starts))
            )
        return res

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=batch_size)
    return bucketed.groupby("_sbucket").map_groups(local, batch_format="pyarrow")


def sliding_window_counts(
    ds: "ray.data.Dataset",
    ts_col: str,
    *,
    width_us: int,
    step_us: int,
    keys: Sequence[str] = (),
    out_start: str = "window_start",
    out_count: str = "n",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Sliding event-time window counts (width ``width_us``, hop ``step_us``):
    every event fans out to the ``width/step`` windows containing it (a 1→k
    row explosion inside ``map_batches``), then one groupby-count per
    (window_start, keys). Tumbling windows are the ``width == step`` case.
    ``window_start`` is an epoch-aligned timestamp, so the whole operator is
    window-function-free SQL (cross join with the hop offsets)."""
    if width_us % step_us:
        raise ValueError("width must be a multiple of step")
    k = width_us // step_us
    keys = list(keys)

    def explode(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(ts)
        base = (ts // step_us) * step_us  # newest window containing the event
        starts = (
            np.repeat(base, k) - np.tile(np.arange(k, dtype=np.int64) * step_us, n)
        )
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        out = t.select(keys).take(idx) if keys else pa.table({})
        col = pa.array(starts, pa.int64()).cast(pa.timestamp("us"))
        if keys:
            return out.append_column(out_start, col)
        return pa.table({out_start: col})

    exploded = ds.map_batches(explode, batch_format="pyarrow", batch_size=batch_size)
    return group_count(exploded, keys + [out_start], out=out_count)


def window_lag(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    order_col: str,
    cols: Sequence[str],
    *,
    tie_cols: Sequence[str] = (),
    suffix: str = "_prev",
    offset: int = 1,
    num_buckets: int = 64,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """SQL ``LAG(col, offset) OVER (PARTITION BY keys ORDER BY order_col)``
    — the window-function class the engine otherwise expresses only inside
    special kernels (sessionize's gap test, the LWW diff). Emits every input
    row plus ``<col><suffix>`` for each requested column, null where the
    offset row falls outside the partition. A negative ``offset`` is LEAD
    (``offset=-1`` ⇔ ``LEAD(col, 1)``).

    One key-hash shuffle (partitions never split across buckets); within each
    bucket the kernel is one vectorized sort + a shift-by-offset ``take``
    masked by segment-id equality — no per-row Python. ``tie_cols`` pin a
    deterministic order for equal ``order_col`` values.
    """
    keys = list(keys)
    cols = list(cols)
    tie_cols = list(tie_cols)

    def local(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_wbucket"]).combine_chunks()
        n = len(t)
        if n == 0:
            for c in cols:
                t = t.append_column(c + suffix, pa.array([], t[c].type))
            return t
        sort_keys = [(k, "ascending") for k in keys + [order_col] + tie_cols]
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        first = _partition_firsts(t, keys, n)
        seg = np.cumsum(first) - 1
        idx = np.arange(n, dtype=np.int64) - offset
        oob = (idx < 0) | (idx >= n)
        invalid = oob | (seg[np.clip(idx, 0, n - 1)] != seg)
        prev_idx = pa.array(idx, mask=invalid)
        for c in cols:
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            t = t.append_column(c + suffix, col.take(prev_idx))
        return t

    return _window_bucketed(ds, keys, num_buckets, batch_size, local)


def window_cumsum(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    *,
    tie_cols: Sequence[str] = (),
    out: str | None = None,
    num_buckets: int = 64,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """SQL ``SUM(value) OVER (PARTITION BY keys ORDER BY order_col ROWS
    UNBOUNDED PRECEDING)`` — per-key running totals, the cumulative sibling
    of :func:`window_lag` (same one-shuffle kernel: key-hash buckets, one
    vectorized sort, then a segmented cumulative sum). NULL values are
    skipped like SQL SUM (the running total is NULL until the partition has
    seen a non-null value). Integer value columns stay exact; pre-quantize
    floats (e.g. to cents) when cross-engine bit-reproducibility matters."""
    keys = list(keys)
    tie_cols = list(tie_cols)
    out = out or f"{value_col}_running"

    def local(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_wbucket"]).combine_chunks()
        n = len(t)
        v_type = t[value_col].type
        if n == 0:
            return t.append_column(out, pa.array([], v_type))
        sort_keys = [(k, "ascending") for k in keys + [order_col] + tie_cols]
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        first = _partition_firsts(t, keys, n)
        col = t[value_col]
        # SQL SUM OVER skips NULLs: cumsum over fill_null(0) stays exact for
        # int types (to_numpy on a null-bearing int column would go float64
        # with NaN and poison the whole bucket past the null)
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        v = pc.fill_null(col, pa.scalar(0, v_type)).to_numpy(zero_copy_only=False)
        c = np.cumsum(v)
        starts = np.flatnonzero(first)
        seg_id = np.cumsum(first) - 1
        base = (c[starts] - v[starts])[seg_id]
        cv = np.cumsum(valid)
        seen = (cv - (cv[starts] - valid[starts])[seg_id]) > 0
        return t.append_column(
            out, pa.array(np.asarray(c - base), v_type, mask=~seen)
        )

    return _window_bucketed(ds, keys, num_buckets, batch_size, local)


def window_moving_sum(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    window: int,
    *,
    tie_cols: Sequence[str] = (),
    out: str | None = None,
    num_buckets: int = 64,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """SQL ``SUM(value) OVER (PARTITION BY keys ORDER BY order_col ROWS
    BETWEEN window-1 PRECEDING AND CURRENT ROW)`` — per-key moving-window
    totals, same one-shuffle kernel as :func:`window_cumsum` with the
    window's lower bound clamped to the partition start (one global cumsum,
    two vectorized gathers). NULL values are skipped like SQL SUM (the
    moving sum is NULL when every value in the frame is NULL). Integer
    values stay exact; pre-quantize floats when cross-engine
    bit-reproducibility matters."""
    if window < 1:
        raise ValueError("window must be >= 1")
    keys = list(keys)
    tie_cols = list(tie_cols)
    out = out or f"{value_col}_moving{window}"

    def local(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_wbucket"]).combine_chunks()
        n = len(t)
        v_type = t[value_col].type
        if n == 0:
            return t.append_column(out, pa.array([], v_type))
        sort_keys = [(k, "ascending") for k in keys + [order_col] + tie_cols]
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        first = _partition_firsts(t, keys, n)
        col = t[value_col]
        # SQL SUM OVER skips NULLs — see window_cumsum for why fill_null(0)
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        v = pc.fill_null(col, pa.scalar(0, v_type)).to_numpy(zero_copy_only=False)
        c = np.cumsum(v)
        pos = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(first, pos, 0))
        lo = np.maximum(pos - window + 1, seg_start)
        base = np.where(lo > 0, c[np.maximum(lo - 1, 0)], 0)
        cv = np.cumsum(valid)
        cnt = cv - np.where(lo > 0, cv[np.maximum(lo - 1, 0)], 0)
        return t.append_column(
            out, pa.array(np.asarray(c - base), v_type, mask=cnt == 0)
        )

    return _window_bucketed(ds, keys, num_buckets, batch_size, local)


def pivot_counts(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    cat_col: str,
    categories: Sequence[str],
    *,
    value_col: str | None = None,
    prefix: str = "n_",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """SQL PIVOT / conditional aggregation: one output row per ``keys`` with a
    ``<prefix><category>`` column per category — counts, or sums of
    ``value_col`` when given. ``categories`` must be the bounded, explicit
    category list (the pivot schema cannot depend on the data at scale).

    Combiner-first: each batch collapses to per-key wide partial rows via one
    Arrow ``group_by`` (so the single groupby exchange moves one row per
    (batch, distinct key), never one per event), then a sum-merge per key.
    Values outside ``categories`` are ignored.
    """
    from ray.data.aggregate import Sum

    keys = list(keys)
    categories = list(categories)
    out_cols = [prefix + str(c) for c in categories]

    def _partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        cat = t[cat_col]
        if value_col is not None:  # keep the measure's own numeric type
            val = t[value_col]
            zero = pa.scalar(0, val.type)
        else:
            val = pa.array(np.ones(len(t), np.int64))
            zero = pa.scalar(0, pa.int64())
        wide = t.select(keys)
        for c, out in zip(categories, out_cols):
            mask = pc.fill_null(pc.equal(cat, pa.scalar(c)), False)
            wide = wide.append_column(out, pc.if_else(mask, val, zero))
        return wide.group_by(keys).aggregate(
            [(o, "sum") for o in out_cols]
        ).rename_columns(keys + out_cols)

    partial = ds.map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)
    return partial.groupby(keys).aggregate(
        *[Sum(o, alias_name=o) for o in out_cols]
    )


def rollup_counts(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    *,
    value_col: str | None = None,
    count_name: str = "n",
    sum_prefix: str = "sum_",
    grouping: str = "rollup",
    sets: Sequence[Sequence[str]] | None = None,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """SQL ``GROUP BY ROLLUP(keys...)`` (``CUBE`` with ``grouping='cube'``,
    or arbitrary ``GROUPING SETS`` with ``grouping='sets'`` + ``sets=``):
    counts (and sums of ``value_col``) at every key-prefix granularity —
    every key SUBSET for cube, exactly the requested subsets for sets —
    grouped-out key columns null.

    Scale shape: the CORPUS is exchanged exactly once (the finest groupby on
    the full ``keys``); every coarser level re-aggregates an
    already-aggregated table (cardinality of a finer key set, not the
    corpus — rollup chains prefix levels, cube derives each of the 2^k−2
    proper subsets from the finest, sets derives each requested subset),
    and the final union is level-sized. Caveats: like SQL without
    ``GROUPING()``, a genuine null key value is indistinguishable from a
    subtotal row — use non-null keys or pre-coalesce; ``sets`` entries must
    be subsets of ``keys`` (order within a set is irrelevant) and duplicate
    sets emit duplicate rows, exactly like SQL ``GROUPING SETS``.
    """
    import itertools

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    if grouping not in ("rollup", "cube", "sets"):
        raise ValueError(f"unknown grouping: {grouping!r}")
    keys = list(keys)
    if grouping == "sets":
        if sets is None:
            raise ValueError("grouping='sets' requires sets=[...]")
        sets = [list(s) for s in sets]
        for s in sets:
            if len(s) != len(set(s)):
                raise ValueError(f"grouping set {s!r} repeats a column")
            if not set(s) <= set(keys):
                raise ValueError(f"grouping set {s!r} is not a subset of {keys!r}")
    elif sets is not None:
        raise ValueError("sets= is only valid with grouping='sets'")
    sum_col = f"{sum_prefix}{value_col}" if value_col is not None else None

    aggs = [Count(alias_name=count_name)]
    if value_col is not None:
        aggs.append(Sum(value_col, alias_name=sum_col))
    finest = ds.groupby(keys).aggregate(*aggs).materialize()
    schema = finest.schema()
    if schema is None:  # zero-row input: the aggregate has no blocks/schema
        schema = ds.schema()
    key_types = {
        k: (schema.base_schema.field(k).type if schema is not None else pa.null())
        for k in keys
    }

    def _null_fill(missing: list[str]):
        def f(t: pa.Table) -> pa.Table:
            for k in missing:
                t = t.append_column(k, pa.nulls(len(t), key_types[k]))
            cols = keys + [count_name] + ([sum_col] if sum_col else [])
            return t.select(cols)
        return f

    sub_aggs = [Sum(count_name, alias_name=count_name)]
    if sum_col is not None:
        sub_aggs.append(Sum(sum_col, alias_name=sum_col))

    levels = []
    prev = finest  # always the un-null-filled aggregate at the finer level
    n_totals = 1  # how many grand-total rows the output needs
    if grouping == "rollup":
        levels.append(finest)
        for k in range(len(keys) - 1, 0, -1):
            prev = prev.groupby(keys[:k]).aggregate(*sub_aggs).materialize()
            levels.append(prev.map_batches(_null_fill(keys[k:]),
                                           batch_format="pyarrow",
                                           batch_size=batch_size))
    elif grouping == "cube":  # every proper non-empty subset, from the finest
        levels.append(finest)
        for r in range(len(keys) - 1, 0, -1):
            for subset in itertools.combinations(keys, r):
                lvl = finest.groupby(list(subset)).aggregate(*sub_aggs)
                missing = [k for k in keys if k not in subset]
                levels.append(lvl.map_batches(_null_fill(missing),
                                              batch_format="pyarrow",
                                              batch_size=batch_size))
    else:  # sets: exactly the requested subsets, each from the finest
        n_totals = sum(1 for s in sets if not s)
        for s in sets:
            if not s:
                continue  # grand-total row(s) appended below
            if set(s) == set(keys):
                levels.append(finest)
                continue
            lvl = finest.groupby(list(s)).aggregate(*sub_aggs)
            missing = [k for k in keys if k not in s]
            levels.append(lvl.map_batches(_null_fill(missing),
                                          batch_format="pyarrow",
                                          batch_size=batch_size))
    if n_totals:
        tot = prev.aggregate(*sub_aggs) or {}  # grand total: one global row
        # SQL semantics on zero-row input: grand-total row, COUNT = 0, SUM null
        row: dict = {
            count_name: pa.array([int(tot.get(count_name) or 0)] * n_totals,
                                 pa.int64())
        }
        if sum_col:
            row[sum_col] = pa.array([tot.get(sum_col)] * n_totals)
        levels.append(rd.from_arrow(pa.table(row)).map_batches(
            _null_fill(keys), batch_format="pyarrow", batch_size=batch_size))
    if not levels:  # sets=[] — SQL GROUPING SETS needs >= 1 set
        raise ValueError("grouping='sets' requires at least one grouping set")
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def melt(
    ds: "ray.data.Dataset",
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    *,
    var_name: str = "variable",
    value_name: str = "value",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """SQL UNPIVOT / pandas ``melt``: each input row fans out to one row per
    ``value_cols`` entry, ``(id_cols..., variable, value)``. A pure 1→k
    streaming explosion inside ``map_batches`` — no shuffle, no state; the
    inverse of :func:`pivot_counts`. Value columns are cast to a common Arrow
    type (standard UNPIVOT requirement — pass compatible columns)."""
    id_cols = list(id_cols)
    value_cols = list(value_cols)

    def _explode(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        n = len(t)
        k = len(value_cols)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        out = t.select(id_cols).take(idx)
        var = pa.array(np.tile(np.asarray(value_cols, dtype=object), n),
                       pa.string())
        vtype = pa.unify_schemas(
            [pa.schema([("v", t[c].type)]) for c in value_cols],
            promote_options="permissive",
        ).field("v").type
        cols = [t[c].cast(vtype).combine_chunks() for c in value_cols]
        # interleave: row-major (row0 c0..ck-1, row1 c0..ck-1, ...)
        vals = pa.chunked_array(cols).combine_chunks()
        order = (np.tile(np.arange(k, dtype=np.int64) * n, n)
                 + np.repeat(np.arange(n, dtype=np.int64), k))
        out = out.append_column(var_name, var)
        return out.append_column(value_name, vals.take(pa.array(order)))

    return ds.map_batches(_explode, batch_format="pyarrow", batch_size=batch_size)


def window_rank(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    order_col: str,
    *,
    kind: str = "row_number",
    tie_cols: Sequence[str] = (),
    descending: bool = False,
    out: str | None = None,
    num_buckets: int = 64,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """SQL ``ROW_NUMBER() / RANK() / DENSE_RANK() OVER (PARTITION BY keys
    ORDER BY order_col)`` — same one-shuffle kernel as :func:`window_lag`
    (key-hash buckets, one vectorized sort, segment-relative positions).
    ``kind`` ∈ {'row_number', 'rank', 'dense_rank'}; rank/dense_rank tie on
    equal ``order_col`` values — NULL order values are peers of each other,
    like SQL window ordering (``tie_cols`` only stabilize row order)."""
    if kind not in ("row_number", "rank", "dense_rank"):
        raise ValueError(f"unknown rank kind: {kind!r}")
    keys = list(keys)
    tie_cols = list(tie_cols)
    out = out or kind

    order = "descending" if descending else "ascending"

    def local(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_wbucket"]).combine_chunks()
        n = len(t)
        if n == 0:
            return t.append_column(out, pa.array([], pa.int64()))
        sort_keys = ([(k, "ascending") for k in keys] + [(order_col, order)]
                     + [(k, "ascending") for k in tie_cols])
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        first = _partition_firsts(t, keys, n)
        pos = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(first, pos, 0))
        rownum = pos - seg_start + 1
        if kind == "row_number":
            r = rownum
        else:
            # NULL order values are window-ordering peers (SQL): two adjacent
            # NULLs compare equal, same rule as _partition_firsts for keys
            a, b = t[order_col].slice(1), t[order_col].slice(0, n - 1)
            oeq = pc.or_(
                pc.fill_null(pc.equal(a, b), False),
                pc.and_(pc.is_null(a), pc.is_null(b)),
            ).to_numpy(zero_copy_only=False)
            new_val = first.copy()
            new_val[1:] |= ~oeq  # order value changed within the partition
            if kind == "rank":
                anchor = np.maximum.accumulate(np.where(new_val, pos, 0))
                r = anchor - seg_start + 1
            else:  # dense_rank: count of distinct order values so far in seg
                dv = np.cumsum(new_val)
                r = dv - np.maximum.accumulate(np.where(first, dv - 1, 0))
        return t.append_column(out, pa.array(r, pa.int64()))

    return _window_bucketed(ds, keys, num_buckets, batch_size, local)


def window_ntile(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    order_col: str,
    n: int,
    *,
    tie_cols: Sequence[str] = (),
    out: str = "ntile",
    num_buckets: int = 64,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """SQL ``NTILE(n) OVER (PARTITION BY keys ORDER BY order_col)`` —
    SQL's remainder rule (the first ``size % n`` tiles get one extra row).
    Same one-shuffle kernel as :func:`window_rank`."""
    if n < 1:
        raise ValueError("ntile requires n >= 1")
    keys = list(keys)
    tie_cols = list(tie_cols)

    def local(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_wbucket"]).combine_chunks()
        nr = len(t)
        if nr == 0:
            return t.append_column(out, pa.array([], pa.int64()))
        sort_keys = (
            [(k, "ascending") for k in keys]
            + [(order_col, "ascending")]
            + [(k, "ascending") for k in tie_cols]
        )
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        first = _partition_firsts(t, keys, nr)
        pos = np.arange(nr, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(first, pos, 0))
        rownum = pos - seg_start  # 0-based within segment
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, nr))
        size = np.repeat(sizes, sizes)
        base = size // n
        rem = size % n
        cut = (base + 1) * rem  # rows covered by the fat tiles
        fat = rownum < cut
        tile = np.where(
            fat,
            rownum // np.maximum(base + 1, 1),
            rem + (rownum - cut) // np.maximum(base, 1),
        ) + 1
        # more partitions than rows: SQL gives row i tile i+1
        tile = np.where(base == 0, np.minimum(rownum + 1, size), tile)
        return t.append_column(out, pa.array(tile.astype(np.int64)))

    return _window_bucketed(ds, keys, num_buckets, batch_size, local)


def window_percent_rank(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    order_col: str,
    *,
    tie_cols: Sequence[str] = (),
    out: str = "percent_rank",
    num_buckets: int = 64,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """SQL ``PERCENT_RANK() OVER (PARTITION BY keys ORDER BY order_col)``
    = (rank − 1) / (partition_size − 1), 0.0 for single-row partitions;
    ties on equal order values rank together (NULLs are peers)."""
    keys = list(keys)
    tie_cols = list(tie_cols)

    def local(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_wbucket"]).combine_chunks()
        nr = len(t)
        if nr == 0:
            return t.append_column(out, pa.array([], pa.float64()))
        sort_keys = (
            [(k, "ascending") for k in keys]
            + [(order_col, "ascending")]
            + [(k, "ascending") for k in tie_cols]
        )
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        first = _partition_firsts(t, keys, nr)
        pos = np.arange(nr, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(first, pos, 0))
        a, b = t[order_col].slice(1), t[order_col].slice(0, nr - 1)
        oeq = pc.or_(
            pc.fill_null(pc.equal(a, b), False),
            pc.and_(pc.is_null(a), pc.is_null(b)),
        ).to_numpy(zero_copy_only=False) if nr > 1 else np.zeros(0, bool)
        new_val = first.copy()
        new_val[1:] |= ~oeq
        anchor = np.maximum.accumulate(np.where(new_val, pos, 0))
        rank = anchor - seg_start + 1
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, nr))
        size = np.repeat(sizes, sizes)
        pr = np.where(size > 1, (rank - 1) / np.maximum(size - 1, 1), 0.0)
        return t.append_column(out, pa.array(np.round(pr, 6)))

    return _window_bucketed(ds, keys, num_buckets, batch_size, local)


def window_partition_values(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    *,
    tie_cols: Sequence[str] = (),
    first_out: str | None = "first_value",
    last_out: str | None = "last_value",
    num_buckets: int = 64,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """SQL ``FIRST_VALUE`` / ``LAST_VALUE`` over the FULL partition frame
    (``ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING`` — the
    frame people almost always mean; SQL's default frame makes LAST_VALUE
    the current row, a classic footgun this API sidesteps)."""
    keys = list(keys)
    tie_cols = list(tie_cols)

    def local(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_wbucket"]).combine_chunks()
        nr = len(t)
        if nr == 0:
            out = t
            if first_out:
                out = out.append_column(
                    first_out, pa.nulls(0, t.schema.field(value_col).type)
                )
            if last_out:
                out = out.append_column(
                    last_out, pa.nulls(0, t.schema.field(value_col).type)
                )
            return out
        sort_keys = (
            [(k, "ascending") for k in keys]
            + [(order_col, "ascending")]
            + [(k, "ascending") for k in tie_cols]
        )
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        first = _partition_firsts(t, keys, nr)
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, nr))
        ends = starts + sizes - 1
        out = t
        if first_out:
            out = out.append_column(
                first_out,
                t[value_col].take(pa.array(np.repeat(starts, sizes))),
            )
        if last_out:
            out = out.append_column(
                last_out,
                t[value_col].take(pa.array(np.repeat(ends, sizes))),
            )
        return out

    return _window_bucketed(ds, keys, num_buckets, batch_size, local)


def group_mode(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    value_col: str,
    *,
    out: str | None = None,
    count_name: str = "n",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Most frequent ``value_col`` per ``keys`` (SQL MODE, made deterministic:
    ties broken by the smallest value). ONE exchange: each batch collapses to
    (keys, value, partial count) via Arrow ``group_by`` (combiner), the keyed
    groupby co-locates a key's full value histogram, and the per-group kernel
    sums partials + argmaxes in one vectorized pass."""
    keys = list(keys)
    out = out or f"mode_{value_col}"

    def _partial(t: pa.Table) -> pa.Table:
        t = t.select(keys + [value_col]).combine_chunks()
        g = t.group_by(keys + [value_col]).aggregate([([], "count_all")])
        return g.rename_columns(keys + [value_col, "cnt"])

    def _pick(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        h = g.group_by([value_col]).aggregate([("cnt", "sum")])
        # max count, ties -> smallest value: sort (cnt desc, value asc), take 1
        idx = pc.sort_indices(
            h, sort_keys=[("cnt_sum", "descending"), (value_col, "ascending")]
        )
        top = h.take(idx.slice(0, 1))
        res = g.select(keys).slice(0, 1)
        res = res.append_column(out, top[value_col])
        return res.append_column(count_name, top["cnt_sum"])

    partial = ds.map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)
    return partial.groupby(keys).map_groups(_pick, batch_format="pyarrow")


def group_count(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    out: str = "n",
    *,
    num_buckets: int = 64,
    batch_size: int = 65536,
):
    """``groupby(keys).count()`` with a stable output column name.

    Combiner-first shape: each batch pre-aggregates its (keys → count) partials
    vectorized (Arrow hash groupby, zero-copy), the shuffle moves one row per
    (batch, key) hashed into ``num_buckets`` groups, and each group merges
    partials with one more vectorized groupby — high-cardinality keys never
    form million-group shuffles (the pre-aggregate-before-groupby rule,
    SURVEY.md §4)."""
    from odibel_ray.cdc.lww import bucket_of_keys

    keys = list(keys)

    def partial(t: pa.Table) -> pa.Table:
        g = t.combine_chunks().select(keys).group_by(keys).aggregate(
            [([], "count_all")]
        )
        pt = g.rename_columns(keys + [out])
        b = bucket_of_keys(pt, keys, num_buckets)
        return pt.append_column("_b", pa.array(b, pa.int64()))

    def merge(t: pa.Table) -> pa.Table:
        g = (
            t.combine_chunks()
            .drop_columns(["_b"])
            .group_by(keys)
            .aggregate([(out, "sum")])
        )
        return g.rename_columns(keys + [out])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
    return partials.groupby("_b").map_groups(merge, batch_format="pyarrow")


def count_distinct(ds: "ray.data.Dataset", cols: Sequence[str], out: str = "n"):
    """Global distinct count of a column combination → 1-row Dataset
    (``countAllUniqueWindows`` analog, ``eval/EvalFunctions.scala:17-20``).

    Shuffle-safe: per-batch local dedup (combiner) → hash-shuffle dedup →
    count per group → tiny final sum.
    """
    from odibel_ray.ops.relational import exact_dedup

    cols = list(cols)
    deduped = exact_dedup(ds.select_columns(cols), cols)

    def count_rows(t: pa.Table) -> pa.Table:
        return pa.table({out: pa.array([len(t)], pa.int64())})

    partial = deduped.map_batches(count_rows, batch_format="pyarrow")
    return _sum_one(partial, out)


def _sum_one(ds, col: str):
    """Sum a single int64 column of a tiny Dataset into a 1-row Dataset."""
    import ray.data as rd

    total = ds.sum(col) or 0
    return rd.from_arrow(pa.table({col: pa.array([int(total)], pa.int64())}))


def two_level_degree(
    ds: "ray.data.Dataset",
    entity_col: str,
    bucket_col: str,
    *,
    degree_out: str = "degree",
    freq_out: str = "n_entities",
):
    """Degree-frequency distribution (A7, ``eval/EvalFunctions.scala:170-233``):
    level 1 — events per (bucket, entity) → ``degree``; level 2 — entities per
    (bucket, degree) → frequency. Two chained groupbys; the first is the wide
    one, the second runs over its (much smaller) output."""
    lvl1 = group_count(ds, [bucket_col, entity_col], out=degree_out)
    return group_count(lvl1, [bucket_col, degree_out], out=freq_out)


def group_stats(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    value_col: str,
    *,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
    round_to: int = 6,
):
    """Per-group avg/min/max/std + exact quantiles (A7/A8 ``percentile_approx``
    analog — exact numpy within ``map_groups``; at 100 TB swap the group kernel
    for a mergeable t-digest inside a custom ``AggregateFnV2``).

    Floats are rounded to ``round_to`` decimals so results hash-compare stably
    against an SQL oracle.
    """
    keys = list(keys)

    def stats(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        qs = np.quantile(v, quantiles) if len(v) else [np.nan] * len(quantiles)
        out = {k: t[k].slice(0, 1) for k in keys}
        out.update(
            {
                "n": pa.array([len(v)], pa.int64()),
                "avg": pa.array([round(float(v.mean()), round_to) if len(v) else None]),
                "min": pa.array([round(float(v.min()), round_to) if len(v) else None]),
                "max": pa.array([round(float(v.max()), round_to) if len(v) else None]),
            }
        )
        for q, val in zip(quantiles, qs):
            out[f"q{int(q * 100)}"] = pa.array(
                [round(float(val), round_to) if len(v) else None]
            )
        return pa.table(out)

    return ds.groupby(keys[0] if len(keys) == 1 else keys).map_groups(
        stats, batch_format="pyarrow"
    )


def approx_quantiles(
    ds: "ray.data.Dataset",
    col: str,
    qs: Sequence[float] = (0.25, 0.5, 0.75),
    *,
    nbins: int = 8192,
    batch_size: int = 65536,
) -> dict[float, float]:
    """Mergeable approximate quantiles (``percentile_approx`` analog, A7/A8)
    via a fixed-width binned histogram sketch: pass 1 = streaming min/max
    aggregate; pass 2 = one 8k-int histogram per block (vectorized
    ``np.bincount``), merged on the driver (metadata-scale: #blocks × 64 KiB).
    Error bound: (max − min) / nbins per quantile. Fully streaming — no
    per-group materialization, unlike the exact ``group_stats`` kernel."""
    import ray.data as rd  # noqa: F401

    lo = ds.min(col)
    hi = ds.max(col)
    if lo is None or hi is None or hi <= lo:
        return {q: float(lo if lo is not None else np.nan) for q in qs}
    width = (hi - lo) / nbins

    def hist(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        bins = np.minimum(((v - lo) / width).astype(np.int64), nbins - 1)
        h = np.bincount(bins, minlength=nbins).astype(np.int64)
        return pa.table({"h": pa.array([h])})

    parts = ds.map_batches(hist, batch_format="pyarrow", batch_size=batch_size).take_all()
    total = np.sum([np.asarray(p["h"]) for p in parts], axis=0)
    cum = np.cumsum(total)
    n = cum[-1]
    out = {}
    for q in qs:
        target = q * n
        idx = min(int(np.searchsorted(cum, target)), nbins - 1)
        prev = cum[idx - 1] if idx > 0 else 0
        in_bin = total[idx]
        frac = (target - prev) / in_bin if in_bin > 0 else 0.5
        out[q] = float(lo + (idx + min(max(frac, 0.0), 1.0)) * width)
    return out


def change_stream_counts(
    ds: "ray.data.Dataset",
    start_col: str,
    end_col: str,
    *,
    end_sentinel: int | None = None,
    out_bucket: str = "at",
    out_count: str = "net",
    batch_size: int = 65536,
    num_buckets: int = 64,
):
    """±1 change stream (A6, ``countChangesOverTime``,
    ``eval/EvalFunctions.scala:129-151``): project (+1 at start) ∪ (−1 at end,
    skipping open-window sentinels) → net count per position.

    The position key is high-cardinality (≈ one per event), so a direct
    ``groupby(position)`` would shuffle millions of groups; instead positions
    hash into ``num_buckets`` shuffle groups and each group aggregates
    vectorized (``np.unique`` + ``bincount``) — same result, 64-group shuffle."""

    def explode(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        s = t[start_col].to_numpy(zero_copy_only=False)
        e = t[end_col].to_numpy(zero_copy_only=False)
        if end_sentinel is not None:
            e = e[e != end_sentinel]
        pos = np.concatenate([s, e]).astype(np.int64)
        sign = np.concatenate(
            [np.ones(len(s), np.int64), -np.ones(len(e), np.int64)]
        )
        # local partial aggregation (combiner): collapse duplicate positions
        # local partial aggregation (combiner): collapse duplicate positions.
        # zero-net positions are kept — the oracle GROUP BY emits them too.
        uniq, inv = np.unique(pos, return_inverse=True)
        net = np.bincount(inv, weights=sign).astype(np.int64)
        return pa.table(
            {
                out_bucket: pa.array(uniq),
                "_net": pa.array(net),
                "_b": pa.array((uniq % num_buckets).astype(np.int64)),
            }
        )

    def agg(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        pos = t[out_bucket].to_numpy(zero_copy_only=False)
        sign = t["_net"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(pos, return_inverse=True)
        net = np.bincount(inv, weights=sign).astype(np.int64)
        return pa.table({out_bucket: pa.array(uniq), out_count: pa.array(net)})

    exploded = ds.map_batches(explode, batch_format="pyarrow", batch_size=batch_size)
    return exploded.groupby("_b").map_groups(agg, batch_format="pyarrow")
