"""Mergeable sketches for 100-TB-scale profiling (SURVEY.md §2.5 note —
the reference's only sketch is ``percentile_approx``; these add the two
aggregates a corpus-scale pipeline needs constantly):

- :func:`approx_count_distinct` — HyperLogLog. Exact distinct
  (:func:`odibel_ray.ops.aggregates.count_distinct`) hash-shuffles every
  distinct value; HLL ships one 2^p-byte register array per batch and merges
  by element-wise max — no shuffle at all, ~1.04/√m relative error.
- :func:`approx_heavy_hitters` — combiner top-k frequency sketch (per-batch
  truncated counts → small groupby-sum → top-k). The hot-key detector behind
  salted two-stage apply: a key's true global count is underestimated by at
  most the truncation mass of the batches that dropped it, and every key
  whose per-batch share is above ``1/candidates_per_batch`` survives.

Both kernels are vectorized (one ``pd.util.hash_array`` / Arrow
``value_counts`` per batch); only fixed-size partials reach the driver.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _row_hashes(t: pa.Table, cols: Sequence[str]) -> np.ndarray:
    h = np.zeros(len(t), dtype=np.uint64)
    for c in cols:
        arr = t[c].to_numpy(zero_copy_only=False)
        h = h * _MIX + pd.util.hash_array(arr, categorize=False)
    return h


def _hll_ranks(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per 64-bit hash, fully vectorized.

    rank = leading-zero count within the low 64-p bits, + 1. MSB position is
    computed with exact integer shifts (6 vectorized passes) — float64 log2
    rounds UP for w just below 2^k when k >= 50, biasing the rank low.
    """
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    bits = np.zeros(len(h), dtype=np.int64)
    nz = w > 0
    v = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= np.uint64(1 << shift)
        bits[m] += shift
        v[m] >>= np.uint64(shift)
    rank = np.where(nz, (64 - p) - bits, (64 - p) + 1).astype(np.uint8)
    return idx, rank


def _hll_registers(h: np.ndarray, p: int) -> np.ndarray:
    """2^p max-rank registers from 64-bit hashes, fully vectorized."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(h) == 0:
        return regs
    idx, rank = _hll_ranks(h, p)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:  # small-range linear-counting correction
        est = m * np.log(m / zeros)
    return float(est)


def approx_count_distinct(
    ds: "ray.data.Dataset",
    cols: Sequence[str],
    *,
    precision: int = 12,
    batch_size: int = 65536,
) -> int:
    """HyperLogLog distinct count: per-batch register partials (2^precision
    bytes each), merged by element-wise max on the driver — shuffle-free."""
    cols = list(cols)
    m = 1 << precision

    def partial(t: pa.Table) -> pa.Table:
        regs = _hll_registers(_row_hashes(t.combine_chunks(), cols), precision)
        return pa.table(
            {"regs": pa.FixedSizeListArray.from_arrays(pa.array(regs, pa.uint8()), m)}
        )

    merged = np.zeros(m, dtype=np.uint8)
    partials = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    )
    for batch in partials.iter_batches(batch_format="pyarrow"):
        for row in batch["regs"].to_pylist():
            merged = np.maximum(merged, np.asarray(row, dtype=np.uint8))
    return round(_hll_estimate(merged))


def approx_distinct_per_group(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    cols: Sequence[str],
    *,
    precision: int = 10,
    out: str = "approx_ndv",
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Per-``keys`` approximate distinct count of ``cols`` tuples — the
    grouped HyperLogLog (~1.04/√2^precision relative error, ±3.3% at the
    default p=10). The exact per-key distinct
    (:func:`odibel_ray.ops.aggregates.count_distinct`-style) must shuffle
    every distinct VALUE; this ships one 2^p-byte register row per
    (batch, key) and merges by element-wise max — the per-key NDV profile a
    100-TB ANALYZE needs without a value exchange.

    Per-batch kernel is fully vectorized: one hash pass, one composite
    ``np.maximum.at`` scatter over (key_index × register) cells. Returns
    ``(keys..., out)``.
    """
    keys = list(keys)
    cols = list(cols)
    m = 1 << precision

    def _partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        n = len(t)
        if n == 0:
            tbl = t.select(keys)
            return tbl.append_column(
                "regs", pa.FixedSizeListArray.from_arrays(
                    pa.array([], pa.uint8()), m)
            )
        kh = _row_hashes(t, keys)
        uniq, kidx = np.unique(kh, return_inverse=True)
        first = np.full(len(uniq), n, np.int64)  # first row index per key
        np.minimum.at(first, kidx, np.arange(n, dtype=np.int64))
        idx, rank = _hll_ranks(_row_hashes(t, cols), precision)
        regs = np.zeros((len(uniq), m), dtype=np.uint8)
        np.maximum.at(regs, (kidx, idx), rank)
        tbl = t.select(keys).take(pa.array(first))
        return tbl.append_column(
            "regs", pa.FixedSizeListArray.from_arrays(
                pa.array(regs.ravel(), pa.uint8()), m)
        )

    def _merge(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        col = g["regs"]
        flat = (col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                else col)
        arr = (flat.flatten().to_numpy(zero_copy_only=False)
               .reshape(len(flat), m))
        merged = np.maximum.reduce(arr, axis=0)
        res = g.select(keys).slice(0, 1)
        return res.append_column(
            out, pa.array([round(_hll_estimate(merged))], pa.int64())
        )

    partial = ds.select_columns(keys + cols).map_batches(
        _partial, batch_format="pyarrow", batch_size=batch_size
    )
    return partial.groupby(keys).map_groups(_merge, batch_format="pyarrow")


def approx_heavy_hitters(
    ds: "ray.data.Dataset",
    col: str,
    k: int = 10,
    *,
    candidates_per_batch: int = 256,
    batch_size: int = 65536,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Approximate top-k most frequent values of ``col``: per-batch truncated
    value counts (combiner) → key-bucketed sum → global top-k by count.
    Returns ``(value, n)`` with ``n`` a lower bound on the true count."""
    from odibel_ray.cdc.lww import bucket_of_keys
    from odibel_ray.ops.relational import topk

    def partial(t: pa.Table) -> pa.Table:
        vc = t.combine_chunks()[col].value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        out = pa.table(
            {"value": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
        )
        if len(out) > candidates_per_batch:
            idx = pc.select_k_unstable(out, candidates_per_batch, sort_keys=[("n", "descending")])
            out = out.take(idx)
        b = bucket_of_keys(out, ["value"], num_buckets)
        return out.append_column("_b", pa.array(b, pa.int64()))

    partials = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    )
    summed = (
        partials.groupby("_b")
        .map_groups(
            lambda t: t.combine_chunks()
            .drop_columns(["_b"])
            .group_by(["value"])
            .aggregate([("n", "sum")])
            .rename_columns(["value", "n"]),
            batch_format="pyarrow",
        )
    )
    return topk(summed, "n", k)


def approx_heavy_hitters_per_group(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    col: str,
    k: int = 5,
    *,
    candidates_per_key: int = 64,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Per-KEY approximate top-k most frequent ``col`` values — the grouped
    grain of :func:`approx_heavy_hitters` (per-user top tools, per-domain
    top templates). Per-batch (key, value) counts truncated to the top
    ``candidates_per_key`` per key (combiner), ONE key-hash groupby fold,
    then a per-key top-k with deterministic ties (count desc, value asc).
    Returns ``(*keys, value, n)``; ``n`` is a lower bound that is EXACT
    whenever a key's distinct values per batch fit the candidate budget —
    size the budget to the expected value cardinality for exact counts."""
    keys = list(keys)

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        g = (
            t.select(keys + [col])
            .group_by(keys + [col])
            .aggregate([([], "count_all")])
            .rename_columns(keys + [col, "n"])
        ).combine_chunks()
        if len(g) > 0:
            import numpy as _np

            from odibel_ray.cdc.lww import bucket_of_keys

            kb = bucket_of_keys(g, keys, 1 << 62)
            n = g["n"].to_numpy(zero_copy_only=False)
            order = _np.lexsort((-n, kb))
            kb_s = kb[order]
            new = _np.ones(len(kb_s), bool)
            new[1:] = kb_s[1:] != kb_s[:-1]
            pos = _np.arange(len(kb_s))
            seg_start = _np.maximum.accumulate(_np.where(new, pos, 0))
            keep = (pos - seg_start) < candidates_per_key
            g = g.take(pa.array(order[keep]))
        return g

    from odibel_ray.ops.relational import topk_per_group

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    )
    folded = (
        partials.groupby(keys)
        .map_groups(
            lambda t: t.combine_chunks()
            .group_by(keys + [col])
            .aggregate([("n", "sum")])
            .rename_columns(keys + [col, "n"]),
            batch_format="pyarrow",
        )
    )
    return topk_per_group(folded, keys, "n", k, tie_break=[col])
