"""Bloom-filtered shuffle joins — shuffle-volume reduction for selective
large-large joins (the runtime-filter / "bloom join" of Spark AQE, Snowflake,
and DuckDB's perfect-hash-table sideways information passing).

When one side of a :func:`odibel_ray.ops.relational.bucketed_join` is
SELECTIVE (a filtered fact slice, a sparse key set) but still too large to
broadcast, the probe side normally ships every row into the all-to-all
exchange only for most of them to find no partner. A Bloom filter of the
build side's keys is a few MiB regardless of data size, merges by bitwise
OR (a mergeable partial, like the HLL registers in
:mod:`odibel_ray.ops.sketches`), and broadcasts once — pre-filtering the
probe side BEFORE the shuffle cuts exchange volume by the join's
selectivity at the cost of one extra streaming pass.

False positives pass the filter but are dropped by the exact join that
follows, so the composition is correct for inner/semi joins by
construction; false negatives are impossible. NOT valid upstream of outer /
anti joins, where a dropped non-matching probe row would change the answer.

Build-side scale shape: per-batch partials (``num_bits/8`` bytes each) are
OR-combined once per block in a second streaming stage, so the driver's
final OR sees one row per BLOCK, not per batch; nothing key-sized is ever
collected. Bits per key govern the false-positive rate: with ``k`` hashes
and ``m`` bits over ``n`` keys, fp ≈ (1 − e^(−kn/m))^k — the default
2^23 bits / 4 hashes gives < 3% at 1 M keys; size ``num_bits`` ~10× the
expected build-side key cardinality (use
:func:`odibel_ray.ops.sketches.approx_count_distinct` to estimate it).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

__all__ = ["Bloom", "build_bloom", "bloom_semi_filter"]

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _key_hashes(t: pa.Table, cols: Sequence[str]) -> tuple[np.ndarray, np.ndarray]:
    """Null-safe, dtype-canonical 64-bit key hashes + validity mask.

    Build and probe sides MUST hash a key to the same value: integer keys
    cast to int64 and floats to float64 (an int32 probe then matches an
    int64 build side), and NULL slots are filled before hashing — one null
    in an int column otherwise converts the whole batch to float64/NaN and
    silently changes every OTHER row's hash (false negatives). Nulls are
    reported in the validity mask instead: a NULL key never matches under
    SQL inner/semi-join semantics, so callers drop those rows.
    """
    n = len(t)
    h = np.zeros(n, dtype=np.uint64)
    valid = np.ones(n, dtype=bool)
    for c in cols:
        arr = t[c]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        valid &= pc.is_valid(arr).to_numpy(zero_copy_only=False)
        ty = arr.type
        if pa.types.is_integer(ty) or pa.types.is_boolean(ty):
            arr = pc.fill_null(arr.cast(pa.int64()), 0)
        elif pa.types.is_floating(ty):
            arr = pc.fill_null(arr.cast(pa.float64()), 0.0)
        elif pa.types.is_string(ty) or pa.types.is_large_string(ty):
            arr = pc.fill_null(arr, "")
        elif pa.types.is_binary(ty) or pa.types.is_large_binary(ty):
            arr = pc.fill_null(arr, b"")
        else:  # temporal, decimal, ... — canonical string form per type
            arr = pc.fill_null(pc.cast(arr, pa.string()), "")
        h = h * _MIX + pd.util.hash_array(
            arr.to_numpy(zero_copy_only=False), categorize=False
        )
    return h, valid


class Bloom:
    """Packed Bloom filter: ``num_bits`` bits in a uint64 word array, ``k``
    double-hashed probes (Kirsch & Mitzenmacher 2006 — two 64-bit hashes
    simulate k independent ones)."""

    __slots__ = ("words", "num_bits", "k")

    def __init__(self, words: np.ndarray, k: int):
        self.words = words
        self.num_bits = len(words) * 64
        self.k = k

    def _indices(self, h: np.ndarray, i: int) -> np.ndarray:
        h1 = h
        h2 = (h * _MIX) | np.uint64(1)  # odd → cycles the full ring
        return (h1 + np.uint64(i) * h2) & np.uint64(self.num_bits - 1)

    def add(self, h: np.ndarray) -> None:
        for i in range(self.k):
            idx = self._indices(h, i)
            np.bitwise_or.at(
                self.words, (idx >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (idx & np.uint64(63)),
            )

    def contains(self, h: np.ndarray) -> np.ndarray:
        """Vectorized membership mask (no false negatives)."""
        member = np.ones(len(h), dtype=bool)
        for i in range(self.k):
            idx = self._indices(h, i)
            bit = (self.words[(idx >> np.uint64(6)).astype(np.int64)]
                   >> (idx & np.uint64(63))) & np.uint64(1)
            member &= bit.astype(bool)
        return member


def build_bloom(
    ds: "ray.data.Dataset",
    on: Sequence[str] | str,
    *,
    num_bits: int = 1 << 23,
    num_hashes: int = 4,
    batch_size: int = 65536,
) -> Bloom:
    """Distributed Bloom build over ``ds``'s ``on`` columns.

    Per-batch bit-array partials → per-BLOCK bitwise-OR combine (second
    streaming stage, no shuffle) → final OR of one row per block on the
    driver. ``num_bits`` must be a power of two (masked indexing).
    """
    if num_bits & (num_bits - 1):
        raise ValueError("num_bits must be a power of two")
    on = [on] if isinstance(on, str) else list(on)
    n_words = num_bits // 64

    def _partial(t: pa.Table) -> pa.Table:
        bloom = Bloom(np.zeros(n_words, dtype=np.uint64), num_hashes)
        h, valid = _key_hashes(t.combine_chunks(), on)
        bloom.add(h[valid])  # a NULL build key can never match — skip it
        return pa.table({
            "words": pa.FixedSizeListArray.from_arrays(
                pa.array(bloom.words, pa.uint64()), n_words
            )
        })

    def _combine(t: pa.Table) -> pa.Table:
        flat = t.combine_chunks()["words"].combine_chunks()
        w = np.bitwise_or.reduce(
            flat.flatten().to_numpy(zero_copy_only=False)
            .reshape(len(flat), n_words), axis=0,
        )
        return pa.table({
            "words": pa.FixedSizeListArray.from_arrays(
                pa.array(w, pa.uint64()), n_words
            )
        })

    per_block = (
        ds.select_columns(on)
        .map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)
        .map_batches(_combine, batch_format="pyarrow", batch_size=None)
    )
    merged = np.zeros(n_words, dtype=np.uint64)
    for batch in per_block.iter_batches(batch_format="pyarrow"):
        col = batch["words"]
        arr = (col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
        np.bitwise_or(
            merged,
            np.bitwise_or.reduce(
                arr.flatten().to_numpy(zero_copy_only=False)
                .reshape(len(arr), n_words), axis=0,
            ),
            out=merged,
        )
    return Bloom(merged, num_hashes)


def bloom_semi_filter(
    probe: "ray.data.Dataset",
    build: "ray.data.Dataset",
    on: Sequence[str] | str,
    *,
    num_bits: int = 1 << 23,
    num_hashes: int = 4,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Pre-filter ``probe`` to rows whose ``on`` keys MAY exist in ``build``
    (a superset of the true semi-join — false positives only), for use
    upstream of an inner/semi :func:`~odibel_ray.ops.relational.bucketed_join`.

    The filter is built distributedly from ``build``, ``ray.put`` once, and
    read per node inside the probe's streaming ``map_batches`` pass.
    """
    import ray

    on = [on] if isinstance(on, str) else list(on)
    bloom = build_bloom(build, on, num_bits=num_bits, num_hashes=num_hashes,
                        batch_size=batch_size)
    words_ref = ray.put(bloom.words)
    k = bloom.k

    def _filter(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        b = Bloom(ray.get(words_ref), k)
        h, valid = _key_hashes(t, on)
        # NULL-key probe rows never match an inner/semi join — dropping them
        # here keeps the superset-of-true-semi-join guarantee
        return t.filter(pa.array(b.contains(h) & valid))

    return probe.map_batches(_filter, batch_format="pyarrow",
                             batch_size=batch_size)
