"""Bloom-filtered shuffle join (odibel_ray/ops/bloom.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from odibel_ray.ops.bloom import Bloom, bloom_semi_filter, build_bloom
from odibel_ray.ops.relational import bucketed_join


def test_bloom_no_false_negatives_and_low_fp(ray_session):
    rng = np.random.default_rng(7)
    keys = rng.choice(10_000_000, size=20_000, replace=False).astype(np.int64)
    build = ray.data.from_arrow(pa.table({"k": keys})).repartition(4)
    bloom = build_bloom(build, "k", num_bits=1 << 20)

    import pandas as pd
    member_h = pd.util.hash_array(keys, categorize=False).astype(np.uint64)
    assert bloom.contains(member_h).all()  # zero false negatives

    other = np.setdiff1d(
        rng.choice(10_000_000, size=50_000, replace=False).astype(np.int64), keys
    )
    other_h = pd.util.hash_array(other, categorize=False).astype(np.uint64)
    fp = bloom.contains(other_h).mean()
    assert fp < 0.02, fp  # 2^20 bits / 20k keys ≈ 50 bits/key → fp ≪ 1%


def test_bloom_prefilter_preserves_inner_join(ray_session):
    rng = np.random.default_rng(3)
    probe_keys = rng.integers(0, 1000, size=5000).astype(np.int64)
    probe = ray.data.from_arrow(
        pa.table({"k": probe_keys, "v": np.arange(5000, dtype=np.int64)})
    ).repartition(4)
    build_keys = np.arange(0, 1000, 7, dtype=np.int64)  # ~1/7 selective
    build = ray.data.from_arrow(
        pa.table({"k": build_keys, "w": build_keys * 10})
    )

    filtered = bloom_semi_filter(probe, build, "k", num_bits=1 << 16)
    # the filter prunes: strictly fewer rows survive than went in
    n_filtered = filtered.count()
    assert n_filtered < 5000

    joined = bucketed_join(
        filtered, build, on="k", num_buckets=4,
        left_schema=pa.schema([("k", pa.int64()), ("v", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()), ("w", pa.int64())]),
    ).to_pandas().sort_values(["k", "v"], ignore_index=True)
    plain = bucketed_join(
        ray.data.from_arrow(
            pa.table({"k": probe_keys, "v": np.arange(5000, dtype=np.int64)})
        ),
        ray.data.from_arrow(pa.table({"k": build_keys, "w": build_keys * 10})),
        on="k", num_buckets=4,
        left_schema=pa.schema([("k", pa.int64()), ("v", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()), ("w", pa.int64())]),
    ).to_pandas().sort_values(["k", "v"], ignore_index=True)
    assert joined.equals(plain)


def test_bloom_multi_column_keys(ray_session):
    t = pa.table({"a": [1, 1, 2, 2], "b": ["x", "y", "x", "y"],
                  "v": [10, 20, 30, 40]})
    build = ray.data.from_arrow(pa.table({"a": [1, 2], "b": ["x", "x"]}))
    out = bloom_semi_filter(
        ray.data.from_arrow(t), build, ["a", "b"], num_bits=1 << 12
    ).to_pandas().sort_values("v", ignore_index=True)
    # (1,x) and (2,x) must survive; (1,y)/(2,y) may only survive as rare FPs
    assert set([10, 30]).issubset(set(out.v))


def test_bloom_num_bits_power_of_two(ray_session):
    with pytest.raises(ValueError, match="power of two"):
        build_bloom(ray.data.from_arrow(pa.table({"k": [1]})), "k", num_bits=1000)


def test_bloom_filter_null_keys_dont_poison_batch(ray_session):
    # one NULL key used to convert the whole int batch to float64/NaN hashes
    # and drop EVERY row; now nulls drop (SQL inner-join semantics) and the
    # non-null matches survive
    probe = ray.data.from_arrow(
        pa.table({"k": pa.array([5, None, 7, 99], pa.int64())})
    )
    build = ray.data.from_arrow(pa.table({"k": pa.array([5, 7], pa.int64())}))
    kept = sorted(
        r["k"] for r in bloom_semi_filter(probe, build, "k",
                                          num_bits=1 << 12).take_all()
    )
    assert kept[:2] == [5, 7]  # true matches kept; 99 may FP but never FN
    assert None not in kept


def test_bloom_filter_cross_width_int_keys(ray_session):
    # int32 probe vs int64 build must hash identically (canonical cast)
    probe = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int32())})
    )
    build = ray.data.from_arrow(pa.table({"k": pa.array([2, 3], pa.int64())}))
    kept = sorted(
        r["k"] for r in bloom_semi_filter(probe, build, "k",
                                          num_bits=1 << 12).take_all()
    )
    assert set([2, 3]).issubset(kept)
