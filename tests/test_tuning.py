"""Cluster-size-aware defaults (tuning.py): derivation, clamps, overrides."""

import pyarrow as pa
import pytest


def test_default_num_buckets_derivation(ray_session, monkeypatch):
    import ray

    from odibel_ray.tuning import cluster_cpus, default_num_buckets

    cpus = int(ray.cluster_resources()["CPU"])
    assert cluster_cpus() == cpus
    # derived: per_cpu × CPUs clamped to [lo, hi]
    assert default_num_buckets() == min(4096, max(8, 2 * cpus))
    # explicit always wins
    assert default_num_buckets(3) == 3
    # env override
    monkeypatch.setenv("ODIBEL_NUM_BUCKETS", "123")
    assert default_num_buckets() == 123
    assert default_num_buckets(7) == 7


def test_default_pool_size(ray_session, monkeypatch):
    from odibel_ray.tuning import default_pool_size

    import ray

    from odibel_ray.tuning import cluster_cpus

    assert default_pool_size(5) == 5
    cpus = int(ray.cluster_resources()["CPU"])
    assert cluster_cpus() == cpus
    monkeypatch.setenv("ODIBEL_EFFECTIVE_CORES", "8")
    # effective cores are capped by the cluster's CPU count, then halved
    assert default_pool_size() == max(1, min(8, cpus) // 2)
    monkeypatch.delenv("ODIBEL_EFFECTIVE_CORES")
    assert default_pool_size() >= 1


def test_bucket_of_keys_rejects_unresolved(ray_session):
    from odibel_ray.cdc.lww import bucket_of_keys

    t = pa.table({"k": [1, 2, 3]})
    with pytest.raises(TypeError, match="driver-side"):
        bucket_of_keys(t, ["k"], None)
    assert len(bucket_of_keys(t, ["k"], 4)) == 3
