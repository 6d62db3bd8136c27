"""Mergeable sketches: HLL distinct count + heavy hitters."""

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_hll_accuracy_vs_exact(ray_session):
    from odibel_ray.ops import load_table
    from odibel_ray.ops.aggregates import count_distinct
    from odibel_ray.ops.sketches import approx_count_distinct

    ev = load_table(SF, "events", ["user_id"])
    exact = count_distinct(ev, ["user_id"]).take_all()[0]["n"]
    est = approx_count_distinct(ev, ["user_id"], precision=12)
    assert abs(est - exact) / exact < 0.05, (est, exact)
    # composite key
    ev2 = load_table(SF, "events", ["user_id", "event_type"])
    exact2 = count_distinct(ev2, ["user_id", "event_type"]).take_all()[0]["n"]
    est2 = approx_count_distinct(ev2, ["user_id", "event_type"])
    assert abs(est2 - exact2) / exact2 < 0.05, (est2, exact2)


def test_hll_merge_partition_invariant(ray_session):
    """Same estimate whatever the batch boundaries (register max is
    commutative/associative)."""
    import ray.data as rd

    from odibel_ray.ops.sketches import approx_count_distinct

    vals = pa.table({"v": pa.array(np.arange(5000, dtype=np.int64) % 1700)})
    a = approx_count_distinct(rd.from_arrow(vals), ["v"], batch_size=100)
    b = approx_count_distinct(rd.from_arrow(vals), ["v"], batch_size=4096)
    assert a == b


def test_suggest_salt_detects_zipf_hot_keys(ray_session, small_log):
    """The skew advisor must flag the generator's Zipf-hot conversations and
    the suggested salt must leave the converged state unchanged."""
    from odibel_ray.cdc.apply import replay_dataset, suggest_salt

    log = small_log["log_dir"]
    # the advice is relative to the apply's bucket width (derived from the
    # cluster by default — only 8 at the 4-CPU test session, where the hot
    # key genuinely fits a mean bucket); pin the width the assertion assumes
    s = suggest_salt(log, num_buckets=64)
    assert s["salt"] >= 1 and len(s["hot_keys"]) > 0
    plain = replay_dataset(log).count()
    salted = replay_dataset(log, num_buckets=8, salt=max(s["salt"], 2)).count()
    assert plain == salted


def test_heavy_hitters_finds_hot_keys(ray_session):
    import ray.data as rd

    from odibel_ray.ops.sketches import approx_heavy_hitters

    rng = np.random.default_rng(9)
    # two hot keys on a long uniform tail
    tail = rng.integers(1000, 9000, size=20000)
    vals = np.concatenate([np.full(5000, 1), np.full(3000, 2), tail])
    rng.shuffle(vals)
    t = pa.table({"k": pa.array(vals, pa.int64())})
    top = approx_heavy_hitters(rd.from_arrow(t), "k", k=2, batch_size=2048).take_all()
    got = {r["value"]: r["n"] for r in top}
    assert set(got) == {1, 2}
    # counts are lower bounds but hot keys survive every batch: exact here
    assert got[1] == 5000 and got[2] == 3000


def test_approx_distinct_per_group(ray_session):
    """Grouped HLL: per-key NDV within the p=10 error bound, partition
    invariant."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from odibel_ray.ops.sketches import approx_distinct_per_group

    rng = np.random.default_rng(21)
    n = 60_000
    keys = rng.integers(0, 8, n).astype(np.int64)
    # per key g: values drawn from a pool of (g+1)*500 distinct ints
    vals = np.array([rng.integers(0, (g + 1) * 500) for g in keys], np.int64)
    t = pa.table({"g": keys, "v": vals})
    got = (
        approx_distinct_per_group(
            ray.data.from_arrow(t).repartition(6), ["g"], ["v"]
        )
        .to_pandas().set_index("g")["approx_ndv"]
    )
    import pandas as pd
    exact = pd.DataFrame({"g": keys, "v": vals}).groupby("g").v.nunique()
    assert set(got.index) == set(exact.index)
    for g in exact.index:
        rel = abs(got[g] - exact[g]) / exact[g]
        assert rel < 0.12, (g, got[g], exact[g], rel)


def test_grouped_heavy_hitters_exact_within_budget(ray_session):
    """Per-key top-k equals an exact Counter when the per-batch candidate
    budget covers the value cardinality; deterministic tie order."""
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from odibel_ray.ops.sketches import approx_heavy_hitters_per_group

    rng = np.random.default_rng(3)
    u = rng.integers(0, 5, 4000)
    v = rng.zipf(1.6, 4000) % 20
    t = pa.table(
        {"u": pa.array(u.astype(np.int64)),
         "v": pa.array([f"x{int(i)}" for i in v])}
    )
    rows = approx_heavy_hitters_per_group(
        rd.from_arrow(t), ["u"], "v", k=3
    ).take_all()
    cnt = collections.Counter(zip(u.tolist(), (f"x{int(i)}" for i in v)))
    exp: dict = {}
    for (uu, vv), n in cnt.items():
        exp.setdefault(uu, []).append((-n, vv))
    for uu in exp:
        want = [(vv, -negn) for negn, vv in sorted(exp[uu])[:3]]
        got = [(r["v"], r["n"])
               for r in sorted((r for r in rows if r["u"] == uu),
                               key=lambda r: (-r["n"], r["v"]))]
        assert got == want, uu
