"""Edit-distance similarity join (odibel_ray/er.py): kernel exactness,
FastSS blocking recall, and the distributed join end-to-end vs brute force."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

from odibel_ray.er import (
    _pairs_in_variant_bucket,
    _variant_rows,
    edit_distance_join,
    levenshtein_batch,
)


def _lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, dp[0] = dp[:], i
        for j in range(1, lb + 1):
            dp[j] = min(dp[j - 1] + 1, prev[j] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
    return dp[lb]


def _rand_strings(n, maxlen=9, seed=3):
    rng = np.random.default_rng(seed)
    return [
        "".join(rng.choice(list("abcd"), rng.integers(0, maxlen)))
        for _ in range(n)
    ]


def test_levenshtein_batch_matches_reference():
    a, b = _rand_strings(400, seed=1), _rand_strings(400, seed=2)
    got = levenshtein_batch(pa.array(a), pa.array(b))
    assert got.tolist() == [_lev(x, y) for x, y in zip(a, b)]


def test_levenshtein_batch_empty_and_null():
    got = levenshtein_batch(
        pa.array(["", "abc", None, "xy"]), pa.array(["abc", "", "q", None])
    )
    # nulls coalesce to "" (same rule as every text kernel in the engine)
    assert got.tolist() == [3, 3, 1, 2]
    assert levenshtein_batch(pa.array([], pa.string()), pa.array([], pa.string())).size == 0


@pytest.mark.parametrize("tau", [1, 2])
def test_fastss_blocking_recall_complete(tau):
    strs = list(dict.fromkeys(_rand_strings(150, seed=7)))
    t = pa.table(
        {"id": pa.array(range(len(strs)), pa.int64()), "s": pa.array(strs)}
    )
    v = _variant_rows(t, id_col="id", text_col="s", tau=tau, max_len=64)
    buckets: dict = {}
    for vh, eid in zip(v["vh"].to_pylist(), v["eid"].to_pylist()):
        buckets.setdefault(vh, set()).add(eid)
    cands = {
        p
        for ids in buckets.values()
        for p in itertools.combinations(sorted(ids), 2)
    }
    truth = {
        (i, j)
        for i, j in itertools.combinations(range(len(strs)), 2)
        if _lev(strs[i], strs[j]) <= tau
    }
    assert truth <= cands  # recall-complete: no true pair missed by blocking


def test_variant_rows_rejects_long_strings():
    t = pa.table({"id": pa.array([1], pa.int64()), "s": pa.array(["x" * 99])})
    with pytest.raises(ValueError, match="max_len"):
        _variant_rows(t, id_col="id", text_col="s", tau=1, max_len=64)


def test_pairs_bucket_cap_marks_rows():
    t = pa.table({"eid": pa.array(list(range(10)), pa.int64())})
    out = _pairs_in_variant_bucket(t, max_bucket=4)
    assert out.num_rows == 9  # star pairs
    assert all(out["capped"].to_pylist())
    full = _pairs_in_variant_bucket(t, max_bucket=None)
    assert full.num_rows == 45 and "capped" not in full.column_names


@pytest.mark.parametrize("tau", [1, 2])
def test_edit_distance_join_end_to_end(ray_session, tau):
    import ray.data as rd

    strs = list(dict.fromkeys(_rand_strings(200, seed=11)))
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(strs)), pa.int64()), "text": pa.array(strs)}
        )
    )
    got = {
        (r["a_id"], r["b_id"]): r["dist"]
        for r in edit_distance_join(
            ds, tau=tau, num_partitions=4, batch_size=64
        ).take_all()
    }
    truth = {
        (i, j): _lev(strs[i], strs[j])
        for i, j in itertools.combinations(range(len(strs)), 2)
        if _lev(strs[i], strs[j]) <= tau
    }
    assert got == truth
