"""Property-based conformance of the distributed bucketed join: on arbitrary
key/value tables (duplicate keys, nulls on the value side, disjoint and
overlapping key ranges) the result must be row-identical to the single-table
``pyarrow.Table.join`` reference for both inner and left joins."""

import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

keys_st = st.lists(st.integers(min_value=0, max_value=12), min_size=0, max_size=25)


def _canon(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas().reindex(sorted(t.column_names), axis=1)
    return df.sort_values(sorted(t.column_names), ignore_index=True)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lk=keys_st, rk=keys_st, how=st.sampled_from(["inner", "left"]))
def test_bucketed_join_matches_arrow_reference(ray_session, lk, rk, how):
    import ray.data as rd

    from odibel_ray.ops.relational import bucketed_join

    left = pa.table(
        {"k": pa.array(lk, pa.int64()), "lv": pa.array(range(len(lk)), pa.int64())}
    )
    right = pa.table(
        {
            "k": pa.array(rk, pa.int64()),
            "rv": pa.array([i if i % 3 else None for i in range(len(rk))], pa.int64()),
        }
    )
    expect = left.join(
        right, keys=["k"], join_type={"inner": "inner", "left": "left outer"}[how]
    )
    got = bucketed_join(
        rd.from_arrow(left),
        rd.from_arrow(right),
        "k",
        how=how,
        num_buckets=4,
        left_schema=left.schema,
        right_schema=right.schema,
    ).to_pandas()
    if len(expect) == 0:
        # an empty Ray Dataset carries no blocks (and so no schema) — only
        # emptiness is comparable
        assert len(got) == 0
        return
    pd.testing.assert_frame_equal(
        _canon(expect), _canon(pa.Table.from_pandas(got)), check_dtype=False
    )
