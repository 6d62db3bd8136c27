"""CHECK-constraint expectations on generic published tables
(cdc/quality.py): install with the table or later, SQL CHECK null
semantics, whole-write failure on violation (never a partial apply)."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from odibel_ray.cdc import (
    drop_expectations,
    get_expectations,
    set_expectations,
)
from odibel_ray.cdc.sink import publish_dataset, read_published, upsert_published


def _pub(tmp_path, **kw):
    out = str(tmp_path / "t")
    t = pa.table({
        "k": ["a", "b", "c"],
        "score": [0.2, 0.9, None],
        "role": ["user", "tool", "user"],
    })
    publish_dataset(rd.from_arrow(t), out, key_cols=["k"], num_buckets=2,
                    run_id="p1", **kw)
    return out


def test_set_enforce_and_null_passes(ray_session, tmp_path):
    out = _pub(tmp_path)
    # NULL score passes (SQL CHECK semantics), so this installs cleanly
    set_expectations(out, [["score", ">=", 0.0], ["role", "in", ["user", "tool"]]])
    assert len(get_expectations(out)) == 2
    # good rows (and a NULL) pass
    upsert_published(
        rd.from_arrow(pa.table({"k": ["d"], "score": [0.5], "role": ["user"]})),
        out, run_id="u1",
    )
    upsert_published(
        rd.from_arrow(pa.table({"k": ["e"], "score": pa.array([None], pa.float64()),
                                "role": ["tool"]})),
        out, run_id="u2",
    )
    before = read_published(out).to_pandas().sort_values("k").reset_index(drop=True)
    # a violating batch fails WHOLE — even the valid row in it is not applied
    with pytest.raises(ValueError, match="violates the table expectation"):
        upsert_published(
            rd.from_arrow(pa.table({"k": ["f", "g"], "score": [0.1, -1.0],
                                    "role": ["user", "user"]})),
            out, run_id="u3",
        )
    after = read_published(out).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(after, before)
    drop_expectations(out)
    upsert_published(  # gate removed
        rd.from_arrow(pa.table({"k": ["g"], "score": [-1.0], "role": ["user"]})),
        out, run_id="u4",
    )


def test_dirty_table_refuses_constraint(ray_session, tmp_path):
    out = _pub(tmp_path)
    with pytest.raises(ValueError, match="already violates"):
        set_expectations(out, [["score", ">=", 0.5]])  # row a has 0.2
    assert get_expectations(out) == []


def test_publish_with_expect_validates_load(ray_session, tmp_path):
    out = str(tmp_path / "t")
    good = pa.table({"k": ["a"], "score": [0.5]})
    publish_dataset(rd.from_arrow(good), out, key_cols=["k"], num_buckets=1,
                    run_id="p1", expect=[["score", ">=", 0.0]])
    assert get_expectations(out) == [["score", ">=", 0.0]]
    out2 = str(tmp_path / "t2")
    bad = pa.table({"k": ["a", "b"], "score": [0.5, -3.0]})
    with pytest.raises(Exception, match="violate"):
        publish_dataset(rd.from_arrow(bad), out2, key_cols=["k"], num_buckets=1,
                        run_id="p1", expect=[["score", ">=", 0.0]])


def test_expectations_with_ddl_rename(ray_session, tmp_path):
    """Clauses reference LOGICAL names: after a rename, a constraint on the
    new name installs and enforces against mapped reads and upserts."""
    from odibel_ray.cdc import alter_published

    out = _pub(tmp_path)
    alter_published(out, rename={"score": "quality"})
    set_expectations(out, [["quality", ">=", 0.0]])
    with pytest.raises(ValueError, match="violates"):
        upsert_published(
            rd.from_arrow(pa.table({"k": ["z"], "quality": [-0.5], "role": ["user"]})),
            out, run_id="u1",
        )


def test_compression_ratio_orders_repetitive_below_random(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    import zlib

    from odibel_ray.text import add_compression_ratio

    rng = np.random.default_rng(31)
    rand = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 2000))
    rep = "spam and eggs " * 150
    docs = pa.table(
        {"doc_id": pa.array([1, 2, 3], pa.int64()),
         "text": pa.array([rand, rep, ""])}
    )
    rows = {r["doc_id"]: r["compression_ratio"]
            for r in add_compression_ratio(rd.from_arrow(docs)).take_all()}
    assert rows[2] < 0.1 < rows[1] <= 1.1
    assert rows[3] == 1.0
    b = rand.encode()
    assert abs(rows[1] - len(zlib.compress(b, 6)) / len(b)) < 1e-9
