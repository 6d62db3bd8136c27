"""Metadata-only schema DDL on generic published tables (cdc/ddl.py):
add / rename / drop without touching a data file, read-time mapping with
zone-map pruning intact, logical↔physical translation on upsert."""

import pandas as pd
import pyarrow as pa
import pytest

from odibel_ray.cdc import alter_published
from odibel_ray.cdc.ddl import SchemaMap, load_schema_ops
from odibel_ray.cdc.sink import (
    lookup_key,
    publish_dataset,
    read_published,
    upsert_published,
)


def _table():
    return pa.table(
        {
            "k": ["a", "b", "c", "d"],
            "v": [1.0, 2.0, 3.0, 4.0],
            "label": ["x", "y", "x", "z"],
        }
    )


@pytest.fixture()
def gen(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "t")
    publish_dataset(rd.from_arrow(_table()), out, key_cols=["k"], num_buckets=2, run_id="p1")
    return out


def _df(ds) -> pd.DataFrame:
    return ds.to_pandas().sort_values("k").reset_index(drop=True)


def test_rename_add_drop_read(ray_session, gen):
    r = alter_published(gen, rename={"v": "value"}, add={"note": "string"}, drop=["label"])
    assert r["logical_columns"] == ["k", "value", "note"]
    df = _df(read_published(gen))
    assert list(df.columns) == ["k", "value", "note"]
    assert df["value"].tolist() == [1.0, 2.0, 3.0, 4.0]
    assert df["note"].isna().all()
    # projections + errors on old names
    assert read_published(gen, columns=["value"]).schema().names == ["value"]
    with pytest.raises(KeyError, match="no such column"):
        read_published(gen, columns=["v"]).count()
    with pytest.raises(KeyError, match="no such column"):
        read_published(gen, columns=["label"]).count()
    # no data file changed: the op log is the only new artifact
    assert len(load_schema_ops(gen)) == 3


def test_where_pushdown_through_rename(ray_session, gen):
    alter_published(gen, rename={"v": "value"})
    stats = {}
    got = _df(read_published(gen, where=[("value", ">=", 3.0)], prune_stats=stats))
    assert got["k"].tolist() == ["c", "d"] and stats["files_total"] == 2
    # predicate on an unmaterialized added column: is_null is vacuous,
    # value ops are provably empty (with the right logical schema)
    alter_published(gen, add={"note": "string"})
    assert _df(read_published(gen, where=[("note", "is_null", None)]))["k"].tolist() == list("abcd")
    empty = read_published(gen, where=[("note", "==", "x")], prune_stats=stats)
    assert empty.count() == 0 and stats["files_read"] == 0
    assert empty.schema().names == ["k", "value", "label", "note"]


def test_upsert_translates_logical_names(ray_session, gen):
    alter_published(gen, rename={"v": "value"}, drop=["label"], add={"note": "string"})
    import ray.data as rd

    up = rd.from_arrow(
        pa.table({"k": ["b", "e"], "value": [20.0, 50.0],
                  "note": pa.array([None, None], pa.string())})
    )
    upsert_published(up, gen, run_id="u1")
    df = _df(read_published(gen))
    assert df["k"].tolist() == list("abcde")
    assert df["value"].tolist() == [1.0, 20.0, 3.0, 4.0, 50.0]
    # physical files still carry the ORIGINAL names (metadata-only rename)
    import pyarrow.parquet as pq
    from odibel_ray.cdc.sink import load_manifests
    import os

    m = next(iter(load_manifests(gen).values()))
    assert pq.read_schema(os.path.join(gen, m["file"])).names == ["k", "v", "label"]
    # non-null values for an unmaterialized column must fail loudly
    bad = rd.from_arrow(pa.table({"k": ["z"], "value": [9.0], "note": ["boom"]}))
    with pytest.raises(Exception, match="metadata-only"):
        upsert_published(bad, gen, run_id="u2")


def test_lookup_key_applies_mapping(ray_session, gen):
    alter_published(gen, rename={"v": "value"}, add={"note": "int64"})
    t = lookup_key(gen, "c", system=True)
    assert t.column_names == ["k", "value", "label", "note"]
    assert t["value"].to_pylist() == [3.0] and t["note"].to_pylist() == [None]
    t2 = lookup_key(gen, "c", columns=["value"], system=True)
    assert t2.column_names == ["value"]


def test_alter_validation(ray_session, gen):
    with pytest.raises(ValueError, match="key column"):
        alter_published(gen, rename={"k": "kk"})
    with pytest.raises(ValueError, match="key column"):
        alter_published(gen, drop=["k"])
    with pytest.raises(KeyError, match="no such column"):
        alter_published(gen, rename={"zzz": "y"})
    with pytest.raises(ValueError, match="already exists"):
        alter_published(gen, add={"v": "int64"})
    with pytest.raises(ValueError, match="nothing to alter"):
        alter_published(gen)
    # a failed alter leaves the op log unchanged
    assert load_schema_ops(gen) == []


def test_schema_map_fold_order():
    phys = pa.schema([("a", pa.int64()), ("b", pa.string())])
    m = SchemaMap(phys, [
        {"kind": "rename", "from": "a", "to": "x"},
        {"kind": "add", "name": "a", "type": "double"},  # old name reusable
        {"kind": "drop", "name": "b"},
    ])
    assert m.names == ["x", "a"]
    assert m.to_physical == {"x": "a"} and set(m.added) == {"a"}


def test_widen_read_upsert_lookup(ray_session, tmp_path):
    """Type widening: files keep the narrow type, reads cast batch-side,
    pushdown still prunes against the narrow column, upserts safe-cast back
    and overflow fails loudly."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from odibel_ray.cdc.sink import load_manifests

    out = str(tmp_path / "w")
    t = pa.table({
        "k": ["a", "b", "c", "d"],
        "n": pa.array([1, 2, 3, 4], pa.int32()),
        "f": pa.array([1.5, 2.5, 3.5, 4.5], pa.float32()),
    })
    publish_dataset(rd.from_arrow(t), out, key_cols=["k"], num_buckets=2, run_id="p1")
    alter_published(out, widen={"n": "int64", "f": "double"})
    ds = read_published(out)
    assert dict(zip(ds.schema().names, ds.schema().types))["n"] == pa.int64()
    df = _df(ds)
    assert df["n"].tolist() == [1, 2, 3, 4] and df["f"].tolist() == [1.5, 2.5, 3.5, 4.5]
    # pushdown with a value outside the physical int32 domain still correct
    stats = {}
    assert read_published(out, where=[("n", "<", 3_000_000_000)], prune_stats=stats).count() == 4
    assert read_published(out, where=[("n", "==", 3_000_000_000)]).count() == 0
    # upsert in the wide logical domain: fitting values cast down...
    upsert_published(
        rd.from_arrow(pa.table({
            "k": ["b"], "n": pa.array([20], pa.int64()),
            "f": pa.array([9.5], pa.float64()),
        })),
        out, run_id="u1",
    )
    m = load_manifests(out)
    fields = {}
    for mm in m.values():  # every file still narrow-typed
        sch = pq.read_schema(os.path.join(out, mm["file"]))
        fields.update({n: sch.field(n).type for n in sch.names})
    assert fields["n"] == pa.int32() and fields["f"] == pa.float32()
    assert lookup_key(out, "b", system=True)["n"].to_pylist() == [20]
    # ...overflowing values fail loudly
    with pytest.raises(Exception, match="widened"):
        upsert_published(
            rd.from_arrow(pa.table({
                "k": ["z"], "n": pa.array([3_000_000_000], pa.int64()),
                "f": pa.array([1.0], pa.float64()),
            })),
            out, run_id="u2",
        )


def test_widen_validation(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "wv")
    t = pa.table({"k": ["a"], "n": pa.array([1], pa.int64()),
                  "m": pa.array([1], pa.int32()), "s": ["x"]})
    publish_dataset(rd.from_arrow(t), out, key_cols=["k"], num_buckets=1, run_id="p1")
    with pytest.raises(ValueError, match="not a value-preserving"):
        alter_published(out, widen={"n": "int32"})  # narrowing
    with pytest.raises(ValueError, match="not a value-preserving"):
        alter_published(out, widen={"n": "double"})  # int64 → double loses precision
    with pytest.raises(ValueError, match="not a value-preserving"):
        alter_published(out, widen={"s": "int64"})  # string is not numeric
    with pytest.raises(ValueError, match="key column"):
        alter_published(out, widen={"k": "large_string"})
    assert load_schema_ops(out) == []  # failed alters leave the log unchanged
    # widen composes with rename (applies to the CURRENT logical name)
    alter_published(out, rename={"m": "num"})
    alter_published(out, widen={"num": "int64"})
    df = read_published(out).to_pandas()
    assert df["num"].tolist() == [1]
