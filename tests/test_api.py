"""Abstract Op/Source/Pipeline extension surface (§2.10)."""

import pyarrow as pa
import pyarrow.compute as pc


def test_batch_operation_and_pipeline(ray_session):
    import ray.data as rd

    from odibel_ray.api import BatchOperation, FnOperation, OperationConfig, Pipeline

    class Upper(BatchOperation):
        def transform_batch(self, t: pa.Table) -> pa.Table:
            return t.set_column(
                t.schema.get_field_index("s"), "s", pc.utf8_upper(t["s"])
            )

    def only_long(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(pc.utf8_length(t["s"]), 2))

    ds = rd.from_arrow(pa.table({"s": ["ab", "abcd", "xyz"]}))
    pipe = Pipeline([Upper(OperationConfig("upper")), FnOperation(only_long)])
    assert pipe.validate_inputs(ds)
    assert not pipe.validate_inputs("not a dataset")
    out = sorted(r["s"] for r in pipe.execute(ds).take_all())
    assert out == ["ABCD", "XYZ"]


def test_parquet_source(ray_session):
    from odibel_ray.api import ParquetSource

    src = ParquetSource("/root/testdata/sf0.001/nation.parquet", ["n_nationkey", "n_name"])
    assert src.validate()
    assert src.get_schema().names == ["n_nationkey", "n_name"]
    assert src.read().count() == 25


def test_ntriples_source(ray_session, tmp_path):
    from odibel_ray.api import NTriplesSource

    p = tmp_path / "t.nt"
    p.write_text("<a> <b> <c> .\n<a> <b> \"lit\" .\n")
    src = NTriplesSource(str(p))
    assert src.get_schema().names == ["s", "p", "o", "isLiteral"]
    rows = src.read().take_all()
    assert len(rows) == 2
    assert {r["o"]: r["isLiteral"] for r in rows} == {"<c>": False, '"lit"': True}


def test_pipeline_composes_engine_ops(ray_session):
    """Extension surface end-to-end: a user Pipeline chaining a custom batch
    op with engine library operators over a real table."""
    from odibel_ray.api import FnOperation, ParquetSource, Pipeline
    from odibel_ray.ops import exact_dedup, topk

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.multiply(t["l_quantity"], 0.1)), pa.int64())
        return t.append_column("qty_bucket", b)

    src = ParquetSource(
        "/root/testdata/sf0.001/lineitem.parquet",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
    )
    pipe = Pipeline(
        [
            FnOperation(add_bucket),
            FnOperation(lambda t: t.filter(pc.greater(t["qty_bucket"], 2))),
        ]
    )
    ds = pipe.execute(src.read())
    dedup = exact_dedup(ds, ["qty_bucket"], tie_break="l_extendedprice")
    rows = topk(dedup, "l_extendedprice", 3).take_all()
    assert 0 < len(rows) <= 3
    assert all(r["qty_bucket"] > 2 for r in rows)


def test_register_query_extends_driver_contract(ray_session):
    from odibel_ray.api import register_query
    from odibel_ray.pipelines import queries as q

    def my_query(sf_dir):
        from odibel_ray.ops.relational import load_table

        return load_table(sf_dir, "region", ["r_regionkey", "r_name"])

    try:
        register_query("thirdparty_regions", my_query, "SELECT r_regionkey, r_name FROM region")
        assert "thirdparty_regions" in q.ray_queries()
        assert "thirdparty_regions" in q.ORACLES("/root/testdata/sf0.001")
        assert q.ray_queries()["thirdparty_regions"]("/root/testdata/sf0.001").count() == 5
    finally:
        q.QUERIES.pop("thirdparty_regions", None)
        q.EXTRA_ORACLES.pop("thirdparty_regions", None)
