"""Benchmark/BenchmarkBuilder surface (§2.10) — the reference's
``test_benchmark_entity_resolution.py`` / ``test_benchmark_evaluation.py``
coverage, plus the distributed split-assignment path that backs the
``benchmark_split_stats`` oracle query."""

import numpy as np
import pyarrow as pa
import pytest

from odibel_ray.benchmark import (
    Benchmark,
    BenchmarkBuilder,
    BenchmarkConfig,
    BenchmarkSplit,
    EntityResolutionBenchmark,
    EntityResolutionData,
    EntityResolutionEvaluator,
    SplitType,
    assign_splits,
    split_boundaries,
    split_pair_stats,
)
from odibel_ray.entity import Entity, EntityPair


def _pairs_table(rows):
    return pa.table(
        {
            "id_a": pa.array([r[0] for r in rows], pa.int64()),
            "id_b": pa.array([r[1] for r in rows], pa.int64()),
            "label": pa.array([r[2] for r in rows], pa.int64()),
            "score": pa.array([r[3] if len(r) > 3 else None for r in rows], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# object surface (reference test_benchmark_entity_resolution.py parity)
# ---------------------------------------------------------------------------


def test_entity_pair_semantics():
    p = EntityPair("e1", "e2", label=1, score=0.95)
    assert p.is_match() and not p.is_non_match() and not p.is_unlabeled()
    assert EntityPair("e1", "e2").is_unlabeled()
    assert EntityPair("e1", "e2", label=0).is_non_match()


def test_resolution_data_partitions():
    data = _pairs_table([(1, 2, 1), (1, 3, 0), (2, 3, None)])
    erd = EntityResolutionData(data)
    assert len(erd) == 3
    assert erd.get_matches()["id_b"].to_pylist() == [2]
    assert erd.get_non_matches()["id_b"].to_pylist() == [3]
    assert erd.get_unlabeled()["id_a"].to_pylist() == [2]
    # object bridge round-trip
    pairs = erd.entity_pairs()
    assert [p.label for p in pairs] == [1, 0, None]


def test_benchmark_splits_ground_truth_metadata():
    config = BenchmarkConfig(
        name="bench", description="d", domain="test", version="1.0"
    )
    bench = EntityResolutionBenchmark(config)
    bench.add_resolution_data(
        SplitType.TRAIN, EntityResolutionData(_pairs_table([(1, 2, 1), (1, 3, 0)]))
    )
    bench.add_resolution_data(
        SplitType.TEST, EntityResolutionData(_pairs_table([(4, 5, None)]))
    )

    gt = bench.get_ground_truth(SplitType.TRAIN)
    assert gt[str(("1", "2"))] is True and gt[str(("1", "3"))] is False
    assert bench.get_ground_truth()[str(("4", "5"))] is None

    splits = bench.get_splits()
    assert set(splits) == {SplitType.TRAIN, SplitType.TEST}
    assert sorted(e.identifier for e in splits[SplitType.TRAIN].entities) == [
        "1", "2", "3",
    ]
    assert splits[SplitType.TEST].split_type is SplitType.TEST
    assert bench.get_split(SplitType.TEST) is not None

    meta = bench.get_metadata()
    assert meta["name"] == "bench" and meta["version"] == "1.0"
    assert meta["num_splits"] == 2 and meta["total_pairs"] == 3

    combined = bench.get_resolution_data()
    assert len(combined) == 3


def test_base_benchmark_split_registry():
    bench = Benchmark(BenchmarkConfig(name="b", description=""))
    split = BenchmarkSplit(
        split_type=SplitType.DEV, entities=[Entity("x")], ground_truth={"k": True}
    )
    bench.add_split(split)
    assert bench.get_split(SplitType.DEV) is split
    assert bench.get_ground_truth() == {"k": True}
    assert bench.get_metadata()["num_splits"] == 1


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------


def test_builder_from_sources_and_ground_truth():
    builder = BenchmarkBuilder(BenchmarkConfig(name="b", description=""))
    src = pa.table({"id_a": [1, 2], "id_b": [9, 8]})  # no label/score cols
    bench = builder.from_sources([src])
    data = bench.get_resolution_data(SplitType.TRAIN)
    assert len(data) == 2 and data.pairs["label"].null_count == 2

    builder.add_ground_truth(bench, {str(("1", "9")): True})
    data = bench.get_resolution_data(SplitType.TRAIN)
    assert data.pairs["label"].to_pylist() == [1, None]


def test_split_boundaries_validation():
    with pytest.raises(ValueError):
        split_boundaries({SplitType.TRAIN: 0.5, SplitType.TEST: 0.4})
    b = split_boundaries(
        {SplitType.TRAIN: 0.6, SplitType.VALIDATION: 0.2, SplitType.TEST: 0.2},
        buckets=10,
    )
    assert b == [("train", 0, 6), ("validation", 6, 8), ("test", 8, 10)]


def test_create_splits_deterministic_and_partition(ray_session):
    rows = [(i, i + 100, i % 2) for i in range(300)]
    builder = BenchmarkBuilder(BenchmarkConfig(name="b", description=""))
    bench = builder.from_pairs(_pairs_table(rows))
    ratios = {SplitType.TRAIN: 0.8, SplitType.TEST: 0.2}

    out1 = builder.create_splits(bench, ratios, seed=7)
    out2 = builder.create_splits(bench, ratios, seed=7)
    n_train = len(out1.get_resolution_data(SplitType.TRAIN))
    n_test = len(out1.get_resolution_data(SplitType.TEST))
    assert n_train + n_test == 300
    # deterministic across runs
    assert out1.get_resolution_data(SplitType.TRAIN).pairs.equals(
        out2.get_resolution_data(SplitType.TRAIN).pairs
    )
    # roughly proportional
    assert 0.6 < n_train / 300 < 0.95
    # different seed reshuffles
    out3 = builder.create_splits(bench, ratios, seed=8)
    assert not out3.get_resolution_data(SplitType.TRAIN).pairs.equals(
        out1.get_resolution_data(SplitType.TRAIN).pairs
    )


def test_assign_splits_modulo_rule(ray_session):
    import ray.data as rd

    from odibel_ray.benchmark import _collect

    rows = [(i, 2 * i, None) for i in range(50)]
    tagged = _collect(
        assign_splits(
            rd.from_arrow(_pairs_table(rows)),
            {SplitType.TRAIN: 0.6, SplitType.VALIDATION: 0.2, SplitType.TEST: 0.2},
            method="modulo",
            buckets=10,
        )
    )
    for a, b, s in zip(
        tagged["id_a"].to_pylist(), tagged["id_b"].to_pylist(), tagged["split"].to_pylist()
    ):
        bucket = ((a + b) * 7) % 10
        expect = "train" if bucket < 6 else ("validation" if bucket < 8 else "test")
        assert s == expect


def test_split_pair_stats_matches_manual(ray_session):
    import ray.data as rd

    rows = [(i, i + 1, [1, 0, None][i % 3]) for i in range(90)]
    t = _pairs_table(rows).append_column(
        "split", pa.array(["train" if i % 2 else "test" for i in range(90)])
    )
    stats = {
        r["split"]: r
        for r in split_pair_stats(rd.from_arrow(t)).take_all()
    }
    for split in ("train", "test"):
        sel = [r for i, r in enumerate(rows) if ("train" if i % 2 else "test") == split]
        assert stats[split]["pairs"] == len(sel)
        assert stats[split]["matches"] == sum(1 for r in sel if r[2] == 1)
        assert stats[split]["unlabeled"] == sum(1 for r in sel if r[2] is None)
        assert stats[split]["match_ratio"] == pytest.approx(
            round(sum(1 for r in sel if r[2] == 1) / len(sel), 6)
        )


# ---------------------------------------------------------------------------
# evaluator (reference test_benchmark_evaluation.py parity)
# ---------------------------------------------------------------------------


def test_evaluate_resolution_data():
    erd = EntityResolutionData(
        _pairs_table([(1, 2, 1), (1, 3, 0), (2, 3, None), (2, 4, 1)])
    )
    res = EntityResolutionEvaluator().evaluate_resolution_data(erd)
    assert res.metrics["total_pairs"] == 4
    assert res.metrics["matches"] == 2
    assert res.metrics["non_matches"] == 1
    assert res.metrics["unlabeled"] == 1
    assert res.metrics["match_ratio"] == pytest.approx(0.5)
    assert res.characteristics["has_clusters"] is False


def test_evaluate_benchmark_per_split_stats():
    bench = EntityResolutionBenchmark(BenchmarkConfig(name="b", description=""))
    bench.add_resolution_data(
        SplitType.TRAIN, EntityResolutionData(_pairs_table([(1, 2, 1), (1, 3, 0)]))
    )
    bench.add_resolution_data(
        SplitType.TEST, EntityResolutionData(_pairs_table([(4, 5, None)]))
    )
    res = EntityResolutionEvaluator().evaluate_benchmark(bench)
    assert res.metrics["total_pairs"] == 3
    assert res.metrics["total_matches"] == 1
    assert res.statistics["train_pairs"] == 2
    assert res.statistics["test_unlabeled"] == 1
    assert res.characteristics["num_splits"] == 2
    assert res.metadata["benchmark_name"] == "b"


# ---------------------------------------------------------------------------
# schema-matching / entity-fusion flavors + distributed fusion executor
# ---------------------------------------------------------------------------


def test_schema_matching_benchmark_and_evaluator():
    from odibel_ray.benchmark import (
        AttributeMapping,
        Schema,
        SchemaMatchingBenchmark,
        SchemaMatchingData,
        SchemaMatchingEvaluator,
    )

    s1 = Schema("s1", {"a": "int", "b": "str"})
    s2 = Schema("s2", {"x": "int", "y": "str"})
    data = SchemaMatchingData(
        schemas=[s1, s2],
        mappings=[
            AttributeMapping("a", "x", is_match=True, confidence=0.9),
            AttributeMapping("b", "y", is_match=False),
            AttributeMapping("b", "x"),
        ],
    )
    assert len(data.get_matches()) == 1
    assert len(data.get_non_matches()) == 1
    assert len(data.get_unlabeled()) == 1

    bench = SchemaMatchingBenchmark(BenchmarkConfig(name="sm", description=""))
    bench.add_matching_data(SplitType.TRAIN, data)
    gt = bench.get_ground_truth()
    assert gt[str(("a", "x"))] is True and gt[str(("b", "x"))] is None
    meta = bench.get_metadata()
    assert meta["total_schemas"] == 2 and meta["total_mappings"] == 3

    res = SchemaMatchingEvaluator().evaluate_benchmark(bench)
    assert res.metrics["total_mappings"] == 3
    assert res.metrics["match_ratio"] == pytest.approx(1 / 3)
    assert res.characteristics["avg_attributes_per_schema"] == 2


def test_entity_fusion_benchmark_and_evaluator():
    from odibel_ray.benchmark import (
        EntityFusionBenchmark,
        EntityFusionData,
        EntityFusionEvaluator,
        FusionCluster,
    )

    c1 = FusionCluster("c1", [Entity("e1"), Entity("e2")], fused_entity=Entity("f1"))
    c2 = FusionCluster("c2", [Entity("e3")])
    bench = EntityFusionBenchmark(BenchmarkConfig(name="ef", description=""))
    bench.add_fusion_data(SplitType.TRAIN, EntityFusionData(clusters=[c1, c2]))
    data = bench.get_fusion_data()
    assert data.get_cluster_by_id("c2").entities[0].identifier == "e3"
    assert [c.cluster_id for c in data.get_clusters_with_fused()] == ["c1"]

    res = EntityFusionEvaluator().evaluate_benchmark(bench)
    assert res.metrics["total_clusters"] == 2
    assert res.metrics["total_entities"] == 3
    assert res.metrics["fusion_ratio"] == 0.5
    assert res.metrics["max_cluster_size"] == 2


def test_fuse_clusters_rules(ray_session):
    import ray.data as rd

    from odibel_ray.benchmark import FusionRule, fuse_clusters

    t = pa.table(
        {
            "cluster_id": ["c1", "c1", "c1", "c2", "c2"],
            "entity_id": [3, 1, 2, 5, 4],
            "score": [1.0, 5.0, 3.0, 2.0, 4.0],
            "name": ["c", "a", "b", "e", "d"],
        }
    )
    rules = [
        FusionRule("r1", "max", "score"),
        FusionRule("r2", "concat", "name", parameters={"sep": ","}),
    ]
    out = (
        fuse_clusters(rd.from_arrow(t), rules)
        .to_pandas()
        .set_index("cluster_id")
        .sort_index()
    )
    assert out.loc["c1", "n_entities"] == 3
    assert out.loc["c1", "score"] == 5.0
    # concat follows entity_id order, not input order
    assert out.loc["c1", "name"] == "a,b,c"
    assert out.loc["c2", "name"] == "d,e"

    # avg / min / sum / first
    rules2 = [
        FusionRule("a", "avg", "score"),
        FusionRule("b", "min", "score2"),
        FusionRule("c", "sum", "score3"),
        FusionRule("d", "first", "name"),
    ]
    t2 = t.append_column("score2", t["score"]).append_column("score3", t["score"])
    out2 = (
        fuse_clusters(rd.from_arrow(t2), rules2)
        .to_pandas()
        .set_index("cluster_id")
        .sort_index()
    )
    assert out2.loc["c1", "score"] == 3.0
    assert out2.loc["c1", "score2"] == 1.0
    assert out2.loc["c1", "score3"] == 9.0
    assert out2.loc["c1", "name"] == "a"  # row of smallest entity_id

    with pytest.raises(ValueError):
        fuse_clusters(rd.from_arrow(t), [FusionRule("x", "median", "score")])
