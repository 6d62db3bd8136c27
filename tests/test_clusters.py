"""Cluster state: union-find components + ClusterManager CRUD/merge."""

import pyarrow as pa


def test_connected_components(ray_session):
    import ray.data as rd

    from odibel_ray.state import connected_components

    pairs = rd.from_arrow(
        pa.table({"doc_a": [1, 2, 5, 8, 9], "doc_b": [2, 3, 6, 9, 10]})
    )
    t = connected_components(pairs)
    comp = dict(zip(t["node"].to_pylist(), t["component"].to_pylist()))
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[5] == comp[6] == 5
    assert comp[8] == comp[9] == comp[10] == 8


def test_cluster_manager_crud_merge():
    from odibel_ray.state import ClusterManager

    cm = ClusterManager()
    a = cm.create_cluster([1, 2])
    b = cm.create_cluster([3])
    assert cm.cluster_of(2) == a
    cm.add_entity(b, 2)  # moves 2 from a to b
    assert cm.cluster_of(2) == b and 2 not in cm.clusters[a]
    cm.merge_clusters(a, b)
    assert cm.cluster_of(3) == a and b not in cm.clusters
    cm.remove_entity(1)
    assert cm.cluster_of(1) is None


def test_minhash_pairs_to_clusters(ray_session):
    import ray.data as rd

    from odibel_ray.dedup import minhash_lsh_pairs
    from odibel_ray.state import ClusterManager, connected_components
    from tests.test_text_dedup_sim import _docs_with_planted_dups

    tbl, planted = _docs_with_planted_dups()
    pairs = minhash_lsh_pairs(rd.from_arrow(tbl), threshold=0.3)
    comps = connected_components(pairs)
    comp = dict(zip(comps["node"].to_pylist(), comps["component"].to_pylist()))
    hits = sum(comp.get(a) == comp.get(b) is not None for a, b in planted)
    assert hits >= 4
    cm = ClusterManager()
    cm.from_components(comps)
    assert all(len(c) >= 2 for c in cm.clusters.values())
