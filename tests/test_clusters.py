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


def test_distributed_cc_matches_union_find(ray_session):
    """Min-label propagation must be bit-identical to the union-find result
    on a random graph with chains (multi-round propagation needed)."""
    import numpy as np
    import ray.data as rd

    from odibel_ray.state import connected_components, connected_components_distributed

    rng = np.random.default_rng(3)
    # chains force >1 propagation round: edges (i, i+1) in runs, plus random
    a = np.arange(0, 40, dtype=np.int64)
    chain = pa.table({"doc_a": a[:-1], "doc_b": a[1:]})
    ra = rng.integers(100, 200, size=30)
    rb = rng.integers(100, 200, size=30)
    keep = ra != rb
    rand = pa.table(
        {
            "doc_a": pa.array(np.minimum(ra, rb)[keep]),
            "doc_b": pa.array(np.maximum(ra, rb)[keep]),
        }
    )
    pairs = rd.from_arrow(pa.concat_tables([chain, rand]))
    exact = connected_components(pairs)
    dist = connected_components_distributed(pairs).to_pandas()
    got = dict(zip(dist["node"], dist["component"]))
    want = dict(zip(exact["node"].to_pylist(), exact["component"].to_pylist()))
    assert got == want


def test_cc_auto_picks_path_by_size(ray_session):
    """connected_components_auto: below the edge limit it returns the
    union-find answer; forcing the limit to 0 routes the SAME pairs through
    the distributed loop — and both must be bit-identical."""
    import ray.data as rd

    from odibel_ray.state import connected_components, connected_components_auto

    pairs = rd.from_arrow(
        pa.table({"doc_a": [1, 2, 5, 8, 9, 20], "doc_b": [2, 3, 6, 9, 10, 21]})
    )
    want = connected_components(pairs)
    small = connected_components_auto(pairs).to_pandas().sort_values("node", ignore_index=True)
    big = (
        connected_components_auto(pairs, driver_edge_limit=0)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    ref = want.to_pandas().sort_values("node", ignore_index=True)
    assert small.equals(ref)
    assert big.equals(ref)


def test_gradoop_reader_and_clusters(ray_session, tmp_path):
    """FAMER JSONL vertex/edge files → Datasets → distributed clusters
    (S11; unknown-endpoint edges dropped as in the reference)."""
    import json

    from odibel_ray.sources import (
        gradoop_clusters,
        read_gradoop_edges,
        read_gradoop_vertices,
    )

    vf, ef = tmp_path / "vertices.jsonl", tmp_path / "edges.jsonl"
    vf.write_text(
        "\n".join(
            json.dumps({"id": f"v{i}", "data_io": {"srcId": f"s{i % 2}", "name": f"n{i}"}})
            for i in range(6)
        )
    )
    edges = [
        {"source": "v0", "target": "v1", "data_io": {"value": 0.9}},
        {"source": "v1", "target": "v2", "data_io": {"value": 0.8}},
        {"source": "v3", "target": "v4", "data_io": {"value": 0.2}},  # below min_sim
        {"source": "v4", "target": "vMISSING", "data_io": {"value": 0.9}},  # dropped
    ]
    ef.write_text("\n".join(json.dumps(e) for e in edges))

    verts = read_gradoop_vertices(str(vf)).take_all()
    assert len(verts) == 6 and verts[0]["resource"] in ("s0", "s1")
    assert "srcId" not in verts[0]["properties"]
    assert read_gradoop_edges(str(ef)).count() == 4

    comp = {
        r["node"]: r["component"]
        for r in gradoop_clusters(str(vf), str(ef), min_sim=0.5).take_all()
    }
    assert comp["v0"] == comp["v1"] == comp["v2"] == "v0"
    assert "vMISSING" not in comp and "v3" not in comp


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


def _famer_fixture():
    """Hand-computed FAMER graph: resources A={A1,A2}, B={B1,B2}, C={C1}.

    Expected classes per graph_construction.py:20-99 semantics:
    (A1,B1,.9) strong (reciprocal best), (A2,B1,.5) normal (best from A2
    only), (A1,B2,.3) normal (best from B2 only), (A2,B2,.2) weak (best
    from neither), (A1,C1,.7)/(A2,C1,.7) both strong (tie at C1's max
    toward A counts for every tied edge, as in the reference's tie loop).
    """
    edges = pa.table(
        {
            "src": ["A1", "A2", "A1", "A2", "A1", "A2"],
            "dst": ["B1", "B1", "B2", "B2", "C1", "C1"],
            "sim": [0.9, 0.5, 0.3, 0.2, 0.7, 0.7],
        }
    )
    verts = pa.table(
        {
            "id": ["A1", "A2", "B1", "B2", "C1"],
            "resource": ["A", "A", "B", "B", "C"],
        }
    )
    return edges, verts


def test_classify_links_reference_semantics(ray_session):
    import ray.data as rd

    from odibel_ray.state.clusters import classify_links

    edges, verts = _famer_fixture()
    out = classify_links(rd.from_arrow(edges), rd.from_arrow(verts)).to_pandas()
    got = {
        (r.src, r.dst): r.link_type for r in out.itertuples()
    }
    assert got == {
        ("A1", "B1"): "strong",
        ("A2", "B1"): "normal",
        ("A1", "B2"): "normal",
        ("A2", "B2"): "weak",
        ("A1", "C1"): "strong",
        ("A2", "C1"): "strong",
    }
    sims = {(r.src, r.dst): r.sim for r in out.itertuples()}
    assert sims[("A1", "B1")] == 0.9 and sims[("A2", "B2")] == 0.2


def test_filter_links_reclusters(ray_session):
    import ray.data as rd

    from odibel_ray.state.clusters import filter_links

    edges, verts = _famer_fixture()
    # default (normal+strong): only (A2,B2) dropped -> graph stays connected
    out = filter_links(rd.from_arrow(edges), rd.from_arrow(verts)).to_pandas()
    comp = dict(zip(out["node"], out["component"]))
    assert len(set(comp.values())) == 1 and comp["B2"] == comp["A1"]
    # strong only: B2 loses all links -> singleton cluster (reference keeps
    # all nodes of the pruned graph)
    out2 = filter_links(
        rd.from_arrow(edges), rd.from_arrow(verts), types=("strong",)
    ).to_pandas()
    comp2 = dict(zip(out2["node"], out2["component"]))
    assert comp2["B2"] == "B2"
    assert comp2["A1"] == comp2["A2"] == comp2["B1"] == comp2["C1"] == "A1"
    res = dict(zip(out2["node"], out2["resource"]))
    assert res == {"A1": "A", "A2": "A", "B1": "B", "B2": "B", "C1": "C"}
