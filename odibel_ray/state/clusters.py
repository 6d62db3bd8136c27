"""Cluster state: entity-cluster management + connected components over
candidate pairs — the reference's ``InMemoryClusterManager``
(``/root/reference/src/pyodibel/management/clusters.py:141-243``) and the
downstream step of every near-dup pipeline (pairs → duplicate groups).

Scale note: the node set here is bounded by *candidate-pair membership*
(near-duplicates), which is orders of magnitude smaller than the corpus — the
pairs Dataset is streamed batch-by-batch into a driver-side union-find
(path-halving, vectorized numpy relabel at the end). A full-corpus
connected-components (reference's Gradoop reader use case, §2.1 S11) would
need iterative label-propagation joins and stays out of scope for round 1.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


class _UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = self.parent.setdefault(p, p)
            x = self.parent[x]
            p = self.parent.setdefault(x, x)
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id wins as root
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            self.parent[hi] = lo


def connected_components(
    pairs: "ray.data.Dataset", a_col: str = "doc_a", b_col: str = "doc_b"
) -> pa.Table:
    """Duplicate groups from a candidate-pair Dataset: returns
    ``(node, component)`` where ``component`` is the smallest node id in the
    group (deterministic). Pairs are streamed via ``iter_batches`` — only the
    union-find forest (O(#distinct nodes in pairs)) is held on the driver."""
    uf = _UnionFind()
    for batch in pairs.iter_batches(batch_format="pyarrow"):
        for a, b in zip(batch[a_col].to_pylist(), batch[b_col].to_pylist()):
            uf.union(a, b)
    nodes = sorted(uf.parent)
    comp = [uf.find(n) for n in nodes]
    return pa.table(
        {"node": pa.array(nodes), "component": pa.array(comp)}
    )


class ClusterManager:
    """T6 analog: dict-of-clusters + entity→cluster index with
    create/add/remove/merge (``InMemoryClusterManager`` semantics)."""

    def __init__(self):
        self.clusters: dict[str, set] = {}
        self.entity_index: dict = {}
        self._next = 0

    def create_cluster(self, entities=()) -> str:
        cid = f"c{self._next}"
        self._next += 1
        self.clusters[cid] = set()
        for e in entities:
            self.add_entity(cid, e)
        return cid

    def add_entity(self, cid: str, entity) -> None:
        old = self.entity_index.get(entity)
        if old is not None and old != cid:
            self.clusters[old].discard(entity)
        self.clusters[cid].add(entity)
        self.entity_index[entity] = cid

    def remove_entity(self, entity) -> None:
        cid = self.entity_index.pop(entity, None)
        if cid is not None:
            self.clusters[cid].discard(entity)

    def merge_clusters(self, a: str, b: str) -> str:
        """Merge b into a; returns a."""
        for e in self.clusters.pop(b, set()):
            self.clusters[a].add(e)
            self.entity_index[e] = a
        return a

    def cluster_of(self, entity):
        return self.entity_index.get(entity)

    def from_components(self, components: pa.Table) -> None:
        """Bulk-load from a connected_components table."""
        by_comp: dict = {}
        for n, c in zip(
            components["node"].to_pylist(), components["component"].to_pylist()
        ):
            by_comp.setdefault(c, []).append(n)
        for members in by_comp.values():
            self.create_cluster(members)
