"""Cluster state: entity-cluster management + connected components over
candidate pairs — the reference's ``InMemoryClusterManager``
(``/root/reference/src/pyodibel/management/clusters.py:141-243``) and the
downstream step of every near-dup pipeline (pairs → duplicate groups).

Two connected-components implementations:

- :func:`connected_components` — driver-side streaming union-find; node set
  bounded by candidate-pair membership (near-dups), fine for test scale and
  bounded-size pair streams.
- :func:`connected_components_distributed` — iterative min-label propagation
  over the pairs Dataset (the Gradoop/FAMER corpus-scale path, §2.1 S11):
  per round, every node takes the min label among itself and its neighbours
  (one keyed join + one groupby-min); converges when the global label sum
  stops decreasing. The driver holds only per-round counters, never the
  forest. Same deterministic output (component = smallest node id).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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


def _label_checksum(labels: "ray.data.Dataset") -> int:
    """Order/partition-independent multiset checksum of the label column:
    per-block wraparound sums of 64-bit hashes; only one tiny partial row per
    block reaches the driver."""
    import pandas as pd

    def part(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            t["label"].to_numpy(zero_copy_only=False), categorize=False
        )
        return pa.table({"c": pa.array([int(h.sum(dtype=np.uint64))], pa.uint64())})

    parts = labels.map_batches(part, batch_format="pyarrow").take_all()
    return sum(int(r["c"]) for r in parts) % (1 << 64)


def connected_components_distributed(
    pairs: "ray.data.Dataset",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    *,
    max_rounds: int = 20,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Distributed connected components by min-label propagation (hash-min).

    Rounds ≈ component diameter (near-dup clusters are shallow); each round is
    one :func:`odibel_ray.ops.relational.bucketed_join` (labels onto symmetric
    edges) + one groupby-min, both task-based sort shuffles over the pair node
    set. Convergence is detected from the (monotonically decreasing) global
    label sum — no driver-side label state at all.

    Returns ``(node, component)`` with ``component`` = smallest node id in the
    group — bit-identical to :func:`connected_components`.
    """
    from ray.data.aggregate import Min

    from odibel_ray.ops.relational import bucketed_join

    def _arr(col) -> pa.Array:
        if isinstance(col, pa.ChunkedArray):
            return pa.concat_arrays(col.chunks) if col.num_chunks != 1 else col.chunk(0)
        return col

    def symmetrize(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        a, b = _arr(t[a_col]), _arr(t[b_col])
        return pa.table(
            {
                "src": pa.concat_arrays([a, b]),
                "dst": pa.concat_arrays([b, a]),
            }
        )

    edges = pairs.select_columns([a_col, b_col]).map_batches(
        symmetrize, batch_format="pyarrow"
    ).materialize()
    key_type = edges.schema().base_schema.field("src").type
    edge_schema = pa.schema([("src", key_type), ("dst", key_type)])
    label_schema = pa.schema([("src", key_type), ("label", key_type)])

    def init_labels(t: pa.Table) -> pa.Table:
        # seed with min(self, direct neighbours) — folds the first
        # neighbour-min round into one groupby with no join
        src, lab = _arr(t["src"]), _arr(t["dst"])
        return pa.table(
            {
                "src": pa.concat_arrays([src, src]),
                "label": pa.concat_arrays([src, lab]),
            }
        )

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("src")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )
    ptr_schema = pa.schema([("node", key_type), ("ptr", key_type)])
    prev_sum = _label_checksum(labels)
    converged = False
    for _ in range(max_rounds):
        # 1) neighbour min: l(n) <- min(l(n), min over adjacent l(m))
        msgs = bucketed_join(
            edges,
            labels,
            "src",
            num_buckets=num_buckets,
            left_schema=edge_schema,
            right_schema=label_schema,
        ).map_batches(
            lambda t: pa.table({"src": t["dst"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        labels = (
            msgs.union(labels)
            .groupby("src")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        # 2) pointer jump: l(n) <- l(l(n)) — turns O(diameter) rounds into
        #    O(log diameter) (path-halving, label values are node ids)
        jump = bucketed_join(
            labels.map_batches(
                lambda t: pa.table({"node": t["src"], "ptr": t["label"]}),
                batch_format="pyarrow",
            ),
            labels.map_batches(
                lambda t: pa.table({"ptr": t["src"], "label": t["label"]}),
                batch_format="pyarrow",
            ),
            "ptr",
            how="left",
            num_buckets=num_buckets,
            left_schema=ptr_schema,
            right_schema=pa.schema([("ptr", key_type), ("label", key_type)]),
        )
        labels = jump.map_batches(
            lambda t: pa.table(
                {"src": t["node"], "label": pc.coalesce(t["label"], t["ptr"])}
            ),
            batch_format="pyarrow",
        ).materialize()
        s = _label_checksum(labels)
        # labels only ever decrease element-wise; an unchanged multiset
        # checksum means the fixed point (works for any key type)
        if s == prev_sum:
            break
        prev_sum = s
    return labels.map_batches(
        lambda t: pa.table({"node": t["src"], "component": t["label"]}),
        batch_format="pyarrow",
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
