"""Entity API — the reference's ``api/entity.py:23-104`` surface (Entity /
SimpleEntity / EntityMetadata, EntityPair, EntityCluster) with Arrow-table
bridges so entity collections round-trip to Ray Datasets.

The reference treats entities as Python objects end-to-end; here they are a
*boundary* representation — pipelines stay columnar (one row per entity,
properties = columns) and these classes exist for the management/benchmark
APIs that genuinely work object-at-a-time (``ClusterManager``, evaluator
inputs, user extension code).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

import pyarrow as pa


@dataclass
class EntityMetadata:
    """Metadata associated with an entity (``api/entity.py:14-20`` analog)."""

    source: Optional[str] = None
    source_id: Optional[str] = None
    confidence: Optional[float] = None
    properties: Dict[str, Any] = field(default_factory=dict)


class Entity:
    """Identifiable object with a property dict (``api/entity.py:23-104``).

    Unlike the reference's ABC + SimpleEntity split, one concrete class
    suffices — the abstract surface (get_properties/get_property/has_property)
    is the whole contract.
    """

    def __init__(
        self,
        identifier: str,
        properties: Optional[Dict[str, Any]] = None,
        metadata: Optional[EntityMetadata] = None,
    ):
        self.identifier = identifier
        self.properties = dict(properties or {})
        self.metadata = metadata or EntityMetadata()

    def get_properties(self) -> Dict[str, Any]:
        return dict(self.properties)

    def get_property(self, name: str, default: Any = None) -> Any:
        return self.properties.get(name, default)

    def has_property(self, name: str) -> bool:
        return name in self.properties and self.properties[name] is not None

    def set_property(self, name: str, value: Any) -> None:
        self.properties[name] = value

    def get_identifier(self) -> str:
        return self.identifier

    def __eq__(self, other: Any) -> bool:
        return isinstance(other, Entity) and self.identifier == other.identifier

    def __hash__(self) -> int:
        return hash(self.identifier)

    def __repr__(self) -> str:
        return f"Entity({self.identifier}, source={self.metadata.source})"


#: alias kept for parity with the reference naming (``SimpleEntity``)
SimpleEntity = Entity


@dataclass
class EntityPair:
    """Labeled match pair (``benchmark/entity_resolution/data.py:15-31``):
    ``label`` is 1 (match), 0 (non-match) or None (unlabeled)."""

    entity_a: str
    entity_b: str
    label: Optional[int] = None
    score: Optional[float] = None

    def is_match(self) -> bool:
        return self.label == 1

    def is_non_match(self) -> bool:
        return self.label == 0

    def is_unlabeled(self) -> bool:
        return self.label is None


@dataclass
class EntityCluster:
    """Entity group with optional fused representative
    (``management/clusters.py:15-33`` analog)."""

    cluster_id: str
    entities: List[str] = field(default_factory=list)
    representative: Optional[str] = None

    def size(self) -> int:
        return len(self.entities)

    def has_fused(self) -> bool:
        return self.representative is not None


# ---------------------------------------------------------------------------
# Arrow bridges
# ---------------------------------------------------------------------------


def entities_from_table(
    t: pa.Table, id_col: str, prop_cols: Optional[Sequence[str]] = None,
    source: Optional[str] = None,
) -> List[Entity]:
    """One Entity per row; ``prop_cols`` (default: all non-id columns) become
    the property dict. Null cells become absent properties."""
    prop_cols = list(prop_cols) if prop_cols else [c for c in t.column_names if c != id_col]
    meta = EntityMetadata(source=source)
    out = []
    for row in t.select([id_col] + prop_cols).to_pylist():
        ident = str(row.pop(id_col))
        props = {k: v for k, v in row.items() if v is not None}
        out.append(Entity(ident, props, meta))
    return out


def entities_to_table(entities: Sequence[Entity], id_col: str = "id") -> pa.Table:
    """Inverse bridge: union of property keys become columns (missing → null)."""
    keys: list[str] = []
    for e in entities:
        for k in e.properties:
            if k not in keys:
                keys.append(k)
    cols: Dict[str, list] = {id_col: [e.identifier for e in entities]}
    for k in keys:
        cols[k] = [e.properties.get(k) for e in entities]
    return pa.table(cols)


def pairs_to_table(pairs: Sequence[EntityPair]) -> pa.Table:
    return pa.table(
        {
            "id_a": pa.array([p.entity_a for p in pairs], pa.string()),
            "id_b": pa.array([p.entity_b for p in pairs], pa.string()),
            "label": pa.array([p.label for p in pairs], pa.int64()),
            "score": pa.array([p.score for p in pairs], pa.float64()),
        }
    )


def pairs_from_table(
    t: pa.Table, a_col: str = "id_a", b_col: str = "id_b", label_col: str = "label"
) -> List[EntityPair]:
    score = t["score"].to_pylist() if "score" in t.column_names else [None] * len(t)
    return [
        EntityPair(str(a), str(b), l, s)
        for a, b, l, s in zip(
            t[a_col].to_pylist(), t[b_col].to_pylist(), t[label_col].to_pylist(), score
        )
    ]


def clusters_from_components(components: pa.Table) -> List[EntityCluster]:
    """Bridge from a ``connected_components`` table (node, component)."""
    by_comp: Dict[Any, list] = {}
    for n, c in zip(components["node"].to_pylist(), components["component"].to_pylist()):
        by_comp.setdefault(c, []).append(n)
    return [
        EntityCluster(cluster_id=f"c{c}", entities=[str(m) for m in sorted(members)])
        for c, members in sorted(by_comp.items())
    ]
