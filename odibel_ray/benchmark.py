"""Benchmark API (SURVEY.md §2.10) — the reference's ``api/benchmark.py:17-183``
surface (SplitType, BenchmarkConfig, BenchmarkSplit, Benchmark,
BenchmarkBuilder) and its entity-resolution flavor
(``benchmark/entity_resolution/data.py:15-166``), re-expressed Ray-Data-first:

- the *object* surface (splits, ground-truth dicts, pair lists) is a boundary
  representation for lab code and mirrors the reference's class contracts;
- the *data* lives columnar — labeled pairs are Arrow tables / Ray Datasets
  (``id_a``, ``id_b``, ``label``, ``score``) and split assignment is a
  deterministic per-row rule (:func:`assign_splits`) that runs inside
  ``map_batches`` with no driver state, so a 100-TB pair table splits in one
  streaming pass and the same rule is SQL-replicable for the oracle.

Bridged to :mod:`odibel_ray.evaluate` for the metric side
(``entity_resolution/eval.py:30-173`` analogs).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import TYPE_CHECKING, Any, Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

from odibel_ray.entity import Entity, EntityPair, pairs_from_table, pairs_to_table
from odibel_ray.evaluate import EvaluationResult


class SplitType(Enum):
    """(``api/benchmark.py:17-23``)"""

    TRAIN = "train"
    VALIDATION = "validation"
    TEST = "test"
    DEV = "dev"


@dataclass
class BenchmarkConfig:
    """(``api/benchmark.py:25-32``)"""

    name: str
    description: str
    domain: Optional[str] = None
    version: Optional[str] = None
    metadata: Dict[str, Any] = field(default_factory=dict)


@dataclass
class BenchmarkSplit:
    """(``api/benchmark.py:35-41``)"""

    split_type: SplitType
    entities: List[Entity]
    ground_truth: Optional[Dict[str, Any]] = None
    metadata: Dict[str, Any] = field(default_factory=dict)


class Benchmark:
    """Structured dataset with splits + ground truth
    (``api/benchmark.py:44-122``). Concrete rather than ABC — the split
    registry and config accessors are the whole base contract; task flavors
    subclass to add their data artifacts."""

    def __init__(self, config: BenchmarkConfig):
        self.config = config
        self._splits: Dict[SplitType, BenchmarkSplit] = {}

    def get_splits(self) -> Dict[SplitType, BenchmarkSplit]:
        return dict(self._splits)

    def get_split(self, split_type: SplitType) -> Optional[BenchmarkSplit]:
        return self._splits.get(split_type)

    def add_split(self, split: BenchmarkSplit) -> None:
        self._splits[split.split_type] = split

    def get_ground_truth(self, split_type: Optional[SplitType] = None) -> Dict[str, Any]:
        if split_type is not None:
            split = self._splits.get(split_type)
            return dict(split.ground_truth or {}) if split else {}
        out: Dict[str, Any] = {}
        for split in self._splits.values():
            out.update(split.ground_truth or {})
        return out

    def get_metadata(self) -> Dict[str, Any]:
        meta = {
            "name": self.config.name,
            "description": self.config.description,
            "domain": self.config.domain,
            "version": self.config.version,
            "num_splits": len(self._splits),
        }
        meta.update(self.config.metadata)
        return meta

    def get_config(self) -> BenchmarkConfig:
        return self.config

    def __repr__(self) -> str:
        return f"Benchmark(name={self.config.name}, domain={self.config.domain})"


# ---------------------------------------------------------------------------
# entity-resolution flavor
# ---------------------------------------------------------------------------


_PAIR_KEY_COLS = ("id_a", "id_b")


def _collect(ds: "ray.data.Dataset") -> pa.Table:
    """Dataset → one Arrow table (object-surface boundary only; never used on
    data-sized inputs)."""
    batches = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in ds.iter_batches(batch_format="pyarrow")
    ]
    if not batches:
        return pairs_to_table([])
    return pa.concat_tables(batches, promote_options="default")


class EntityResolutionData:
    """Labeled-pair artifact (``entity_resolution/data.py:34-52``) backed by an
    Arrow table (``id_a, id_b, label, score``) — ``label`` 1/0/null for
    match/non-match/unlabeled. The list-of-EntityPair view is a bridge, not
    the storage format."""

    def __init__(
        self,
        pairs: pa.Table,
        *,
        entity_clusters: Optional[Dict[str, set]] = None,
        features: Optional[Dict[str, Any]] = None,
        metadata: Optional[Dict[str, Any]] = None,
    ):
        self.pairs = pairs
        self.entity_clusters = entity_clusters
        self.features = features
        self.metadata = dict(metadata or {})

    @classmethod
    def from_pairs(cls, pairs: Sequence[EntityPair], **kw) -> "EntityResolutionData":
        return cls(pairs_to_table(pairs), **kw)

    def entity_pairs(self) -> List[EntityPair]:
        return pairs_from_table(self.pairs)

    def __len__(self) -> int:
        return len(self.pairs)

    def get_matches(self) -> pa.Table:
        return self.pairs.filter(pc.fill_null(pc.equal(self.pairs["label"], 1), False))

    def get_non_matches(self) -> pa.Table:
        return self.pairs.filter(pc.fill_null(pc.equal(self.pairs["label"], 0), False))

    def get_unlabeled(self) -> pa.Table:
        return self.pairs.filter(pc.is_null(self.pairs["label"]))


class EntityResolutionBenchmark(Benchmark):
    """(``entity_resolution/data.py:55-166``) — per-split labeled-pair data
    with ground-truth and entity accessors derived from the pair tables."""

    def __init__(self, config: BenchmarkConfig):
        super().__init__(config)
        self.resolution_data: Dict[SplitType, EntityResolutionData] = {}

    def add_resolution_data(
        self, split_type: SplitType, data: EntityResolutionData
    ) -> None:
        self.resolution_data[split_type] = data

    def get_resolution_data(
        self, split_type: Optional[SplitType] = None
    ) -> Optional[EntityResolutionData]:
        if split_type is not None:
            return self.resolution_data.get(split_type)
        tables = [d.pairs for d in self.resolution_data.values()]
        if not tables:
            return EntityResolutionData(pairs_to_table([]))
        return EntityResolutionData(pa.concat_tables(tables, promote_options="default"))

    def get_ground_truth(self, split_type: Optional[SplitType] = None) -> Dict[str, Any]:
        """``{str((id_a, id_b)): bool|None}`` — the reference's key format
        (``entity_resolution/data.py:102-122``)."""
        datas = (
            [self.resolution_data[split_type]]
            if split_type is not None and split_type in self.resolution_data
            else ([] if split_type is not None else list(self.resolution_data.values()))
        )
        out: Dict[str, Any] = {}
        for data in datas:
            for a, b, lab in zip(
                data.pairs["id_a"].to_pylist(),
                data.pairs["id_b"].to_pylist(),
                data.pairs["label"].to_pylist(),
            ):
                out[str((str(a), str(b)))] = None if lab is None else bool(lab)
        return out

    def get_splits(self) -> Dict[SplitType, BenchmarkSplit]:
        splits = {}
        for split_type, data in self.resolution_data.items():
            ids: list[str] = []
            seen: set[str] = set()
            for col in _PAIR_KEY_COLS:
                for v in data.pairs[col].to_pylist():
                    s = str(v)
                    if s not in seen:
                        seen.add(s)
                        ids.append(s)
            splits[split_type] = BenchmarkSplit(
                split_type=split_type,
                entities=[Entity(i) for i in ids],
                ground_truth=self.get_ground_truth(split_type),
            )
        return splits

    def get_split(self, split_type: SplitType) -> Optional[BenchmarkSplit]:
        return self.get_splits().get(split_type)

    def get_metadata(self) -> Dict[str, Any]:
        meta = super().get_metadata()
        meta["num_splits"] = len(self.resolution_data)
        meta["total_pairs"] = sum(len(d) for d in self.resolution_data.values())
        return meta


# ---------------------------------------------------------------------------
# split assignment — the distributed core
# ---------------------------------------------------------------------------

_SPLITMIX = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)

#: canonical split order for cumulative ratio boundaries
_SPLIT_ORDER = (SplitType.TRAIN, SplitType.VALIDATION, SplitType.TEST, SplitType.DEV)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x + _SPLITMIX).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(30))) * _MIX1).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(27))) * _MIX2).astype(np.uint64)
        return (x ^ (x >> np.uint64(31))).astype(np.uint64)


def split_boundaries(ratios: Dict[SplitType, float], buckets: int = 1000) -> list:
    """``[(split_value, lo, hi)]`` half-open integer bucket ranges from the
    ratio dict in canonical TRAIN→VALIDATION→TEST→DEV order. Ratios must sum
    to 1.0 (``api/benchmark.py:147-160`` contract)."""
    total = sum(ratios.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split ratios must sum to 1.0, got {total}")
    out, lo = [], 0
    named = [(s, ratios[s]) for s in _SPLIT_ORDER if s in ratios]
    for i, (s, r) in enumerate(named):
        hi = buckets if i == len(named) - 1 else lo + int(round(r * buckets))
        out.append((s.value, lo, hi))
        lo = hi
    return out


def assign_splits(
    ds: "ray.data.Dataset",
    ratios: Dict[SplitType, float],
    *,
    key_cols: Sequence[str] = _PAIR_KEY_COLS,
    seed: int = 0,
    method: str = "hash",
    buckets: int = 1000,
) -> "ray.data.Dataset":
    """Add a ``split`` column by a deterministic per-row rule — the
    distributed analog of ``BenchmarkBuilder.create_splits``
    (``api/benchmark.py:147-160``).

    ``method="hash"``: splitmix64 over the stringified key columns (general;
    stable across runs and partitionings). ``method="modulo"``: bucket =
    ``(sum of integer keys * 7 + seed) % buckets`` — weaker mixing but exactly
    replicable in ANSI SQL, which is what the oracle-checked queries use.
    Either way the rule is pure per-row arithmetic inside ``map_batches``:
    no shuffle, no driver state, streams at any scale.
    """
    bounds = split_boundaries(ratios, buckets)
    key_cols = list(key_cols)

    def tag(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if method == "modulo":
            acc = np.zeros(len(t), dtype=np.int64)
            for c in key_cols:
                acc = acc + t[c].to_numpy(zero_copy_only=False).astype(np.int64)
            bucket = (acc * 7 + seed) % buckets
        else:
            from pandas.util import hash_array

            joined = t[key_cols[0]].cast(pa.string())
            for c in key_cols[1:]:
                joined = pc.binary_join_element_wise(joined, t[c].cast(pa.string()), "\x1f")
            # pandas hash_array: stable fixed-key siphash, vectorized in C
            h = hash_array(joined.to_numpy(zero_copy_only=False)).astype(np.uint64)
            bucket = (_splitmix64(h + np.uint64(seed)) % np.uint64(buckets)).astype(
                np.int64
            )
        split = np.empty(len(t), dtype=object)
        for value, lo, hi in bounds:
            split[(bucket >= lo) & (bucket < hi)] = value
        return t.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")


def split_pair_stats(pairs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-split match/non-match/unlabeled distribution of a split-tagged pair
    dataset — the distributed twin of
    ``EntityResolutionEvaluator.evaluate_benchmark``'s per-split statistics
    (``entity_resolution/eval.py:42-57``). One small groupby on ``split``."""
    from ray.data.aggregate import Sum

    def derive(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        lab = t["label"]
        return pa.table(
            {
                "split": t["split"],
                "m": pc.cast(pc.fill_null(pc.equal(lab, 1), False), pa.int64()),
                "nm": pc.cast(pc.fill_null(pc.equal(lab, 0), False), pa.int64()),
                "ul": pc.cast(pc.is_null(lab), pa.int64()),
                "one": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        total = t["pairs"].to_numpy(zero_copy_only=False).astype(np.float64)
        m = t["matches"].to_numpy(zero_copy_only=False).astype(np.float64)
        d = np.maximum(total, 1.0)
        return t.append_column("match_ratio", pa.array(np.round(m / d, 6)))

    return (
        pairs.map_batches(derive, batch_format="pyarrow")
        .groupby("split")
        .aggregate(
            Sum("one", alias_name="pairs"),
            Sum("m", alias_name="matches"),
            Sum("nm", alias_name="non_matches"),
            Sum("ul", alias_name="unlabeled"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------


class BenchmarkBuilder:
    """(``api/benchmark.py:125-183``) — constructs benchmarks from sources,
    creates splits, attaches ground truth. The split step is the distributed
    :func:`assign_splits` rule applied to the benchmark's combined pair table;
    the object registry only ever holds the per-split *results*."""

    def __init__(self, config: Optional[BenchmarkConfig] = None):
        self.config = config or BenchmarkConfig(name="benchmark", description="")

    def from_sources(self, sources: Sequence[Any]) -> EntityResolutionBenchmark:
        """Build from ``Source`` objects (``api/source.py`` contract: each has
        ``read() -> Dataset``) or plain Arrow tables. Sources must yield pair
        rows (``id_a``, ``id_b``[, ``label``, ``score``]); missing label/score
        columns are filled with nulls (unlabeled)."""
        bench = EntityResolutionBenchmark(self.config)
        tables = []
        for src in sources:
            t = src.read() if hasattr(src, "read") else src
            if hasattr(t, "iter_batches"):  # ray.data.Dataset → Arrow boundary
                t = _collect(t)
            if "label" not in t.column_names:
                t = t.append_column("label", pa.nulls(len(t), pa.int64()))
            if "score" not in t.column_names:
                t = t.append_column("score", pa.nulls(len(t), pa.float64()))
            tables.append(t.select(["id_a", "id_b", "label", "score"]))
        if tables:
            bench.add_resolution_data(
                SplitType.TRAIN,
                EntityResolutionData(pa.concat_tables(tables, promote_options="default")),
            )
        return bench

    def from_pairs(
        self, pairs: pa.Table, split_type: SplitType = SplitType.TRAIN
    ) -> EntityResolutionBenchmark:
        bench = EntityResolutionBenchmark(self.config)
        bench.add_resolution_data(split_type, EntityResolutionData(pairs))
        return bench

    def create_splits(
        self,
        benchmark: EntityResolutionBenchmark,
        split_ratios: Dict[SplitType, float],
        *,
        seed: int = 0,
        method: str = "hash",
    ) -> EntityResolutionBenchmark:
        """Re-split the benchmark's combined pairs by the deterministic rule
        (ratios must sum to 1.0)."""
        import ray.data as rd

        combined = benchmark.get_resolution_data()
        tagged = _collect(
            assign_splits(
                rd.from_arrow(combined.pairs), split_ratios, seed=seed, method=method
            )
        )
        out = EntityResolutionBenchmark(benchmark.config)
        for st in split_ratios:
            part = tagged.filter(pc.equal(tagged["split"], st.value)).drop_columns(
                ["split"]
            )
            out.add_resolution_data(st, EntityResolutionData(part))
        return out

    def add_ground_truth(
        self,
        benchmark: EntityResolutionBenchmark,
        ground_truth: Dict[str, bool],
        split_type: Optional[SplitType] = None,
    ) -> EntityResolutionBenchmark:
        """Overlay labels keyed ``str((id_a, id_b))`` (the reference's
        ground-truth key format) onto the stored pair tables."""
        targets = (
            [split_type] if split_type is not None else list(benchmark.resolution_data)
        )
        for st in targets:
            data = benchmark.resolution_data.get(st)
            if data is None:
                continue
            ids_a = data.pairs["id_a"].to_pylist()
            ids_b = data.pairs["id_b"].to_pylist()
            old = data.pairs["label"].to_pylist()
            new = []
            for a, b, lab in zip(ids_a, ids_b, old):
                v = ground_truth.get(str((str(a), str(b))))
                new.append(int(v) if v is not None else lab)
            idx = data.pairs.schema.get_field_index("label")
            data.pairs = data.pairs.set_column(
                idx, "label", pa.array(new, pa.int64())
            )
        return benchmark


# ---------------------------------------------------------------------------
# schema-matching flavor (``benchmark/schema_matching/data.py:15-163``)
# ---------------------------------------------------------------------------


@dataclass
class Schema:
    """(``schema_matching/data.py:16-21``)"""

    name: str
    attributes: Dict[str, Any]
    metadata: Dict[str, Any] = field(default_factory=dict)


@dataclass
class AttributeMapping:
    """(``schema_matching/data.py:24-31``)"""

    source_attribute: str
    target_attribute: str
    is_match: Optional[bool] = None
    confidence: Optional[float] = None
    similarity_score: Optional[float] = None
    metadata: Dict[str, Any] = field(default_factory=dict)


@dataclass
class SchemaMatchingData:
    """(``schema_matching/data.py:34-52``) — list views over the mappings."""

    schemas: List[Schema]
    mappings: List[AttributeMapping]
    metadata: Dict[str, Any] = field(default_factory=dict)

    def get_matches(self) -> List[AttributeMapping]:
        return [m for m in self.mappings if m.is_match is True]

    def get_non_matches(self) -> List[AttributeMapping]:
        return [m for m in self.mappings if m.is_match is False]

    def get_unlabeled(self) -> List[AttributeMapping]:
        return [m for m in self.mappings if m.is_match is None]


class SchemaMatchingBenchmark(Benchmark):
    """(``schema_matching/data.py:55-163``)"""

    def __init__(self, config: BenchmarkConfig):
        super().__init__(config)
        self.matching_data: Dict[SplitType, SchemaMatchingData] = {}

    def add_matching_data(
        self, split_type: SplitType, data: SchemaMatchingData
    ) -> None:
        self.matching_data[split_type] = data

    def get_matching_data(
        self, split_type: Optional[SplitType] = None
    ) -> Optional[SchemaMatchingData]:
        if split_type is not None:
            return self.matching_data.get(split_type)
        schemas: List[Schema] = []
        mappings: List[AttributeMapping] = []
        for data in self.matching_data.values():
            schemas.extend(data.schemas)
            mappings.extend(data.mappings)
        return SchemaMatchingData(schemas=schemas, mappings=mappings)

    def get_ground_truth(self, split_type: Optional[SplitType] = None) -> Dict[str, Any]:
        datas = (
            [self.matching_data[split_type]]
            if split_type is not None and split_type in self.matching_data
            else ([] if split_type is not None else list(self.matching_data.values()))
        )
        out: Dict[str, Any] = {}
        for data in datas:
            for m in data.mappings:
                out[str((m.source_attribute, m.target_attribute))] = m.is_match
        return out

    def get_metadata(self) -> Dict[str, Any]:
        meta = super().get_metadata()
        meta["num_splits"] = len(self.matching_data)
        meta["total_schemas"] = sum(len(d.schemas) for d in self.matching_data.values())
        meta["total_mappings"] = sum(
            len(d.mappings) for d in self.matching_data.values()
        )
        return meta


class SchemaMatchingEvaluator:
    """(``schema_matching/eval.py:19-84``) — data-characteristic metrics."""

    def evaluate_benchmark(self, benchmark: SchemaMatchingBenchmark) -> EvaluationResult:
        metrics: Dict[str, Any] = {}
        statistics: Dict[str, Any] = {}
        totals = dict.fromkeys(
            ("total_schemas", "total_mappings", "total_matches",
             "total_non_matches", "total_unlabeled"), 0
        )
        n_attrs = 0
        for split_type, data in benchmark.matching_data.items():
            m, nm, ul = (
                len(data.get_matches()),
                len(data.get_non_matches()),
                len(data.get_unlabeled()),
            )
            statistics[f"{split_type.value}_schemas"] = len(data.schemas)
            statistics[f"{split_type.value}_mappings"] = len(data.mappings)
            statistics[f"{split_type.value}_matches"] = m
            statistics[f"{split_type.value}_non_matches"] = nm
            statistics[f"{split_type.value}_unlabeled"] = ul
            totals["total_schemas"] += len(data.schemas)
            totals["total_mappings"] += len(data.mappings)
            totals["total_matches"] += m
            totals["total_non_matches"] += nm
            totals["total_unlabeled"] += ul
            n_attrs += sum(len(s.attributes) for s in data.schemas)
        metrics.update(totals)
        if totals["total_mappings"]:
            tm = totals["total_mappings"]
            metrics["match_ratio"] = totals["total_matches"] / tm
            metrics["non_match_ratio"] = totals["total_non_matches"] / tm
            metrics["unlabeled_ratio"] = totals["total_unlabeled"] / tm
        characteristics = {
            "num_splits": len(benchmark.matching_data),
            "avg_attributes_per_schema": (
                n_attrs / totals["total_schemas"] if totals["total_schemas"] else 0
            ),
        }
        return EvaluationResult(
            metrics=metrics,
            statistics=statistics,
            characteristics=characteristics,
            metadata={"benchmark_name": benchmark.config.name},
        )


# ---------------------------------------------------------------------------
# entity-fusion flavor (``benchmark/entity_fusion/data.py:15-167``) + the
# distributed fusion executor the reference only describes as rule data
# ---------------------------------------------------------------------------


@dataclass
class FusionRule:
    """(``entity_fusion/data.py:27-34``) — ``rule_type`` ∈ {max, min, avg,
    sum, first, concat}; ``parameters`` may carry ``sep`` for concat."""

    rule_id: str
    rule_type: str
    attribute: str
    parameters: Dict[str, Any] = field(default_factory=dict)
    metadata: Dict[str, Any] = field(default_factory=dict)


@dataclass
class FusionCluster:
    """(``entity_fusion/data.py:16-24`` ``EntityCluster``) — named
    FusionCluster here because the engine's ClusterManager already exports an
    entity-cluster shape; semantics match the reference's."""

    cluster_id: str
    entities: List[Entity]
    fused_entity: Optional[Entity] = None
    fusion_rules: Optional[List[Dict[str, Any]]] = None
    metadata: Dict[str, Any] = field(default_factory=dict)


@dataclass
class EntityFusionData:
    """(``entity_fusion/data.py:37-62``)"""

    clusters: List[FusionCluster]
    fusion_rules: Optional[List[FusionRule]] = None
    fused_entities: Optional[List[Entity]] = None
    metadata: Dict[str, Any] = field(default_factory=dict)

    def get_cluster_by_id(self, cluster_id: str) -> Optional[FusionCluster]:
        for c in self.clusters:
            if c.cluster_id == cluster_id:
                return c
        return None

    def get_clusters_with_fused(self) -> List[FusionCluster]:
        return [c for c in self.clusters if c.fused_entity is not None]

    def get_clusters_without_fused(self) -> List[FusionCluster]:
        return [c for c in self.clusters if c.fused_entity is None]


class EntityFusionBenchmark(Benchmark):
    """(``entity_fusion/data.py:65-167``)"""

    def __init__(self, config: BenchmarkConfig):
        super().__init__(config)
        self.fusion_data: Dict[SplitType, EntityFusionData] = {}

    def add_fusion_data(self, split_type: SplitType, data: EntityFusionData) -> None:
        self.fusion_data[split_type] = data

    def get_fusion_data(
        self, split_type: Optional[SplitType] = None
    ) -> Optional[EntityFusionData]:
        if split_type is not None:
            return self.fusion_data.get(split_type)
        clusters: List[FusionCluster] = []
        for data in self.fusion_data.values():
            clusters.extend(data.clusters)
        return EntityFusionData(clusters=clusters)

    def get_metadata(self) -> Dict[str, Any]:
        meta = super().get_metadata()
        meta["num_splits"] = len(self.fusion_data)
        meta["total_clusters"] = sum(len(d.clusters) for d in self.fusion_data.values())
        return meta


class EntityFusionEvaluator:
    """(``entity_fusion/eval.py:19-82``) — data-characteristic metrics."""

    def evaluate_benchmark(self, benchmark: EntityFusionBenchmark) -> EvaluationResult:
        metrics: Dict[str, Any] = {}
        statistics: Dict[str, Any] = {}
        total_clusters = total_entities = total_fused = 0
        sizes: List[int] = []
        for split_type, data in benchmark.fusion_data.items():
            n_ent = sum(len(c.entities) for c in data.clusters)
            fused = len(data.get_clusters_with_fused())
            statistics[f"{split_type.value}_clusters"] = len(data.clusters)
            statistics[f"{split_type.value}_entities"] = n_ent
            statistics[f"{split_type.value}_fused"] = fused
            total_clusters += len(data.clusters)
            total_entities += n_ent
            total_fused += fused
            sizes.extend(len(c.entities) for c in data.clusters)
        metrics["total_clusters"] = total_clusters
        metrics["total_entities"] = total_entities
        metrics["total_fused"] = total_fused
        if sizes:
            metrics["avg_cluster_size"] = sum(sizes) / len(sizes)
            metrics["min_cluster_size"] = min(sizes)
            metrics["max_cluster_size"] = max(sizes)
        if total_clusters:
            metrics["fusion_ratio"] = total_fused / total_clusters
        characteristics = {
            "num_splits": len(benchmark.fusion_data),
            "has_fusion_rules": any(
                d.fusion_rules is not None for d in benchmark.fusion_data.values()
            ),
        }
        return EvaluationResult(
            metrics=metrics,
            statistics=statistics,
            characteristics=characteristics,
            metadata={"benchmark_name": benchmark.config.name},
        )


def fuse_clusters(
    entities: "ray.data.Dataset",
    rules: Sequence[FusionRule],
    *,
    cluster_col: str = "cluster_id",
    id_col: str = "entity_id",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Distributed fusion executor: one fused row per cluster, each attribute
    reduced by its :class:`FusionRule` — the operational counterpart of the
    reference's rule *data* (``entity_fusion/data.py:27-34`` stores rules; no
    executor exists there).

    ``entities`` carries ``cluster_col``, ``id_col`` and one column per ruled
    attribute. One bucketed exchange on ``hash(cluster_id)``; inside each
    bucket rows are sorted by ``(cluster_id, entity_id)`` (deterministic
    ``first``/``concat`` order) and every rule is a vectorized segment
    reduction (``np.maximum/minimum/add.reduceat``; concat joins per segment).
    Supported ``rule_type``: max, min, avg, sum, first, concat
    (``parameters={"sep": ...}``, default ``" "``).
    """
    from odibel_ray.cdc.lww import _same_next_key_mask, bucket_of_keys

    rules = list(rules)
    known = {"max", "min", "avg", "sum", "first", "concat"}
    for r in rules:
        if r.rule_type not in known:
            raise ValueError(f"unknown fusion rule type {r.rule_type!r}")

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        return t.append_column(
            "_fb", pa.array(bucket_of_keys(t, [cluster_col], num_buckets))
        )

    def fuse_group(t: pa.Table) -> pa.Table:
        t = t.sort_by(
            [(cluster_col, "ascending"), (id_col, "ascending")]
        ).combine_chunks()
        same = _same_next_key_mask(t, [cluster_col])
        starts = np.flatnonzero(np.r_[True, ~same])
        counts = np.diff(np.r_[starts, len(t)])
        out: dict = {
            cluster_col: t[cluster_col].take(pa.array(starts)),
            "n_entities": pa.array(counts.astype(np.int64)),
        }
        for r in rules:
            col = t[r.attribute]
            if r.rule_type == "first":
                out[r.attribute] = col.take(pa.array(starts))
                continue
            if r.rule_type == "concat":
                vals = col.to_pylist()
                sep = r.parameters.get("sep", " ")
                out[r.attribute] = pa.array(
                    [
                        sep.join("" if v is None else str(v) for v in vals[s : s + c])
                        for s, c in zip(starts, counts)
                    ],
                    pa.string(),
                )
                continue
            x = col.to_numpy(zero_copy_only=False).astype(np.float64)
            if r.rule_type == "max":
                red = np.maximum.reduceat(x, starts)
            elif r.rule_type == "min":
                red = np.minimum.reduceat(x, starts)
            else:  # sum / avg
                red = np.add.reduceat(x, starts)
                if r.rule_type == "avg":
                    red = red / counts
            out[r.attribute] = pa.array(red)
        return pa.table(out)

    return (
        entities.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_fb")
        .map_groups(fuse_group, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# evaluator bridge
# ---------------------------------------------------------------------------


class EntityResolutionEvaluator:
    """(``entity_resolution/eval.py:20-88``) — data-characteristic metrics
    over an :class:`EntityResolutionBenchmark`, computed columnar per split."""

    def evaluate_benchmark(self, benchmark: EntityResolutionBenchmark) -> EvaluationResult:
        metrics: Dict[str, Any] = {}
        statistics: Dict[str, Any] = {}
        totals = {"total_pairs": 0, "total_matches": 0, "total_non_matches": 0, "total_unlabeled": 0}
        for split_type, data in benchmark.resolution_data.items():
            lab = data.pairs["label"]
            m = len(data.get_matches())
            nm = len(data.get_non_matches())
            ul = lab.null_count
            statistics[f"{split_type.value}_pairs"] = len(data)
            statistics[f"{split_type.value}_matches"] = m
            statistics[f"{split_type.value}_non_matches"] = nm
            statistics[f"{split_type.value}_unlabeled"] = ul
            totals["total_pairs"] += len(data)
            totals["total_matches"] += m
            totals["total_non_matches"] += nm
            totals["total_unlabeled"] += ul
        metrics.update(totals)
        if totals["total_pairs"]:
            tp = totals["total_pairs"]
            metrics["match_ratio"] = totals["total_matches"] / tp
            metrics["non_match_ratio"] = totals["total_non_matches"] / tp
            metrics["unlabeled_ratio"] = totals["total_unlabeled"] / tp
        characteristics = {
            "num_splits": len(benchmark.resolution_data),
            "has_clusters": any(
                d.entity_clusters is not None for d in benchmark.resolution_data.values()
            ),
            "has_features": any(
                d.features is not None for d in benchmark.resolution_data.values()
            ),
        }
        return EvaluationResult(
            metrics=metrics,
            statistics=statistics,
            characteristics=characteristics,
            metadata={"benchmark_name": benchmark.config.name},
        )

    def evaluate_resolution_data(self, data: EntityResolutionData) -> EvaluationResult:
        n = len(data)
        m, nm = len(data.get_matches()), len(data.get_non_matches())
        ul = data.pairs["label"].null_count
        metrics: Dict[str, Any] = {
            "total_pairs": n, "matches": m, "non_matches": nm, "unlabeled": ul
        }
        if n:
            metrics.update(
                match_ratio=m / n, non_match_ratio=nm / n, unlabeled_ratio=ul / n
            )
        characteristics = {
            "has_clusters": data.entity_clusters is not None,
            "has_features": data.features is not None,
            "num_clusters": len(data.entity_clusters) if data.entity_clusters else 0,
        }
        return EvaluationResult(
            metrics=metrics, characteristics=characteristics, metadata=data.metadata
        )
