"""Benchmark-data evaluator suite (SURVEY.md §2.5 A17) — the reference's
``benchmark/entity_resolution/eval.py:30-173``, ``entity_fusion/eval.py`` and
``schema_matching/eval.py`` metrics, re-expressed as distributed Ray Data
aggregations over labeled-pair / cluster / schema-change tables, plus the
object-level ``Evaluator`` surface (``api/evaluation.py:35-122``) for entity
lists.

All metrics here describe the DATA (match ratios, missing values, cluster
sizes), not task results — the reference's explicit framing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Any, Dict, List, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

from odibel_ray.entity import Entity


# ---------------------------------------------------------------------------
# ER pair generation (blocking) + pair-distribution metrics
# ---------------------------------------------------------------------------


def er_blocking_pairs(
    docs: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_prefix: int = 5,
    unlabeled_mod: int = 5,
) -> "ray.data.Dataset":
    """Candidate entity pairs by prefix blocking: documents sharing the same
    first-``n_prefix``-token key form a block; every in-block pair is emitted
    with ``label`` = 1 (exact text match), 0 (differs), or null (unlabeled —
    the deterministic ``(id_a + id_b) % unlabeled_mod == 0`` holdout rule, so
    the label distribution is SQL-replicable).

    Scale shape: one shuffle on the blocking key; pair fan-out is quadratic
    *within a block only* — blocking keys must be selective (the point of
    blocking-based ER).
    """

    def derive(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        toks = pc.split_pattern(t[text_col], pattern=" ")
        key = pc.binary_join(pc.list_slice(toks, 0, n_prefix), " ")
        return pa.table({id_col: t[id_col], text_col: t[text_col], "block_key": key})

    def pairs(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        n = len(t)
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "block_key": pa.array([], pa.string()),
                "label": pa.array([], pa.int64()),
            }
        )
        if n < 2:
            return empty
        order = np.argsort(t[id_col].to_numpy(zero_copy_only=False), kind="stable")
        t = t.take(pa.array(order))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        texts = t[text_col]
        ia, ib = np.triu_indices(n, k=1)
        same = pc.equal(texts.take(pa.array(ia)), texts.take(pa.array(ib)))
        label = same.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)
        unlabeled = (ids[ia] + ids[ib]) % unlabeled_mod == 0
        return pa.table(
            {
                "id_a": pa.array(ids[ia]),
                "id_b": pa.array(ids[ib]),
                "block_key": pa.array([t["block_key"][0].as_py()] * len(ia), pa.string()),
                "label": pa.array(label, mask=unlabeled),
            }
        )

    keyed = docs.map_batches(derive, batch_format="pyarrow")
    return keyed.groupby("block_key").map_groups(pairs, batch_format="pyarrow")


def er_pair_stats(
    pairs: "ray.data.Dataset", label_col: str = "label"
) -> pa.Table:
    """Pair-distribution metrics (``entity_resolution/eval.py:30-80``):
    total/match/non-match/unlabeled counts and ratios — one streaming
    aggregate, one output row."""
    from ray.data.aggregate import Sum

    def derive(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        lab = t[label_col]
        return pa.table(
            {
                "m": pc.cast(pc.fill_null(pc.equal(lab, 1), False), pa.int64()),
                "nm": pc.cast(pc.fill_null(pc.equal(lab, 0), False), pa.int64()),
                "ul": pc.cast(pc.is_null(lab), pa.int64()),
            }
        )

    agg = pairs.map_batches(derive, batch_format="pyarrow").aggregate(
        Sum("m", alias_name="matches"),
        Sum("nm", alias_name="non_matches"),
        Sum("ul", alias_name="unlabeled"),
    ) or {}  # Dataset.aggregate returns None on an empty dataset
    m, nm, ul = (
        int(agg.get(k) or 0) for k in ("matches", "non_matches", "unlabeled")
    )
    total = m + nm + ul
    d = max(total, 1)
    return pa.table(
        {
            "total_pairs": pa.array([total], pa.int64()),
            "matches": pa.array([m], pa.int64()),
            "non_matches": pa.array([nm], pa.int64()),
            "unlabeled": pa.array([ul], pa.int64()),
            "match_ratio": pa.array([round(m / d, 6)]),
            "non_match_ratio": pa.array([round(nm / d, 6)]),
            "unlabeled_ratio": pa.array([round(ul / d, 6)]),
        }
    )


# ---------------------------------------------------------------------------
# missing-value / data-profile metrics
# ---------------------------------------------------------------------------


def missing_value_profile(
    ds: "ray.data.Dataset", cols: Sequence[str]
) -> "ray.data.Dataset":
    """Per-property missing-value counts (``entity_resolution/eval.py:117-135``
    characteristics), as a long-format aggregate: one row per property with
    ``n_missing`` / ``n_present``. Per-batch null counts are combined by a
    (num-properties)-row groupby — the reference loops entities per property."""
    from ray.data.aggregate import Sum

    cols = list(cols)

    def counts(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        miss = [t[c].null_count for c in cols]
        return pa.table(
            {
                "property": pa.array(cols, pa.string()),
                "n_missing": pa.array(miss, pa.int64()),
                "n_present": pa.array([len(t) - m for m in miss], pa.int64()),
            }
        )

    return (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("property")
        .aggregate(
            Sum("n_missing", alias_name="n_missing"),
            Sum("n_present", alias_name="n_present"),
        )
    )


# ---------------------------------------------------------------------------
# cluster statistics (entity-fusion evaluator)
# ---------------------------------------------------------------------------


def cluster_size_stats(
    ds: "ray.data.Dataset", key_col: str, *, min_size: int = 2
) -> pa.Table:
    """Cluster statistics (``entity_fusion/eval.py:100-150``): clusters =
    groups of ``key_col`` with at least ``min_size`` members; reports count,
    total entities, avg/min/max size. One groupby + one tiny aggregate."""
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    sizes = ds.groupby(key_col).aggregate(Count(alias_name="sz")).filter(
        expr=f"sz >= {int(min_size)}"
    )
    agg = sizes.aggregate(
        Count(alias_name="total_clusters"),
        Sum("sz", alias_name="total_entities"),
        Mean("sz", alias_name="avg_cluster_size"),
        Min("sz", alias_name="min_cluster_size"),
        Max("sz", alias_name="max_cluster_size"),
    ) or {}  # Dataset.aggregate returns None on an empty dataset
    return pa.table(
        {
            "total_clusters": pa.array([int(agg.get("total_clusters") or 0)], pa.int64()),
            "total_entities": pa.array([int(agg.get("total_entities") or 0)], pa.int64()),
            "avg_cluster_size": pa.array([round(float(agg.get("avg_cluster_size") or 0), 6)]),
            "min_cluster_size": pa.array([int(agg.get("min_cluster_size") or 0)], pa.int64()),
            "max_cluster_size": pa.array([int(agg.get("max_cluster_size") or 0)], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# schema-matching metrics (over the change log's SCHEMA events)
# ---------------------------------------------------------------------------


def schema_change_stats(log_dir: str) -> "ray.data.Dataset":
    """Schema-mapping distribution (``schema_matching/eval.py:30-90`` re-read
    over the CDC log): per change kind (add_column / rename_column / …), how
    many SCHEMA events and how many WAL partitions carry one."""
    import ray.data as rd

    ds = rd.read_parquet(log_dir).filter(expr="op == 'S'")

    def kinds(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        m = pc.extract_regex(t["schema_change"], pattern=r'"kind":\s*"(?P<kind>[a-z_]+)"')
        return pa.table(
            {
                "kind": pc.struct_field(m, "kind"),
                "part": pc.cast(t["part"], pa.int64()),
            }
        )

    def stats(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        parts = t["part"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "kind": pa.array([t["kind"][0].as_py()], pa.string()),
                "n_changes": pa.array([len(t)], pa.int64()),
                "n_parts": pa.array([len(np.unique(parts))], pa.int64()),
            }
        )

    return ds.map_batches(kinds, batch_format="pyarrow").groupby("kind").map_groups(
        stats, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# object-level evaluator (API parity with api/evaluation.py:35-122)
# ---------------------------------------------------------------------------


@dataclass
class EvaluationResult:
    """(``api/evaluation.py:18-24``)"""

    metrics: Dict[str, Any] = field(default_factory=dict)
    statistics: Dict[str, Any] = field(default_factory=dict)
    characteristics: Dict[str, Any] = field(default_factory=dict)
    metadata: Dict[str, Any] = field(default_factory=dict)


class EntityEvaluator:
    """Entity-list evaluator (``entity_resolution/eval.py:95-135``): property
    coverage statistics + missing-value characteristics for in-memory entity
    collections (the columnar paths above are the at-scale equivalents)."""

    def get_statistics(self, entities: List[Entity]) -> Dict[str, Any]:
        if not entities:
            return {}
        with_props = sum(1 for e in entities if e.get_properties())
        return {
            "total_entities": len(entities),
            "entities_with_properties": with_props,
            "entities_without_properties": len(entities) - with_props,
        }

    def get_characteristics(self, entities: List[Entity]) -> Dict[str, Any]:
        if not entities:
            return {}
        all_props: list[str] = []
        for e in entities:
            for k in e.get_properties():
                if k not in all_props:
                    all_props.append(k)
        missing = {
            p: sum(1 for e in entities if not e.has_property(p)) for p in all_props
        }
        return {
            "unique_properties": len(all_props),
            "property_names": all_props,
            "missing_value_counts": missing,
        }

    def evaluate_entities(self, entities: List[Entity]) -> EvaluationResult:
        return EvaluationResult(
            statistics=self.get_statistics(entities),
            characteristics=self.get_characteristics(entities),
        )

    def evaluate_pairs(self, pairs: Sequence) -> EvaluationResult:
        """Pair-list twin of :func:`er_pair_stats` for in-memory data."""
        m = sum(1 for p in pairs if p.label == 1)
        nm = sum(1 for p in pairs if p.label == 0)
        ul = sum(1 for p in pairs if p.label is None)
        total = len(pairs)
        metrics = {"total_pairs": total, "matches": m, "non_matches": nm, "unlabeled": ul}
        if total:
            metrics.update(
                match_ratio=m / total, non_match_ratio=nm / total, unlabeled_ratio=ul / total
            )
        return EvaluationResult(metrics=metrics)
