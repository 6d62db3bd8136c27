"""Relational / analytic operator library over ``ray.data.Dataset``.

Re-expresses the reference's operator surface (SURVEY.md §2.4-2.8) Ray-Data-first:
broadcast-side joins for small build sides, task-based bucketed joins for
large-large, hash-shuffle dedup, deterministic sampling, per-group top-k,
time-bucketed and two-level aggregations, plus mergeable sketches
(HyperLogLog distinct counts, heavy-hitter detection) for corpus-scale
profiling.
"""

from odibel_ray.ops.relational import (
    broadcast_anti_join,
    broadcast_hash_join,
    broadcast_semi_join,
    bucketed_join,
    deterministic_sample,
    exact_dedup,
    load_table,
    rarity_first_sample,
    topk,
    topk_per_group,
)
from odibel_ray.ops.sketches import approx_count_distinct, approx_heavy_hitters

__all__ = [
    "approx_count_distinct",
    "approx_heavy_hitters",
    "broadcast_anti_join",
    "broadcast_hash_join",
    "broadcast_semi_join",
    "bucketed_join",
    "deterministic_sample",
    "exact_dedup",
    "load_table",
    "rarity_first_sample",
    "topk",
    "topk_per_group",
]
