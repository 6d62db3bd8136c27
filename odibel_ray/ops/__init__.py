"""Relational / analytic operator library over ``ray.data.Dataset``.

Re-expresses the reference's operator surface (SURVEY.md §2.4-2.8) Ray-Data-first:
broadcast-side joins instead of shuffle joins for small build sides, hash-shuffle
dedup, deterministic sampling, per-group top-k, time-bucketed and two-level
aggregations.
"""

from odibel_ray.ops.relational import (
    broadcast_anti_join,
    broadcast_hash_join,
    broadcast_semi_join,
    deterministic_sample,
    exact_dedup,
    load_table,
    topk,
    topk_per_group,
)

__all__ = [
    "broadcast_anti_join",
    "broadcast_hash_join",
    "broadcast_semi_join",
    "deterministic_sample",
    "exact_dedup",
    "load_table",
    "topk",
    "topk_per_group",
]
