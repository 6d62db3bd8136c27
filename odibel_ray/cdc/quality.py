"""Data-quality expectations (CHECK constraints) on generic published tables.

The reference validates inputs ad hoc inside each extraction (malformed
events are skipped row-by-row in the Scala replay loop); a lake table wants
the invariant attached to the TABLE so every writer enforces it — Delta's
``ALTER TABLE ADD CONSTRAINT`` CHECK semantics:

- ``set_expectations(out_dir, [["score", ">=", 0.0], ["role", "in", [...]]])``
  persists the conjunctive predicate in ``_expectations.json``;
- every subsequent ``upsert_published`` validates its update rows FIRST (one
  vectorized pre-pass, before anything stages) and fails the whole write
  with a violation count if any row breaks a clause — never a partial
  apply; ``publish_dataset(expect=…)`` installs the constraint and
  validates the initial load batch-by-batch;
- SQL CHECK null semantics: a clause evaluating to NULL PASSES (unknown is
  not a violation) — unlike a WHERE, which drops NULL rows.

Ops are the sink predicate vocabulary (``== != < <= > >= in not_in is_null
not_null``); clauses reference logical column names and are re-validated
against the current logical schema when set.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EXPECTATIONS_FILE = "_expectations.json"


def _path(out_dir: str) -> str:
    return os.path.join(out_dir, EXPECTATIONS_FILE)


def get_expectations(out_dir: str) -> list[list]:
    p = _path(out_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)["where"]


def set_expectations(out_dir: str, where: list) -> dict:
    """Attach (replace) the table's CHECK constraint. Validates clause shape
    and column existence against the current logical schema, and checks the
    CURRENT rows satisfy it (a constraint the table already violates is
    refused, like ADD CONSTRAINT on a dirty table)."""
    from odibel_ray.cdc.skipping import check_where
    from odibel_ray.cdc.sink import _atomic_write_json, read_published

    where = [list(c) for c in check_where(where)]
    cols = {c for c, _, _ in where}
    ds = read_published(out_dir, columns=sorted(cols))
    bad = violation_count(ds, where)
    if bad:
        raise ValueError(
            f"table already violates the expectation ({bad} row(s)); "
            "clean it first or relax the clauses"
        )
    _atomic_write_json(_path(out_dir), {"where": where})
    return {"clauses": len(where)}


def drop_expectations(out_dir: str) -> None:
    p = _path(out_dir)
    if os.path.exists(p):
        os.remove(p)


def check_mask(t: pa.Table, where: list) -> pa.Array:
    """True where the row SATISFIES every clause under SQL CHECK null
    semantics (a NULL comparison passes — unknown is not a violation)."""
    ok = np.ones(len(t), dtype=bool)
    for col, op, val in where:
        c = t[col]
        if op == "==":
            m = pc.equal(c, val)
        elif op == "!=":
            m = pc.not_equal(c, val)
        elif op == "<":
            m = pc.less(c, val)
        elif op == "<=":
            m = pc.less_equal(c, val)
        elif op == ">":
            m = pc.greater(c, val)
        elif op == ">=":
            m = pc.greater_equal(c, val)
        elif op == "in":
            m = pc.if_else(pc.is_valid(c), pc.is_in(c, value_set=pa.array(val)), None)
        elif op == "not_in":
            m = pc.if_else(
                pc.is_valid(c), pc.invert(pc.is_in(c, value_set=pa.array(val))), None
            )
        elif op == "is_null":
            m = pc.is_null(c)
        else:  # not_null — the one clause NULL must NOT satisfy
            m = pc.is_valid(c)
        # CHECK: NULL passes
        ok &= pc.fill_null(m, True).to_numpy(zero_copy_only=False)
    return pa.array(ok)


def violation_count(ds, where: list, batch_size: int = 65536) -> int:
    """Vectorized violation count over a Dataset (one streaming pass)."""
    if not where:
        return 0

    def count(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        bad = len(t) - pc.sum(check_mask(t, where)).as_py()
        return pa.table({"bad": pa.array([int(bad)], pa.int64())})

    parts = ds.map_batches(count, batch_format="pyarrow", batch_size=batch_size)
    agg = parts.sum("bad")
    return int(agg or 0)


def enforce_batch(t: pa.Table, where: list, *, context: str) -> pa.Table:
    """Raise if any row of this batch violates the constraint (used on the
    initial-load path where the table doesn't exist yet)."""
    if not where or len(t) == 0:
        return t
    ok = check_mask(t, where)
    bad = len(t) - pc.sum(ok).as_py()
    if bad:
        first = t.filter(pc.invert(ok)).slice(0, 1).to_pylist()
        raise ValueError(
            f"{context}: {bad} row(s) violate the table expectation "
            f"{where}; first offender: {first}"
        )
    return t
