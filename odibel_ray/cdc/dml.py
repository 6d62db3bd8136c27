"""Predicate DML over generic published tables: DELETE FROM / UPDATE.

The reference has no in-place mutation at all — every curated output is
recomputed from scratch by re-running a full extraction job (each
``eval/*.scala`` re-reads the whole TKG; corrections re-run
``transform/TKGModelMgr.scala``). A lakehouse engine needs the Delta/Iceberg
row-level DML surface instead: ``DELETE FROM t WHERE p`` and
``UPDATE t SET c = e WHERE p`` that touch only the data the predicate
selects.

Both operations are two bounded stages, never O(table):

1. **Find** — :func:`~odibel_ray.cdc.sink.read_published` with the same
   conjunctive ``where`` spec the reader pushes down: zone-map file pruning,
   row-group pruning and a scan-level row filter, so only candidate files are
   opened and only matching rows leave storage. DELETE scans just the key
   columns.
2. **Write** — the matching rows feed
   :func:`~odibel_ray.cdc.sink.upsert_published`, which rewrites only the
   buckets containing touched keys (copy-on-write) or stages per-bucket
   deltas (``mode="mor"``), under the same write-audit-publish atomicity,
   idempotent-resume, expectations, snapshot and change-feed machinery as
   every other write.

SQL semantics: the predicate uses SQL ``WHERE`` NULL rules — a NULL clause
fails, so ``DELETE ... WHERE score < 0.3`` keeps NULL-score rows, exactly
like the SQL statement. ``UPDATE`` assignments are literals or single-column
scalar derivations (the :mod:`~odibel_ray.cdc.derived` function set); key
columns cannot be assigned (SQL engines reject primary-key UPDATE the same
way — model it as delete + insert).
"""

from __future__ import annotations

import json
import os
from typing import Mapping, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from odibel_ray.cdc.derived import _FNS, _derive_col

_BATCH = 65536


def _layout_keys(out_dir: str) -> list[str]:
    path = os.path.join(out_dir, "_layout.json")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{out_dir} is not a generic published table (no _layout.json); "
            "DML targets publish_dataset tables — transcript tables mutate "
            "through their change log (incremental_apply with D events)"
        )
    with open(path) as f:
        return list(json.load(f)["key_cols"])


def delete_published(
    out_dir: str,
    where: Sequence[Sequence],
    *,
    run_id: str = "delete-0",
    mode: str = "cow",
    feed_dir: str | None = None,
    feed_values: list[str] | None = None,
    metrics: str | None = None,
    batch_size: int = _BATCH,
) -> dict:
    """``DELETE FROM <out_dir> WHERE <where>``.

    ``where`` is the reader's conjunctive predicate spec
    (``[(col, op, value), ...]``; ops ``== != < <= > >= in not_in is_null
    not_null``) with SQL NULL semantics — rows where the predicate is NULL
    survive, as in SQL. The key-only matching scan is zone-map pruned, so
    on a clustered/z-ordered-correlated predicate whole files are skipped.

    Returns the :func:`upsert_published` result dict plus ``rows_deleted``.
    Idempotent: re-running deletes nothing new and publishes no new version
    state beyond the no-op write.
    """
    from odibel_ray.cdc.sink import read_published, upsert_published

    if not where:
        raise ValueError(
            "refusing DELETE with an empty predicate (would truncate the "
            "table); pass an explicit always-true clause if you mean it"
        )
    keys = _layout_keys(out_dir)
    matching = read_published(out_dir, where=list(where), columns=keys)
    n = matching.count()
    if n == 0:
        return {"rows_deleted": 0, "buckets_rewritten": 0, "run_id": run_id}
    res = upsert_published(
        None,
        out_dir,
        deletes=matching,
        run_id=run_id,
        mode=mode,
        feed_dir=feed_dir,
        feed_values=feed_values,
        metrics=metrics,
        batch_size=batch_size,
    )
    res["rows_deleted"] = n
    return res


def _check_assignments(
    assign: Mapping, keys: Sequence[str], columns: Sequence[str]
) -> dict:
    if not assign:
        raise ValueError("UPDATE needs at least one SET assignment")
    out = {}
    for col, expr in assign.items():
        if col in keys:
            raise ValueError(
                f"cannot UPDATE key column {col!r}; model a key change as "
                "delete + insert"
            )
        if col not in columns:
            raise ValueError(f"unknown column {col!r} (have {list(columns)})")
        if isinstance(expr, tuple):
            fn, src = expr
            if fn not in _FNS:
                raise ValueError(f"unsupported SET function {fn!r} (have {sorted(_FNS)})")
            if src not in columns:
                raise ValueError(f"SET source column {src!r} not in table")
            out[col] = ("fn", fn, src)
        else:
            out[col] = ("lit", expr)
    return out


def update_published(
    out_dir: str,
    assign: Mapping,
    where: Sequence[Sequence],
    *,
    run_id: str = "update-0",
    mode: str = "cow",
    feed_dir: str | None = None,
    feed_values: list[str] | None = None,
    metrics: str | None = None,
    batch_size: int = _BATCH,
) -> dict:
    """``UPDATE <out_dir> SET <assign> WHERE <where>``.

    ``assign`` maps column → new value: a literal scalar, or a
    ``(fn, src_col)`` tuple applying one of the derived-table scalar
    functions (``len | lower | upper | abs``) to a source column of the
    same row. Assigned values cast to the column's existing type — a
    lossy/invalid literal fails the whole statement before anything stages.
    ``where`` as in :func:`delete_published`; an empty predicate is allowed
    here (SQL ``UPDATE`` without ``WHERE`` is well-defined) but still pays
    only O(table scan) + O(touched buckets).

    Returns the :func:`upsert_published` result dict plus ``rows_updated``.
    """
    from odibel_ray.cdc.sink import read_published, upsert_published

    keys = _layout_keys(out_dir)
    matching = read_published(out_dir, where=list(where) or None)
    schema = matching.schema()
    columns = list(schema.names)
    assigns = _check_assignments(assign, keys, columns)
    types = {n: t for n, t in zip(schema.names, schema.types)}

    def apply_set(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        cols = {}
        for name in t.column_names:
            if name not in assigns:
                cols[name] = t[name]
                continue
            spec = assigns[name]
            if spec[0] == "lit":
                val = pa.scalar(spec[1]).cast(types[name])
                cols[name] = pa.repeat(val, len(t))
            else:
                cols[name] = pc.cast(_derive_col(t, spec[1], spec[2]), types[name])
        return pa.table(cols)

    updates = matching.map_batches(
        apply_set, batch_format="pyarrow", batch_size=batch_size
    )
    # row count from a keys-only scan (same pruning, narrowest projection)
    # rather than re-executing the full transform
    n = read_published(out_dir, where=list(where) or None, columns=keys).count()
    if n == 0:
        return {"rows_updated": 0, "buckets_rewritten": 0, "run_id": run_id}
    res = upsert_published(
        updates,
        out_dir,
        run_id=run_id,
        mode=mode,
        feed_dir=feed_dir,
        feed_values=feed_values,
        metrics=metrics,
        batch_size=batch_size,
    )
    res["rows_updated"] = n
    return res
