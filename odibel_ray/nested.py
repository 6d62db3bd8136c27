"""Nested Arrow types as first-class pipeline data (SURVEY.md §1.2).

The reference carries nested records through its pipelines —
``RevisionTemplateInfo(pId, rId, templates: List[(String,String,String)])``
(``/root/reference/src/main/scala/ai/scads/odibel/datasets/wikitext/data/RevisionTemplateInfo.scala:3``)
— i.e. a row whose payload is a *list of structs*. This module gives the
engine the same capability over zero-copy Arrow:

- :func:`nest_turns` — conversation assembly: flat per-turn rows →
  one row per ``conv_id`` with ``turns: list<struct<turn_idx, role, text, …>>``
  (ONE key shuffle; the per-bucket kernel is run-length vectorized, no
  per-conversation Python loop). The natural feed for whole-conversation
  consumers (training-sample packing, conversation-level scoring).
- :func:`unnest_turns` — the inverse, a streaming ``map_batches`` explode via
  ``pc.list_flatten`` (no shuffle).
- :func:`extract_templates_nested` — the reference's exact shape: row-count
  preserved, templates as ``list<struct<name, body>>`` per row.
- :func:`unify_to_schema` — Arrow schema unification inside ``map_batches``
  extended to NESTED columns: files written before a struct gained a field
  are widened with null-filled struct children, so old and new nested files
  union into one pipeline (the schema-evolution rule, applied one level
  down).

Nested columns round-trip through Parquet (``write_parquet`` →
``read_parquet``) unchanged — ``tests/test_nested.py`` pins the full cycle
including evolution.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

DEFAULT_TURN_COLS = ("turn_idx", "role", "text", "tool_name", "score", "ts")


def _single_chunk(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):  # older pyarrow returns ChunkedArray
            return col.chunk(0) if col.num_chunks else pa.array([], col.type)
    return col


def nest_turns(
    ds: "ray.data.Dataset",
    *,
    turn_cols: Sequence[str] = DEFAULT_TURN_COLS,
    num_buckets: int | None = None,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Assemble flat per-turn rows into one row per conversation with a
    ``turns: list<struct<...>>`` column (ordered by ``turn_idx``) plus
    ``n_turns``.

    One hash shuffle on ``conv_id`` (same bucket function as every keyed
    exchange in the engine); inside a bucket the kernel sorts once and builds
    the list column from run-length offsets — O(rows) Arrow ops, zero
    per-conversation Python. At 100 TB a conversation is bounded (thousands
    of turns), so the nested row stays worker-sized even when the table
    doesn't."""
    from odibel_ray.tuning import default_num_buckets

    num_buckets = default_num_buckets(num_buckets)
    from odibel_ray.cdc.lww import bucket_of_keys

    turn_cols = list(turn_cols)

    def tag(t: pa.Table) -> pa.Table:
        b = bucket_of_keys(t, ["conv_id"], num_buckets)
        return t.append_column("_nbucket", pa.array(b, pa.int64()))

    def assemble(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        g = g.take(
            pc.sort_indices(
                g,
                sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")],
            )
        )
        n = len(g)
        if n == 0:
            struct_t = pa.struct(
                [pa.field(c, g.schema.field(c).type) for c in turn_cols]
            )
            return pa.table(
                {
                    "conv_id": pa.array([], g.schema.field("conv_id").type),
                    "n_turns": pa.array([], pa.int64()),
                    "turns": pa.array([], pa.list_(struct_t)),
                }
            )
        conv = _single_chunk(g["conv_id"])
        neq = np.ones(n, dtype=bool)
        if n > 1:
            eq = pc.equal(conv.slice(1), conv.slice(0, n - 1))
            neq[1:] = ~pc.fill_null(eq, False).to_numpy(zero_copy_only=False)
        starts = np.nonzero(neq)[0]
        lens = np.diff(np.concatenate((starts, [n])))
        offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
        struct_arr = pa.StructArray.from_arrays(
            [_single_chunk(g[c]) for c in turn_cols], names=turn_cols
        )
        turns = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), struct_arr
        )
        return pa.table(
            {
                "conv_id": conv.take(pa.array(starts)),
                "n_turns": pa.array(lens.astype(np.int64)),
                "turns": turns,
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=batch_size)
    return tagged.groupby("_nbucket").map_groups(
        lambda g: assemble(g.drop_columns(["_nbucket"])), batch_format="pyarrow"
    )


def unnest_turns(
    ds: "ray.data.Dataset",
    *,
    list_col: str = "turns",
    drop: Sequence[str] = (),
    batch_size: int = 8192,
) -> "ray.data.Dataset":
    """Inverse of :func:`nest_turns`: explode ``list<struct>`` back to flat
    rows — a pure streaming ``map_batches`` (``pc.list_flatten`` +
    parent-key repeat), no shuffle, no per-row Python. Non-list parent
    columns repeat onto every exploded row; list ``drop`` to omit some."""

    def explode(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        lst = _single_chunk(t[list_col])
        # null list rows explode to zero rows: pc.list_flatten drops null
        # slots, so a 0 length keeps parent repeats aligned with the flat
        # values (unify_to_schema produces all-null list columns for old
        # files that predate the column)
        lens = (
            pc.fill_null(pc.list_value_length(lst), 0)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        flat = pc.list_flatten(lst)
        idx = pa.array(np.repeat(np.arange(len(t), dtype=np.int64), lens))
        cols: dict = {}
        for name in t.column_names:
            if name == list_col or name in drop:
                continue
            cols[name] = _single_chunk(t[name]).take(idx)
        for field in lst.type.value_type:
            cols[field.name] = pc.struct_field(flat, field.name)
        return pa.table(cols)

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=batch_size)


def extract_templates_nested(
    ds: "ray.data.Dataset",
    prefix: str = "",
    *,
    concurrency: int | None = None,
    batch_size: int = 8192,
) -> "ray.data.Dataset":
    """Row-count-preserving template extraction: each input row gains
    ``templates: list<struct<name, body>>`` — the reference's
    ``RevisionTemplateInfo`` record shape (``data/RevisionTemplateInfo.scala:3``)
    instead of the exploded ``extract_templates`` rows. Actor pool: the brace
    parser state compiles once per actor; width defaults cluster-derived like
    every other actor-pool stage (:func:`odibel_ray.tuning.default_pool_size`)."""
    from odibel_ray.text import TemplateExtractor
    from odibel_ray.tuning import default_pool_size

    concurrency = default_pool_size(concurrency)

    class NestedTemplates(TemplateExtractor):
        def __call__(self, t: pa.Table) -> pa.Table:  # type: ignore[override]
            t = t.combine_chunks()
            has = pc.match_substring(t["text"], "{{").to_numpy(
                zero_copy_only=False
            )
            texts = t["text"].to_pylist()
            names: list[str] = []
            bodies: list[str] = []
            lens = np.zeros(len(t), dtype=np.int64)
            for i, (s, h) in enumerate(zip(texts, has)):
                if not h or not s:
                    continue
                found = self._extract(s)
                lens[i] = len(found)
                for body in found:
                    names.append(body.split("|", 1)[0].strip())
                    bodies.append(body)
            struct_arr = pa.StructArray.from_arrays(
                [pa.array(names, pa.string()), pa.array(bodies, pa.string())],
                names=["name", "body"],
            )
            offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
            tpl = pa.LargeListArray.from_arrays(
                pa.array(offsets, pa.int64()), struct_arr
            )
            return t.append_column("templates", tpl)

    return ds.map_batches(
        NestedTemplates,
        fn_constructor_kwargs={"prefix": prefix},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


def _widen_array(arr: pa.Array, target: pa.DataType) -> pa.Array:
    """Cast ``arr`` to ``target``, null-filling struct fields the source
    lacks (recursively; list element types too). Plain ``Table.cast`` fails
    on missing struct children — this is the nested half of Arrow schema
    unification."""
    src = arr.type
    if src.equals(target):
        return arr
    if pa.types.is_struct(target):
        if not pa.types.is_struct(src):
            return arr.cast(target)
        children = []
        for field in target:
            idx = src.get_field_index(field.name)
            if idx >= 0:
                children.append(_widen_array(arr.field(field.name), field.type))
            else:
                children.append(pa.nulls(len(arr), field.type))
        return pa.StructArray.from_arrays(
            children,
            names=[f.name for f in target],
            mask=arr.is_null() if arr.null_count else None,
        )
    if pa.types.is_large_list(target) or pa.types.is_list(target):
        values = _widen_array(arr.flatten(), target.value_type)
        offsets = arr.offsets
        cls = (
            pa.LargeListArray
            if pa.types.is_large_list(target)
            else pa.ListArray
        )
        mask = None
        if arr.null_count:
            mask = pc.invert(arr.is_valid())
        if pa.types.is_large_list(target) != pa.types.is_large_list(src):
            offsets = offsets.cast(
                pa.int64() if pa.types.is_large_list(target) else pa.int32()
            )
        if mask is not None:
            # from_arrays(offsets, values) drops validity; re-apply it
            out = cls.from_arrays(offsets, values)
            return pc.if_else(pc.invert(mask), out, pa.nulls(len(out), target))
        return cls.from_arrays(offsets, values)
    return arr.cast(target)


def unify_to_schema(
    ds: "ray.data.Dataset", target: pa.Schema, *, batch_size: int = 65536
) -> "ray.data.Dataset":
    """Schema-evolution unification inside ``map_batches``, nested-aware:
    every batch is widened to ``target`` — missing top-level columns become
    null columns, structs missing a child gain a null-filled child (one level
    or deeper), ``list<struct>`` elements likewise. Old nested files and new
    ones then union into a single well-typed Dataset."""

    def widen(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        cols = []
        for field in target:
            if field.name in t.column_names:
                cols.append(_widen_array(_single_chunk(t[field.name]), field.type))
            else:
                cols.append(pa.nulls(len(t), field.type))
        return pa.Table.from_arrays(cols, schema=target)

    return ds.map_batches(widen, batch_format="pyarrow", batch_size=batch_size)
