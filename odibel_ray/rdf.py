"""RDF triple-table operations — the reference's ``rDF2`` Python operator
surface (``/root/reference/src/pyodibel/operations/rdf/rdf2.py``) rebuilt on
Ray Data.

Table model: fixed validated schema ``{s, p, o, isLiteral}``
(``rdf2.py:30-43``); violation raises at pipeline boundaries. N-Triples
parsing/serialization follows ``rdf2.py:46-67 / 93-102``: drop comments, blank
and malformed lines; a literal object is anything that doesn't start with
``<``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"

RDF_SCHEMA = pa.schema(
    [
        ("s", pa.string()),
        ("p", pa.string()),
        ("o", pa.string()),
        ("isLiteral", pa.bool_()),
    ]
)


def validate_rdf(t: pa.Table) -> pa.Table:
    """Schema gate (``rdf2._validate`` analog, ``rdf2.py:30-43``)."""
    if set(t.column_names) != set(RDF_SCHEMA.names):
        raise ValueError(f"not an rDF table: {t.column_names}")
    return t.select(RDF_SCHEMA.names)


def parse_ntriples_batch(t: pa.Table, line_col: str = "text") -> pa.Table:
    """One NT line → (s, p, o, isLiteral); comments/blank/malformed dropped
    (``rdf2.py:46-67``). Vectorized: split on first two spaces, strip the
    trailing `` .``."""
    t = t.combine_chunks()
    lines = pc.utf8_trim_whitespace(t[line_col])
    ok = pc.and_(
        pc.invert(pc.starts_with(lines, "#")),
        pc.greater(pc.utf8_length(lines), 6),
    )
    lines = lines.filter(pc.fill_null(ok, False))
    parts = pc.split_pattern(lines, pattern=" ", max_splits=2)
    good = pc.equal(pc.list_value_length(parts), 3)
    parts = parts.filter(good)
    s = pc.list_element(parts, 0)
    p = pc.list_element(parts, 1)
    rest = pc.list_element(parts, 2)
    # strip the trailing " ." terminator
    o = pc.replace_substring_regex(rest, pattern=r"\s*\.\s*$", replacement="")
    is_lit = pc.invert(pc.starts_with(o, "<"))
    out = pa.table({"s": s, "p": p, "o": o, "isLiteral": is_lit})
    # malformed: any null or empty component
    mask = pc.and_(
        pc.and_(pc.greater(pc.utf8_length(s), 0), pc.greater(pc.utf8_length(p), 0)),
        pc.greater(pc.utf8_length(o), 0),
    )
    return validate_rdf(out.filter(pc.fill_null(mask, False)))


def read_ntriples(path: str) -> "ray.data.Dataset":
    """S9: ``read_text`` (codec autodetected from the extension, S4) →
    vectorized parse."""
    from odibel_ray.sources.io import read_text_auto

    return read_text_auto(path).map_batches(parse_ntriples_batch, batch_format="pyarrow")


def serialize_ntriples(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """S10: (s,p,o) → one NT line per row (``concat_ws`` analog)."""

    def f(t: pa.Table) -> pa.Table:
        t = validate_rdf(t.combine_chunks())
        line = pc.binary_join_element_wise(t["s"], t["p"], t["o"], pa.scalar(" ."), " ")
        return pa.table({"line": line})

    return ds.map_batches(f, batch_format="pyarrow")


def filter_by_subject_types(
    ds: "ray.data.Dataset", type_iris: Sequence[str], *, num_buckets: int = 64
) -> "ray.data.Dataset":
    """J1 semi-join: keep all triples whose subject has one of the given rdf
    types (``filter_triples_by_s_types``, ``rdf2.py:105-137``). The selected
    entity set is O(#entities) at corpus scale, so the membership test is a
    keyed :func:`odibel_ray.ops.relational.bucketed_join` semi-join — only the
    class allowlist (dimension-sized) is an in-filter mask."""
    from odibel_ray.ops.relational import bucketed_join, exact_dedup

    typed = ds.filter(expr=f"p == '{RDF_TYPE}'")

    def keep_types(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        return t.filter(pc.is_in(t["o"], value_set=pa.array(list(type_iris))))

    subjects = exact_dedup(
        typed.map_batches(keep_types, batch_format="pyarrow").select_columns(["s"]),
        ["s"],
    )
    return bucketed_join(
        ds,
        subjects,
        "s",
        num_buckets=num_buckets,
        left_schema=RDF_SCHEMA,
        right_schema=pa.schema([("s", pa.string())]),
    )


def keep_triples_with_object_subject(
    ds: "ray.data.Dataset", *, num_buckets: int = 64
) -> "ray.data.Dataset":
    """J2: keep literal triples, type edges, and triples whose object is
    itself a known subject (``rdf2.py:139-156``). The subject set is the
    corpus entity set — a keyed left join with a hit marker, never a
    broadcast value set."""
    from odibel_ray.ops.relational import bucketed_join, exact_dedup

    subjects = exact_dedup(ds.select_columns(["s"]), ["s"])

    def mark(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        return pa.table(
            {"o": t["s"], "_subj_hit": pa.array(np.ones(len(t), np.int8))}
        )

    marked = subjects.map_batches(mark, batch_format="pyarrow")
    j = bucketed_join(
        ds,
        marked,
        "o",
        how="left",
        num_buckets=num_buckets,
        left_schema=RDF_SCHEMA,
        right_schema=pa.schema([("o", pa.string()), ("_subj_hit", pa.int8())]),
    )

    def keep(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        m = pc.or_(
            pc.or_(t["isLiteral"], pc.equal(t["p"], RDF_TYPE)),
            pc.is_valid(t["_subj_hit"]),
        )
        return t.filter(pc.fill_null(m, False)).drop_columns(["_subj_hit"])

    return j.map_batches(keep, batch_format="pyarrow")


def clean_rdf_types(ds: "ray.data.Dataset", allowlist: Sequence[str]) -> "ray.data.Dataset":
    """M17: drop type edges not in the allowlist, keep all non-type triples
    (two filters + union, ``rdf2.py:159-170``)."""
    non_type = ds.filter(expr=f"p != '{RDF_TYPE}'")

    def keep_allowed(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        m = pc.and_(
            pc.equal(t["p"], RDF_TYPE),
            pc.is_in(t["o"], value_set=pa.array(list(allowlist))),
        )
        return t.filter(pc.fill_null(m, False))

    allowed_types = ds.map_batches(keep_allowed, batch_format="pyarrow")
    return non_type.union(allowed_types)


def filter_subgraph_by_entity_classes(
    ds: "ray.data.Dataset", classes: Sequence[str], *, num_buckets: int = 64
) -> "ray.data.Dataset":
    """J3 multi-stage class-scoped subgraph (``rdf2.py:175-257``):

    1. selected entities = subjects with an ``rdf:type`` in ``classes``;
    2. keep triples whose subject is selected AND (object is a literal, OR
       object is itself selected, OR the triple is an allowed type edge);
    3. distinct.

    The entity set is corpus-sized, so both entity scopings are keyed
    :func:`odibel_ray.ops.relational.bucketed_join` semi-joins (the
    reference's inner joins); only the class allowlist (dimension-sized) is an
    in-filter mask.
    """
    from odibel_ray.ops.relational import bucketed_join, exact_dedup

    classes = [c.strip() for c in classes if c and c.strip()]
    if not classes:
        raise ValueError("classes must not be empty")
    class_arr = pa.array(classes)

    def allowed_types(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        m = pc.and_(
            pc.equal(t["p"], RDF_TYPE), pc.is_in(t["o"], value_set=class_arr)
        )
        return t.filter(pc.fill_null(m, False))

    selected = exact_dedup(
        ds.map_batches(allowed_types, batch_format="pyarrow").select_columns(["s"]),
        ["s"],
    )
    sel_schema = lambda c: pa.schema([(c, pa.string())])  # noqa: E731
    subject_scoped = bucketed_join(
        ds,
        selected,
        "s",
        num_buckets=num_buckets,
        left_schema=RDF_SCHEMA,
        right_schema=sel_schema("s"),
    )
    literal = subject_scoped.filter(expr="isLiteral == True")
    entity_to_entity = bucketed_join(
        subject_scoped.filter(expr="isLiteral == False"),
        selected.rename_columns({"s": "o"}),
        "o",
        num_buckets=num_buckets,
        left_schema=RDF_SCHEMA,
        right_schema=sel_schema("o"),
    )
    type_edges = subject_scoped.map_batches(allowed_types, batch_format="pyarrow")
    merged = literal.union(entity_to_entity).union(type_edges)
    return exact_dedup(merged, ["s", "p", "o", "isLiteral"])


def schema_graph(ds: "ray.data.Dataset", *, num_buckets: int = 64) -> "ray.data.Dataset":
    """A16 (``rdf2.py:548-600``): type data edges by subject and object type
    (two distributed left joins + coalesce 'Untyped') → groupby (SourceType,
    Relation, TargetType) count.

    The subject→type table is O(#entities) — corpus-sized, never a broadcast
    lookup — so both typings are keyed shuffle joins
    (:func:`odibel_ray.ops.relational.bucketed_join`), exactly the reference's
    two ``join(..., 'left')`` + ``coalesce`` shape (``rdf2.py:563-591``)."""
    from ray.data.aggregate import Count

    from odibel_ray.ops.relational import bucketed_join, exact_dedup

    # subject -> deterministic first type (min, matching SQL min(o))
    types = exact_dedup(
        ds.filter(expr=f"p == '{RDF_TYPE}'").select_columns(["s", "o"]),
        ["s"],
        tie_break="o",
    )
    data = ds.filter(expr=f"p != '{RDF_TYPE}'")
    type_schema = lambda k, v: pa.schema([(k, pa.string()), (v, pa.string())])  # noqa: E731
    j1 = bucketed_join(
        data,
        types.rename_columns({"o": "_stype"}),
        "s",
        how="left",
        num_buckets=num_buckets,
        left_schema=RDF_SCHEMA,
        right_schema=type_schema("s", "_stype"),
    )
    j2 = bucketed_join(
        j1,
        types.rename_columns({"s": "o", "o": "_otype"}),
        "o",
        how="left",
        num_buckets=num_buckets,
        left_schema=RDF_SCHEMA.append(pa.field("_stype", pa.string())),
        right_schema=type_schema("o", "_otype"),
    )

    def tag(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        src = pc.coalesce(t["_stype"], pa.scalar("Untyped"))
        tgt = pc.if_else(
            t["isLiteral"],
            pa.scalar("Literal"),
            pc.coalesce(t["_otype"], pa.scalar("Untyped")),
        )
        return pa.table(
            {"SourceType": src, "Relation": t["p"], "TargetType": tgt}
        )

    tagged = j2.map_batches(tag, batch_format="pyarrow")
    return tagged.groupby(["SourceType", "Relation", "TargetType"]).aggregate(
        Count(alias_name="n")
    )


def history_to_quads(history: "ray.data.Dataset") -> "ray.data.Dataset":
    """M9 flat-map serializer (``SerUtil.buildQuads``, ``SerUtil.scala:27-40``):
    one converged-history row → 3 quad lines (value, window-start, window-end)
    in a deterministic named graph minted from the key hash — never from
    wall-clock ids (the ``System.nanoTime()`` anti-pattern at
    ``CSVToRDFReification.scala:98`` breaks idempotent retries)."""
    import pandas as pd

    def f(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        turn = t["turn_idx"].to_numpy(zero_copy_only=False)
        g = pd.util.hash_array(
            np.char.add(conv.astype(str), turn.astype(str)).astype(object),
            categorize=False,
        )
        n = len(t)
        graph = np.array([f"<urn:g:{x:016x}>" for x in g], dtype=object)
        subj = np.array([f"<urn:turn:{c}:{x}>" for c, x in zip(conv, turn)], dtype=object)
        text = t["text"].to_numpy(zero_copy_only=False)
        ls = t["lsn_start"].to_numpy(zero_copy_only=False)
        le = t["lsn_end"].to_numpy(zero_copy_only=False)
        lines = np.empty(3 * n, dtype=object)
        lines[0::3] = [f'{s} <urn:p:text> "{v}" {gr} .' for s, v, gr in zip(subj, text, graph)]
        lines[1::3] = [f"{s} <urn:p:from> {v} {gr} ." for s, v, gr in zip(subj, ls, graph)]
        lines[2::3] = [f"{s} <urn:p:until> {v} {gr} ." for s, v, gr in zip(subj, le, graph)]
        return pa.table({"line": pa.array(lines, pa.string())})

    return history.map_batches(f, batch_format="pyarrow")


_XSD_DT = "^^<http://www.w3.org/2001/XMLSchema#dateTime>"
_XSD_LONG = "^^<http://www.w3.org/2001/XMLSchema#long>"
_RDF_NS = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def _history_parts(t: pa.Table):
    """Shared per-row string components for the 1→k history serializers."""
    conv = pc.cast(t["conv_id"], pa.string())
    turn = pc.cast(t["turn_idx"], pa.string())
    subj = pc.binary_join_element_wise("<urn:turn:", conv, ":", turn, ">", "")
    key = pc.binary_join_element_wise(
        conv, turn, pc.cast(t["lsn_start"], pa.string()), ":"
    )
    ls = pc.cast(t["lsn_start"], pa.string())
    le = pc.cast(t["lsn_end"], pa.string())
    # cast to second precision first — Arrow's %S appends fractional digits
    # for sub-second units, DuckDB's does not
    ts = pc.strftime(pc.cast(t["ts_start"], pa.timestamp("s")), format="%Y-%m-%dT%H:%M:%S")
    te = pc.strftime(pc.cast(t["ts_end"], pa.timestamp("s")), format="%Y-%m-%dT%H:%M:%S")
    return subj, key, ls, le, ts, te


def history_to_named_graphs(history: "ray.data.Dataset") -> "ray.data.Dataset":
    """M9 named-graph serializer (1 row → 5 N-Quad lines), the
    ``CSVToRDFNamedGraphs.convertRowToRDF`` shape
    (``transform/CSVToRDFNamedGraphs.scala:63-99``): a value quad plus
    tStart/tEnd (xsd:dateTime) and rStart/rEnd (xsd:long) quads, all in one
    named graph per fact-version. The reference mints graph ids from
    ``zipWithIndex`` row numbers (``:29-32``), which are not stable across
    partitionings; we mint them from the key columns (M10), which also makes
    the output exactly SQL-replicable."""

    def f(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        subj, key, ls, le, ts, te = _history_parts(t)
        g = pc.binary_join_element_wise("<urn:g:", key, ">", "")

        def quad(pred: str, obj, typ: str = "") -> pa.Array:
            return pc.binary_join_element_wise(
                subj, " <urn:p:" + pred + "> ", obj, typ + " ", g, " .", ""
            )

        lit = pc.binary_join_element_wise('"', t["text"], '"', "")
        lines = pa.concat_arrays(
            [
                quad("value", lit).combine_chunks(),
                quad("tStart", pc.binary_join_element_wise('"', ts, '"', ""), _XSD_DT).combine_chunks(),
                quad("tEnd", pc.binary_join_element_wise('"', te, '"', ""), _XSD_DT).combine_chunks(),
                quad("rStart", pc.binary_join_element_wise('"', ls, '"', ""), _XSD_LONG).combine_chunks(),
                quad("rEnd", pc.binary_join_element_wise('"', le, '"', ""), _XSD_LONG).combine_chunks(),
            ]
        )
        return pa.table({"line": lines})

    return history.map_batches(f, batch_format="pyarrow")


def history_to_reification(history: "ray.data.Dataset") -> "ray.data.Dataset":
    """M9 reification serializer (1 row → 8 N-Triple lines), the
    ``CSVToRDFReification.convertRowToRDF`` shape
    (``transform/CSVToRDFReification.scala:71-121``): rdf:Statement node with
    subject/predicate/object plus the four window triples. The reference's
    bnode ids come from ``System.nanoTime()`` (``:98``) — non-deterministic
    and retry-hostile; we mint ``_:b<key>`` from the key columns (M10)."""

    def f(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        subj, key, ls, le, ts, te = _history_parts(t)
        b = pc.binary_join_element_wise("_:b", pc.replace_substring(key, ":", "_"), "")

        def tri(pred: str, obj, typ: str = "") -> pa.ChunkedArray:
            return pc.binary_join_element_wise(
                b, " " + pred + " ", obj, typ + " .", ""
            ).combine_chunks()

        lit = pc.binary_join_element_wise('"', t["text"], '"', "")
        lines = pa.concat_arrays(
            [
                tri(_RDF_NS + "type>", pa.scalar(_RDF_NS + "Statement>")),
                tri(_RDF_NS + "subject>", subj),
                tri(_RDF_NS + "predicate>", pa.scalar("<urn:p:value>")),
                tri(_RDF_NS + "object>", lit),
                tri("<urn:p:tStart>", pc.binary_join_element_wise('"', ts, '"', ""), _XSD_DT),
                tri("<urn:p:tEnd>", pc.binary_join_element_wise('"', te, '"', ""), _XSD_DT),
                tri("<urn:p:rStart>", pc.binary_join_element_wise('"', ls, '"', ""), _XSD_LONG),
                tri("<urn:p:rEnd>", pc.binary_join_element_wise('"', le, '"', ""), _XSD_LONG),
            ]
        )
        return pa.table({"line": lines})

    return history.map_batches(f, batch_format="pyarrow")


def history_to_rdf_star(history: "ray.data.Dataset") -> "ray.data.Dataset":
    """M9 RDF-star serializer (1 row → 4 RDF-star lines), the
    ``CSVToRDFStar.convertRowToRDF`` shape the reference sketches but never
    shipped (commented out at ``transform/TKGModelMgr.scala:124-136``): the
    fact triple is quoted (``<< s p o >>``) as the subject of the four
    validity-window annotation triples — tStart/tEnd as xsd:dateTime,
    rStart/rEnd as xsd:long (matching this engine's named-graph/reification
    analogs; the reference sketch typed all four as dateTime, including the
    revision ids, which is plainly a sketch bug). No minted graph/bnode id
    at all — the quoted triple IS the identity, so this is the only
    serializer of the family that needs no M10 deterministic-id treatment."""

    def f(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        subj, _key, ls, le, ts, te = _history_parts(t)
        lit = pc.binary_join_element_wise('"', t["text"], '"', "")
        quoted = pc.binary_join_element_wise(
            "<< ", subj, " <urn:p:value> ", lit, " >>", ""
        )

        def star(pred: str, obj, typ: str) -> pa.Array:
            return pc.binary_join_element_wise(
                quoted, " " + pred + " ", obj, typ + " .", ""
            ).combine_chunks()

        lines = pa.concat_arrays(
            [
                star("<urn:p:tStart>", pc.binary_join_element_wise('"', ts, '"', ""), _XSD_DT),
                star("<urn:p:tEnd>", pc.binary_join_element_wise('"', te, '"', ""), _XSD_DT),
                star("<urn:p:rStart>", pc.binary_join_element_wise('"', ls, '"', ""), _XSD_LONG),
                star("<urn:p:rEnd>", pc.binary_join_element_wise('"', le, '"', ""), _XSD_LONG),
            ]
        )
        return pa.table({"line": lines})

    return history.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# deterministic NT corpus generator (writes BOTH .nt text and the equivalent
# parquet triple table, so DuckDB can oracle the parsed result)
# ---------------------------------------------------------------------------


def generate_nt_corpus(out_dir: str, n_entities: int = 500, seed: int = 31) -> dict:
    import os

    rng = np.random.default_rng(seed)
    types = [f"<http://ex.org/class/C{i}>" for i in range(6)]
    rels = [f"<http://ex.org/rel/r{i}>" for i in range(8)]
    rows = []
    for e in range(n_entities):
        s = f"<http://ex.org/e{e}>"
        rows.append((s, RDF_TYPE, types[e % len(types)], False))
        for k in range(int(rng.integers(1, 5))):
            r = rels[int(rng.integers(len(rels)))]
            if rng.random() < 0.4:
                rows.append((s, r, f'"lit-{e}-{k}"', True))
            else:
                o = f"<http://ex.org/e{int(rng.integers(n_entities * 2))}>"
                rows.append((s, r, o, False))
    tbl = pa.table(
        {
            "s": pa.array([r[0] for r in rows]),
            "p": pa.array([r[1] for r in rows]),
            "o": pa.array([r[2] for r in rows]),
            "isLiteral": pa.array([r[3] for r in rows]),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    nt_path = os.path.join(out_dir, "triples.nt")
    with open(nt_path, "w") as f:
        f.write("# deterministic NT corpus\n")
        for s, p, o, _ in rows:
            f.write(f"{s} {p} {o} .\n")
        f.write("\n")  # blank line: must be skipped by the parser
        f.write("malformed_line_without_spaces\n")
    import pyarrow.parquet as pq

    pq_path = os.path.join(out_dir, "triples.parquet")
    pq.write_table(tbl, pq_path)
    return {"nt": nt_path, "parquet": pq_path, "n_triples": len(tbl)}
