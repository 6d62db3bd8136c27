"""Gradoop/FAMER graph reader (SURVEY.md §2.1 S11) — the reference's
``operations/gradoop/reader.py:21-130`` rebuilt on Ray Data: JSONL vertex and
edge files → columnar Datasets, plus corpus-scale duplicate clusters via
distributed connected components (the reference materializes a NetworkX graph
on the driver; we never do).

FAMER JSONL shapes (``gradoop/famer_constant.py``):

- vertex line: ``{"id": ..., "data_io": {"srcId": <resource>, <props>...}}``
- edge line: ``{"source": ..., "target": ..., "data_io": {"value": <sim>}}``
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

ID, PROPERTIES, RESOURCE = "id", "data_io", "srcId"
SRC, TARGET, SIM = "source", "target", "value"


def read_gradoop_vertices(path: str) -> "ray.data.Dataset":
    """Vertex files → Dataset ``(id, resource, properties)`` where
    ``properties`` is the JSON-encoded property dict minus the resource tag
    (``reader.py:235-247`` semantics, one batch-parse per block)."""
    import ray.data as rd

    def parse(t: pa.Table) -> pa.Table:
        ids, res, props = [], [], []
        for line in t["text"].to_pylist():
            if not line.strip():
                continue
            v = json.loads(line)
            p = dict(v.get(PROPERTIES) or {})
            ids.append(str(v[ID]))
            res.append(p.pop(RESOURCE, None))
            props.append(json.dumps(p, sort_keys=True))
        return pa.table(
            {
                "id": pa.array(ids, pa.string()),
                "resource": pa.array(res, pa.string()),
                "properties": pa.array(props, pa.string()),
            }
        )

    return rd.read_text(path).map_batches(parse, batch_format="pyarrow")


def read_gradoop_edges(path: str) -> "ray.data.Dataset":
    """Edge files → Dataset ``(src, dst, sim)`` (``reader.py:250-261``)."""
    import ray.data as rd

    def parse(t: pa.Table) -> pa.Table:
        srcs, dsts, sims = [], [], []
        for line in t["text"].to_pylist():
            if not line.strip():
                continue
            e = json.loads(line)
            srcs.append(str(e[SRC]))
            dsts.append(str(e[TARGET]))
            sims.append(float((e.get(PROPERTIES) or {}).get(SIM, 0.0)))
        return pa.table(
            {
                "src": pa.array(srcs, pa.string()),
                "dst": pa.array(dsts, pa.string()),
                "sim": pa.array(sims, pa.float64()),
            }
        )

    return rd.read_text(path).map_batches(parse, batch_format="pyarrow")


def gradoop_clusters(
    vertex_path: str,
    edge_path: str,
    *,
    min_sim: float = 0.0,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """FAMER cluster extraction: edges (optionally thresholded on similarity,
    endpoints restricted to known vertices as the reference does at
    ``reader.py:256``) → distributed connected components →
    ``(node, component)``. The reference builds one NetworkX graph driver-side
    (``reader.py:66-77``); here both the membership filter and the component
    computation are keyed shuffles."""
    from odibel_ray.ops.relational import bucketed_join
    from odibel_ray.state.clusters import connected_components_auto

    edges = read_gradoop_edges(edge_path)
    if min_sim > 0.0:
        edges = edges.filter(expr=f"sim >= {float(min_sim)}")
    ids = read_gradoop_vertices(vertex_path).select_columns(["id"])
    edge_schema = pa.schema(
        [("src", pa.string()), ("dst", pa.string()), ("sim", pa.float64())]
    )
    id_schema = lambda c: pa.schema([(c, pa.string())])  # noqa: E731
    # membership semi-joins via inner bucketed joins on unique vertex ids
    edges = bucketed_join(
        edges,
        ids.rename_columns({"id": "src"}),
        "src",
        num_buckets=num_buckets,
        left_schema=edge_schema,
        right_schema=id_schema("src"),
    )
    edges = bucketed_join(
        edges,
        ids.rename_columns({"id": "dst"}),
        "dst",
        num_buckets=num_buckets,
        left_schema=edge_schema,
        right_schema=id_schema("dst"),
    )
    return connected_components_auto(edges, "src", "dst", num_buckets=num_buckets)
