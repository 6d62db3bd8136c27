"""rDF2 operator surface: NT parse/serialize roundtrip, semi-joins, schema graph."""

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from odibel_ray.rdf import generate_nt_corpus

    return generate_nt_corpus(str(tmp_path_factory.mktemp("rdf")), n_entities=120)


def test_parse_drops_malformed(ray_session, corpus):
    from odibel_ray.rdf import read_ntriples

    ds = read_ntriples(corpus["nt"])
    assert ds.count() == corpus["n_triples"]  # comment/blank/malformed dropped


def test_serialize_roundtrip(ray_session, corpus):
    import ray

    from odibel_ray.rdf import parse_ntriples_batch, read_ntriples, serialize_ntriples

    ds = read_ntriples(corpus["nt"])
    lines = serialize_ntriples(ds)
    reparsed = lines.map_batches(
        lambda t: parse_ntriples_batch(t, line_col="line"), batch_format="pyarrow"
    )
    a = sorted(tuple(r.values()) for r in ds.take_all())
    b = sorted(tuple(r.values()) for r in reparsed.take_all())
    assert a == b


def test_object_subject_filter(ray_session, corpus):
    from odibel_ray.rdf import RDF_TYPE, keep_triples_with_object_subject, read_ntriples

    ds = read_ntriples(corpus["nt"])
    kept = keep_triples_with_object_subject(ds)
    rows = kept.take_all()
    subjects = {r["s"] for r in ds.take_all()}
    for r in rows:
        assert r["isLiteral"] or r["p"] == RDF_TYPE or r["o"] in subjects
    assert 0 < len(rows) <= ds.count()


def test_schema_graph_totals(ray_session, corpus):
    from odibel_ray.rdf import RDF_TYPE, read_ntriples, schema_graph

    ds = read_ntriples(corpus["nt"])
    sg = schema_graph(ds)
    n_data = ds.filter(expr=f"p != '{RDF_TYPE}'").count()
    assert sum(r["n"] for r in sg.take_all()) == n_data


def test_history_to_quads(ray_session, small_log):
    from odibel_ray.cdc.apply import replay_dataset
    from odibel_ray.rdf import history_to_quads

    hist = replay_dataset(small_log["log_dir"], history=True)
    n_hist = hist.count()
    quads = history_to_quads(replay_dataset(small_log["log_dir"], history=True))
    lines = quads.take_all()
    assert len(lines) == 3 * n_hist
    # deterministic graph ids: rerun produces the identical multiset
    again = history_to_quads(replay_dataset(small_log["log_dir"], history=True)).take_all()
    assert sorted(l["line"] for l in lines) == sorted(l["line"] for l in again)


def test_history_to_rdf_star_shape(ray_session):
    """One history row → exactly 4 RDF-star lines with the quoted fact
    triple as subject and the window annotations typed like the
    named-graph/reification family (dateTime for t*, long for r*)."""
    import datetime

    import pyarrow as pa
    import ray.data as rd

    from odibel_ray.rdf import history_to_rdf_star

    row = pa.table(
        {
            "conv_id": pa.array(["c1"]),
            "turn_idx": pa.array([3], pa.int32()),
            "text": pa.array(["hello"]),
            "lsn_start": pa.array([7], pa.int64()),
            "lsn_end": pa.array([12], pa.int64()),
            "ts_start": pa.array([datetime.datetime(2026, 1, 2, 3, 4, 5)]),
            "ts_end": pa.array([datetime.datetime(2026, 1, 2, 3, 9, 5)]),
        }
    )
    lines = sorted(
        r["line"] for r in history_to_rdf_star(rd.from_arrow(row)).take_all()
    )
    q = '<< <urn:turn:c1:3> <urn:p:value> "hello" >>'
    dt = "^^<http://www.w3.org/2001/XMLSchema#dateTime>"
    lg = "^^<http://www.w3.org/2001/XMLSchema#long>"
    assert lines == sorted(
        [
            f'{q} <urn:p:tStart> "2026-01-02T03:04:05"{dt} .',
            f'{q} <urn:p:tEnd> "2026-01-02T03:09:05"{dt} .',
            f'{q} <urn:p:rStart> "7"{lg} .',
            f'{q} <urn:p:rEnd> "12"{lg} .',
        ]
    )
