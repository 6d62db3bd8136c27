"""Registry-level conformance: a representative subset of ``queries()`` vs
their DuckDB oracles at sf0.001 (the driver runs the full set at sf0.01;
``tools/check_queries.py`` runs everything locally)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

SUBSET = [
    "transcript_replay",
    "transcript_snapshot",
    "cdc_events_lww",
    "cdc_events_diff",
    "pricing_summary",
    "events_change_stream",
    "doc_token_stats",
    "ann_cosine_topk",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def oracle_con():
    from odibel_ray.pipelines.queries import ensure_transcript_log

    ensure_transcript_log(SF)
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(ray_session, oracle_con, name):
    from odibel_ray.pipelines.queries import ORACLES, QUERIES

    ray_df = QUERIES[name](SF).to_pandas()
    sql_df = oracle_con.execute(ORACLES(SF)[name]).fetchdf()
    assert sorted(ray_df.columns) == sorted(sql_df.columns)
    pd.testing.assert_frame_equal(
        _canon(ray_df), _canon(sql_df), check_dtype=False, atol=1e-9, rtol=0
    )


def test_driver_contract_shape():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    assert len(q) >= 30
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())
