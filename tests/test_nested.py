"""Nested Arrow types: list<struct> assembly, parquet round-trip, evolution."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _flat_table(n_convs=9, turns=5):
    rows = {
        "conv_id": [], "turn_idx": [], "role": [], "text": [],
        "tool_name": [], "score": [],
    }
    for c in range(n_convs):
        for t in range(turns + c % 3):
            rows["conv_id"].append(f"conv-{c:03d}")
            rows["turn_idx"].append(t)
            rows["role"].append("user" if t % 2 == 0 else "assistant")
            rows["text"].append(f"text {c}/{t}")
            rows["tool_name"].append("search" if t % 4 == 1 else None)
            rows["score"].append(float(c) + t / 10)
    return pa.table(rows).cast(
        pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("role", pa.string()),
                ("text", pa.string()),
                ("tool_name", pa.string()),
                ("score", pa.float64()),
            ]
        )
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), ignore_index=True)


def test_nest_unnest_roundtrip(ray_session):
    import ray.data as rd

    from odibel_ray.nested import nest_turns, unnest_turns

    flat = _flat_table()
    cols = ("turn_idx", "role", "text", "tool_name", "score")
    nested = nest_turns(rd.from_arrow(flat), turn_cols=cols, num_buckets=4)
    rows = nested.take_all()
    assert len(rows) == 9
    by_conv = {r["conv_id"]: r for r in rows}
    assert by_conv["conv-001"]["n_turns"] == 6
    # turns are ordered structs
    t0 = by_conv["conv-000"]["turns"]
    assert [x["turn_idx"] for x in t0] == list(range(5))
    assert t0[1]["tool_name"] == "search"

    back = unnest_turns(
        nest_turns(rd.from_arrow(flat), turn_cols=cols, num_buckets=4),
        drop=("n_turns",),
    ).to_pandas()
    pd.testing.assert_frame_equal(
        _canon(back), _canon(flat.to_pandas()), check_dtype=False
    )


def test_nested_parquet_roundtrip(ray_session, tmp_path):
    """list<struct> survives write_parquet → read_parquet byte-identically."""
    import ray.data as rd

    from odibel_ray.nested import nest_turns, unnest_turns

    flat = _flat_table()
    cols = ("turn_idx", "role", "text", "tool_name", "score")
    out = str(tmp_path / "nested_pq")
    nest_turns(rd.from_arrow(flat), turn_cols=cols, num_buckets=4).write_parquet(out)

    back = unnest_turns(rd.read_parquet(out), drop=("n_turns",)).to_pandas()
    pd.testing.assert_frame_equal(
        _canon(back), _canon(flat.to_pandas()), check_dtype=False
    )


def test_extract_templates_nested_matches_exploded(ray_session):
    import ray.data as rd

    from odibel_ray.nested import extract_templates_nested
    from odibel_ray.text import extract_templates

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "plain text no templates",
                    "a {{cite|x=1}} and {{infobox|{{nested|y}}|z}} here",
                    "{{stub}}",
                    None,
                ]
            ),
        }
    )
    nested = extract_templates_nested(rd.from_arrow(t), concurrency=1).take_all()
    assert len(nested) == 4  # row-count preserving
    got = {
        (r["doc_id"], tpl["name"], tpl["body"])
        for r in nested
        for tpl in r["templates"]
    }
    exploded = extract_templates(rd.from_arrow(t), concurrency=1).take_all()
    want = {
        (r["doc_id"], r["template_name"], r["template_body"]) for r in exploded
    }
    assert got == want and len(want) >= 3


def test_nested_schema_evolution_union(ray_session, tmp_path):
    """Files written before the struct gained a field unify with newer files:
    unify_to_schema null-fills the missing struct child inside map_batches."""
    import ray.data as rd

    from odibel_ray.nested import nest_turns, unify_to_schema, unnest_turns

    v1_cols = ("turn_idx", "role", "text")
    v2_cols = ("turn_idx", "role", "text", "tool_name")
    flat = _flat_table()
    old_mask = pc.less(pc.binary_length(flat["conv_id"]), 100)  # all rows
    half = flat.filter(
        pc.less(pc.cast(pc.utf8_slice_codeunits(flat["conv_id"], 5, 8), pa.int32()), 5)
    )
    rest = flat.filter(
        pc.greater_equal(
            pc.cast(pc.utf8_slice_codeunits(flat["conv_id"], 5, 8), pa.int32()), 5
        )
    )
    del old_mask
    p1, p2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    nest_turns(rd.from_arrow(half), turn_cols=v1_cols, num_buckets=2).write_parquet(p1)
    nest_turns(rd.from_arrow(rest), turn_cols=v2_cols, num_buckets=2).write_parquet(p2)

    target = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_turns", pa.int64()),
            (
                "turns",
                pa.large_list(
                    pa.struct(
                        [
                            ("turn_idx", pa.int32()),
                            ("role", pa.string()),
                            ("text", pa.string()),
                            ("tool_name", pa.string()),
                        ]
                    )
                ),
            ),
        ]
    )
    unified = unify_to_schema(rd.read_parquet(p1), target).union(
        unify_to_schema(rd.read_parquet(p2), target)
    )
    back = unnest_turns(unified, drop=("n_turns",)).to_pandas()
    assert len(back) == len(flat)
    # old files: tool_name is all-null; new files: original values survive
    old = back[back.conv_id < "conv-005"]
    new = back[back.conv_id >= "conv-005"]
    assert old["tool_name"].isna().all()
    want_new = rest.to_pandas()
    assert new["tool_name"].notna().sum() == want_new["tool_name"].notna().sum() > 0


def test_nested_publish_dataset_roundtrip(ray_session, tmp_path):
    """list<struct> through the generic write-audit-publish sink: manifests,
    resume (second run publishes nothing new), lossless read-back."""
    import ray.data as rd

    from odibel_ray.cdc.sink import load_manifests, publish_dataset, read_published
    from odibel_ray.nested import nest_turns, unnest_turns

    flat = _flat_table()
    cols = ("turn_idx", "role", "text", "tool_name", "score")
    out = str(tmp_path / "nested_sink")
    nested = nest_turns(rd.from_arrow(flat), turn_cols=cols, num_buckets=4)
    res = publish_dataset(nested, out, key_cols=["conv_id"], num_buckets=4)
    assert res["published_total"] >= 1
    assert sum(m["rows_out"] for m in load_manifests(out).values()) == 9

    # resume: everything already manifested → nothing re-published
    nested2 = nest_turns(rd.from_arrow(flat), turn_cols=cols, num_buckets=4)
    res2 = publish_dataset(nested2, out, key_cols=["conv_id"], num_buckets=4, run_id="run-1")
    assert res2["published_now"] == 0
    assert res2["published_total"] == res["published_total"]

    back = unnest_turns(read_published(out, system=True), drop=("n_turns",)).to_pandas()
    pd.testing.assert_frame_equal(
        _canon(back), _canon(flat.to_pandas()), check_dtype=False
    )


def test_publish_dataset_pins_bucket_layout(ray_session, tmp_path):
    """The resolved bucket layout is persisted before staging: a resume under
    a different cluster-derived default must reuse the original num_buckets
    (re-hashing against a new modulus while `done` holds old bucket ids drops
    and duplicates rows), and an explicit conflicting num_buckets or key set
    is an error, not silent corruption."""
    import json
    import os

    import pytest
    import ray.data as rd

    from odibel_ray.cdc.sink import publish_dataset
    from odibel_ray.nested import nest_turns

    flat = _flat_table()
    cols = ("turn_idx", "role", "text", "tool_name", "score")
    out = str(tmp_path / "pinned")
    nested = nest_turns(rd.from_arrow(flat), turn_cols=cols, num_buckets=4)
    publish_dataset(nested, out, key_cols=["conv_id"], num_buckets=4)
    layout = json.load(open(os.path.join(out, "_layout.json")))
    assert layout == {"num_buckets": 4, "key_cols": ["conv_id"]}

    # resume with the default (None) reuses the pinned layout even though the
    # cluster-derived default would differ from 4
    nested2 = nest_turns(rd.from_arrow(flat), turn_cols=cols, num_buckets=4)
    res = publish_dataset(nested2, out, key_cols=["conv_id"], run_id="run-1")
    assert res["published_now"] == 0

    with pytest.raises(ValueError, match="num_buckets"):
        publish_dataset(nested2, out, key_cols=["conv_id"], num_buckets=8)
    with pytest.raises(ValueError, match="key_cols"):
        publish_dataset(nested2, out, key_cols=["conv_id", "n_turns"])


def test_nested_publish_schema_evolution(ray_session, tmp_path):
    """Two published generations of a nested table (struct gained a child)
    unify through unify_to_schema after read_published."""
    import pyarrow as pa
    import ray.data as rd

    from odibel_ray.cdc.sink import publish_dataset, read_published
    from odibel_ray.nested import nest_turns, unify_to_schema, unnest_turns

    flat = _flat_table()
    half = flat.filter(
        pc.less(pc.cast(pc.utf8_slice_codeunits(flat["conv_id"], 5, 8), pa.int32()), 5)
    )
    rest = flat.filter(
        pc.greater_equal(
            pc.cast(pc.utf8_slice_codeunits(flat["conv_id"], 5, 8), pa.int32()), 5
        )
    )
    p1, p2 = str(tmp_path / "gen1"), str(tmp_path / "gen2")
    publish_dataset(
        nest_turns(rd.from_arrow(half), turn_cols=("turn_idx", "role", "text"), num_buckets=2),
        p1, key_cols=["conv_id"], num_buckets=2,
    )
    publish_dataset(
        nest_turns(
            rd.from_arrow(rest),
            turn_cols=("turn_idx", "role", "text", "tool_name"),
            num_buckets=2,
        ),
        p2, key_cols=["conv_id"], num_buckets=2,
    )
    target = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_turns", pa.int64()),
            (
                "turns",
                pa.large_list(
                    pa.struct(
                        [
                            ("turn_idx", pa.int32()),
                            ("role", pa.string()),
                            ("text", pa.string()),
                            ("tool_name", pa.string()),
                        ]
                    )
                ),
            ),
        ]
    )
    unified = unify_to_schema(read_published(p1, system=True), target).union(
        unify_to_schema(read_published(p2, system=True), target)
    )
    back = unnest_turns(unified, drop=("n_turns",)).to_pandas()
    assert len(back) == len(flat)
    assert back[back.conv_id < "conv-005"]["tool_name"].isna().all()
    assert back[back.conv_id >= "conv-005"]["tool_name"].notna().any()


def test_unnest_null_list_rows(ray_session):
    """Rows whose list column is NULL (e.g. unify_to_schema widening a file
    that predates the column) explode to zero rows instead of crashing."""
    import pyarrow as pa
    import ray.data as rd

    from odibel_ray.nested import unnest_turns

    t = pa.table(
        {
            "conv_id": ["a", "b", "c"],
            "turns": pa.array(
                [
                    [{"turn_idx": 0, "role": "u"}],
                    None,
                    [{"turn_idx": 0, "role": "u"}, {"turn_idx": 1, "role": "a"}],
                ],
                pa.large_list(pa.struct([("turn_idx", pa.int32()), ("role", pa.string())])),
            ),
        }
    )
    back = unnest_turns(rd.from_arrow(t)).to_pandas()
    assert len(back) == 3
    assert sorted(back["conv_id"]) == ["a", "c", "c"]
