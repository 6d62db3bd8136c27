"""ANALYZE TABLE: per-column statistics (nulls, min/max, NDV exact + HLL)."""

import os

import pyarrow.compute as pc
import pytest

from odibel_ray.cdc import read_published, replay_publish
from odibel_ray.cdc.analyze import analyze_published, load_column_stats
from tests.conftest import collect_sorted

KEYS = ["conv_id", "turn_idx"]


@pytest.fixture(scope="module")
def analyzed(ray_session, small_log, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("an") / "tbl")
    replay_publish(small_log["log_dir"], out, num_buckets=4, run_id="r1")
    full = collect_sorted(read_published(out), KEYS)
    return out, full


def test_exact_stats_match_table(analyzed):
    out, full = analyzed
    stats = analyze_published(out, method="exact")
    assert stats["_table"]["rows"] == len(full)
    for c in ("conv_id", "role", "score", "tool_name"):
        col = full[c]
        assert stats[c]["nulls"] == col.null_count, c
        assert stats[c]["ndv"] == len(col.drop_null().unique()), c
        assert stats[c]["min"] == pc.min(col).as_py(), c
        assert stats[c]["max"] == pc.max(col).as_py(), c
    # persisted and reloadable (values JSON-stringified where not native)
    loaded = load_column_stats(out)
    assert loaded["role"]["ndv"] == stats["role"]["ndv"]
    assert loaded["_table"]["method"] == "exact"


def test_hll_close_to_exact(analyzed):
    out, full = analyzed
    stats = analyze_published(out, method="hll", persist=False)
    for c in ("conv_id", "text"):
        exact = len(full[c].drop_null().unique())
        assert abs(stats[c]["ndv"] - exact) / max(exact, 1) < 0.05, (
            c, stats[c]["ndv"], exact)


def test_column_subset_and_validation(analyzed):
    out, _ = analyzed
    stats = analyze_published(out, columns=["role"], method="exact", persist=False)
    assert set(stats) == {"role", "_table"}
    with pytest.raises(ValueError, match="method"):
        analyze_published(out, method="wrong")


def test_cli_analyze(analyzed, capsys):
    import json

    from odibel_ray.cli import main

    out, full = analyzed
    assert main(["analyze", "--table", out, "--columns", "role,conv_id",
                 "--method", "exact"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["role"]["ndv"] == len(full["role"].drop_null().unique())
    assert load_column_stats(out)["conv_id"]["ndv"] == stats["conv_id"]["ndv"]


def test_refresh_stats_from_feed(ray_session, small_log, tmp_path):
    """Feed-refresh keeps statistics current without a rescan: rows and
    nulls exactly, min/max widen-only, NDV via merged HLL registers."""
    import pyarrow.compute as pc

    from odibel_ray.cdc import incremental_apply, replay_publish
    from odibel_ray.cdc.analyze import refresh_column_stats
    from odibel_ray.datagen import split_log

    log = small_log["log_dir"]
    prefix = str(tmp_path / "prefix")
    split_log(log, prefix, frac=0.5)
    out = str(tmp_path / "tbl")
    feed = str(tmp_path / "feed")
    replay_publish(os.path.join(prefix, "change_log"), out, num_buckets=4,
                   run_id="r1")
    base_stats = analyze_published(out, columns=["text", "score", "tool_name"],
                                   method="hll")
    incremental_apply(log, out, run_id="r2", feed_dir=feed,
                      feed_values=["text", "score", "tool_name"])
    stats = refresh_column_stats(out, feed)

    full = collect_sorted(read_published(out), KEYS)
    assert stats["_table"]["rows"] == len(full)
    assert stats["_table"]["stale_columns"] == []
    for c in ("text", "score", "tool_name"):
        assert stats[c]["nulls"] == full[c].null_count, c
    # min/max widen-only bounds hold
    assert stats["score"]["min"] <= pc.min(full["score"]).as_py()
    assert stats["score"]["max"] >= pc.max(full["score"]).as_py()
    # NDV: merged HLL within 5% of the true upper bound (applied values)
    exact = len(full["text"].drop_null().unique())
    assert stats["text"]["ndv"] >= exact * 0.95
    # columns absent from the feed are reported stale, not silently wrong
    base2 = analyze_published(out, columns=["text", "role"], method="hll")
    stats2 = refresh_column_stats(out, feed)
    assert stats2["_table"]["stale_columns"] == ["role"]

    # exact stats refuse a feed refresh
    analyze_published(out, columns=["text"], method="exact")
    with pytest.raises(ValueError, match="hll"):
        refresh_column_stats(out, feed)
