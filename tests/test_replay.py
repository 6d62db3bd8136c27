"""Engine replay conformance vs the oracle (TKGTestSuite golden-rows pattern,
/root/reference/src/test/scala/ai/scads/odibel/dbpedia/temporal/TKGTestSuite.scala:95-128)."""

import pyarrow as pa
import pytest

from odibel_ray.cdc import replay_dataset
from odibel_ray.oracle import replay_oracle
from tests.conftest import collect_sorted

KEYS = ["conv_id", "turn_idx"]


@pytest.mark.parametrize(
    "num_buckets,precompact",
    [(None, True), (None, False), (2, True), (16, True), (16, False)],
)
def test_replay_matches_oracle(ray_session, small_log, oracle_final, num_buckets, precompact):
    """Scale-invariance: identical result at any bucket count, with and without
    the pre-compaction combiner (SURVEY.md §5 test plan item 5)."""
    ds = replay_dataset(small_log["log_dir"], num_buckets=num_buckets, precompact=precompact)
    eng = collect_sorted(ds, KEYS)
    assert eng.equals(oracle_final), (
        f"mismatch at buckets={num_buckets} precompact={precompact}: "
        f"{eng.num_rows} vs {oracle_final.num_rows} rows"
    )


def test_per_turn_text_equality(ray_session, small_log, oracle_final):
    """The BASELINE.json per-row invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering."""
    eng = collect_sorted(replay_dataset(small_log["log_dir"], num_buckets=8), KEYS)
    assert eng["text"].equals(oracle_final["text"])
    assert eng["conv_id"].equals(oracle_final["conv_id"])
    assert eng["turn_idx"].equals(oracle_final["turn_idx"])


def test_replay_history_matches_oracle(ray_session, small_log):
    ora = replay_oracle(small_log["log_dir"], history=True)
    eng = collect_sorted(
        replay_dataset(small_log["log_dir"], num_buckets=8, history=True),
        ["conv_id", "turn_idx", "lsn_start"],
    )
    assert eng.equals(ora)


def test_history_open_window_sentinels(ray_session, small_log):
    """Live rows carry lsn_end=INT64_MAX (TemporalWindowBuilder.scala:92) and the
    9999-12-31 ts sentinel; they must round-trip Arrow exactly."""
    import pyarrow.compute as pc

    from odibel_ray.cdc.apply import INT64_MAX, TS_SENTINEL_US

    eng = collect_sorted(
        replay_dataset(small_log["log_dir"], num_buckets=4, history=True),
        ["conv_id", "turn_idx", "lsn_start"],
    )
    live = eng.filter(pc.equal(eng["lsn_end"], INT64_MAX))
    assert live.num_rows > 0
    ts_end_us = live["ts_end"].cast(pa.int64())
    assert pc.all(pc.equal(ts_end_us, TS_SENTINEL_US)).as_py()
    # number of live windows == number of converged rows
    final = replay_oracle(small_log["log_dir"])
    assert live.num_rows == final.num_rows


def test_change_feed_fused_matches_generic(ray_session, small_log):
    """The single-replay fused change feed must be row-identical to the
    generic two-state diff (snapshot replay + final replay + change_feed)."""
    import pyarrow.compute as pc

    from odibel_ray.cdc.apply import replay_change_feed
    from odibel_ray.cdc.lww import change_feed

    log = small_log["log_dir"]
    import pyarrow.dataset as pads

    lsn = pads.dataset(log, format="parquet", partitioning="hive").to_table(
        columns=["lsn"]
    )["lsn"]
    cut = int(pc.max(lsn).as_py() * 0.5)
    cols = ["conv_id", "turn_idx", "change", "text_before", "text_after"]
    fused = collect_sorted(
        replay_change_feed(log, cut, num_buckets=4), ["conv_id", "turn_idx"]
    ).select(cols)
    generic = collect_sorted(
        change_feed(
            replay_dataset(log, max_lsn=cut),
            replay_dataset(log),
            ["conv_id", "turn_idx"],
            ["text"],
        ),
        ["conv_id", "turn_idx"],
    ).select(cols)
    assert fused.num_rows > 0
    assert fused.equals(generic)
    kinds = set(fused["change"].to_pylist())
    assert kinds <= {"insert", "update", "delete"}
