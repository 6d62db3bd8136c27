"""Shuffle-free partitioned replay + actor-pool applier + partitioned sink."""

import os

from odibel_ray.cdc import read_published, replay_publish
from odibel_ray.cdc.apply import replay_dataset_actor, replay_partitioned
from odibel_ray.oracle import replay_oracle
from tests.conftest import collect_sorted

KEYS = ["conv_id", "turn_idx"]


def test_partitioned_replay_matches_oracle(ray_session, small_log, oracle_final):
    got = collect_sorted(replay_partitioned(small_log["log_dir"]), KEYS)
    assert got.equals(oracle_final)


def test_partitioned_history_matches_oracle(ray_session, small_log):
    oracle_hist = replay_oracle(small_log["log_dir"], history=True)
    got = collect_sorted(
        replay_partitioned(small_log["log_dir"], history=True),
        ["conv_id", "turn_idx", "lsn_start"],
    )
    assert got.equals(oracle_hist)


def test_actor_pool_applier_matches_oracle(ray_session, small_log, oracle_final):
    got = collect_sorted(
        replay_dataset_actor(small_log["log_dir"], concurrency=2), KEYS
    )
    assert got.select(oracle_final.column_names).equals(oracle_final)


def test_incremental_on_partitioned_base(ray_session, small_log, oracle_final, tmp_path):
    """Partitioned publish of a 60% LSN prefix, then watermark-filtered
    incremental apply of the full log — must equal a from-scratch replay."""
    from odibel_ray.cdc import incremental_apply
    from odibel_ray.datagen import split_log

    prefix = str(tmp_path / "prefix")
    split_log(small_log["log_dir"], prefix, frac=0.6)
    out = str(tmp_path / "tbl")
    replay_publish(os.path.join(prefix, "change_log"), out, partitioned=True, run_id="r1")
    res = incremental_apply(small_log["log_dir"], out, run_id="r2")
    assert res["touched"] > 0
    assert collect_sorted(read_published(out), KEYS).equals(oracle_final)


def test_partitioned_publish_and_resume(ray_session, small_log, oracle_final, tmp_path):
    out = str(tmp_path / "tbl")
    res = replay_publish(small_log["log_dir"], out, partitioned=True, run_id="p1")
    assert res["published_now"] == small_log["num_parts"]
    assert collect_sorted(read_published(out), KEYS).equals(oracle_final)
    # second run is a no-op (all partitions manifested)
    res2 = replay_publish(small_log["log_dir"], out, partitioned=True, run_id="p2")
    assert res2["published_now"] == 0
    assert collect_sorted(read_published(out), KEYS).equals(oracle_final)


def test_tail_log_converges_as_files_land(ray_session, small_log, oracle_final, tmp_path):
    """Binlog-tail loop: bootstrap from a 50% prefix, land the remaining log
    files, tail again — converges to the full-replay oracle and goes idle."""
    import shutil

    from odibel_ray.cdc.tail import tail_log
    from odibel_ray.datagen import split_log

    live = str(tmp_path / "live_log")
    split_log(small_log["log_dir"], str(tmp_path / "pfx"), frac=0.5)
    shutil.copytree(os.path.join(str(tmp_path / "pfx"), "change_log"), live)

    out = str(tmp_path / "tbl")
    res1 = tail_log(live, out, max_rounds=3)
    assert res1["history"][0]["mode"] == "bootstrap"

    # the remaining events "land": replace the live log with the full one
    shutil.rmtree(live)
    shutil.copytree(small_log["log_dir"], live)
    res2 = tail_log(live, out, max_rounds=4, stop_when_idle=1)
    assert collect_sorted(read_published(out), KEYS).equals(oracle_final)
    modes = [r["mode"] for r in res2["history"]]
    assert modes[0] == "incremental"
    assert res2["history"][-1]["touched"] == 0  # went idle after convergence


def test_training_feed(ray_session, small_log, oracle_final, tmp_path):
    from odibel_ray.pipelines.training_feed import iter_training_batches

    out = str(tmp_path / "tbl")
    replay_publish(small_log["log_dir"], out, partitioned=True, run_id="t")
    seen = 0
    for batch in iter_training_batches(out, batch_size=128, min_tokens=1, seed=7):
        assert set(batch.column_names) == {"conv_id", "turn_idx", "role", "text", "tokens"}
        assert (batch["tokens"].to_numpy(zero_copy_only=False) >= 1).all()
        seen += len(batch)
    assert seen == oracle_final.num_rows  # every published row fed exactly once


def test_sequence_packing_conserves_tokens(ray_session):
    """Packed windows are exactly seq_len wide; total non-pad ids equal
    per-batch (tokens + one SEP per doc); ids stay inside the vocab."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from odibel_ray.pipelines.training_feed import PAD_ID, SEP_ID, pack_sequences

    texts = [f"tok{i} " * (i % 7 + 1) for i in range(200)]
    t = pa.table({"text": pa.array([s.strip() for s in texts])})
    ds = rd.from_arrow(t)
    rows = pack_sequences(ds, seq_len=64, vocab_size=1000, batch_size=50).take_all()
    total_real = sum(r["n_real"] for r in rows)
    expect_tokens = sum(len(s.strip().split(" ")) for s in texts) + len(texts)  # + SEPs
    assert total_real == expect_tokens
    for r in rows:
        ids = np.asarray(r["input_ids"])
        assert len(ids) == 64
        assert ids.max() < 1000 and ids.min() >= PAD_ID
        # non-pad prefix, pad suffix only
        pad_at = np.flatnonzero(ids == PAD_ID)
        if len(pad_at):
            assert pad_at[0] == r["n_real"]
    assert any((np.asarray(r["input_ids"]) == SEP_ID).any() for r in rows)


def test_lineage_table(ray_session, small_log, tmp_path):
    from odibel_ray.cdc.sink import lineage_table

    out = str(tmp_path / "tbl")
    replay_publish(small_log["log_dir"], out, partitioned=True, run_id="lin")
    t = lineage_table(out)
    assert len(t) == small_log["num_parts"]
    assert t["n_events"].to_pylist() >= t["rows_out"].to_pylist()
    assert all(l >= 0 for l in t["applied_lsn"].to_pylist())
