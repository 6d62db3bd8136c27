"""CLI surface: registry listing, point lookup, pipe ingest with metrics."""

import json
import os

from odibel_ray.cli import main


def test_cli_list_queries(capsys):
    assert main(["list-queries"]) == 0
    out = capsys.readouterr().out
    assert "transcript_replay" in out
    assert "transcript_point_lookup" in out
    # every line is classified
    kinds = {line.split()[-1] for line in out.strip().splitlines()}
    assert kinds <= {"sql-oracle", "rows-only"}


def test_cli_lookup_point_read(ray_session, small_log, oracle_final, tmp_path, capsys):
    from odibel_ray.cdc.sink import replay_publish

    out_dir = str(tmp_path / "tbl")
    replay_publish(small_log["log_dir"], out_dir, num_buckets=4, run_id="r1")
    conv = oracle_final["conv_id"][0].as_py()
    want = len(
        [c for c in oracle_final["conv_id"].to_pylist() if c == conv]
    )

    assert main(["lookup", "--table", out_dir, "--conv-id", conv]) == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    rows = [json.loads(l) for l in lines]
    assert len(rows) == want
    assert all(r["conv_id"] == conv for r in rows)

    # single-turn variant
    turn = rows[0]["turn_idx"]
    assert main(
        ["lookup", "--table", out_dir, "--conv-id", conv, "--turn-idx", str(turn)]
    ) == 0
    one = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines() if l]
    assert len(one) == 1 and one[0]["turn_idx"] == turn


def test_cli_tail_stream_with_metrics(ray_session, small_log, tmp_path, capsys):
    """tail-stream over a pipe converges the table and the task-side metrics
    actor ends with the applied-event totals."""
    import glob

    import pyarrow.parquet as pq
    import ray

    from odibel_ray.cdc.sink import read_published
    from odibel_ray.monitor import metrics_actor

    # serialize the log to JSONL, LSN-ordered (the deterministic pipe)
    files = sorted(glob.glob(os.path.join(small_log["log_dir"], "part=*", "*.parquet")))
    rows = []
    for f in files:
        part = int(os.path.basename(os.path.dirname(f)).split("=", 1)[1])
        t = pq.read_table(f)
        for r in t.to_pylist():
            r["part"] = part
            rows.append(r)
    rows.sort(key=lambda r: (r["lsn"], r["part"]))
    payload = "\n".join(json.dumps(r, default=str) for r in rows) + "\n"
    pipe = str(tmp_path / "events.jsonl")
    with open(pipe, "w") as f:
        f.write(payload)

    table = str(tmp_path / "table")
    spool = str(tmp_path / "spool")
    rc = main([
        "tail-stream", "--in", pipe, "--table", table, "--spool", spool,
        "--num-parts", "4", "--num-buckets", "4", "--heartbeat", "0",
        "--metrics", "cli-tail-metrics",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows_total"] == read_published(table).count() > 0

    import time

    snap = {}
    for _ in range(100):  # fire-and-forget updates may still be in flight
        snap = ray.get(metrics_actor("cli-tail-metrics").snapshot.remote())
        if snap.get("buckets_staged", 0) >= 4:
            break
        time.sleep(0.05)
    assert snap["buckets_staged"] >= 4
    assert snap["events"] > 0 and snap["rows"] > 0
    ray.kill(metrics_actor("cli-tail-metrics"))


def test_cli_derived_create_and_refresh(ray_session, small_log, tmp_path, capsys):
    """create-derived then incremental --feed-lsn then refresh-derived
    --strategy feed: the CLI covers the whole derived-table lifecycle."""
    from odibel_ray.cdc.sink import replay_publish
    from odibel_ray.datagen import split_log
    from odibel_ray.oracle import replay_oracle

    prefix = str(tmp_path / "prefix")
    split_log(small_log["log_dir"], prefix, frac=0.6)
    base = str(tmp_path / "base")
    replay_publish(os.path.join(prefix, "change_log"), base, num_buckets=4, run_id="r1")
    out = str(tmp_path / "dt")
    transform = json.dumps(
        {"where": [["score", ">=", 0.5]], "columns": ["role", "score"],
         "derive": {"text_len": ["len", "text"]}}
    )
    assert main(["create-derived", "--table", base, "--out", out,
                 "--transform", transform, "--num-buckets", "4"]) == 0
    created = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert created["base_version"] == 1

    feed = str(tmp_path / "feed")
    assert main(["incremental", "--log", small_log["log_dir"], "--table", base,
                 "--feed-dir", feed, "--feed-values", "role,score,text",
                 "--feed-lsn"]) == 0
    capsys.readouterr()
    assert main(["refresh-derived", "--out", out, "--strategy", "feed",
                 "--feed", feed]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["refreshed"] and res["strategy"] == "feed"

    from odibel_ray.cdc.derived import read_derived

    got = read_derived(out).to_pandas()
    oracle = replay_oracle(small_log["log_dir"]).to_pandas()
    assert len(got) == int((oracle["score"] >= 0.5).sum())


def test_cli_scan_with_where(ray_session, small_log, tmp_path, capsys):
    """scan --where prints matching rows plus a prune-stats summary line."""
    from odibel_ray.cdc.sink import replay_publish

    base = str(tmp_path / "base")
    replay_publish(small_log["log_dir"], base, num_buckets=4, run_id="r1")
    assert main(["scan", "--table", base,
                 "--where", '[["score",">=",0.5],["turn_idx","<",2]]',
                 "--columns", "conv_id,turn_idx,score", "--limit", "2"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(lines[-1])
    assert summary["files_total"] == 4 and summary["rows"] > 0
    for row in (json.loads(ln) for ln in lines[:-1]):
        assert row["score"] >= 0.5 and row["turn_idx"] < 2


def test_cli_savepoint_lifecycle(ray_session, small_log, tmp_path, capsys):
    from odibel_ray.cdc.sink import replay_publish

    base = str(tmp_path / "base")
    replay_publish(small_log["log_dir"], base, num_buckets=4, run_id="r1")
    sp = str(tmp_path / "rel1")
    assert main(["savepoint", "--path", sp, "--table", f"bronze={base}"]) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["tables"]["bronze"]["version"] == 1
    assert main(["savepoint", "--path", sp, "--drop"]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["pins_dropped"] == 1


def test_cli_alter_published(ray_session, tmp_path, capsys):
    import pyarrow as pa
    import ray.data as rd

    from odibel_ray.cdc.sink import publish_dataset, read_published

    out = str(tmp_path / "t")
    publish_dataset(rd.from_arrow(pa.table({"k": ["a"], "v": [1.0]})), out,
                    key_cols=["k"], num_buckets=2, run_id="p1")
    assert main(["alter", "--table", out, "--rename", "v=value",
                 "--add", "note:string"]) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["logical_columns"] == ["k", "value", "note"]
    assert read_published(out).schema().names == ["k", "value", "note"]


def test_cli_alter_materialize(ray_session, tmp_path, capsys):
    import pyarrow as pa
    import ray.data as rd

    from odibel_ray.cdc.sink import publish_dataset, read_published

    out = str(tmp_path / "tm")
    publish_dataset(rd.from_arrow(pa.table({"k": ["a"], "v": [1.0]})), out,
                    key_cols=["k"], num_buckets=1, run_id="p1")
    assert main(["alter", "--table", out, "--rename", "v=value", "--materialize"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert json.loads(lines[-1])["materialized"] == 1
    assert json.loads(lines[-2])["logical_columns"] == ["k", "value"]
    assert read_published(out).schema().names == ["k", "value"]


def test_cli_sync_and_expect(ray_session, small_log, tmp_path, capsys):
    import pyarrow as pa
    import ray.data as rd

    from odibel_ray.cdc import create_derived, incremental_apply, replay_publish
    from odibel_ray.cdc.sink import publish_dataset, read_published
    from odibel_ray.datagen import split_log

    prefix = str(tmp_path / "prefix")
    split_log(small_log["log_dir"], prefix, frac=0.6)
    bronze = str(tmp_path / "bronze")
    replay_publish(os.path.join(prefix, "change_log"), bronze, num_buckets=4, run_id="r1")
    silver = str(tmp_path / "silver")
    create_derived(bronze, silver,
                   transform={"where": [["score", ">=", 0.5]],
                              "columns": ["role", "score"], "derive": {}},
                   num_buckets=4, run_id="d0")
    incremental_apply(small_log["log_dir"], bronze, run_id="r2")
    assert main(["sync", silver, "--chain-feeds", "--run-id", "s1"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["order"] == [silver] and out["results"][silver]["refreshed"]

    gen = str(tmp_path / "g")
    publish_dataset(rd.from_arrow(pa.table({"k": ["a"], "v": [1.0]})), gen,
                    key_cols=["k"], num_buckets=1, run_id="p1")
    assert main(["expect", "--table", gen, "--set", '[["v", ">=", 0.0]]']) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["clauses"] == 1
    assert main(["expect", "--table", gen]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["where"] == [["v", ">=", 0.0]]
    assert main(["expect", "--table", gen, "--drop"]) == 0


def test_cli_delete_and_update(ray_session, small_log, tmp_path, capsys):
    """delete/update run predicate DML through the CLI and report counts."""
    from odibel_ray.cdc.sink import publish_dataset, read_published, replay_publish

    base = str(tmp_path / "base")
    out = str(tmp_path / "tbl")
    replay_publish(small_log["log_dir"], base, num_buckets=4, run_id="r1")
    publish_dataset(read_published(base), out,
                    key_cols=["conv_id", "turn_idx"], num_buckets=4, run_id="g1")
    n0 = read_published(out).count()

    assert main(["delete", "--table", out,
                 "--where", '[["score","<",0.3]]']) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows_deleted"] > 0
    assert read_published(out).count() == n0 - res["rows_deleted"]

    assert main(["update", "--table", out,
                 "--set", '{"tool_name": "REDACTED", "text": ["upper", "text"]}',
                 "--where", '[["role","==","tool"]]']) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows_updated"] > 0
    got = read_published(out, where=[("role", "==", "tool")])
    assert all(r["tool_name"] == "REDACTED" for r in got.take_all())


def test_cli_merge(ray_session, tmp_path, capsys):
    """merge runs a conditional MERGE INTO through the CLI (JSON clause
    lists; ["s"|"t", col] pairs are column refs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from odibel_ray.cdc.sink import publish_dataset, read_published

    out = str(tmp_path / "tbl")
    publish_dataset(
        rd.from_arrow(pa.table({"k": ["a", "b"], "v": [1, 2], "score": [0.1, 0.9]})),
        out, key_cols=["k"], num_buckets=2, run_id="g1")
    src = str(tmp_path / "src.parquet")
    pq.write_table(pa.table({"k": ["a", "b", "c"], "v": [10, 20, 30],
                             "score": [0.95, 0.2, 0.5]}), src)

    assert main([
        "merge", "--table", out, "--source", src,
        "--matched-cond", '[[["t","score"],"<",["s","score"]]]',
    ]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (res["rows_updated"], res["rows_inserted"]) == (1, 1)
    got = sorted((r["k"], r["v"]) for r in read_published(out).take_all())
    assert got == [("a", 10), ("b", 2), ("c", 30)]
