"""CLI: pipeline composition surface (the reference's picocli/click subcommand
trees, SURVEY.md §2.10 — ``odibel dbpedia-tkg split|extract|…`` /
``pyodibel rdf run``).

    python -m odibel_ray.cli datagen --out /tmp/log --n-convs 1000
    python -m odibel_ray.cli replay  --log /tmp/log/change_log --out /tmp/out.parquet
    python -m odibel_ray.cli publish --log ... --table /tmp/table [--resume]
    python -m odibel_ray.cli incremental --log ... --table /tmp/table
    python -m odibel_ray.cli query --name pricing_summary --sf-dir /root/testdata/sf0.01

Owns the Ray session (guarded init) — library code never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.shuffle_strategy = "sort_shuffle_push_based"  # faster groupby (measured)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="odibel_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("datagen", help="generate a deterministic transcript change log")
    g.add_argument("--out", required=True)
    g.add_argument("--n-convs", type=int, default=1000)
    g.add_argument("--max-turns", type=int, default=30)
    g.add_argument("--num-parts", type=int, default=8)
    g.add_argument("--seed", type=int, default=42)

    r = sub.add_parser("replay", help="replay a change log to the converged table")
    r.add_argument("--log", required=True)
    r.add_argument("--out", required=True, help="output parquet directory")
    r.add_argument("--mode", choices=["partitioned", "shuffle", "actor"], default="partitioned")
    r.add_argument("--num-buckets", type=int, default=None)
    r.add_argument("--salt", type=int, default=None)
    r.add_argument("--history", action="store_true")

    p = sub.add_parser("publish", help="replay through the exactly-once sink")
    p.add_argument("--log", required=True)
    p.add_argument("--table", required=True)
    p.add_argument("--num-buckets", type=int, default=None)
    p.add_argument("--partitioned", action="store_true")
    p.add_argument("--run-id", default="cli-run")
    p.add_argument("--metrics", default=None,
                   help="named live counter actor for task-side progress")
    p.add_argument("--snapshots", type=int, default=None,
                   help="enable time travel: retain the newest N table versions")

    i = sub.add_parser("incremental", help="apply new log events onto a published table")
    i.add_argument("--log", required=True)
    i.add_argument("--table", required=True)
    i.add_argument("--run-id", default="cli-inc")
    i.add_argument("--metrics", default=None,
                   help="named live counter actor for task-side progress")
    i.add_argument("--mode", choices=("cow", "mor"), default="cow",
                   help="cow rewrites touched buckets; mor stages per-bucket "
                        "delta files (merge-on-read) — fold them back with "
                        "'compact'")
    i.add_argument("--snapshots", type=int, default=None,
                   help="enable time travel: retain the newest N table versions")
    i.add_argument("--feed-dir", default=None,
                   help="also emit the run's change-data-feed here (a "
                        "materialized view's delta refresh consumes it)")
    i.add_argument("--feed-values", default=None,
                   help="comma-separated columns the feed carries/compares "
                        "(default: text)")
    i.add_argument("--feed-lsn", action="store_true",
                   help="add the _lsn ordering column to the feed (lets "
                        "refresh-derived --strategy feed consume telescoped "
                        "state files)")

    co = sub.add_parser(
        "compact", help="fold merge-on-read deltas back into bucket base files"
    )
    co.add_argument("--table", required=True)
    co.add_argument("--run-id", default="cli-compact")
    co.add_argument("--min-deltas", type=int, default=1)
    co.add_argument("--metrics", default=None,
                    help="named live counter actor for task-side progress")

    a = sub.add_parser("advise", help="detect hot keys and suggest a salt factor")
    a.add_argument("--log", required=True)
    a.add_argument("--num-buckets", type=int, default=64)

    q = sub.add_parser("query", help="run a named pipeline from the registry")
    q.add_argument("--name", required=True)
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=10)

    sub.add_parser("list-queries", help="list registry entries")

    t = sub.add_parser(
        "tail-stream",
        help="pipe JSONL change events ('-' = stdin) into a published table",
    )
    t.add_argument("--in", dest="input", default="-",
                   help="'-' (stdin), a file, or file.gz/bz2/zst")
    t.add_argument("--table", required=True)
    t.add_argument("--spool", required=True,
                   help="WAL spool directory for the micro-batches")
    t.add_argument("--num-parts", type=int, default=8)
    t.add_argument("--batch-rows", type=int, default=65536)
    t.add_argument("--num-buckets", type=int, default=16)
    t.add_argument("--heartbeat", type=float, default=10.0,
                   help="live events/s report interval in seconds (0 = off)")
    t.add_argument("--metrics", default=None,
                   help="name of a live counter actor the distributed apply "
                        "tasks update bucket-by-bucket (watch it from another "
                        "process via odibel_ray.monitor.metrics_actor)")
    t.add_argument("--mode", choices=("cow", "mor"), default="cow",
                   help="mor upserts each micro-batch as merge-on-read deltas")
    t.add_argument("--compact-every", type=int, default=0,
                   help="with --mode mor: fold deltas into the bases after "
                        "every K applies (and at stream end)")
    t.add_argument("--format", dest="fmt", choices=("native", "debezium"),
                   default="native",
                   help="debezium: ingest Debezium change-event envelopes "
                        "(op c/u/d/r, before/after row images, source.lsn)")
    t.add_argument("--snapshots", type=int, default=None,
                   help="retain the newest N table versions while tailing")

    lk = sub.add_parser(
        "lookup", help="point-read one conv_id from a published table"
    )
    lk.add_argument("--table", required=True)
    lk.add_argument("--conv-id", required=True)
    lk.add_argument("--turn-idx", type=int, default=None)

    sc = sub.add_parser(
        "scan",
        help="read a published table with zone-map data skipping "
             "(footer-stats file pruning + scan predicate pushdown)",
    )
    sc.add_argument("--table", required=True)
    sc.add_argument("--where", default=None,
                    help='conjunctive predicate as JSON, e.g. '
                         '\'[["conv_id","<","conv_00000010"],["score",">=",0.5]]\'')
    sc.add_argument("--columns", default=None, help="comma-separated projection")
    sc.add_argument("--version", type=int, default=None, help="time travel")
    sc.add_argument("--limit", type=int, default=10, help="rows to print (0: none)")

    tb = sub.add_parser(
        "tables", help="catalog every published table under a root: kind, "
                       "rows, delta backlog, snapshots, stats freshness, "
                       "upstreams (metadata-only)"
    )
    tb.add_argument("--root", required=True)

    kg = sub.add_parser(
        "kg", help="the catalog/lineage as a knowledge graph: one N-Triples "
                   "line per fact (typed table entities, state literals, "
                   "upstream edges; metadata-only)"
    )
    kg.add_argument("--root", required=True)

    mt = sub.add_parser(
        "maintain", help="one-call table maintenance: compact MOR deltas, "
                         "tighten snapshot retention, vacuum, stats health"
    )
    mt.add_argument("--table", required=True)
    mt.add_argument("--min-deltas", type=int, default=8)
    mt.add_argument("--keep-snapshots", type=int, default=None)
    mt.add_argument("--stats-feed", default=None)
    mt.add_argument("--run-id", default="cli-maintain")

    cl = sub.add_parser(
        "clone", help="shallow CLONE a published table (hardlinked data "
                      "files, independent metadata; --version for AS OF)"
    )
    cl.add_argument("--src", required=True)
    cl.add_argument("--dst", required=True)
    cl.add_argument("--version", type=int, default=None)
    cl.add_argument("--run-id", default="cli-clone")

    an = sub.add_parser(
        "analyze", help="compute + persist per-column statistics (nulls, "
                        "min/max, NDV) for a published table"
    )
    an.add_argument("--table", required=True)
    an.add_argument("--columns", default=None, help="comma-separated subset")
    an.add_argument("--method", choices=["hll", "exact"], default="hll")

    dl = sub.add_parser(
        "delete", help="DELETE FROM a published table WHERE a predicate holds"
    )
    dl.add_argument("--table", required=True)
    dl.add_argument("--where", required=True,
                    help='conjunctive predicate as JSON, e.g. '
                         '\'[["score","<",0.3]]\'')
    dl.add_argument("--run-id", default="cli-delete")
    dl.add_argument("--mode", choices=["cow", "mor"], default="cow")
    dl.add_argument("--feed-dir", default=None)

    up = sub.add_parser(
        "update", help="UPDATE a published table SET assignments WHERE a predicate holds"
    )
    up.add_argument("--table", required=True)
    up.add_argument("--set", required=True, dest="assign",
                    help='assignments as JSON: literals or [fn, src] pairs, '
                         'e.g. \'{"tool_name": "REDACTED", "text": ["upper", "text"]}\'')
    up.add_argument("--where", default=None,
                    help="conjunctive predicate as JSON (omit to touch every row)")
    up.add_argument("--run-id", default="cli-update")
    up.add_argument("--mode", choices=["cow", "mor"], default="cow")
    up.add_argument("--feed-dir", default=None)

    mg = sub.add_parser(
        "merge", help="MERGE INTO a published table USING a Parquet source"
    )
    mg.add_argument("--table", required=True)
    mg.add_argument("--source", required=True,
                    help="Parquet file/dir of source rows (full logical rows)")
    mg.add_argument("--when-matched", choices=["update", "delete", "none"],
                    default="update")
    mg.add_argument("--matched-cond", default=None,
                    help='conjunctive clauses as JSON; column refs are '
                         '["s"|"t", col] pairs, e.g. \'[[["t","ts"],"<",["s","ts"]]]\'')
    mg.add_argument("--when-not-matched", choices=["insert", "none"],
                    default="insert")
    mg.add_argument("--not-matched-cond", default=None)
    mg.add_argument("--when-not-matched-by-source", choices=["delete", "none"],
                    default="none")
    mg.add_argument("--not-matched-by-source-cond", default=None)
    mg.add_argument("--run-id", default="cli-merge")
    mg.add_argument("--mode", choices=["cow", "mor"], default="cow")
    mg.add_argument("--feed-dir", default=None)

    v = sub.add_parser(
        "vacuum",
        help="sweep staging dirs/orphan data files; prune old feed states",
    )
    v.add_argument("--table", required=True)
    v.add_argument("--feed", default=None)
    v.add_argument("--keep-feed-states", type=int, default=3)
    v.add_argument("--keep-snapshots", type=int, default=None,
                   help="also expire retained table versions beyond the newest N")

    sn = sub.add_parser(
        "snapshots", help="list a table's retained time-travel versions"
    )
    sn.add_argument("--table", required=True)

    al = sub.add_parser(
        "alter",
        help="metadata-only schema DDL on a generic published table "
             "(add/rename/drop without touching data files)",
    )
    al.add_argument("--table", required=True)
    al.add_argument("--add", action="append", default=[], help="name:type (repeatable)")
    al.add_argument("--rename", action="append", default=[], help="old=new (repeatable)")
    al.add_argument("--drop", action="append", default=[], help="column (repeatable)")
    al.add_argument(
        "--widen", action="append", default=[],
        help="name:wider_type, value-preserving promotion (repeatable)",
    )
    al.add_argument(
        "--materialize", action="store_true",
        help="rewrite the data files to the logical schema and clear the op "
             "log (after applying any alters given in this call)",
    )

    sp = sub.add_parser(
        "savepoint",
        help="pin one consistent version cut across several published tables "
             "(pinned versions survive retention until the savepoint is dropped)",
    )
    sp.add_argument("--path", required=True, help="savepoint manifest path")
    sp.add_argument("--table", action="append", default=[],
                    help="label=dir member (repeatable)")
    sp.add_argument("--drop", action="store_true", help="release the pins instead")
    sp.add_argument("--restore", action="store_true",
                    help="roll every member table back to its pinned version")

    rs = sub.add_parser(
        "restore", help="roll the live table back to a retained version"
    )
    rs.add_argument("--table", required=True)
    rs.add_argument("--version", type=int, required=True)
    rs.add_argument("--run-id", default="cli-restore")

    df = sub.add_parser(
        "diff", help="row-level changes between two retained table versions"
    )
    df.add_argument("--table", required=True)
    df.add_argument("--from-version", type=int, required=True)
    df.add_argument("--to-version", type=int, default=None,
                    help="default: the live table")
    df.add_argument("--limit", type=int, default=20)

    de = sub.add_parser(
        "describe",
        help="physical table health: rows/bytes, delta backlog, bucket skew",
    )
    de.add_argument("--table", required=True)
    de.add_argument("--buckets", action="store_true",
                    help="include the per-bucket breakdown")

    fk = sub.add_parser(
        "fsck",
        help="integrity check: manifests vs files, snapshot refs, schema "
             "uniformity, stale leases (metadata + footers only)",
    )
    fk.add_argument("--table", required=True)

    cv = sub.add_parser(
        "create-view",
        help="materialize an aggregate view over a published table",
    )
    cv.add_argument("--table", required=True, help="base table directory")
    cv.add_argument("--view", required=True, help="view output directory")
    cv.add_argument("--group-keys", required=True, help="comma-separated")
    cv.add_argument(
        "--aggs", required=True,
        help='JSON, e.g. \'{"n": ["count", ""], "s": ["sum", "score"]}\'',
    )
    cv.add_argument("--num-buckets", type=int, default=None)
    cv.add_argument("--run-id", default="cli-view")

    rv = sub.add_parser(
        "refresh-view",
        help="incrementally converge a view to the base's latest state",
    )
    rv.add_argument("--view", required=True)
    rv.add_argument("--strategy", choices=("rescan", "delta"), default="rescan")
    rv.add_argument("--feed", default=None,
                    help="write-time CDF dir (incremental --feed-dir); "
                         "default: snapshot diff")
    rv.add_argument("--run-id", default="cli-refresh")

    cd = sub.add_parser(
        "create-derived",
        help="materialize a row-level derived (filter/project/derive) table",
    )
    cd.add_argument("--table", required=True, help="base table directory")
    cd.add_argument("--out", required=True, help="derived table output directory")
    cd.add_argument(
        "--transform", required=True,
        help='JSON, e.g. \'{"where": [["score", ">=", 0.5]], '
             '"columns": ["role"], "derive": {"text_len": ["len", "text"]}}\'',
    )
    cd.add_argument("--num-buckets", type=int, default=None)
    cd.add_argument("--run-id", default="cli-derived")

    rd_ = sub.add_parser(
        "refresh-derived",
        help="incrementally converge a derived table to the base's latest state",
    )
    rd_.add_argument("--out", required=True, help="derived table directory")
    rd_.add_argument("--strategy", choices=("rescan", "feed"), default="rescan")
    rd_.add_argument("--feed", default=None,
                     help="write-time CDF dir (incremental --feed-dir); "
                          "default: snapshot diff")
    rd_.add_argument("--run-id", default="cli-refresh")

    sy = sub.add_parser(
        "sync",
        help="refresh a DAG of maintained tables (derived/mview/joinview) "
             "in dependency order, optionally as a feed cascade",
    )
    sy.add_argument("tables", nargs="*", help="maintained table directories")
    sy.add_argument("--root", default=None,
                    help="discover every maintained table under this root "
                         "(catalog walk) instead of listing them")
    sy.add_argument("--chain-feeds", action="store_true",
                    help="each hop emits its own change feed for the next "
                         "(skips snapshot diffs when pins line up)")
    sy.add_argument("--savepoint", default=None,
                    help="pin one consistent post-refresh cut across all tables")
    sy.add_argument("--parallel", type=int, default=1,
                    help="refresh independent DAG levels with this many "
                         "concurrent node refreshes")
    sy.add_argument("--run-id", default="cli-sync")

    ex = sub.add_parser(
        "expect",
        help="attach / inspect / drop a CHECK constraint on a generic table",
    )
    ex.add_argument("--table", required=True)
    ex.add_argument("--set", dest="set_where", default=None,
                    help='JSON clauses, e.g. \'[["score", ">=", 0.0]]\'')
    ex.add_argument("--drop", action="store_true")

    args = ap.parse_args(argv)

    if args.cmd == "datagen":
        from odibel_ray.datagen import generate_change_log

        info = generate_change_log(
            args.out, n_convs=args.n_convs, max_turns=args.max_turns,
            num_parts=args.num_parts, seed=args.seed,
        )
        print(json.dumps(info))
        return 0

    if args.cmd == "vacuum":  # metadata-only, no Ray session needed
        from odibel_ray.cdc.sink import vacuum

        print(json.dumps(vacuum(
            args.table, feed_dir=args.feed,
            keep_feed_states=args.keep_feed_states,
            keep_snapshots=args.keep_snapshots,
        )))
        return 0

    if args.cmd == "snapshots":  # metadata-only, no Ray session needed
        from odibel_ray.cdc.sink import list_snapshots, snapshot_policy

        print(json.dumps({
            "keep_last": snapshot_policy(args.table),
            "versions": [
                {k: s[k] for k in ("version", "op", "unix_ts", "rows_total")}
                for s in list_snapshots(args.table)
            ],
        }))
        return 0

    if args.cmd == "restore":  # metadata-only, no Ray session needed
        from odibel_ray.cdc.sink import restore_snapshot

        print(json.dumps(restore_snapshot(args.table, args.version, run_id=args.run_id)))
        return 0

    if args.cmd == "fsck":  # metadata-only, no Ray session needed
        from odibel_ray.cdc.sink import fsck_table

        res = fsck_table(args.table)
        print(json.dumps(res))
        return 0 if res["ok"] else 1

    if args.cmd == "tables":  # metadata-only, no Ray session needed
        from odibel_ray.cdc.maintain import catalog

        for row in catalog(args.root):
            print(json.dumps(row))
        return 0

    if args.cmd == "kg":  # metadata-only, no Ray session needed
        from odibel_ray.cdc.maintain import system_kg

        for r in system_kg(args.root).to_pylist():
            print(f"{r['s']} {r['p']} {r['o']} .")
        return 0

    if args.cmd == "describe":  # metadata-only, no Ray session needed
        from odibel_ray.cdc.analyze import load_column_stats
        from odibel_ray.cdc.sink import table_stats

        stats = table_stats(args.table)
        if not args.buckets:
            stats.pop("buckets", None)
        col = load_column_stats(args.table)
        if col is not None:  # ANALYZE output, without the bulky registers
            stats["column_stats"] = {
                c: {k: v for k, v in s.items() if k != "hll"}
                for c, s in col.items()
            }
        print(json.dumps(stats, default=str))
        return 0

    if args.cmd == "list-queries":
        from odibel_ray.pipelines.queries import QUERIES, _oracles_for

        oracles = _oracles_for("/root/testdata/sf0.01")
        for name in QUERIES:
            kind = "sql-oracle" if name in oracles else "rows-only"
            print(f"{name:34s} {kind}")
        return 0

    _ray_init(args.num_cpus)

    if args.cmd == "replay":
        from odibel_ray.cdc.apply import (
            replay_dataset,
            replay_dataset_actor,
            replay_partitioned,
        )

        if args.mode == "partitioned":
            if args.salt is not None or args.num_buckets is not None:
                ap.error("--salt/--num-buckets are not supported with --mode partitioned")
            ds = replay_partitioned(args.log, history=args.history)
        elif args.mode == "actor":
            if args.salt is not None:
                ap.error("--salt is not supported with --mode actor")
            ds = replay_dataset_actor(
                args.log, num_buckets=args.num_buckets, history=args.history
            )
        else:
            ds = replay_dataset(
                args.log, num_buckets=args.num_buckets, salt=args.salt,
                history=args.history,
            )
        ds.write_parquet(args.out)
        print(json.dumps({"out": args.out}))
        return 0

    if args.cmd == "publish":
        from odibel_ray.cdc.sink import replay_publish

        res = replay_publish(
            args.log, args.table, num_buckets=args.num_buckets,
            partitioned=args.partitioned, run_id=args.run_id,
            metrics=args.metrics, snapshots=args.snapshots,
        )
        print(json.dumps(res))
        return 0

    if args.cmd == "lookup":
        from odibel_ray.cdc.sink import lookup_key

        t = lookup_key(args.table, args.conv_id, turn_idx=args.turn_idx)
        for row in t.to_pylist():
            print(json.dumps(row, default=str))
        return 0

    if args.cmd == "alter":
        from odibel_ray.cdc.ddl import alter_published, materialize_ddl

        if not (args.add or args.rename or args.drop or args.widen or args.materialize):
            ap.error("alter: pass --add/--rename/--drop/--widen and/or --materialize")
        if args.add or args.rename or args.drop or args.widen:
            print(json.dumps(alter_published(
                args.table,
                add=dict(kv.split(":", 1) for kv in args.add) or None,
                rename=dict(kv.split("=", 1) for kv in args.rename) or None,
                drop=args.drop or None,
                widen=dict(kv.split(":", 1) for kv in args.widen) or None,
            )))
        if args.materialize:
            print(json.dumps(materialize_ddl(args.table)))
        return 0

    if args.cmd == "savepoint":  # metadata-only, no Ray session needed
        from odibel_ray.cdc.savepoint import (
            create_savepoint,
            drop_savepoint,
            restore_savepoint,
        )

        if args.drop and args.restore:
            ap.error("--drop and --restore are mutually exclusive")
        if args.restore:
            print(json.dumps(restore_savepoint(args.path)))
            return 0
        if args.drop:
            print(json.dumps(drop_savepoint(args.path)))
            return 0
        tables = dict(kv.split("=", 1) for kv in args.table)
        print(json.dumps(create_savepoint(args.path, tables)))
        return 0

    if args.cmd == "scan":
        from odibel_ray.cdc.sink import read_published

        stats: dict = {}
        ds = read_published(
            args.table,
            system=True,
            where=json.loads(args.where) if args.where else None,
            columns=args.columns.split(",") if args.columns else None,
            version=args.version,
            prune_stats=stats if args.where else None,
        )
        for row in ds.take(args.limit) if args.limit else ():
            print(json.dumps(row, default=str))
        print(json.dumps({"rows": ds.count(), **stats}))
        return 0

    if args.cmd == "clone":  # metadata-only, no Ray session needed
        from odibel_ray.cdc.maintain import clone_table

        res = clone_table(args.src, args.dst, version=args.version,
                          run_id=args.run_id)
        print(json.dumps(res, default=str))
        return 0

    if args.cmd == "maintain":
        from odibel_ray.cdc.maintain import maintain_table

        report = maintain_table(
            args.table,
            compact_min_deltas=args.min_deltas,
            keep_snapshots=args.keep_snapshots,
            stats_feed=args.stats_feed,
            run_id=args.run_id,
        )
        print(json.dumps(report, default=str))
        return 0

    if args.cmd == "analyze":
        from odibel_ray.cdc.analyze import analyze_published

        stats = analyze_published(
            args.table,
            columns=args.columns.split(",") if args.columns else None,
            method=args.method,
        )
        print(json.dumps(stats, default=str))
        return 0

    if args.cmd == "delete":
        from odibel_ray.cdc.dml import delete_published

        res = delete_published(
            args.table, json.loads(args.where), run_id=args.run_id,
            mode=args.mode, feed_dir=args.feed_dir,
        )
        print(json.dumps(res, default=str))
        return 0

    if args.cmd == "update":
        from odibel_ray.cdc.dml import update_published

        assign = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in json.loads(args.assign).items()
        }
        res = update_published(
            args.table, assign, json.loads(args.where) if args.where else [],
            run_id=args.run_id, mode=args.mode, feed_dir=args.feed_dir,
        )
        print(json.dumps(res, default=str))
        return 0

    if args.cmd == "merge":
        import ray.data as rd

        from odibel_ray.cdc.dml import merge_published

        def cond(arg):
            if arg is None:
                return None
            # JSON has no tuples: ["s"|"t", col] lists become column refs,
            # each clause list becomes a tuple
            return [
                tuple(tuple(o) if isinstance(o, list) else o for o in cl)
                for cl in json.loads(arg)
            ]

        res = merge_published(
            rd.read_parquet(args.source), args.table,
            when_matched=None if args.when_matched == "none" else args.when_matched,
            matched_condition=cond(args.matched_cond),
            when_not_matched=(None if args.when_not_matched == "none"
                              else args.when_not_matched),
            not_matched_condition=cond(args.not_matched_cond),
            when_not_matched_by_source=(
                None if args.when_not_matched_by_source == "none"
                else args.when_not_matched_by_source),
            not_matched_by_source_condition=cond(args.not_matched_by_source_cond),
            run_id=args.run_id, mode=args.mode, feed_dir=args.feed_dir,
        )
        print(json.dumps(res, default=str))
        return 0

    if args.cmd == "diff":
        from odibel_ray.cdc.sink import table_changes

        ds = table_changes(args.table, args.from_version, args.to_version)
        for row in ds.take(args.limit):
            print(json.dumps(row, default=str))
        return 0

    if args.cmd == "incremental":
        from odibel_ray.cdc.sink import incremental_apply

        res = incremental_apply(
            args.log, args.table, run_id=args.run_id,
            metrics=args.metrics, mode=args.mode, snapshots=args.snapshots,
            feed_dir=args.feed_dir,
            feed_values=(
                [c.strip() for c in args.feed_values.split(",")]
                if args.feed_values else None
            ),
            feed_lsn=args.feed_lsn,
        )
        print(json.dumps(res))
        return 0

    if args.cmd == "compact":
        from odibel_ray.cdc.sink import compact_published

        res = compact_published(args.table, run_id=args.run_id,
                                min_deltas=args.min_deltas,
                                metrics=args.metrics)
        print(json.dumps(res))
        return 0

    if args.cmd == "tail-stream":
        import logging

        mon_log = logging.getLogger("odibel_ray.monitor")
        mon_log.setLevel(logging.INFO)
        if not mon_log.handlers:  # INFO records need a real handler to print
            h = logging.StreamHandler()
            h.setFormatter(logging.Formatter("%(message)s"))
            mon_log.addHandler(h)
        from odibel_ray.sources.stream import tail_stream

        res = tail_stream(
            args.input, args.table, spool_dir=args.spool,
            num_parts=args.num_parts, batch_rows=args.batch_rows,
            num_buckets=args.num_buckets,
            heartbeat_interval_s=args.heartbeat,
            metrics=args.metrics,
            mode=args.mode,
            compact_every=args.compact_every,
            fmt=args.fmt,
            snapshots=args.snapshots,
        )
        res.pop("history", None)
        print(json.dumps(res))
        return 0

    if args.cmd == "create-view":
        from odibel_ray.cdc.mview import create_view

        res = create_view(
            args.table, args.view,
            group_keys=[k.strip() for k in args.group_keys.split(",")],
            aggs=json.loads(args.aggs),
            num_buckets=args.num_buckets, run_id=args.run_id,
        )
        print(json.dumps(res))
        return 0

    if args.cmd == "refresh-view":
        from odibel_ray.cdc.mview import refresh_view

        res = refresh_view(args.view, run_id=args.run_id,
                           strategy=args.strategy, feed=args.feed)
        print(json.dumps(res))
        return 0

    if args.cmd == "create-derived":
        from odibel_ray.cdc.derived import create_derived

        res = create_derived(
            args.table, args.out, transform=json.loads(args.transform),
            num_buckets=args.num_buckets, run_id=args.run_id,
        )
        print(json.dumps(res))
        return 0

    if args.cmd == "refresh-derived":
        from odibel_ray.cdc.derived import refresh_derived

        res = refresh_derived(args.out, run_id=args.run_id,
                              strategy=args.strategy, feed=args.feed)
        print(json.dumps(res))
        return 0

    if args.cmd == "sync":
        from odibel_ray.cdc.pipeline import refresh_pipeline

        tables = list(args.tables)
        if args.root:
            from odibel_ray.cdc.maintain import catalog

            tables += [
                r["table"] for r in catalog(args.root)
                if r["kind"] in ("derived", "mview", "joinview")
            ]
        if not tables:
            print("sync: no maintained tables given or discovered", file=sys.stderr)
            return 2
        res = refresh_pipeline(
            tables, run_id=args.run_id, chain_feeds=args.chain_feeds,
            savepoint=args.savepoint, max_parallel=args.parallel,
        )
        print(json.dumps({"order": res["order"],
                          "results": res["results"],
                          "savepoint": bool(res["savepoint"])}, default=str))
        return 0

    if args.cmd == "expect":
        from odibel_ray.cdc.quality import (
            drop_expectations,
            get_expectations,
            set_expectations,
        )

        if args.drop:
            drop_expectations(args.table)
            print(json.dumps({"dropped": True}))
        elif args.set_where:
            print(json.dumps(set_expectations(args.table, json.loads(args.set_where))))
        else:
            print(json.dumps({"where": get_expectations(args.table)}))
        return 0

    if args.cmd == "advise":
        from odibel_ray.cdc.apply import suggest_salt

        res = suggest_salt(args.log, num_buckets=args.num_buckets)
        print(json.dumps(res))
        return 0

    if args.cmd == "query":
        import pyarrow as pa

        from odibel_ray.pipelines.queries import QUERIES

        fn = QUERIES[args.name]
        res = fn(args.sf_dir)
        if isinstance(res, pa.Table):
            rows = res.slice(0, args.limit).to_pylist()
            n = res.num_rows
        else:
            rows = res.take(args.limit)
            n = res.count()
        print(json.dumps({"name": args.name, "rows": n, "head": rows}, default=str))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
