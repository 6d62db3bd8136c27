"""Binlog tailing: keep a published table converged as new change-log files
land — repeated watermark-filtered incremental applies (micro-batches).

The reference replays a static dump; the north rule asks for a *tail → lake
upsert* engine, so this is the long-running shape: each round scans the log
directory, applies only events beyond every partition's published LSN
watermark (idempotent — a crashed round re-applies nothing twice), and
publishes atomically. ``max_rounds``/``stop_when_idle`` bound the loop for
tests; in production the loop runs forever on a schedule.
"""

from __future__ import annotations

import time

from odibel_ray.cdc.sink import (
    compact_published,
    incremental_apply,
    load_manifests,
    replay_publish,
)


def tail_log(
    log_dir: str,
    out_dir: str,
    *,
    poll_interval_s: float = 0.0,
    max_rounds: int = 10,
    stop_when_idle: int = 1,
    run_prefix: str = "tail",
    heartbeat_interval_s: float = 0.0,
    metrics: str | None = None,
    mode: str = "cow",
    compact_every: int = 0,
    snapshots: int | None = None,
    downstream: list[str] | None = None,
    feed_values: list[str] | None = None,
    downstream_parallel: int = 1,
) -> dict:
    """Run incremental applies until ``stop_when_idle`` consecutive rounds saw
    no new events (or ``max_rounds``). Bootstraps with a full publish when the
    table does not exist yet. Returns round stats.

    ``heartbeat_interval_s > 0`` logs live applied-events/s through
    :class:`odibel_ray.monitor.ThroughputMonitor` (the reference prints the
    same signal every 10 s, ``log/HeartbeatMonitor.scala:54-70``).
    ``metrics``: name of a live counter actor the distributed apply tasks
    update as they stage buckets (:func:`odibel_ray.monitor.metrics_actor`)
    — unlike the driver-side heartbeat, its counters advance *inside* a
    round, so an operator (or another process) can watch a long apply make
    progress bucket by bucket.

    ``mode="mor"`` applies each round as merge-on-read deltas — the natural
    fit for a high-frequency tailer, where copy-on-write would rewrite every
    touched bucket every few seconds; ``compact_every=k`` then folds the
    accumulated deltas back into the bucket bases after every k applying
    rounds (bounding read amplification), plus once at loop exit.

    ``snapshots=k`` enables time travel on the tailed table: each applying
    round records a version and the newest k stay readable — "the table as
    of N rounds ago" for a continuously-converging lake table.

    ``downstream=[...]`` lists maintained tables (derived/mview/joinview
    dirs) to refresh in dependency order after every applying round
    (:func:`odibel_ray.cdc.pipeline.refresh_pipeline`) — the tailer keeps
    the whole medallion current, not just the bronze table. Snapshot-diff
    refreshes need ``snapshots`` ≥ 2 on this table so each round's pin
    survives to the next diff.

    ``feed_values=[...]`` (with ``downstream``) switches the sync to the
    feed cascade: downstream tables are converged ONCE up front (snapshot
    diff), then every applying round emits this table's write-time change
    feed (accumulated under ``<out_dir>/_feeds/<run_prefix>``, after-images
    of the listed columns + ``_lsn``) and the per-round refresh consumes it
    — plus ``chain_feeds`` between the downstream hops — so steady-state
    maintenance never re-reads or diffs the bronze table."""
    from odibel_ray.monitor import ThroughputMonitor

    import os
    import shutil

    rounds = []
    idle = 0
    applied_since_compact = 0
    feed_dir = None
    if downstream and feed_values is not None:
        if mode == "mor":
            raise ValueError(
                "feed_values needs the copy-on-write apply (the write-time "
                "feed is computed from state the CoW rewrite holds); use "
                "mode='cow' or drop feed_values"
            )
        feed_dir = os.path.join(out_dir, "_feeds", run_prefix)
        shutil.rmtree(feed_dir, ignore_errors=True)
        if load_manifests(out_dir):
            # converge downstream once up front so the accumulated per-round
            # feed provably covers every change past each consumer's pin
            from odibel_ray.cdc.pipeline import refresh_pipeline

            refresh_pipeline(downstream, run_id=f"{run_prefix}-ds-boot",
                             chain_feeds=True)

    def _sync_downstream(i: int) -> None:
        if not downstream:
            return
        from odibel_ray.cdc.pipeline import refresh_pipeline

        base_feeds = {out_dir: feed_dir} if feed_dir else None
        res = refresh_pipeline(downstream, run_id=f"{run_prefix}-ds-{i}",
                               base_feeds=base_feeds, chain_feeds=bool(feed_dir),
                               max_parallel=downstream_parallel)
        rounds.append({"round": i, "mode": "downstream", "touched": 0,
                       "order": res["order"],
                       "refreshed": sum(1 for r in res["results"].values()
                                        if r.get("refreshed"))})

    def _compact(i: int) -> None:
        nonlocal applied_since_compact
        cres = compact_published(
            out_dir, run_id=f"{run_prefix}-compact-{i}", metrics=metrics
        )
        cres.update({"round": i, "mode": "compact", "touched": 0})
        rounds.append(cres)
        applied_since_compact = 0

    with ThroughputMonitor(heartbeat_interval_s, what="events") as mon:
        for i in range(max_rounds):
            if not load_manifests(out_dir):
                res = replay_publish(log_dir, out_dir, partitioned=True,
                                     run_id=f"{run_prefix}-bootstrap",
                                     metrics=metrics, snapshots=snapshots)
                res["round"] = i
                res["mode"] = "bootstrap"
                mon.add(res.get("n_events_applied", 0))
                rounds.append(res)
                _sync_downstream(i)
                continue
            kw = {}
            if feed_dir is not None:
                kw = {"feed_dir": feed_dir, "feed_values": feed_values,
                      "feed_lsn": True}
            res = incremental_apply(log_dir, out_dir, run_id=f"{run_prefix}-{i}",
                                    metrics=metrics, mode=mode,
                                    snapshots=snapshots, **kw)
            res["round"] = i
            res["mode"] = "incremental"
            mon.add(res.get("n_events_applied", 0))
            rounds.append(res)
            if res.get("touched", 0) > 0:
                _sync_downstream(i)
            if res.get("touched", 0) > 0 and mode == "mor" and compact_every:
                applied_since_compact += 1
                if applied_since_compact >= compact_every:
                    _compact(i)
            if res.get("touched", 0) == 0:
                idle += 1
                if idle >= stop_when_idle:
                    break
            else:
                idle = 0
            if poll_interval_s:
                time.sleep(poll_interval_s)
        # exit compaction: don't leave the table with unbounded deltas just
        # because the loop went idle
        if mode == "mor" and compact_every and applied_since_compact:
            _compact(max_rounds)
        throughput = mon.stop()
    return {
        "rounds": len(rounds),
        "applied_rounds": sum(
            1 for r in rounds if r.get("touched", 1) and r["mode"] != "compact"
        ),
        "compactions": sum(1 for r in rounds if r["mode"] == "compact"),
        "rows_total": next(
            (r["rows_total"] for r in reversed(rounds) if "rows_total" in r), 0
        ),
        "throughput": throughput,
        "history": rounds,
    }
