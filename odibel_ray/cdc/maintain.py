"""One-call table maintenance: compaction, retention, vacuum, stats health.

Every lakehouse deployment ends up with a cron that runs OPTIMIZE +
VACUUM + retention in the right order per table; this module is that loop
as a library call so operators (and `tail_log` deployments) don't
re-derive the ordering. The reference has no maintenance story at all —
its outputs are one-shot job results.

Order matters and is fixed here: **compact first** (folding merge-on-read
deltas creates superseded files), then **snapshot retention** (decides
which superseded files stay pinned), then **vacuum** (sweeps what nothing
references anymore). Statistics are refreshed from a feed when one is
given, else reported stale when the table moved past their pinned
version — never silently wrong.
"""

from __future__ import annotations

import os

from odibel_ray.cdc.analyze import load_column_stats, refresh_column_stats


def maintain_table(
    out_dir: str,
    *,
    compact_min_deltas: int = 8,
    keep_snapshots: int | None = None,
    vacuum_after: bool = True,
    stats_feed=None,
    run_id: str = "maintain-0",
) -> dict:
    """Run the maintenance loop once for one published table; returns a
    report of what each step did.

    - ``compact_min_deltas``: fold merge-on-read deltas on buckets carrying
      at least this many (0 disables compaction).
    - ``keep_snapshots``: tighten snapshot retention to the newest k
      (None leaves retention as configured).
    - ``vacuum_after``: sweep staging leftovers / orphan files / widowed
      bloom sidecars after the above.
    - ``stats_feed``: change feed (dir or ``table_changes`` Dataset) to fold
      into persisted column statistics. Without it, statistics that no
      longer reflect the live version are reported under ``stats_stale``.
    """
    from odibel_ray.cdc.sink import (
        compact_published,
        list_snapshots,
        load_manifests,
        vacuum,
    )

    report: dict = {"out_dir": out_dir}
    if compact_min_deltas:
        manifests = load_manifests(out_dir)
        worst = max(
            (len(m.get("deltas", [])) for m in manifests.values()), default=0
        )
        if worst >= compact_min_deltas:
            res = compact_published(
                out_dir, run_id=run_id, min_deltas=compact_min_deltas
            )
            report["compacted_buckets"] = res["compacted"]
        else:
            report["compacted_buckets"] = 0
        report["max_bucket_deltas"] = worst

    if stats_feed is not None:
        stats = refresh_column_stats(out_dir, stats_feed)
        report["stats_refreshed"] = sorted(
            c for c in stats if not c.startswith("_")
        )
        report["stats_stale"] = stats["_table"].get("stale_columns", [])
    else:
        stats = load_column_stats(out_dir)
        if stats is not None:
            snaps = list_snapshots(out_dir)
            live = snaps[-1]["version"] if snaps else None
            pinned = stats["_table"].get("version")
            report["stats_stale"] = (
                sorted(c for c in stats if not c.startswith("_"))
                if live != pinned
                else []
            )

    # retention + vacuum LAST: compaction may have superseded files, and
    # vacuum(keep_snapshots=...) folds the expiry in before its orphan scan
    if vacuum_after or keep_snapshots is not None:
        removed = vacuum(
            out_dir,
            keep_snapshots=keep_snapshots,
            # a consumed feed directory gets its old per-bucket states
            # trimmed in the same sweep
            feed_dir=stats_feed if isinstance(stats_feed, str) else None,
        )
        report["vacuum"] = removed
    return report


def catalog(root: str) -> list[dict]:
    """Discover every published table under ``root`` (recursively: any
    directory carrying a table manifest) and report its catalog row: kind
    (transcript / generic; derived / mview / joinview when maintained),
    rows, buckets, merge-on-read delta backlog, retained snapshots,
    statistics freshness, and upstream tables. Metadata-only — no Ray
    session, no data file opened."""
    import json as _json

    from odibel_ray.cdc.pipeline import _META_FILES
    from odibel_ray.cdc.sink import TABLE_MANIFEST, list_snapshots

    rows = []
    for dirpath, dirnames, filenames in os.walk(root):
        if TABLE_MANIFEST not in filenames:
            continue
        dirnames[:] = [d for d in dirnames if not d.startswith("_")]
        with open(os.path.join(dirpath, TABLE_MANIFEST)) as f:
            tman = _json.load(f)
        kind = "generic" if tman.get("generic") else "transcript"
        upstreams: list[str] = []
        for fname, k in _META_FILES.items():
            mpath = os.path.join(dirpath, fname)
            if os.path.exists(mpath):
                kind = k
                with open(mpath) as f:
                    meta = _json.load(f)
                upstreams = [
                    meta.get(key)
                    for key in ("base", "left", "right")
                    if meta.get(key)
                ]
                break
        snaps = list_snapshots(dirpath)
        stats = load_column_stats(dirpath)
        stats_state = "none"
        if stats is not None:
            live = snaps[-1]["version"] if snaps else None
            stats_state = (
                "fresh" if stats["_table"].get("version") == live else "stale"
            )
        rows.append({
            "table": dirpath,
            "kind": kind,
            "rows": tman.get("rows_total"),
            "buckets": len(tman.get("buckets", [])),
            "mor_deltas": tman.get("mor_deltas", 0),
            "snapshots": len(snaps),
            "stats": stats_state,
            "upstreams": upstreams,
        })
    return sorted(rows, key=lambda r: r["table"])
