"""Exactly-once Parquet sink: write → audit → publish, with per-bucket commit
manifests, per-(bucket, partition) LSN watermarks, and incremental resume.

The reference's sink is an all-or-nothing directory overwrite
(``/root/reference/src/main/scala/ai/scads/odibel/datasets/wikitext/DBpediaTKGExtractionSpark.scala:44``)
plus a row-count audit in its converters (``transform/CSVToParquet.scala:25-30``).
We generalize both (SURVEY.md §4):

- **write**: each group task writes its bucket to a *deterministic* staging path
  (``_staging/<run_id>/part-<bucket>-<run_id>.parquet``) — a retried task
  overwrites its own output, never duplicates it (no wall-clock ids; the
  reference's ``System.nanoTime()`` bnode ids at
  ``transform/CSVToRDFReification.scala:98`` are the anti-pattern we avoid);
- **audit**: the driver checks the staged file's Parquet row count against the
  manifest row the task emitted;
- **publish**: copy-on-write — the data file moves into place under its
  run-versioned name, then the atomic write of ``_manifests/bucket-<k>.json``
  flips the bucket's pointer; superseded versions are swept afterwards.
  Readers trust only manifested files, and the previous version stays live
  and audited until the pointer flip, so a kill at any point leaves either a
  fully-published bucket or the intact previous state — never a torn read
  and never a manifest-less bucket.

Published files carry system columns ``_lsn``/``_part``/``_bucket`` so an
incremental run can LWW-merge new events onto the base (same-key comparisons are
within one WAL partition, where LSN is totally ordered). Manifests record
``watermarks = {part: max_lsn}``; events at or below the watermark are
idempotently ignored on resume (SURVEY.md §2.9).

Scale notes: manifests are metadata (one tiny JSON per bucket); the driver's
publish loop streams them via ``iter_rows`` as groups finish — no data rows ever
reach the driver. Buckets are the resume/parallelism unit: size ``num_buckets``
so one bucket's converged rows fit a worker (at 100 TB: tens of thousands).
"""

from __future__ import annotations

import json
import os
import time
from functools import partial
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from odibel_ray.cdc.apply import (
    _keep_last_mask,
    _SORT_KEYS,
    compact_batch,
    prepare_events,
)
from odibel_ray.cdc.schema import SchemaTimeline, extract_timeline

MANIFEST_DIR = "_manifests"
STAGING_DIR = "_staging"
TABLE_MANIFEST = "_TABLE_MANIFEST.json"
SNAPSHOT_DIR = "_snapshots"
SNAPSHOT_POLICY = "_POLICY.json"

LOGICAL_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool_name", "score", "ts"]


def _write_data_file(table: pa.Table, path: str) -> None:
    """Every data-file write in the sink goes through here so the Parquet
    codec is one knob: ``ODIBEL_PARQUET_CODEC`` (default ``snappy`` — the
    hot-path read trade; ``zstd`` roughly halves cold-storage bytes at a
    small CPU cost, the usual choice for a 100-TB lake). Read at call time
    inside the writing task, so it applies on workers too."""
    pq.write_table(
        table, path, compression=os.environ.get("ODIBEL_PARQUET_CODEC", "snappy")
    )


class ConcurrentWriterError(RuntimeError):
    """Another live writer holds the table lock."""


class table_lock:
    """Advisory single-writer lease for a published table.

    The sink's correctness story assumes one writer per table (per-bucket
    manifest flips are atomic, but `vacuum`/`compact_published` racing an
    in-flight apply can sweep its staging or fold deltas mid-append). This
    lease makes the assumption enforced instead of documented: writers take
    ``with table_lock(out_dir, owner="tailer-1"):`` and a second concurrent
    writer fails fast with :class:`ConcurrentWriterError`.

    Mechanics: ``_LOCK.json`` is created with ``O_CREAT|O_EXCL`` (atomic on
    POSIX and object stores with if-none-match semantics). A crashed writer's
    lock is reclaimed when (a) its pid is dead — only trusted when the
    hostname matches, a pid number means nothing across nodes — or (b) the
    lease file is older than ``ttl_s`` (the cross-host fallback; long writers
    should ``refresh()`` periodically, which bumps the file's mtime).
    Reclaim uses a second ``O_EXCL`` create of a takeover file then an
    ``os.replace``, so two reclaimers can't both win."""

    def __init__(self, out_dir: str, *, owner: str = "writer", ttl_s: float = 3600.0,
                 wait_s: float | None = None):
        self.path = os.path.join(out_dir, "_LOCK.json")
        self.out_dir = out_dir
        self.owner = owner
        self.ttl_s = float(ttl_s)
        if wait_s is None:
            wait_s = float(os.environ.get("ODIBEL_LOCK_WAIT_S", "0"))
        #: >0 turns fail-fast into writer QUEUEING: acquire() polls with
        #: backoff until the lease frees or the deadline passes — two cron
        #: jobs hitting one table serialize instead of one of them dying.
        self.wait_s = float(wait_s)
        self._held = False
        # Unique per-lock-instance fencing token: release()/refresh() verify
        # it against the on-disk lock before acting, so a writer whose lease
        # was reclaimed (TTL expiry on another host) cannot delete or extend
        # the NEW holder's lease.
        import uuid

        self._token = uuid.uuid4().hex

    #: An acquire()-side .takeover file lives for milliseconds (create →
    #: os.replace). One older than this is an orphan from a reclaimer that
    #: crashed between the two steps — without cleanup it wedges reclaim
    #: forever (O_EXCL create always fails, nothing else removes it).
    TAKEOVER_TTL_S = 60.0

    def _payload(self) -> bytes:
        import socket

        return json.dumps(
            {
                "owner": self.owner,
                "pid": os.getpid(),
                "host": socket.gethostname(),
                "ttl_s": self.ttl_s,
                "token": self._token,
            }
        ).encode()

    def _owns(self) -> bool:
        """True iff the on-disk lock file still carries OUR fencing token."""
        try:
            with open(self.path) as f:
                return json.load(f).get("token") == self._token
        except (OSError, ValueError):
            return False

    def _try_create(self, path: str) -> bool:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "wb") as f:
            f.write(self._payload())
            f.flush()
            os.fsync(f.fileno())
        return True

    def _is_stale(self) -> bool:
        import socket

        try:
            with open(self.path) as f:
                cur = json.load(f)
            mtime = os.path.getmtime(self.path)
        except (OSError, ValueError):
            return True  # torn/missing lock file — reclaimable
        import time

        if time.time() - mtime > float(cur.get("ttl_s", self.ttl_s)):
            return True
        if cur.get("host") == socket.gethostname():
            try:
                os.kill(int(cur["pid"]), 0)
            except (OSError, ValueError):
                return True  # same host, pid gone — crashed writer
        return False

    def acquire(self) -> "table_lock":
        import time as _time

        os.makedirs(self.out_dir, exist_ok=True)
        deadline = _time.monotonic() + self.wait_s
        delay = 0.05
        while True:
            if self._try_create(self.path):
                self._held = True
                return self
            if self._is_stale():
                takeover = self.path + ".takeover"
                try:
                    # Clear an orphaned takeover (reclaimer died between
                    # create and replace) so reclaim can't wedge permanently.
                    if _time.time() - os.path.getmtime(takeover) > self.TAKEOVER_TTL_S:
                        os.remove(takeover)
                except OSError:
                    pass
                if self._try_create(takeover):
                    os.replace(takeover, self.path)
                    self._held = True
                    return self
            if _time.monotonic() >= deadline:
                break
            _time.sleep(delay)
            delay = min(delay * 2, 0.5)
        try:
            with open(self.path) as f:
                cur = json.load(f)
        except (OSError, ValueError):
            cur = {}
        raise ConcurrentWriterError(
            f"table {self.out_dir} is locked by "
            f"{cur.get('owner')!r} (pid {cur.get('pid')} on {cur.get('host')}); "
            "single-writer sink — wait for it or reclaim after its TTL"
        )

    def refresh(self) -> None:
        """Bump the lease mtime (long writers call this between rounds).

        Raises :class:`ConcurrentWriterError` if the lease was reclaimed
        (TTL expiry) and is now held by another writer — extending it would
        keep the WRONG writer's lease alive, and the caller must stop
        mutating the table immediately.
        """
        if not self._held:
            return
        if not self._owns():
            self._held = False
            raise ConcurrentWriterError(
                f"lease on {self.out_dir} was reclaimed by another writer "
                "(TTL expired mid-run) — aborting to preserve single-writer"
            )
        os.utime(self.path, None)

    def release(self) -> None:
        if self._held:
            try:
                # Fencing check: only remove the lock if it is still OURS —
                # a reclaimed lease now belongs to the new holder.
                if self._owns():
                    os.remove(self.path)
            except OSError:
                pass
            self._held = False

    def __enter__(self) -> "table_lock":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()


def _single_writer(out_arg: str, owner_arg: str = "run_id"):
    """Wrap a table-mutating op in :class:`table_lock` on its ``out_arg``
    directory — every publish/compact/vacuum entry point is one lease, so
    two concurrent writers (or a vacuum racing an apply) fail fast instead
    of corrupting staging/deltas. Released on any exit, including errors; a
    SIGKILLed holder is reclaimed by pid-liveness (same host) or TTL."""
    import functools
    import inspect

    def deco(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            bound = sig.bind(*args, **kwargs)
            bound.apply_defaults()
            out_dir = bound.arguments[out_arg]
            owner = str(bound.arguments.get(owner_arg) or fn.__name__)
            with table_lock(out_dir, owner=owner):
                return fn(*args, **kwargs)

        return wrapper

    return deco


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _bucket_watermarks(t: pa.Table) -> dict[str, int]:
    """max LSN per WAL partition among this group's events (vectorized)."""
    part = t["part"].to_numpy(zero_copy_only=False)
    lsn = t["lsn"].to_numpy(zero_copy_only=False)
    out: dict[str, int] = {}
    for p in np.unique(part):
        out[str(int(p))] = int(lsn[part == p].max())
    return out


_MANIFEST_SCHEMA = pa.schema(
    [
        ("bucket", pa.int64()),
        ("rows_out", pa.int64()),
        ("n_events", pa.int64()),
        ("file", pa.string()),
        ("staged", pa.string()),
        ("watermarks", pa.string()),
        ("run_id", pa.string()),
        # change-data-feed sidecar: staged path + final path, published in the
        # same per-bucket atomic step as the data file ("" when no feed)
        ("feed_staged", pa.string()),
        ("feed_final", pa.string()),
    ]
)


def _apply_write_group(
    t: pa.Table, *, staging: str, run_id: str, metrics: str | None = None
) -> pa.Table:
    """Final apply + deterministic staged write; returns ONE manifest row.
    ``metrics``: name of a live-counter actor to fire task-side progress
    into (:func:`odibel_ray.monitor.record_task_metrics`) — events applied,
    rows staged, buckets finished, visible mid-replay from any process."""
    if len(t) == 0:
        # a shard whose events all failed prepare's validity filter publishes
        # nothing — skip, don't IndexError the whole run
        return _MANIFEST_SCHEMA.empty_table()
    delay = float(os.environ.get("ODIBEL_TEST_APPLY_DELAY", "0"))
    if delay:  # test hook: lets the kill-resume test catch the run mid-publish
        import time

        time.sleep(delay)
    t = t.combine_chunks()
    bucket = int(t["bucket"][0].as_py())
    n_events = len(t)
    wms = _bucket_watermarks(t)

    t = t.take(pc.sort_indices(t, sort_keys=_SORT_KEYS))
    t = t.filter(pa.array(_keep_last_mask(t)))
    t = t.filter(pc.not_equal(t["op"], "D"))

    out = pa.table(
        {
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "role": t["role"],
            "text": t["text"],
            "tool_name": t["tool_name"],
            "score": t["score"],
            "ts": t["ts"],
            "_lsn": t["lsn"],
            "_part": t["part"],
            "_bucket": t["bucket"],
        }
    )
    fname = _bucket_filename(bucket, run_id)
    staged = os.path.join(staging, fname)
    _write_data_file(out, staged)

    if metrics:
        from odibel_ray.monitor import record_task_metrics

        record_task_metrics(
            metrics, events=n_events, rows=len(out), buckets_staged=1
        )
    return pa.table(
        {
            "bucket": pa.array([bucket], pa.int64()),
            "rows_out": pa.array([len(out)], pa.int64()),
            "n_events": pa.array([n_events], pa.int64()),
            "file": pa.array([fname], pa.string()),
            "staged": pa.array([staged], pa.string()),
            "watermarks": pa.array([json.dumps(wms)], pa.string()),
            "run_id": pa.array([run_id], pa.string()),
            "feed_staged": pa.array([""], pa.string()),
            "feed_final": pa.array([""], pa.string()),
        }
    )


def _bucket_filename(bucket: int, run_id: str) -> str:
    """Versioned data filename: ``part-<bucket>-<run>.parquet``. The run tag
    makes publish copy-on-write — a new version lands under a NEW name and
    the atomic manifest write is the only pointer flip. Replacing the bucket
    file in place (the old ``part-<bucket>.parquet`` scheme) had a crash
    window: die after the data ``os.replace`` but before the manifest write
    and the old manifest fails its row-count audit, the bucket drops out of
    ``read_published``, and an incremental resume over a tail-only log
    rebuilds the bucket from new events alone — silent base-row loss.
    Retries of the SAME run still overwrite their own file (idempotent)."""
    safe = "".join(c if c.isalnum() or c in "-_" else "_" for c in run_id)
    return f"part-{bucket:06d}-{safe}.parquet"


def merge_base_deltas(
    base: pa.Table | None,
    deltas: list[pa.Table],
    keys: Sequence[str] = ("conv_id", "turn_idx"),
) -> pa.Table:
    """LWW-merge one bucket's base table with its merge-on-read delta files:
    keep the max-``_lsn`` row per key across base ∪ deltas, drop tombstones.
    Base rows are implicit inserts; delta rows carry ``_op`` (``D`` rows are
    tombstones that must shadow older base/delta rows). Same-key comparisons
    are within one WAL partition (a key's events live in one part), where LSN
    is totally ordered — the same convergence argument as
    :func:`incremental_apply`. Output keeps the base column layout (no
    ``_op``). Generic tables merge on their layout ``keys``; their base
    files carry no ``_lsn`` (treated as older than every delta, and the
    column is dropped again on the way out)."""
    base_had_lsn = base is None or "_lsn" in base.column_names
    parts = []
    if base is not None and len(base):
        if "_op" not in base.column_names:
            base = base.append_column(
                "_op", pa.array(np.full(len(base), "I"), pa.string())
            )
        if "_lsn" not in base.column_names:
            base = base.append_column(
                "_lsn", pa.array(np.full(len(base), -1, np.int64))
            )
        parts.append(base)
    parts.extend(d for d in deltas if len(d))
    if not parts:
        out = base if base is not None else pa.table({})
        return out.drop_columns(["_op"]) if "_op" in out.column_names else out
    t = pa.concat_tables(parts, promote_options="default").combine_chunks()
    sort_keys = [(k, "ascending") for k in keys] + [("_lsn", "ascending")]
    t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
    n = len(t)
    mask = np.ones(n, dtype=bool)
    if n > 1:
        same_next = np.ones(n - 1, dtype=bool)
        for k in keys:
            c = t[k]
            same_next &= pc.fill_null(
                pc.equal(c.slice(1), c.slice(0, n - 1)), False
            ).to_numpy(zero_copy_only=False)
        mask[: n - 1] = ~same_next
    t = t.filter(pa.array(mask))
    t = t.filter(pc.not_equal(t["_op"], "D"))
    drop = ["_op"] + ([] if base_had_lsn else ["_lsn"])
    return t.drop_columns(drop)


def _merged_watermarks(old: dict[str, int] | None, new: dict[str, int]) -> dict[str, int]:
    out = dict(old or {})
    for p, l in new.items():
        out[p] = max(int(l), int(out.get(p, -1)))
    return out


def _delta_write_group(
    t: pa.Table,
    *,
    staging: str,
    run_id: str,
    base_buckets: frozenset[int],
    base_wms: dict[int, dict[str, int]],
    metrics: str | None = None,
) -> pa.Table:
    """Merge-on-read apply: stage one bucket's NEW events as a delta file —
    no base read, no base rewrite (the write-amplification win over the
    copy-on-write path at high update frequency). Tombstones are RETAINED
    (``_op = 'D'``) so the reader's merge can shadow base rows. A bucket with
    no published base yet degenerates to an ordinary base write.

    The delta filename is derived from the bucket's post-apply watermark
    STATE (not the run_id), so a crash-resume that re-applies the same events
    under a fresh run_id overwrites the crashed run's delta instead of
    stacking a duplicate."""
    if len(t) == 0:
        return _MANIFEST_SCHEMA.empty_table()
    t = t.combine_chunks()
    bucket = int(t["bucket"][0].as_py())
    if bucket not in base_buckets:
        return _apply_write_group(t, staging=staging, run_id=run_id, metrics=metrics)
    n_events = len(t)
    merged_wm = _merged_watermarks(base_wms.get(bucket), _bucket_watermarks(t))

    t = t.take(pc.sort_indices(t, sort_keys=_SORT_KEYS))
    t = t.filter(pa.array(_keep_last_mask(t)))
    out = pa.table(
        {
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "role": t["role"],
            "text": t["text"],
            "tool_name": t["tool_name"],
            "score": t["score"],
            "ts": t["ts"],
            "_lsn": t["lsn"],
            "_part": t["part"],
            "_bucket": t["bucket"],
            "_op": t["op"],
        }
    )
    import hashlib

    tag = hashlib.sha1(
        json.dumps(merged_wm, sort_keys=True).encode()
    ).hexdigest()[:16]
    fname = f"delta-{bucket:06d}-{tag}.parquet"
    staged = os.path.join(staging, fname)
    _write_data_file(out, staged)
    if metrics:
        from odibel_ray.monitor import record_task_metrics

        record_task_metrics(metrics, events=n_events, rows=len(out), buckets_staged=1)
    return pa.table(
        {
            "bucket": pa.array([bucket], pa.int64()),
            "rows_out": pa.array([len(out)], pa.int64()),
            "n_events": pa.array([n_events], pa.int64()),
            "file": pa.array([fname], pa.string()),
            "staged": pa.array([staged], pa.string()),
            "watermarks": pa.array([json.dumps(merged_wm)], pa.string()),
            "run_id": pa.array([run_id], pa.string()),
            "feed_staged": pa.array([""], pa.string()),
            "feed_final": pa.array([""], pa.string()),
        }
    )


def _publish_mor_stream(manifest_ds, out_dir: str) -> list[dict]:
    """Publish stream for merge-on-read applies: ``delta-*`` rows append a
    delta descriptor to the bucket's existing manifest (and advance its
    effective watermarks); base rows (buckets with no published base yet) go
    through the ordinary copy-on-write base publish."""
    published = []
    publish_delay = float(os.environ.get("ODIBEL_TEST_PUBLISH_DELAY", "0"))
    retained = _retained_files(out_dir)
    for row in manifest_ds.iter_rows():
        if publish_delay:  # test hook (see _publish_stream)
            time.sleep(publish_delay)
        if not row["file"].startswith("delta-"):
            published.append(_publish_base_row(row, out_dir, retained=retained))
            continue
        staged = _audit_staged(row)
        final_path = os.path.join(out_dir, row["file"])
        os.replace(staged, final_path)
        mpath = os.path.join(out_dir, MANIFEST_DIR, f"bucket-{int(row['bucket']):06d}.json")
        with open(mpath) as f:
            manifest = json.load(f)
        deltas = manifest.setdefault("deltas", [])
        if not any(d["file"] == row["file"] for d in deltas):
            deltas.append(
                {
                    "file": row["file"],
                    "rows_out": int(row["rows_out"]),
                    "n_events": int(row["n_events"]),
                    "run_id": row["run_id"],
                }
            )
        # effective watermarks: merged(base, every delta) — keeps
        # _watermark_matrix and the next run's idempotence filter exact
        manifest["watermarks"] = json.loads(row["watermarks"])
        manifest["last_delta_run_id"] = row["run_id"]
        # the manifest write IS the publish (atomic pointer flip); the delta
        # file landed first, so a crash in between leaves an orphan file
        # (vacuumed later), never a dangling reference
        _atomic_write_json(mpath, manifest)
        published.append(
            {
                "bucket": int(row["bucket"]),
                "kind": "delta",
                "file": row["file"],
                "rows_out": int(row["rows_out"]),
                "n_events": int(row["n_events"]),
                "run_id": row["run_id"],
            }
        )
    return published


def load_manifests(out_dir: str) -> dict[int, dict]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    got: dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return got
    for fn in os.listdir(mdir):
        if fn.startswith("bucket-") and fn.endswith(".json"):
            with open(os.path.join(mdir, fn)) as f:
                m = json.load(f)
            # trust only manifests whose data files (base AND every
            # merge-on-read delta) exist with matching rows
            fpath = os.path.join(out_dir, m["file"])
            ok = os.path.exists(fpath) and pq.read_metadata(fpath).num_rows == m["rows_out"]
            for d in m.get("deltas", []):
                dpath = os.path.join(out_dir, d["file"])
                ok = ok and os.path.exists(dpath) and (
                    pq.read_metadata(dpath).num_rows == d["rows_out"]
                )
            if ok:
                got[int(m["bucket"])] = m
    return got


# ---------------------------------------------------------------------------
# Table snapshots (time travel): an opt-in retention policy over the
# copy-on-write publish. Every publish op already lands bucket data under a
# run-versioned filename and flips only the per-bucket manifest pointer; a
# *snapshot* is a frozen copy of the whole manifest set taken after the op,
# so "the table as of version V" is just "read V's file list". Retention is
# deliberate (Delta/Iceberg-style): each retained snapshot pins up to one
# extra file version per bucket it differs in, which at 10^10 events is real
# disk — so snapshots are off unless `enable_snapshots` (or `snapshots=k` on
# a publish op) turns them on, and `expire_snapshots` / `vacuum` bound them.
# ---------------------------------------------------------------------------


def enable_snapshots(out_dir: str, keep_last: int = 2) -> None:
    """Turn on snapshot retention for a table: every subsequent publish op
    (replay/incremental/compact/publish_dataset) records a table version and
    the newest ``keep_last`` versions stay readable via
    ``read_published(..., version=V)``."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    sdir = os.path.join(out_dir, SNAPSHOT_DIR)
    os.makedirs(sdir, exist_ok=True)
    _atomic_write_json(os.path.join(sdir, SNAPSHOT_POLICY), {"keep_last": int(keep_last)})
    # enabling on an already-published table pins its CURRENT state as the
    # first version — otherwise the next apply's per-bucket sweep would
    # remove exactly the files time travel back to "before that apply" needs
    if not list_snapshots(out_dir) and load_manifests(out_dir):
        record_snapshot(out_dir, "bootstrap")


def snapshot_policy(out_dir: str) -> int | None:
    """The table's ``keep_last`` retention, or None when snapshots are off."""
    p = os.path.join(out_dir, SNAPSHOT_DIR, SNAPSHOT_POLICY)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(json.load(f)["keep_last"])


def _snapshot_path(out_dir: str, version: int) -> str:
    return os.path.join(out_dir, SNAPSHOT_DIR, f"v-{version:06d}.json")


def list_snapshots(out_dir: str) -> list[dict]:
    """All retained snapshots, oldest first: ``{version, op, run_id,
    rows_total, buckets}`` (buckets = frozen per-bucket manifests)."""
    sdir = os.path.join(out_dir, SNAPSHOT_DIR)
    if not os.path.isdir(sdir):
        return []
    out = []
    for fn in sorted(os.listdir(sdir)):
        if fn.startswith("v-") and fn.endswith(".json"):
            with open(os.path.join(sdir, fn)) as f:
                out.append(json.load(f))
    return sorted(out, key=lambda s: s["version"])


def version_at(out_dir: str, as_of) -> int:
    """Resolve a wall-clock timestamp to the newest retained snapshot taken
    at or before it (Delta's ``TIMESTAMP AS OF``). ``as_of`` is a unix
    timestamp or an ISO-8601 string (naive = UTC)."""
    if isinstance(as_of, str):
        from datetime import datetime, timezone

        dt = datetime.fromisoformat(as_of)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        as_of = dt.timestamp()
    best = None
    for s in list_snapshots(out_dir):
        if s.get("unix_ts", 0) <= float(as_of):
            best = s["version"]
    if best is None:
        have = [s["version"] for s in list_snapshots(out_dir)]
        raise FileNotFoundError(
            f"no retained snapshot at or before {as_of} under {out_dir} "
            f"(retained versions: {have})"
        )
    return best


def snapshot_manifests(out_dir: str, version: int) -> dict[int, dict]:
    """The frozen per-bucket manifest set of one retained version."""
    path = _snapshot_path(out_dir, version)
    if not os.path.exists(path):
        have = [s["version"] for s in list_snapshots(out_dir)]
        raise FileNotFoundError(
            f"snapshot v{version} not retained under {out_dir} (have: {have})"
        )
    with open(path) as f:
        snap = json.load(f)
    return {int(b): m for b, m in snap["buckets"].items()}


def _manifest_files(manifests: dict[int, dict] | dict[str, dict]) -> set[str]:
    files: set[str] = set()
    for m in manifests.values():
        files.add(m["file"])
        files.update(d["file"] for d in m.get("deltas", []))
    return files


def _retained_files(out_dir: str) -> frozenset[str]:
    """Every data/delta filename referenced by a retained snapshot — the
    per-bucket publish sweep and vacuum must keep these. One tiny JSON read
    per retained snapshot (metadata only)."""
    files: set[str] = set()
    for snap in list_snapshots(out_dir):
        files.update(_manifest_files(snap["buckets"]))
    return frozenset(files)


def record_snapshot(out_dir: str, op: str) -> dict | None:
    """Freeze the table's current manifest set as the next version (no-op
    unless snapshots are enabled), then expire beyond the policy's
    ``keep_last``. Called by every publish op after its last manifest flip;
    a crash before this point simply means the next successful op records
    the state — retained files from prior snapshots are never at risk
    because the in-publish sweep keeps everything ``_retained_files`` lists."""
    keep_last = snapshot_policy(out_dir)
    if keep_last is None:
        return None
    manifests = load_manifests(out_dir)
    if not manifests:
        return None
    snaps = list_snapshots(out_dir)
    buckets = {str(b): m for b, m in manifests.items()}
    if snaps and snaps[-1]["buckets"] == buckets:
        # no-op resume / idle compact: state unchanged → no duplicate version
        return None
    version = snaps[-1]["version"] + 1 if snaps else 1
    snap = {
        "version": version,
        "op": op,
        "unix_ts": time.time(),
        "rows_total": int(sum(m["rows_out"] for m in manifests.values())),
        "buckets": buckets,
    }
    _atomic_write_json(_snapshot_path(out_dir, version), snap)
    expire_snapshots(out_dir, keep_last)
    return {"version": version, "op": op}


def expire_snapshots(out_dir: str, keep_last: int | None = None) -> dict:
    """Drop snapshots beyond the newest ``keep_last`` (default: the table's
    policy) and sweep data/delta files no longer referenced by either the
    live manifests or a retained snapshot. Versions pinned by a savepoint
    (``odibel_ray.cdc.savepoint``) are kept regardless of ``keep_last``.
    Runs inside every publish op (which holds the table lease); run it
    standalone only while no writer is live."""
    from odibel_ray.cdc.savepoint import pinned_versions

    if keep_last is None:
        keep_last = snapshot_policy(out_dir) or 0
    snaps = list_snapshots(out_dir)
    pinned = pinned_versions(out_dir)
    drop = snaps[: max(0, len(snaps) - keep_last)] if keep_last >= 0 else []
    drop = [s for s in drop if s["version"] not in pinned]
    removed = {"snapshots": 0, "files": 0}
    for s in drop:
        try:
            os.remove(_snapshot_path(out_dir, s["version"]))
            removed["snapshots"] += 1
        except OSError:
            pass
    if not removed["snapshots"]:
        return removed
    import glob as _glob

    keep = _manifest_files(load_manifests(out_dir)) | _retained_files(out_dir)
    for pat in ("part-*.parquet", "delta-*.parquet"):
        for f in _glob.glob(os.path.join(out_dir, pat)):
            if os.path.basename(f) not in keep:
                try:
                    os.remove(f)
                    removed["files"] += 1
                except OSError:
                    pass
    return removed


def _audit_staged(row) -> str:
    """Row-count audit of one staged file (CSVToParquet.scala:25-30 analog);
    returns the staged path."""
    staged = row["staged"]
    meta_rows = pq.read_metadata(staged).num_rows
    if meta_rows != row["rows_out"]:
        raise RuntimeError(
            f"audit failed for bucket {row['bucket']}: staged {meta_rows} != manifest {row['rows_out']}"
        )
    return staged


def _sweep_bucket_versions(out_dir: str, bucket: int, keep: set[str]) -> None:
    """Best-effort removal of this bucket's superseded data/delta files
    (everything not in ``keep``) after a manifest pointer flip."""
    import glob as _glob

    for pat in (f"part-{bucket:06d}*.parquet", f"delta-{bucket:06d}*.parquet"):
        for stale in _glob.glob(os.path.join(out_dir, pat)):
            if os.path.basename(stale) not in keep:
                try:
                    os.remove(stale)
                except OSError:
                    pass
                try:  # bloom sidecar dies with its data file
                    os.remove(stale + ".bloom")
                except OSError:
                    pass


def _publish_base_row(
    row, out_dir: str, extra: dict | None = None, retained: frozenset[str] = frozenset()
) -> dict:
    """Audit + atomically publish one bucket's BASE manifest row: move the
    data file into place, flip the manifest pointer, sweep old versions
    (including any merge-on-read deltas the fresh base supersedes)."""
    staged = _audit_staged(row)
    final_path = os.path.join(out_dir, row["file"])
    os.replace(staged, final_path)
    # bloom sidecar travels with its data file (missing sidecar = no
    # equality pruning for this file, never a wrong answer)
    if os.path.exists(staged + ".bloom"):
        os.replace(staged + ".bloom", final_path + ".bloom")
    # feed sidecar publishes with its bucket, just before the manifest
    # pointer flip: a crash in between leaves the bucket's OLD manifest
    # (and old data file) fully consistent, and the resume re-applies the
    # same events — the feed's watermark-derived filename makes that an
    # overwrite, never a duplicate
    if row.get("feed_staged"):
        os.makedirs(os.path.dirname(row["feed_final"]), exist_ok=True)
        os.replace(row["feed_staged"], row["feed_final"])
    manifest = {
        "bucket": int(row["bucket"]),
        "rows_out": int(row["rows_out"]),
        "n_events": int(row["n_events"]),
        "file": row["file"],
        "watermarks": json.loads(row["watermarks"]),
        "run_id": row["run_id"],
        **(extra or {}),
    }
    # the manifest write IS the publish: data lands under a versioned
    # name first (copy-on-write), so until this atomic pointer flip the
    # previous version of the bucket stays live and audited
    _atomic_write_json(
        os.path.join(out_dir, MANIFEST_DIR, f"bucket-{manifest['bucket']:06d}.json"), manifest
    )
    # sweep superseded/orphaned versions of this bucket (the previous
    # published file + deltas it folded in, plus any leftovers from crashed
    # runs) — best-effort derived-data cleanup after the pointer flip.
    # Files pinned by a retained snapshot are kept (time travel).
    _sweep_bucket_versions(out_dir, manifest["bucket"], {manifest["file"]} | retained)
    return manifest


def _publish_stream(manifest_ds, out_dir: str, extra: dict | None = None) -> list[dict]:
    """Stream manifest rows as groups finish; audit + atomically publish each."""
    published = []
    publish_delay = float(os.environ.get("ODIBEL_TEST_PUBLISH_DELAY", "0"))
    retained = _retained_files(out_dir)
    for row in manifest_ds.iter_rows():
        if publish_delay:  # test hook: lets the kill-resume test land mid-publish
            time.sleep(publish_delay)
        published.append(_publish_base_row(row, out_dir, extra, retained))
    return published


def _shard_apply_write(batch: pa.Table, *, timeline: SchemaTimeline, staging: str,
                       run_id: str, done: frozenset[int],
                       metrics: str | None = None) -> pa.Table:
    """Shuffle-free sink path: one task per WAL partition — ordered read of the
    shard's files → prepare → LWW apply → staged write + manifest row. Valid
    because the log is key-aligned (bucket == part); see
    :func:`odibel_ray.cdc.apply.replay_partitioned`."""
    import pyarrow.parquet as pq_

    from odibel_ray.cdc.apply import limit_arrow_threads
    from odibel_ray.cdc.apply import prepare_events as _prep

    limit_arrow_threads()
    outs = []
    for row in batch.to_pylist():
        part = int(row["part"])
        if part in done or not row["files"]:
            # empty part=N dir: producer created it but never wrote a file
            # (or it was vacuumed) — nothing to apply, not an error
            continue
        tables = [pq_.read_table(f) for f in row["files"]]
        t = pa.concat_tables(tables, promote_options="default").combine_chunks()
        t = t.append_column("part", pa.array(np.full(len(t), part, np.int64)))
        ev = _prep(t, timeline, num_buckets=None)
        outs.append(_apply_write_group(ev, staging=staging, run_id=run_id, metrics=metrics))
    if not outs:
        return _MANIFEST_SCHEMA.empty_table()
    return pa.concat_tables(outs)


@_single_writer("out_dir")
def replay_publish(
    log_dir: str,
    out_dir: str,
    *,
    num_buckets: int | None = None,
    run_id: str = "run-0",
    precompact: bool = True,
    batch_size: int = 65536,
    partitioned: bool = False,
    task_cpus: float = 1,
    metrics: str | None = None,
    snapshots: int | None = None,
) -> dict:
    """Full replay with the exactly-once sink. Resumable: already-published
    buckets (valid manifest + audited file) are filtered out *before* the
    shuffle, so a killed run re-does only unpublished buckets.

    ``partitioned=True`` (requires ``num_buckets is None``): shuffle-free shard
    path — one task per WAL partition applies and stages its own bucket; the
    groupby path remains for re-bucketing.

    ``snapshots=k`` enables snapshot retention (see :func:`enable_snapshots`);
    the run records a table version on completion."""
    import ray.data as rd

    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    # Pin the bucket layout BEFORE any staging (the publish_dataset pattern):
    # a crashed run resumed with a different num_buckets would otherwise
    # filter new-modulus bucket ids against old-modulus manifests in
    # _drop_done — silently dropping rows and splitting keys across
    # inconsistent buckets. TABLE_MANIFEST can't serve as the pin because it
    # is only written at the very end of a successful run.
    pin_path = os.path.join(out_dir, "_replay_layout.json")
    pin = {"num_buckets": num_buckets, "partitioned": bool(partitioned)}
    if os.path.exists(pin_path):
        with open(pin_path) as f:
            prev = json.load(f)
        if prev != pin:
            raise ValueError(
                f"resume layout mismatch for {out_dir}: a prior run pinned "
                f"{prev}, this run asked for {pin} — finish/vacuum the table "
                "with the pinned layout or use rebucket_published to resize"
            )
    else:
        _atomic_write_json(pin_path, pin)
    if snapshots is not None:
        enable_snapshots(out_dir, keep_last=snapshots)
    staging = os.path.join(out_dir, STAGING_DIR, run_id)
    os.makedirs(staging, exist_ok=True)

    timeline = extract_timeline(log_dir)
    done = load_manifests(out_dir)

    if partitioned:
        if num_buckets is not None:
            raise ValueError("partitioned sink requires num_buckets=None (bucket == WAL part)")
        import glob as _glob

        items = []
        for pdir in sorted(_glob.glob(os.path.join(log_dir, "part=*"))):
            part = int(os.path.basename(pdir).split("=", 1)[1])
            files = sorted(_glob.glob(os.path.join(pdir, "*.parquet")))
            items.append({"part": part, "files": files})
        # max(.., 1): an empty log dir (no part=* yet) must publish zero
        # buckets, not crash from_items with override_num_blocks=0
        shard_ds = rd.from_items(items, override_num_blocks=max(len(items), 1))
        # task_cpus sizes per-stage concurrency (session cpus / task_cpus
        # concurrent shard tasks) — raise it when logical CPUs exceed the
        # node's real parallel capacity so tasks don't thrash.
        manifest_ds = shard_ds.map_batches(
            partial(_shard_apply_write, timeline=timeline, staging=staging,
                    run_id=run_id, done=frozenset(done), metrics=metrics),
            batch_format="pyarrow",
            batch_size=1,
            num_cpus=task_cpus,
        )
        published = _publish_stream(manifest_ds, out_dir)
        all_manifests = load_manifests(out_dir)
        table_manifest = {
            "num_buckets": None,
            "buckets": sorted(all_manifests),
            "rows_total": int(sum(m["rows_out"] for m in all_manifests.values())),
            "timeline": timeline.to_json(),
            "schema_version": len(timeline.changes),
            "last_run_id": run_id,
        }
        _atomic_write_json(os.path.join(out_dir, TABLE_MANIFEST), table_manifest)
        snap = record_snapshot(out_dir, "replay_publish")
        return {
            "published_now": len(published),
            "published_total": len(all_manifests),
            "n_events_applied": int(sum(p["n_events"] for p in published)),
            "rows_total": table_manifest["rows_total"],
            "snapshot": snap["version"] if snap else None,
            "out_dir": out_dir,
        }

    ds = rd.read_parquet(log_dir)
    ds = ds.map_batches(
        prepare_events,
        fn_kwargs={"timeline": timeline, "num_buckets": num_buckets},
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    if done:
        done_arr = np.array(sorted(done), dtype=np.int64)

        def _drop_done(t: pa.Table) -> pa.Table:
            keep = ~np.isin(t["bucket"].to_numpy(zero_copy_only=False), done_arr)
            return t.filter(pa.array(keep))

        ds = ds.map_batches(_drop_done, batch_format="pyarrow", batch_size=batch_size)
    if precompact:
        ds = ds.map_batches(compact_batch, batch_format="pyarrow", batch_size=batch_size)

    manifest_ds = ds.groupby("bucket").map_groups(
        partial(_apply_write_group, staging=staging, run_id=run_id, metrics=metrics),
        batch_format="pyarrow",
    )
    published = _publish_stream(manifest_ds, out_dir)

    all_manifests = load_manifests(out_dir)
    table_manifest = {
        "num_buckets": num_buckets,
        "buckets": sorted(all_manifests),
        "rows_total": int(sum(m["rows_out"] for m in all_manifests.values())),
        "timeline": timeline.to_json(),
        "schema_version": len(timeline.changes),
        "last_run_id": run_id,
    }
    _atomic_write_json(os.path.join(out_dir, TABLE_MANIFEST), table_manifest)
    snap = record_snapshot(out_dir, "replay_publish")
    return {
        "published_now": len(published),
        "published_total": len(all_manifests),
        "n_events_applied": int(sum(p["n_events"] for p in published)),
        "rows_total": table_manifest["rows_total"],
        "snapshot": snap["version"] if snap else None,
        "out_dir": out_dir,
    }


def read_published(
    out_dir: str,
    *,
    system: bool = False,
    parallelism: int = -1,
    version: int | None = None,
    as_of=None,
    columns: list[str] | None = None,
    where: list | None = None,
    prune_stats: dict | None = None,
):
    """Dataset over manifested files only (readers never see unpublished data).

    Buckets with merge-on-read deltas are LWW-merged per bucket inside a map
    task (one task per delta-bearing bucket — base + deltas of one bucket are
    co-read and merged locally, no shuffle); delta-free buckets stream through
    a plain Parquet read. A fully compacted table takes only the plain path.

    ``columns=[...]`` prunes at the scan (only those columns leave storage);
    without it a non-``system`` read already prunes to the logical columns —
    the ``_lsn``/``_op`` system columns never leave the Parquet files unless
    asked for. Merge-on-read buckets read the key+``_lsn`` superset the LWW
    merge needs, then project.

    ``version=V`` time-travels: the read resolves bucket files from retained
    snapshot V (see :func:`enable_snapshots`) instead of the live manifests —
    identical merge semantics, including any merge-on-read deltas the
    snapshot carried. ``as_of=<unix ts | ISO-8601 string>`` resolves the
    newest retained snapshot at or before that wall-clock instant
    (``TIMESTAMP AS OF``) and reads it the same way.

    ``where=[(col, op, value), ...]`` is a conjunctive predicate with SQL
    NULL semantics (ops ``== != < <= > >= in not_in is_null not_null``)
    applied with zone-map data skipping: files whose Parquet footer
    statistics cannot satisfy it are never opened, surviving files get the
    predicate pushed into the scan (row-group pruning + row filter), and
    merge-on-read buckets filter AFTER their LWW merge (a superseded base
    row must not win). Pruning bites when the layout correlates with the
    predicate column — see ``publish_dataset(cluster_by=...)``. Pass a
    dict as ``prune_stats`` to receive ``{files_total, files_read}``."""
    import ray.data as rd

    from odibel_ray.cdc.skipping import (
        bloom_may_match,
        check_where,
        file_may_match,
        filter_table,
        where_expr,
    )

    if as_of is not None:
        if version is not None:
            raise ValueError("pass version= or as_of=, not both")
        version = version_at(out_dir, as_of)
    manifests = (
        snapshot_manifests(out_dir, version) if version is not None else load_manifests(out_dir)
    )
    if not manifests:
        raise FileNotFoundError(f"no published buckets under {out_dir}")
    if where is not None:
        where = check_where(where)
    if columns is not None:
        final_cols = list(columns)
    elif not system:
        # transcript tables hide their _lsn/_op system columns by default;
        # GENERIC published tables (views, derived/clustered copies — any
        # schema) have no system columns to hide, so a plain read is full
        tman_path = os.path.join(out_dir, TABLE_MANIFEST)
        generic = False
        if os.path.exists(tman_path):
            with open(tman_path) as f:
                generic = bool(json.load(f).get("generic"))
        final_cols = None if generic else list(LOGICAL_COLUMNS)
    else:
        final_cols = None
    # schema + total-file accounting come from the FULL manifest set; the
    # bucket-hash pruning below may drop every bucket and the read must
    # still type its empty result
    all_m = sorted(manifests.items())
    files_total = sum(1 + len(m.get("deltas", [])) for _, m in all_m)
    schema_src = os.path.join(out_dir, all_m[0][1]["file"])
    if where:
        # key-equality routing: recompute the candidate hash buckets from
        # pinned key values (lookup_key's trick inside the general scan)
        manifests = _bucket_prune(
            out_dir, manifests, where, pq.read_schema(schema_src)
        )
    # zero-row buckets exist for their watermarks (a bucket whose only
    # events were deletes-of-nonexistent still pins resume state) — but
    # scanning their empty files yields schema-less empty blocks from the
    # parquet reader, which poison any downstream concat; the manifest
    # already knows they contribute no rows, so skip them at the scan
    plain_m = [m for _, m in sorted(manifests.items())
               if not m.get("deltas") and m.get("rows_out", 1) != 0]
    mor = [m for _, m in sorted(manifests.items()) if m.get("deltas")]
    plain = [os.path.join(out_dir, m["file"]) for m in plain_m]
    # metadata-only DDL (generic tables): resolve the op log once, then run
    # the whole prune/pushdown machinery in PHYSICAL column space and
    # re-label batches to the logical schema at the end (cdc/ddl.py). While
    # a materialize_ddl rewrite is in flight, buckets stamped with its run
    # id are ALREADY logical on disk — they read directly (`done`), the
    # rest still fold the op log, so a reader mid-rewrite (or after a
    # crash) sees the correct logical table either way.
    from odibel_ray.cdc.ddl import SCHEMA_OPS, SchemaMap, load_schema_meta

    smap = None
    logical_cols = None
    done: list[str] = []
    where_logical = where
    if os.path.exists(os.path.join(out_dir, SCHEMA_OPS)):
        smeta = load_schema_meta(out_dir)
        mrun = smeta.get("materialized_run")
        if mrun:
            done = [os.path.join(out_dir, m["file"]) for m in plain_m
                    if m.get("run_id") == mrun]
            plain = [os.path.join(out_dir, m["file"]) for m in plain_m
                     if m.get("run_id") != mrun]
        if smeta["ops"] and (plain or mor):
            src = plain[0] if plain else os.path.join(out_dir, mor[0]["file"])
            smap = SchemaMap(pq.read_schema(src), smeta["ops"])
    if smap is not None:
        logical_cols = final_cols if final_cols is not None else smap.names
        smap.check_columns(logical_cols)
        if where:
            where, feasible = smap.translate_where(where)
            if not feasible:
                # value predicate on an unmaterialized column: pending
                # (physical) files provably match nothing; flipped files
                # carry the column and answer through the logical filter
                plain, mor, where = [], [], None
            else:
                where = where or None
        final_cols = smap.physical_columns(logical_cols)
    if where:
        # zone maps (footer min/max) first, then bloom sidecars (equality
        # probes on bloom-indexed columns); blooms only ever add pruning
        plain = [p for p in plain if file_may_match(p, where)
                 and bloom_may_match(p, where)]
        # a MOR bucket is prunable only when base AND every delta fail the
        # stats check (the merge never synthesizes values, so no file with
        # a possible match ⇒ no merged match); delta files carry no blooms,
        # so bloom pruning does not apply to MOR buckets
        mor = [
            m
            for m in mor
            if file_may_match(os.path.join(out_dir, m["file"]), where)
            or any(
                file_may_match(os.path.join(out_dir, d["file"]), where)
                for d in m["deltas"]
            )
        ]
    if where_logical and done:
        done = [p for p in done if file_may_match(p, where_logical)
                and bloom_may_match(p, where_logical)]
    if prune_stats is not None:
        prune_stats["files_total"] = files_total
        prune_stats["files_read"] = (
            len(plain) + len(done) + sum(1 + len(m["deltas"]) for m in mor)
        )
    if not plain and not mor and not done:
        # everything pruned: a typed empty Dataset from a manifested schema
        if smap is not None:
            schema = smap.logical_schema(logical_cols)
        else:
            schema = pq.read_schema(schema_src)
            if final_cols is not None:
                schema = pa.schema([schema.field(c) for c in final_cols])
        return rd.from_arrow(schema.empty_table())
    pieces = []
    if plain:
        kw = {"filter": where_expr(where)} if where else {}
        pieces.append(rd.read_parquet(plain, columns=final_cols, **kw))
    if mor:
        # the per-bucket LWW merge needs the key + _lsn (base) and _op
        # (deltas) even when the caller projected them away; generic tables
        # merge on their layout keys and their base files carry no _lsn
        merge_keys = ["conv_id", "turn_idx"]
        mor_layout = os.path.join(out_dir, "_layout.json")
        if os.path.exists(mor_layout):
            with open(mor_layout) as f:
                merge_keys = list(json.load(f)["key_cols"])
        merge_cols = None
        if final_cols is not None:
            where_cols = [c for c, _, _ in where] if where else []
            merge_cols = list(
                dict.fromkeys(
                    c
                    for c in [*final_cols, *where_cols, *merge_keys, "_lsn"]
                    if c != "_op"
                )
            )
        descs = [
            {
                "base": os.path.join(out_dir, m["file"]),
                "deltas": [os.path.join(out_dir, d["file"]) for d in m["deltas"]],
            }
            for m in mor
        ]

        def _merge_bucket(batch: pa.Table) -> pa.Table:
            from odibel_ray.cdc.apply import limit_arrow_threads

            limit_arrow_threads()
            outs = []
            for row in batch.to_pylist():
                bcols = merge_cols
                if bcols is not None:  # generic base files have no _lsn
                    have = set(pq.read_schema(row["base"]).names)
                    bcols = [c for c in bcols if c in have]
                base = pq.read_table(row["base"], columns=bcols)
                deltas = [
                    pq.read_table(
                        f, columns=None if merge_cols is None else [*merge_cols, "_op"]
                    )
                    for f in row["deltas"]
                ]
                t = merge_base_deltas(base, deltas, keys=merge_keys)
                if where:
                    t = filter_table(t, where)
                outs.append(t.select(final_cols) if final_cols is not None else t)
            return pa.concat_tables(outs, promote_options="default")

        merged = rd.from_items(descs).map_batches(
            _merge_bucket, batch_format="pyarrow", batch_size=1
        )
        pieces.append(merged)
    ds = None
    if pieces:
        ds = pieces[0] if len(pieces) == 1 else pieces[0].union(*pieces[1:])
        if smap is not None:
            from odibel_ray.cdc.ddl import _ddl_adapt

            # zero-copy relabel physical → logical (renames are relabels,
            # added columns are null arrays, widened columns cast)
            ds = ds.map_batches(
                partial(_ddl_adapt, smap=smap, columns=logical_cols),
                batch_format="pyarrow",
            )
        elif final_cols is not None:
            ds = ds.select_columns(final_cols)
    if done:
        # mid-materialize buckets already rewritten to the logical schema
        dcols = logical_cols if smap is not None else final_cols
        kw = {"filter": where_expr(where_logical)} if where_logical else {}
        dpiece = rd.read_parquet(done, columns=dcols, **kw)
        if dcols is not None:
            dpiece = dpiece.select_columns(dcols)  # pin column order for union
        ds = dpiece if ds is None else ds.union(dpiece)
    return ds


def lookup_key(
    out_dir: str,
    conv_id: str,
    *,
    turn_idx: int | None = None,
    columns: list[str] | None = None,
    system: bool = False,
    version: int | None = None,
) -> pa.Table:
    """Point read of one key from a published table — the payoff of the
    hash-bucketed layout: at 100 TB this opens ONE bucket file (or, for
    part-aligned layouts, prunes by Parquet footer stats) instead of
    scanning the table, so a CDC-serving lookup is O(one row group), not a
    distributed job. Driver-side on purpose: the result is a handful of
    rows.

    Layouts:
    - hash-bucketed tables (``num_buckets`` in the table manifest): the
      bucket id is recomputed from ``conv_id`` with the same hash the sink
      used, and exactly that bucket's manifested file is read;
    - partitioned tables (``num_buckets`` None — bucket == WAL part, whose
      assignment belonged to the upstream producer): every bucket file's
      footer is consulted, but bucket files are sorted by ``conv_id``
      (``_SORT_KEYS``), so Parquet row-group statistics prune all
      non-matching row groups before any data is read.

    ``version=V`` answers the lookup from retained snapshot V (time travel;
    see :func:`enable_snapshots`) — same single-file access pattern.
    """
    from odibel_ray.cdc.lww import bucket_of_keys

    from odibel_ray.cdc.ddl import SCHEMA_OPS, SchemaMap, load_schema_meta

    with open(os.path.join(out_dir, TABLE_MANIFEST)) as f:
        tman = json.load(f)
    manifests = (
        snapshot_manifests(out_dir, version) if version is not None else load_manifests(out_dir)
    )
    smap = None
    mrun = None
    if manifests and os.path.exists(os.path.join(out_dir, SCHEMA_OPS)):
        smeta = load_schema_meta(out_dir)
        # buckets already flipped by an in-flight materialize_ddl are
        # logical on disk; the rest still fold the op log
        mrun = smeta.get("materialized_run")
        pending_m = [
            m for m in manifests.values() if not (mrun and m.get("run_id") == mrun)
        ]
        if smeta["ops"] and pending_m:
            smap = SchemaMap(
                pq.read_schema(os.path.join(out_dir, pending_m[0]["file"])),
                smeta["ops"],
            )
    logical_cols = None
    phys_cols = columns
    if smap is not None:
        # requested columns are logical; pending files carry physical names
        # (keys are layout-pinned so the filters below stay valid)
        logical_cols = list(columns) if columns is not None else smap.names
        smap.check_columns(logical_cols)
        phys_cols = smap.physical_columns(logical_cols) or None
    num_buckets = tman.get("num_buckets")
    # generic tables pin their key columns in the layout; the transcript
    # path's keys are (conv_id, turn_idx) — the positional args map onto
    # the first (and optional second) key column either way
    key_cols = ["conv_id", "turn_idx"]
    layout_path = os.path.join(out_dir, "_layout.json")
    if os.path.exists(layout_path):
        with open(layout_path) as f:
            key_cols = list(json.load(f)["key_cols"])
    # generic tables hash ALL key columns into the bucket id — recomputing
    # it from the first key alone would open the wrong file. With the FULL
    # key given the bucket IS recomputable (probe values cast to the
    # canonical key types so integer-width differences can't skew the
    # hash); a partial composite key — or any DDL state, where file key
    # names may differ — takes the footer-pruned scan over all candidates.
    generic_multi = tman.get("generic") and len(key_cols) > 1
    single_key_hash = num_buckets and not generic_multi
    candidates = list(manifests.values())
    if single_key_hash:
        probe = pa.array([conv_id])
        if manifests:
            # Cast the probe to the CANONICAL key type before hashing:
            # pd.util.hash_array hashes int32(-5) and int64(-5) (or s/ms
            # timestamps) differently, so an uncast probe on a non-int64
            # generic key would route to the wrong bucket and silently
            # return empty. Keys are layout-pinned, so the first file's
            # key field is authoritative even mid-DDL.
            try:
                canon = pq.read_schema(
                    os.path.join(out_dir, next(iter(manifests.values()))["file"])
                )
                probe = probe.cast(canon.field(key_cols[0]).type)
            except (pa.ArrowInvalid, pa.ArrowTypeError, KeyError):
                pass  # unroutable probe type: keep the inferred type
        b = int(bucket_of_keys(pa.table({"k": probe}), ["k"], int(num_buckets))[0])
        candidates = [manifests[b]] if b in manifests else []
    elif (num_buckets and generic_multi and len(key_cols) == 2
          and turn_idx is not None and manifests
          and smap is None and mrun is None):
        try:
            canon = pq.read_schema(
                os.path.join(out_dir, next(iter(manifests.values()))["file"])
            )
            probe_t = pa.table({
                k: pa.array([v]).cast(canon.field(k).type)
                for k, v in zip(key_cols[:2], [conv_id, turn_idx])
            })
            b = int(bucket_of_keys(probe_t, key_cols[:2], int(num_buckets))[0])
            candidates = [manifests[b]] if b in manifests else []
        except (pa.ArrowInvalid, pa.ArrowTypeError, KeyError):
            pass  # unroutable probe: fall back to the pruned full scan
    filters = [(key_cols[0], "==", conv_id)]
    if turn_idx is not None and len(key_cols) > 1:
        filters.append((key_cols[1], "==", turn_idx))
    # buckets with merge-on-read deltas LWW-merge base ∪ deltas for the key
    # (the merge needs the key + _lsn/_op columns even when the caller asked
    # for fewer — read the superset, project at the end)
    tables = []
    for m in candidates:
        # flipped-by-materialize buckets are already logical on disk
        flipped = bool(mrun) and m.get("run_id") == mrun
        cols = (logical_cols if smap is not None else columns) if flipped else phys_cols
        merge_cols = None
        if cols is not None:
            merge_cols = list(
                dict.fromkeys(
                    c for c in [*cols, *key_cols, "_lsn"] if c != "_op"
                )
            )
        base_path = os.path.join(out_dir, m["file"])
        bcols = merge_cols if m.get("deltas") else cols
        if m.get("deltas") and bcols is not None:  # generic bases lack _lsn
            have = set(pq.read_schema(base_path).names)
            bcols = [c for c in bcols if c in have]
        base_t = pq.read_table(base_path, columns=bcols, filters=filters)
        if m.get("deltas"):
            delta_ts = [
                pq.read_table(
                    os.path.join(out_dir, d["file"]),
                    columns=None if merge_cols is None else [*merge_cols, "_op"],
                    filters=filters,
                )
                for d in m["deltas"]
            ]
            t = merge_base_deltas(base_t, delta_ts, keys=key_cols)
            if cols is not None:
                t = t.select(cols)
        else:
            t = base_t
        if smap is not None and not flipped:
            t = smap.adapt(t, logical_cols)
        tables.append(t)
    tables = [t for t in tables if len(t)]
    if not tables:
        if smap is not None:
            return smap.logical_schema(logical_cols).empty_table()
        # typed empty result from any manifested file's schema
        any_m = next(iter(manifests.values()), None)
        if any_m is None:
            raise FileNotFoundError(f"no published buckets under {out_dir}")
        schema = pq.read_schema(os.path.join(out_dir, any_m["file"]))
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        out = schema.empty_table()
    else:
        out = pa.concat_tables(tables, promote_options="default")
    if smap is not None:
        return out
    if not system and columns is None and not tman.get("generic"):
        # transcript tables hide _lsn/_op by default; GENERIC tables have no
        # system columns — a plain lookup returns their full row
        keep = [c for c in LOGICAL_COLUMNS if c in out.column_names]
        out = out.select(keep)
    return out


@_single_writer("out_dir")
def restore_snapshot(out_dir: str, version: int, *, run_id: str = "restore-0") -> dict:
    """Roll the live table back to retained snapshot ``version`` (the Delta
    ``RESTORE``): flip every bucket manifest to the snapshot's frozen copy
    and drop buckets born after it. Metadata-only — the snapshot's data
    files are on disk by the retention invariant (validated here), so no
    data moves. Per-bucket flips are atomic and re-runnable; history moves
    FORWARD: the restore records a new version rather than erasing the ones
    after the target, so a restore is itself restorable. The stored schema
    timeline deliberately keeps post-snapshot S events — a timeline that
    runs ahead is safe (monotone idempotent union; see incremental_apply),
    and the next apply re-derives watermarks from the restored manifests."""
    target = snapshot_manifests(out_dir, version)
    for m in target.values():
        for f in [m["file"], *(d["file"] for d in m.get("deltas", []))]:
            if not os.path.exists(os.path.join(out_dir, f)):
                raise FileNotFoundError(
                    f"snapshot v{version} data file {f} missing — retention was "
                    "broken (expire/vacuum raced a writer?); restore aborted"
                )
    live = load_manifests(out_dir)
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    for b, m in sorted(target.items()):
        _atomic_write_json(os.path.join(mdir, f"bucket-{b:06d}.json"), m)
    for b in set(live) - set(target):
        try:
            os.remove(os.path.join(mdir, f"bucket-{b:06d}.json"))
        except OSError:
            pass
    with open(os.path.join(out_dir, TABLE_MANIFEST)) as f:
        tman = json.load(f)
    tman.update(
        {
            "buckets": sorted(target),
            "rows_total": int(sum(m["rows_out"] for m in target.values())),
            "mor_deltas": int(sum(len(m.get("deltas", [])) for m in target.values())),
            "last_run_id": run_id,
        }
    )
    _atomic_write_json(os.path.join(out_dir, TABLE_MANIFEST), tman)
    snap = record_snapshot(out_dir, "restore")
    return {
        "restored_to": int(version),
        "published_total": len(target),
        "rows_total": tman["rows_total"],
        "snapshot": snap["version"] if snap else None,
        "out_dir": out_dir,
    }


def table_changes(
    out_dir: str,
    from_version: int,
    to_version: int | None = None,
    *,
    values: list[str] | None = None,
    keys: list[str] | None = None,
) -> "object":
    """Row-level diff between two retained table versions — the Delta
    ``table_changes`` / CDF read expressed over snapshots, so "what changed
    between v1 and v2" needs no feed to have been enabled at write time.

    ``to_version=None`` diffs against the live table. Keys default to the
    table's pinned ``_layout.json`` key columns (generic tables) or the
    transcript key; ``values`` defaults to ``["text"]`` for transcript
    tables. One hash exchange over keys+values total
    (:func:`odibel_ray.cdc.lww.change_feed`); each side's scan prunes to
    exactly those columns."""
    from odibel_ray.cdc.lww import change_feed

    generic = os.path.exists(os.path.join(out_dir, "_layout.json"))
    if keys is None:
        if generic:
            with open(os.path.join(out_dir, "_layout.json")) as f:
                keys = list(json.load(f)["key_cols"])
        else:
            keys = ["conv_id", "turn_idx"]
    if values is None:
        if generic:
            # generic tables have no 'text' column by contract — default to
            # every non-key, non-system column (footer-only schema probe)
            mans = load_manifests(out_dir)
            names: list[str] = []
            if mans:
                first = next(iter(mans.values()))
                names = pq.read_schema(os.path.join(out_dir, first["file"])).names
            values = [c for c in names if c not in keys and not c.startswith("_")]
        else:
            values = ["text"]
    cols = keys + values
    old = read_published(out_dir, version=from_version, columns=cols, system=True)
    new = read_published(out_dir, version=to_version, columns=cols, system=True)
    return change_feed(old, new, keys, values)


def fsck_table(out_dir: str) -> dict:
    """Integrity check of a published table — the operator's fsck. Verifies,
    from metadata and Parquet footers only (no Ray session, no data read):

    - every bucket manifest's base file and delta files exist with the
      manifested row counts (``load_manifests`` silently DROPS broken
      manifests so readers stay safe; this reports them);
    - every retained snapshot's referenced files still exist (time travel
      would fail otherwise);
    - all base files share one physical schema (unless a DDL op log / an
      in-flight ``materialize_ddl`` legitimately mixes generations);
    - stale staging dirs / orphan root data files (vacuum fodder, not
      corruption) and a dead lease holder are reported as warnings.

    Returns ``{ok, errors: [...], warnings: [...]}`` — ``ok`` means no
    errors (warnings allowed)."""
    errors: list[str] = []
    warnings: list[str] = []
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return {"ok": False, "errors": [f"no manifest dir under {out_dir}"], "warnings": []}

    referenced: set[str] = set()
    base_files: list[str] = []
    for fn in sorted(os.listdir(mdir)):
        if not (fn.startswith("bucket-") and fn.endswith(".json")):
            continue
        with open(os.path.join(mdir, fn)) as f:
            m = json.load(f)
        entries = [(m["file"], int(m["rows_out"]), "base")]
        entries += [(d["file"], int(d["rows_out"]), "delta") for d in m.get("deltas", [])]
        for path, rows, kind in entries:
            referenced.add(path)
            full = os.path.join(out_dir, path)
            if not os.path.exists(full):
                errors.append(f"bucket {m['bucket']}: {kind} file missing: {path}")
            elif pq.read_metadata(full).num_rows != rows:
                errors.append(
                    f"bucket {m['bucket']}: {kind} {path} has "
                    f"{pq.read_metadata(full).num_rows} rows, manifest says {rows}"
                )
            elif kind == "base":
                base_files.append(full)

    for snap in list_snapshots(out_dir):
        for b, m in snap["buckets"].items():
            for path in [m["file"], *(d["file"] for d in m.get("deltas", []))]:
                referenced.add(path)
                if not os.path.exists(os.path.join(out_dir, path)):
                    errors.append(
                        f"snapshot v{snap['version']} bucket {b}: file missing: {path}"
                    )

    # one-physical-schema invariant (DDL generations excepted)
    from odibel_ray.cdc.ddl import SCHEMA_OPS

    if base_files and not os.path.exists(os.path.join(out_dir, SCHEMA_OPS)):
        schemas = {str(pq.read_schema(f)) for f in base_files}
        if len(schemas) > 1:
            errors.append(
                f"{len(schemas)} distinct physical schemas across base files "
                "(a crashed materialize_ddl? its op log is gone)"
            )

    sdir = os.path.join(out_dir, STAGING_DIR)
    if os.path.isdir(sdir):
        # empty per-run dirs are normal post-publish residue; only staged
        # FILES mean a run died before promoting its work
        leftover = [
            d for d in os.listdir(sdir)
            if os.path.isdir(os.path.join(sdir, d)) and os.listdir(os.path.join(sdir, d))
        ]
        if leftover:
            warnings.append(f"{len(leftover)} staging dir(s) with files (vacuum)")
    for fn in os.listdir(out_dir):
        if (fn.startswith("part-") or fn.startswith("delta-")) and fn.endswith(".parquet"):
            if fn not in referenced:
                warnings.append(f"orphan data file {fn} (vacuum)")
    # Reuse table_lock's staleness rule (TTL + same-host pid liveness via
    # os.kill(pid, 0)) — a /proc probe is Linux-only and, cross-host, tests
    # the WRONG machine's pid table, flagging healthy remote writers stale.
    if os.path.exists(os.path.join(out_dir, "_LOCK.json")):
        if table_lock(out_dir)._is_stale():
            warnings.append("stale writer lease (_LOCK.json, holder dead or TTL expired)")
    return {"ok": not errors, "errors": errors, "warnings": warnings}


def lineage_table(out_dir: str) -> pa.Table:
    """Per-partition lineage + metrics from the commit manifests (the north
    rule's checkpoint record): bucket, rows_out, n_events, max applied LSN,
    number of WAL partitions contributing, run id."""
    manifests = load_manifests(out_dir)
    rows = []
    for b, m in sorted(manifests.items()):
        wms = m.get("watermarks", {})
        rows.append(
            {
                "bucket": int(b),
                "rows_out": int(m["rows_out"]),
                "n_events": int(m["n_events"]),
                "applied_lsn": max((int(v) for v in wms.values()), default=-1),
                "n_wal_parts": len(wms),
                "run_id": m.get("run_id", ""),
            }
        )
    return pa.Table.from_pylist(rows)


def _stats_schema_ops(out_dir: str) -> list[dict]:
    from odibel_ray.cdc.ddl import load_schema_ops

    return load_schema_ops(out_dir)


def _stats_expectations(out_dir: str) -> list[list]:
    from odibel_ray.cdc.quality import get_expectations

    return get_expectations(out_dir)


def table_stats(out_dir: str) -> dict:
    """Physical health report of a published table — the operator's
    ``DESCRIBE``: logical/physical row counts, bytes, merge-on-read delta
    backlog, bucket skew, watermark spread. Metadata-only (manifests +
    Parquet footers; no data read, no Ray session), so it is cheap at any
    table size and safe to run concurrently with a writer."""
    with open(os.path.join(out_dir, TABLE_MANIFEST)) as f:
        tman = json.load(f)
    manifests = load_manifests(out_dir)
    buckets = []
    for b, m in sorted(manifests.items()):
        base_path = os.path.join(out_dir, m["file"])
        deltas = m.get("deltas", [])
        delta_rows = sum(int(d["rows_out"]) for d in deltas)
        delta_bytes = sum(
            os.path.getsize(os.path.join(out_dir, d["file"])) for d in deltas
        )
        wms = [int(v) for v in m.get("watermarks", {}).values()]
        buckets.append(
            {
                "bucket": int(b),
                "base_rows": int(m["rows_out"]),
                "base_bytes": os.path.getsize(base_path),
                "n_deltas": len(deltas),
                "delta_rows": delta_rows,
                "delta_bytes": delta_bytes,
                "max_lsn": max(wms, default=-1),
            }
        )
    base_rows = [b["base_rows"] for b in buckets]
    total_rows = sum(base_rows)
    mean_rows = total_rows / len(buckets) if buckets else 0.0
    return {
        "out_dir": out_dir,
        "num_buckets": tman.get("num_buckets"),
        "published_buckets": len(buckets),
        "rows_base": total_rows,
        "rows_delta": sum(b["delta_rows"] for b in buckets),
        "bytes_base": sum(b["base_bytes"] for b in buckets),
        "bytes_delta": sum(b["delta_bytes"] for b in buckets),
        "deltas_total": sum(b["n_deltas"] for b in buckets),
        # buckets carrying deltas pay the merge on read — compaction signal
        "buckets_with_deltas": sum(1 for b in buckets if b["n_deltas"]),
        # skew: a bucket K× the mean serializes its stage at cluster scale
        "bucket_skew_max_over_mean": round(
            max(base_rows, default=0) / mean_rows, 3
        )
        if mean_rows
        else 0.0,
        "schema_version": tman.get("schema_version"),
        "last_run_id": tman.get("last_run_id"),
        "write_seq": tman.get("write_seq"),
        "cluster_by": tman.get("cluster_by"),
        # pending metadata-only DDL ops and the CHECK constraint, so DESCRIBE
        # shows the table's full logical contract, not just its bytes
        "schema_ops": _stats_schema_ops(out_dir),
        "expectations": _stats_expectations(out_dir),
        "snapshot_policy": snapshot_policy(out_dir),
        "snapshots": [
            {"version": s["version"], "op": s["op"], "rows_total": s["rows_total"]}
            for s in list_snapshots(out_dir)
        ],
        "buckets": buckets,
    }


@_single_writer("out_dir", owner_arg="")
def vacuum(
    out_dir: str,
    *,
    feed_dir: str | None = None,
    keep_feed_states: int = 3,
    keep_snapshots: int | None = None,
) -> dict:
    """Maintenance sweep of a published table — the lakehouse ``VACUUM``:

    - **staging**: ``_staging/<run_id>/`` dirs are working space; whatever a
      crashed run left there was either re-staged by the resume or is
      superseded — always removable (single-writer sink).
    - **orphan data files**: root ``part-*.parquet`` not referenced by any
      bucket manifest (crash leftovers the per-bucket sweep didn't reach,
      e.g. a bucket never republished after a crashed run).
    - **feed retention** (``feed_dir``): each bucket keeps its newest
      ``keep_feed_states`` change-feed files; older state transitions are
      dropped. Feed files are named by watermark-state hash, so "newest" is
      by mtime (the publish order on one writer).

    Run this only while no publish is in flight — it removes the working
    state an in-flight run is about to promote. Returns removal counts."""
    import glob as _glob
    import shutil

    removed = {"staging_dirs": 0, "orphan_files": 0, "feed_files": 0, "snapshots": 0,
               "feed_dirs": 0}
    if keep_snapshots is not None:
        # tighten retention first so the orphan scan below sees the final
        # retained set (``keep_snapshots=0`` drops time travel entirely)
        removed["snapshots"] = expire_snapshots(out_dir, keep_snapshots)["snapshots"]
    sdir = os.path.join(out_dir, STAGING_DIR)
    if os.path.isdir(sdir):
        for run_dir in os.listdir(sdir):
            shutil.rmtree(os.path.join(sdir, run_dir), ignore_errors=True)
            removed["staging_dirs"] += 1
    # cascade working feeds (<table>/_feeds/<run>): consumed synchronously by
    # refresh_pipeline / tail_log, so anything still here is a leftover
    fdir = os.path.join(out_dir, "_feeds")
    if os.path.isdir(fdir):
        for run_dir in os.listdir(fdir):
            shutil.rmtree(os.path.join(fdir, run_dir), ignore_errors=True)
            removed["feed_dirs"] += 1
    live: set[str] = set()
    for m in load_manifests(out_dir).values():
        live.add(m["file"])
        live.update(d["file"] for d in m.get("deltas", []))
    # files pinned by retained snapshots are not orphans (time travel)
    live |= _retained_files(out_dir)
    for pat in ("part-*.parquet", "delta-*.parquet"):
        for f in _glob.glob(os.path.join(out_dir, pat)):
            if os.path.basename(f) not in live:
                try:
                    os.remove(f)
                    removed["orphan_files"] += 1
                except OSError:
                    pass
                try:
                    os.remove(f + ".bloom")
                except OSError:
                    pass
    # widowed bloom sidecars (data file gone, e.g. removed pre-upgrade)
    for f in _glob.glob(os.path.join(out_dir, "part-*.parquet.bloom")):
        if not os.path.exists(f[: -len(".bloom")]):
            try:
                os.remove(f)
                removed["orphan_files"] += 1
            except OSError:
                pass
    if feed_dir and os.path.isdir(feed_dir):
        for bdir in _glob.glob(os.path.join(feed_dir, "bucket=*")):
            files = sorted(
                _glob.glob(os.path.join(bdir, "*.parquet")),
                key=os.path.getmtime,
            )
            for f in files[: max(0, len(files) - keep_feed_states)]:
                try:
                    os.remove(f)
                    removed["feed_files"] += 1
                except OSError:
                    pass
    return removed


def count_published(out_dir: str, where=None, *, version: int | None = None) -> int:
    """``SELECT COUNT(*)`` without a data scan when possible: with no
    predicate the count is the manifest row-count sum (metadata-only — the
    audit guarantees it equals the files' rows; merge-on-read buckets fall
    back to a per-bucket merged count since tombstoned/superseded delta
    rows are not knowable from metadata). With a predicate, the count runs
    over the pruned read (bucket routing + zone maps + blooms first)."""
    if where is not None:
        return int(read_published(out_dir, where=where, version=version).count())
    manifests = (
        snapshot_manifests(out_dir, version)
        if version is not None
        else load_manifests(out_dir)
    )
    if not manifests:
        raise FileNotFoundError(f"no published buckets under {out_dir}")
    mor = [b for b, m in manifests.items() if m.get("deltas")]
    total = sum(int(m["rows_out"]) for b, m in manifests.items() if b not in set(mor))
    if mor:
        # a delta may supersede or tombstone base rows — count those
        # buckets through the LWW merge (still only the delta-bearing ones)
        layout_path = os.path.join(out_dir, "_layout.json")
        keys = ["conv_id", "turn_idx"]
        if os.path.exists(layout_path):
            with open(layout_path) as f:
                keys = list(json.load(f)["key_cols"])
        for b in mor:
            m = manifests[b]
            base = pq.read_table(os.path.join(out_dir, m["file"]))
            deltas = [
                pq.read_table(os.path.join(out_dir, d["file"])) for d in m["deltas"]
            ]
            total += len(merge_base_deltas(base, deltas, keys=keys))
    return int(total)


_BUCKET_PRUNE_MAX_PROBES = 64


def _bucket_prune(
    out_dir: str, manifests: dict[int, dict], where, schema: pa.Schema
) -> dict[int, dict]:
    """Hash-layout bucket pruning: when a conjunctive ``where`` pins every
    bucket-hash key column with ``==`` (or a small ``in``), the candidate
    buckets are recomputable from the probe values — the same routing
    :func:`lookup_key` uses, applied inside the general scan. Exact (hash
    identity, no false positives beyond hash-bucket sharing) and free of
    sidecar state; zone maps and blooms still apply to the survivors.
    Returns ``manifests`` unchanged whenever the layout doesn't allow it
    (clustered, schema-op log pending, keys not fully pinned)."""
    from itertools import product

    from odibel_ray.cdc.ddl import SCHEMA_OPS
    from odibel_ray.cdc.lww import bucket_of_keys

    if not manifests or not where:
        return manifests
    if os.path.exists(os.path.join(out_dir, SCHEMA_OPS)):
        return manifests  # logical->physical key renames: stay conservative
    layout_path = os.path.join(out_dir, "_layout.json")
    if os.path.exists(layout_path):
        with open(layout_path) as f:
            layout = json.load(f)
        if layout.get("cluster_by"):
            return manifests
        hash_keys = list(layout["key_cols"])
        num_buckets = int(layout["num_buckets"])
    else:
        tman_path = os.path.join(out_dir, TABLE_MANIFEST)
        if not os.path.exists(tman_path):
            return manifests
        with open(tman_path) as f:
            tman = json.load(f)
        if tman.get("generic") or not tman.get("num_buckets"):
            return manifests
        hash_keys = ["conv_id"]  # transcript layout hashes the conv only
        num_buckets = int(tman["num_buckets"])
    probes: list[list] = []
    for k in hash_keys:
        vals = None
        for col, op, val in where:
            if col != k:
                continue
            if op == "==":
                vals = [val]
            elif op == "in" and len(val) <= _BUCKET_PRUNE_MAX_PROBES:
                vals = list(val)
            break  # first clause per key wins; further ones only narrow
        if vals is None:
            return manifests  # a hash key is unpinned: any bucket can match
        probes.append(vals)
    combos = list(product(*probes))
    if not combos or len(combos) > _BUCKET_PRUNE_MAX_PROBES:
        return manifests
    try:
        probe_t = pa.table({
            k: pa.array([c[i] for c in combos]).cast(schema.field(k).type)
            for i, k in enumerate(hash_keys)
        })
    except (pa.ArrowInvalid, pa.ArrowTypeError, KeyError):
        return manifests  # probe value can't be the key's type: no pruning
    keep = set(bucket_of_keys(probe_t, hash_keys, num_buckets).tolist())
    return {b: m for b, m in manifests.items() if b in keep}


def _join_side_meta(out_dir: str) -> dict:
    """Layout + manifest facts one side of a storage-partitioned join needs."""
    from odibel_ray.cdc.ddl import SCHEMA_OPS, load_schema_meta

    layout_path = os.path.join(out_dir, "_layout.json")
    if not os.path.exists(layout_path):
        raise FileNotFoundError(
            f"{out_dir} has no _layout.json — join_published needs generic "
            "published tables (publish_dataset layouts)"
        )
    with open(layout_path) as f:
        layout = json.load(f)
    if layout.get("cluster_by"):
        raise ValueError(
            f"{out_dir} is range/z-clustered; storage-partitioned joins need "
            "the hash-bucketed layout (keep the primary hash table for joins)"
        )
    if os.path.exists(os.path.join(out_dir, SCHEMA_OPS)):
        if load_schema_meta(out_dir).get("ops"):
            raise ValueError(
                f"{out_dir} has a pending schema op log; materialize_ddl "
                "before joining (the join reads physical files directly)"
            )
    manifests = load_manifests(out_dir)
    if not manifests:
        raise FileNotFoundError(f"no published buckets under {out_dir}")
    any_file = os.path.join(out_dir, next(iter(manifests.values()))["file"])
    return {
        "dir": out_dir,
        "key_cols": list(layout["key_cols"]),
        "num_buckets": int(layout["num_buckets"]),
        "manifests": manifests,
        "schema": pq.read_schema(any_file),
    }


def join_published(
    left_dir: str,
    right_dir: str,
    *,
    how: str = "inner",
    left_columns: list[str] | None = None,
    right_columns: list[str] | None = None,
    right_suffix: str = "_r",
):
    """SHUFFLE-FREE join of two published tables bucketed identically on the
    join key — the Hive bucket-map-join / Iceberg storage-partitioned-join
    analog (the reference inherits joins from Spark and always exchanges,
    ``eval/SchemaGraphEval.scala`` typing joins). Both sides must be generic
    published tables with the SAME ``key_cols`` and ``num_buckets`` (pinned
    in their ``_layout.json``; :func:`rebucket_published` co-partitions a
    mismatched table). Bucket b of the left can then only match bucket b of
    the right, so the join runs as ONE map task per bucket — each task reads
    the two bucket files (LWW-merging any merge-on-read deltas per side) and
    joins in Arrow. Zero exchange: at 10^10 rows per side this moves no data
    between workers at all.

    ``how``: ``inner | left_outer | full_outer | left_semi | left_anti``.
    ``left_columns``/``right_columns`` prune each side's bucket read (join
    keys are always read). Returns a streaming ``ray.data.Dataset``.
    """
    import ray.data as rd

    how_map = {
        "inner": "inner",
        "left": "left outer",
        "left_outer": "left outer",
        "full": "full outer",
        "full_outer": "full outer",
        "left_semi": "left semi",
        "left_anti": "left anti",
    }
    if how not in how_map:
        raise ValueError(f"how must be one of {sorted(how_map)}")
    join_type = how_map[how]
    left = _join_side_meta(left_dir)
    right = _join_side_meta(right_dir)
    if left["key_cols"] != right["key_cols"]:
        raise ValueError(
            f"key_cols differ: {left['key_cols']} vs {right['key_cols']} — "
            "storage-partitioned joins need identical layouts"
        )
    if left["num_buckets"] != right["num_buckets"]:
        raise ValueError(
            f"num_buckets differ: {left['num_buckets']} vs "
            f"{right['num_buckets']}; rebucket_published one side first"
        )
    keys = left["key_cols"]

    def side_cols(meta, want):
        if want is None:
            return None
        missing = [c for c in want if c not in meta["schema"].names]
        if missing:
            raise ValueError(f"{meta['dir']} has no columns {missing}")
        return list(dict.fromkeys([*keys, *want]))  # keys first, deduped

    lcols = side_cols(left, left_columns)
    rcols = side_cols(right, right_columns)

    def empty_side(meta, cols):
        s = meta["schema"]
        if cols is not None:
            s = pa.schema([s.field(c) for c in cols])
        return s.empty_table()

    descs = []
    for b in sorted(set(left["manifests"]) | set(right["manifests"])):
        lm = left["manifests"].get(b)
        rm = right["manifests"].get(b)
        if lm is None and join_type in ("inner", "left outer", "left semi", "left anti"):
            continue  # no left rows ⇒ nothing to emit for these join types
        if rm is None and join_type in ("inner", "left semi"):
            continue
        descs.append(
            {
                "bucket": int(b),
                "left_file": os.path.join(left_dir, lm["file"]) if lm else "",
                "left_deltas": [
                    os.path.join(left_dir, d["file"]) for d in (lm or {}).get("deltas", [])
                ],
                "right_file": os.path.join(right_dir, rm["file"]) if rm else "",
                "right_deltas": [
                    os.path.join(right_dir, d["file"]) for d in (rm or {}).get("deltas", [])
                ],
            }
        )
    joined_schema = empty_side(left, lcols).join(
        empty_side(right, rcols), keys=keys, join_type=join_type,
        right_suffix=right_suffix,
    ).schema
    if not descs:
        return rd.from_arrow(joined_schema.empty_table())

    def read_side(file, deltas, meta, cols):
        if not file:
            t = empty_side(meta, None)
        elif deltas:
            base = pq.read_table(file)
            t = merge_base_deltas(base, [pq.read_table(f) for f in deltas], keys=keys)
        else:
            t = pq.read_table(file, columns=cols)
        if cols is not None:
            t = t.select(cols)
        return t

    def join_bucket(batch: pa.Table) -> pa.Table:
        from odibel_ray.cdc.apply import limit_arrow_threads

        limit_arrow_threads()
        outs = []
        for row in batch.to_pylist():
            lt = read_side(row["left_file"], row["left_deltas"], left, lcols)
            rt = read_side(row["right_file"], row["right_deltas"], right, rcols)
            j = lt.join(rt, keys=keys, join_type=join_type,
                        right_suffix=right_suffix)
            outs.append(j.select(joined_schema.names).cast(joined_schema))
        return pa.concat_tables(outs) if outs else joined_schema.empty_table()

    return rd.from_items(descs).map_batches(
        join_bucket, batch_format="pyarrow", batch_size=1
    )


@_single_writer("dst_dir")
def rebucket_published(
    src_dir: str,
    dst_dir: str,
    *,
    num_buckets: int,
    run_id: str = "rebucket-0",
    batch_size: int = 65536,
) -> dict:
    """Rewrite a published table at a different bucket count — the cluster
    maintenance op for the north rule's fixed-size resize (an N→4N-node
    cluster wants ~4× the buckets so each node still owns several resume
    units). Out-of-place: the rebucketed table is write-audit-published into
    ``dst_dir`` while ``src_dir`` keeps serving readers; the switch is the
    caller pointing readers at ``dst_dir``. Resumable like any publish —
    already-manifested destination buckets are filtered out before the
    shuffle, so a killed rebucket re-does only unfinished buckets.

    Watermark note: the destination manifests' per-(bucket, part) watermarks
    are recomputed from surviving rows, so they can REGRESS below the
    source's (a delete's LSN leaves no surviving row). That is safe for
    :func:`incremental_apply` on the destination: replay is keep-last over
    ``base ∪ events-above-watermark``, re-applying an already-applied event
    is idempotent, and no event at or below the regressed watermark can
    supersede a base row (a converged base row already carries its key's
    maximum applied LSN).
    """
    import ray.data as rd  # noqa: F401  (read_published builds the Dataset)

    from odibel_ray.cdc.apply import bucket_of_conv

    with open(os.path.join(src_dir, TABLE_MANIFEST)) as f:
        tman = json.load(f)
    os.makedirs(os.path.join(dst_dir, MANIFEST_DIR), exist_ok=True)
    staging = os.path.join(dst_dir, STAGING_DIR, run_id)
    os.makedirs(staging, exist_ok=True)
    done = load_manifests(dst_dir)
    done_arr = np.array(sorted(done), dtype=np.int64)

    base = read_published(src_dir, system=True)

    def to_events(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        bucket = bucket_of_conv(conv, num_buckets)
        out = pa.table(
            {
                "op": pa.array(np.full(len(t), "I"), pa.string()),
                "lsn": t["_lsn"],
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "role": t["role"],
                "text": t["text"],
                "tool_name": t["tool_name"],
                "score": t["score"],
                "ts": t["ts"],
                "part": t["_part"],
                "bucket": pa.array(bucket),
            }
        )
        if len(done_arr):
            out = out.filter(pa.array(~np.isin(bucket, done_arr)))
        return out

    ev = base.map_batches(to_events, batch_format="pyarrow", batch_size=batch_size)
    manifest_ds = ev.groupby("bucket").map_groups(
        partial(_apply_write_group, staging=staging, run_id=run_id),
        batch_format="pyarrow",
    )
    published = _publish_stream(manifest_ds, dst_dir)

    all_manifests = load_manifests(dst_dir)
    new_tman = {
        **tman,
        "num_buckets": num_buckets,
        "buckets": sorted(all_manifests),
        "rows_total": int(sum(m["rows_out"] for m in all_manifests.values())),
        "last_run_id": run_id,
        "rebucketed_from": src_dir,
    }
    _atomic_write_json(os.path.join(dst_dir, TABLE_MANIFEST), new_tman)
    return {
        "published_now": len(published),
        "published_total": len(all_manifests),
        "rows_total": new_tman["rows_total"],
        "out_dir": dst_dir,
    }


@_single_writer("out_dir")
def compact_published(
    out_dir: str,
    *,
    run_id: str = "compact-0",
    min_deltas: int = 1,
    metrics: str | None = None,
    snapshots: int | None = None,
) -> dict:
    """Fold merge-on-read deltas back into their buckets' base files — the
    lakehouse compaction that bounds a MOR table's read amplification. One
    task per delta-bearing bucket: read base + deltas, LWW-merge (drop
    tombstones), stage a fresh base under this run's name, then the ordinary
    write-audit-publish pointer flip clears the manifest's delta list and
    sweeps the folded files. Resumable: a killed compaction left either the
    old manifest (deltas intact — recompact) or the new one (already clean);
    ``min_deltas`` skips buckets not worth rewriting yet."""
    import ray.data as rd

    if snapshots is not None:
        enable_snapshots(out_dir, keep_last=snapshots)
    with open(os.path.join(out_dir, TABLE_MANIFEST)) as f:
        tman = json.load(f)
    manifests = load_manifests(out_dir)
    targets = {
        b: m for b, m in manifests.items() if len(m.get("deltas", [])) >= min_deltas
    }
    if not targets:
        return {
            "compacted": 0,
            "published_total": len(manifests),
            "rows_total": tman["rows_total"],
            "out_dir": out_dir,
        }
    staging = os.path.join(out_dir, STAGING_DIR, run_id)
    os.makedirs(staging, exist_ok=True)
    descs = [
        {
            "bucket": int(b),
            "base": os.path.join(out_dir, m["file"]),
            "deltas": [os.path.join(out_dir, d["file"]) for d in m["deltas"]],
            # events that ever contributed to this bucket (lineage continuity)
            "n_events": int(m["n_events"])
            + sum(int(d["n_events"]) for d in m["deltas"]),
            # effective watermarks are already merged over base ∪ deltas —
            # carried verbatim, so the next incremental filter stays exact
            "watermarks": json.dumps(m["watermarks"]),
        }
        for b, m in sorted(targets.items())
    ]

    compact_keys = ["conv_id", "turn_idx"]
    compact_blooms: list[str] | None = None
    layout_path = os.path.join(out_dir, "_layout.json")
    if os.path.exists(layout_path):
        with open(layout_path) as f:
            _lay = json.load(f)
        compact_keys = list(_lay["key_cols"])
        compact_blooms = _lay.get("bloom_cols")

    def _compact_bucket(batch: pa.Table) -> pa.Table:
        from odibel_ray.cdc.apply import limit_arrow_threads

        limit_arrow_threads()
        outs = []
        for row in batch.to_pylist():
            bucket = int(row["bucket"])
            base = pq.read_table(row["base"])
            deltas = [pq.read_table(f) for f in row["deltas"]]
            out = merge_base_deltas(base, deltas, keys=compact_keys)
            fname = _bucket_filename(bucket, run_id)
            staged = os.path.join(staging, fname)
            _write_data_file(out, staged)
            if compact_blooms:
                from odibel_ray.cdc.skipping import (
                    BLOOM_SUFFIX,
                    build_bloom_sidecar,
                )

                build_bloom_sidecar(out, compact_blooms, staged + BLOOM_SUFFIX)
            if metrics:
                from odibel_ray.monitor import record_task_metrics

                record_task_metrics(metrics, rows=len(out), buckets_staged=1)
            outs.append(
                pa.table(
                    {
                        "bucket": pa.array([bucket], pa.int64()),
                        "rows_out": pa.array([len(out)], pa.int64()),
                        "n_events": pa.array([int(row["n_events"])], pa.int64()),
                        "file": pa.array([fname], pa.string()),
                        "staged": pa.array([staged], pa.string()),
                        "watermarks": pa.array([row["watermarks"]], pa.string()),
                        "run_id": pa.array([run_id], pa.string()),
                        "feed_staged": pa.array([""], pa.string()),
                        "feed_final": pa.array([""], pa.string()),
                    }
                )
            )
        return pa.concat_tables(outs)

    manifest_ds = rd.from_items(descs).map_batches(
        _compact_bucket, batch_format="pyarrow", batch_size=1
    )
    published = _publish_stream(manifest_ds, out_dir)

    all_manifests = load_manifests(out_dir)
    tman.update(
        {
            "buckets": sorted(all_manifests),
            "rows_total": int(sum(m["rows_out"] for m in all_manifests.values())),
            "mor_deltas": int(
                sum(len(m.get("deltas", [])) for m in all_manifests.values())
            ),
            "last_run_id": run_id,
        }
    )
    _atomic_write_json(os.path.join(out_dir, TABLE_MANIFEST), tman)
    snap = record_snapshot(out_dir, "compact_published")
    return {
        "compacted": len(published),
        "published_total": len(all_manifests),
        "rows_total": tman["rows_total"],
        "snapshot": snap["version"] if snap else None,
        "deltas_total": tman["mor_deltas"],
        "out_dir": out_dir,
    }


def _watermark_matrix(manifests: dict[int, dict]) -> np.ndarray:
    nb = max(manifests) + 1 if manifests else 0
    nparts = 0
    for m in manifests.values():
        for p in m["watermarks"]:
            nparts = max(nparts, int(p) + 1)
    wm = np.full((max(nb, 1), max(nparts, 1)), -1, dtype=np.int64)
    for b, m in manifests.items():
        for p, l in m["watermarks"].items():
            wm[b, int(p)] = int(l)
    return wm


@_single_writer("out_dir")
def incremental_apply(
    log_dir: str,
    out_dir: str,
    *,
    run_id: str = "run-inc",
    batch_size: int = 65536,
    feed_dir: str | None = None,
    feed_values: list[str] | None = None,
    feed_lsn: bool = False,
    metrics: str | None = None,
    mode: str = "cow",
    snapshots: int | None = None,
) -> dict:
    """Apply new change-log events (``lsn`` beyond each bucket's per-partition
    watermark) onto the published base table; untouched buckets are left as-is.

    Convergence argument: a base row was produced by some event with
    ``_lsn <= watermark`` in the key's WAL partition; any *new* event for that
    key has a larger LSN in the same partition, so replaying
    ``base-as-insert(lsn=_lsn) ∪ new-events`` under keep-last-per-key yields
    exactly the state of a from-scratch replay. Kill-resume of the incremental
    run itself is idempotent because publish is per-bucket atomic and the
    watermark filter drops already-applied events.

    ``feed_dir``: also emit the run's change-data-feed (row-level
    insert/update/delete with before/after ``text`` vs the base table, the
    lakehouse CDF a MERGE writes alongside the data) as partitioned Parquet
    under ``feed_dir/bucket=<b>/state-<watermark-hash>.parquet`` — computed inside the
    same per-bucket apply task from state the merge already holds (base row
    + winning event per key), so it costs no extra exchange or log read.
    Feed filenames are keyed by the bucket's post-apply watermark map, so a
    crash-resume under a *different* run_id still overwrites rather than
    duplicates the crashed run's feed rows; keys in untouched buckets have
    no new events and thus no feed rows. ``feed_lsn=True`` adds an ``_lsn``
    ordering column to the feed (see :func:`odibel_ray.cdc.apply.feed_table`)
    so consumers can resolve the latest transition per key across telescoped
    state files — required by ``refresh_derived(strategy='feed')`` when
    several applies run between refreshes.

    ``mode``: ``"cow"`` (default) rewrites each touched bucket from
    ``base ∪ new-events`` — read-optimized, but at high apply frequency every
    run re-reads and re-writes whole buckets its events barely touch.
    ``"mor"`` (merge-on-read) stages only the compacted new events as a
    per-bucket DELTA file (tombstones retained) and appends a delta
    descriptor to the bucket manifest in the same atomic pointer flip —
    write cost is O(new events), no base read at all; readers
    (:func:`read_published`, :func:`lookup_key`) LWW-merge base ∪ deltas per
    bucket, and :func:`compact_published` folds deltas back into the base.
    The Hudi/Delta MOR trade expressed over this sink's manifests. CDF
    (``feed_dir``) requires the base row for before-values, so it is
    CoW-only.
    """
    import ray.data as rd

    if mode not in ("cow", "mor"):
        raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")
    if mode == "mor" and feed_dir:
        raise ValueError(
            "change-data-feed needs the base row for before-values; "
            "use mode='cow' with feed_dir"
        )

    if snapshots is not None:
        enable_snapshots(out_dir, keep_last=snapshots)
    with open(os.path.join(out_dir, TABLE_MANIFEST)) as f:
        tman = json.load(f)
    num_buckets = tman["num_buckets"]
    manifests = load_manifests(out_dir)
    old_tl = SchemaTimeline.from_json(tman["timeline"])
    wm = _watermark_matrix(manifests)

    # global per-part applied watermark (min over buckets would over-apply S
    # events; S events are partition-global, applied once: use max — an S event
    # below a part's max has been folded into the stored timeline already)
    per_part_max = {p: int(wm[:, p].max()) for p in range(wm.shape[1])}
    new_tl = extract_timeline(log_dir, min_lsn_by_part=per_part_max)
    timeline = old_tl.merged_with(new_tl)

    # persist the merged timeline BEFORE any bucket publish: per-bucket
    # watermarks advance as buckets flip, and a crash in between would
    # otherwise strand S events at-or-below the new per_part_max — the
    # resume's extract_timeline skips them ("folded into the stored timeline
    # already") but the stored timeline never got them, silently un-mapping
    # every later event's schema. Writing it early is safe: timeline merge is
    # a deduplicated monotone union, so a timeline that runs ahead of a fully
    # failed apply only pre-records S events the next run re-merges
    # idempotently.
    if len(timeline.changes) != len(old_tl.changes):
        tman_early = dict(tman)
        tman_early["timeline"] = timeline.to_json()
        tman_early["schema_version"] = len(timeline.changes)
        _atomic_write_json(os.path.join(out_dir, TABLE_MANIFEST), tman_early)
        tman = tman_early

    # materialized once: both the touched-bucket scan and the merge consume it
    # from the object store — without this the full log would be read and
    # prepared twice (once for bucket ids, once for the merge)
    new_ev = rd.read_parquet(log_dir).map_batches(
        prepare_events,
        fn_kwargs={"timeline": timeline, "num_buckets": num_buckets, "watermarks": wm},
        batch_format="pyarrow",
        batch_size=batch_size,
    ).materialize()

    # which buckets actually have new events (tiny aggregate — bucket ids only)
    touched_vals = new_ev.select_columns(["bucket"]).unique("bucket") or []
    touched = np.array(sorted(int(b) for b in touched_vals), dtype=np.int64)
    if len(touched) == 0:
        # nothing applied → table state unchanged → no new snapshot version
        return {"published_now": 0, "published_total": len(manifests), "touched": 0,
                "rows_total": tman["rows_total"], "snapshot": None, "out_dir": out_dir}

    if mode == "mor":
        staging = os.path.join(out_dir, STAGING_DIR, run_id)
        os.makedirs(staging, exist_ok=True)
        base_wms = {b: dict(m["watermarks"]) for b, m in manifests.items()}
        merged = new_ev.map_batches(
            compact_batch, batch_format="pyarrow", batch_size=batch_size
        )
        manifest_ds = merged.groupby("bucket").map_groups(
            partial(
                _delta_write_group,
                staging=staging,
                run_id=run_id,
                base_buckets=frozenset(manifests),
                base_wms=base_wms,
                metrics=metrics,
            ),
            batch_format="pyarrow",
        )
        published = _publish_mor_stream(manifest_ds, out_dir)
        all_manifests = load_manifests(out_dir)
        tman.update(
            {
                "buckets": sorted(all_manifests),
                # base rows only — the logical count of a MOR table needs the
                # merge; compact_published restores the exact figure
                "rows_total": int(sum(m["rows_out"] for m in all_manifests.values())),
                "mor_deltas": int(
                    sum(len(m.get("deltas", [])) for m in all_manifests.values())
                ),
                "timeline": timeline.to_json(),
                "schema_version": len(timeline.changes),
                "last_run_id": run_id,
            }
        )
        _atomic_write_json(os.path.join(out_dir, TABLE_MANIFEST), tman)
        snap = record_snapshot(out_dir, "incremental_apply_mor")
        return {
            "published_now": len(published),
            "published_total": len(all_manifests),
            "touched": int(len(touched)),
            "n_events_applied": int(sum(p["n_events"] for p in published)),
            "rows_total": tman["rows_total"],
            "snapshot": snap["version"] if snap else None,
            "deltas_total": tman["mor_deltas"],
            "out_dir": out_dir,
        }

    # a table bootstrapped by a schema-only/malformed-only publish has a
    # TABLE manifest (carrying the timeline) but ZERO bucket manifests —
    # there is no base to fold in, the apply runs on the new events alone
    base = read_published(out_dir, system=True) if manifests else None

    def _base_as_events(t: pa.Table) -> pa.Table:
        keep = np.isin(t["_bucket"].to_numpy(zero_copy_only=False), touched)
        t = t.filter(pa.array(keep))
        cols = {
            "op": pa.array(["I"] * len(t), pa.string()),
            "lsn": t["_lsn"],
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "role": t["role"],
            "text": t["text"],
            "tool_name": t["tool_name"],
            "score": t["score"],
            "ts": t["ts"],
            "part": t["_part"],
            "bucket": t["_bucket"],
        }
        if feed_dir:
            cols["_base"] = pa.array(np.ones(len(t), dtype=bool))
        return pa.table(cols)

    base_ev = (
        base.map_batches(_base_as_events, batch_format="pyarrow",
                         batch_size=batch_size)
        if base is not None
        else None
    )
    if feed_dir:
        def _mark_new(t: pa.Table) -> pa.Table:
            return t.append_column("_base", pa.array(np.zeros(len(t), dtype=bool)))

        new_side = new_ev.map_batches(_mark_new, batch_format="pyarrow", batch_size=batch_size)
    else:
        new_side = new_ev
    merged = new_side.union(base_ev) if base_ev is not None else new_side
    if feed_dir:
        # side-aware combiner: keep the max-LSN row per (key, base-vs-new) so
        # the before-state survives compaction alongside the winning event
        def _compact_keep_base(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return t
            t = t.combine_chunks()
            t = t.take(pc.sort_indices(t, sort_keys=_SORT_KEYS))
            n = len(t)
            keep = np.ones(n, dtype=bool)
            if n > 1:
                conv, turn = t["conv_id"], t["turn_idx"]
                same_next = pc.fill_null(
                    pc.and_(
                        pc.equal(conv.slice(1), conv.slice(0, n - 1)),
                        pc.equal(turn.slice(1), turn.slice(0, n - 1)),
                    ),
                    False,
                ).to_numpy(zero_copy_only=False)
                b = t["_base"].to_numpy(zero_copy_only=False).astype(bool)
                keep[: n - 1] = ~(same_next & (b[:-1] == b[1:]))
            return t.filter(pa.array(keep))

        merged = merged.map_batches(
            _compact_keep_base, batch_format="pyarrow", batch_size=batch_size
        )
    else:
        merged = merged.map_batches(compact_batch, batch_format="pyarrow", batch_size=batch_size)

    staging = os.path.join(out_dir, STAGING_DIR, run_id)
    os.makedirs(staging, exist_ok=True)
    if feed_dir:
        from odibel_ray.cdc.apply import feed_table

        def _apply_with_feed(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return _MANIFEST_SCHEMA.empty_table()
            bucket = int(t["bucket"][0].as_py())
            feed = feed_table(
                t, mask_col="_base", values=feed_values or ("text",),
                with_lsn=feed_lsn,
            )
            # stage the feed next to the bucket's staged data; _publish_stream
            # moves it into feed_dir inside the bucket's atomic publish step,
            # so feed rows never describe state that isn't visible yet
            feed_staged = os.path.join(staging, f"feed-{bucket:06d}.parquet")
            _write_data_file(feed, feed_staged)
            row = _apply_write_group(
                t.drop_columns(["_base"]), staging=staging, run_id=run_id,
                metrics=metrics,
            )
            # feed filename is derived from the bucket's post-apply watermark
            # STATE, not the run_id: a crash between feed publish and the
            # bucket manifest write makes the resume re-apply the same events
            # (same watermark map) under a fresh run_id — a deterministic
            # name means the resume OVERWRITES the crashed run's feed file
            # instead of double-counting its change rows. Two different
            # applies of a bucket always advance some part's max LSN, so the
            # watermark map (hashed, since parts can also drop out when all
            # their rows are deleted) uniquely tags each state transition.
            import hashlib

            tag = hashlib.sha1(
                row["watermarks"][0].as_py().encode()
            ).hexdigest()[:16]
            feed_final = os.path.join(
                feed_dir, f"bucket={bucket}", f"state-{tag}.parquet"
            )
            i_fs = row.schema.get_field_index("feed_staged")
            row = row.set_column(
                i_fs, "feed_staged", pa.array([feed_staged], pa.string())
            )
            i_ff = row.schema.get_field_index("feed_final")
            return row.set_column(
                i_ff, "feed_final", pa.array([feed_final], pa.string())
            )

        group_fn = _apply_with_feed
    else:
        group_fn = partial(
            _apply_write_group, staging=staging, run_id=run_id, metrics=metrics
        )
    manifest_ds = merged.groupby("bucket").map_groups(group_fn, batch_format="pyarrow")
    published = _publish_stream(manifest_ds, out_dir)

    all_manifests = load_manifests(out_dir)
    tman.update(
        {
            "buckets": sorted(all_manifests),
            "rows_total": int(sum(m["rows_out"] for m in all_manifests.values())),
            "timeline": timeline.to_json(),
            "schema_version": len(timeline.changes),
            "last_run_id": run_id,
        }
    )
    _atomic_write_json(os.path.join(out_dir, TABLE_MANIFEST), tman)
    snap = record_snapshot(out_dir, "incremental_apply")
    return {
        "published_now": len(published),
        "published_total": len(all_manifests),
        "touched": int(len(touched)),
        "n_events_applied": int(sum(p["n_events"] for p in published)),
        "rows_total": tman["rows_total"],
        "snapshot": snap["version"] if snap else None,
        "out_dir": out_dir,
    }


def _generic_write_group(
    t: pa.Table, *, staging: str, run_id: str, metrics: str | None = None,
    sort_by: str | None = None, bloom_cols: list[str] | None = None,
) -> pa.Table:
    """Stage one pre-bucketed group of an arbitrary table (any schema,
    including nested ``list<struct>`` columns) and emit its manifest row.
    The write-audit-publish contract is identical to the transcript path:
    deterministic staged filename, row-count audit, atomic publish.
    ``sort_by`` (range-clustered layouts) sorts the bucket file by the
    cluster column so its Parquet row-group stats stay tight."""
    if len(t) == 0:
        return _MANIFEST_SCHEMA.empty_table()
    t = t.combine_chunks()
    bucket = int(t["_bucket"][0].as_py())
    out = t.drop_columns(["_bucket"])
    if sort_by is not None:
        out = out.take(pc.sort_indices(out, sort_keys=[(sort_by, "ascending")]))
    if "_z" in out.column_names:  # zorder sort helper, never persisted
        out = out.drop_columns(["_z"])
    fname = _bucket_filename(bucket, run_id)
    staged = os.path.join(staging, fname)
    _write_data_file(out, staged)
    if bloom_cols:
        from odibel_ray.cdc.skipping import BLOOM_SUFFIX, build_bloom_sidecar

        build_bloom_sidecar(out, bloom_cols, staged + BLOOM_SUFFIX)
    if metrics:
        from odibel_ray.monitor import record_task_metrics

        record_task_metrics(metrics, rows=len(out), buckets_staged=1)
    return pa.table(
        {
            "bucket": pa.array([bucket], pa.int64()),
            "rows_out": pa.array([len(out)], pa.int64()),
            "n_events": pa.array([len(out)], pa.int64()),
            "file": pa.array([fname], pa.string()),
            "staged": pa.array([staged], pa.string()),
            "watermarks": pa.array(["{}"], pa.string()),
            "run_id": pa.array([run_id], pa.string()),
            "feed_staged": pa.array([""], pa.string()),
            "feed_final": pa.array([""], pa.string()),
        }
    )


@_single_writer("out_dir")
def publish_dataset(
    ds,
    out_dir: str,
    *,
    key_cols: list[str],
    num_buckets: int | None = None,
    run_id: str = "run-0",
    batch_size: int = 65536,
    metrics: str | None = None,
    snapshots: int | None = None,
    cluster_by: str | None = None,
    expect: list | None = None,
    bloom_cols: list[str] | None = None,
) -> dict:
    """Write-audit-publish for an ARBITRARY Dataset (nested columns included):
    hash-bucket on ``key_cols``, stage each bucket deterministically, audit row
    counts, publish atomically with per-bucket manifests. Resumable like
    :func:`replay_publish` — already-manifested buckets are filtered out before
    the shuffle, so a killed run re-stages only missing buckets. Read back with
    ``read_published(out_dir, system=True)`` (generic tables carry no transcript
    system columns).

    This is the sink path nested pipelines use (e.g. ``nested.nest_turns``
    output — the reference's ``RevisionTemplateInfo`` list-of-structs rows,
    ``data/RevisionTemplateInfo.scala:3``).

    The resolved bucket layout is pinned in ``<out_dir>/_layout.json``
    BEFORE any staging: the cluster-derived default ``num_buckets`` depends
    on where the process runs, so a killed run resumed under a different
    CPU count must reuse the original layout — re-hashing rows against a
    different modulus while ``done`` holds old bucket ids silently drops
    and duplicates rows. Changing the bucketing of a partially-published
    table is an error (finish or wipe it, or use ``rebucket_published`` on
    a complete one).

    ``bloom_cols=[...]`` writes a per-file Bloom sidecar
    (``<file>.parquet.bloom``) for each listed column — equality/``in``
    probes on them prune whole files where footer min/max can't (the Delta
    bloom-filter-index analog; see the bloom section of ``cdc/skipping.py``).
    The set is pinned in ``_layout.json``; upserts and compactions rebuild
    the sidecar of every bucket they rewrite.

    ``cluster_by="col"`` publishes a RANGE-CLUSTERED, read-optimized layout
    instead of hash buckets (the Delta ``OPTIMIZE ZORDER`` / Iceberg
    sort-order analog): bucket boundaries come from a bounded distributed
    sample of the column (pinned in ``_layout.json`` before staging, so a
    resume reuses them), each bucket file is sorted by the column, and
    ``read_published(where=[(col, ...)])`` then prunes whole files by
    footer stats. Clustered tables are serving copies: ``upsert_published``
    refuses them (a key's bucket is not derivable from the key) — maintain
    the hash-bucketed primary and republish the copy."""
    from odibel_ray.cdc.lww import bucket_of_keys
    from odibel_ray.cdc.skipping import (
        bucket_of_range,
        cluster_bounds,
        zorder_layout,
    )
    from odibel_ray.tuning import default_num_buckets

    # multi-column cluster_by = Z-ORDER (Delta OPTIMIZE ZORDER analog):
    # rank-quantize each column, interleave the rank bits, range-bucket and
    # sort on the z-value — files become hyper-rectangles of the clustered
    # space, so footer stats prune on EVERY listed column
    zcols = None
    if isinstance(cluster_by, (list, tuple)):
        if len(cluster_by) == 1:
            cluster_by = cluster_by[0]
        else:
            zcols = list(cluster_by)
            cluster_by = None

    if snapshots is not None:
        os.makedirs(out_dir, exist_ok=True)
        enable_snapshots(out_dir, keep_last=snapshots)
    layout_path = os.path.join(out_dir, "_layout.json")
    if os.path.exists(layout_path):
        with open(layout_path) as f:
            layout = json.load(f)
        if num_buckets is not None and int(layout["num_buckets"]) != num_buckets:
            raise ValueError(
                f"table at {out_dir} was laid out with num_buckets="
                f"{layout['num_buckets']}; resuming with {num_buckets} would "
                "corrupt it (rebucket_published resizes a complete table)"
            )
        if list(layout.get("key_cols", key_cols)) != list(key_cols):
            raise ValueError(
                f"table at {out_dir} was laid out with key_cols="
                f"{layout['key_cols']}, not {list(key_cols)}"
            )
        want = zcols if zcols is not None else cluster_by
        if layout.get("cluster_by") != want:
            raise ValueError(
                f"table at {out_dir} was laid out with cluster_by="
                f"{layout.get('cluster_by')!r}, not {want!r}"
            )
        if bloom_cols is not None and list(layout.get("bloom_cols") or []) != list(bloom_cols):
            raise ValueError(
                f"table at {out_dir} was laid out with bloom_cols="
                f"{layout.get('bloom_cols')}, not {list(bloom_cols)}"
            )
        bloom_cols = layout.get("bloom_cols")  # resume reuses the pinned set
        num_buckets = int(layout["num_buckets"])
        bounds = layout.get("bounds")
        zorder = layout.get("zorder")
    else:
        num_buckets = default_num_buckets(num_buckets)
        os.makedirs(out_dir, exist_ok=True)
        layout = {"num_buckets": num_buckets, "key_cols": list(key_cols)}
        bounds = None
        zorder = None
        if zcols is not None:
            zorder = zorder_layout(ds, zcols, num_buckets)
            layout.update({"cluster_by": zcols, "zorder": zorder})
        elif cluster_by is not None:
            bounds = cluster_bounds(ds, cluster_by, num_buckets)
            layout.update({"cluster_by": cluster_by, "bounds": bounds})
        if bloom_cols:
            layout["bloom_cols"] = list(bloom_cols)
        _atomic_write_json(layout_path, layout)
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    staging = os.path.join(out_dir, STAGING_DIR, run_id)
    os.makedirs(staging, exist_ok=True)
    done = load_manifests(out_dir)

    if expect is not None:
        # CHECK constraint: installed with the table, enforced batch-by-batch
        # on this initial load and as a pre-pass on every later upsert
        from odibel_ray.cdc.quality import EXPECTATIONS_FILE
        from odibel_ray.cdc.skipping import check_where

        expect = [list(c) for c in check_where(expect)]
        os.makedirs(out_dir, exist_ok=True)
        _atomic_write_json(os.path.join(out_dir, EXPECTATIONS_FILE), {"where": expect})
    else:
        from odibel_ray.cdc.quality import get_expectations

        expect = get_expectations(out_dir) or None  # resumed run keeps the gate

    def tag(t: pa.Table) -> pa.Table:
        if expect:
            from odibel_ray.cdc.quality import enforce_batch

            t = enforce_batch(t, expect, context=f"publish_dataset({run_id})")
        if zcols is not None:
            from odibel_ray.cdc.skipping import zvalue_of

            z = zvalue_of(t, zcols, zorder["zref"])
            b = np.searchsorted(
                np.asarray(zorder["bounds"], dtype=np.int64), z, side="left"
            ) if zorder["bounds"] else np.zeros(len(t), dtype=np.int64)
            t = t.append_column("_z", pa.array(z, pa.int64()))
        elif cluster_by is not None:
            b = bucket_of_range(t, cluster_by, bounds)
        else:
            b = bucket_of_keys(t, key_cols, num_buckets)
        t = t.append_column("_bucket", pa.array(b, pa.int64()))
        if done:
            keep = ~np.isin(b, np.array(sorted(done), dtype=np.int64))
            t = t.filter(pa.array(keep))
        return t

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=batch_size)
    manifest_ds = tagged.groupby("_bucket").map_groups(
        partial(
            _generic_write_group,
            staging=staging,
            run_id=run_id,
            metrics=metrics,
            sort_by="_z" if zcols is not None else cluster_by,
            bloom_cols=bloom_cols,
        ),
        batch_format="pyarrow",
    )
    published = _publish_stream(manifest_ds, out_dir)
    all_manifests = load_manifests(out_dir)
    tman = {
        # clustered layouts advertise no key-hash modulus: a key's bucket is
        # not derivable from the key, so lookup_key falls back to its
        # footer-stats pruning path over all buckets
        "num_buckets": None if (cluster_by is not None or zcols is not None) else num_buckets,
        "buckets": sorted(all_manifests),
        "rows_total": int(sum(m["rows_out"] for m in all_manifests.values())),
        "last_run_id": run_id,
        "generic": True,
    }
    if cluster_by is not None or zcols is not None:
        tman["cluster_by"] = zcols if zcols is not None else cluster_by
    _atomic_write_json(os.path.join(out_dir, TABLE_MANIFEST), tman)
    snap = record_snapshot(out_dir, "publish_dataset")
    return {
        "published_now": len(published),
        "published_total": len(all_manifests),
        "rows_total": tman["rows_total"],
        "snapshot": snap["version"] if snap else None,
        "out_dir": out_dir,
    }


def _to_physical_update(t: pa.Table, smap, canon: pa.Schema) -> pa.Table:
    """Logical-named upsert rows → the table's ONE physical schema: renames
    map back, dropped physical columns null-pad (bytes still live in the
    files), unmaterialized added columns must be all-NULL (their values
    would silently vanish) and are removed."""
    cols = {}
    for name in canon.names:
        # the logical name this physical column currently carries (if any)
        logical = next((ln for ln, pn in smap.to_physical.items() if pn == name), None)
        if logical is not None and logical in t.column_names:
            c = t[logical]
            ptype = canon.field(name).type
            if c.type != ptype:
                # widened column: files keep the narrow physical type, so the
                # wide logical value must still fit (safe cast raises loudly
                # on overflow — rewrite the table to materialize the widening)
                try:
                    c = c.cast(ptype, safe=True)
                except pa.ArrowInvalid as e:
                    raise ValueError(
                        f"column {logical!r} was widened by alter_published but "
                        f"the files still carry {ptype}; this update's values "
                        "don't fit — rewrite the table to materialize the "
                        f"wider type ({e})"
                    ) from e
            cols[name] = c
        else:
            cols[name] = pa.nulls(len(t), canon.field(name).type)  # dropped col
    for added in smap.added:
        if added in t.column_names and t[added].null_count != len(t):
            raise ValueError(
                f"column {added!r} is metadata-only (added by alter_published) "
                "and not materialized in the data files yet; upserting non-null "
                "values would lose them — rewrite the table first"
            )
    return pa.table(cols)


def _upsert_feed_table(
    old: pa.Table | None,
    ups: pa.Table,
    dels: pa.Table,
    key_cols: list[str],
    feed_values: list[str],
    feed_seq: int,
) -> pa.Table:
    """The bucket's row-level change feed for one upsert run, in the exact
    shape of :func:`odibel_ray.cdc.lww.change_feed` / ``table_changes``
    (``keys, change, {v}_before, {v}_after, _lsn``) so every downstream
    consumer (derived/mview/joinview refresh) reads it unchanged. No-op
    updates (every feed value equal) emit nothing; ``_lsn`` is the table's
    write sequence — constant within a run, increasing across runs, which is
    all the latest-transition resolution needs."""
    cols = key_cols + feed_values
    if old is not None and len(old):
        old_v = old.select(cols)
    else:
        old_v = None

    def with_before(side: pa.Table) -> pa.Table:
        if old_v is None:  # brand-new bucket: every before-image is NULL
            for v in feed_values:
                side = side.append_column(f"{v}_before", pa.nulls(len(side), side[v].type))
            return side
        renamed = old_v.rename_columns(key_cols + [f"{v}_before" for v in feed_values])
        return side.join(renamed, keys=key_cols, join_type="left outer")

    out_parts = []
    if len(ups):
        u = ups.select([c for c in cols if c in ups.column_names])
        u = with_before(u)
        # change: insert when no before-row existed; drop exact no-ops
        if old_v is not None:
            probe = old_v.select(key_cols).append_column(
                "__had", pa.array(np.ones(len(old_v), bool))
            )
            u = u.join(probe, keys=key_cols, join_type="left outer")
            had = pc.fill_null(u["__had"], False)
            u = u.drop_columns(["__had"])
        else:
            had = pa.array(np.zeros(len(u), bool))
        same = pc.fill_null(had, False).to_numpy(zero_copy_only=False).copy()
        for v in feed_values:
            a, b = u[v], u[f"{v}_before"]
            eq = pc.fill_null(pc.equal(a, b), False)
            both_null = pc.and_(pc.is_null(a), pc.is_null(b))
            same &= pc.or_(eq, both_null).to_numpy(zero_copy_only=False)
        change = np.where(had.to_numpy(zero_copy_only=False), "update", "insert")
        u = u.append_column("change", pa.array(change, pa.string()))
        u = u.filter(pa.array(~same))
        after_cols = {k: u[k] for k in key_cols}
        after_cols["change"] = u["change"]
        for v in feed_values:
            after_cols[f"{v}_before"] = u[f"{v}_before"]
            after_cols[f"{v}_after"] = u[v]
        out_parts.append(pa.table(after_cols))
    if len(dels) and old_v is not None:
        d = old_v.join(dels.select(key_cols), keys=key_cols, join_type="left semi")
        if len(d):
            del_cols = {k: d[k] for k in key_cols}
            del_cols["change"] = pa.array(["delete"] * len(d), pa.string())
            for v in feed_values:
                del_cols[f"{v}_before"] = d[v]
                del_cols[f"{v}_after"] = pa.nulls(len(d), d.schema.field(v).type)
            out_parts.append(pa.table(del_cols))
    if not out_parts:
        return None
    feed = pa.concat_tables(out_parts, promote_options="default").combine_chunks()
    return feed.append_column("_lsn", pa.array(np.full(len(feed), feed_seq, np.int64)))


def _generic_delta_group(
    t: pa.Table,
    *,
    staging: str,
    run_id: str,
    bucket_files: dict[int, str],
    seq: int,
    metrics: str | None = None,
) -> pa.Table:
    """Merge-on-read upsert of ONE bucket: stage this run's replacement rows
    (tombstones retained, ``_op='D'``) as a delta file tagged ``_lsn=seq`` —
    no base read, no base rewrite (write cost O(updates), the fit for
    high-frequency maintained-table refreshes). A bucket with no published
    base degenerates to an ordinary base write of the update rows."""
    import hashlib

    from odibel_ray.cdc.apply import limit_arrow_threads

    if len(t) == 0:
        return _MANIFEST_SCHEMA.empty_table()
    limit_arrow_threads()
    t = t.combine_chunks()
    bucket = int(t["_bucket"][0].as_py())
    dmask = pc.fill_null(t["_delete"], False)
    if bucket not in bucket_files:
        live = t.filter(pc.invert(dmask)).drop_columns(["_delete"])
        return _generic_write_group(live, staging=staging, run_id=run_id, metrics=metrics)
    out = t.drop_columns(["_bucket", "_delete"])
    out = out.append_column("_lsn", pa.array(np.full(len(out), seq, np.int64)))
    out = out.append_column(
        "_op", pa.array(np.where(dmask.to_numpy(zero_copy_only=False), "D", "U"))
    )
    tag = hashlib.sha1(run_id.encode()).hexdigest()[:16]
    fname = f"delta-{bucket:06d}-{tag}.parquet"
    staged = os.path.join(staging, fname)
    _write_data_file(out, staged)
    if metrics:
        from odibel_ray.monitor import record_task_metrics

        record_task_metrics(metrics, rows=len(out), buckets_staged=1)
    return pa.table(
        {
            "bucket": pa.array([bucket], pa.int64()),
            "rows_out": pa.array([len(out)], pa.int64()),
            "n_events": pa.array([len(t)], pa.int64()),
            "file": pa.array([fname], pa.string()),
            "staged": pa.array([staged], pa.string()),
            "watermarks": pa.array(["{}"], pa.string()),
            "run_id": pa.array([run_id], pa.string()),
            "feed_staged": pa.array([""], pa.string()),
            "feed_final": pa.array([""], pa.string()),
        }
    )


def _upsert_write_group(
    t: pa.Table,
    *,
    staging: str,
    run_id: str,
    out_dir: str,
    bucket_files: dict[int, str],
    key_cols: list[str],
    metrics: str | None = None,
    feed_dir: str | None = None,
    feed_values: list[str] | None = None,
    feed_seq: int = 0,
    bloom_cols: list[str] | None = None,
) -> pa.Table:
    """Rewrite ONE bucket under upsert semantics: current published rows whose
    key appears in this group's updates are dropped, surviving updates are
    appended, and the result stages under a run-versioned name (idempotent —
    re-running the same updates over an already-updated bucket converges to
    the same file contents). With ``feed_dir``, the bucket's row-level change
    feed stages alongside and publishes in the same atomic pointer flip."""
    from odibel_ray.cdc.apply import limit_arrow_threads

    if len(t) == 0:
        return _MANIFEST_SCHEMA.empty_table()
    limit_arrow_threads()
    t = t.combine_chunks()
    bucket = int(t["_bucket"][0].as_py())
    touched = t.select(key_cols).group_by(key_cols).aggregate([])
    dmask = pc.fill_null(t["_delete"], False)
    ups = t.filter(pc.invert(dmask)).drop_columns(["_bucket", "_delete"])
    old_file = bucket_files.get(bucket)
    old = None
    if old_file is not None:
        old = pq.read_table(os.path.join(out_dir, old_file))
    if old is None and len(ups) == 0:
        # delete-only group aimed at a bucket that was never published:
        # nothing to remove, nothing to write — publishing here would pin a
        # phantom zero-row bucket file that every future read opens
        return _MANIFEST_SCHEMA.empty_table()
    if old is not None:
        survivors = old.join(touched, keys=key_cols, join_type="left anti")
        new = pa.concat_tables([survivors, ups], promote_options="default")
    else:
        new = ups
    new = new.combine_chunks()
    fname = _bucket_filename(bucket, run_id)
    staged = os.path.join(staging, fname)
    _write_data_file(new, staged)
    if bloom_cols:  # rewritten bucket gets a fresh bloom; untouched keep theirs
        from odibel_ray.cdc.skipping import BLOOM_SUFFIX, build_bloom_sidecar

        build_bloom_sidecar(new, bloom_cols, staged + BLOOM_SUFFIX)
    feed_staged, feed_final = "", ""
    if feed_dir is not None:
        dels = t.filter(dmask).select(key_cols)
        feed_t = _upsert_feed_table(old, ups, dels, key_cols, feed_values, feed_seq)
        if feed_t is not None:
            feed_name = f"upsert-{run_id}.parquet"
            feed_staged = os.path.join(staging, f"feed-{bucket:06d}.parquet")
            feed_final = os.path.join(feed_dir, f"bucket={bucket}", feed_name)
            _write_data_file(feed_t, feed_staged)
    if metrics:
        from odibel_ray.monitor import record_task_metrics

        record_task_metrics(metrics, rows=len(new), buckets_staged=1)
    return pa.table(
        {
            "bucket": pa.array([bucket], pa.int64()),
            "rows_out": pa.array([len(new)], pa.int64()),
            "n_events": pa.array([len(t)], pa.int64()),
            "file": pa.array([fname], pa.string()),
            "staged": pa.array([staged], pa.string()),
            "watermarks": pa.array(["{}"], pa.string()),
            "run_id": pa.array([run_id], pa.string()),
            "feed_staged": pa.array([feed_staged], pa.string()),
            "feed_final": pa.array([feed_final], pa.string()),
        }
    )


@_single_writer("out_dir")
def upsert_published(
    updates,
    out_dir: str,
    *,
    deletes=None,
    run_id: str = "upsert-0",
    batch_size: int = 65536,
    metrics: str | None = None,
    feed_dir: str | None = None,
    feed_values: list[str] | None = None,
    mode: str = "cow",
) -> dict:
    """Key-level upsert/delete into a GENERIC published table (one laid out by
    :func:`publish_dataset`): only buckets containing touched keys are
    rewritten, copy-on-write under the same write-audit-publish contract —
    the downstream-table maintenance primitive (a materialized view's refresh
    writes through this; `odibel_ray.cdc.mview`).

    ``updates`` rows are full replacement rows for their key (at most one row
    per key); ``deletes`` is an optional Dataset carrying (at least) the key
    columns of rows to remove. Untouched buckets keep their current files.
    Idempotent: re-running the same updates/deletes over an already-updated
    table converges to the same state, so a crash-resume just re-runs.
    Cost is O(touched buckets), never O(table).

    ``mode``: ``"cow"`` (default) rewrites each touched bucket;
    ``"mor"`` stages the replacement rows as a per-bucket DELTA file
    (tombstones retained) appended to the bucket manifest in the same
    atomic flip — write cost O(updates), no base read, the fit for
    high-frequency maintained-table refreshes; readers LWW-merge on the
    layout keys and ``compact_published`` folds the deltas back.
    Incompatible with ``feed_dir`` (the feed is computed from CoW rewrite
    state).

    ``feed_dir``: also emit this run's row-level change feed (the same
    ``keys, change, {v}_before/{v}_after, _lsn`` shape ``table_changes``
    produces, so downstream derived/mview/joinview refreshes consume it
    directly — the write-time CDF that lets a maintained-table CASCADE skip
    snapshot diffs; see ``refresh_pipeline(chain_feeds=True)``). Computed
    inside the per-bucket rewrite from state the upsert already holds (old
    bucket rows + replacement rows), staged next to the bucket's data and
    published in the same atomic pointer flip. No-op updates emit nothing;
    ``_lsn`` carries the table's write sequence. ``feed_values`` defaults to
    every non-key column.
    """
    from odibel_ray.cdc.lww import bucket_of_keys

    layout_path = os.path.join(out_dir, "_layout.json")
    if not os.path.exists(layout_path):
        raise FileNotFoundError(
            f"{out_dir} is not a generic published table (no _layout.json; "
            "upsert_published only targets publish_dataset tables)"
        )
    with open(layout_path) as f:
        layout = json.load(f)
    if layout.get("cluster_by"):
        raise ValueError(
            "upsert_published cannot target a range-clustered table (a key's "
            "bucket is not derivable from the key); maintain the hash-bucketed "
            "primary and republish the clustered serving copy"
        )
    key_cols = list(layout["key_cols"])
    num_buckets = int(layout["num_buckets"])
    if mode not in ("cow", "mor"):
        raise ValueError("mode must be 'cow' or 'mor'")
    if mode == "mor" and feed_dir:
        raise ValueError(
            "mode='mor' cannot emit a change feed (the feed is computed from "
            "the copy-on-write rewrite state); use mode='cow' with feed_dir"
        )
    manifests = load_manifests(out_dir)
    if mode == "cow" and any(m.get("deltas") for m in manifests.values()):
        raise ValueError(
            "table has merge-on-read deltas; compact_published first (or "
            "keep upserting with mode='mor')"
        )
    bucket_files = {b: m["file"] for b, m in manifests.items()}
    if updates is None and deletes is None:
        raise ValueError("pass updates rows, deletes rows, or both")
    if bucket_files:
        canon = pq.read_schema(os.path.join(out_dir, next(iter(sorted(bucket_files.values())))))
    elif updates is None:
        raise ValueError("delete-only upsert needs a published table to delete from")
    else:
        canon = updates.schema().base_schema
    canon_names = list(canon.names)
    # metadata-only DDL: updates arrive with LOGICAL names; files keep ONE
    # physical schema, so translate logical→physical on write (cdc/ddl.py)
    from odibel_ray.cdc.ddl import SCHEMA_OPS, load_schema_meta, schema_map

    smap = None
    if bucket_files and os.path.exists(os.path.join(out_dir, SCHEMA_OPS)):
        if load_schema_meta(out_dir).get("materialized_run"):
            raise ValueError(
                "a materialize_ddl rewrite is in flight on this table "
                "(mixed physical schemas); finish it before upserting"
            )
        smap = schema_map(out_dir, canon)
    if feed_dir is not None and smap is not None:
        raise ValueError(
            "feed_dir with an active schema op log is not supported (the feed "
            "would mix logical and physical names); materialize_ddl first"
        )
    from odibel_ray.cdc.quality import get_expectations, violation_count

    expect = get_expectations(out_dir)
    if expect and updates is not None:  # deletes cannot violate a CHECK
        # CHECK constraint: one vectorized pre-pass over the update rows
        # BEFORE anything stages, so a violating write fails whole — never a
        # partial apply (update rows carry logical names, as the clauses do)
        bad = violation_count(updates, expect, batch_size=batch_size)
        if bad:
            raise ValueError(
                f"upsert violates the table expectation {expect}: {bad} row(s); "
                "fix the rows or drop_expectations() first"
            )
    feed_seq = 0
    if feed_dir is not None or mode == "mor":
        if feed_dir is not None:
            if feed_values is None:
                feed_values = [c for c in canon_names if c not in key_cols]
            else:
                feed_values = list(feed_values)
        # write sequence: constant within a run, increasing across runs —
        # the ordering feed consumers / the MOR delta merge need
        with open(os.path.join(out_dir, TABLE_MANIFEST)) as f:
            feed_seq = int(json.load(f).get("write_seq", 0)) + 1

    staging = os.path.join(out_dir, STAGING_DIR, run_id)
    os.makedirs(staging, exist_ok=True)

    def tag_updates(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if smap is not None:
            t = _to_physical_update(t, smap, canon)
        missing = [c for c in canon_names if c not in t.column_names]
        if missing:
            raise ValueError(f"update rows missing table columns {missing}")
        t = t.select(canon_names)
        b = bucket_of_keys(t, key_cols, num_buckets)
        t = t.append_column("_bucket", pa.array(b, pa.int64()))
        return t.append_column("_delete", pa.array(np.zeros(len(t), dtype=bool)))

    def tag_deletes(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        cols = {}
        for name in canon_names:
            f = canon.field(name)
            cols[name] = (
                t[name].cast(f.type) if name in key_cols else pa.nulls(len(t), f.type)
            )
        padded = pa.table(cols)
        b = bucket_of_keys(padded, key_cols, num_buckets)
        padded = padded.append_column("_bucket", pa.array(b, pa.int64()))
        return padded.append_column("_delete", pa.array(np.ones(len(t), dtype=bool)))

    tagged = (
        updates.map_batches(tag_updates, batch_format="pyarrow", batch_size=batch_size)
        if updates is not None
        else None
    )
    if deletes is not None:
        tag_d = deletes.map_batches(
            tag_deletes, batch_format="pyarrow", batch_size=batch_size
        )
        tagged = tag_d if tagged is None else tagged.union(tag_d)
    if mode == "mor":
        group_fn = partial(
            _generic_delta_group,
            staging=staging,
            run_id=run_id,
            bucket_files=bucket_files,
            seq=feed_seq,
            metrics=metrics,
        )
    else:
        group_fn = partial(
            _upsert_write_group,
            staging=staging,
            run_id=run_id,
            out_dir=out_dir,
            bucket_files=bucket_files,
            key_cols=key_cols,
            metrics=metrics,
            feed_dir=feed_dir,
            feed_values=feed_values,
            feed_seq=feed_seq,
            bloom_cols=layout.get("bloom_cols"),
        )
    manifest_ds = tagged.groupby("_bucket").map_groups(group_fn, batch_format="pyarrow")
    published = (
        _publish_mor_stream(manifest_ds, out_dir)
        if mode == "mor"
        else _publish_stream(manifest_ds, out_dir)
    )
    all_manifests = load_manifests(out_dir)
    tman = {
        "num_buckets": num_buckets,
        "buckets": sorted(all_manifests),
        "rows_total": int(sum(m["rows_out"] for m in all_manifests.values())),
        "last_run_id": run_id,
        "generic": True,
    }
    tman["mor_deltas"] = int(
        sum(len(m.get("deltas", [])) for m in all_manifests.values())
    )
    if feed_dir is not None or mode == "mor":
        tman["write_seq"] = feed_seq
    else:  # keep the sequence monotonic across feed-less writes too
        with open(os.path.join(out_dir, TABLE_MANIFEST)) as f:
            prev_seq = int(json.load(f).get("write_seq", 0))
        if prev_seq:
            tman["write_seq"] = prev_seq + 1
    _atomic_write_json(os.path.join(out_dir, TABLE_MANIFEST), tman)
    snap = record_snapshot(out_dir, "upsert_published")
    return {
        "buckets_rewritten": len(published),
        "published_total": len(all_manifests),
        "rows_total": tman["rows_total"],
        "deltas_total": tman["mor_deltas"],
        "snapshot": snap["version"] if snap else None,
        "out_dir": out_dir,
    }
