"""Cross-table savepoints: one consistent version pin across MANY published
tables.

Per-table snapshots (``sink.enable_snapshots``) give time travel within one
table; a pipeline that publishes several related tables (bronze + silver +
gold of a medallion chain, or a training-data release of documents +
embeddings + labels) needs a CONSISTENT cut across all of them — "the set
of versions that belong together" — that survives each table's retention
policy. The reference has no analog (its eval jobs re-derive everything
from the source dump each run); this is the Delta/Iceberg tag/branch idea
expressed over this sink's snapshot files.

A savepoint is:

1. one **pin file** per member table,
   ``_snapshots/pins/<name>-<manifest-path-hash>.json`` —
   ``expire_snapshots`` (and thus every publish op and ``vacuum``) keeps
   pinned versions and their data files no matter how far past
   ``keep_last`` they fall;
2. one **savepoint manifest**, ``<path>.json``, mapping table label →
   (directory, pinned version), the single artifact a consumer needs.

``create_savepoint`` first calls ``record_snapshot`` on every member (a
no-op when the table's latest snapshot already equals its live state), so
the pinned cut is each table's CURRENT state at call time. With the
single-writer lease held by any concurrent publish, calling this between
writer runs yields a cut no mid-flight apply can straddle.

Reading back: ``read_savepoint(path, label)`` is
``read_published(dir, version=pinned)`` — identical merge semantics,
merge-on-read deltas included. Dropping: ``drop_savepoint`` removes the
pins and the manifest; the next retention pass may then expire the
versions normally. All metadata-only: no data is copied at any point.
"""

from __future__ import annotations

import json
import os
import time

PINS_DIR = "pins"


def _pins_dir(out_dir: str) -> str:
    from odibel_ray.cdc.sink import SNAPSHOT_DIR

    return os.path.join(out_dir, SNAPSHOT_DIR, PINS_DIR)


def _pin_filename(name: str, manifest_path: str) -> str:
    """Pin files are keyed by (name, MANIFEST PATH), not name alone — two
    savepoints whose manifests share a basename (e.g. releases/<month>/cut.json)
    must not clobber each other's pins on a shared member table."""
    import hashlib

    h = hashlib.sha1(os.path.abspath(manifest_path).encode()).hexdigest()[:10]
    return f"{name}-{h}.json"


def pinned_versions(out_dir: str) -> dict[int, list[str]]:
    """version → savepoint names pinning it (consulted by expiry)."""
    d = _pins_dir(out_dir)
    out: dict[int, list[str]] = {}
    if not os.path.isdir(d):
        return out
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".json"):
            with open(os.path.join(d, fn)) as f:
                pin = json.load(f)
            out.setdefault(int(pin["version"]), []).append(pin["name"])
    return out


def create_savepoint(
    path: str,
    tables: dict[str, str],
    *,
    name: str | None = None,
) -> dict:
    """Pin every table's current state under one savepoint.

    ``tables`` maps a label (how consumers will ask for the table) to its
    published directory. ``path`` is where the savepoint manifest lands
    (``.json`` appended if missing); ``name`` defaults to the manifest's
    basename. Snapshot retention is enabled on members that lack it.
    Re-running with the same name overwrites the pins (idempotent)."""
    from odibel_ray.cdc.sink import (
        _atomic_write_json,
        enable_snapshots,
        list_snapshots,
        record_snapshot,
        snapshot_policy,
    )

    if not tables:
        raise ValueError("savepoint needs at least one table")
    if not path.endswith(".json"):
        path = path + ".json"
    name = name or os.path.splitext(os.path.basename(path))[0]
    prev = None
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
    members = {}
    written = set()
    for label, out_dir in tables.items():
        if snapshot_policy(out_dir) is None:
            enable_snapshots(out_dir)
        record_snapshot(out_dir, f"savepoint:{name}")
        snaps = list_snapshots(out_dir)
        if not snaps:
            raise FileNotFoundError(f"table {out_dir!r} has no published state")
        version = snaps[-1]["version"]
        os.makedirs(_pins_dir(out_dir), exist_ok=True)
        pin = os.path.join(_pins_dir(out_dir), _pin_filename(name, path))
        _atomic_write_json(
            pin,
            {"name": name, "version": version, "unix_ts": time.time(),
             "manifest": os.path.abspath(path)},
        )
        written.add(os.path.abspath(pin))
        members[label] = {"dir": os.path.abspath(out_dir), "version": version}
    if prev:
        # replacing the savepoint at this manifest path: unpin the PREVIOUS
        # cut's members (new pins are written above, so there is no window
        # with zero pins) — otherwise pins of tables dropped from the set
        # leak forever, holding their versions and data files
        pname = prev.get("name", name)
        for m in prev.get("tables", {}).values():
            for fn in (_pin_filename(pname, path), f"{pname}.json"):
                p = os.path.join(_pins_dir(m["dir"]), fn)
                if os.path.abspath(p) not in written and os.path.exists(p):
                    try:
                        os.remove(p)
                    except OSError:
                        pass
    sp = {"name": name, "unix_ts": time.time(), "tables": members}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    _atomic_write_json(path, sp)
    return sp


def load_savepoint(path: str) -> dict:
    if not path.endswith(".json"):
        path = path + ".json"
    with open(path) as f:
        return json.load(f)


def read_savepoint(path: str, label: str, **read_kwargs):
    """Dataset over one member table AS OF the savepoint's pinned version.
    Extra kwargs pass through to ``read_published`` (``columns=``,
    ``where=``, ``system=`` …)."""
    from odibel_ray.cdc.sink import read_published

    sp = load_savepoint(path)
    if label not in sp["tables"]:
        raise KeyError(f"savepoint {sp['name']!r} has no table {label!r} "
                       f"(have: {sorted(sp['tables'])})")
    m = sp["tables"][label]
    return read_published(m["dir"], version=m["version"], **read_kwargs)


def restore_savepoint(path: str, *, run_id: str = "sp-restore") -> dict:
    """Roll EVERY member table back to the savepoint's pinned version — the
    multi-table transaction-rollback: a release that turned out poisoned
    (bad upstream batch through a medallion chain, a corrupted training-data
    cut) is undone across all its tables in one call, from metadata alone.

    Per table this is ``sink.restore_snapshot`` (atomic per-bucket pointer
    flips, no data movement; the pinned versions' files are on disk by the
    savepoint retention invariant). The loop is idempotent and re-runnable:
    a crash mid-way leaves some members restored and some not, and re-running
    converges — but readers between the crash and the re-run can see a
    mixed cut, so treat a restore like any other write (single writer).
    History moves FORWARD (each restore records a new snapshot version), so
    the savepoint stays valid and a restore is itself restorable.
    """
    from odibel_ray.cdc.sink import restore_snapshot

    sp = load_savepoint(path)
    results = {}
    for label, m in sorted(sp["tables"].items()):
        results[label] = restore_snapshot(
            m["dir"], m["version"], run_id=f"{run_id}-{label}"
        )
    return {"name": sp["name"], "tables": results}


def drop_savepoint(path: str) -> dict:
    """Remove the savepoint's pins and manifest (metadata-only). The pinned
    versions become ordinary snapshots; the next retention pass may expire
    them."""
    if not path.endswith(".json"):
        path = path + ".json"
    sp = load_savepoint(path)
    dropped = 0
    for m in sp["tables"].values():
        # new-style (name + manifest-path hash) first, legacy name-only second
        for fn in (_pin_filename(sp["name"], path), f"{sp['name']}.json"):
            pin = os.path.join(_pins_dir(m["dir"]), fn)
            try:
                os.remove(pin)
                dropped += 1
                break
            except OSError:
                pass
    os.remove(path)
    return {"name": sp["name"], "pins_dropped": dropped}
