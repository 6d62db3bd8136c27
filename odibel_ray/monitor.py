"""Live heartbeat / throughput reporting for long-running ingest loops.

The reference prints events/s every 10 s during a replay
(``/root/reference/src/main/scala/ai/scads/odibel/log/HeartbeatMonitor.scala:54-70``,
``utils/ThrougputMonitor.scala:5-28``: a counter thread that logs total and
window throughput). This engine persists per-partition metrics in commit
manifests (better for lineage), but a multi-hour ``tail_log``/``tail_stream``
run also needs a *live* signal — that's this module.

Driver-side by design: the monitor counts micro-batches/rounds as the driver
observes them complete, so it adds zero work to distributed tasks. At cluster
scale the counter increments are O(rounds), not O(events).
"""

from __future__ import annotations

import logging
import threading
import time

_log = logging.getLogger("odibel_ray.monitor")


class _MetricsActor:
    """Named zero-CPU counter actor updated from INSIDE distributed sink
    tasks (events applied, rows published, buckets committed) — the
    cluster-grade version of the reference's heartbeat counters
    (``log/HeartbeatMonitor.scala:54-70``): on a 256-node cluster the driver
    cannot observe per-task progress any other way; a named actor gives one
    O(counters) mailbox every task can fire-and-forget into."""

    def __init__(self) -> None:
        import time as _time

        self._c: dict[str, int] = {}
        self._t0 = _time.monotonic()

    def add(self, **counts: int) -> None:
        for k, v in counts.items():
            self._c[k] = self._c.get(k, 0) + int(v)

    def snapshot(self) -> dict:
        import time as _time

        out = dict(self._c)
        elapsed = _time.monotonic() - self._t0
        out["elapsed_s"] = round(elapsed, 3)
        if elapsed > 0 and out.get("events"):
            out["events_per_sec"] = round(out["events"] / elapsed, 1)
        return out


def metrics_actor(name: str, *, create: bool = True):
    """Get (or create) the named metrics actor. ``get_if_exists`` makes
    concurrent creation from many tasks race-free; ``create=False`` raises
    ``ValueError`` when the actor does not exist (a poller's probe).

    The actor is **detached**: its first creator is usually a short-lived
    map task whose fire-and-forget handle drops the moment the task returns
    — a reference-counted actor would be garbage-collected before the
    counters are ever read. Detached means it lives until ``ray.kill`` (or
    ``ray.shutdown``); long-running services should kill actors they no
    longer poll."""
    import ray

    if not create:
        return ray.get_actor(name)
    return (
        ray.remote(num_cpus=0)(_MetricsActor)
        .options(name=name, get_if_exists=True, lifetime="detached")
        .remote()
    )


def record_task_metrics(name: str | None, **counts: int) -> None:
    """Fire-and-forget counter update from inside a distributed task.
    No-op when ``name`` is None or Ray is unreachable — metrics must never
    fail a data task."""
    if not name:
        return
    try:
        metrics_actor(name).add.remote(**counts)
    except Exception:  # pragma: no cover - metrics are best-effort
        _log.debug("metrics update to %r failed", name, exc_info=True)


class ThroughputMonitor:
    """Background reporter: logs total events and window events/s every
    ``interval_s`` while work is running.

    Usage::

        with ThroughputMonitor(interval_s=10.0, what="events") as mon:
            for batch in batches:
                n = process(batch)
                mon.add(n)

    ``add`` is thread-safe and O(1). The reporting thread is a daemon — an
    exception in the work loop never leaves a stray non-daemon thread. With
    ``interval_s=0`` the monitor is inert (no thread), so callers can wire it
    unconditionally and let configuration decide.
    """

    def __init__(self, interval_s: float = 10.0, *, what: str = "events",
                 emit=None) -> None:
        self.interval_s = float(interval_s)
        self.what = what
        self._emit = emit or (lambda msg: _log.info("%s", msg))
        self._lock = threading.Lock()
        self._total = 0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._t0 = 0.0
        self.reports: list[dict] = []

    def add(self, n: int) -> None:
        with self._lock:
            self._total += int(n)

    @property
    def total(self) -> int:
        with self._lock:
            return self._total

    def _run(self) -> None:
        last_total, last_t = 0, self._t0
        while not self._stop.wait(self.interval_s):
            now = time.monotonic()
            total = self.total
            rate = (total - last_total) / max(now - last_t, 1e-9)
            report = {
                "total": total,
                "window_per_sec": round(rate, 1),
                "elapsed_s": round(now - self._t0, 1),
            }
            self.reports.append(report)
            self._emit(
                f"heartbeat: {total} {self.what} total, "
                f"{rate:,.0f} {self.what}/s over last "
                f"{now - last_t:.1f}s"
            )
            last_total, last_t = total, now

    def start(self) -> "ThroughputMonitor":
        self._t0 = time.monotonic()
        if self.interval_s > 0:
            self._thread = threading.Thread(
                target=self._run, name="odibel-heartbeat", daemon=True
            )
            self._thread.start()
        return self

    def stop(self) -> dict:
        """Stop the reporter; returns the final summary (also logged).
        Idempotent — a second stop (e.g. ``__exit__`` after an explicit
        ``stop()``) returns the first summary without re-emitting."""
        if getattr(self, "_summary", None) is not None:
            return self._summary
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.interval_s + 1.0)
        elapsed = max(time.monotonic() - self._t0, 1e-9)
        total = self.total
        summary = {
            "total": total,
            "per_sec": round(total / elapsed, 1),
            "elapsed_s": round(elapsed, 1),
        }
        self._emit(
            f"done: {total} {self.what} in {elapsed:.1f}s "
            f"({total / elapsed:,.0f} {self.what}/s)"
        )
        self._summary = summary
        return summary

    def __enter__(self) -> "ThroughputMonitor":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
