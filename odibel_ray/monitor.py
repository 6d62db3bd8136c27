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
