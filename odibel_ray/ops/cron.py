"""Cron occurrence expansion (M5, ``utils/CronUtil.scala:42-76``): expand a
5-field cron pattern into its occurrence timestamps within a row's
``[start, end)`` window — a 1→k row explosion used by the reference via
``flatMap`` (``eval/EvalFunctions.scala:410-422``).

Supported field syntax: ``*``, ``N``, ``*/S``, ``A-B``, ``A,B,C`` for
minute / hour / day-of-month / month / day-of-week. Day-of-week follows
UNIX cron semantics (0=Sunday .. 6=Saturday, 7 accepted as Sunday) — the
reference parses ``CronType.UNIX`` via cron-utils, so ``0-4`` means
Sun-Thu, not Mon-Fri. All arithmetic is timezone-aware UTC (the reference
pins a ZoneId explicitly); naive ``datetime.timestamp()`` would shift
occurrences by the host's UTC offset. Scanning is per-minute over the
window — windows are event-scale (hours/days), not years, so the per-row
cost is bounded.
"""

from __future__ import annotations

import datetime as dt
from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def _parse_field(spec: str, lo: int, hi: int) -> frozenset[int]:
    vals: set[int] = set()
    for part in spec.split(","):
        if part == "*":
            vals.update(range(lo, hi + 1))
        elif part.startswith("*/"):
            vals.update(range(lo, hi + 1, int(part[2:])))
        elif "-" in part:
            a, b = part.split("-")
            vals.update(range(int(a), int(b) + 1))
        else:
            vals.add(int(part))
    return frozenset(vals)


class CronPattern:
    def __init__(self, expr: str):
        f = expr.split()
        if len(f) != 5:
            raise ValueError(f"cron needs 5 fields: {expr!r}")
        self.minute = _parse_field(f[0], 0, 59)
        self.hour = _parse_field(f[1], 0, 23)
        self.dom = _parse_field(f[2], 1, 31)
        self.month = _parse_field(f[3], 1, 12)
        # UNIX cron day-of-week: 0 or 7 = Sunday .. 6 = Saturday
        self.dow = frozenset(v % 7 for v in _parse_field(f[4], 0, 7))

    def matches(self, t: dt.datetime) -> bool:
        return (
            t.minute in self.minute
            and t.hour in self.hour
            and t.day in self.dom
            and t.month in self.month
            # python weekday(): Mon=0..Sun=6 → cron dow: Sun=0..Sat=6
            and (t.weekday() + 1) % 7 in self.dow
        )

    def occurrences_us(self, start_us: int, end_us: int) -> list[int]:
        """Occurrence timestamps (µs epoch) in [start, end), minute granularity."""
        out = []
        t = dt.datetime.fromtimestamp(
            start_us // 1_000_000, tz=dt.timezone.utc
        ).replace(second=0, microsecond=0)
        if start_us % 60_000_000:
            t += dt.timedelta(minutes=1)
        end = dt.datetime.fromtimestamp(end_us / 1_000_000, tz=dt.timezone.utc)
        while t < end:
            if self.matches(t):
                out.append(int(t.timestamp() * 1_000_000))
            t += dt.timedelta(minutes=1)
        return out


def expand_cron(
    ds: "ray.data.Dataset",
    expr: str,
    start_col: str,
    end_col: str,
    *,
    out_col: str = "occurs_at",
    batch_size: int = 8192,
) -> "ray.data.Dataset":
    """1 row → k occurrence rows. The compiled pattern is a broadcast constant
    (closure); all input columns are carried to each emitted row."""
    pat = CronPattern(expr)

    def f(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        starts = t[start_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ends = t[end_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        idx, ts = [], []
        for i, (s, e) in enumerate(zip(starts, ends)):
            for occ in pat.occurrences_us(int(s), int(e)):
                idx.append(i)
                ts.append(occ)
        out = t.take(pa.array(idx, pa.int64()))
        return out.append_column(
            out_col, pa.array(np.array(ts, np.int64), pa.int64()).cast(pa.timestamp("us"))
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)
