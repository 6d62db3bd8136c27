"""Cron occurrence expansion (M5, ``utils/CronUtil.scala:42-76``): expand a
5-field cron pattern into its occurrence timestamps within a row's
``[start, end)`` window — a 1→k row explosion used by the reference via
``flatMap`` (``eval/EvalFunctions.scala:410-422``).

Supported field syntax: ``*``, ``N``, ``*/S``, ``A-B``, ``A,B,C`` for
minute / hour / day-of-month / month / day-of-week. Day-of-week follows
UNIX cron semantics (0=Sunday .. 6=Saturday, 7 accepted as Sunday) — the
reference parses ``CronType.UNIX`` via cron-utils, so ``0-4`` means
Sun-Thu, not Mon-Fri. All arithmetic is epoch-µs UTC integer math (the
reference pins a ZoneId explicitly); naive ``datetime.timestamp()`` would
shift occurrences by the host's UTC offset.

Occurrences are enumerated ARITHMETICALLY, never by scanning minutes: the
pattern's matching minutes-of-day are a precomputed (hour × minute)
cross-product and matching days come from vectorized month/day-of-month/
day-of-week masks over the day range, so a year-long window costs a few
hundred thousand int64 ops, not 525 k datetime constructions per row.
"""

from __future__ import annotations

import datetime as dt
from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

_DAY_US = 86_400_000_000
_MIN_US = 60_000_000


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


def _segment_arange(lens: np.ndarray) -> np.ndarray:
    """[0..lens[0]) ++ [0..lens[1]) ++ …, vectorized."""
    total = int(lens.sum())
    if total == 0:
        return np.array([], np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lens)


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
        # matching µs offsets within a day, sorted (hour × minute product)
        mins = np.array(sorted(self.minute), np.int64)
        hours = np.array(sorted(self.hour), np.int64)
        self._day_offsets_us = (
            hours[:, None] * 3_600_000_000 + mins[None, :] * _MIN_US
        ).reshape(-1)
        self._dom_arr = np.array(sorted(self.dom), np.int64)
        self._month_arr = np.array(sorted(self.month), np.int64)
        self._dow_arr = np.array(sorted(self.dow), np.int64)

    def matches(self, t: dt.datetime) -> bool:
        return (
            t.minute in self.minute
            and t.hour in self.hour
            and t.day in self.dom
            and t.month in self.month
            # python weekday(): Mon=0..Sun=6 → cron dow: Sun=0..Sat=6
            and (t.weekday() + 1) % 7 in self.dow
        )

    def matching_day_starts_us(self, day0: int, day1: int) -> np.ndarray:
        """Epoch-µs midnights of matching days in ``[day0, day1)`` (days since
        epoch) — month/dom/dow masks vectorized over the whole day range."""
        days = np.arange(day0, day1, dtype=np.int64)
        if len(days) == 0:
            return days
        d = days.astype("datetime64[D]")
        m = d.astype("datetime64[M]")
        month = m.astype(np.int64) % 12 + 1
        dom = (d - m).astype(np.int64) + 1
        dow = (days + 4) % 7  # 1970-01-01 was a Thursday = cron dow 4
        mask = (
            np.isin(month, self._month_arr)
            & np.isin(dom, self._dom_arr)
            & np.isin(dow, self._dow_arr)
        )
        return days[mask] * _DAY_US

    def occurrences_in_range_us(self, day0: int, day1: int) -> np.ndarray:
        """Sorted occurrence timestamps (µs) for all days in [day0, day1)."""
        days = self.matching_day_starts_us(day0, day1)
        if len(days) == 0 or len(self._day_offsets_us) == 0:
            return np.array([], np.int64)
        return (days[:, None] + self._day_offsets_us[None, :]).reshape(-1)

    def occurrences_us(self, start_us: int, end_us: int) -> list[int]:
        """Occurrence timestamps (µs epoch) in [start, end), minute granularity."""
        if end_us <= start_us:
            return []
        occ = self.occurrences_in_range_us(
            start_us // _DAY_US, -(-end_us // _DAY_US)
        )
        lo = np.searchsorted(occ, start_us, side="left")
        hi = np.searchsorted(occ, end_us, side="left")
        return occ[lo:hi].tolist()


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
    (closure); all input columns are carried to each emitted row.

    Per batch: row windows are merged into disjoint day intervals, occurrences
    are generated once per interval (arithmetically), and every row resolves
    to a contiguous occurrence span with two ``np.searchsorted`` probes — no
    per-row or per-minute Python loop.
    """
    pat = CronPattern(expr)

    def f(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        starts = t[start_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ends = t[end_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(starts)
        if n == 0:
            return t.append_column(out_col, pa.array([], pa.timestamp("us")))
        d0 = starts // _DAY_US
        d1 = -(-ends // _DAY_US)  # ceil
        # merge row day-windows into disjoint intervals so the occurrence
        # array covers exactly the union (bounded by actual coverage, not the
        # global [min, max] span of a pathological batch)
        order = np.argsort(d0, kind="stable")
        merged: list[tuple[int, int]] = []
        for a, b in zip(d0[order], d1[order]):
            if b <= a:
                continue
            if merged and a <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], b))
            else:
                merged.append((int(a), int(b)))
        occ = (
            np.concatenate([pat.occurrences_in_range_us(a, b) for a, b in merged])
            if merged
            else np.array([], np.int64)
        )
        lo = np.searchsorted(occ, starts, side="left")
        hi = np.searchsorted(occ, ends, side="left")
        counts = hi - lo
        idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        pos = np.repeat(lo, counts) + _segment_arange(counts)
        out = t.take(pa.array(idx, pa.int64()))
        return out.append_column(
            out_col, pa.array(occ[pos], pa.int64()).cast(pa.timestamp("us"))
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)
