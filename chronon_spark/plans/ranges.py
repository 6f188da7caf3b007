"""Partition-range arithmetic + incremental hole detection.

Port of the *semantics* of spark/DataRange.scala (PartitionRange) and
spark/catalog/TableUtils.scala:854-942 (``chunk`` + ``unfilledRanges``):
given the partitions an output table already has and a requested range,
compute the contiguous missing sub-ranges — the unit of incremental,
checkpoint-resumable backfill.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass


def _d(ds: str) -> _dt.date:
    return _dt.date.fromisoformat(ds)


def date_range(start: str, end: str) -> list[str]:
    d, e = _d(start), _d(end)
    out = []
    while d <= e:
        out.append(d.isoformat())
        d += _dt.timedelta(days=1)
    return out


@dataclass(frozen=True)
class PartitionRange:
    start: str
    end: str

    def days(self) -> list[str]:
        return date_range(self.start, self.end)

    def intersect(self, other: "PartitionRange") -> "PartitionRange | None":
        s, e = max(self.start, other.start), min(self.end, other.end)
        return PartitionRange(s, e) if s <= e else None

    def steps(self, step_days: int) -> list["PartitionRange"]:
        """Split into ≤step_days chunks (spark/DataRange.scala:164-169)."""
        days = self.days()
        return [
            PartitionRange(days[i], days[min(i + step_days - 1, len(days) - 1)])
            for i in range(0, len(days), step_days)
        ]


def chunk_holes(missing_days: list[str]) -> list[PartitionRange]:
    """Contiguous-day chunking (TableUtils.scala:854-864)."""
    if not missing_days:
        return []
    missing = sorted(set(missing_days))
    out = []
    start = prev = missing[0]
    for ds in missing[1:]:
        if _d(ds) == _d(prev) + _dt.timedelta(days=1):
            prev = ds
        else:
            out.append(PartitionRange(start, prev))
            start = prev = ds
    out.append(PartitionRange(start, prev))
    return out


def unfilled_ranges(
    existing: set[str] | list[str],
    requested: PartitionRange,
    skip_first_hole: bool = False,
) -> list[PartitionRange]:
    """Missing sub-ranges of ``requested`` given existing output partitions
    (TableUtils.scala:866-942). ``skip_first_hole`` mirrors the retention
    guard: holes before the first existing partition are not refilled."""
    existing = set(existing)
    missing = [ds for ds in requested.days() if ds not in existing]
    if skip_first_hole and existing:
        first = min(existing)
        missing = [ds for ds in missing if ds >= first]
    return chunk_holes(missing)
