"""Incremental IR-cache backfill — day IRs materialize ONCE, window
merges read the compact cache instead of re-scanning raw events.

Motivation (beyond the reference, which recomputes each snapshot step
from raw events — spark/GroupBy.scala:144-169): a snapshot backfill of
day D needs the last W days of RAW events; at 100 TB the repeated
lookback scan dominates every step and every re-run. This runner
materializes stage 1 of the snapshot plan — the per-(keys, day) partial
IRs (`_daily_irs`) and the distinct (keys, day, value) occurrence rows
the sliding-DISTINCT delta encoding consumes (`_occurrences`) — into
day-partitioned warehouse tables, then feeds stages 2-3 from the cache:

  events[missing IR days only]  ──►  {gb}__ir   (keys, ds, IR columns)
                                ──►  {gb}__occ__{col} (keys, ds, value)
  {gb}__ir ∪ {gb}__occ__*  ──►  spine → window merge → finalize → {gb}

Step cost therefore stops depending on window length × history: raw
events are scanned exactly once per day EVER (ds-pruned scan), and the
window merge moves |keys| × |days| compressed IR rows. Extending a
year-long backfill by one day scans one day of raw input.

Correctness notes:
- IR day completeness is tracked in lineage sidecars (not partition
  directories), so days with zero events are recorded as materialized
  and never re-scanned.
- Occurrence tables are read from ``start − lookback`` only; the delta
  encoding is closed under that truncation (an occurrence older than the
  lookback contributes +1 and −1 both strictly before the first output
  day — proof in the module test). Unbounded windows force full-history
  materialization, tracked the same way.
- The cache is keyed by the GroupBy's semantic hash: a config change
  drops and rebuilds it (same archive-on-semantic-change rule as the
  output table). LATE DATA contract: a re-delivered day must be
  explicitly invalidated (``refresh_days``) — the cache trades automatic
  pickup for scan-once, exactly like the reference's uploaded batch IRs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.api.types import EventSource, GroupBy
from chronon_spark.operators.groupby import (
    DAY_IDX,
    _daily_irs,
    _ds_from_idx,
    _occurrences,
    _snapshot_plain,
    _with_day_idx,
)
from chronon_spark.plans.ranges import PartitionRange, chunk_holes
from chronon_spark.sources.scan import render_source, shift_ds, union_sources
from chronon_spark.sources.warehouse import Warehouse


def _validate(gb: GroupBy) -> tuple[list, list]:
    from chronon_spark.operators.groupby import _DELTA_UNIQUE_OPS

    if not all(isinstance(s, EventSource) for s in gb.sources):
        raise ValueError("incremental IR cache supports event sources only")
    parts = gb.unpacked()
    if any(p.bucket is not None or p.element_wise for p in parts):
        raise ValueError(
            "incremental IR cache supports plain aggregations only — "
            "use run_group_by_backfill for bucketed/element-wise configs"
        )
    uniq = [p for p in parts if p.operation in _DELTA_UNIQUE_OPS]
    spec = [p for p in parts if p.operation not in _DELTA_UNIQUE_OPS]
    return spec, uniq


def _events(spark: SparkSession, gb: GroupBy, lo: str, hi: str) -> DataFrame:
    dfs = [
        render_source(spark, s, gb, query_start=lo, query_end=hi)
        for s in gb.sources
    ]
    return union_sources(dfs).filter(F.col("ds").between(lo, hi))


def _done_days(wh: Warehouse, table: str) -> set[str]:
    return set(wh.lineage(table))


def _gb_lookback_days(gb: GroupBy) -> int | None:
    """None = unbounded (full history needed)."""
    parts = gb.unpacked()
    if any(p.window is None for p in parts):
        return None
    return max(p.window.days_ceil for p in parts) - 1


def _events_min_ds(spark: SparkSession, gb: GroupBy, end_ds: str) -> str:
    dfs = [render_source(spark, s, gb, query_end=end_ds) for s in gb.sources]
    row = union_sources(dfs).agg(F.min("ds").alias("m")).first()
    if row["m"] is None:
        raise ValueError("no source events found")
    return row["m"]


def run_group_by_backfill_incremental(
    spark: SparkSession,
    wh: Warehouse,
    gb: GroupBy,
    start_ds: str,
    end_ds: str,
    step_days: int = 30,
    salt_n: int = 8,
    refresh_days: list[str] | None = None,
) -> tuple[str, list[str]]:
    """Backfill snapshot GroupBy ``gb.name`` through the IR cache.
    Returns (output table, IR days newly materialized this call)."""
    spec_parts, uniq_parts = _validate(gb)
    keys = list(gb.key_columns)
    table, ir_table = gb.name, f"{gb.name}__ir"
    occ_tables = {p.input_column: f"{gb.name}__occ__{p.input_column}" for p in uniq_parts}
    sem = gb.semantic_hash()

    # archive-on-semantic-change: output AND cache
    for t in (table, ir_table, *occ_tables.values()):
        lin = wh.lineage(t)
        if any(v.get("semantic_hash") not in (None, sem) for v in lin.values()):
            wh.drop(t)
    if refresh_days:
        # late-data invalidation: recompute these IR days (and any output
        # days they influence — caller re-requests the affected range)
        for t in (ir_table, *occ_tables.values()):
            wh.invalidate_partitions(t, refresh_days)

    lookback = _gb_lookback_days(gb)
    if lookback is None:
        needed_start = _events_min_ds(spark, gb, end_ds)
    else:
        needed_start = shift_ds(start_ds, -lookback)

    # ---- phase 1: materialize missing IR days (lineage-tracked so empty
    # days count as done and are never re-scanned)
    needed = PartitionRange(needed_start, end_ds)
    cache_tables = [ir_table, *occ_tables.values()]
    materialized: list[str] = []
    done = [_done_days(wh, t) for t in cache_tables]
    missing = [d for d in needed.days() if any(d not in dn for dn in done)]
    for hole in chunk_holes(missing):
        for step in hole.steps(step_days):
            ev = _with_day_idx(_events(spark, gb, step.start, step.end))
            daily = _daily_irs(keys, spec_parts, ev).withColumn(
                "ds", _ds_from_idx()
            ).drop(DAY_IDX)
            wh.overwrite_partitions(
                daily, ir_table, step.days(),
                salt_cols=keys, salt_n=salt_n,
                lineage={"semantic_hash": sem, "config": gb.name, "kind": "day_ir"},
            )
            for col, occ_t in occ_tables.items():
                occ = _occurrences(ev, keys, col).withColumn(
                    "ds", _ds_from_idx()
                ).drop(DAY_IDX)
                wh.overwrite_partitions(
                    occ, occ_t, step.days(),
                    salt_cols=keys, salt_n=salt_n,
                    lineage={"semantic_hash": sem, "config": gb.name, "kind": "occurrence"},
                )
            materialized.extend(step.days())

    # ---- phase 2: output steps read the cache, never raw events
    for hole in wh.unfilled(table, PartitionRange(start_ds, end_ds)):
        for step in hole.steps(step_days):
            lo = needed_start if lookback is None else shift_ds(step.start, -lookback)
            daily = _with_day_idx(
                wh.read(ir_table).filter(F.col("ds").between(lo, step.end))
            ).drop("ds")
            occs = {
                col: _with_day_idx(
                    wh.read(t).filter(F.col("ds").between(lo, step.end))
                ).drop("ds")
                for col, t in occ_tables.items()
            }
            out = _snapshot_plain(
                spark, gb, gb.unpacked(), None, step.start, step.end,
                daily=daily, occs=occs,
            )
            if gb.derivations:
                exprs = ["*"] if "*" in gb.derivations else keys + ["ds"]
                exprs += [f"{e} AS {a}" for a, e in gb.derivations.items() if a != "*"]
                out = out.selectExpr(*exprs)
            wh.overwrite_partitions(
                out.filter(F.col("ds").between(step.start, step.end)),
                table, step.days(),
                salt_cols=keys, salt_n=salt_n,
                lineage={"semantic_hash": sem, "config": gb.name},
            )
    return table, materialized
