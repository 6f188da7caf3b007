"""Backfill runner: incremental, checkpoint-resumable jobs.

The lifecycle of the reference's computeBackfill / computeJoinOpt
(spark/GroupBy.scala:691-793, spark/JoinBase.scala:504-636):

1. semantic-hash diff → archive stale output when the config changed
   (spark/SemanticHashUtils.scala)
2. unfilledRanges(output table vs requested range) → contiguous holes
3. optional step-days re-split (spark/DataRange.scala:164-169)
4. compute + salted partition-overwrite per step, lineage sidecar per
   partition

Killing the process mid-backfill and rerunning the same call completes
the remaining partitions and produces byte-identical results (verified
by tests/test_incremental.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.api.types import GroupBy, Join
from chronon_spark.operators.groupby import group_by_backfill
from chronon_spark.operators.join import join_backfill
from chronon_spark.plans.ranges import PartitionRange
from chronon_spark.sources.warehouse import Warehouse


def _stale(wh: Warehouse, table: str, semantic_hash: str) -> bool:
    lin = wh.lineage(table)
    return any(v.get("semantic_hash") not in (None, semantic_hash) for v in lin.values())


def run_group_by_backfill(
    spark: SparkSession,
    wh: Warehouse,
    gb: GroupBy,
    start_ds: str,
    end_ds: str,
    step_days: int = 30,
    salt_n: int = 8,
) -> str:
    """Backfill a snapshot GroupBy into table ``gb.name``; returns table name."""
    table = gb.name
    sem = gb.semantic_hash()
    if wh.exists(table) and _stale(wh, table, sem):
        wh.drop(table)  # archive-on-semantic-change
    requested = PartitionRange(gb.backfill_start_date or start_ds, end_ds)
    holes = wh.unfilled(table, requested)
    for hole in holes:
        for step in hole.steps(step_days):
            df = group_by_backfill(spark, gb, step.start, step.end)
            df = df.filter(F.col("ds").between(step.start, step.end))
            wh.overwrite_partitions(
                df,
                table,
                step.days(),
                salt_cols=list(gb.key_columns),
                salt_n=salt_n,
                lineage={"semantic_hash": sem, "config": gb.name},
            )
    return table


def run_join_backfill(
    spark: SparkSession,
    wh: Warehouse,
    join: Join,
    start_ds: str,
    end_ds: str,
    step_days: int = 30,
    salt_n: int = 8,
    tile_warehouse=None,
) -> str:
    table = join.name
    sem = join.semantic_hash()
    if wh.exists(table) and _stale(wh, table, sem):
        wh.drop(table)
    requested = PartitionRange(start_ds, end_ds)
    holes = wh.unfilled(table, requested)
    for hole in holes:
        for step in hole.steps(step_days):
            df = join_backfill(spark, join, step.start, step.end, tile_warehouse=tile_warehouse)
            try:
                wh.overwrite_partitions(
                    df,
                    table,
                    step.days(),
                    lineage={"semantic_hash": sem, "config": join.name},
                )
            finally:
                # per-step cache release: a year-long backfill must not
                # accumulate each step's persisted left in executor storage
                from chronon_spark.operators.join import release_backfill_caches

                release_backfill_caches()
    return table
