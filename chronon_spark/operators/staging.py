"""StagingQuery: arbitrary Spark SQL with date macros, backfilled
incrementally over missing partitions.

Semantics of spark/StagingQuery.scala:50-121 + the macro substitution in
api/.../ParametricMacro.scala:22-53 / StagingQuery.scala:190-195:

  {{ start_date }}   → step range start (overridable via setups)
  {{ end_date }}     → step range end
  {{ latest_date }}  → end of the full requested range
  {{ max_date(table=t) }} → max partition of table t at run time

The rendered SQL runs per unfilled step range and lands via partitioned
insert — identical checkpoint-resume behavior to GroupBy backfills.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.plans.ranges import PartitionRange
from chronon_spark.sources.warehouse import Warehouse


@dataclass(frozen=True)
class StagingQuery:
    """api/thrift/api.thrift:25-54."""

    name: str
    query: str  # Spark SQL with {{ start_date }} / {{ end_date }} / {{ latest_date }} / {{ max_date(table=..) }}
    start_partition: str | None = None
    setups: tuple[str, ...] = ()


_MAX_DATE_RE = re.compile(r"\{\{\s*max_date\(table=([\w./]+)\)\s*\}\}")


def render_staging_sql(
    spark: SparkSession,
    sql: str,
    start_date: str,
    end_date: str,
    latest_date: str,
    wh: Warehouse | None = None,
) -> str:
    out = sql
    out = re.sub(r"\{\{\s*start_date\s*\}\}", start_date, out)
    out = re.sub(r"\{\{\s*end_date\s*\}\}", end_date, out)
    out = re.sub(r"\{\{\s*latest_date\s*\}\}", latest_date, out)

    def max_date(m: re.Match) -> str:
        table = m.group(1)
        if wh is not None and wh.exists(table):
            parts = wh.partitions(table)
            if parts:
                return parts[-1]
        row = spark.table(table).agg(F.max("ds")).first()
        return row[0]

    return _MAX_DATE_RE.sub(max_date, out)


def run_staging_query(
    spark: SparkSession,
    wh: Warehouse,
    sq: StagingQuery,
    start_ds: str,
    end_ds: str,
    step_days: int = 30,
) -> str:
    """Incremental StagingQuery backfill into table ``sq.name``."""
    for setup in sq.setups:
        spark.sql(setup)
    requested = PartitionRange(sq.start_partition or start_ds, end_ds)
    for hole in wh.unfilled(sq.name, requested):
        for step in hole.steps(step_days):
            sql = render_staging_sql(spark, sq.query, step.start, step.end, end_ds, wh)
            df = spark.sql(sql)
            if "ds" not in df.columns:
                raise ValueError(f"StagingQuery {sq.name} must select a ds column")
            wh.overwrite_partitions(df, sq.name, step.days(), lineage={"config": sq.name})
    return sq.name
