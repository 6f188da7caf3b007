"""Persisted tile cache for the temporal (as-of) path — the offline
analogue of the reference's uploaded batch IRs.

The reference's serving architecture materializes per-key hop IRs once
(GroupByUpload → FinalBatchIr, spark/GroupByUpload.scala:76-114) and
merges the streamed head at fetch. Offline, this repo's tiled kernel
rebuilt its 5-minute tile frame from raw history on every run. The
TileStore closes that gap for batch: `build_tile_frame` output — one row
per (keys, 5-min tile), the only stage that aggregates raw history — is
persisted day-partitioned and lineage-tracked, so a repeated or extended
as-of backfill scans raw events ONLY for

- days whose tiles are not yet materialized, and
- the query-head tiles (rows inside the 5-min tile of each query time —
  exact semantics require them raw; they are semi-join-pruned to query
  tiles).

Per-day builds concatenate to the one-pass build exactly: the tile
groupBy is within (keys, tile) and 86_400_000 % TILE_MS == 0 means no
tile spans a day boundary. The cache is keyed by the GroupBy's semantic
hash (config change → drop + rebuild), empty days are recorded done in
lineage, and late data invalidates via ``refresh_days`` — the same
contract as the snapshot IR cache (operators/incremental.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.api.types import GroupBy
from chronon_spark.operators.tiled import build_tile_frame, temporal_events_tiled
from chronon_spark.plans.ranges import PartitionRange, chunk_holes
from chronon_spark.sources.scan import TS_COL
from chronon_spark.sources.warehouse import Warehouse


class TileStore:
    """Day-partitioned persistence of a GroupBy's 5-minute tile frame."""

    def __init__(self, warehouse: Warehouse, gb: GroupBy):
        self.wh = warehouse
        self.gb = gb
        self.table = f"{gb.name}__tiles5m"
        self.sem = gb.semantic_hash()

    def _invalidate_on_config_change(self) -> None:
        lin = self.wh.lineage(self.table)
        if any(v.get("semantic_hash") not in (None, self.sem) for v in lin.values()):
            self.wh.drop(self.table)

    def done_days(self) -> set[str]:
        return set(self.wh.lineage(self.table))

    def materialize(
        self,
        spark: SparkSession,
        events: DataFrame,
        start_ds: str,
        end_ds: str,
        step_days: int = 30,
        refresh_days: list[str] | None = None,
    ) -> list[str]:
        """Ensure tiles exist for every day in [start_ds, end_ds];
        ``events`` must cover at least the missing days (already
        null-key-filtered, non-null ts). Returns newly built days."""
        self._invalidate_on_config_change()
        if refresh_days:
            self.wh.invalidate_partitions(self.table, refresh_days)
        done = self.done_days()
        missing = [d for d in PartitionRange(start_ds, end_ds).days() if d not in done]
        built: list[str] = []
        for hole in chunk_holes(missing):
            for step in hole.steps(step_days):
                # ts-day containment keeps every tile inside this step's
                # partitions (the write lists step.days()); the additional
                # ds predicate is what reaches the parquet PARTITION PRUNER
                # — without it each step re-scans the whole source (engine-
                # rendered frames guarantee ds == date(ts), so it drops
                # nothing)
                day_events = events.filter(
                    F.date_format(
                        F.timestamp_millis(F.col(TS_COL)), "yyyy-MM-dd"
                    ).between(step.start, step.end)
                )
                if "ds" in events.columns:
                    day_events = day_events.filter(
                        F.col("ds").between(step.start, step.end)
                    )
                tiles = build_tile_frame(self.gb, day_events).withColumn(
                    "ds",
                    F.date_format(F.timestamp_millis(F.col(TS_COL)), "yyyy-MM-dd"),
                )
                self.wh.overwrite_partitions(
                    tiles,
                    self.table,
                    step.days(),
                    salt_cols=list(self.gb.key_columns),
                    lineage={
                        "semantic_hash": self.sem,
                        "config": self.gb.name,
                        "kind": "tiles5m",
                    },
                )
                built.extend(step.days())
        return built

    def read(self, start_ds: str, end_ds: str) -> DataFrame:
        return (
            self.wh.read(self.table)
            .filter(F.col("ds").between(start_ds, end_ds))
            .drop("ds")
        )


def temporal_events_tiled_cached(
    spark: SparkSession,
    gb: GroupBy,
    queries: DataFrame,
    events: DataFrame,
    store: TileStore,
    start_ds: str,
    end_ds: str,
    passthrough: bool = False,
    refresh_days: list[str] | None = None,
) -> tuple[DataFrame, list[str]]:
    """As-of aggregation through the tile cache: materialize missing tile
    days from ``events``, then run the tiled kernel with the cached frame
    (raw events feed ONLY the query-head tiles). [start_ds, end_ds] must
    cover every day any query's window reaches back to — the same
    contract as the events scan range. Returns (features frame, tile days
    newly built)."""
    from chronon_spark.sources.scan import null_key_filter

    clean = null_key_filter(events, tuple(gb.key_columns)).filter(
        F.col(TS_COL).isNotNull()
    )
    built = store.materialize(
        spark, clean, start_ds, end_ds, refresh_days=refresh_days
    )
    tiles = store.read(start_ds, end_ds)
    out = temporal_events_tiled(
        spark, gb, queries, events, passthrough=passthrough, tiles_override=tiles
    )
    return out, built
