"""Partitioned table I/O with lineage — the engine's local "catalog".

Re-expresses the reference's TableUtils write path
(spark/catalog/TableUtils.scala:546-600 insertPartitions, 706-792 salted
repartition-and-write) on plain ds-partitioned parquet directories, the
format this sandbox has (the same API maps 1:1 onto Iceberg
``df.writeTo(t).overwritePartitions()`` — a ``format='iceberg'`` flag can
switch the write call when an Iceberg catalog jar is on the classpath).

Salted write (TableUtils.scala:763-786, verbatim strategy): a
deterministic ``pmod(hash(keys...), salt_n)`` salt column, repartition by
(ds, salt), sortWithinPartitions(ds, sort_cols) — bounds output file count
per partition and spreads hot keys across writers.

Lineage: each write records a JSON sidecar per partition (row counts,
semantic hash, inputs) under ``_lineage/`` — the checkpoint-resume
contract: ``unfilled_ranges`` consults the recorded partitions, so a
killed backfill restarted with the same config recomputes only missing
days (SemanticHashUtils.scala semantics for invalidation).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.plans.ranges import PartitionRange, unfilled_ranges


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        # all physical I/O goes through the format protocol
        # (sources/catalog.py — TableUtils.scala:46-83 Format trait); the
        # sandbox uses the parquet-directory format, a production deploy
        # swaps in IcebergFormat/DeltaFormat here
        from chronon_spark.sources.catalog import ParquetDirFormat

        self.fmt = ParquetDirFormat(spark, root)
        os.makedirs(root, exist_ok=True)

    # ---------------------------------------------------------------- paths
    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _lineage_dir(self, table: str) -> str:
        return os.path.join(self.root, "_lineage", table)

    def exists(self, table: str) -> bool:
        return os.path.isdir(self.path(table))

    # ------------------------------------------------------------- metadata
    def partitions(self, table: str) -> list[str]:
        """List ds= partition values (TableUtils Format.partitions — for
        Iceberg this reads the ``<t>.partitions`` metadata table)."""
        return self.fmt.partitions(table)

    def filled_days(self, table: str) -> set[str]:
        """Days considered complete: a physical ds= partition OR a lineage
        sidecar. The sidecar covers legitimately-EMPTY output days (zero
        rows flattened/scored that day) — without it every empty day would
        read as unfilled forever and be re-scanned on each resume."""
        return set(self.partitions(table)) | set(self.lineage(table))

    def unfilled(self, table: str, requested: PartitionRange) -> list[PartitionRange]:
        return unfilled_ranges(self.filled_days(table), requested)

    def record_days(
        self, table: str, days: list[str], lineage: dict | None = None
    ) -> None:
        """Write lineage sidecars for ``days`` that have none yet (row_count
        0) — marks processed-but-empty days complete for the resume
        contract. Counterpart of invalidate_partitions."""
        ldir = self._lineage_dir(table)
        os.makedirs(ldir, exist_ok=True)
        for ds in days:
            p = os.path.join(ldir, f"{ds}.json")
            if os.path.exists(p):
                continue
            with open(p, "w") as f:
                json.dump(
                    {"ds": ds, "row_count": 0, "written_at": time.time(), **(lineage or {})},
                    f,
                )

    # ----------------------------------------------------------------- read
    def read(self, table: str, merge_schema: bool = False) -> DataFrame:
        if merge_schema:
            try:
                return self.fmt.read(table, merge_schema=True)
            except TypeError:  # formats with native schema evolution
                pass
        return self.fmt.read(table)

    # ---------------------------------------------------------------- write
    def insert_partitions(
        self,
        df: DataFrame,
        table: str,
        salt_cols: list[str] | None = None,
        salt_n: int = 8,
        sort_cols: list[str] | None = None,
        lineage: dict | None = None,
    ) -> list[str]:
        """Dynamic partition overwrite by ds + lineage sidecars.

        Returns the list of ds values written."""
        if salt_cols:
            df = (
                df.withColumn("__salt", F.pmod(F.hash(*salt_cols), F.lit(salt_n)))
                .repartition(F.col("ds"), F.col("__salt"))
                .sortWithinPartitions("ds", *(sort_cols or salt_cols))
                .drop("__salt")
            )
        # the format's writer is dynamic-overwrite by contract: a static
        # overwrite would truncate the whole table and destroy completed
        # partitions that the unfilled/resume contract depends on.
        self.fmt.insert_overwrite(df, table)

        # lineage row counts come from the JUST-WRITTEN partitions only —
        # never a full-table re-scan, which would make backfill step N pay
        # an O(N)-partitions extra scan (year-long backfills quadratic)
        ldir = self._lineage_dir(table)
        os.makedirs(ldir, exist_ok=True)
        counts = {
            r["ds"]: r["n"]
            for r in df.groupBy("ds").agg(F.count("*").alias("n")).collect()
        }
        written = sorted(counts)
        for ds in written:
            with open(os.path.join(ldir, f"{ds}.json"), "w") as f:
                json.dump(
                    {
                        "ds": ds,
                        "row_count": counts.get(ds, 0),
                        "written_at": time.time(),
                        **(lineage or {}),
                    },
                    f,
                )
        return written

    def overwrite_partitions(
        self,
        df: DataFrame,
        table: str,
        partitions: list[str],
        salt_cols: list[str] | None = None,
        salt_n: int = 8,
        sort_cols: list[str] | None = None,
        lineage: dict | None = None,
    ) -> None:
        """Overwrite only the named ds partitions (dynamic overwrite
        semantics of TableUtils.insertPartitions on an existing table)."""
        if salt_cols:
            df = (
                df.withColumn("__salt", F.pmod(F.hash(*salt_cols), F.lit(salt_n)))
                .repartition(F.col("ds"), F.col("__salt"))
                .sortWithinPartitions("ds", *(sort_cols or salt_cols))
                .drop("__salt")
            )
        # dynamic overwrite replaces only the touched ds partitions
        self.fmt.insert_overwrite(df, table)
        ldir = self._lineage_dir(table)
        os.makedirs(ldir, exist_ok=True)
        sub = self.read(table).filter(F.col("ds").isin(partitions))
        counts = {r["ds"]: r["n"] for r in sub.groupBy("ds").agg(F.count("*").alias("n")).collect()}
        for ds in partitions:
            with open(os.path.join(ldir, f"{ds}.json"), "w") as f:
                json.dump(
                    {"ds": ds, "row_count": counts.get(ds, 0), "written_at": time.time(), **(lineage or {})},
                    f,
                )

    # ------------------------------------------------------ bucketed layout
    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_cols: list[str],
        n_buckets: int = 64,
        sort_cols: list[str] | None = None,
    ) -> None:
        """Write a hash-bucketed, per-bucket-sorted table via the session
        catalog (``bucketBy``/``sortBy`` + ``saveAsTable``) — the layout
        the reference provisions with Iceberg ``bucketed_by`` tables
        (spark/catalog/TableUtils.scala:223-284). A join whose keys cover
        the bucket columns then reads the table with NO exchange above the
        scan: HashPartitioning(bucket_cols, n) satisfies the join's
        clustered distribution, and only the other side shuffles
        (requireAllClusterKeysForCoPartition=false in session.py). At 100TB
        this removes the single wide-column shuffle of pipelines like the
        webtext flagship's payload join."""
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, *bucket_cols)
            .sortBy(*(sort_cols or bucket_cols))
            .option("path", self.path(table))
            .saveAsTable(table)
        )

    def read_bucketed(self, table: str) -> DataFrame:
        """Catalog read — preserves bucketing metadata (a plain path read
        would lose the HashPartitioning and re-shuffle)."""
        return self.spark.table(table)

    def drop(self, table: str) -> None:
        if self.spark.catalog.tableExists(table):
            self.spark.sql(f"DROP TABLE IF EXISTS `{table}`")
        shutil.rmtree(self.path(table), ignore_errors=True)
        shutil.rmtree(self._lineage_dir(table), ignore_errors=True)

    def invalidate_partitions(self, table: str, days: list[str]) -> None:
        """Drop the named ds partitions AND their lineage records — the
        late-data hook: an invalidated day reads as unfilled again."""
        for ds in days:
            shutil.rmtree(os.path.join(self.path(table), f"ds={ds}"), ignore_errors=True)
            try:
                os.remove(os.path.join(self._lineage_dir(table), f"{ds}.json"))
            except FileNotFoundError:
                pass

    def lineage(self, table: str) -> dict[str, dict]:
        ldir = self._lineage_dir(table)
        if not os.path.isdir(ldir):
            return {}
        out = {}
        for fn in os.listdir(ldir):
            if fn.endswith(".json"):
                with open(os.path.join(ldir, fn)) as f:
                    out[fn[:-5]] = json.load(f)
        return out
