"""Format-pluggable table catalog: partition listing + partitioned writes
per storage format, mirroring the reference's Format trait
(spark/catalog/TableUtils.scala:46-83) and its four implementations —
Hive (:190-221, SHOW PARTITIONS), Iceberg (:223-284, the ``<t>.partitions``
metadata table + DSv2 overwritePartitions), Delta (:289-314, DeltaLog),
View (:316-334, DISTINCT scan) — plus the parquet-directory format this
sandbox actually exercises (sources/warehouse.py delegates here).

Iceberg and Delta need their catalog jars on the classpath; this
container has neither, so those classes keep the full code path but
raise a clear, early error from ``available()`` instead of failing deep
inside an analysis exception. The engine code is written against the
``TableFormat`` protocol only, so flipping a production deployment to
Iceberg is a constructor choice, not a rewrite.
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "ds"


class TableFormat(ABC):
    """Format trait (TableUtils.scala:46-83): list partitions + write."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    @abstractmethod
    def partitions(self, table: str) -> list[str]:
        """Sorted ds partition values present in ``table``."""

    @abstractmethod
    def read(self, table: str) -> DataFrame: ...

    @abstractmethod
    def insert_overwrite(self, df: DataFrame, table: str) -> None:
        """Dynamic partition overwrite of the partitions present in df."""

    def available(self) -> bool:
        return True

    def ensure_available(self) -> None:
        if not self.available():
            raise RuntimeError(
                f"{type(self).__name__} requires its catalog plugin on the "
                "Spark classpath (absent in this environment)"
            )


class ParquetDirFormat(TableFormat):
    """ds=-partitioned parquet directories (the sandbox's native format)."""

    def __init__(self, spark: SparkSession, root: str):
        super().__init__(spark)
        self.root = root

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def partitions(self, table: str) -> list[str]:
        p = self._path(table)
        if not os.path.isdir(p):
            return []
        return sorted(
            d.split("=", 1)[1]
            for d in os.listdir(p)
            if d.startswith(f"{PARTITION_COL}=") and "=" in d
        )

    def read(self, table: str, merge_schema: bool = False) -> DataFrame:
        """``merge_schema``: schema-evolution-on-append for the parquet
        fallback (the Iceberg format evolves schemas natively;
        TableUtils.scala:546-600) — partitions written before a column
        existed read it as null. Off by default: merging scans every
        file footer."""
        p = self._path(table)
        r = self.spark.read.option("basePath", p)
        if merge_schema:
            r = r.option("mergeSchema", "true")
        return r.parquet(p)

    def insert_overwrite(self, df: DataFrame, table: str) -> None:
        df.write.mode("overwrite").option("partitionOverwriteMode", "dynamic").partitionBy(
            PARTITION_COL
        ).parquet(self._path(table))


class HiveFormat(TableFormat):
    """Catalog tables via SHOW PARTITIONS (TableUtils.scala:190-221)."""

    def partitions(self, table: str) -> list[str]:
        rows = self.spark.sql(f"SHOW PARTITIONS {table}").collect()
        vals = []
        for r in rows:
            for piece in r[0].split("/"):
                k, _, v = piece.partition("=")
                if k == PARTITION_COL:
                    vals.append(v)
        return sorted(set(vals))

    def read(self, table: str) -> DataFrame:
        return self.spark.table(table)

    def insert_overwrite(self, df: DataFrame, table: str) -> None:
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .format("parquet")
            .partitionBy(PARTITION_COL)
            .saveAsTable(table)
        )


class IcebergFormat(TableFormat):
    """Iceberg: partition listing from the ``<t>.partitions`` metadata
    table, writes via DSv2 overwritePartitions
    (TableUtils.scala:223-284)."""

    def available(self) -> bool:
        try:
            self.spark._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.source.SparkTable"
            )
            return True
        except Exception:
            return False

    def partitions(self, table: str) -> list[str]:
        self.ensure_available()
        parts = self.spark.read.format("iceberg").load(f"{table}.partitions")
        return sorted(
            str(r[0])
            for r in parts.select(F.col(f"partition.{PARTITION_COL}")).distinct().collect()
            if r[0] is not None
        )

    def read(self, table: str) -> DataFrame:
        self.ensure_available()
        return self.spark.table(table)

    def insert_overwrite(self, df: DataFrame, table: str) -> None:
        self.ensure_available()
        df.writeTo(table).overwritePartitions()


class DeltaFormat(TableFormat):
    """Delta: partition listing from the transaction log's partition
    columns (surfaced through SHOW PARTITIONS on Delta ≥ 2.x / a DISTINCT
    scan fallback), writes via format('delta')
    (TableUtils.scala:289-314)."""

    def available(self) -> bool:
        try:
            self.spark._jvm.java.lang.Class.forName("io.delta.tables.DeltaTable")
            return True
        except Exception:
            return False

    def partitions(self, table: str) -> list[str]:
        self.ensure_available()
        try:
            rows = self.spark.sql(f"SHOW PARTITIONS {table}").collect()
            return sorted({r[0].split("=", 1)[1] for r in rows})
        except Exception:
            return sorted(
                str(r[0])
                for r in self.spark.table(table).select(PARTITION_COL).distinct().collect()
            )

    def read(self, table: str) -> DataFrame:
        self.ensure_available()
        return self.spark.table(table)

    def insert_overwrite(self, df: DataFrame, table: str) -> None:
        self.ensure_available()
        (
            df.write.format("delta")
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(PARTITION_COL)
            .saveAsTable(table)
        )


class ViewFormat(TableFormat):
    """Views: no physical partitions — DISTINCT scan of the partition
    column (TableUtils.scala:316-334)."""

    def partitions(self, table: str) -> list[str]:
        return sorted(
            str(r[0])
            for r in self.spark.table(table).select(PARTITION_COL).distinct().collect()
            if r[0] is not None
        )

    def read(self, table: str) -> DataFrame:
        return self.spark.table(table)

    def insert_overwrite(self, df: DataFrame, table: str) -> None:
        raise ValueError("views are read-only")


def detect_format(spark: SparkSession, table: str, parquet_root: str | None = None) -> TableFormat:
    """Pick the format for a catalog table by its provider (TableUtils
    format detection), or ParquetDirFormat for path-rooted tables."""
    if parquet_root is not None:
        return ParquetDirFormat(spark, parquet_root)
    try:
        t = spark.catalog.getTable(table)
        tt = (t.tableType or "").upper()
        if "VIEW" in tt or "TEMP" in tt:
            return ViewFormat(spark)
    except Exception:
        pass
    try:
        desc = {
            r["col_name"]: (r["data_type"] or "")
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
        }
        provider = desc.get("Provider", "").lower()
        if provider == "iceberg":
            return IcebergFormat(spark)
        if provider == "delta":
            return DeltaFormat(spark)
    except Exception:
        pass
    return HiveFormat(spark)
