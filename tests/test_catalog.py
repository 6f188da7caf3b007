"""Format-pluggable catalog (TableUtils.scala:46-334 Format trait)."""

import pytest
from pyspark.sql import functions as F

from chronon_spark.sources.catalog import (
    DeltaFormat,
    HiveFormat,
    IcebergFormat,
    ParquetDirFormat,
    ViewFormat,
    detect_format,
)


@pytest.fixture(scope="module")
def frame(spark):
    return spark.range(30).select(
        F.col("id"),
        F.expr("concat('2023-11-', lpad(cast(id % 3 + 1 AS string), 2, '0'))").alias("ds"),
    )


def test_parquet_dir_format(spark, frame, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cat"))
    fmt = ParquetDirFormat(spark, root)
    fmt.insert_overwrite(frame, "t1")
    assert fmt.partitions("t1") == ["2023-11-01", "2023-11-02", "2023-11-03"]
    assert fmt.read("t1").count() == 30
    # dynamic overwrite: rewrite only one partition, others intact
    fmt.insert_overwrite(frame.filter("ds = '2023-11-02'").limit(2), "t1")
    assert fmt.partitions("t1") == ["2023-11-01", "2023-11-02", "2023-11-03"]
    assert fmt.read("t1").filter("ds = '2023-11-02'").count() == 2
    assert fmt.read("t1").filter("ds = '2023-11-01'").count() == 10


def test_hive_format_show_partitions(spark, frame):
    spark.sql("DROP TABLE IF EXISTS cat_hive_t")
    import shutil

    shutil.rmtree("spark-warehouse/cat_hive_t", ignore_errors=True)
    fmt = HiveFormat(spark)
    fmt.insert_overwrite(frame, "cat_hive_t")
    assert fmt.partitions("cat_hive_t") == ["2023-11-01", "2023-11-02", "2023-11-03"]
    assert fmt.read("cat_hive_t").count() == 30
    spark.sql("DROP TABLE IF EXISTS cat_hive_t")


def test_view_format_and_detection(spark, frame):
    frame.createOrReplaceTempView("cat_view_t")
    fmt = ViewFormat(spark)
    assert fmt.partitions("cat_view_t") == ["2023-11-01", "2023-11-02", "2023-11-03"]
    with pytest.raises(ValueError, match="read-only"):
        fmt.insert_overwrite(frame, "cat_view_t")
    assert isinstance(detect_format(spark, "cat_view_t"), ViewFormat)
    assert isinstance(detect_format(spark, "x", parquet_root="/tmp"), ParquetDirFormat)


def test_iceberg_delta_guarded(spark):
    """No Iceberg/Delta jars in this container: the formats keep their
    full code paths but fail fast with a clear message."""
    for cls in (IcebergFormat, DeltaFormat):
        fmt = cls(spark)
        if fmt.available():  # pragma: no cover — jar present in some envs
            continue
        with pytest.raises(RuntimeError, match="catalog plugin"):
            fmt.partitions("nope")


def test_parquet_schema_evolution_on_append(spark, tmp_path):
    """A column added in a later partition reads as null for earlier
    partitions under merge_schema (the parquet-dir analogue of Iceberg
    schema evolution on append)."""
    import pandas as pd

    from chronon_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.insert_partitions(
        spark.createDataFrame(pd.DataFrame({"k": ["a"], "v": [1.0], "ds": ["2024-01-01"]})),
        "evo",
    )
    wh.insert_partitions(
        spark.createDataFrame(
            pd.DataFrame({"k": ["b"], "v": [2.0], "w": [9.0], "ds": ["2024-01-02"]})
        ),
        "evo",
    )
    merged = wh.read("evo", merge_schema=True)
    assert "w" in merged.columns
    rows = {r["ds"]: r for r in merged.collect()}
    assert rows["2024-01-01"]["w"] is None and rows["2024-01-02"]["w"] == 9.0
    # default read stays cheap (no footer merge) and still returns rows
    assert wh.read("evo").count() == 2
