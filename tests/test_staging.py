"""StagingQuery: macro substitution + incremental backfill; derivations;
cumulative sources; skew-key exclusion."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from chronon_spark.api.types import (
    Aggregation,
    EventSource,
    GroupBy,
    Operation,
    Query,
    Window,
)
from chronon_spark.operators.groupby import snapshot_events
from chronon_spark.operators.staging import StagingQuery, render_staging_sql, run_staging_query
from chronon_spark.sources.scan import render_source, skew_filter
from chronon_spark.sources.warehouse import Warehouse

MS_DAY = 86_400_000
T0 = 1_700_000_000_000


@pytest.fixture(scope="module")
def ev_view(spark):
    rng = np.random.default_rng(9)
    n = 300
    ev = pd.DataFrame(
        {
            "user": [f"u{i}" for i in rng.integers(0, 4, n)],
            "ts": (T0 + rng.integers(0, 10 * MS_DAY, n)).astype(np.int64),
            "v": rng.integers(1, 50, n).astype(float),
        }
    )
    df = spark.createDataFrame(ev).withColumn(
        "ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd")
    )
    df.createOrReplaceTempView("ev_stage")
    return ev


def test_macro_substitution(spark, ev_view):
    sql = render_staging_sql(
        spark,
        "SELECT * FROM ev_stage WHERE ds BETWEEN '{{ start_date }}' AND '{{ end_date }}' "
        "AND '{{ latest_date }}' >= ds AND ds <= '{{ max_date(table=ev_stage) }}'",
        "2023-11-15",
        "2023-11-20",
        "2023-11-24",
    )
    assert "{{" not in sql
    assert "'2023-11-15'" in sql and "'2023-11-20'" in sql and "'2023-11-24'" in sql
    max_ds = spark.table("ev_stage").agg(F.max("ds")).first()[0]
    assert max_ds in sql


def test_staging_backfill_incremental(spark, ev_view, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sq = StagingQuery(
        name="daily_sum",
        query=(
            "SELECT user, ds, sum(v) AS v_sum FROM ev_stage "
            "WHERE ds BETWEEN '{{ start_date }}' AND '{{ end_date }}' GROUP BY user, ds"
        ),
    )
    run_staging_query(spark, wh, sq, "2023-11-15", "2023-11-18")
    p1 = wh.partitions("daily_sum")
    assert p1 == ["2023-11-15", "2023-11-16", "2023-11-17", "2023-11-18"]
    # extend range → only new partitions computed; existing preserved
    run_staging_query(spark, wh, sq, "2023-11-15", "2023-11-21")
    assert wh.partitions("daily_sum")[-1] == "2023-11-21"
    oracle = (
        spark.table("ev_stage")
        .filter(F.col("ds").between("2023-11-15", "2023-11-21"))
        .groupBy("user", "ds")
        .agg(F.sum("v").alias("v_sum"))
    )
    got = wh.read("daily_sum").select("user", "ds", "v_sum")
    assert got.exceptAll(oracle).count() == 0
    assert oracle.exceptAll(got).count() == 0


def test_groupby_derivations(spark, ev_view):
    gb = GroupBy(
        name="d",
        sources=(EventSource(table="ev_stage"),),
        key_columns=("user",),
        aggregations=(
            Aggregation("v", Operation.SUM, windows=(Window(7),)),
            Aggregation("v", Operation.COUNT, windows=(Window(7),)),
        ),
        derivations={"*": "*", "v_mean_7d": "v_sum_7d / v_count_7d"},
    )
    df = spark.table("ev_stage")
    out = snapshot_events(spark, gb, df, "2023-11-15", "2023-11-20")
    row = out.filter(F.col("v_count_7d") > 0).first()
    assert abs(row["v_mean_7d"] - row["v_sum_7d"] / row["v_count_7d"]) < 1e-9


def test_cumulative_source(spark, ev_view):
    """isCumulative: only the latest partition is scanned
    (spark/GroupBy.scala:578-583)."""
    full = spark.table("ev_stage")
    # build a cumulative table: each ds holds all rows up to that ds
    latest = full.agg(F.max("ds")).first()[0]
    cum = full.withColumn("ds", F.lit(latest))  # degenerate cumulative: all in latest
    cum.createOrReplaceTempView("ev_cum")
    src = EventSource(table="ev_cum", query=Query(time_column="ts"), is_cumulative=True)
    out = render_source(spark, src, None)
    assert out.count() == full.count()


def test_skew_filter(spark, ev_view):
    df = spark.table("ev_stage")
    out = skew_filter(df, {"user": ("u0",)})
    assert out.filter(F.col("user") == "u0").count() == 0
    assert out.count() == df.filter("user != 'u0'").count()
