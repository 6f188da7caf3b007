"""Physical-plan contracts: the properties that make queries scale must
be visible in the executed plan, not just implied (SURVEY §4)."""

import pandas as pd
from pyspark.sql import functions as F


def _plan(df, execute: bool = False) -> str:
    if execute:  # AQE finalizes (and shows codegen spans) only after a run
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_scan_pushdown_and_codegen(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"))
    )
    plan = _plan(q, execute=True)
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1][:300]
    assert "*(" in plan  # WholeStageCodegen span marker
    # column pruning: a 2-column aggregate must not read the wide columns
    assert "l_comment" not in plan.split("ReadSchema", 1)[1][:400]


def test_snapshot_sketch_ir_plan(spark):
    """30d percentile/unique snapshot plans must not re-materialize raw
    values per output day (the r1 scale-killer)."""
    from chronon_spark.api.types import Aggregation, EventSource, GroupBy, Operation, Window
    from chronon_spark.operators.groupby import snapshot_events

    ev = spark.createDataFrame(
        pd.DataFrame(
            {
                "user": ["u1"] * 10,
                "ts": [1_700_000_000_000 + i * 86_400_000 for i in range(10)],
                "price": [float(i) for i in range(10)],
            }
        )
    ).withColumn("ds", F.date_format(F.timestamp_millis(F.col("ts")), "yyyy-MM-dd"))
    gb = GroupBy(
        name="pc",
        sources=(EventSource(table="ev"),),
        key_columns=("user",),
        aggregations=(
            Aggregation("price", Operation.APPROX_PERCENTILE, arg_map={"percentiles": [0.5]}, windows=(Window(30),)),
            Aggregation("price", Operation.UNIQUE_COUNT, windows=(Window(30),)),
        ),
    )
    plan = _plan(snapshot_events(spark, gb, ev, "2023-11-15", "2023-12-10"))
    assert "flatten(collect_list" not in plan
    assert "collect_set" not in plan
