"""Log flattening (LogFlattenerJob analogue): schema-registry decode,
union schema across versions, drop semantics, range-walked job, and the
flattened-log → consistency_job pipeline."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from chronon_spark.operators.logflatten import flatten_log_table, log_flattener_job
from chronon_spark.sources.warehouse import Warehouse

SCHEMAS = {
    "v1": ("user string", "amount_sum double, amount_count bigint"),
    # v2 adds a field and drops amount_count — union schema carries both
    "v2": ("user string", "amount_sum double, amount_last double"),
}


def _raw(spark):
    rows = [
        # (key_json, value_json, ts_millis, ds, schema_hash)
        ('{"user":"a"}', '{"amount_sum":10.0,"amount_count":3}', 1000, "2024-01-01", "v1"),
        ('{"user":"b"}', '{"amount_sum":5.0,"amount_count":1}', 2000, "2024-01-01", "v1"),
        ('{"user":"a"}', '{"amount_sum":12.5,"amount_last":2.5}', 3000, "2024-01-02", "v2"),
        ('{"user":"c"}', 'NOT JSON', 4000, "2024-01-02", "v2"),  # decode failure
        ('{"user":"d"}', '{"amount_sum":1.0}', 5000, "2024-01-02", None),  # no hash
        ('{"user":"e"}', '{"amount_sum":1.0}', 6000, "2024-01-02", "v9"),  # unknown
    ]
    return spark.createDataFrame(
        rows, "key_json string, value_json string, ts_millis long, ds string, schema_hash string"
    )


def test_flatten_union_schema_and_drops(spark):
    flat, stats = flatten_log_table(spark, _raw(spark), SCHEMAS)
    s = stats.first()
    assert (s["rows_in"], s["rows_decoded"], s["rows_dropped"]) == (6, 3, 3)
    cols = flat.columns
    assert cols[:3] == ["schema_hash", "ts_millis", "ds"]
    assert {"user", "amount_sum", "amount_count", "amount_last"} <= set(cols)
    rows = {(r["user"], r["schema_hash"]): r for r in flat.collect()}
    assert rows[("a", "v1")]["amount_count"] == 3
    assert rows[("a", "v1")]["amount_last"] is None  # v1 rows: v2-only field null
    assert rows[("a", "v2")]["amount_last"] == 2.5
    assert rows[("a", "v2")]["amount_count"] is None


def test_flatten_stats_single_pass(spark):
    """with_stats=True pays exactly ONE Spark job (a single aggregation
    over one scan of raw) — not the former raw.count() + flat.count()
    pair (r3 verdict #8)."""
    sc = spark.sparkContext
    raw = _raw(spark)
    # baseline: how many Spark jobs ONE aggregation action costs here
    # (AQE splits a single action into partial + final jobs)
    sc.setJobGroup("lf_stats_baseline", "single count action")
    raw.count()
    sc.setLocalProperty("spark.jobGroup.id", None)
    one_action = len(sc.statusTracker().getJobIdsForGroup("lf_stats_baseline"))
    sc.setJobGroup("lf_stats_one_pass", "stats job audit")
    try:
        _, stats = flatten_log_table(spark, raw, SCHEMAS)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    jobs = sc.statusTracker().getJobIdsForGroup("lf_stats_one_pass")
    assert len(jobs) <= one_action, (
        f"stats cost {len(jobs)} jobs, a single action costs {one_action}"
    )
    s = stats.first()
    assert (s["rows_in"], s["rows_decoded"], s["rows_dropped"]) == (6, 3, 3)


def test_log_flattener_job_resume(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.insert_partitions(_raw(spark).filter(F.col("ds").isNotNull()), "raw_logs")
    written = log_flattener_job(
        spark, wh, "raw_logs", "flat_logs", SCHEMAS, "2024-01-01", "2024-01-02"
    )
    assert written == ["2024-01-01", "2024-01-02"]
    assert wh.read("flat_logs").count() == 3
    # resume: already filled
    assert log_flattener_job(
        spark, wh, "raw_logs", "flat_logs", SCHEMAS, "2024-01-01", "2024-01-02"
    ) == []


def test_flattened_log_feeds_consistency(spark):
    """End-to-end OOC pipeline: raw log → flatten → consistency_job
    (the reference's LogFlattenerJob → ConsistencyJob chain)."""
    from chronon_spark.api.types import (
        Accuracy,
        Aggregation,
        EventSource,
        GroupBy,
        Join,
        JoinPart,
        Operation,
        Query,
    )
    from chronon_spark.operators.stats import consistency_job

    MS_H = 3_600_000
    T0 = 1_700_000_000_000
    ev = pd.DataFrame(
        {
            "user": [f"u{i % 3}" for i in range(60)],
            "ts": (T0 + np.arange(60) * MS_H).astype("int64"),
            "amount": np.arange(60).astype(float),
        }
    )
    spark.createDataFrame(ev).withColumn(
        "ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd")
    ).createOrReplaceTempView("lf_events")
    gb = GroupBy(
        name="lf_gb",
        sources=(EventSource(table="lf_events", query=Query(time_column="ts")),),
        key_columns=("user",),
        aggregations=(Aggregation("amount", Operation.SUM, windows=(None,)),),
        accuracy=Accuracy.TEMPORAL,
    )
    join = Join(name="lf_join", left=EventSource(table="unused"), right_parts=(JoinPart(gb),))

    # "serving log": true as-of sums for u0 at two query times, one wrong
    qt1, qt2 = T0 + 10 * MS_H, T0 + 20 * MS_H
    true1 = ev[(ev.user == "u0") & (ev.ts < qt1)]["amount"].sum()
    raw = spark.createDataFrame(
        [
            ('{"user":"u0"}', '{"lf_gb_amount_sum":%s}' % true1, qt1, "2023-11-15", "s1"),
            ('{"user":"u0"}', '{"lf_gb_amount_sum":999.0}', qt2, "2023-11-15", "s1"),
        ],
        "key_json string, value_json string, ts_millis long, ds string, schema_hash string",
    )
    flat, _ = flatten_log_table(spark, raw, {"s1": ("user string", "lf_gb_amount_sum double")})
    logged = flat.select("user", F.col("ts_millis").alias("ts"), "lf_gb_amount_sum")
    _, metrics = consistency_job(spark, join, logged)
    m = metrics.first()
    assert m["total"] == 2 and m["lf_gb_amount_sum_mismatch"] == 1
