"""Streaming sessionization: session_window aggregation + the custom
applyInPandasWithState stateful operator, checked against the batch
sessionizer."""

import pytest
from pyspark.sql import functions as F

from chronon_spark.operators.features import session_stats
from chronon_spark.streaming.sessionize import session_window_agg, stateful_sessionize

GAP = 1_800_000  # 30 min


@pytest.fixture(scope="module")
def events(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("stream") / "events")
    df = spark.range(0, 2_000).select(
        F.concat(F.lit("k"), (F.col("id") % 5).cast("string")).alias("k"),
        # per key: bursts of 20 events 5 min apart, then a >30min gap
        (
            F.lit(1_700_000_000_000)
            + (F.col("id") / 100).cast("long") * 14_400_000
            + (F.col("id") % 100) * 60_000
        ).alias("ts"),
    )
    df.write.mode("overwrite").parquet(src)
    return src, df


def test_session_window_agg(spark, events):
    src, df = events
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = session_window_agg(stream, ["k"], "ts", gap="30 minutes", watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("sw_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], r["session_start"]): r["session_events"]
        for r in spark.table("sw_out").collect()
    }
    exp = {
        (r["k"], r["session_start"]): r["session_events"]
        for r in session_stats(df, ["k"], "ts", GAP).collect()
    }
    # session_window end = last_event + gap; starts and counts must agree
    assert got == exp and len(got) > 0


def test_stateful_sessionize(spark, events):
    src, df = events
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = stateful_sessionize(stream, "k", "ts", gap_ms=GAP)
    q = (
        out.writeStream.format("memory")
        .queryName("ss_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["key"], r["session_start"]): (r["session_end"], r["session_events"])
        for r in spark.table("ss_out").collect()
    }
    exp = {
        (r["k"], r["session_start"]): (r["session_end"], r["session_events"])
        for r in session_stats(df, ["k"], "ts", GAP).collect()
    }
    # the final open session per key stays in state (no timeout fired in
    # availableNow mode) — every emitted session must match batch exactly
    assert len(got) > 0
    for k, v in got.items():
        assert exp[k] == v, (k, v, exp[k])
    # all but the last session per key must have been emitted
    last_starts = {}
    for (k, s) in exp:
        last_starts[k] = max(last_starts.get(k, -1), s)
    missing = [k2 for k2 in exp if k2 not in got]
    assert all(s == last_starts[k] for k, s in missing)
