"""Streaming source plumbing + micro-batch join enrichment: file-stream
stand-in (kafka is availability-guarded like Iceberg), batch equivalence
against join_backfill's part computation."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chronon_spark.api.types import (
    Accuracy,
    Aggregation,
    EventSource,
    GroupBy,
    Join,
    JoinPart,
    Operation,
    Query,
    Window,
)
from chronon_spark.streaming.enrich import enrich_batch, enrich_stream
from chronon_spark.streaming.source import read_stream

MS_DAY = 86_400_000
T0 = 1_700_000_000_000

SCHEMA = T.StructType(
    [
        T.StructField("user", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    rng = np.random.default_rng(19)
    n = 400
    ev = pd.DataFrame(
        {
            "user": [f"u{i}" for i in rng.integers(0, 5, n)],
            "ts": (T0 + rng.integers(0, 5 * MS_DAY, n)).astype(np.int64),
            "amount": rng.integers(1, 50, n).astype(float),
        }
    )
    ev_df = spark.createDataFrame(ev, schema=SCHEMA).withColumn(
        "ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd")
    )
    ev_df.createOrReplaceTempView("se_right")
    gb = GroupBy(
        name="se_gb",
        sources=(EventSource(table="se_right", query=Query(time_column="ts")),),
        key_columns=("user",),
        aggregations=(
            Aggregation("amount", Operation.SUM, windows=(Window(2), None)),
            Aggregation("amount", Operation.LAST, windows=(None,)),
        ),
        accuracy=Accuracy.TEMPORAL,
    )
    join = Join(name="se_join", left=EventSource(table="unused"), right_parts=(JoinPart(gb),))

    # the "stream": later events arriving as files
    stream_rows = pd.DataFrame(
        {
            "user": [f"u{i % 5}" for i in range(40)],
            "ts": (T0 + 5 * MS_DAY + np.arange(40) * 3_600_000).astype(np.int64),
            "amount": np.arange(40).astype(float),
        }
    )
    d = tmp_path_factory.mktemp("stream_src")
    spark.createDataFrame(stream_rows, schema=SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "in"))
    return join, stream_rows, str(d)


def test_read_stream_schemes(spark, setup):
    join, stream_rows, d = setup
    s = read_stream(spark, f"files://{d}/in", SCHEMA)
    assert s.isStreaming and [f.name for f in s.schema.fields] == ["user", "ts", "amount"]
    r = read_stream(spark, "rate://?rowsPerSecond=5")
    assert r.isStreaming
    with pytest.raises(ValueError, match="explicit payload schema"):
        read_stream(spark, "kafka://broker:9092/t")
    with pytest.raises(ValueError, match="unknown stream scheme"):
        read_stream(spark, "nope://x")


def test_enrich_stream_batch_equivalence(spark, setup):
    """foreachBatch enrichment over the file stream produces EXACTLY the
    frame enrich_batch computes on the same rows in one batch — the
    JoinSourceRunner contract (stream vs batch parity)."""
    join, stream_rows, d = setup
    stream = read_stream(spark, f"files://{d}/in", SCHEMA)
    got_batches = []

    def sink(bdf, bid):
        got_batches.append(bdf.collect())

    q = enrich_stream(spark, join, stream, sink, checkpoint=f"{d}/ckpt", trigger_once=True)
    q.awaitTermination(120)
    assert got_batches, "no micro-batch delivered"
    streamed = sorted((tuple(r) for b in got_batches for r in b), key=repr)

    batch = enrich_batch(
        spark,
        join,
        spark.createDataFrame(stream_rows, schema=SCHEMA),
    )
    cols = [f.name for f in batch.schema.fields]
    expected = sorted((tuple(r) for r in batch.collect()), key=repr)
    assert len(streamed) == len(stream_rows)
    assert streamed == expected
    # spot-check a value against the naive as-of sum
    out = {(r[0], r[1]): r for r in expected}
    _, rows, _ = setup[0], setup[1], setup[2]
    sum_col = cols.index("se_gb_amount_sum")
    r_right = spark.table("se_right").toPandas()
    u, t = rows.iloc[10]["user"], int(rows.iloc[10]["ts"])
    exp = r_right[(r_right.user == u) & (r_right.ts < t)]["amount"].sum()
    got = out[(u, t)][sum_col]
    assert got == exp or (exp == 0 and got is None)
