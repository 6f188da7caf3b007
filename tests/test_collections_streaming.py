"""Map-column / vector / element-wise aggregation + streaming tiles."""

import time

import pytest
from pyspark.sql import functions as F

from chronon_spark.api.types import Aggregation, EventSource, GroupBy, Operation
from chronon_spark.operators.collections import (
    aggregate_elementwise,
    aggregate_map_column,
    aggregate_vector_column,
)
from chronon_spark.streaming.groupby import streaming_tiles


def test_map_column(spark):
    df = spark.createDataFrame(
        [
            ("u1", {"a": 1.0, "b": 2.0}),
            ("u1", {"a": 3.0}),
            ("u2", {"c": 5.0}),
        ],
        "user string, m map<string,double>",
    )
    out = {r["user"]: r["m_sum"] for r in aggregate_map_column(df, ["user"], "m", Operation.SUM).collect()}
    assert out["u1"] == {"a": 4.0, "b": 2.0}
    assert out["u2"] == {"c": 5.0}


def test_vector_column(spark):
    df = spark.createDataFrame(
        [("u1", [1.0, 2.0]), ("u1", [3.0]), ("u2", [])],
        "user string, v array<double>",
    )
    out = {r["user"]: r["v_average"] for r in aggregate_vector_column(df, ["user"], "v", Operation.AVERAGE).collect()}
    assert out["u1"] == 2.0
    assert out["u2"] is None


def test_elementwise(spark):
    df = spark.createDataFrame(
        [("u1", [1.0, 10.0]), ("u1", [3.0, 20.0])],
        "user string, v array<double>",
    )
    out = aggregate_elementwise(df, ["user"], "v", Operation.AVERAGE).collect()
    assert out[0]["v_average_elementwise"] == [2.0, 15.0]


def test_streaming_tiles(spark, tmp_path):
    """rate source → tiles; availableNow batch equivalence check."""
    gb = GroupBy(
        name="st",
        sources=(EventSource(table="stream"),),
        key_columns=("k",),
        aggregations=(
            Aggregation("v", Operation.SUM),
            Aggregation("v", Operation.COUNT),
            Aggregation("v", Operation.MAX),
        ),
    )
    # deterministic "stream": a static frame replayed through the
    # streaming engine via a file source
    src_dir = str(tmp_path / "stream_src")
    static = spark.range(0, 1000).select(
        F.pmod("id", F.lit(3)).cast("string").alias("k"),
        (F.lit(1_700_000_000_000) + F.col("id") * 60_000).alias("ts"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    static.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(static.schema).parquet(src_dir)
    tiles = streaming_tiles(gb, stream, hop="1 hour", watermark="0 seconds")
    # complete mode so the final (not-yet-watermarked) window also lands in
    # the memory sink; production uses append + watermark into a tile store
    q = (
        tiles.writeStream.format("memory")
        .queryName("tiles_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("tiles_out")
    # batch equivalence: same tiling computed in batch
    exp = (
        static.withColumn("__evt", F.timestamp_millis("ts"))
        .groupBy(F.window("__evt", "1 hour").alias("w"), "k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("c"), F.max("v").alias("m"))
        .select("k", F.col("w.start").alias("hop_start"), "s", "c", "m")
    )
    g = {(r["k"], r["hop_start"]): (r["__ir_v_sum"], r["__ir_v_count"], r["__ir_v_max"]) for r in got.collect()}
    e = {(r["k"], r["hop_start"]): (r["s"], r["c"], r["m"]) for r in exp.collect()}
    assert g == e and len(g) > 0


def test_streaming_rejects_nonalgebraic(spark):
    gb = GroupBy(
        name="bad",
        sources=(EventSource(table="s"),),
        key_columns=("k",),
        aggregations=(Aggregation("v", Operation.SUM, buckets=("k",)),),
    )
    with pytest.raises(ValueError, match="not streamable"):
        streaming_tiles(gb, spark.range(1).select(F.lit("a").alias("k"), F.lit(1).alias("ts"), F.lit(1.0).alias("v")))


def test_streaming_collection_tiles(spark, tmp_path):
    """Collection IRs stream in one stateful aggregation; counter lists
    fold to the batch kernel's value→count maps on read."""
    import pandas as pd

    from chronon_spark.api.types import Accuracy, Aggregation, EventSource, GroupBy, Operation, Window
    from chronon_spark.streaming.groupby import fold_counter_tiles

    src = str(tmp_path / "in")
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")
    ev = pd.DataFrame({
        "k": ["a"] * 6 + ["b"] * 3,
        "ts": [1_700_000_000_000 + i * 60_000 for i in range(6)]
        + [1_700_000_000_000 + i * 60_000 for i in range(3)],
        "v": [3.0, 1.0, 2.0, 5.0, 4.0, 6.0, 9.0, 7.0, 8.0],
        "c": ["x", "y", "x", "z", "y", "x", "q", "q", "r"],
    })
    spark.createDataFrame(ev).write.mode("overwrite").parquet(src)
    gb = GroupBy(
        name="st", sources=(EventSource(table="s"),), key_columns=("k",),
        aggregations=(
            Aggregation("v", Operation.TOP_K, arg_map={"k": 2}, windows=(Window(1),)),
            Aggregation("v", Operation.APPROX_PERCENTILE, arg_map={"percentiles": [0.5]}, windows=(Window(1),)),
            Aggregation("c", Operation.UNIQUE_COUNT, windows=(Window(1),)),
        ),
        accuracy=Accuracy.TEMPORAL,
    )
    stream = spark.readStream.schema("k string, ts long, v double, c string").parquet(src)
    tiles = streaming_tiles(gb, stream, hop="1 hour", watermark="0 seconds")
    # complete mode + memory sink so the final (not-yet-watermarked) window
    # lands; production appends into a tile store as watermarks advance
    q = (
        tiles.writeStream.format("memory")
        .queryName("coll_tiles_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = fold_counter_tiles(spark.table("coll_tiles_out"))
    rows = {r["k"]: r for r in got.collect()}
    assert list(rows["a"]["__t_v_topk"]) == [6.0, 5.0]
    # vals tile IR is now a (count, samples) quantile struct
    assert rows["a"]["__t_v_vals"]["n"] == 6
    assert list(rows["a"]["__t_v_vals"]["q"]) == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    assert dict(rows["a"]["__t_c_cnt"]) == {"x": 3, "y": 2, "z": 1}
    assert dict(rows["b"]["__t_c_cnt"]) == {"q": 2, "r": 1}
