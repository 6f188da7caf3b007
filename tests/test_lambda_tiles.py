"""Lambda tiles: streamed micro-batch tiles union with batch TileStore
history and feed the tiled kernel unchanged — batch history + streamed
today, one kernel, one answer."""

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
    Operation,
    Window,
)
from chronon_spark.operators.tiled import temporal_events_tiled
from chronon_spark.operators.tilestore import TileStore
from chronon_spark.sources.warehouse import Warehouse
from chronon_spark.streaming.lambda_tiles import (
    complete_tile_frame,
    streaming_tile_frame,
)

MS_DAY = 86_400_000
T0 = 1_700_006_400_000  # 2023-11-15 00:00 UTC

GB = GroupBy(
    name="lam_gb",
    sources=(EventSource(table="x"),),
    key_columns=("user",),
    aggregations=(
        Aggregation("v", Operation.SUM, windows=(Window(5), None)),
        Aggregation("v", Operation.TOP_K, arg_map={"k": 3}, windows=(Window(5),)),
        Aggregation("c", Operation.HISTOGRAM, windows=(Window(5),)),
        Aggregation("c", Operation.APPROX_UNIQUE_COUNT, windows=(None,)),
    ),
    accuracy=Accuracy.TEMPORAL,
)

SCHEMA = T.StructType(
    [
        T.StructField("user", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("c", T.StringType()),
    ]
)


def test_lambda_union_equals_direct(spark, tmp_path):
    rng = np.random.default_rng(13)
    n_hist, n_live = 500, 150
    hist = pd.DataFrame(
        {
            "user": [f"u{i}" for i in rng.integers(0, 4, n_hist)],
            "ts": (T0 + rng.integers(0, 10 * MS_DAY, n_hist)).astype(np.int64),
            "v": rng.integers(1, 40, n_hist).astype(float),
            "c": rng.choice(list("abc"), n_hist),
        }
    )
    live = pd.DataFrame(
        {
            "user": [f"u{i}" for i in rng.integers(0, 4, n_live)],
            "ts": (T0 + 10 * MS_DAY + rng.integers(0, 2 * MS_DAY, n_live)).astype(
                np.int64
            ),
            "v": rng.integers(1, 40, n_live).astype(float),
            "c": rng.choice(list("abc"), n_live),
        }
    )
    hist_df = spark.createDataFrame(hist, schema=SCHEMA)
    all_df = spark.createDataFrame(
        pd.concat([hist, live], ignore_index=True), schema=SCHEMA
    )

    # batch history tiles
    wh = Warehouse(spark, str(tmp_path / "wh"))
    store = TileStore(wh, GB)
    store.materialize(spark, hist_df, "2023-11-15", "2023-11-24")

    # streamed live tiles (file source, availableNow; complete mode so the
    # final non-watermarked windows land in the memory sink — production
    # appends as watermarks close tiles)
    src = tmp_path / "stream_in"
    spark.createDataFrame(live, schema=SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src))
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    tiles_s = streaming_tile_frame(GB, stream, watermark="0 seconds")
    q = (
        tiles_s.writeStream.format("memory")
        .queryName("lam_tiles")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = complete_tile_frame(GB, spark.table("lam_tiles"))

    union_tiles = store.read("2023-11-15", "2023-11-24").unionByName(
        streamed, allowMissingColumns=True
    )

    # queries over the live window (reaching back into batch history)
    q_df = spark.createDataFrame(
        pd.DataFrame(
            {
                "user": [f"u{i % 4}" for i in range(60)],
                "ts": (T0 + 10 * MS_DAY + np.arange(60) * 1_800_000).astype(np.int64),
            }
        )
    )
    direct = temporal_events_tiled(spark, GB, q_df, all_df)
    lam = temporal_events_tiled(spark, GB, q_df, all_df, tiles_override=union_tiles)

    def norm(rows):
        out = []
        for r in sorted(rows, key=lambda r: (r["user"], r["ts"])):
            d = r.asDict()
            for k, val in d.items():
                if isinstance(val, dict):
                    d[k] = tuple(sorted(val.items()))
                elif isinstance(val, list):
                    d[k] = tuple(val)
            out.append(tuple(d.items()))
        return out

    assert norm(direct.collect()) == norm(lam.collect())


def test_streaming_tile_frame_validation(spark, tmp_path):
    spark.createDataFrame([], schema=SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "empty")
    )
    stream = spark.readStream.schema(SCHEMA).parquet(str(tmp_path / "empty"))
    gb_bad = GroupBy(
        name="lam_bad",
        sources=(EventSource(table="x"),),
        key_columns=("user",),
        aggregations=(
            Aggregation("v", Operation.SUM, windows=(Window(2),), buckets=("c",)),
        ),
        accuracy=Accuracy.TEMPORAL,
    )
    with pytest.raises(ValueError, match="bucketed"):
        streaming_tile_frame(gb_bad, stream)


def test_append_mode_watermark_closes_tiles(spark, tmp_path):
    """Append-mode production shape: watermark-closed windows emit
    exactly once as COMPLETE tiles; rows later than the watermark are
    dropped (the documented late-data contract — refresh via the
    TileStore invalidation hook, same as batch)."""
    import time

    MS5 = 5 * 60_000
    base = (T0 // MS5) * MS5
    gb = GroupBy(
        name="lam_wm",
        sources=(EventSource(table="x"),),
        key_columns=("user",),
        aggregations=(Aggregation("v", Operation.SUM, windows=(Window(1),)),),
        accuracy=Accuracy.TEMPORAL,
    )
    src = tmp_path / "wm_in"
    src.mkdir()
    # batch 1: two tiles' worth of events + a high-watermark row far ahead
    b1 = pd.DataFrame(
        {
            "user": ["a", "a", "a", "a"],
            "ts": [base + 10, base + 20, base + MS5 + 10, base + 10 * MS5],
            "v": [1.0, 2.0, 4.0, 8.0],
            "c": ["x"] * 4,
        }
    )
    spark.createDataFrame(b1, schema=SCHEMA).coalesce(1).write.parquet(
        str(src / "b1"), mode="overwrite"
    )
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(
        str(src / "*")
    )
    tiles = streaming_tile_frame(gb, stream, watermark="0 seconds")
    q = (
        tiles.writeStream.format("memory")
        .queryName("lam_wm_tiles")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["ts"]: r for r in spark.table("lam_wm_tiles").collect()}
    # watermark advanced to base+10*MS5: the first two tiles are CLOSED and
    # emitted with complete sums; the watermark-carrier tile is still open
    assert got[base]["__t_v_s1"] == 3.0
    assert got[base + MS5]["__t_v_s1"] == 4.0
    assert base + 10 * MS5 not in got  # open window not emitted in append mode
