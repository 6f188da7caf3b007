"""Streaming GroupBy ingestion — tiled pre-aggregation.

The reference streams raw events into a KV store and merges them with a
batch IR at fetch time (spark/streaming/GroupBy.scala, lambda merge in
windowing/SawtoothOnlineAggregator.scala:83-126); its newer design
pre-aggregates "tiles" per (key, hop) (docs/source/Tiled_Architecture.md).

We take the tiled shape directly on Structured Streaming: watermarked
tumbling windows at the hop resolution produce per-(key, hop) partial IRs
— the exact same IR columns the batch snapshot path merges — so a lambda
reader can union batch tiles + streaming tiles and finalize with the same
expressions.

Only algebraic ops stream (COUNT/SUM/MIN/MAX/AVERAGE + moments):
Structured Streaming state stores scalar/struct aggregates; sketch/list
IRs would need applyInPandasWithState (future work, documented)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chronon_spark.api.types import GroupBy, Operation
from chronon_spark.functions.aggregations import spec_for

STREAMABLE = {
    Operation.COUNT,
    Operation.SUM,
    Operation.MIN,
    Operation.MAX,
    Operation.AVERAGE,
    Operation.VARIANCE,
    Operation.SKEW,
    Operation.KURTOSIS,
}


def streaming_tiles(
    gb: GroupBy,
    stream: DataFrame,
    hop: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """stream (epoch-millis ``ts``) → watermarked per-(key, hop) IR tiles.

    Returns a streaming DataFrame: keys..., hop_start (timestamp),
    __ir_* partial-aggregate columns (same exprs as the batch daily IRs),
    ready for ``writeStream`` into the tile store.
    """
    parts = [p for p in gb.unpacked() if p.bucket is None]
    unsupported = [p for p in parts if p.operation not in STREAMABLE]
    if unsupported:
        raise ValueError(
            f"non-algebraic ops not streamable yet: {[p.output_column for p in unsupported]}"
        )
    keys = list(gb.key_columns)
    evt = stream.withColumn("__evt", F.timestamp_millis(F.col(ts_col))).withWatermark(
        "__evt", watermark
    )
    aggs = [
        spec_for(p.operation).ir(p.input_column, p).alias(f"__ir_{p.output_column}")
        for p in parts
    ]
    tiled = evt.groupBy(F.window("__evt", hop).alias("__w"), *keys).agg(*aggs)
    return tiled.select(
        *keys, F.col("__w.start").alias("hop_start"), *[f"__ir_{p.output_column}" for p in parts]
    )
