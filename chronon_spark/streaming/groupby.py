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

Streamable ops: the algebraic family (COUNT/SUM/MIN/MAX/AVERAGE +
moments) as scalar/struct IRs, plus the collection family in ONE
stateful aggregation (Structured Streaming forbids chained stateful
aggs): FIRST_K/LAST_K/TOP_K/BOTTOM_K as per-tile k-capped arrays,
APPROX_PERCENTILE as per-tile sorted value arrays, and the counter ops
(UNIQUE/HISTOGRAM/...) as per-tile VALUE LISTS folded into value→count
maps by ``fold_counter_tiles`` on the batch/read side — after which the
columns match the batch tiled kernel's stat columns exactly."""

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
    Operation.FIRST,
    Operation.LAST,
}

_COLLECTION_STREAMABLE = {
    Operation.FIRST_K,
    Operation.LAST_K,
    Operation.TOP_K,
    Operation.BOTTOM_K,
    Operation.APPROX_PERCENTILE,
    Operation.UNIQUE_COUNT,
    Operation.BOUNDED_UNIQUE_COUNT,
    # APPROX_UNIQUE_COUNT needs the two-stage HLL register rollup —
    # a second stateful aggregation Structured Streaming forbids; stream
    # UNIQUE_COUNT value lists instead or fold on the batch side
    Operation.HISTOGRAM,
    Operation.APPROX_HISTOGRAM_K,
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
    bucketed = [p for p in gb.unpacked() if p.bucket is not None]
    if bucketed:
        raise ValueError(
            f"bucketed aggregations not streamable: {[p.output_column for p in bucketed]}"
        )
    parts = gb.unpacked()
    unsupported = [
        p for p in parts if p.operation not in (STREAMABLE | _COLLECTION_STREAMABLE)
    ]
    if unsupported:
        raise ValueError(
            f"ops not streamable: {[p.output_column for p in unsupported]}"
        )
    keys = list(gb.key_columns)
    evt = stream.withColumn("__evt", F.timestamp_millis(F.col(ts_col))).withWatermark(
        "__evt", watermark
    )
    from chronon_spark.operators.tiled import _coll_expr, _needed_coll, _stat_col

    aggs = []
    ir_cols = []
    for p in parts:
        if p.operation in STREAMABLE:
            c = f"__ir_{p.output_column}"
            aggs.append(spec_for(p.operation).ir(p.input_column, p).alias(c))
            ir_cols.append(c)
    coll = _needed_coll(gb)
    for col, kinds in coll.items():
        for kind, k in sorted(kinds.items()):
            c = _stat_col(col, kind)
            if kind == "cnt":
                # chained stateful aggs are forbidden: stream the tile's
                # raw value list; fold_counter_tiles builds the map later
                aggs.append(
                    F.expr(f"collect_list({col})").alias(f"{c}_list")
                )
                ir_cols.append(f"{c}_list")
            else:
                aggs.append(F.expr(_coll_expr(col, kind, k)).alias(c))
                ir_cols.append(c)
    tiled = evt.groupBy(F.window("__evt", hop).alias("__w"), *keys).agg(*aggs)
    return tiled.select(*keys, F.col("__w.start").alias("hop_start"), *ir_cols)


def fold_counter_tiles(tiles: DataFrame) -> DataFrame:
    """Batch/read-side fold: convert streamed ``__t_{c}_cnt_list`` value
    lists into the value→count maps the batch tiled kernel consumes
    (one bounded tile's worth of values per row — no shuffle). Sorted
    run-length pass, same as the batch histogram IR (O(n log n) per tile,
    not O(distinct × n))."""
    from chronon_spark.functions.aggregations import _rle_count_entries

    out = tiles
    for c in tiles.columns:
        if not c.endswith("_cnt_list"):
            continue
        target = c[: -len("_list")]
        entries = _rle_count_entries(f"sort_array({c})")
        out = out.withColumn(
            target,
            F.expr(f"CASE WHEN size({c}) > 0 THEN map_from_entries({entries}) END"),
        ).drop(c)
    return out
