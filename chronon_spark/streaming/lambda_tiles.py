"""Lambda tiles — streamed micro-batches land in the SAME tile frame the
batch kernel consumes.

The reference's lambda architecture merges uploaded batch IRs with
streamed events at fetch time (windowing/SawtoothOnlineAggregator.scala:
83-126); its tiled redesign pre-aggregates per-(key, hop) tiles on the
stream (docs/source/Tiled_Architecture.md). This module completes that
story OFFLINE: `streaming_tile_frame` emits tiles column-compatible with
`build_tile_frame` (operators/tiled.py), and `complete_tile_frame`
finishes the two kinds Structured Streaming cannot chain (value→count
maps, HLL registers) inside the (batch-context) sink — after which
streamed tiles union with TileStore history and feed the tiled kernel
via ``tiles_override`` unchanged. Batch history + streamed today,
one kernel, one answer; equivalence is test-enforced.

Streaming constraints honored: ONE stateful aggregation (counter/HLL
kinds leave the tile as a raw value list, finished in the sink), hop
pinned to the kernel's 5-minute tile, append-mode-compatible
(watermark-closed windows are complete tiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chronon_spark.api.types import GroupBy, Operation
from chronon_spark.functions.sketches import _W_BITS
from chronon_spark.operators.tiled import (
    TILE_MS,
    _coll_expr,
    _needed_coll,
    _needed_stats,
    _stat_col,
    _stat_expr,
)
from chronon_spark.sources.scan import TS_COL
from chronon_spark.streaming.groupby import STREAMABLE, _COLLECTION_STREAMABLE

_LAMBDA_STREAMABLE = (
    STREAMABLE | _COLLECTION_STREAMABLE | {Operation.APPROX_UNIQUE_COUNT}
)


def streaming_tile_frame(
    gb: GroupBy,
    stream: DataFrame,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked per-(key, 5-min) tiles with the BATCH tile frame's
    columns. cnt/hll kinds emit ``{col}_list`` value lists (a second
    stateful agg is forbidden); run `complete_tile_frame` on each sunk
    micro-batch to finish them."""
    from chronon_spark.operators.temporal import _INTEGRAL

    keys = list(gb.key_columns)
    bucketed = [p.output_column for p in gb.unpacked() if p.bucket is not None]
    if bucketed:
        raise ValueError(f"bucketed aggregations not streamable: {bucketed}")
    bad = [
        p.output_column
        for p in gb.unpacked()
        if p.operation not in _LAMBDA_STREAMABLE
    ]
    if bad:
        raise ValueError(f"ops not streamable: {bad}")

    evt = stream.withColumn("__evt", F.timestamp_millis(F.col(ts_col))).withWatermark(
        "__evt", watermark
    )
    if ts_col != TS_COL:
        evt = evt.withColumn(TS_COL, F.col(ts_col))

    aggs = []
    for c, stats in _needed_stats(gb).items():
        integral = isinstance(stream.schema[c].dataType, _INTEGRAL)
        for s in sorted(stats):
            aggs.append(F.expr(_stat_expr(c, s, integral)).alias(_stat_col(c, s)))
    for col, kinds in _needed_coll(gb).items():
        for kind, k in sorted(kinds.items()):
            c = _stat_col(col, kind)
            if kind in ("cnt", "hll"):
                aggs.append(F.expr(f"collect_list({col})").alias(f"{c}_list"))
            else:
                aggs.append(F.expr(_coll_expr(col, kind, k)).alias(c))
    tiled = evt.groupBy(
        F.window("__evt", f"{TILE_MS // 60000} minutes").alias("__w"), *keys
    ).agg(*aggs)
    return tiled.select(
        *keys,
        F.unix_millis(F.col("__w.start")).alias(TS_COL),
        *[a for a in tiled.columns if a.startswith("__t_")],
    )


def _hll_map_from_list(lst: str) -> str:
    """Register map idx→max(rho) from one tile's value list, pure SQL:
    (idx, rho) entries sorted ascending by (idx, rho); the LAST entry of
    each idx-run carries the max rho."""
    h = "xxhash64(__v)"
    w = f"({h} & {(1 << _W_BITS) - 1})"
    idx = f"CAST(shiftrightunsigned({h}, {_W_BITS}) AS INT)"
    rho = (
        f"CAST(CASE WHEN {w} = 0 THEN {_W_BITS + 1} "
        f"ELSE {_W_BITS + 1} - length(bin({w})) END AS INT)"
    )
    entries = (
        f"array_sort(transform(filter({lst}, __v -> __v IS NOT NULL), "
        f"__v -> named_struct('key', {idx}, 'value', {rho})))"
    )
    kept = (
        "filter(transform(__es, (e, i) -> CASE WHEN i = size(__es) - 1 "
        "OR e.key != element_at(__es, i + 2).key THEN e END), x -> x IS NOT NULL)"
    )
    from chronon_spark.functions.aggregations import _let_sql

    return _let_sql(
        entries,
        "__es",
        f"CASE WHEN size(__es) > 0 THEN map_from_entries({kept}) END",
    )


def complete_tile_frame(gb: GroupBy, tiles_batch: DataFrame) -> DataFrame:
    """Finish a sunk micro-batch of streamed tiles into the exact
    build_tile_frame schema: fold cnt value lists into value→count maps
    and hll value lists into register maps (batch context — chaining is
    legal here). Row-local expressions only, no shuffle."""
    from chronon_spark.streaming.groupby import fold_counter_tiles

    out = fold_counter_tiles(tiles_batch)
    for c in list(out.columns):
        if c.endswith("_hll_list"):
            target = c[: -len("_list")]
            out = out.withColumn(target, F.expr(_hll_map_from_list(c))).drop(c)
    return out
