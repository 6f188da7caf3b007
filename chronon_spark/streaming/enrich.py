"""Micro-batch chained-join enrichment — JoinSourceRunner analogue.

The reference's JoinSourceRunner (spark/streaming/JoinSourceRunner.scala)
takes a GroupBy whose source is a JoinSource, and enriches the STREAM of
left events with the upstream join's features inside each micro-batch
before the tiled aggregation sees them. We re-express the same shape with
``foreachBatch``: each micro-batch frame becomes the join's left, the
right parts compute point-in-time features against the (batch) right
tables with the standard as-of kernel, and the enriched frame flows to
the caller's sink.

Per-batch cost mirrors the reference: right scans are pruned to the
micro-batch's key set (small-mode IN / semi join — the batch is small by
construction, so small mode almost always fires), and the enrichment is
exactly-once under the file/kafka source's checkpointed offsets because
``foreachBatch`` re-runs deterministically on replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.api.types import Join
from chronon_spark.operators.join import ROW_UID, coalesced_join, compute_join_part


def enrich_batch(spark: SparkSession, join: Join, left: DataFrame) -> DataFrame:
    """Enrich one (micro-)batch frame — the core of join_backfill minus
    warehouse/bootstrap/labels: per-part point-in-time features folded
    onto the given left frame 1:1."""
    if "ds" not in left.columns:
        left = left.withColumn(
            "ds", F.date_format(F.timestamp_millis(F.col("ts")), "yyyy-MM-dd")
        )
    b = left.agg(F.min("ds").alias("a"), F.max("ds").alias("b")).first()
    if b["a"] is None:
        return left
    # cache registered with the join module's release list: the returned
    # frame is lazy, so the runner/stream loop releases after materializing
    # (release_backfill_caches) — repeated micro-batches must not
    # accumulate dead cached frames
    from chronon_spark.operators.join import _ACTIVE_CACHES

    left = left.withColumn(ROW_UID, F.monotonically_increasing_id()).persist()
    _ACTIVE_CACHES.append(left)
    out = left
    for part in join.right_parts:
        feats, join_cols = compute_join_part(spark, left, part, b["a"], b["b"])
        out = coalesced_join(out, feats, join_cols, "left")
    return out.drop(ROW_UID)


def enrich_stream(
    spark: SparkSession,
    join: Join,
    stream: DataFrame,
    sink,
    checkpoint: str,
    trigger_once: bool = False,
):
    """Run the enrichment as a Structured Streaming query.

    ``sink(batch_df, batch_id)`` receives each ENRICHED micro-batch.
    Returns the StreamingQuery (caller awaits/stops)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        from chronon_spark.operators.join import release_backfill_caches

        try:
            sink(enrich_batch(spark, join, batch_df), batch_id)
        finally:
            # the sink has materialized the enriched frame — drop this
            # micro-batch's cached left before the next batch arrives
            release_backfill_caches()

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
