"""Streaming exact dedup — the lambda half of corpus deduplication.

Batch ``operators/dedup.exact_dedup`` owns history; a live ingest
stream needs (a) dedup WITHIN the stream without unbounded state and
(b) dedup AGAINST the already-curated history. Both compose here:

- ``stream_exact_dedup``: fingerprint (same normalization as the batch
  operator, so the two layers agree on identity) +
  ``dropDuplicatesWithinWatermark`` — state is bounded by the
  watermark horizon, the exactly-once guarantee rides the source's
  checkpointed offsets. A duplicate arriving AFTER the horizon is the
  batch layer's job, same contract as the engine's lambda tiles.
- ``dedup_against_history``: stream-static left-anti join on the
  fingerprint column; the static side is the batch keeper table and
  re-resolves per micro-batch, so a nightly batch refresh is picked up
  without restarting the query.

100 TB shape: state per in-flight fingerprint is one 32-char key, no
document text; the anti-join probes the static side with the stream's
(small) per-batch key set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def text_fingerprint(text_col: str = "text") -> Column:
    """md5 of whitespace-normalized lowercased text — MUST match
    operators/dedup.exact_dedup's identity so batch and stream layers
    dedup the same thing."""
    return F.md5(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "))


def stream_exact_dedup(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """First-seen doc per fingerprint within the watermark horizon."""
    s = stream.withColumn(fp_col, text_fingerprint(text_col)).withColumn(
        "__event_time", F.timestamp_millis(F.col(ts_col))
    )
    return (
        s.withWatermark("__event_time", watermark)
        .dropDuplicatesWithinWatermark([fp_col])
        .drop("__event_time")
    )


def dedup_against_history(
    stream: DataFrame,
    history: DataFrame,
    text_col: str = "text",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Drop stream docs whose fingerprint already exists in the (static)
    history keeper table. ``history`` may carry either a precomputed
    ``fp_col`` or raw text."""
    if fp_col not in stream.columns:
        stream = stream.withColumn(fp_col, text_fingerprint(text_col))
    if fp_col not in history.columns:
        history = history.withColumn(fp_col, text_fingerprint(text_col))
    return stream.join(history.select(fp_col), fp_col, "left_anti")
