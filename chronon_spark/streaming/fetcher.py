"""Micro-batch point-fetch serving — the online Fetcher analogue.

The reference's Fetcher (online/src/main/scala/ai/chronon/online/
Fetcher.scala, FetcherBase.scala) answers (key, ts) requests by merging
the uploaded FinalBatchIr with the streamed head in memory. Its offline
twin here is ``operators/upload.fetch_features``; this module runs that
same merge over a STREAM of fetch requests with Structured Streaming:

- fetch requests (keys + epoch-millis ``ts``) arrive on any streaming
  source (files, rate, kafka via streaming/source.py);
- each micro-batch is answered with ONE cogrouped kernel pass against
  (a) the bounded per-key upload rows and (b) the streamed head read at
  batch time — pass ``head`` as a zero-arg callable to re-read a
  growing table (file-backed heads pick up newly landed events on each
  batch, the lambda contract);
- ``sink(batch_df, batch_id)`` receives the served batch; offsets are
  checkpointed, and since the upload frame and the head read are
  deterministic for a given batch, replays re-serve identical answers
  (the same exactly-once argument as streaming/enrich.py).

Per-batch cost is the fetch kernel's: one shuffle of (batch queries ∪
head) against the bounded state — no history scan, so a serving batch's
latency does not grow with history length (BENCH §32).
"""

from __future__ import annotations

from typing import Callable, Union

from pyspark.sql import DataFrame, SparkSession

from chronon_spark.api.types import GroupBy
from chronon_spark.operators.upload import fetch_features


def fetch_stream(
    spark: SparkSession,
    gb: GroupBy,
    uploaded: DataFrame,
    head: Union[DataFrame, Callable[[], DataFrame]],
    queries: DataFrame,
    sink,
    checkpoint: str,
    end_ds: str,
    trigger_once: bool = False,
):
    """Serve a streaming frame of fetch requests from the
    ``group_by_upload`` artifact plus the streamed head.

    ``queries``: streaming DataFrame with the GroupBy's key columns and
    epoch-millis ``ts`` (extra columns pass through, same contract as
    ``fetch_features``). Returns the StreamingQuery (caller awaits)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        h = head() if callable(head) else head
        sink(
            fetch_features(spark, gb, uploaded, h, batch_df, end_ds),
            batch_id,
        )

    writer = queries.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
