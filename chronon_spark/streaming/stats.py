"""Streaming write metrics — the StreamingStats analogue
(spark/streaming/StreamingStats.scala:28-77).

The reference instruments the serving path: every KV PutRequest bumps
counters (writes, key/value bytes) and a KLL latency sketch, and a status
line is logged every ``publish_delay_seconds``. This offline engine has
no KV serving path (SURVEY §2.1), so the same contract instruments the
MICRO-BATCH sinks instead: each enriched/tiled batch contributes row
count, byte sizes of named payload columns, and event-time→processing
latency quantiles. Differences, documented:

- latencies aggregate JVM-side per batch (ONE ``percentile_approx`` +
  sums over the batch frame — no per-row Python), then merge driver-side
  as weighted samples (functions/aggregations equi-rank contract) instead
  of a KLL byte sketch (datasketches wheel unavailable — BENCH §limits);
- byte counts come from ``octet_length`` of the named columns, not
  serialized KV blobs (no serving codec exists here).

Usage::

    stats = StreamingStats(publish_delay_seconds=60)
    enrich_stream(spark, join, stream, stats.wrap(sink), checkpoint)
"""

from __future__ import annotations

import logging
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_log = logging.getLogger("chronon_spark.streaming")

_QUANTILES = (0.5, 0.95, 0.99)
# per-batch equi-rank sample grid — the mergeable latency IR (33 points
# ≈ the repo's quantile-sample contract; published percentiles read off
# the weighted merge of these)
_GRID = tuple(i / 32 for i in range(33))


class StreamingStats:
    def __init__(
        self,
        publish_delay_seconds: int = 60,
        ts_col: str = "ts",
        byte_cols: tuple[str, ...] = (),
        clock=time.time,
        publish=None,
    ):
        """``ts_col``: epoch-ms event-time column measured against the
        processing clock. ``byte_cols``: payload columns whose
        ``octet_length`` is totalled (the key/value-bytes analogue).
        ``clock``/``publish`` are injectable for tests."""
        self.publish_delay_seconds = publish_delay_seconds
        self.ts_col = ts_col
        self.byte_cols = tuple(byte_cols)
        self._clock = clock
        self._publish = publish or (lambda line: _log.info(line))
        self._reset()

    def _reset(self) -> None:
        self.writes_total = 0
        self.latency_ms_total = 0.0
        self.bytes_total = {c: 0 for c in self.byte_cols}
        # weighted latency samples: list of (sorted sample array, weight each)
        self._lat_samples: list[tuple[list, float]] = []
        self.start_s = self._clock()

    # ------------------------------------------------------------------ sink
    def wrap(self, sink):
        """Wrap a ``sink(batch_df, batch_id)`` so every micro-batch is
        measured before being handed on."""

        def wrapped(batch_df: DataFrame, batch_id: int):
            self.increment_batch(batch_df, batch_id)
            return sink(batch_df, batch_id)

        return wrapped

    def increment_batch(self, batch_df: DataFrame, batch_id: int = -1) -> None:
        """One JVM-side aggregate over the batch: count, latency sum +
        quantile samples vs the current clock, payload byte totals."""
        now_ms = self._clock() * 1000.0
        aggs = [F.count(F.lit(1)).alias("__n")]
        has_ts = self.ts_col in batch_df.columns
        if has_ts:
            lat = F.lit(float(now_ms)) - F.col(self.ts_col).cast("double")
            aggs.append(F.sum(lat).alias("__lat_sum"))
            qs = ", ".join(str(q) for q in _GRID)
            aggs.append(
                F.expr(
                    f"percentile_approx({float(now_ms)}D - CAST({self.ts_col} AS DOUBLE), "
                    f"array({qs}), 10000)"
                ).alias("__lat_q")
            )
        for c in self.byte_cols:
            if c in batch_df.columns:
                aggs.append(F.sum(F.octet_length(F.col(c).cast("string"))).alias(f"__b_{c}"))
        row = batch_df.agg(*aggs).first()
        n = int(row["__n"] or 0)
        if n == 0:
            return
        self.writes_total += n
        if has_ts and row["__lat_sum"] is not None:
            self.latency_ms_total += float(row["__lat_sum"])
            if row["__lat_q"] is not None:
                self._lat_samples.append(([float(x) for x in row["__lat_q"]], n / len(_GRID)))
        for c in self.byte_cols:
            v = row[f"__b_{c}"] if f"__b_{c}" in row.asDict() else None
            if v is not None:
                self.bytes_total[c] += int(v)
        if self._clock() - self.start_s > self.publish_delay_seconds:
            self.print_status()

    # ---------------------------------------------------------------- status
    def _latency_quantile(self, q: float) -> float | None:
        """Weighted quantile over the accumulated per-batch samples — the
        sketch-merge analogue of KllFloatsSketch.getQuantile."""
        pairs = [
            (v, w) for samples, w in self._lat_samples for v in samples
        ]
        if not pairs:
            return None
        pairs.sort()
        total = sum(w for _, w in pairs)
        cum = 0.0
        for v, w in pairs:
            cum += w
            if cum >= q * total:
                return v
        return pairs[-1][0]

    def print_status(self) -> None:
        """Log-and-reset, StreamingStats.printStatus contract: a no-write
        interval logs a placeholder; otherwise totals/averages/latency
        percentiles, then counters and the sketch reset."""
        if self.writes_total == 0:
            self._publish("No writes registered")
            return
        now = self._clock()
        avg_lat = self.latency_ms_total / self.writes_total
        p50, p95, p99 = (self._latency_quantile(q) for q in _QUANTILES)
        parts = [
            f"Wrote {self.writes_total} records in last {int((now - self.start_s) * 1000)} ms.",
            f"Latency ms: {avg_lat:.1f} (avg) / {p50} (median) / {p95} (p95) / {p99} (p99)",
        ]
        for c, b in self.bytes_total.items():
            parts.append(f"{c} size: {b // max(self.writes_total, 1)} bytes (avg) / {b} (total)")
        self._publish(" | ".join(parts))
        self._reset()
