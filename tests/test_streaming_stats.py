"""StreamingStats analogue (streaming/stats.py vs
spark/streaming/StreamingStats.scala): per-batch metrics accumulate,
latency quantiles come off the merged sample IR, publish resets, and the
wrapped sink passes batches through untouched."""

import pandas as pd
import pytest

from chronon_spark.streaming.stats import StreamingStats

T0 = 1_700_000_000_000


class FakeClock:
    def __init__(self, s):
        self.s = s

    def __call__(self):
        return self.s


def test_streaming_stats_accumulate_and_publish(spark):
    clock = FakeClock(T0 / 1000.0 + 10.0)  # 10s after every event ts
    lines = []
    stats = StreamingStats(
        publish_delay_seconds=3600,
        byte_cols=("payload",),
        clock=clock,
        publish=lines.append,
    )
    b1 = spark.createDataFrame(
        pd.DataFrame({"ts": [T0] * 4, "payload": ["aaaa", "bb", "c", "dddd"]})
    )
    b2 = spark.createDataFrame(pd.DataFrame({"ts": [T0 - 90_000] * 2, "payload": ["xx", "yy"]}))
    stats.increment_batch(b1, 0)
    stats.increment_batch(b2, 1)
    assert stats.writes_total == 6
    assert stats.bytes_total["payload"] == 11 + 4
    # latencies: 4×10_000ms + 2×100_000ms
    assert stats.latency_ms_total == pytest.approx(4 * 10_000 + 2 * 100_000)
    assert stats._latency_quantile(0.5) == pytest.approx(10_000, rel=0.01)
    assert stats._latency_quantile(0.99) == pytest.approx(100_000, rel=0.01)

    stats.print_status()
    assert len(lines) == 1 and "Wrote 6 records" in lines[0] and "p99" in lines[0]
    # reset after publish (printStatus contract)
    assert stats.writes_total == 0 and stats._lat_samples == []
    stats.print_status()
    assert lines[-1] == "No writes registered"


def test_streaming_stats_auto_publish_and_wrap(spark):
    clock = FakeClock(T0 / 1000.0)
    lines = []
    stats = StreamingStats(publish_delay_seconds=5, clock=clock, publish=lines.append)
    seen = []
    sink = stats.wrap(lambda df, bid: seen.append((bid, df.count())))
    b = spark.createDataFrame(pd.DataFrame({"ts": [T0 - 1000] * 3}))
    sink(b, 7)
    assert seen == [(7, 3)]  # pass-through untouched
    assert stats.writes_total == 3 and lines == []
    clock.s += 10  # past the publish delay → next batch triggers the log
    sink(b, 8)
    assert len(lines) == 1 and "Wrote 6 records" in lines[0]
    assert stats.writes_total == 0  # reset

    # empty batches are ignored entirely
    empty = spark.createDataFrame([], "ts long")
    stats.increment_batch(empty, 9)
    assert stats.writes_total == 0
