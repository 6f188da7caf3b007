"""Operational pipeline example — the round-4 features composed:

1. flagship backfill with crawl-storm (hot-url) mitigation enabled
   (``backfill_features(hot_key_threshold=...)`` — temporal.py raw-kernel
   time slicing; unbounded COUNT/LAST parts ride baseline IRs),
2. incremental data-quality summaries of the output
   (``summary_job`` — only UNFILLED days recompute on a daily re-run,
   bounded-memory GK percentiles by default),
3. a monitored streaming enrichment: each micro-batch is measured by the
   ``StreamingStats`` analogue (rows, payload bytes, event-time latency
   percentiles) before reaching the sink.

Run standalone:

    python tools/make_dist.py
    spark-submit --py-files dist/engine.zip examples/ops_pipeline.py
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def run_example(spark: SparkSession, warehouse_root: str) -> dict:
    from chronon_spark.fixtures.webtext import generate_webtext
    from chronon_spark.operators.stats import summary_job
    from chronon_spark.pipelines.webtext import backfill_features
    from chronon_spark.sources.warehouse import Warehouse
    from chronon_spark.streaming.stats import StreamingStats

    wh = Warehouse(spark, warehouse_root)

    # 1. backfill with skew mitigation: any url owning >2000 of the query
    #    rows gets time-sliced across tasks instead of serializing one task
    pages = generate_webtext(spark, n_rows=8_000, n_urls=120, days=30)
    feats = backfill_features(spark, pages, hot_key_threshold=2_000)
    wh.insert_partitions(feats.drop("text"), "url_features_slim")

    # 2. incremental summaries: first call fills every day; a daily cron
    #    re-run summarizes only the new day (unfilled-partition walk)
    written = summary_job(spark, wh, "url_features_slim", "url_features_summary")
    rerun = summary_job(spark, wh, "url_features_slim", "url_features_summary")

    # 3. monitored (micro-)batch enrichment: wrap any sink with the stats
    #    collector; here one batch stands in for the stream
    lines: list[str] = []
    stats = StreamingStats(
        publish_delay_seconds=3600, byte_cols=("lang",), publish=lines.append
    )
    sink = stats.wrap(lambda df, bid: df.count())
    sink(feats.select("url", "ts", "lang").limit(500), 0)
    stats.print_status()

    return {
        "feature_rows": wh.read("url_features_slim").count(),
        "summary_days_first_run": len(written),
        "summary_days_rerun": len(rerun),  # 0 — resume contract
        "stream_status": lines[-1] if lines else None,
    }


if __name__ == "__main__":
    import tempfile

    from chronon_spark.session import build_session

    spark = build_session(app_name="ops-pipeline-example")
    out = run_example(spark, tempfile.mkdtemp(prefix="ops_example_wh_"))
    print(out)
    spark.stop()
