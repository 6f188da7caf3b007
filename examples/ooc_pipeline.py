"""Example: the online-offline-consistency pipeline, end to end.

A serving stack logs raw fetcher responses (key/value payloads tagged
with a schema hash). The offline side flattens those logs, recomputes
the same features point-in-time, and reports per-feature consistency —
the LogFlattenerJob → ConsistencyJob chain:

    # 1. flatten raw response logs into the union-schema offline table
    python jobs/stats.py consistency is driven from python; the flatten
    step and a runnable walkthrough live in `run_example(spark)` below.

Run it against the deterministic webtext fixture:

    python -c "
    from chronon_spark.session import build_session
    from examples.ooc_pipeline import run_example
    print(run_example(build_session(app_name='ooc_example')))"
"""

from pyspark.sql import functions as F

from chronon_spark.api.types import (
    Accuracy,
    Aggregation,
    EventSource,
    GroupBy,
    Join,
    JoinPart,
    Operation,
    Query,
    Window,
)

# same GroupBy the serving side would back
url_counts = GroupBy(
    name="ooc_url_counts",
    sources=(
        EventSource(
            table="pages",
            query=Query(
                selects={"url": None, "text_len": "length(text)"},
                time_column="unix_millis(cast(warc_ts as timestamp))",
            ),
        ),
    ),
    key_columns=("url",),
    aggregations=(
        Aggregation("text_len", Operation.COUNT, windows=(Window(7),)),
        Aggregation("text_len", Operation.AVERAGE, windows=(Window(7),)),
    ),
    accuracy=Accuracy.TEMPORAL,
)

ooc_join = Join(
    name="ooc_join",
    left=EventSource(table="unused"),
    right_parts=(JoinPart(url_counts),),
)

# the serving log's schema registry: schema_hash → (key ddl, value ddl)
LOG_SCHEMAS = {
    "v1": (
        "url string",
        "ooc_url_counts_text_len_count_7d bigint, "
        "ooc_url_counts_text_len_average_7d double",
    ),
}


def run_example(spark):
    """Generate fixture pages, fake a serving log (true values + one
    corrupted row), flatten it, and run the consistency job. Returns the
    one-row metrics dict."""
    from chronon_spark.fixtures.webtext import generate_webtext
    from chronon_spark.operators.logflatten import flatten_log_table
    from chronon_spark.operators.stats import consistency_job
    from chronon_spark.streaming.enrich import enrich_batch

    pages = generate_webtext(spark, n_rows=4_000, n_urls=100, days=30)
    pages.createOrReplaceTempView("pages")

    # "served" rows: 50 query points, values from the offline engine
    # itself (a perfect log), one row corrupted to show detection
    qs = (
        pages.select(
            "url", F.expr("unix_millis(cast(warc_ts as timestamp))").alias("ts")
        )
        .orderBy("url", "ts")
        .limit(50)
    )
    truth = enrich_batch(spark, ooc_join, qs)
    raw_log = truth.select(
        F.to_json(F.struct("url")).alias("key_json"),
        F.to_json(
            F.struct(
                "ooc_url_counts_text_len_count_7d",
                F.when(F.expr("ts % 13 = 0"), F.lit(-1.0))
                .otherwise(F.col("ooc_url_counts_text_len_average_7d"))
                .alias("ooc_url_counts_text_len_average_7d"),
            )
        ).alias("value_json"),
        F.col("ts").alias("ts_millis"),
        F.col("ds"),
        F.lit("v1").alias("schema_hash"),
    )

    flat, _ = flatten_log_table(spark, raw_log, LOG_SCHEMAS, with_stats=False)
    logged = flat.select(
        "url",
        F.col("ts_millis").alias("ts"),
        "ooc_url_counts_text_len_count_7d",
        "ooc_url_counts_text_len_average_7d",
    )
    _, metrics = consistency_job(spark, ooc_join, logged)
    return metrics.first().asDict()
