"""Example configs for jobs/backfill.py — the flagship webtext feature set
expressed as engine configs, runnable end-to-end via spark-submit:

    python tools/make_dist.py
    spark-submit --py-files dist/engine.zip jobs/backfill.py \\
        --config examples/webtext_configs.py --name url_features \\
        --start 2023-02-01 --end 2023-06-30 --warehouse /data/warehouse

Assumes a pages table registered as ``pages`` (or swap the table for a
parquet path) with columns (url, warc_ts, html, text, lang) — generate a
deterministic one with chronon_spark.fixtures.webtext.generate_webtext.
"""

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

PAGES = EventSource(
    table="pages",
    query=Query(
        selects={"url": None, "lang": None, "text_len": "length(text)"},
        time_column="unix_millis(cast(warc_ts as timestamp))",
    ),
)

# rolling crawl-activity features per url
url_activity = GroupBy(
    name="url_activity",
    sources=(PAGES,),
    key_columns=("url",),
    aggregations=(
        Aggregation("text_len", Operation.COUNT, windows=(Window(7), Window(30), None)),
        Aggregation("text_len", Operation.AVERAGE, windows=(Window(30),)),
        Aggregation("text_len", Operation.MIN, windows=(Window(30),)),
        Aggregation("text_len", Operation.MAX, windows=(Window(30),)),
        Aggregation("text_len", Operation.LAST, windows=(None,)),
        Aggregation("lang", Operation.LAST, windows=(None,)),
        Aggregation("text_len", Operation.COUNT, windows=(Window(30),), buckets=("lang",)),
    ),
    accuracy=Accuracy.TEMPORAL,
)

# per-domain activity (key mapping demo)
domain_activity = GroupBy(
    name="domain_activity",
    sources=(
        EventSource(
            table="pages",
            query=Query(
                selects={"domain": "parse_url(url, 'HOST')", "text_len": "length(text)"},
                time_column="unix_millis(cast(warc_ts as timestamp))",
            ),
        ),
    ),
    key_columns=("domain",),
    aggregations=(
        Aggregation("text_len", Operation.COUNT, windows=(Window(7),)),
        Aggregation("text_len", Operation.AVERAGE, windows=(Window(7),)),
    ),
    accuracy=Accuracy.TEMPORAL,
)

# the flagship join: feature vector at every crawl event
url_features = Join(
    name="url_features",
    left=EventSource(
        table="pages",
        query=Query(
            selects={"url": None, "domain": "parse_url(url, 'HOST')", "text": None},
            time_column="unix_millis(cast(warc_ts as timestamp))",
        ),
    ),
    right_parts=(
        JoinPart(url_activity),
        JoinPart(domain_activity, key_mapping={"domain": "domain"}, prefix="dom"),
    ),
    derivations={
        "*": "*",
        "text_len_trend_30d": "url_activity_text_len_last / nullif(url_activity_text_len_average_30d, 0)",
    },
)
