"""Deterministic synthetic Common-Crawl-style page table (FIXTURES.md F1/F2).

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string
plus engine columns ts (epoch millis) and ds.

Generation is FULLY DISTRIBUTED and deterministic: every column is a pure
Spark-SQL function of ``spark.range`` ids (xxhash64-based pseudo-random),
so the same (n_rows, seed) yields identical data at any parallelism and
any scale — no driver-side data, no python RNG per row. Zipf-ish url skew
comes from squaring a uniform hash; a handful of "crawl-storm" urls get
a large share of rows to exercise salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MS_DAY = 86_400_000


def generate_webtext(
    spark: SparkSession,
    n_rows: int = 100_000,
    n_urls: int = 2_000,
    days: int = 180,
    start_ts_ms: int = 1_672_531_200_000,  # 2023-01-01 UTC
    seed: int = 42,
    hot_urls: int = 5,
    hot_share: float = 0.08,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic pages frame. ``hot_share`` of rows hit ``hot_urls``
    urls (skew); text length 0..20000 chars; ~3% null lang."""
    base = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)

    def h(salt: int):
        return F.abs(F.xxhash64(F.col("id") + F.lit(seed * 1_000_003 + salt)))

    # Zipf-ish: square a uniform [0,1) to concentrate mass at low ids
    u = (h(1) % 1_000_000) / 1_000_000.0
    url_id = F.floor(u * u * F.lit(n_urls))
    is_hot = (h(2) % 10_000) < int(hot_share * 10_000)
    url_id = F.when(is_hot, h(3) % hot_urls).otherwise(url_id)

    ts = F.lit(start_ts_ms) + (h(4) % F.lit(days * MS_DAY))
    text_len = (h(5) % F.lit(2_001)) * 10  # 0..20000
    lang = F.when(h(6) % 100 < 3, F.lit(None).cast("string")).otherwise(
        F.element_at(
            F.array(*[F.lit(x) for x in ["en", "en", "en", "en", "de", "fr", "es", "zh", "ru"]]),
            (h(7) % 9 + 1).cast("int"),
        )
    )
    # deterministic text: repeat a url-and-row-derived token to the target
    # length; byte-identity per row is checkable via hash
    token = F.concat(F.lit("w"), (h(8) % 100_000).cast("string"), F.lit(" "))
    text = F.substring(F.repeat(token, 2200), 1, text_len.cast("int"))

    df = base.select(
        F.concat(
            F.lit("https://site"),
            (url_id % 500).cast("string"),
            F.lit(".example/p/"),
            url_id.cast("string"),
        ).alias("url"),
        F.timestamp_millis(ts).alias("warc_ts"),
        ts.alias("ts"),
        lang.alias("lang"),
        text.alias("text"),
    )
    df = df.withColumn("html", F.encode(F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")), "utf-8"))
    df = df.withColumn("text_len", F.length("text"))
    df = df.withColumn("ds", F.date_format(F.timestamp_millis(F.col("ts")), "yyyy-MM-dd"))
    return df


def generate_queries(
    spark: SparkSession,
    pages: DataFrame,
    fraction: float = 0.3,
    ts_jitter_ms: int = 3_600_000,
    seed: int = 43,
) -> DataFrame:
    """Left spine (FIXTURES.md F2): sample page rows, jitter ts forward,
    keep some exact-ts collisions (leakage edge)."""
    q = pages.select("url", "ts").sample(fraction, seed=seed)
    jitter = F.abs(F.xxhash64("url", "ts") + seed) % F.lit(ts_jitter_ms)
    # every 10th row keeps the exact event ts (equal-ts exclusion edge)
    q = q.withColumn(
        "ts",
        F.when(F.abs(F.xxhash64("ts")) % 10 == 0, F.col("ts")).otherwise(F.col("ts") + jitter),
    )
    return q.withColumn("ds", F.date_format(F.timestamp_millis(F.col("ts")), "yyyy-MM-dd"))
