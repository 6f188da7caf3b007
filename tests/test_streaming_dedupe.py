"""Streaming exact dedup: within-stream duplicates collapse to the
first-seen doc, history fingerprints are excluded per micro-batch, and
the stream layer agrees with the batch operator's identity."""

import pytest
from pyspark.sql import functions as F

from chronon_spark.streaming.dedupe import (
    dedup_against_history,
    stream_exact_dedup,
    text_fingerprint,
)

BASE_TS = 1_700_000_000_000


@pytest.fixture(scope="module")
def doc_stream(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("stream") / "docs")
    # 300 docs, text repeats every 100 -> 3 copies of each fingerprint,
    # all within one hour of event time
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        (F.lit(BASE_TS) + F.col("id") * 1_000).alias("ts"),
        F.concat(F.lit("Doc body "), (F.col("id") % 100).cast("string")).alias("text"),
    )
    df.write.mode("overwrite").parquet(src)
    return src, df


def _run(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_exact_dedup(spark, doc_stream):
    src, df = doc_stream
    stream = spark.readStream.schema(df.schema).parquet(src)
    _run(stream_exact_dedup(stream), "sd_out")
    got = spark.table("sd_out").collect()
    # exactly one survivor per distinct text (WHICH copy survives is
    # batch-internal task order, not a contract)
    assert len(got) == 100
    assert {r["doc_id"] % 100 for r in got} == set(range(100))
    # identity matches the batch operator's normalization
    fps = df.select(text_fingerprint().alias("f")).distinct().count()
    assert fps == 100


def test_dedup_against_history(spark, doc_stream):
    src, df = doc_stream
    history = df.filter("doc_id < 30").select("text")  # 30 known fingerprints
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = dedup_against_history(stream_exact_dedup(stream), history)
    _run(out, "sdh_out")
    got = {r["doc_id"] % 100 for r in spark.table("sdh_out").collect()}
    assert got == set(range(30, 100))
