"""End-to-end run of the example flagship configs via the runner."""

import pytest
from pyspark.sql import functions as F

from chronon_spark.fixtures.webtext import generate_webtext
from chronon_spark.runner import run_join_backfill
from chronon_spark.sources.warehouse import Warehouse


def test_example_flagship_join(spark, tmp_path):
    import examples.webtext_configs as cfg

    pages = generate_webtext(spark, n_rows=6_000, n_urls=150, days=40)
    pages.createOrReplaceTempView("pages")
    lo, hi = pages.agg(F.min("ds"), F.max("ds")).first()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    start = max(lo, "2023-01-20")
    run_join_backfill(spark, wh, cfg.url_features, start, hi)
    out = wh.read("url_features")
    assert out.count() > 0
    cols = out.columns
    assert "url_activity_text_len_count_30d" in cols
    assert "dom_domain_activity_text_len_count_7d" in cols
    assert "text_len_trend_30d" in cols
    assert "text" in cols  # byte payload present
    # text byte-identity within the join output
    joined = out.select("url", "ts", F.md5("text").alias("h_out")).join(
        pages.select("url", "ts", F.md5("text").alias("h_in")), ["url", "ts"]
    )
    assert joined.filter(F.col("h_out") != F.col("h_in")).count() == 0
    # resumability: rerun is a no-op
    lin = wh.lineage("url_features")
    run_join_backfill(spark, wh, cfg.url_features, start, hi)
    assert wh.lineage("url_features") == lin


def test_example_ooc_pipeline(spark):
    from examples.ooc_pipeline import run_example

    m = run_example(spark)
    assert m["total"] == 50
    # count column logged faithfully; average corrupted on ts%13==0 rows
    assert m["ooc_url_counts_text_len_count_7d_mismatch"] == 0
    assert m["ooc_url_counts_text_len_average_7d_mismatch"] == 7  # deterministic fixture


def test_example_ops_pipeline(spark, tmp_path):
    """Round-4 ops composition: hot-key-mitigated backfill, incremental
    summaries (rerun = no-op), StreamingStats-wrapped sink."""
    from examples.ops_pipeline import run_example

    out = run_example(spark, str(tmp_path / "wh"))
    assert out["feature_rows"] > 0
    assert out["summary_days_first_run"] > 0
    assert out["summary_days_rerun"] == 0
    assert "Wrote 500 records" in out["stream_status"]


def test_example_serving_pipeline(spark, tmp_path):
    from examples.serving_pipeline import run_example

    out = run_example(spark, str(tmp_path))
    assert out["kv_uploadable_features"] == 6  # one part per aggregation here
    assert out["batch_served"] == 500
    assert out["stream_batches"] == 2
    assert out["stream_served"] == 500


def test_example_training_data_pipeline(spark):
    """Round-6 curation funnel: monotone stage counts, auditable PII
    columns, disjoint splits, contiguous pack layout per stream."""
    from examples.training_data_pipeline import run_example

    out = run_example(spark, seq_len=128)
    f = out["funnel"]
    assert (
        f["n_input"] >= f["n_quality"] >= f["n_decontaminated"]
        >= f["n_deduped"] >= f["n_near_deduped"] >= f["n_sampled"]
    )
    assert f["n_sampled"] > 0
    assert f["n_packed_docs"] == f["n_sampled"]
    assert f["n_packs"] >= f["n_packed_docs"]  # every doc spans >= 1 pack

    cur = out["curated"]
    assert {"url_norm", "url_domain", "pii_total", "sample_weight", "split"} <= set(cur.columns)
    assert cur.filter(~F.col("split").isin("train", "valid", "test")).count() == 0

    # pack offsets are a contiguous running sum within each stream
    rows = out["packed"].orderBy("stream", "doc_id").collect()
    run: dict = {}
    for r in rows:
        off = run.get(r["stream"], 0)
        assert r["stream_offset"] == off
        run[r["stream"]] = off + r["n_tokens"]
