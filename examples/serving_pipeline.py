"""Serving pipeline example — the round-5 KV serving path composed:

1. ``analyzer.serving_plan`` decides which features ride the KV path,
2. ``group_by_upload`` collapses history into ONE bounded row per key
   at the batch boundary (the reference's GroupByUpload/FinalBatchIr),
3. ``fetch_features`` answers a batch of (key, ts) point requests by
   merging that state with the streamed head — no history rescan,
4. ``fetch_stream`` serves a live *stream* of fetch requests the same
   way, one cogrouped kernel pass per micro-batch.

Run standalone:

    python tools/make_dist.py
    spark-submit --py-files dist/engine.zip examples/serving_pipeline.py
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

MS_DAY = 86_400_000
T0 = 1_700_006_400_000  # 2023-11-15, day-aligned
END_DS = "2023-11-28"


def make_gb():
    from chronon_spark.api.types import (
        Accuracy,
        Aggregation,
        EventSource,
        GroupBy,
        Operation,
        Window,
    )

    return GroupBy(
        name="serving_example_gb",
        sources=(EventSource(table="events"),),
        key_columns=("user",),
        aggregations=(
            Aggregation("amount", Operation.COUNT, windows=(None,)),
            Aggregation("amount", Operation.SUM, windows=(Window(7),)),
            Aggregation("amount", Operation.AVERAGE, windows=(Window(3),)),
            Aggregation("amount", Operation.TOP_K, arg_map={"k": 3}, windows=(Window(7),)),
            Aggregation(
                "amount",
                Operation.APPROX_PERCENTILE,
                arg_map={"percentiles": [0.5, 0.95]},
                windows=(Window(7),),
            ),
            Aggregation(
                "merchant",
                Operation.APPROX_HISTOGRAM_K,
                arg_map={"k": 3},
                windows=(Window(7),),
            ),
        ),
        accuracy=Accuracy.TEMPORAL,
        derivations={"*": "*", "spend_rate": "amount_sum_7d / amount_count"},
    )


def run_example(spark: SparkSession, tmp_dir: str) -> dict:
    from chronon_spark.analyzer import serving_plan
    from chronon_spark.operators.upload import (
        boundary_millis,
        fetch_features,
        group_by_upload,
    )
    from chronon_spark.streaming.fetcher import fetch_stream

    gb = make_gb()

    # 1. serving-path check: this config is fully KV-servable
    plan = serving_plan(gb)
    assert plan["fully_kv_servable"], plan["lambda_tile_only"]

    rng = np.random.default_rng(23)
    n = 20_000
    ev = spark.createDataFrame(
        pd.DataFrame(
            {
                "user": [f"u{i}" for i in rng.integers(0, 40, n)],
                "ts": (T0 + rng.integers(0, 15 * MS_DAY, n)).astype(np.int64),
                "amount": np.round(rng.gamma(2.0, 30.0, n), 2),
                "merchant": rng.choice([f"m{i}" for i in range(9)], n),
            }
        )
    )
    boundary = boundary_millis(END_DS)

    # 2. upload: ONE bounded row per key, O(window/hop) wide
    up = group_by_upload(spark, gb, ev, END_DS).persist()
    n_keys = up.count()

    # 3. batch point-fetches over the serving day
    nq = 500
    q = spark.createDataFrame(
        pd.DataFrame(
            {
                "user": [f"u{i % 41}" for i in range(nq)],  # one unseen key
                "ts": (boundary + rng.integers(0, MS_DAY, nq)).astype(np.int64),
                "request_id": np.arange(nq, dtype=np.int64),
            }
        )
    )
    head = ev.filter(f"ts >= {boundary}")
    served = fetch_features(spark, gb, up, head, q, END_DS)
    n_served = served.count()

    # 4. the same requests as a stream, 2 micro-batches
    qdir = f"{tmp_dir}/requests"
    q.withColumn("__b", (q["request_id"] % 2).cast("int")).repartition(
        "__b"
    ).write.partitionBy("__b").mode("overwrite").parquet(qdir)
    stream = (
        spark.readStream.schema(q.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(qdir + "/__b=*")
    )
    batches = []
    sq = fetch_stream(
        spark,
        gb,
        up,
        lambda: head,  # re-read per batch: a file-backed head would grow
        stream,
        lambda df, bid: batches.append(df.count()),
        checkpoint=f"{tmp_dir}/ckpt",
        end_ds=END_DS,
        trigger_once=True,
    )
    sq.awaitTermination(120)
    up.unpersist()
    return {
        "kv_uploadable_features": len(plan["kv_uploadable"]),
        "upload_keys": n_keys,
        "batch_served": n_served,
        "stream_batches": len(batches),
        "stream_served": sum(batches),
    }


if __name__ == "__main__":
    import tempfile

    from chronon_spark.session import build_session

    spark = build_session(app_name="serving_pipeline_example")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as td:
        print(run_example(spark, td))
    spark.stop()
