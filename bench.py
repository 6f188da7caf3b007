"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` = total wall-time of the headline suite. Also reports
feature-vectors/sec for the flagship point-in-time backfill and, when
BENCH_SCALING=1, a local[8]-vs-local[32] scaling-efficiency proxy
(BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "groupby_temporal",      # the as-of core
    "groupby_snapshot",      # daily windowed backfill
    "join_backfill",         # multi-part point-in-time join
    "sessionize",
    "lag_lead",
    "dedup_exact",
    "minhash_near_dups",
    "similarity_bruteforce",
    "textstats",
    "webtext_flagship",
]


def run_suite(master: str, sf_dir: str, shuffle: int) -> tuple[dict[str, float], int]:
    from chronon_spark.session import build_session

    import __spark_entry__ as entry

    spark = build_session(app_name="bench", master=master, shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")
    # warm up JVM codegen + python workers so timings measure operators,
    # not first-job startup
    import pandas as pd
    from pyspark.sql import functions as F

    spark.range(1_000_000).agg(F.sum("id")).collect()
    warm = spark.range(10_000).withColumn("g", F.pmod("id", F.lit(64)))
    warm.groupBy("g").applyInPandas(lambda p: p, "id long, g long").count()
    qs = entry.queries()
    timings: dict[str, float] = {}
    flagship_rows = 0
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        if name == "groupby_temporal":
            flagship_rows = n
    spark.stop()
    return timings, flagship_rows


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    timings, flagship_rows = run_suite(f"local[{cpus}]", sf_dir, int(cpus))
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline suite wall-time (point-in-time backfill + pipeline ops)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "flagship_feature_vectors": flagship_rows,
        "flagship_fv_per_sec": round(flagship_rows / timings["groupby_temporal"], 1)
        if timings.get("groupby_temporal")
        else None,
    }

    if os.environ.get("BENCH_SCALING") == "1":
        t8, _ = run_suite("local[8]", sf_dir, 8)
        t32, _ = run_suite("local[32]", sf_dir, 32)
        s8, s32 = sum(t8.values()), sum(t32.values())
        out["scaling"] = {
            "local8_sec": round(s8, 3),
            "local32_sec": round(s32, 3),
            "speedup": round(s8 / s32, 3),
            "efficiency_4x": round((s8 / s32) / 4.0, 3),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
