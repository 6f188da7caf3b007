"""Scaling-efficiency proxy (BASELINE.md protocol): the flagship webtext
point-in-time backfill on the SAME materialized input at local[8] vs
local[32] (cores = executor proxy). Reports feature-vectors/sec at both
and efficiency = (rows/s @32) / (4 × rows/s @8).

Usage: python tools/bench_scaling.py [n_rows] — writes JSON to stdout.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAGES_PATH = "/tmp/chronon_bench_pages"


def materialize(n_rows: int) -> int:
    from chronon_spark.fixtures.webtext import generate_webtext
    from chronon_spark.session import build_session

    spark = build_session(app_name="gen", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(PAGES_PATH, ignore_errors=True)
    pages = generate_webtext(spark, n_rows=n_rows, n_urls=max(1000, n_rows // 500), days=120, partitions=64)
    pages.write.mode("overwrite").parquet(PAGES_PATH)
    n = spark.read.parquet(PAGES_PATH).count()
    spark.stop()
    return n


def run(cores: int) -> dict:
    from pyspark.sql import functions as F

    from chronon_spark.pipelines.webtext import backfill_features
    from chronon_spark.session import build_session

    spark = build_session(app_name=f"scale{cores}", master=f"local[{cores}]", shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JVM codegen + python workers
    spark.range(1_000_000).agg(F.sum("id")).collect()
    spark.range(10_000).withColumn("g", F.pmod("id", F.lit(64))).groupBy("g").applyInPandas(
        lambda p: p, "id long, g long"
    ).count()
    pages = spark.read.parquet(PAGES_PATH)
    t0 = time.time()
    n = backfill_features(spark, pages).count()
    dt = time.time() - t0
    spark.stop()
    return {"cores": cores, "rows": n, "sec": round(dt, 2), "rows_per_sec": round(n / dt, 1)}


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    total = materialize(n_rows)
    r8 = run(8)
    r32 = run(32)
    eff = (r32["rows_per_sec"] / (4 * r8["rows_per_sec"])) if r8["rows_per_sec"] else 0.0
    print(
        json.dumps(
            {
                "input_rows": total,
                "local8": r8,
                "local32": r32,
                "speedup_8_to_32": round(r32["rows_per_sec"] / r8["rows_per_sec"], 3),
                "scaling_efficiency_4x": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
