"""Noop-sink isolation bench (guide §1.4): times each headline query by
materializing EVERY column of every row into the no-op data source,
so the measurement cannot be distorted by count()-pruning, and reports
cold (first execution) + warm (min of N) per query.

bench.py itself is frozen for driver measurement; this harness exists so
optimization claims can cite numbers that are immune to Catalyst pruning.

Usage: python bench_extra.py [--repeats 3] [--queries a,b,c]
Prints one JSON line {"queries": {name: {"cold": s, "warm": s}}, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "groupby_temporal",
    "groupby_snapshot",
    "join_backfill",
    "sessionize",
    "lag_lead",
    "dedup_exact",
    "minhash_near_dups",
    "similarity_bruteforce",
    "textstats",
    "webtext_flagship",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--queries", type=str, default=",".join(HEADLINE))
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from chronon_spark.session import build_session

    import __spark_entry__ as entry

    spark = build_session(
        app_name="bench_extra", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    spark.range(1_000_000).agg(F.sum("id")).collect()
    warm = spark.range(10_000).withColumn("g", F.pmod("id", F.lit(64)))
    warm.groupBy("g").applyInPandas(lambda p: p, "id long, g long").count()

    qs = entry.queries()
    out: dict = {"repeats": args.repeats, "sink": "noop", "sf_dir": sf_dir, "queries": {}}
    for name in [q for q in args.queries.split(",") if q]:
        walls = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"noop:{name}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out["queries"][name] = {"cold": walls[0], "warm": min(walls), "walls": walls}
        print(f"[noop] {name}: {walls}", file=sys.stderr)
    out["total_cold"] = round(sum(v["cold"] for v in out["queries"].values()), 3)
    out["total_warm"] = round(sum(v["warm"] for v in out["queries"].values()), 3)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
