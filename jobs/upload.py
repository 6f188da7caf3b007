"""spark-submit entry point for the KV serving path — the reference
Driver's ``group-by-upload`` verb (spark/Driver.scala GroupByUploader,
spark/GroupByUpload.scala) plus an offline ``fetch`` verb.

    # build the bounded per-key serving artifact at a batch boundary
    spark-submit --py-files dist/engine.zip jobs/upload.py upload \\
        --config my_configs.py --name my_gb \\
        --end-ds 2024-01-12 --warehouse /data/warehouse

    # serve a parquet of (key, ts) requests from it
    spark-submit --py-files dist/engine.zip jobs/upload.py fetch \\
        --config my_configs.py --name my_gb \\
        --end-ds 2024-01-12 --warehouse /data/warehouse \\
        --queries /data/requests.parquet --out /data/served.parquet

``upload`` scans only ``max_window`` days of history for fully-windowed
configs (render_source partition narrowing) and writes ONE bounded row
per key to ``{name}__upload`` under ds=end_ds. ``fetch`` reads that
table plus the streamed head (ds ≥ end_ds only — partition-pruned; no
history rescan) and writes the served features.
"""

from __future__ import annotations

import argparse
import os
import sys

_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_repo_root, "chronon_spark")):
    sys.path.insert(0, _repo_root)

from jobs.backfill import find_config, load_config_module  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["upload", "fetch"])
    ap.add_argument("--config", required=True)
    ap.add_argument("--name", required=True)
    ap.add_argument("--end-ds", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--queries", help="fetch: parquet of key columns + epoch-millis ts")
    ap.add_argument("--out", help="fetch: output parquet path")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from chronon_spark.analyzer import serving_plan
    from chronon_spark.api.types import GroupBy
    from chronon_spark.operators.upload import (
        boundary_millis,
        fetch_features,
        group_by_upload,
    )
    from chronon_spark.session import build_session
    from chronon_spark.sources.scan import render_source, union_sources
    from chronon_spark.sources.warehouse import Warehouse

    spark = build_session(app_name=f"upload:{args.name}")
    wh = Warehouse(spark, args.warehouse)
    gb = find_config(load_config_module(args.config), args.name)
    if not isinstance(gb, GroupBy):
        raise SystemExit(f"'{args.name}' is not a GroupBy")
    plan = serving_plan(gb)
    if not plan["fully_kv_servable"]:
        raise SystemExit(
            "not KV-servable: "
            + "; ".join(f"{d['column']} ({d['reason']})" for d in plan["lambda_tile_only"])
            + " — serve via the lambda-tile path (jobs/backfill.py --tile-cache)"
        )
    table = f"{gb.name}__upload"

    if args.mode == "upload":
        events = union_sources(
            [
                render_source(spark, s_, gb, query_start=args.end_ds, query_end=args.end_ds)
                for s_ in gb.sources
            ]
        )
        up = group_by_upload(spark, gb, events, args.end_ds).withColumn(
            "ds", F.lit(args.end_ds)
        )
        wh.insert_partitions(up, table)
        print(f"done: {table} ds={args.end_ds} keys={wh.read(table).filter(F.col('ds') == args.end_ds).count()}")
    else:
        if not (args.queries and args.out):
            raise SystemExit("fetch needs --queries and --out")
        boundary = boundary_millis(args.end_ds)
        up = wh.read(table).filter(F.col("ds") == args.end_ds).drop("ds")
        # streamed head: partition-pruned to ds >= end_ds — the only
        # event rows a fetch after the boundary can need
        head = union_sources(
            [
                render_source(spark, s_, gb, query_start=args.end_ds)
                for s_ in gb.sources
            ]
        ).filter(F.col("ds") >= args.end_ds)
        q = spark.read.parquet(args.queries)
        out = fetch_features(spark, gb, up, head, q, args.end_ds)
        out.write.mode("overwrite").parquet(args.out)
        print(f"done: served {spark.read.parquet(args.out).count()} requests -> {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
