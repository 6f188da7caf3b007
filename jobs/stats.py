"""spark-submit entry point for the stats/compare job family.

    spark-submit --py-files dist/engine.zip jobs/stats.py summary \\
        --table /data/wh/my_features --keys user_id --out /data/wh/_stats

    spark-submit --py-files dist/engine.zip jobs/stats.py compare \\
        --left /data/wh/old_features --right /data/wh/new_features \\
        --keys user_id,ds [--mapping old_col=new_col,...]

Mirrors the reference's SummaryJob / CompareJob driver verbs
(spark/stats/SummaryJob.scala, CompareJob.scala:60-140). ``summary``
writes per-ds summary rows back to the warehouse; ``compare`` prints the
one-row metrics JSON and optionally persists the row-level comparison.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_repo_root, "chronon_spark")):
    sys.path.insert(0, _repo_root)


def _read(spark, path: str):
    return spark.read.parquet(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="verb", required=True)
    s = sub.add_parser("summary")
    s.add_argument("--table", required=True)
    s.add_argument("--keys", default="")
    s.add_argument("--out", default=None)
    # incremental mode (SummaryJob.dailyRun): with --warehouse, walk only
    # the UNFILLED partitions of --output-table and append them (resume /
    # daily-cron contract); without it, the one-shot path-mode summary
    s.add_argument("--warehouse", default=None, help="warehouse root for incremental mode")
    s.add_argument("--output-table", default=None)
    s.add_argument("--start", default=None)
    s.add_argument("--end", default=None)
    s.add_argument("--step-days", type=int, default=30)
    s.add_argument(
        "--percentile-mode", default="approx", choices=("approx", "exact"),
        help="approx = bounded-memory GK (default); exact buffers raw values (test/oracle only)",
    )
    c = sub.add_parser("compare")
    c.add_argument("--left", required=True)
    c.add_argument("--right", required=True)
    c.add_argument("--keys", required=True)
    c.add_argument("--mapping", default="")
    c.add_argument("--out", default=None)
    dr = sub.add_parser("drift")
    dr.add_argument("--table", required=True)
    dr.add_argument("--col", required=True)
    dr.add_argument("--bins", type=int, default=32)
    k = sub.add_parser("consistency")
    k.add_argument("--config", required=True, help="python module with the Join")
    k.add_argument("--name", required=True, help="Join name inside the module")
    k.add_argument("--logged", required=True, help="parquet of served rows")
    k.add_argument("--sample-percent", type=float, default=100.0)
    k.add_argument("--out", default=None)
    args = ap.parse_args()

    from chronon_spark.operators.stats import (
        column_summary,
        compare_tables,
        consistency_job,
        drift_series,
    )
    from chronon_spark.session import build_session

    spark = build_session(app_name=f"stats:{args.verb}")
    if args.verb == "summary":
        keys = [k for k in args.keys.split(",") if k]
        if args.warehouse:
            from chronon_spark.operators.stats import summary_job
            from chronon_spark.sources.warehouse import Warehouse

            wh = Warehouse(spark, args.warehouse)
            written = summary_job(
                spark,
                wh,
                input_table=args.table,
                output_table=args.output_table or f"{args.table}_summary",
                keys=keys,
                start_ds=args.start,
                end_ds=args.end,
                step_days=args.step_days,
                percentile_mode=args.percentile_mode,
            )
            print(f"summary partitions written: {len(written)}")
            spark.stop()
            return
        out = column_summary(
            _read(spark, args.table), keys=keys, percentile_mode=args.percentile_mode
        )
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            print(f"summary written: {args.out}")
        else:
            for r in out.orderBy(out.columns[0]).collect():
                print(json.dumps(r.asDict(), default=str))
    elif args.verb == "drift":
        out = drift_series(spark, _read(spark, args.table), args.col, bins=args.bins)
        for r in out.collect():
            print(json.dumps(r.asDict()))
    elif args.verb == "compare":
        keys = [k for k in args.keys.split(",") if k]
        mapping = dict(kv.split("=", 1) for kv in args.mapping.split(",") if kv)
        comparison, metrics = compare_tables(
            _read(spark, args.left), _read(spark, args.right), keys, mapping
        )
        print(json.dumps(metrics.first().asDict(), default=str))
        if args.out:
            comparison.write.mode("overwrite").parquet(args.out)
            print(f"comparison written: {args.out}")
    else:  # consistency (ConsistencyJob.scala analogue)
        from jobs.backfill import find_config, load_config_module

        join = find_config(load_config_module(args.config), args.name)
        comparison, metrics = consistency_job(
            spark, join, _read(spark, args.logged), sample_percent=args.sample_percent
        )
        print(json.dumps(metrics.first().asDict(), default=str))
        if args.out:
            comparison.write.mode("overwrite").parquet(args.out)
            print(f"comparison written: {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
