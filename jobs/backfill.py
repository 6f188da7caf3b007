"""spark-submit entry point for backfills.

Usage (cluster or local — the engine ships as a zip via --py-files):

    python tools/make_dist.py                      # builds dist/engine.zip
    spark-submit --py-files dist/engine.zip \\
        jobs/backfill.py --config my_configs.py --name my_join \\
        --start 2023-01-01 --end 2023-06-30 \\
        --warehouse /data/warehouse [--step-days 30]

``--config`` is a python module path (file) that defines GroupBy /
Join / StagingQuery objects at module level; ``--name`` picks one by its
``.name``. Mirrors the reference's run.py → Driver flow
(api/py/ai/chronon/repo/run.py:401-495, spark/Driver.scala:1091-1126)
with python configs instead of compiled thrift JSON.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

# local runs: the package lives next to jobs/; under spark-submit the
# --py-files zip provides it instead
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_repo_root, "chronon_spark")):
    sys.path.insert(0, _repo_root)


def load_config_module(path: str):
    spec = importlib.util.spec_from_file_location("user_configs", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def find_config(mod, name: str):
    from chronon_spark.api.types import GroupBy, Join
    from chronon_spark.operators.staging import StagingQuery

    for v in vars(mod).values():
        if isinstance(v, (GroupBy, Join, StagingQuery)) and getattr(v, "name", None) == name:
            return v
    raise SystemExit(f"no GroupBy/Join/StagingQuery named '{name}' in config module")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--name", required=True)
    ap.add_argument("--start", required=True)
    ap.add_argument("--end", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--step-days", type=int, default=30)
    ap.add_argument(
        "--incremental", action="store_true",
        help="snapshot GroupBys only: materialize day IRs once and read the "
        "cache (scan-once-per-day; see operators/incremental.py)",
    )
    ap.add_argument(
        "--refresh-days", default="",
        help="with --incremental: comma list of IR days to invalidate (late data)",
    )
    ap.add_argument(
        "--tile-cache", action="store_true",
        help="joins only: persist/reuse 5-min tiles for tileable temporal "
        "parts (operators/tilestore.py)",
    )
    ap.add_argument(
        "--materialize-tiles", action="store_true",
        help="temporal GroupBys only: warm the 5-min tile cache for "
        "[start, end] without running a backfill",
    )
    args = ap.parse_args()

    from chronon_spark.api.types import GroupBy, Join
    from chronon_spark.operators.staging import StagingQuery, run_staging_query
    from chronon_spark.runner import run_group_by_backfill, run_join_backfill
    from chronon_spark.session import build_session
    from chronon_spark.sources.warehouse import Warehouse

    spark = build_session(app_name=f"backfill:{args.name}")
    wh = Warehouse(spark, args.warehouse)
    conf = find_config(load_config_module(args.config), args.name)
    if isinstance(conf, GroupBy) and args.materialize_tiles:
        from pyspark.sql import functions as F

        from chronon_spark.operators.tilestore import TileStore
        from chronon_spark.sources.scan import render_source, union_sources

        events = union_sources(
            [render_source(spark, s_, conf, query_start=args.start, query_end=args.end)
             for s_ in conf.sources]
        ).filter(F.col("ds").between(args.start, args.end))
        built = TileStore(wh, conf).materialize(spark, events, args.start, args.end)
        print(f"tile days materialized this run: {len(built)}")
        print(f"done: {conf.name}__tiles5m")
        spark.stop()
        return
    if isinstance(conf, GroupBy):
        if args.incremental:
            from chronon_spark.operators.incremental import (
                run_group_by_backfill_incremental,
            )

            refresh = [d for d in args.refresh_days.split(",") if d]
            table, mat = run_group_by_backfill_incremental(
                spark, wh, conf, args.start, args.end, args.step_days,
                refresh_days=refresh or None,
            )
            print(f"ir days materialized this run: {len(mat)}")
        else:
            table = run_group_by_backfill(spark, wh, conf, args.start, args.end, args.step_days)
    elif isinstance(conf, Join):
        table = run_join_backfill(
            spark, wh, conf, args.start, args.end, args.step_days,
            tile_warehouse=wh if args.tile_cache else None,
        )
    else:
        table = run_staging_query(spark, wh, conf, args.start, args.end, args.step_days)
    parts = wh.partitions(table)
    print(f"done: {table} partitions [{parts[0]} .. {parts[-1]}] ({len(parts)})")
    spark.stop()


if __name__ == "__main__":
    main()
