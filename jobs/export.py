"""spark-submit entry point for the exporters.

    spark-submit --py-files dist/engine.zip jobs/export.py table \\
        --warehouse /data/wh --table my_features --out /tmp/exports \\
        [--fmt csv] [--prefix dev] [--row-limit 10000]

    spark-submit --py-files dist/engine.zip jobs/export.py metadata \\
        --config examples/webtext_configs.py --out /tmp/catalog

Mirrors the reference's LocalTableExporter / MetadataExporter driver
verbs (spark/LocalTableExporter.scala:32-75, MetadataExporter.scala:
255-311): ``table`` pulls one warehouse table into a single local file;
``metadata`` walks every GroupBy/Join in a config module and writes one
enriched feature-catalog JSON per conf.
"""

from __future__ import annotations

import argparse
import os
import sys

_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_repo_root, "chronon_spark")):
    sys.path.insert(0, _repo_root)


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="verb", required=True)
    t = sub.add_parser("table")
    t.add_argument("--warehouse", required=True)
    t.add_argument("--table", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--fmt", default="parquet", choices=["parquet", "csv", "json"])
    t.add_argument("--prefix", default=None)
    t.add_argument("--row-limit", type=int, default=None)
    m = sub.add_parser("metadata")
    m.add_argument("--config", required=True)
    m.add_argument("--out", required=True)
    args = ap.parse_args()

    if args.verb == "metadata":
        # pure config walk — no Spark session needed
        from chronon_spark.api.types import GroupBy, Join
        from chronon_spark.operators.export import export_metadata
        from jobs.backfill import load_config_module

        mod = load_config_module(args.config)
        confs = [
            v for v in vars(mod).values() if isinstance(v, (GroupBy, Join))
        ]
        paths = export_metadata(confs, args.out)
        for p in paths:
            print(p)
        return

    from chronon_spark.operators.export import export_table
    from chronon_spark.session import build_session
    from chronon_spark.sources.warehouse import Warehouse

    spark = build_session(app_name=f"export:{args.table}")
    wh = Warehouse(spark, args.warehouse)
    path = export_table(
        wh, args.table, args.out, fmt=args.fmt, prefix=args.prefix,
        row_limit=args.row_limit,
    )
    print(f"exported: {path}")
    spark.stop()


if __name__ == "__main__":
    main()
