from chronon_spark.sources.scan import render_source, scan_table

__all__ = ["render_source", "scan_table"]
