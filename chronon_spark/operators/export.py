"""Exporters — LocalTableExporter + MetadataExporter analogues.

- ``export_table`` re-expresses spark/LocalTableExporter.scala:32-75:
  pull a warehouse table into a single local file (parquet/csv/json)
  under ``{out_dir}/[{prefix}.]{table}.{fmt}`` for notebook/debug use.
  The reference coalesces to one file and caps exported rows; both knobs
  kept. This is a LOCAL dev utility by contract — the coalesce(1) is the
  point, not a scale bug.

- ``export_metadata`` re-expresses spark/MetadataExporter.scala:84-311:
  walk the GroupBy/Join/StagingQuery objects of a config module and
  write one enriched JSON per conf — the conf's structural summary plus
  the analyzer enrichment (output feature columns and types, key
  columns, windows), the payload a feature-catalog UI indexes. Errors
  enrich into ``{"exception": ...}`` instead of failing the batch
  (handleException semantics).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

from pyspark.sql import DataFrame

from chronon_spark.api.types import GroupBy, Join


def export_table(
    warehouse,
    table: str,
    out_dir: str,
    fmt: str = "parquet",
    prefix: str | None = None,
    row_limit: int | None = None,
) -> str:
    """Write ``table`` as one local file; returns the output path."""
    if fmt not in ("parquet", "csv", "json"):
        raise ValueError(f"unsupported export format '{fmt}'")
    df: DataFrame = warehouse.read(table)
    if row_limit:
        df = df.limit(int(row_limit))
    name = f"{prefix}.{table}" if prefix else table
    path = os.path.join(out_dir, f"{name}.{fmt}")
    writer = df.coalesce(1).write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        writer.parquet(path)
    return path


def _jsonable(v: Any) -> Any:
    if dataclasses.is_dataclass(v) and not isinstance(v, type):
        return {k: _jsonable(x) for k, x in dataclasses.asdict(v).items()}
    if isinstance(v, dict):
        return {str(k): _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if hasattr(v, "value") and not isinstance(v, (int, float, str, bool)):
        return v.value  # enums
    return v


def enrich_group_by(gb: GroupBy) -> dict:
    """Structural summary + derived feature list (MetadataExporter's
    analyzer enrichment: output columns with types, keys, windows)."""
    from chronon_spark.operators.temporal import output_field
    from pyspark.sql import types as T

    feats = []
    for p in gb.unpacked():
        entry: dict[str, Any] = {
            "name": p.output_column,
            "operation": p.operation.value,
            "input": p.input_column,
            "window": None if p.window is None else p.window.suffix,
            "bucket": p.bucket,
        }
        try:
            # type derivation needs the input schema only for passthrough
            # ops; a generic string field covers the catalog use-case
            entry["type"] = output_field(
                p, T.StructType([T.StructField(p.input_column, T.StringType())])
            ).dataType.simpleString()
        except Exception as e:  # noqa: BLE001 — handleException semantics
            entry["type"] = f"exception: {e}"
        feats.append(entry)
    return {
        "entity": "group_by",
        "name": gb.name,
        "key_columns": list(gb.key_columns),
        "accuracy": gb.accuracy.value,
        "sources": [_jsonable(s) for s in gb.sources],
        "features": feats,
    }


def enrich_join(join: Join) -> dict:
    parts = []
    for part in join.right_parts:
        sub = enrich_group_by(part.group_by)
        parts.append(
            {
                "prefix": part.full_prefix,
                "key_mapping": part.key_mapping or {},
                "group_by": sub,
                "output_columns": [
                    f"{part.full_prefix}_{f['name']}" for f in sub["features"]
                ],
            }
        )
    return {
        "entity": "join",
        "name": join.name,
        "left": _jsonable(join.left),
        "parts": parts,
        "derivations": join.derivations or {},
    }


def export_metadata(confs: list, out_dir: str) -> list[str]:
    """Write one enriched JSON per conf; returns the written paths.
    Confs that fail to enrich export {"name", "exception"} instead of
    aborting the batch (MetadataExporter.handleException)."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for conf in confs:
        try:
            if isinstance(conf, Join):
                data = enrich_join(conf)
            elif isinstance(conf, GroupBy):
                data = enrich_group_by(conf)
            else:
                data = {"entity": type(conf).__name__.lower(), **_jsonable(conf)}
        except Exception as e:  # noqa: BLE001
            data = {"name": getattr(conf, "name", "?"), "exception": str(e)}
        path = os.path.join(out_dir, f"{data.get('name', 'conf')}.json")
        with open(path, "w") as f:
            json.dump(data, f, indent=2, sort_keys=True, default=str)
        written.append(path)
    return written
