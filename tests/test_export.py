"""Exporters: local table export + metadata catalog JSON
(LocalTableExporter / MetadataExporter analogues)."""

import glob
import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from chronon_spark.api.types import (
    Accuracy,
    Aggregation,
    EventSource,
    GroupBy,
    Join,
    JoinPart,
    Operation,
    Query,
    Window,
)
from chronon_spark.operators.export import (
    enrich_join,
    export_metadata,
    export_table,
)
from chronon_spark.sources.warehouse import Warehouse

GB = GroupBy(
    name="exp_gb",
    sources=(EventSource(table="exp_events", query=Query(time_column="ts")),),
    key_columns=("user",),
    aggregations=(
        Aggregation("amount", Operation.SUM, windows=(Window(7), None)),
        Aggregation("amount", Operation.APPROX_PERCENTILE, arg_map={"percentiles": [0.5]}, windows=(Window(7),)),
    ),
    accuracy=Accuracy.TEMPORAL,
)
JOIN = Join(
    name="exp_join",
    left=EventSource(table="unused"),
    right_parts=(JoinPart(GB, prefix="p"),),
    derivations={"*": "*"},
)


def test_export_table(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        pd.DataFrame({"user": ["a", "b"], "v": [1.0, 2.0], "ds": ["2024-01-01"] * 2})
    )
    wh.insert_partitions(df, "t")
    for fmt in ("parquet", "csv", "json"):
        path = export_table(wh, "t", str(tmp_path / "out"), fmt=fmt, prefix="dev")
        assert os.path.basename(path) == f"dev.t.{fmt}"
        files = [f for f in glob.glob(f"{path}/part-*") if not f.endswith(".crc")]
        assert len(files) == 1, "export must coalesce to a single file"
    back = spark.read.parquet(str(tmp_path / "out" / "dev.t.parquet"))
    assert back.count() == 2
    lim = export_table(wh, "t", str(tmp_path / "out2"), row_limit=1)
    assert spark.read.parquet(lim).count() == 1
    with pytest.raises(ValueError, match="unsupported export format"):
        export_table(wh, "t", str(tmp_path), fmt="xlsx")


def test_export_metadata(tmp_path):
    paths = export_metadata([GB, JOIN], str(tmp_path / "md"))
    assert sorted(os.path.basename(p) for p in paths) == ["exp_gb.json", "exp_join.json"]
    gb_md = json.load(open(paths[0]))
    assert gb_md["entity"] == "group_by" and gb_md["key_columns"] == ["user"]
    names = {f["name"]: f for f in gb_md["features"]}
    assert "amount_sum_7d" in names and names["amount_sum_7d"]["window"] == "7d"
    assert "amount_sum" in names  # unbounded window
    assert names["amount_approx_percentile_7d"]["type"].startswith("array")
    j_md = json.load(open(paths[1]))
    assert j_md["entity"] == "join"
    part = j_md["parts"][0]
    assert part["prefix"] == "p_exp_gb"
    assert "p_exp_gb_amount_sum_7d" in part["output_columns"]

    # handleException: a broken conf exports an exception record, batch continues
    class Broken:
        name = "broken"

        @property
        def key_columns(self):
            raise RuntimeError("boom")

    out = export_metadata([JOIN, Broken()], str(tmp_path / "md2"))
    assert len(out) == 2


def test_export_cli(tmp_path):
    import subprocess
    import sys

    ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # metadata verb: pure config walk, no Spark
    out = subprocess.run(
        [
            sys.executable, os.path.join(ROOT, "jobs", "export.py"), "metadata",
            "--config", os.path.join(ROOT, "examples", "webtext_configs.py"),
            "--out", str(tmp_path / "md"),
        ],
        capture_output=True, text=True, cwd=ROOT, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    names = sorted(os.path.basename(p) for p in out.stdout.split())
    assert "url_features.json" in names and "url_activity.json" in names
    md = json.load(open(tmp_path / "md" / "url_features.json"))
    assert md["entity"] == "join" and md["parts"]
