"""Stats/compare module: column_summary + compare_tables semantics
(spark/stats/StatsCompute.scala, CompareMetrics.scala analogues) and the
jobs/stats.py CLI smoke."""

import json
import os
import subprocess
import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F

from chronon_spark.operators.stats import column_summary, compare_tables

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_column_summary(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "ds": ["2024-01-01"] * 4 + ["2024-01-02"] * 2,
                "k": list("abcdef"),
                "v": [1.0, 2.0, None, 4.0, 10.0, None],
                "s": ["x", None, "y", "z", None, None],
            }
        )
    )
    out = {r["ds"]: r for r in column_summary(df, keys=("k",)).collect()}
    d1 = out["2024-01-01"]
    assert d1["total_count"] == 4
    assert d1["v__null_count"] == 1 and abs(d1["v__null_rate"] - 0.25) < 1e-9
    assert d1["s__null_count"] == 1
    assert abs(d1["v__percentiles"][2] - 2.0) < 1e-9  # median of 1,2,4
    assert "k__null_count" not in out["2024-01-02"].asDict()  # keys excluded


def test_compare_tables(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3, 4], "v": [1.0, 2.0, None, 4.0], "t": ["a", "b", "c", "d"]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3, 5], "v": [1.0, 3.0, None, 9.0], "t": ["a", "B", "c", "e"]})
    )
    comparison, metrics = compare_tables(left, right, ["id"])
    m = metrics.first()
    assert m["total"] == 5  # full outer: ids 1-5
    assert m["v_both_null"] == 1  # id 3 null/null
    assert m["v_left_null"] == 0 + 1  # id 5 absent on left
    assert m["v_right_null"] == 1  # id 4 absent on right
    assert m["v_mismatch"] == 1  # id 2: 2 vs 3
    assert m["t_mismatch"] == 1  # id 2: b vs B
    # smape: id1 0, id2 2*1/5=0.4, others otherwise(0.0) → avg over 5 rows
    assert abs(m["v_smape"] - (0.4 / 5)) < 1e-9
    rows = {r["id"]: r for r in comparison.collect()}
    assert rows[2]["v_left"] == 2.0 and rows[2]["v_right"] == 3.0


def test_compare_validates(spark):
    left = spark.createDataFrame(pd.DataFrame({"id": [1], "v": [1.0]}))
    right = spark.createDataFrame(pd.DataFrame({"id": [1], "w": [1.0]}))
    with pytest.raises(ValueError, match="missing compare columns"):
        compare_tables(left, right, ["id"])
    _, m = compare_tables(left, right, ["id"], mapping={"v": "w"})
    assert m.first()["v_mismatch"] == 0


def test_stats_cli(tmp_path):
    out = subprocess.run(
        [
            sys.executable, os.path.join(ROOT, "jobs", "stats.py"), "compare",
            "--left", "/root/testdata/sf0.001/events.parquet",
            "--right", "/root/testdata/sf0.001/events.parquet",
            "--keys", "event_id",
        ],
        capture_output=True, text=True, cwd=ROOT,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    m = json.loads([ln for ln in out.stdout.splitlines() if ln.startswith("{")][0])
    assert m["value_mismatch"] == 0 and m["event_type_mismatch"] == 0
