"""Analyzer checks + spark-submit packaging/CLI smoke."""

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from chronon_spark.analyzer import hot_keys, uniqueness_audit, validate_group_by
from chronon_spark.api.types import Aggregation, EventSource, GroupBy, Operation

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_validate_group_by(spark):
    df = spark.createDataFrame([("u", 1, 2.0)], "user string, ts long, v double")
    gb_ok = GroupBy(
        name="a", sources=(EventSource(table="t"),), key_columns=("user",),
        aggregations=(Aggregation("v", Operation.SUM),),
    )
    assert validate_group_by(gb_ok, df) == []
    gb_bad = GroupBy(
        name="b", sources=(EventSource(table="t"),), key_columns=("nope",),
        aggregations=(Aggregation("missing", Operation.SUM), Aggregation("v", Operation.SUM, buckets=("ts",))),
    )
    probs = validate_group_by(gb_bad, df)
    assert any("nope" in p for p in probs)
    assert any("missing" in p for p in probs)
    assert any("must be string" in p for p in probs)


def test_hot_keys_and_uniqueness(spark):
    rows = [("hot", i) for i in range(900)] + [(f"u{i}", i) for i in range(100)]
    df = spark.createDataFrame(rows, "user string, ts long")
    hk = hot_keys(df, ["user"], top=5, min_share=0.05).collect()
    assert hk[0]["__key"] == "hot" and hk[0]["n"] == 900
    dup = spark.createDataFrame([("u", 1), ("u", 1), ("u", 2)], "user string, ts long")
    audit = uniqueness_audit(dup, ["user"])
    assert audit == {"rows": 3, "distinct_key_ts": 2, "duplicates": 1, "duplicate_share": round(1 / 3, 6)}


def test_make_dist_and_cli(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "make_dist.py")],
        capture_output=True, text=True, cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr
    zpath = out.stdout.strip()
    assert os.path.exists(zpath) and os.path.getsize(zpath) > 10_000

    # end-to-end CLI smoke: config module + backfill job in a subprocess
    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        "from chronon_spark.api.types import *\n"
        "gb = GroupBy(name='cli_gb',\n"
        "  sources=(EventSource(table='/root/testdata/sf0.001/events.parquet',\n"
        "    query=Query(selects={'user_id': None, 'value': None},\n"
        "                time_column='unix_millis(cast(ts as timestamp))')),),\n"
        "  key_columns=('user_id',),\n"
        "  aggregations=(Aggregation('value', Operation.SUM, windows=(Window(7),)),))\n"
    )
    wh = tmp_path / "wh"
    out = subprocess.run(
        [
            sys.executable, os.path.join(ROOT, "jobs", "backfill.py"),
            "--config", str(cfg), "--name", "cli_gb",
            "--start", "2024-01-10", "--end", "2024-01-12",
            "--warehouse", str(wh),
        ],
        capture_output=True, text=True, cwd=ROOT,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "done: cli_gb partitions [2024-01-10 .. 2024-01-12] (3)" in out.stdout


def test_backfill_cli_incremental(tmp_path):
    """--incremental smoke: IR cache materializes, output lands, second
    run materializes nothing."""
    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        "from chronon_spark.api.types import *\n"
        "gb = GroupBy(name='cli_inc_gb',\n"
        "  sources=(EventSource(table='/root/testdata/sf0.001/events.parquet',\n"
        "    query=Query(selects={'user_id': None, 'value': None},\n"
        "                time_column='unix_millis(cast(ts as timestamp))')),),\n"
        "  key_columns=('user_id',),\n"
        "  aggregations=(Aggregation('value', Operation.SUM, windows=(Window(7),)),))\n"
    )
    wh = tmp_path / "wh"
    args = [
        sys.executable, os.path.join(ROOT, "jobs", "backfill.py"),
        "--config", str(cfg), "--name", "cli_inc_gb",
        "--start", "2024-01-10", "--end", "2024-01-12",
        "--warehouse", str(wh), "--incremental",
    ]
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    out = subprocess.run(args, capture_output=True, text=True, cwd=ROOT, env=env, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "done: cli_inc_gb partitions [2024-01-10 .. 2024-01-12] (3)" in out.stdout
    assert "ir days materialized this run: 9" in out.stdout  # 7d lookback + 3 output days
    out2 = subprocess.run(args, capture_output=True, text=True, cwd=ROOT, env=env, timeout=300)
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert "ir days materialized this run: 0" in out2.stdout


def test_backfill_cli_tile_cache(tmp_path):
    """--tile-cache smoke on a temporal join config."""
    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        "from chronon_spark.api.types import *\n"
        "src = EventSource(table='/root/testdata/sf0.001/events.parquet',\n"
        "  query=Query(selects={'user_id': None, 'value': None},\n"
        "              time_column='unix_millis(cast(ts as timestamp))'))\n"
        "gb = GroupBy(name='cli_tc_gb', sources=(src,), key_columns=('user_id',),\n"
        "  aggregations=(Aggregation('value', Operation.SUM, windows=(Window(7),)),),\n"
        "  accuracy=Accuracy.TEMPORAL)\n"
        "j = Join(name='cli_tc_join', left=src, right_parts=(JoinPart(gb),))\n"
    )
    wh = tmp_path / "wh"
    out = subprocess.run(
        [
            sys.executable, os.path.join(ROOT, "jobs", "backfill.py"),
            "--config", str(cfg), "--name", "cli_tc_join",
            "--start", "2024-01-10", "--end", "2024-01-11",
            "--warehouse", str(wh), "--tile-cache",
        ],
        capture_output=True, text=True, cwd=ROOT,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "done: cli_tc_join partitions [2024-01-10 .. 2024-01-11] (2)" in out.stdout
    assert os.path.isdir(os.path.join(wh, "cli_tc_gb__tiles5m"))


def test_backfill_cli_materialize_tiles(tmp_path):
    """--materialize-tiles warms the tile cache without a backfill."""
    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        "from chronon_spark.api.types import *\n"
        "src = EventSource(table='/root/testdata/sf0.001/events.parquet',\n"
        "  query=Query(selects={'user_id': None, 'value': None},\n"
        "              time_column='unix_millis(cast(ts as timestamp))'))\n"
        "gb = GroupBy(name='cli_mt_gb', sources=(src,), key_columns=('user_id',),\n"
        "  aggregations=(Aggregation('value', Operation.SUM, windows=(Window(7),)),),\n"
        "  accuracy=Accuracy.TEMPORAL)\n"
    )
    wh = tmp_path / "wh"
    out = subprocess.run(
        [
            sys.executable, os.path.join(ROOT, "jobs", "backfill.py"),
            "--config", str(cfg), "--name", "cli_mt_gb",
            "--start", "2024-01-10", "--end", "2024-01-12",
            "--warehouse", str(wh), "--materialize-tiles",
        ],
        capture_output=True, text=True, cwd=ROOT,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "tile days materialized this run: 3" in out.stdout
    assert os.path.isdir(os.path.join(wh, "cli_mt_gb__tiles5m"))


def test_validate_join():
    from chronon_spark.analyzer import validate_join
    from chronon_spark.api.types import (
        Accuracy,
        Aggregation,
        BootstrapPart,
        EventSource,
        GroupBy,
        Join,
        JoinPart,
        Operation,
        Window,
    )

    gb = GroupBy(
        name="vgb",
        sources=(EventSource(table="t"),),
        key_columns=("user",),
        aggregations=(Aggregation("v", Operation.SUM, windows=(Window(7),)),),
        accuracy=Accuracy.TEMPORAL,
    )
    ok = Join(name="vj", left=EventSource(table="l"), right_parts=(JoinPart(gb),))
    assert validate_join(ok) == []

    bad = Join(
        name="vj2",
        left=EventSource(table="l"),
        right_parts=(
            JoinPart(gb, key_mapping={"uid": "nope"}),   # bad mapping target
            JoinPart(gb),                                 # duplicate outputs
            JoinPart(gb),
        ),
        bootstrap_parts=(BootstrapPart(table="b", key_columns=()),),
    )
    problems = validate_join(bad)
    assert any("key_mapping targets 'nope'" in p for p in problems)
    assert any("duplicate output column" in p for p in problems)
    assert any("no key columns" in p for p in problems)


def test_skew_advice(spark):
    """skew_advice names the applicable mitigation: time slicing when the
    GroupBy is sliceable (incl. algebraic unbounded via baseline IRs),
    window-or-exclude when set-like unbounded state blocks it."""
    import pandas as pd

    from chronon_spark.analyzer import skew_advice
    from chronon_spark.api.types import Aggregation, EventSource, GroupBy, Operation, Window

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "user": ["hot"] * 80 + [f"u{i}" for i in range(20)],
                "ts": list(range(100)),
                "v": [1.0] * 100,
            }
        )
    )
    gb_ok = GroupBy(
        name="a", sources=(EventSource(table="t"),), key_columns=("user",),
        aggregations=(
            Aggregation("v", Operation.SUM, windows=(Window(7), None)),
            Aggregation("v", Operation.LAST, windows=(None,)),
        ),
    )
    advice = skew_advice(gb_ok, df)
    assert len(advice) == 1 and "time slicing applies" in advice[0]
    assert "baseline IRs for 2 unbounded" in advice[0]
    assert "hot (80.0%)" in advice[0]

    gb_blocked = GroupBy(
        name="b", sources=(EventSource(table="t"),), key_columns=("user",),
        aggregations=(Aggregation("v", Operation.UNIQUE_COUNT, windows=(None,)),),
    )
    advice = skew_advice(gb_blocked, df)
    assert len(advice) == 1 and "NOT available" in advice[0]
    assert "v_unique_count" in advice[0]

    # no heavy hitters -> no advice
    flat = spark.createDataFrame(
        pd.DataFrame({"user": [f"u{i}" for i in range(200)], "ts": range(200), "v": [1.0] * 200})
    )
    assert skew_advice(gb_ok, flat) == []


def test_serving_plan_classification():
    from chronon_spark.analyzer import serving_plan
    from chronon_spark.api.types import Window

    gb = GroupBy(
        name="sp",
        sources=(EventSource(table="t"),),
        key_columns=("u",),
        aggregations=(
            Aggregation("v", Operation.SUM, windows=(Window(7),)),
            Aggregation("v", Operation.TOP_K, arg_map={"k": 3}, windows=(Window(7),)),
            Aggregation("v", Operation.APPROX_PERCENTILE, windows=(None,)),
            Aggregation("v", Operation.UNIQUE_COUNT, windows=(Window(7),)),
            Aggregation("v", Operation.SUM, windows=(Window(7),), buckets=("b",)),
            Aggregation(
                "v", Operation.TOP_K, arg_map={"k": 3}, windows=(Window(7),), buckets=("b",)
            ),
            Aggregation(
                "v", Operation.APPROX_HISTOGRAM_K, windows=(Window(7),), buckets=("b",)
            ),
            Aggregation("l", Operation.AVERAGE, element_wise=True),
            Aggregation("l", Operation.UNIQUE_COUNT, element_wise=True),
        ),
    )
    plan = serving_plan(gb)
    assert set(plan["kv_uploadable"]) == {
        "v_sum_7d",
        "v_top_k_3_7d",
        "v_approx_percentile",
        "v_sum_7d_by_b",  # bucketed scalar family is KV-servable
        "v_top_k_3_7d_by_b",  # bucketed k-lists too
        "v_approx_histogram_k_7d_by_b",  # round-6: flat-column densify
        "l_average",  # element-wise rides the positional-bucket frames
    }
    reasons = {d["column"]: d["reason"] for d in plan["lambda_tile_only"]}
    assert "unbounded exact IR" in reasons["v_unique_count_7d"]
    assert "element-wise exact op" in reasons["l_unique_count"]
    assert plan["fully_kv_servable"] is False
    # an all-bounded config is fully KV-servable
    gb2 = GroupBy(
        name="sp2",
        sources=(EventSource(table="t"),),
        key_columns=("u",),
        aggregations=(Aggregation("v", Operation.SUM, windows=(Window(7),)),),
    )
    assert serving_plan(gb2)["fully_kv_servable"] is True


def test_upload_cli_roundtrip(tmp_path):
    """jobs/upload.py: upload verb writes the bounded per-key artifact;
    fetch verb serves a parquet of requests from it + the pruned head."""
    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        "from chronon_spark.api.types import *\n"
        "gb = GroupBy(name='cli_up_gb',\n"
        "  sources=(EventSource(table='/root/testdata/sf0.001/events.parquet',\n"
        "    query=Query(selects={'user_id': None, 'value': None},\n"
        "                time_column='unix_millis(cast(ts as timestamp))')),),\n"
        "  key_columns=('user_id',),\n"
        "  aggregations=(Aggregation('value', Operation.SUM, windows=(Window(7),)),\n"
        "                Aggregation('value', Operation.TOP_K, arg_map={'k': 3},\n"
        "                            windows=(Window(7),)),),\n"
        "  accuracy=Accuracy.TEMPORAL)\n"
    )
    wh = tmp_path / "wh"
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    up = subprocess.run(
        [
            sys.executable, os.path.join(ROOT, "jobs", "upload.py"), "upload",
            "--config", str(cfg), "--name", "cli_up_gb",
            "--end-ds", "2024-01-29", "--warehouse", str(wh),
        ],
        capture_output=True, text=True, cwd=ROOT, env=env, timeout=300,
    )
    assert up.returncode == 0, up.stderr[-2000:]
    assert "done: cli_up_gb__upload ds=2024-01-29" in up.stdout
    assert os.path.isdir(os.path.join(wh, "cli_up_gb__upload"))

    # requests: last-day events as (user_id, ts) points
    import duckdb

    qpath = str(tmp_path / "requests.parquet")
    duckdb.sql(
        "COPY (SELECT user_id, epoch_ms(ts) AS ts, event_id AS request_id "
        "FROM read_parquet('/root/testdata/sf0.001/events.parquet') "
        "WHERE CAST(ts AS DATE) = DATE '2024-01-30') TO '" + qpath + "' (FORMAT PARQUET)"
    )
    outp = str(tmp_path / "served.parquet")
    fe = subprocess.run(
        [
            sys.executable, os.path.join(ROOT, "jobs", "upload.py"), "fetch",
            "--config", str(cfg), "--name", "cli_up_gb",
            "--end-ds", "2024-01-29", "--warehouse", str(wh),
            "--queries", qpath, "--out", outp,
        ],
        capture_output=True, text=True, cwd=ROOT, env=env, timeout=300,
    )
    assert fe.returncode == 0, fe.stderr[-2000:]
    n_q = duckdb.sql(f"SELECT count(*) FROM read_parquet('{qpath}')").fetchone()[0]
    n_s = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{outp}/*.parquet')"
    ).fetchone()[0]
    assert n_s == n_q > 0
    assert f"served {n_q} requests" in fe.stdout
