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


def test_consistency_job(spark):
    """OOC consistency (ConsistencyJob analogue): logged-vs-offline
    recompute catches exactly the perturbed rows, and the deterministic
    sampler picks a stable subset across runs."""
    import numpy as np

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
    from chronon_spark.operators.stats import consistency_job
    from chronon_spark.streaming.enrich import enrich_batch

    MS_DAY = 86_400_000
    T0 = 1_700_000_000_000
    rng = np.random.default_rng(47)
    n = 300
    ev = pd.DataFrame(
        {
            "user": [f"u{i}" for i in rng.integers(0, 6, n)],
            "ts": (T0 + rng.integers(0, 10 * MS_DAY, n)).astype("int64"),
            "amount": rng.integers(1, 40, n).astype(float),
        }
    )
    spark.createDataFrame(ev).withColumn(
        "ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd")
    ).createOrReplaceTempView("cons_events")
    gb = GroupBy(
        name="cons_gb",
        sources=(EventSource(table="cons_events", query=Query(time_column="ts")),),
        key_columns=("user",),
        aggregations=(
            Aggregation("amount", Operation.SUM, windows=(Window(3), None)),
            Aggregation("amount", Operation.COUNT, windows=(None,)),
        ),
        accuracy=Accuracy.TEMPORAL,
    )
    join = Join(
        name="cons_join", left=EventSource(table="unused"), right_parts=(JoinPart(gb),)
    )

    # the "served" log = ground-truth offline values on 60 query rows
    q = pd.DataFrame(
        {
            "user": [f"u{i % 6}" for i in range(60)],
            "ts": (T0 + 2 * MS_DAY + np.arange(60) * 3_600_000).astype("int64"),
        }
    )
    truth = enrich_batch(spark, join, spark.createDataFrame(q)).toPandas()
    sum_col = [c for c in truth.columns if c.endswith("sum_3d")][0]
    cnt_col = [c for c in truth.columns if c.endswith("count")][0]

    # perturb the served sum on 7 rows where it is non-null
    logged = truth.copy()
    hit = logged.index[logged[sum_col].notna()][:7]
    logged.loc[hit, sum_col] = logged.loc[hit, sum_col] + 1.0
    comparison, metrics = consistency_job(spark, join, spark.createDataFrame(logged))
    m = metrics.first()
    assert m["total"] == 60
    assert m[f"{sum_col}_mismatch"] == 7
    assert m[f"{cnt_col}_mismatch"] == 0
    bad = comparison.filter(F.col(f"{sum_col}_left") != F.col(f"{sum_col}_right"))
    assert bad.count() == 7 and "user" in comparison.columns and "ts" in comparison.columns

    # deterministic sampling: same subset both runs, strictly smaller than full
    _, m1 = consistency_job(spark, join, spark.createDataFrame(logged), sample_percent=40.0)
    _, m2 = consistency_job(spark, join, spark.createDataFrame(logged), sample_percent=40.0)
    r1, r2 = m1.first(), m2.first()
    assert r1["total"] == r2["total"] < 60
    assert r1[f"{sum_col}_mismatch"] == r2[f"{sum_col}_mismatch"]


def test_consistency_cli(tmp_path):
    """`stats.py consistency` smoke: config-module Join + logged parquet
    in, metrics JSON out."""
    import numpy as np

    ev = pd.DataFrame(
        {
            "user": [f"u{i % 3}" for i in range(50)],
            "ts": (1_700_000_000_000 + np.arange(50) * 3_600_000).astype("int64"),
            "amount": np.arange(50).astype(float),
        }
    )
    ev["ds"] = pd.to_datetime(ev["ts"], unit="ms").dt.strftime("%Y-%m-%d")
    ev.to_parquet(tmp_path / "events.parquet")
    logged = pd.DataFrame(
        {
            "user": ["u0", "u1", "u2"],
            "ts": [1_700_000_000_000 + 40 * 3_600_000] * 3,
            "cons_cli_gb_amount_sum": [0.0, 0.0, 0.0],
        }
    )
    logged.to_parquet(tmp_path / "logged.parquet")
    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        "from chronon_spark.api.types import *\n"
        f"src = EventSource(table={str(tmp_path / 'events.parquet')!r}, query=Query(time_column='ts'))\n"
        "gb = GroupBy(name='cons_cli_gb', sources=(src,), key_columns=('user',),\n"
        "             aggregations=(Aggregation('amount', Operation.SUM, windows=(None,)),),\n"
        "             accuracy=Accuracy.TEMPORAL)\n"
        "j = Join(name='cons_cli_join', left=EventSource(table='unused'),\n"
        "         right_parts=(JoinPart(gb),))\n"
    )
    out = subprocess.run(
        [
            sys.executable, os.path.join(ROOT, "jobs", "stats.py"), "consistency",
            "--config", str(cfg), "--name", "cons_cli_join",
            "--logged", str(tmp_path / "logged.parquet"),
        ],
        capture_output=True, text=True, cwd=ROOT,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    m = json.loads([ln for ln in out.stdout.splitlines() if ln.startswith("{")][0])
    # served zeros vs real sums: every non-null offline row mismatches
    assert m["total"] == 3 and m["cons_cli_gb_amount_sum_mismatch"] == 3


def test_psi_drift(spark):
    """PSI (StatsGenerator.PSIKllSketch semantics): ~0 for identical
    distributions, large for a real shift, and the closed-form discrete
    case matches numpy."""
    import numpy as np

    from chronon_spark.operators.stats import drift_series, psi

    rng = np.random.default_rng(11)
    a = spark.createDataFrame(pd.DataFrame({"v": rng.normal(0, 1, 4000)}))
    b = spark.createDataFrame(pd.DataFrame({"v": rng.normal(0, 1, 4000)}))
    c = spark.createDataFrame(pd.DataFrame({"v": rng.normal(2.0, 1, 4000)}))
    # bins sized to the sample (expected noise PSI ~ 2*bins/n)
    same = psi(a, b, "v", bins=16)
    shifted = psi(a, c, "v", bins=16)
    assert same is not None and same < 0.10          # "little shift"
    assert shifted > 0.25                            # "action required"
    assert psi(a, a.filter("v > 1e9"), "v") is None  # empty side → None

    # day-over-day series: shift lands on day 3 only
    days = []
    for i, mu in enumerate([0.0, 0.0, 2.0, 2.0]):
        days.append(pd.DataFrame({"ds": f"2024-01-0{i+1}", "v": rng.normal(mu, 1, 3000)}))
    ser = {r["ds"]: r["psi"] for r in
           drift_series(spark, spark.createDataFrame(pd.concat(days)), "v").collect()}
    assert set(ser) == {"2024-01-02", "2024-01-03", "2024-01-04"}
    assert ser["2024-01-02"] < 0.10 and ser["2024-01-04"] < 0.10
    assert ser["2024-01-03"] > 0.25


def test_compare_edit_distance(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3], "t": ["kitten", "abc", None]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3], "t": ["sitting", "abc", "x"]})
    )
    _, m = compare_tables(left, right, ["id"])
    r = m.first()
    # rows with both present: (kitten,sitting)=3, (abc,abc)=0 → avg 1.5
    assert r["t_edit_distance"] == pytest.approx(1.5)
    assert r["t_edit_distance_norm"] == pytest.approx((3 / 7 + 0.0) / 2)


def test_drift_cli(tmp_path):
    import numpy as np

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "ds": ["2024-01-01"] * 500 + ["2024-01-02"] * 500,
            "v": np.concatenate([rng.normal(0, 1, 500), rng.normal(3, 1, 500)]),
        }
    )
    df.to_parquet(tmp_path / "t.parquet")
    out = subprocess.run(
        [
            sys.executable, os.path.join(ROOT, "jobs", "stats.py"), "drift",
            "--table", str(tmp_path / "t.parquet"), "--col", "v", "--bins", "16",
        ],
        capture_output=True, text=True, cwd=ROOT,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    m = json.loads([ln for ln in out.stdout.splitlines() if ln.startswith("{")][0])
    assert m["ds"] == "2024-01-02" and m["psi"] > 0.25


def test_percentile_modes(spark):
    """Default (approx) percentiles are bounded-memory percentile_approx —
    within GK rank tolerance of the exact mode, same array<double> schema."""
    import numpy as np

    vals = [float(x) for x in np.random.default_rng(7).normal(50, 10, 2000)]
    df = spark.createDataFrame(
        pd.DataFrame({"ds": ["2024-01-01"] * 2000, "k": ["a"] * 2000, "v": vals})
    )
    approx = column_summary(df, keys=("k",)).first()
    exact = column_summary(df, keys=("k",), percentile_mode="exact").first()
    a_schema = column_summary(df, keys=("k",)).schema["v__percentiles"].dataType.simpleString()
    e_schema = (
        column_summary(df, keys=("k",), percentile_mode="exact")
        .schema["v__percentiles"]
        .dataType.simpleString()
    )
    assert a_schema == e_schema == "array<double>"
    # accuracy=10000 ⇒ rank error ≤ n/10000 < 1 rank on 2000 values: the
    # approx answer must sit within one order-statistic of the exact one
    svals = sorted(vals)
    for a, e in zip(approx["v__percentiles"], exact["v__percentiles"]):
        lo = min(svals, key=lambda x: abs(x - e))
        assert abs(a - e) <= (svals[min(svals.index(lo) + 2, 1999)] - svals[max(svals.index(lo) - 2, 0)]) + 1e-9
    # the plan must NOT contain the exact percentile aggregate (the
    # unbounded-buffer scale-killer) in default mode
    plan = column_summary(df, keys=("k",))._jdf.queryExecution().executedPlan().toString()
    assert "percentile_approx" in plan


def test_summary_job_incremental(spark, tmp_path):
    """summary_job walks UNFILLED output partitions only (SummaryJob
    dailyRun contract): first run fills, re-run writes nothing, a new
    input day fills just that day; input-gap days get empty-day sidecars
    so they never re-read as unfilled."""
    from chronon_spark.operators.stats import summary_job
    from chronon_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    # input: days 01, 02, 04 — day 03 is a genuine input gap
    rows = []
    for ds, n in (("2024-01-01", 5), ("2024-01-02", 3), ("2024-01-04", 4)):
        rows += [{"ds": ds, "k": f"u{i}", "v": float(i)} for i in range(n)]
    wh.insert_partitions(spark.createDataFrame(pd.DataFrame(rows)), "ev")

    w1 = summary_job(spark, wh, "ev", "ev_summary", keys=("k",))
    assert w1 == ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
    out = {r["ds"]: r for r in wh.read("ev_summary").collect()}
    assert set(out) == {"2024-01-01", "2024-01-02", "2024-01-04"}
    assert out["2024-01-01"]["total_count"] == 5
    # the empty gap day is lineage-complete (row_count 0), not a hole
    assert wh.lineage("ev_summary")["2024-01-03"]["row_count"] == 0

    assert summary_job(spark, wh, "ev", "ev_summary", keys=("k",)) == []  # resume: no-op

    day5 = [{"ds": "2024-01-05", "k": f"u{i}", "v": 9.0} for i in range(2)]
    wh.insert_partitions(spark.createDataFrame(pd.DataFrame(day5)), "ev")
    w3 = summary_job(spark, wh, "ev", "ev_summary", keys=("k",))
    assert w3 == ["2024-01-05"]
    assert wh.read("ev_summary").filter("ds='2024-01-05'").first()["total_count"] == 2
