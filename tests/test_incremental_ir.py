"""Incremental IR-cache backfill: equivalence with the recompute runner,
scan-once day materialization, empty-day tracking, late-data refresh,
semantic-hash invalidation."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from chronon_spark.api.types import (
    Aggregation,
    EventSource,
    GroupBy,
    Operation,
    Query,
    Window,
)
from chronon_spark.operators.incremental import run_group_by_backfill_incremental
from chronon_spark.runner import run_group_by_backfill
from chronon_spark.sources.warehouse import Warehouse

MS_DAY = 86_400_000
T0 = 1_700_000_000_000  # 2023-11-14

AGGS = (
    Aggregation("v", Operation.SUM, windows=(Window(7),)),
    Aggregation("v", Operation.AVERAGE, windows=(Window(3),)),
    Aggregation("v", Operation.COUNT, windows=(None,)),  # unbounded
    Aggregation("c", Operation.UNIQUE_COUNT, windows=(Window(5),)),
    Aggregation("c", Operation.HISTOGRAM, windows=(Window(7),)),
)


def _gb(name="inc_gb", aggs=AGGS):
    return GroupBy(
        name=name,
        sources=(EventSource(table="inc_events", query=Query(time_column="ts")),),
        key_columns=("user",),
        aggregations=aggs,
    )


@pytest.fixture(scope="module")
def events(spark):
    rng = np.random.default_rng(23)
    n = 500
    ev = pd.DataFrame(
        {
            "user": [f"u{i}" for i in rng.integers(0, 4, n)],
            "ts": (T0 + rng.integers(0, 20 * MS_DAY, n)).astype(np.int64),
            "v": rng.integers(1, 40, n).astype(float),
            "c": rng.choice(list("xyzw"), n),
        }
    )
    # leave day 2023-11-18 completely empty (tests empty-day tracking)
    hole_lo = T0 + int(3.2 * MS_DAY)
    ev = ev[~((ev.ts >= T0 + 3 * MS_DAY) & (ev.ts < T0 + 4 * MS_DAY))]
    df = spark.createDataFrame(ev).withColumn(
        "ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd")
    )
    df.createOrReplaceTempView("inc_events")
    return ev


def _rows(wh, table, cols):
    return sorted(tuple(r) for r in wh.read(table).select(*cols).collect())


START, END, EXT = "2023-11-20", "2023-11-28", "2023-12-02"


def test_incremental_equals_recompute(spark, events, tmp_path):
    gb = _gb()
    wh_a = Warehouse(spark, str(tmp_path / "a"))
    wh_b = Warehouse(spark, str(tmp_path / "b"))
    run_group_by_backfill(spark, wh_a, gb, START, END)
    _, mat = run_group_by_backfill_incremental(spark, wh_b, gb, START, END)
    cols = ["user", "ds"] + [p.output_column for p in gb.unpacked()
                             if p.operation is not Operation.HISTOGRAM]
    assert _rows(wh_a, gb.name, cols) == _rows(wh_b, gb.name, cols)
    # histogram maps compare via sorted items
    ha = {(r["user"], r["ds"]): r["c_histogram_7d"] for r in wh_a.read(gb.name).collect()}
    hb = {(r["user"], r["ds"]): r["c_histogram_7d"] for r in wh_b.read(gb.name).collect()}
    assert set(ha) == set(hb)
    assert all(
        (ha[k] is None and hb[k] is None)
        or sorted(ha[k].items()) == sorted(hb[k].items())
        for k in ha
    )
    # unbounded window ⇒ IR days materialized from the first event day
    assert min(mat) == min(events["ts"].apply(
        lambda t: pd.Timestamp(t, unit="ms").strftime("%Y-%m-%d")
    ))
    # empty day tracked as done (lineage) even with no partition written
    assert "2023-11-17" in mat or "2023-11-18" in mat  # the emptied day span


def test_incremental_extends_scan_once(spark, events, tmp_path):
    gb = _gb()
    wh = Warehouse(spark, str(tmp_path / "w"))
    _, mat1 = run_group_by_backfill_incremental(spark, wh, gb, START, END)
    # extension: ONLY the new days materialize
    _, mat2 = run_group_by_backfill_incremental(spark, wh, gb, START, EXT)
    assert set(mat2).isdisjoint(mat1)
    assert all(d > END for d in mat2)
    # idempotent re-run: nothing new
    _, mat3 = run_group_by_backfill_incremental(spark, wh, gb, START, EXT)
    assert mat3 == []
    # and the extended output matches full recompute
    wh_r = Warehouse(spark, str(tmp_path / "r"))
    run_group_by_backfill(spark, wh_r, gb, START, EXT)
    cols = ["user", "ds", "v_sum_7d", "v_average_3d", "v_count", "c_unique_count_5d"]
    assert _rows(wh_r, gb.name, cols) == _rows(wh, gb.name, cols)


def test_incremental_refresh_late_data(spark, events, tmp_path):
    gb = _gb(aggs=(Aggregation("v", Operation.SUM, windows=(Window(7),)),))
    wh = Warehouse(spark, str(tmp_path / "w"))
    run_group_by_backfill_incremental(spark, wh, gb, START, END)
    before = dict(
        (tuple(r[:2]), r[2]) for r in _rows(wh, gb.name, ["user", "ds", "v_sum_7d"])
    )
    # late event lands on 2023-11-21 for u0
    late_ts = T0 + 7 * MS_DAY + 1000
    late = pd.DataFrame({"user": ["u0"], "ts": [late_ts], "v": [1000.0],
                         "c": ["x"]})
    all_ev = pd.concat([events, late], ignore_index=True)
    spark.createDataFrame(all_ev).withColumn(
        "ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd")
    ).createOrReplaceTempView("inc_events")
    late_ds = pd.Timestamp(late_ts, unit="ms").strftime("%Y-%m-%d")
    # invalidate the late day's IR + the output days it influences
    affected = [d for d in pd.date_range(late_ds, periods=7).strftime("%Y-%m-%d")
                if START <= d <= END]
    wh.invalidate_partitions(gb.name, affected)
    _, mat = run_group_by_backfill_incremental(
        spark, wh, gb, START, END, refresh_days=[late_ds]
    )
    assert mat == [late_ds]
    after = dict(
        (tuple(r[:2]), r[2]) for r in _rows(wh, gb.name, ["user", "ds", "v_sum_7d"])
    )
    changed = {k for k in after if after[k] != before.get(k)}
    assert changed and all(k[0] == "u0" and k[1] in affected for k in changed)
    for k in changed:
        assert after[k] == pytest.approx(before[k] + 1000.0) or before.get(k) is None
    # restore the shared view for other tests
    spark.createDataFrame(events).withColumn(
        "ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd")
    ).createOrReplaceTempView("inc_events")


def test_incremental_semantic_invalidation(spark, events, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "w"))
    gb1 = _gb(aggs=(Aggregation("v", Operation.SUM, windows=(Window(7),)),))
    _, mat1 = run_group_by_backfill_incremental(spark, wh, gb1, START, END)
    assert mat1
    gb2 = _gb(aggs=(Aggregation("v", Operation.SUM, windows=(Window(3),)),))
    _, mat2 = run_group_by_backfill_incremental(spark, wh, gb2, START, END)
    assert mat2  # cache dropped and rebuilt under the new hash


def test_incremental_rejects_unsupported(spark, events, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "w"))
    gb = _gb(aggs=(Aggregation("v", Operation.SUM, windows=(Window(7),), buckets=("c",)),))
    with pytest.raises(ValueError, match="plain aggregations only"):
        run_group_by_backfill_incremental(spark, wh, gb, START, END)
