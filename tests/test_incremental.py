"""Incremental backfill: unfilled-range planning, resume-after-kill
produces identical output, semantic-hash invalidation."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from chronon_spark.api.types import Aggregation, EventSource, GroupBy, Operation, Query, Window
from chronon_spark.plans.ranges import PartitionRange, chunk_holes, unfilled_ranges
from chronon_spark.runner import run_group_by_backfill
from chronon_spark.sources.warehouse import Warehouse

MS_DAY = 86_400_000
T0 = 1_700_000_000_000


def test_range_math():
    r = PartitionRange("2024-01-01", "2024-01-10")
    assert len(r.days()) == 10
    assert [s.start for s in r.steps(4)] == ["2024-01-01", "2024-01-05", "2024-01-09"]
    assert r.steps(4)[-1].end == "2024-01-10"
    holes = chunk_holes(["2024-01-03", "2024-01-01", "2024-01-02", "2024-01-07"])
    assert holes == [PartitionRange("2024-01-01", "2024-01-03"), PartitionRange("2024-01-07", "2024-01-07")]
    uf = unfilled_ranges({"2024-01-02", "2024-01-03"}, r)
    assert uf[0] == PartitionRange("2024-01-01", "2024-01-01")
    assert uf[1] == PartitionRange("2024-01-04", "2024-01-10")


@pytest.fixture()
def env(spark, tmp_path):
    rng = np.random.default_rng(3)
    n = 400
    ev = pd.DataFrame(
        {
            "user": [f"u{i}" for i in rng.integers(0, 4, n)],
            "ts": (T0 + rng.integers(0, 20 * MS_DAY, n)).astype(np.int64),
            "v": rng.integers(1, 50, n).astype(float),
        }
    )
    df = spark.createDataFrame(ev).withColumn(
        "ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd")
    )
    df.createOrReplaceTempView("ev_inc")
    wh = Warehouse(spark, str(tmp_path / "wh"))
    gb = GroupBy(
        name="inc_gb",
        sources=(EventSource(table="ev_inc", query=Query(time_column="ts")),),
        key_columns=("user",),
        aggregations=(Aggregation("v", Operation.SUM, windows=(Window(7),)),),
    )
    return wh, gb


START, END = "2023-11-20", "2023-12-04"


def _snapshot(wh, table):
    df = wh.read(table)
    return sorted(tuple(r) for r in df.select("user", "ds", "v_sum_7d").collect())


def test_resume_identical(spark, env):
    wh, gb = env
    # full run in one shot
    run_group_by_backfill(spark, wh, gb, START, END)
    full = _snapshot(wh, "inc_gb")
    parts_full = wh.partitions("inc_gb")
    assert parts_full[0] == START and parts_full[-1] == END

    # simulated kill: first run covers only part of the range, second resumes
    wh2 = Warehouse(spark, wh.root + "2")
    run_group_by_backfill(spark, wh2, gb, START, "2023-11-25")
    assert wh2.partitions("inc_gb")[-1] == "2023-11-25"
    run_group_by_backfill(spark, wh2, gb, START, END)
    assert _snapshot(wh2, "inc_gb") == full

    # already-complete rerun is a no-op (lineage timestamps untouched)
    lin_before = wh2.lineage("inc_gb")
    run_group_by_backfill(spark, wh2, gb, START, END)
    assert wh2.lineage("inc_gb") == lin_before


def test_semantic_hash_invalidation(spark, env):
    wh, gb = env
    run_group_by_backfill(spark, wh, gb, START, END)
    assert all(v["semantic_hash"] == gb.semantic_hash() for v in wh.lineage("inc_gb").values())
    # changed config (different window) → table dropped and recomputed
    gb2 = GroupBy(
        name="inc_gb",
        sources=gb.sources,
        key_columns=gb.key_columns,
        aggregations=(Aggregation("v", Operation.SUM, windows=(Window(14),)),),
    )
    run_group_by_backfill(spark, wh, gb2, START, END)
    cols = wh.read("inc_gb").columns
    assert "v_sum_14d" in cols and "v_sum_7d" not in cols
