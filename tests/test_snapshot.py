"""Snapshot-accuracy GroupBy vs the naive oracle.

Snapshot semantics (spark/GroupBy.scala:107-114 + oracle SQL in the
reference's GroupByTest.scala:124-136): the feature row for (key, ds)
aggregates events with ts strictly before (ds+1) 00:00 UTC, windows in
whole days. Equivalent to the temporal sawtooth evaluated at
qt = midnight(ds+1) — so the same NaiveAggregator port is the oracle.
"""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from chronon_spark.api.types import (
    Aggregation,
    EventSource,
    GroupBy,
    Operation,
    Window,
)
from chronon_spark.operators.groupby import snapshot_events
from tests.naive_oracle import allclose_feature, naive_feature

MS_DAY = 86_400_000
T0 = 1_700_000_000_000  # 2023-11-14 22:13:20 UTC


def _midnight_after(ds: str) -> int:
    d = dt.date.fromisoformat(ds) + dt.timedelta(days=1)
    return int(dt.datetime(d.year, d.month, d.day, tzinfo=dt.timezone.utc).timestamp() * 1000)


AGGS = (
    Aggregation("price", Operation.COUNT, windows=(None, Window(7))),
    Aggregation("price", Operation.SUM, windows=(Window(7), Window(14))),
    Aggregation("price", Operation.AVERAGE, windows=(Window(3),)),
    Aggregation("price", Operation.MIN, windows=(Window(7),)),
    Aggregation("price", Operation.MAX, windows=(None,)),
    Aggregation("price", Operation.VARIANCE, windows=(Window(7),)),
    Aggregation("price", Operation.SKEW, windows=(Window(7),)),
    Aggregation("price", Operation.KURTOSIS, windows=(Window(7),)),
    Aggregation("price", Operation.LAST, windows=(Window(7),)),
    Aggregation("price", Operation.FIRST, windows=(Window(7),)),
    Aggregation("price", Operation.LAST_K, arg_map={"k": 3}, windows=(Window(7),)),
    Aggregation("price", Operation.FIRST_K, arg_map={"k": 3}, windows=(Window(7),)),
    Aggregation("price", Operation.TOP_K, arg_map={"k": 3}, windows=(Window(7),)),
    Aggregation("price", Operation.BOTTOM_K, arg_map={"k": 3}, windows=(Window(7),)),
    Aggregation("price", Operation.UNIQUE_COUNT, windows=(Window(7),)),
    Aggregation("price", Operation.BOUNDED_UNIQUE_COUNT, arg_map={"k": 4}, windows=(Window(7),)),
    Aggregation(
        "price", Operation.APPROX_PERCENTILE, arg_map={"percentiles": [0.5, 0.9]},
        windows=(Window(7),),
    ),
    Aggregation("cat", Operation.HISTOGRAM, windows=(Window(7),)),
    Aggregation("cat", Operation.APPROX_HISTOGRAM_K, arg_map={"k": 2}, windows=(Window(7),)),
    Aggregation("price", Operation.SUM, windows=(Window(7),), buckets=("cat",)),
)

START, END = "2023-11-20", "2023-12-18"


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(11)
    n = 600
    ev = pd.DataFrame(
        {
            "user": [f"u{i}" for i in rng.integers(0, 5, n)],
            "ts": (T0 + rng.integers(0, 30 * MS_DAY, n)).astype(np.int64),
            "price": rng.integers(1, 300, n).astype(float),
            "cat": rng.choice(["a", "b", "c"], n),
        }
    )
    ev.loc[ev.index % 23 == 0, "price"] = None
    ev_df = spark.createDataFrame(ev).withColumn(
        "ds", F.date_format(F.timestamp_millis(F.col("ts")), "yyyy-MM-dd")
    )
    gb = GroupBy(
        name="s", sources=(EventSource(table="ev"),), key_columns=("user",), aggregations=AGGS
    )
    out = [r.asDict() for r in snapshot_events(spark, gb, ev_df, START, END).collect()]
    return ev, gb, out


def test_vs_naive_oracle(data):
    ev, gb, out = data
    parts = gb.unpacked()
    by_user = {u: g.sort_values("ts", kind="mergesort") for u, g in ev.groupby("user")}
    assert len(out) > 0
    mismatches = []
    for row in out:
        g = by_user[row["user"]]
        qt = _midnight_after(row["ds"])
        for p in parts:
            got = row[p.output_column]
            exp = naive_feature(
                p,
                g["ts"].to_numpy(np.int64),
                g[p.input_column].to_numpy(object),
                qt,
                buckets=g["cat"].to_numpy(object) if p.bucket else None,
            )
            if not allclose_feature(got, exp):
                mismatches.append((row["user"], row["ds"], p.output_column, got, exp))
    assert not mismatches, f"{len(mismatches)} mismatches, first 5: {mismatches[:5]}"


def test_spine_coverage(data):
    """With an unbounded window present, every (key, ds) from the key's
    first event day through END must be emitted exactly once."""
    ev, gb, out = data
    seen = {(r["user"], r["ds"]) for r in out}
    assert len(seen) == len(out), "duplicate (key, ds) rows"
    start_d = dt.date.fromisoformat(START)
    end_d = dt.date.fromisoformat(END)
    for user, g in ev.groupby("user"):
        first = dt.datetime.fromtimestamp(g["ts"].min() / 1000, tz=dt.timezone.utc).date()
        d = max(first, start_d)
        while d <= end_d:
            assert (user, d.isoformat()) in seen, f"missing {user} {d}"
            d += dt.timedelta(days=1)


def test_approx_histogram_error_bound(spark):
    """Misra-Gries guarantee of the capped APPROX_HISTOGRAM_K day IRs:
    under per-day truncation (cap = 8k), every retained key satisfies
    est ≤ true ≤ est + error_bound after the window merge, the bound is
    nonzero (truncation really happened), and the sentinel never leaks
    into the finalized map."""
    from pyspark.sql import Window as W

    from chronon_spark.api.types import AggregationPart
    from chronon_spark.functions.aggregations import (
        OP_SPECS,
        approx_histogram_error_bound,
    )

    # one user, 3 days, 40 distinct cats/day, skewed counts; cap = 8·k = 8
    rows = []
    for day in range(3):
        for c in range(40):
            for _ in range(1 + (40 - c) * 2 // (day + 2)):
                rows.append(("u0", day, f"cat{c:02d}"))
    pdf = pd.DataFrame(rows, columns=["user", "dd", "cat"])
    df = spark.createDataFrame(pdf)
    part = AggregationPart("cat", Operation.APPROX_HISTOGRAM_K, {"k": 1}, Window(7), None)
    spec = OP_SPECS[Operation.APPROX_HISTOGRAM_K]
    daily = df.groupBy("user", "dd").agg(spec.ir("cat", part).alias("__ir"))
    w = W.partitionBy("user").orderBy("dd").rangeBetween(-6, 0)
    merged = daily.withColumn("__m", spec.merge("__ir", part).over(w))
    out = (
        merged.withColumn("__f", spec.finalize("__m", part))
        .withColumn("__err", approx_histogram_error_bound("__m"))
        .orderBy(F.desc("dd"))
        .first()
    )
    est_map, err = out["__f"], out["__err"]
    assert err > 0 and len(est_map) == 1
    true_counts = pdf["cat"].value_counts()
    for key, est in est_map.items():
        assert "\x00" not in key
        t = int(true_counts[key])
        assert est <= t <= est + err, (key, est, t, err)

    # no-truncation case: bound is exactly 0 and counts are exact
    small = spark.createDataFrame(pdf[pdf["cat"].isin(["cat00", "cat01"])])
    sdaily = small.groupBy("user", "dd").agg(spec.ir("cat", part).alias("__ir"))
    sm = sdaily.withColumn("__m", spec.merge("__ir", part).over(w))
    srow = (
        sm.withColumn("__f", spec.finalize("__m", part))
        .withColumn("__err", approx_histogram_error_bound("__m"))
        .orderBy(F.desc("dd"))
        .first()
    )
    assert srow["__err"] == 0
    assert srow["__f"]["cat00"] == int(true_counts["cat00"])
