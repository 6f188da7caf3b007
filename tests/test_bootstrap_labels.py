"""Bootstrap seeding (bootstrap-wins coalesce) + forward-looking label join."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from chronon_spark.api.types import (
    Accuracy,
    Aggregation,
    BootstrapPart,
    EventSource,
    GroupBy,
    Join,
    JoinPart,
    LabelPart,
    Operation,
    Query,
    Window,
)
from chronon_spark.operators.join import join_backfill

MS_DAY = 86_400_000
T0 = 1_700_000_000_000  # 2023-11-14ish


@pytest.fixture(scope="module")
def env(spark):
    rng = np.random.default_rng(21)
    n = 400
    ev = pd.DataFrame(
        {
            "user": [f"u{i}" for i in rng.integers(0, 4, n)],
            "ts": (T0 + rng.integers(0, 20 * MS_DAY, n)).astype(np.int64),
            "amount": rng.integers(1, 100, n).astype(float),
        }
    )
    df = spark.createDataFrame(ev).withColumn(
        "ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd")
    )
    df.createOrReplaceTempView("bl_events")
    return ev


GB = GroupBy(
    name="amt",
    sources=(EventSource(table="bl_events", query=Query(time_column="ts")),),
    key_columns=("user",),
    aggregations=(Aggregation("amount", Operation.SUM, windows=(Window(7),)),),
    accuracy=Accuracy.TEMPORAL,
)

START, END = "2023-11-25", "2023-11-30"


def test_bootstrap_wins(spark, env):
    # precomputed override for u0 on every ds in range
    boot = spark.createDataFrame(
        [("u0", ds, 12345.0) for ds in ["2023-11-25", "2023-11-26", "2023-11-27", "2023-11-28", "2023-11-29", "2023-11-30"]],
        "user string, ds string, amt_amount_sum_7d double",
    )
    boot.createOrReplaceTempView("bl_boot")
    join = Join(
        name="blj",
        left=EventSource(table="bl_events", query=Query(selects={"user": None}, time_column="ts")),
        right_parts=(JoinPart(GB),),
        bootstrap_parts=(BootstrapPart(table="bl_boot", key_columns=("user", "ds")),),
    )
    out = join_backfill(spark, join, START, END)
    rows = out.collect()
    for r in rows:
        if r["user"] == "u0":
            assert r["amt_amount_sum_7d"] == 12345.0  # bootstrap wins
        else:
            assert r["amt_amount_sum_7d"] != 12345.0  # computed


def test_label_join_forward_looking(spark, env):
    label_gb = GroupBy(
        name="lbl",
        sources=(EventSource(table="bl_events", query=Query(time_column="ts")),),
        key_columns=("user",),
        aggregations=(Aggregation("amount", Operation.COUNT, windows=(Window(3),)),),
    )
    join = Join(
        name="blj2",
        left=EventSource(table="bl_events", query=Query(selects={"user": None}, time_column="ts")),
        right_parts=(JoinPart(GB),),
        label_part=LabelPart(group_by=label_gb, label_offsets=(3,)),
    )
    out = join_backfill(spark, join, START, END)
    assert "label_amount_count_3d_3d" in out.columns
    # oracle: label at ds+3 with 3d window counts events in days [ds+1, ds+3]
    ev = spark.table("bl_events")
    sample = [r for r in out.select("user", "ds", "label_amount_count_3d_3d").distinct().collect()]
    import datetime as dt

    for r in sample[:20]:
        d = dt.date.fromisoformat(r["ds"])
        lo, hi = (d + dt.timedelta(days=1)).isoformat(), (d + dt.timedelta(days=3)).isoformat()
        exp = ev.filter((F.col("user") == r["user"]) & F.col("ds").between(lo, hi)).count()
        got = r["label_amount_count_3d_3d"] or 0
        assert got == exp, (r, exp)


def test_bootstrap_covering_set_skips_rows(spark, env):
    """Covering-set skip-recompute (spark/Join.scala:464-584): rows whose
    part output columns are fully bootstrap-provided are excluded from the
    part's input; output values are unchanged."""
    from chronon_spark.operators.join import ROW_UID, bootstrap_fold, part_covered_expr

    boot = spark.createDataFrame(
        [("u0", ds, 12345.0) for ds in
         ["2023-11-25", "2023-11-26", "2023-11-27", "2023-11-28", "2023-11-29", "2023-11-30"]],
        "user string, ds string, amt_amount_sum_7d double",
    )
    boot.createOrReplaceTempView("bl_boot_cs")
    join = Join(
        name="blj3",
        left=EventSource(table="bl_events", query=Query(selects={"user": None}, time_column="ts")),
        right_parts=(JoinPart(GB),),
        bootstrap_parts=(BootstrapPart(table="bl_boot_cs", key_columns=("user", "ds")),),
    )
    left = (
        spark.table("bl_events")
        .selectExpr("user", "ts", "ds")
        .filter(F.col("ds").between(START, END))
        .withColumn(ROW_UID, F.monotonically_increasing_id())
    )
    folded, covered_sets = bootstrap_fold(left, join, spark)
    cov = part_covered_expr(join.right_parts[0], covered_sets)
    assert cov is not None
    total = folded.count()
    n_cov = folded.filter(F.coalesce(cov, F.lit(False))).count()
    n_unc = folded.filter(~F.coalesce(cov, F.lit(False))).count()
    assert n_cov > 0, "bootstrap must cover some rows"
    assert n_unc < total, "part input must shrink"
    assert n_cov + n_unc == total
    # only u0 rows are covered
    assert folded.filter(F.coalesce(cov, F.lit(False)) & (F.col("user") != "u0")).count() == 0
    # end-to-end output unchanged
    out = join_backfill(spark, join, START, END)
    for r in out.collect():
        if r["user"] == "u0":
            assert r["amt_amount_sum_7d"] == 12345.0
        else:
            assert r["amt_amount_sum_7d"] != 12345.0


def test_latest_label_view(spark, env):
    """Latest-label view (spark/JoinUtils.scala:218-294): per feature ds,
    the label from the LARGEST offset whose label day has matured; younger
    rows fall back to smaller offsets, immature rows get NULL."""
    from chronon_spark.operators.labels import attach_labels

    label_gb = GroupBy(
        name="lbl",
        sources=(EventSource(table="bl_events", query=Query(time_column="ts")),),
        key_columns=("user",),
        aggregations=(Aggregation("amount", Operation.COUNT, windows=(Window(1),)),),
    )
    lp = LabelPart(group_by=label_gb, label_offsets=(1, 3))
    feats = (
        spark.table("bl_events")
        .select("user", "ds")
        .distinct()
        .filter(F.col("ds").between(START, END))
    )
    # labels matured only through Nov 28: ds=25 gets the 3d version,
    # ds=27 only the 1d version, ds=28+ nothing
    out = attach_labels(spark, feats, lp, START, END, available_until="2023-11-28")
    rows = {(r["user"], r["ds"]): r for r in out.collect()}
    for (u, ds), r in rows.items():
        lat, o1, o3 = r["label_amount_count_1d_latest"], r["label_amount_count_1d_1d"], r["label_amount_count_1d_3d"]
        if ds <= "2023-11-25":
            assert lat == o3, (u, ds, lat, o3)
        elif ds <= "2023-11-27":
            assert lat == o1, (u, ds, lat, o1)
        else:
            assert lat is None, (u, ds, lat)


def test_external_parts_offline_plumbing(spark, env):
    """onlineExternalParts (api.thrift:320; BootstrapInfo.scala:123-130):
    online-only external features land in the backfill output null-padded
    under the reference's ext_[prefix_]{source}_{col} naming; a bootstrap
    table carrying logged external values fills them (bootstrap-wins
    coalesce) while unlogged rows stay null; a source with
    offline_group_by computes as a synthetic join part under the same
    ext_ naming (Extensions.scala:1042-1051)."""
    from chronon_spark.api.types import ExternalPart, ExternalSource

    # logged external values for u1 on two days only
    logged = spark.createDataFrame(
        [
            ("u1", "2023-11-25", 0.91, 3),
            ("u1", "2023-11-26", 0.87, 5),
        ],
        "user string, ds string, ext_risk_model_score double, ext_risk_model_rank int",
    )
    logged.createOrReplaceTempView("bl_ext_log")
    risk = ExternalSource(
        name="risk_model",
        key_schema={"user_id": "string"},
        value_schema={"score": "double", "rank": "int"},
    )
    offline_src = ExternalSource(
        name="amt_svc",
        key_schema={"user": "string"},
        value_schema={"amount_sum_7d": "double"},
        offline_group_by=GB,
    )
    join = Join(
        name="blj_ext",
        left=EventSource(table="bl_events", query=Query(selects={"user": None}, time_column="ts")),
        right_parts=(JoinPart(GB),),
        bootstrap_parts=(BootstrapPart(table="bl_ext_log", key_columns=("user", "ds")),),
        online_external_parts=(
            ExternalPart(risk, key_mapping={"user": "user_id"}),
            ExternalPart(offline_src),
        ),
    )
    out = join_backfill(spark, join, START, END)
    cols = set(out.columns)
    # reference naming: ext_{source}_{value_col}
    assert {"ext_risk_model_score", "ext_risk_model_rank", "ext_amt_svc_amount_sum_7d"} <= cols
    rows = out.collect()
    assert rows
    seen_logged = 0
    for r in rows:
        if r["user"] == "u1" and r["ds"] in ("2023-11-25", "2023-11-26"):
            exp = 0.91 if r["ds"] == "2023-11-25" else 0.87
            assert r["ext_risk_model_score"] == exp and r["ext_risk_model_rank"] in (3, 5)
            seen_logged += 1
        else:
            # online-only external features null-pad where nothing was logged
            assert r["ext_risk_model_score"] is None and r["ext_risk_model_rank"] is None
        # the offline-computable external equals the regular join part
        a, b = r["ext_amt_svc_amount_sum_7d"], r["amt_amount_sum_7d"]
        assert (a is None and b is None) or a == b, (r["user"], r["ds"], a, b)
    assert seen_logged > 0

    # missing key columns refuse (the fetcher's KeyMissingException
    # contract) — except the contextual pseudo-source, which null-pads
    bad = ExternalSource(
        name="needs_ip", key_schema={"ip": "string"}, value_schema={"geo": "string"}
    )
    join_bad = Join(
        name="blj_ext_bad",
        left=EventSource(table="bl_events", query=Query(selects={"user": None}, time_column="ts")),
        right_parts=(JoinPart(GB),),
        online_external_parts=(ExternalPart(bad),),
    )
    with pytest.raises(ValueError, match="missing key"):
        join_backfill(spark, join_bad, START, END)
    ctx = ExternalSource(
        name="contextual", key_schema={"ip": "string"}, value_schema={"ip": "string"}
    )
    join_ctx = Join(
        name="blj_ext_ctx",
        left=EventSource(table="bl_events", query=Query(selects={"user": None}, time_column="ts")),
        right_parts=(JoinPart(GB),),
        online_external_parts=(ExternalPart(ctx, prefix="req"),),
    )
    out_ctx = join_backfill(spark, join_ctx, START, END)
    assert "ext_req_contextual_ip" in out_ctx.columns
    assert out_ctx.filter(F.col("ext_req_contextual_ip").isNotNull()).count() == 0
