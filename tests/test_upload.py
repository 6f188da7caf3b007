"""GroupByUpload / fetch analogue (operators/upload.py): the KV-shaped
per-key FinalBatchIr artifact + streamed-head fetch merge must equal the
raw as-of kernel run over the FULL event history at every (key, ts) —
the same parity the reference asserts between its fetcher and its batch
backfill (spark/GroupByUpload.scala, SawtoothOnlineAggregator.scala)."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from chronon_spark.api.types import (
    Accuracy,
    Aggregation,
    EventSource,
    GroupBy,
    Operation,
    TimeUnit,
    Window,
)
from chronon_spark.operators.temporal import temporal_events
from chronon_spark.operators.upload import (
    boundary_millis,
    fetch_features,
    group_by_upload,
)

MS_DAY = 86_400_000
T0 = 1_700_006_400_000  # 2023-11-15 00:00 UTC (day-aligned)
END_DS = "2023-11-24"  # upload boundary: 2023-11-25 00:00
BOUNDARY = boundary_millis(END_DS)


def _gb(*aggs):
    return GroupBy(
        name="up_gb",
        sources=(EventSource(table="x"),),
        key_columns=("user",),
        aggregations=tuple(aggs),
        accuracy=Accuracy.TEMPORAL,
    )


GB = _gb(
    Aggregation("v", Operation.COUNT, windows=(None,)),
    Aggregation("v", Operation.SUM, windows=(Window(7),)),
    Aggregation("vi", Operation.SUM, windows=(Window(7),)),
    Aggregation("v", Operation.AVERAGE, windows=(Window(3),)),
    Aggregation("v", Operation.MIN, windows=(Window(6, TimeUnit.HOURS),)),
    Aggregation("v", Operation.MAX, windows=(Window(7),)),
    Aggregation("v", Operation.VARIANCE, windows=(Window(7),)),
    Aggregation("v", Operation.SKEW, windows=(Window(20),)),
    Aggregation("v", Operation.KURTOSIS, windows=(None,)),
    Aggregation("v", Operation.LAST, windows=(Window(7), None)),
    Aggregation("v", Operation.FIRST, windows=(Window(2),)),
    Aggregation("s", Operation.LAST, windows=(Window(7),)),
    Aggregation("s", Operation.APPROX_UNIQUE_COUNT, windows=(Window(7), None)),
)

# bounded-IR gather/sketch family (separate GroupBy keeps the base GB's
# hop-frame shape assertions untouched)
GB_GATHER = _gb(
    Aggregation("v", Operation.TOP_K, arg_map={"k": 5}, windows=(Window(7), None)),
    Aggregation("vi", Operation.BOTTOM_K, arg_map={"k": 4}, windows=(Window(3),)),
    Aggregation("s", Operation.FIRST_K, arg_map={"k": 4}, windows=(Window(7),)),
    Aggregation(
        "v", Operation.LAST_K, arg_map={"k": 3}, windows=(Window(6, TimeUnit.HOURS), None)
    ),
    Aggregation(
        "s", Operation.BOUNDED_UNIQUE_COUNT, arg_map={"k": 10}, windows=(Window(7), None)
    ),
    Aggregation(
        "v",
        Operation.APPROX_PERCENTILE,
        arg_map={"percentiles": [0.25, 0.5, 0.9], "accuracy": 1024},
        windows=(Window(7), None),
    ),
    Aggregation("s", Operation.APPROX_HISTOGRAM_K, arg_map={"k": 8}, windows=(Window(7), None)),
)


def _mk(spark, n=900, seed=11, n_users=6, days=12):
    """Events spanning [T0, T0 + days); serving-day queries on the day
    after END_DS. Includes nulls in both value columns."""
    rng = np.random.default_rng(seed)
    v = rng.normal(10, 4, n)
    v[rng.random(n) < 0.08] = np.nan
    ev = pd.DataFrame(
        {
            "user": [f"u{i}" for i in rng.integers(0, n_users, n)],
            "ts": (T0 + rng.integers(0, days * MS_DAY, n)).astype(np.int64),
            "v": v,
            "vi": rng.integers(-5, 100, n).astype(np.int64),
            "s": rng.choice([f"w{i}" for i in range(40)] + [None], n),
        }
    )
    # exact-tie timestamps exercise the (ts, value) tie-break
    ev.loc[1 : n // 3 : 7, "ts"] = BOUNDARY + 3_600_000
    nq = 150
    q = pd.DataFrame(
        {
            "user": [f"u{i % (n_users + 1)}" for i in range(nq)],  # one unseen key
            "ts": (BOUNDARY + rng.integers(0, MS_DAY, nq)).astype(np.int64),
            "qid": np.arange(nq, dtype=np.int64),
        }
    )
    return spark.createDataFrame(ev), spark.createDataFrame(q)


def _fetch(spark, gb, ev_df, q_df):
    up = group_by_upload(spark, gb, ev_df, END_DS)
    return fetch_features(
        spark, gb, up, ev_df.filter(f"ts >= {BOUNDARY}"), q_df, END_DS
    )


def _expected(spark, gb, ev_df, q_df):
    """The in-repo oracle: the raw as-of kernel over FULL history."""
    return temporal_events(spark, gb, q_df, ev_df, mode="raw", passthrough=True)


def _cmp(got_df, exp_df, approx_cols=()):
    got = {r["qid"]: r.asDict() for r in got_df.collect()}
    exp = {r["qid"]: r.asDict() for r in exp_df.collect()}
    assert set(got) == set(exp)
    mism = []
    for qid, g in got.items():
        e = exp[qid]
        for col, gv in g.items():
            if col in ("user", "ts", "qid"):
                continue
            ev_ = e[col]
            if isinstance(gv, (list, tuple)) or isinstance(ev_, (list, tuple)):
                if (gv is None) != (ev_ is None) or (
                    gv is not None and len(gv) != len(ev_)
                ):
                    ok = False
                else:
                    ok = gv is None or all(
                        (a == pytest.approx(b, rel=1e-9, abs=1e-9))
                        if isinstance(a, float) or isinstance(b, float)
                        else a == b
                        for a, b in zip(gv, ev_)
                    )
            elif col in approx_cols:
                ok = (gv is None) == (ev_ is None) and (
                    gv is None or abs(gv - ev_) <= max(2, 0.1 * max(gv, ev_))
                )
            elif isinstance(gv, float) or isinstance(ev_, float):
                ok = (
                    (gv is None and ev_ is None)
                    or (
                        gv is not None
                        and ev_ is not None
                        and (
                            (math.isnan(gv) and math.isnan(ev_))
                            or gv == pytest.approx(ev_, rel=1e-9, abs=1e-9)
                        )
                    )
                )
            else:
                ok = gv == ev_
            if not ok:
                mism.append((qid, col, gv, ev_))
    assert not mism, mism[:12]


def test_fetch_matches_raw_kernel(spark):
    ev_df, q_df = _mk(spark)
    got = _fetch(spark, GB, ev_df, q_df)
    exp = _expected(spark, GB, ev_df, q_df)
    _cmp(got, exp, approx_cols=("s_approx_unique_count_7d", "s_approx_unique_count"))


def test_fetch_gather_family_matches_raw_kernel(spark):
    """k-lists, capped sets, equi-rank percentile samples and capped
    count-maps through the upload→fetch round trip — exact regime
    (accuracy=1024 > any per-key prefix; no hop/day truncates), so every
    value must be bit-identical to the raw kernel over full history."""
    ev_df, q_df = _mk(spark)
    got = _fetch(spark, GB_GATHER, ev_df, q_df)
    exp = _expected(spark, GB_GATHER, ev_df, q_df)
    _cmp(got, exp)


def test_fetch_percentile_sketch_regime_band(spark):
    """accuracy=8 forces sample truncation (900 events / 6 users >> 8):
    the weighted equi-rank estimate must stay within a band of the exact
    percentile, and n/null structure must match exactly."""
    ev_df, q_df = _mk(spark)
    gb = _gb(
        Aggregation(
            "v",
            Operation.APPROX_PERCENTILE,
            arg_map={"percentiles": [0.5], "accuracy": 8},
            windows=(Window(7), None),
        )
    )
    got = {r["qid"]: r.asDict() for r in _fetch(spark, gb, ev_df, q_df).collect()}
    exp = {r["qid"]: r.asDict() for r in _expected(spark, gb, ev_df, q_df).collect()}
    assert set(got) == set(exp)
    for qid, g in got.items():
        for col in g:
            if col in ("user", "ts", "qid"):
                continue
            gv, ev_ = g[col], exp[qid][col]
            assert (gv is None) == (ev_ is None), (qid, col)
            if gv is not None:
                for a, b in zip(gv, ev_):
                    # v ~ N(10, 4): a generous absolute band on the median
                    assert abs(a - b) <= 3.0, (qid, col, gv, ev_)


def test_hll_register_parity(spark):
    """The HLL estimate must be IDENTICAL (same registers), not merely
    close: upload registers ∪ head registers == full-history registers."""
    ev_df, q_df = _mk(spark, seed=3)
    gb = _gb(Aggregation("s", Operation.APPROX_UNIQUE_COUNT, windows=(Window(7), None)))
    got = _fetch(spark, gb, ev_df, q_df)
    exp = _expected(spark, gb, ev_df, q_df)
    _cmp(got, exp)


def test_no_batch_history(spark):
    """Keys first seen in the streamed head fetch correctly from an
    upload row that doesn't exist."""
    ev_df, q_df = _mk(spark)
    head_only = ev_df.filter(f"ts >= {BOUNDARY}")
    up = group_by_upload(spark, GB, ev_df.filter("user = 'u0'"), END_DS)
    got = fetch_features(spark, GB, up, head_only, q_df, END_DS)
    # oracle: full history for u0, head-only for everyone else
    ev_for = ev_df.filter("user = 'u0'").unionByName(
        head_only.filter("user <> 'u0'")
    )
    exp = _expected(spark, GB, ev_for, q_df)
    _cmp(got, exp, approx_cols=("s_approx_unique_count_7d", "s_approx_unique_count"))


def test_no_head_events(spark):
    """Fetch with an empty stream serves pure-batch values."""
    ev_df, q_df = _mk(spark)
    batch = ev_df.filter(f"ts < {BOUNDARY}")
    up = group_by_upload(spark, GB, batch, END_DS)
    got = fetch_features(
        spark, GB, up, ev_df.filter("1=0"), q_df, END_DS
    )
    exp = _expected(spark, GB, batch, q_df)
    _cmp(got, exp, approx_cols=("s_approx_unique_count_7d", "s_approx_unique_count"))


def test_upload_is_one_row_per_key_and_bounded(spark):
    ev_df, _ = _mk(spark)
    up = group_by_upload(spark, GB, ev_df, END_DS)
    rows = up.collect()
    users = [r["user"] for r in rows]
    assert len(users) == len(set(users))
    # tail-hop arrays are bounded by max(window)/hop + 1 per shared
    # resolution frame, independent of history
    for r in rows:
        d = r.asDict()
        h7 = d.get("__h3600000")  # 1h hops, longest sharing window = 7d
        if h7 is not None:
            assert len(h7) <= 7 * 24 + 1
            assert all(
                h7[i] < h7[i + 1] for i in range(len(h7) - 1)
            ), "hop starts sorted"
            assert all(
                BOUNDARY - 7 * MS_DAY - 3_600_000 < h < BOUNDARY for h in h7
            )
        h6 = d.get("__h300000")  # 5m hops, longest sharing window = 6h
        if h6 is not None:
            assert len(h6) <= 6 * 12 + 1


def test_rejects_non_uploadable(spark):
    gb = _gb(Aggregation("s", Operation.UNIQUE_COUNT, windows=(Window(7),)))
    ev_df, q_df = _mk(spark)
    with pytest.raises(ValueError, match="lambda-tile"):
        group_by_upload(spark, gb, ev_df, END_DS)
    # exact UNIQUE_COUNT/HISTOGRAM are the only refusals left — bucketed
    # too (round-6: bucketed APPROX_HISTOGRAM_K now serves via the
    # flat-column densify)
    gb2 = _gb(
        Aggregation("s", Operation.HISTOGRAM, windows=(Window(7),), buckets=("s",))
    )
    with pytest.raises(ValueError):
        group_by_upload(spark, gb2, ev_df, END_DS)


def test_fuzz_fetch_parity(spark):
    """Seeded sweep: random event shapes, always equal to the raw kernel
    on the exact ops."""
    gb = _gb(
        Aggregation("v", Operation.SUM, windows=(Window(7), None)),
        Aggregation("v", Operation.COUNT, windows=(Window(1),)),
        Aggregation("v", Operation.MIN, windows=(Window(12, TimeUnit.HOURS),)),
        Aggregation("v", Operation.LAST, windows=(Window(5),)),
        Aggregation("v", Operation.VARIANCE, windows=(Window(14),)),
    )
    for seed in (1, 2):
        ev_df, q_df = _mk(spark, n=400, seed=seed, n_users=3, days=18)
        got = _fetch(spark, gb, ev_df, q_df)
        exp = _expected(spark, gb, ev_df, q_df)
        _cmp(got, exp)


def test_fetch_stream_matches_batch(spark, tmp_path_factory):
    """Streaming fetcher (streaming/fetcher.py): serving the query
    stream micro-batch-wise from the upload artifact must equal the
    one-shot batch fetch — and the head callable is re-evaluated per
    batch (the growing-head lambda contract)."""
    tmp = tmp_path_factory.mktemp("fetch_stream")
    ev_df, q_df = _mk(spark)
    gb = _gb(
        Aggregation("v", Operation.SUM, windows=(Window(7), None)),
        Aggregation("v", Operation.LAST, windows=(Window(7),)),
        Aggregation("v", Operation.TOP_K, arg_map={"k": 3}, windows=(Window(7),)),
        Aggregation("s", Operation.APPROX_HISTOGRAM_K, arg_map={"k": 3}, windows=(Window(7),)),
    )
    from chronon_spark.streaming.fetcher import fetch_stream

    up = group_by_upload(spark, gb, ev_df, END_DS)
    head = ev_df.filter(f"ts >= {BOUNDARY}")
    expected = fetch_features(spark, gb, up, head, q_df, END_DS)

    # 3 query files → 3 micro-batches
    qdir = str(tmp / "queries")
    q_df.withColumn("__b", F.pmod("qid", F.lit(3))).repartition(
        "__b"
    ).write.partitionBy("__b").parquet(qdir)
    q_stream = (
        spark.readStream.schema(q_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(qdir + "/__b=*")
    )
    got_batches = []
    head_calls = []

    def head_fn():
        head_calls.append(1)
        return head

    q = fetch_stream(
        spark,
        gb,
        up,
        head_fn,
        q_stream,
        lambda df, bid: got_batches.append(df.toPandas()),
        checkpoint=str(tmp / "ckpt"),
        end_ds=END_DS,
        trigger_once=True,
    )
    q.awaitTermination(120)
    assert len(got_batches) >= 2, "expected multiple micro-batches"
    assert len(head_calls) == len(got_batches), "head not re-read per batch"
    got = pd.concat(got_batches, ignore_index=True)
    exp = expected.toPandas()
    assert sorted(got["qid"]) == sorted(exp["qid"])
    g = got.sort_values("qid").reset_index(drop=True)
    e = exp.sort_values("qid").reset_index(drop=True)
    for col in e.columns:
        for a, b in zip(g[col], e[col]):
            if isinstance(b, (list, np.ndarray)) or isinstance(a, (list, np.ndarray)):
                assert (a is None) == (b is None)
                if a is not None:
                    assert list(a) == pytest.approx(list(b))
            elif isinstance(b, dict) or isinstance(a, dict):
                assert a == b
            elif b is None or (isinstance(b, float) and np.isnan(b)):
                assert a is None or (isinstance(a, float) and np.isnan(a))
            elif isinstance(b, float):
                assert a == pytest.approx(b, rel=1e-9, abs=1e-9)
            else:
                assert a == b, (col, a, b)


def test_fetch_applies_derivations(spark):
    """GroupBy derivations apply to the fetch output exactly as they do
    to the batch kernels (the reference fetcher's serve-time derive)."""
    import dataclasses

    ev_df, q_df = _mk(spark)
    base = _gb(
        Aggregation("v", Operation.SUM, windows=(Window(7),)),
        Aggregation("v", Operation.COUNT, windows=(Window(7),)),
    )
    gb = dataclasses.replace(
        base,
        derivations={"*": "*", "v_per_event": "v_sum_7d / v_count_7d"},
    )
    got = _fetch(spark, gb, ev_df, q_df)
    assert "v_per_event" in got.columns
    exp = _expected(spark, gb, ev_df, q_df)
    _cmp(got, exp)

    # non-star derivations drop the raw feature columns on both paths
    gb2 = dataclasses.replace(base, derivations={"doubled": "v_sum_7d * 2"})
    got2 = _fetch(spark, gb2, ev_df, q_df)
    assert "v_sum_7d" not in got2.columns and "doubled" in got2.columns
    _cmp(got2, _expected(spark, gb2, ev_df, q_df))


def test_fetch_rejects_pre_boundary_queries(spark):
    """The reference's fetcher contract (SawtoothOnlineAggregator:
    batchEndTs ≤ queryTs): a query earlier than the upload boundary
    must fail loudly — state collapsed AT the boundary would leak
    events from after the query time."""
    ev_df, q_df = _mk(spark)
    gb = _gb(Aggregation("v", Operation.SUM, windows=(Window(7),)))
    up = group_by_upload(spark, gb, ev_df, END_DS)
    bad_q = q_df.withColumn("ts", F.col("ts") - F.lit(3 * MS_DAY))
    with pytest.raises(Exception, match="precedes the upload boundary"):
        fetch_features(
            spark, gb, up, ev_df.filter(f"ts >= {BOUNDARY}"), bad_q, END_DS
        ).collect()


def test_fuzz_fetch_gather_parity(spark):
    """Seeded sweep over the gather/sketch family: random event shapes,
    always equal to the raw kernel in the exact regime (accuracy above
    any per-hop count; every hop under the MG cap)."""
    gb = _gb(
        Aggregation("v", Operation.TOP_K, arg_map={"k": 4}, windows=(Window(7), None)),
        Aggregation("vi", Operation.BOTTOM_K, arg_map={"k": 3}, windows=(Window(12, TimeUnit.HOURS),)),
        Aggregation("s", Operation.FIRST_K, arg_map={"k": 3}, windows=(Window(5),)),
        Aggregation("vi", Operation.LAST_K, arg_map={"k": 4}, windows=(Window(7), None)),
        Aggregation("s", Operation.BOUNDED_UNIQUE_COUNT, arg_map={"k": 6}, windows=(Window(3), None)),
        Aggregation(
            "vi",
            Operation.APPROX_PERCENTILE,
            arg_map={"percentiles": [0.1, 0.5, 0.99], "accuracy": 2048},
            windows=(Window(7), None),
        ),
        Aggregation("s", Operation.APPROX_HISTOGRAM_K, arg_map={"k": 5}, windows=(Window(7), None)),
    )
    for seed in (3, 4):
        ev_df, q_df = _mk(spark, n=500, seed=seed, n_users=3, days=16)
        got = _fetch(spark, gb, ev_df, q_df)
        exp = _expected(spark, gb, ev_df, q_df)
        _cmp(got, exp)


def test_fetch_bucketed_matches_raw_kernel(spark):
    """Bucketed scalar family through the upload→fetch round trip:
    Map[bucket → agg] per query must equal the raw kernel's
    BucketedColumnAggregator semantics (entries only for non-None
    values, NaN finalizations kept, empty map → None)."""
    ev_df, q_df = _mk(spark)
    # a low-cardinality bucket column derived from s (which has nulls)
    ev_df = ev_df.withColumn(
        "cat", F.when(F.col("s").isNotNull(), F.substring("s", 1, 2))
    )
    gb = _gb(
        Aggregation("v", Operation.SUM, windows=(Window(7), None), buckets=("cat",)),
        Aggregation("v", Operation.COUNT, windows=(Window(7),), buckets=("cat",)),
        Aggregation("v", Operation.AVERAGE, windows=(Window(3),), buckets=("cat",)),
        Aggregation("vi", Operation.MAX, windows=(Window(7),), buckets=("cat",)),
        Aggregation("v", Operation.MIN, windows=(None,), buckets=("cat",)),
        Aggregation("v", Operation.VARIANCE, windows=(Window(7),), buckets=("cat",)),
        Aggregation("v", Operation.SKEW, windows=(Window(20),), buckets=("cat",)),
        Aggregation("v", Operation.LAST, windows=(Window(7), None), buckets=("cat",)),
        Aggregation("s", Operation.FIRST, windows=(Window(2),), buckets=("cat",)),
        # mixed config: scalar + bucketed share the upload row
        Aggregation("v", Operation.SUM, windows=(Window(7),)),
    )
    got = _fetch(spark, gb, ev_df, q_df)
    exp = _expected(spark, gb, ev_df, q_df)
    _cmp_maps(got, exp)


def _cmp_maps(got_df, exp_df):
    got = {r["qid"]: r.asDict() for r in got_df.collect()}
    exp = {r["qid"]: r.asDict() for r in exp_df.collect()}
    assert set(got) == set(exp)
    mism = []
    for qid, g in got.items():
        for col, gv in g.items():
            if col in ("user", "ts", "qid"):
                continue
            ev_ = exp[qid][col]
            if isinstance(gv, dict) or isinstance(ev_, dict):
                if (gv is None) != (ev_ is None) or (
                    gv is not None and set(gv) != set(ev_)
                ):
                    mism.append((qid, col, gv, ev_))
                    continue
                for b in gv or {}:
                    a, e = gv[b], ev_[b]
                    if isinstance(a, float) or isinstance(e, float):
                        same = (
                            a is not None
                            and e is not None
                            and (
                                (math.isnan(a) and math.isnan(e))
                                or a == pytest.approx(e, rel=1e-9, abs=1e-9)
                            )
                        )
                    else:
                        same = a == e
                    if not same:
                        mism.append((qid, col, b, a, e))
            else:
                if isinstance(gv, float) and isinstance(ev_, float):
                    if not (
                        (math.isnan(gv) and math.isnan(ev_))
                        or gv == pytest.approx(ev_, rel=1e-9, abs=1e-9)
                    ):
                        mism.append((qid, col, gv, ev_))
                elif gv != ev_ and not (gv is None and ev_ is None):
                    mism.append((qid, col, gv, ev_))
    assert not mism, mism[:10]


def test_fetch_consistency_zero_drift(spark):
    """fetch_consistency: the OOC metric over the fetch path reports
    zero mismatch when upload+head serving equals the raw backfill."""
    from chronon_spark.operators.upload import fetch_consistency

    ev_df, q_df = _mk(spark)
    gb = _gb(
        Aggregation("v", Operation.SUM, windows=(Window(7),)),
        Aggregation("v", Operation.AVERAGE, windows=(Window(3),)),
        Aggregation("v", Operation.COUNT, windows=(None,)),
    )
    up = group_by_upload(spark, gb, ev_df, END_DS)
    comparison, metrics = fetch_consistency(spark, gb, up, ev_df, q_df, END_DS)
    m = metrics.collect()[0].asDict()
    mismatch_cols = [k for k, v in m.items() if k.endswith("_mismatch_sum") and v]
    assert not mismatch_cols, (mismatch_cols, m)
    assert comparison.count() == q_df.count()


def test_fetch_bucketed_gather_matches_raw_kernel(spark):
    """Bucketed k-lists and capped sets through the upload→fetch round
    trip: Map[bucket → list|count] must equal the raw kernel's
    per-bucket gather semantics (integer/string inputs keep the
    comparison exact)."""
    ev_df, q_df = _mk(spark)
    ev_df = ev_df.withColumn(
        "cat", F.when(F.col("s").isNotNull(), F.substring("s", 1, 2))
    )
    gb = _gb(
        Aggregation(
            "vi", Operation.TOP_K, arg_map={"k": 3}, windows=(Window(7), None), buckets=("cat",)
        ),
        Aggregation(
            "vi", Operation.BOTTOM_K, arg_map={"k": 2}, windows=(Window(3),), buckets=("cat",)
        ),
        Aggregation(
            "s", Operation.FIRST_K, arg_map={"k": 3}, windows=(Window(7),), buckets=("cat",)
        ),
        Aggregation(
            "vi", Operation.LAST_K, arg_map={"k": 3}, windows=(Window(7), None), buckets=("cat",)
        ),
        Aggregation(
            "s",
            Operation.BOUNDED_UNIQUE_COUNT,
            arg_map={"k": 5},
            windows=(Window(7), None),
            buckets=("cat",),
        ),
    )
    got = _fetch(spark, gb, ev_df, q_df)
    exp = _expected(spark, gb, ev_df, q_df)
    _cmp_maps(got, exp)


def test_fetch_bucketed_sketch_matches_raw_kernel(spark):
    """Bucketed APPROX_PERCENTILE (exact regime) and bucketed
    APPROX_UNIQUE_COUNT (register-identity: upload ∪ head registers ==
    full-history per-bucket registers) through the round trip."""
    ev_df, q_df = _mk(spark)
    ev_df = ev_df.withColumn(
        "cat", F.when(F.col("s").isNotNull(), F.substring("s", 1, 2))
    )
    gb = _gb(
        Aggregation(
            "v",
            Operation.APPROX_PERCENTILE,
            arg_map={"percentiles": [0.25, 0.5], "accuracy": 1024},
            windows=(Window(7), None),
            buckets=("cat",),
        ),
        Aggregation(
            "s",
            Operation.APPROX_UNIQUE_COUNT,
            windows=(Window(7), None),
            buckets=("cat",),
        ),
    )
    got = {r["qid"]: r.asDict() for r in _fetch(spark, gb, ev_df, q_df).collect()}
    exp = {r["qid"]: r.asDict() for r in _expected(spark, gb, ev_df, q_df).collect()}
    assert set(got) == set(exp)
    mism = []
    for qid, g in got.items():
        for col, gv in g.items():
            if col in ("user", "ts", "qid"):
                continue
            ev_ = exp[qid][col]
            if (gv is None) != (ev_ is None):
                mism.append((qid, col, gv, ev_))
                continue
            if gv is None:
                continue
            if set(gv) != set(ev_):
                mism.append((qid, col, gv, ev_))
                continue
            for b in gv:
                a, e = gv[b], ev_[b]
                if isinstance(a, list):
                    ok = len(a) == len(e) and all(
                        x == pytest.approx(y, rel=1e-9, abs=1e-9)
                        for x, y in zip(a, e)
                    )
                else:
                    # register identity ⇒ same estimate up to rounding
                    ok = abs(float(a) - float(e)) <= 1.0
                if not ok:
                    mism.append((qid, col, b, a, e))
    assert not mism, mism[:10]


def test_fetch_bucketed_histogram_matches_raw_kernel(spark):
    """Bucketed APPROX_HISTOGRAM_K through the upload→fetch round trip
    (round-6: the last bucketed KV refusal): the kernel ships four flat
    columns (nested Map[bucket → Map] can't cross the Arrow cogroup
    boundary) and fetch_features densifies them — the result must equal
    the raw kernel's per-bucket count-maps exactly (distinct values per
    (hop, bucket) stay under the 8k MG cap → exact regime)."""
    ev_df, q_df = _mk(spark)
    ev_df = ev_df.withColumn(
        "cat", F.when(F.col("s").isNotNull(), F.substring("s", 1, 2))
    )
    gb = _gb(
        Aggregation(
            "s", Operation.APPROX_HISTOGRAM_K, arg_map={"k": 4},
            windows=(Window(7), None), buckets=("cat",),
        ),
        Aggregation(
            "vi", Operation.APPROX_HISTOGRAM_K, arg_map={"k": 3},
            windows=(Window(3),), buckets=("cat",),
        ),
        # mixed config: a scalar bucketed part shares the bucket frames
        Aggregation("vi", Operation.SUM, windows=(Window(7),), buckets=("cat",)),
    )
    got = {r["qid"]: r.asDict() for r in _fetch(spark, gb, ev_df, q_df).collect()}
    exp = {r["qid"]: r.asDict() for r in _expected(spark, gb, ev_df, q_df).collect()}
    assert set(got) == set(exp)
    mism = []
    for qid, g in got.items():
        for col, gv in g.items():
            if col in ("user", "ts", "qid"):
                continue
            ev_ = exp[qid][col]
            if (gv is None) != (ev_ is None):
                mism.append((qid, col, gv, ev_))
                continue
            if gv is None:
                continue
            if isinstance(gv, dict) and gv and isinstance(next(iter(gv.values())), dict):
                ok = set(gv) == set(ev_) and all(
                    dict(gv[b]) == dict(ev_[b]) for b in gv
                )
            else:
                ok = gv == ev_ or (
                    isinstance(gv, dict) and dict(gv) == dict(ev_)
                )
            if not ok:
                mism.append((qid, col, gv, ev_))
    assert not mism, mism[:8]


def test_fetch_elementwise_matches_temporal(spark):
    """Element-wise parts through the upload→fetch round trip: the
    positional-bucket rewrite + observed-tensor-size densify must equal
    temporal_events' element-wise output (incl. trailing-null padding
    and the empty-window NULL contract)."""
    rng = np.random.default_rng(17)
    n = 500
    lens = rng.integers(0, 4, n)  # 0 → null/empty arrays never update
    arrs = [
        None if L == 0 else [float(x) for x in rng.normal(5, 2, L)] for L in lens
    ]
    ev = pd.DataFrame(
        {
            "user": [f"u{i}" for i in rng.integers(0, 4, n)],
            "ts": (T0 + rng.integers(0, 12 * MS_DAY, n)).astype(np.int64),
            "emb": arrs,
            "v": rng.normal(10, 3, n),
        }
    )
    ev_df = spark.createDataFrame(
        ev, "user string, ts long, emb array<double>, v double"
    )
    _, q_df = _mk(spark, n_users=4)
    gb = _gb(
        Aggregation("emb", Operation.AVERAGE, windows=(Window(7),), element_wise=True),
        Aggregation("emb", Operation.SUM, windows=(None,), element_wise=True),
        Aggregation("emb", Operation.MAX, windows=(Window(3),), element_wise=True),
        Aggregation("v", Operation.SUM, windows=(Window(7),)),  # mixed config
    )
    got = _fetch(spark, gb, ev_df, q_df)
    exp = _expected(spark, gb, ev_df, q_df)
    _cmp(got, exp)
