"""Round-3 regression tests: typed small-mode literals, one probe per
backfill, raw≡tiled APPROX_UNIQUE estimator parity, exact int64 SUM on
both kernels, lineage without full-table re-scans."""

import datetime as dt
import os

import numpy as np
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
from chronon_spark.operators import join as join_mod
from chronon_spark.operators.join import _sql_literal, join_backfill
from chronon_spark.operators.temporal import temporal_events

MS_DAY = 86_400_000
T0 = 1_700_000_000_000


# ------------------------------------------------------- typed SQL literals


def test_sql_literal_types():
    assert _sql_literal(True) == "TRUE"
    assert _sql_literal(7) == "7"
    assert _sql_literal("o'brien") == r"'o\'brien'"
    assert _sql_literal("a\\b") == r"'a\\b'"
    assert _sql_literal(dt.date(2024, 1, 15)) == "DATE '2024-01-15'"
    assert _sql_literal(dt.datetime(2024, 1, 15, 3, 4, 5)).startswith("TIMESTAMP '2024-01-15")
    assert _sql_literal(float("nan")) is None
    assert _sql_literal(object()) is None  # unliteralizable → semi-join path


def test_small_mode_date_and_backslash_keys(spark):
    """Date-typed and backslash-laden string keys survive small-mode IN
    injection: the injected filter must keep (not silently prune) matching
    right rows. Regression for str(date) rendering as integer arithmetic."""
    ev = pd.DataFrame(
        {
            "user": ["a\\b'c", "a\\b'c", "plain"],
            "ts": np.array([T0 + 1, T0 + 2, T0 + 3], dtype=np.int64),
            "amount": [10.0, 20.0, 5.0],
        }
    )
    ev_df = spark.createDataFrame(ev).withColumn(
        "ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd")
    )
    ev_df.createOrReplaceTempView("r3_ev")
    q = pd.DataFrame(
        {"user": ["a\\b'c", "plain"], "ts": np.array([T0 + MS_DAY] * 2, dtype=np.int64)}
    )
    q_df = spark.createDataFrame(q).withColumn(
        "ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd")
    )
    q_df.createOrReplaceTempView("r3_q")
    gb = GroupBy(
        name="r3_gb",
        sources=(EventSource(table="r3_ev", query=Query(time_column="ts")),),
        key_columns=("user",),
        aggregations=(Aggregation("amount", Operation.SUM, windows=(None,)),),
        accuracy=Accuracy.TEMPORAL,
    )
    join = Join(
        name="r3_join",
        left=EventSource(table="r3_q", query=Query(time_column="ts")),
        right_parts=(JoinPart(gb),),
    )
    ds = dt.datetime.fromtimestamp((T0 + MS_DAY) / 1000, dt.timezone.utc).strftime("%Y-%m-%d")
    rows = {r["user"]: r for r in join_backfill(spark, join, ds, ds).collect()}
    assert rows["a\\b'c"]["r3_gb_amount_sum"] == 30.0
    assert rows["plain"]["r3_gb_amount_sum"] == 5.0


# -------------------------------------------------- one probe per backfill


def test_single_probe_per_backfill(spark, monkeypatch):
    """join_backfill runs the small-mode row-count probe ONCE and shares the
    verdict across all parts (the reference caches leftDf's row count)."""
    calls = {"n": 0}
    real = join_mod._probe_left_small

    def counting(left):
        calls["n"] += 1
        return real(left)

    monkeypatch.setattr(join_mod, "_probe_left_small", counting)

    ev = pd.DataFrame(
        {
            "user": [f"u{i % 3}" for i in range(30)],
            "ts": (T0 + np.arange(30) * 3_600_000).astype(np.int64),
            "amount": np.arange(30).astype(float),
        }
    )
    ev_df = spark.createDataFrame(ev).withColumn(
        "ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd")
    )
    ev_df.createOrReplaceTempView("r3p_ev")
    ev_df.createOrReplaceTempView("r3p_q")

    def gb(name, op):
        return GroupBy(
            name=name,
            sources=(EventSource(table="r3p_ev", query=Query(time_column="ts")),),
            key_columns=("user",),
            aggregations=(Aggregation("amount", op, windows=(Window(7),)),),
            accuracy=Accuracy.TEMPORAL,
        )

    join = Join(
        name="r3p_join",
        left=EventSource(table="r3p_q", query=Query(time_column="ts")),
        right_parts=(
            JoinPart(gb("g1", Operation.SUM)),
            JoinPart(gb("g2", Operation.COUNT)),
            JoinPart(gb("g3", Operation.MAX)),
        ),
    )
    d0 = dt.datetime.fromtimestamp(T0 / 1000, dt.timezone.utc).strftime("%Y-%m-%d")
    d1 = dt.datetime.fromtimestamp((T0 + 2 * MS_DAY) / 1000, dt.timezone.utc).strftime("%Y-%m-%d")
    join_backfill(spark, join, d0, d1).collect()
    assert calls["n"] == 1, f"expected 1 probe for 3 parts, saw {calls['n']}"


# ------------------------------------- raw ≡ tiled APPROX_UNIQUE estimator


def test_raw_tiled_hll_parity(spark):
    """mode='raw' and mode='tiled' answer the IDENTICAL HLL estimate for
    APPROX_UNIQUE_COUNT on the same input (shared sketch, same JVM hash) —
    closes the round-2 estimator-divergence gap."""
    rng = np.random.default_rng(7)
    n = 5000
    ev = pd.DataFrame(
        {
            "user": [f"u{i % 4}" for i in range(n)],
            "ts": (T0 + rng.integers(0, 10 * MS_DAY, n)).astype(np.int64),
            "val": rng.integers(0, 900, n).astype(float),
        }
    )
    # sprinkle nulls: they must not update registers on either path
    ev.loc[ev.index % 17 == 0, "val"] = None
    gb = GroupBy(
        name="hpar",
        sources=(EventSource(table="x", query=Query(time_column="ts")),),
        key_columns=("user",),
        aggregations=(
            Aggregation("val", Operation.APPROX_UNIQUE_COUNT, windows=(Window(3), None)),
        ),
        accuracy=Accuracy.TEMPORAL,
    )
    q = pd.DataFrame(
        {
            "user": [f"u{i % 4}" for i in range(60)],
            "ts": (T0 + rng.integers(MS_DAY, 11 * MS_DAY, 60)).astype(np.int64),
        }
    )
    ev_df, q_df = spark.createDataFrame(ev), spark.createDataFrame(q)
    cols = ["user", "ts", "val_approx_unique_count_3d", "val_approx_unique_count"]
    raw = {
        (r["user"], r["ts"]): r
        for r in temporal_events(spark, gb, q_df, ev_df, mode="raw").select(*cols).collect()
    }
    til = {
        (r["user"], r["ts"]): r
        for r in temporal_events(spark, gb, q_df, ev_df, mode="tiled").select(*cols).collect()
    }
    assert raw.keys() == til.keys()
    exacts = 0
    for k in raw:
        assert raw[k]["val_approx_unique_count_3d"] == til[k]["val_approx_unique_count_3d"], k
        assert raw[k]["val_approx_unique_count"] == til[k]["val_approx_unique_count"], k
        if raw[k]["val_approx_unique_count"] is not None:
            exacts += 1
    assert exacts > 30


# ----------------------------------------------- exact int64 SUM both paths


def test_int64_sum_exact_beyond_2_53(spark):
    """Long SUM whose running total exceeds 2^53 stays exact on BOTH the
    raw and tiled kernels (int64 prefix sums — float64 accumulation would
    drift by several units here)."""
    rng = np.random.default_rng(11)
    n = 20_000
    vals = rng.integers(10**12, 2 * 10**12, n)  # total ≈ 3e16 > 2^53
    ev = pd.DataFrame(
        {
            "user": ["u0"] * n,
            "ts": (T0 + rng.integers(0, 5 * MS_DAY, n)).astype(np.int64),
            "big": vals,
        }
    )
    gb = GroupBy(
        name="bigsum",
        sources=(EventSource(table="x", query=Query(time_column="ts")),),
        key_columns=("user",),
        aggregations=(Aggregation("big", Operation.SUM, windows=(None,)),),
        accuracy=Accuracy.TEMPORAL,
    )
    qt = int(T0 + 6 * MS_DAY)
    q_df = spark.createDataFrame(pd.DataFrame({"user": ["u0"], "ts": [qt]}))
    ev_df = spark.createDataFrame(ev)
    expected = int(ev["big"].sum())  # python int — exact
    for mode in ("raw", "tiled"):
        got = temporal_events(spark, gb, q_df, ev_df, mode=mode).collect()[0]["big_sum"]
        assert got == expected, (mode, got, expected, got - expected)


# --------------------------------------- lineage without full-table rescan


def test_lineage_counts_without_table_rescan(spark, tmp_path, monkeypatch):
    """insert_partitions derives lineage row counts from the written frame —
    it must never read the output table back (O(N)-partition scans made
    long backfills quadratic)."""
    from chronon_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))

    def explode(table):
        raise AssertionError(f"insert_partitions read back table {table}")

    monkeypatch.setattr(wh, "read", explode)
    df = spark.createDataFrame(
        pd.DataFrame({"ds": ["2024-01-01"] * 3 + ["2024-01-02"] * 2, "v": range(5)})
    )
    written = wh.insert_partitions(df, "t_r3")
    assert written == ["2024-01-01", "2024-01-02"]
    monkeypatch.undo()
    lin = wh.lineage("t_r3")
    assert lin["2024-01-01"]["row_count"] == 3
    assert lin["2024-01-02"]["row_count"] == 2


# ----------------------------------------- element_wise as a config flag


def test_elementwise_config_temporal(spark):
    """element_wise=True on an Aggregation (api.thrift:229-234): windowed
    position-wise AVERAGE/SUM over array inputs through the TEMPORAL path,
    checked against a per-query numpy oracle."""
    rng = np.random.default_rng(3)
    n = 800
    ev = pd.DataFrame(
        {
            "user": [f"u{i % 3}" for i in range(n)],
            "ts": (T0 + rng.integers(0, 9 * MS_DAY, n)).astype(np.int64),
        }
    )
    ev["vec"] = [list(map(float, rng.integers(1, 50, 3))) for _ in range(n)]
    gb = GroupBy(
        name="ewt",
        sources=(EventSource(table="x", query=Query(time_column="ts")),),
        key_columns=("user",),
        aggregations=(
            Aggregation("vec", Operation.AVERAGE, windows=(Window(2), None), element_wise=True),
            Aggregation("vec", Operation.SUM, windows=(Window(2),), element_wise=True),
        ),
        accuracy=Accuracy.TEMPORAL,
    )
    q = pd.DataFrame(
        {
            "user": [f"u{i % 3}" for i in range(40)],
            "ts": (T0 + rng.integers(MS_DAY, 10 * MS_DAY, 40)).astype(np.int64),
        }
    )
    out = temporal_events(spark, gb, spark.createDataFrame(q), spark.createDataFrame(ev))
    rows = {(r["user"], r["ts"]): r for r in out.collect()}
    HOP_1H = 3_600_000
    by_user = {u: g for u, g in ev.groupby("user")}
    checked = 0
    for (u, qt), r in rows.items():
        g = by_user[u]
        for col, window, op in [
            ("vec_average_2d", 2 * MS_DAY, "mean"),
            ("vec_average", None, "mean"),
            ("vec_sum_2d", 2 * MS_DAY, "sum"),
        ]:
            if window is None:
                lo = -(1 << 62)
            else:
                lo = ((qt - window) // HOP_1H) * HOP_1H
            sel = g[(g["ts"] >= lo) & (g["ts"] < qt)]
            got = r[col]
            if len(sel) == 0:
                assert got is None, (u, qt, col, got)
                continue
            mat = np.array(sel["vec"].tolist())
            exp = mat.mean(axis=0) if op == "mean" else mat.sum(axis=0)
            assert got is not None and np.allclose(got, exp), (u, qt, col, got, exp)
            checked += 1
    assert checked > 50


def test_elementwise_config_snapshot(spark):
    """element_wise through the SNAPSHOT path: daily position-wise windowed
    mean, ragged arrays (positions missing from shorter arrays aggregate
    over fewer values; absent positions are null)."""
    ev = pd.DataFrame(
        {
            "user": ["a"] * 3,
            "ts": np.array([T0, T0 + 1000, T0 + 2000], dtype=np.int64),
        }
    )
    ev["vec"] = [[2.0, 4.0], [4.0, 8.0, 12.0], [6.0]]
    ev_df = spark.createDataFrame(ev).withColumn(
        "ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd")
    )
    from chronon_spark.operators.groupby import snapshot_events

    gb = GroupBy(
        name="ews",
        sources=(EventSource(table="x", query=Query(time_column="ts")),),
        key_columns=("user",),
        aggregations=(
            Aggregation("vec", Operation.AVERAGE, windows=(Window(7),), element_wise=True),
        ),
        accuracy=Accuracy.SNAPSHOT,
    )
    ds = dt.datetime.fromtimestamp(T0 / 1000, dt.timezone.utc).strftime("%Y-%m-%d")
    out = snapshot_events(spark, gb, ev_df, ds, ds).collect()
    assert len(out) == 1
    got = out[0]["vec_average_7d"]
    assert np.allclose([got[0], got[1]], [4.0, 6.0]) and got[2] == 12.0


def test_elementwise_trailing_null_padding(spark):
    """Reference parity (ColumnAggregator.scala elementWise null-inits the
    result list to the tensor size): a LAST position whose values are all
    null stays in the output as null instead of the array shrinking —
    checked on the temporal, snapshot-events and entity paths (r4 verdict
    next-round #5)."""
    # temporal: position 2 always null, tensor size 3
    ev = pd.DataFrame(
        {
            "user": ["a"] * 4,
            "ts": np.array([T0 + i * 1000 for i in range(4)], dtype=np.int64),
        }
    )
    ev["vec"] = [[1.0, 2.0, None], [3.0, 4.0, None], [5.0, None, None], [7.0, 8.0, None]]
    q = pd.DataFrame({"user": ["a"], "ts": np.array([T0 + MS_DAY], dtype=np.int64)})
    gb = GroupBy(
        name="ewnp",
        sources=(EventSource(table="x", query=Query(time_column="ts")),),
        key_columns=("user",),
        aggregations=(
            Aggregation("vec", Operation.AVERAGE, windows=(Window(7), None), element_wise=True),
        ),
        accuracy=Accuracy.TEMPORAL,
    )
    r = temporal_events(
        spark, gb, spark.createDataFrame(q), spark.createDataFrame(ev)
    ).first()
    for col in ("vec_average_7d", "vec_average"):
        got = r[col]
        assert got is not None and len(got) == 3, (col, got)
        assert np.allclose(got[:2], [4.0, 14.0 / 3]) and got[2] is None, (col, got)

    # snapshot events: same shape through the daily path
    from chronon_spark.operators.groupby import snapshot_entities, snapshot_events

    ev_df = spark.createDataFrame(ev).withColumn(
        "ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd")
    )
    gbs = GroupBy(
        name="ewnps",
        sources=(EventSource(table="x", query=Query(time_column="ts")),),
        key_columns=("user",),
        aggregations=(
            Aggregation("vec", Operation.AVERAGE, windows=(Window(7),), element_wise=True),
        ),
        accuracy=Accuracy.SNAPSHOT,
    )
    ds = dt.datetime.fromtimestamp(T0 / 1000, dt.timezone.utc).strftime("%Y-%m-%d")
    got = snapshot_events(spark, gbs, ev_df, ds, ds).first()["vec_average_7d"]
    assert got is not None and len(got) == 3 and got[2] is None, got
    assert np.allclose(got[:2], [4.0, 14.0 / 3]), got

    # entity snapshots
    got = snapshot_entities(spark, gbs, ev_df).first()["vec_average_7d"]
    assert got is not None and len(got) == 3 and got[2] is None, got
    assert np.allclose(got[:2], [4.0, 14.0 / 3]), got


# -------------------------------------- high-dim ANN vectorized signatures


def test_ann_high_dim_vectorized(spark):
    """dim-512 LSH/IVF: signature/assignment via the broadcast-matrix
    pandas_udf (no 100k-literal Catalyst tree); recall@5 vs brute force
    stays sane and the plan compiles in bounded time."""
    from chronon_spark.operators.similarity import (
        VECTORIZED_DIM_CUTOFF,
        brute_force_top_k,
        ivf_top_k,
        lsh_top_k,
    )

    assert 512 > VECTORIZED_DIM_CUTOFF
    rng = np.random.default_rng(41)
    dim, n, nq = 512, 400, 8
    base = rng.normal(size=(20, dim))
    corpus_vecs = base[rng.integers(0, 20, n)] + 0.15 * rng.normal(size=(n, dim))
    corpus = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(n), "embedding": [list(map(float, v)) for v in corpus_vecs]})
    )
    qv = corpus_vecs[:nq] + 0.01 * rng.normal(size=(nq, dim))
    queries = spark.createDataFrame(
        pd.DataFrame({"query_id": range(nq), "query_vec": [list(map(float, v)) for v in qv]})
    )
    truth: dict = {}
    for r in brute_force_top_k(corpus, queries, k=5).collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])

    for approx in (
        lsh_top_k(corpus, queries, k=5, n_planes=8, n_tables=12, seed=5),
        ivf_top_k(corpus, queries, k=5, n_cells=12, n_probe=4, seed=5),
    ):
        got = {}
        for r in approx.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        total = sum(len(t) for t in truth.values())
        assert hits / total >= 0.5, f"recall {hits}/{total}"


def test_embedding_near_dups_high_dim(spark):
    """Planted high-dim duplicates found through the vectorized signature."""
    from chronon_spark.operators.dedup import embedding_near_dups

    rng = np.random.default_rng(9)
    dim = 256
    base = rng.normal(size=(30, dim))
    rows, vid = [], 0
    expected = set()
    for i in range(30):
        rows.append((vid, [float(x) for x in base[i]]))
        if i < 10:  # plant a near-identical twin
            twin = base[i] + 0.001 * rng.normal(size=dim)
            rows.append((vid + 1, [float(x) for x in twin]))
            expected.add((vid, vid + 1))
            vid += 1
        vid += 1
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(df, cosine_threshold=0.99, n_planes=12).collect()
    }
    recall = len(got & expected) / len(expected)
    assert recall >= 0.8, (recall, got, expected)
