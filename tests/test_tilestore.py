"""TileStore: persisted 5-min tile cache for the temporal path —
equivalence with the direct tiled kernel, build-once reuse, semantic
invalidation."""

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
    Window,
)
from chronon_spark.operators.tiled import temporal_events_tiled
from chronon_spark.operators.tilestore import TileStore, temporal_events_tiled_cached
from chronon_spark.sources.warehouse import Warehouse

MS_DAY = 86_400_000
T0 = 1_700_006_400_000  # 2023-11-15 00:00 UTC (day-aligned)

GB = GroupBy(
    name="ts_gb",
    sources=(EventSource(table="x"),),
    key_columns=("user",),
    aggregations=(
        Aggregation("v", Operation.SUM, windows=(Window(5), None)),
        Aggregation("v", Operation.AVERAGE, windows=(Window(2),)),
        Aggregation("v", Operation.TOP_K, arg_map={"k": 3}, windows=(Window(5),)),
        Aggregation("c", Operation.HISTOGRAM, windows=(Window(5),)),
        Aggregation("c", Operation.APPROX_UNIQUE_COUNT, windows=(None,)),
    ),
    accuracy=Accuracy.TEMPORAL,
)


def _mk(spark, n=600, days=12, seed=7):
    rng = np.random.default_rng(seed)
    ev = pd.DataFrame(
        {
            "user": [f"u{i}" for i in rng.integers(0, 5, n)],
            "ts": (T0 + rng.integers(0, days * MS_DAY, n)).astype(np.int64),
            "v": rng.integers(1, 50, n).astype(float),
            "c": rng.choice(list("abcd"), n),
        }
    )
    q = pd.DataFrame(
        {
            "user": [f"u{i % 5}" for i in range(80)],
            "ts": (T0 + 6 * MS_DAY + (np.arange(80) * 7_200_000) % (6 * MS_DAY)).astype(
                np.int64
            ),
        }
    )
    return spark.createDataFrame(ev), spark.createDataFrame(q), ev, q


def _norm(rows):
    out = []
    for r in sorted(rows, key=lambda r: (r["user"], r["ts"])):
        d = r.asDict()
        for k, v in d.items():
            if isinstance(v, dict):
                d[k] = tuple(sorted(v.items()))
            elif isinstance(v, list):
                d[k] = tuple(v)
        out.append(tuple(d.items()))
    return out


def test_cached_equals_direct(spark, tmp_path):
    ev_df, q_df, *_ = _mk(spark)
    direct = temporal_events_tiled(spark, GB, q_df, ev_df)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    store = TileStore(wh, GB)
    cached, built = temporal_events_tiled_cached(
        spark, GB, q_df, ev_df, store, "2023-11-15", "2023-11-26"
    )
    assert len(built) == 12
    assert _norm(direct.collect()) == _norm(cached.collect())

    # second run: zero tile builds, same answer
    cached2, built2 = temporal_events_tiled_cached(
        spark, GB, q_df, ev_df, store, "2023-11-15", "2023-11-26"
    )
    assert built2 == []
    assert _norm(cached2.collect()) == _norm(direct.collect())


def test_extension_builds_only_new_days(spark, tmp_path):
    ev_df, q_df, ev, q = _mk(spark)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    store = TileStore(wh, GB)
    temporal_events_tiled_cached(
        spark, GB, q_df, ev_df, store, "2023-11-15", "2023-11-26"
    )
    # two more days of events + queries on them
    rng = np.random.default_rng(9)
    ev2 = pd.DataFrame(
        {
            "user": [f"u{i}" for i in rng.integers(0, 5, 120)],
            "ts": (T0 + 12 * MS_DAY + rng.integers(0, 2 * MS_DAY, 120)).astype(np.int64),
            "v": rng.integers(1, 50, 120).astype(float),
            "c": rng.choice(list("abcd"), 120),
        }
    )
    all_ev = spark.createDataFrame(pd.concat([ev, ev2], ignore_index=True))
    q2 = spark.createDataFrame(
        pd.DataFrame(
            {
                "user": [f"u{i % 5}" for i in range(30)],
                "ts": (T0 + 13 * MS_DAY + np.arange(30) * 3_600_000).astype(np.int64),
            }
        )
    )
    cached, built = temporal_events_tiled_cached(
        spark, GB, q2, all_ev, store, "2023-11-15", "2023-11-28"
    )
    assert sorted(built) == ["2023-11-27", "2023-11-28"]
    direct = temporal_events_tiled(spark, GB, q2, all_ev)
    assert _norm(direct.collect()) == _norm(cached.collect())


def test_semantic_change_rebuilds(spark, tmp_path):
    ev_df, q_df, *_ = _mk(spark)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    _, built1 = temporal_events_tiled_cached(
        spark, GB, q_df, ev_df, store := TileStore(wh, GB), "2023-11-15", "2023-11-26"
    )
    assert built1
    gb2 = GroupBy(
        name="ts_gb",  # same name, different config → hash change
        sources=GB.sources,
        key_columns=("user",),
        aggregations=(Aggregation("v", Operation.SUM, windows=(Window(3),)),),
        accuracy=Accuracy.TEMPORAL,
    )
    _, built2 = temporal_events_tiled_cached(
        spark, gb2, q_df, ev_df, TileStore(wh, gb2), "2023-11-15", "2023-11-26"
    )
    assert len(built2) == 12  # full rebuild under the new hash


def test_join_backfill_with_tile_cache(spark, tmp_path):
    """join_backfill(tile_warehouse=...) equals the plain backfill and
    reuses the persisted tiles on a second run."""
    from chronon_spark.api.types import Join, JoinPart, Query
    from chronon_spark.operators.join import join_backfill

    ev_df, _, ev, _ = _mk(spark)
    ev_df.withColumn(
        "ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd")
    ).createOrReplaceTempView("tsj_events")
    gb = GroupBy(
        name="tsj_gb",
        sources=(EventSource(table="tsj_events", query=Query(time_column="ts")),),
        key_columns=("user",),
        aggregations=(
            Aggregation("v", Operation.SUM, windows=(Window(5),)),
            Aggregation("c", Operation.HISTOGRAM, windows=(Window(5),)),
        ),
        accuracy=Accuracy.TEMPORAL,
    )
    join = Join(
        name="tsj_join",
        left=EventSource(
            table="tsj_events", query=Query(selects={"user": None}, time_column="ts")
        ),
        right_parts=(JoinPart(gb),),
    )
    lo, hi = "2023-11-21", "2023-11-26"
    plain = join_backfill(spark, join, lo, hi)
    wh = Warehouse(spark, str(tmp_path / "tiles"))
    cached = join_backfill(spark, join, lo, hi, tile_warehouse=wh)
    assert _norm(plain.collect()) == _norm(cached.collect())
    # tiles persisted for the window lookback range
    days = set(wh.lineage("tsj_gb__tiles5m"))
    assert min(days) <= "2023-11-17" and max(days) == hi  # 5d window lookback
    # second run: no new tile days
    before = wh.lineage("tsj_gb__tiles5m")
    cached2 = join_backfill(spark, join, lo, hi, tile_warehouse=wh)
    assert _norm(cached2.collect()) == _norm(plain.collect())
    assert set(wh.lineage("tsj_gb__tiles5m")) == set(before)


def test_tile_cache_composes_with_hot_slicing(spark, tmp_path):
    """tiles_override (TileStore) and hot-key time slicing compose:
    cached + sliced == direct."""
    import dataclasses as _dc

    ev_df, q_df, *_ = _mk(spark)
    gb_w = _dc.replace(
        GB,
        name="ts_gb_w",
        aggregations=tuple(
            _dc.replace(a, windows=tuple(w for w in a.windows if w is not None) or a.windows)
            for a in GB.aggregations
            if any(w is not None for w in a.windows)
        ),
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    store = TileStore(wh, gb_w)
    store.materialize(spark, ev_df, "2023-11-15", "2023-11-26")
    tiles = store.read("2023-11-15", "2023-11-26")
    direct = temporal_events_tiled(spark, gb_w, q_df, ev_df)
    both = temporal_events_tiled(
        spark, gb_w, q_df, ev_df, tiles_override=tiles,
        hot_keys=[("u0",)], hot_slice_ms=12 * 3_600_000,
    )
    assert _norm(direct.collect()) == _norm(both.collect())


def test_join_backfill_hot_key_threshold(spark, tmp_path):
    """join_backfill(hot_key_threshold=...) auto-slices heavy keys and
    matches the plain backfill."""
    from chronon_spark.api.types import Join, JoinPart, Query
    from chronon_spark.operators.join import join_backfill

    ev_df, _, ev, _ = _mk(spark)
    ev_df.withColumn(
        "ds", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd")
    ).createOrReplaceTempView("tsh_events")
    gb = GroupBy(
        name="tsh_gb",
        sources=(EventSource(table="tsh_events", query=Query(time_column="ts")),),
        key_columns=("user",),
        aggregations=(Aggregation("v", Operation.SUM, windows=(Window(5),)),),
        accuracy=Accuracy.TEMPORAL,
    )
    join = Join(
        name="tsh_join",
        left=EventSource(
            table="tsh_events", query=Query(selects={"user": None}, time_column="ts")
        ),
        right_parts=(JoinPart(gb),),
    )
    lo, hi = "2023-11-21", "2023-11-26"
    plain = join_backfill(spark, join, lo, hi)
    sliced = join_backfill(spark, join, lo, hi, hot_key_threshold=10)
    assert _norm(plain.collect()) == _norm(sliced.collect())
