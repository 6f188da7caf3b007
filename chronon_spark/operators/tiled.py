"""Hop-tiled temporal (as-of) GroupBy — the hot-key scale path.

The raw kernel (operators/temporal.py) ships every event of a key into
one Arrow group: exact, but a crawl-storm url with 10M events becomes a
10M-row pandas batch. This module reproduces the reference's hop tiling
(HopsAggregator.scala:92-156 + SawtoothAggregator.scala:64-139): events
are pre-compressed into per-(key, 5-minute-tile) partial IRs by a
DataFrame groupBy (map-side combine — the full event volume never
shuffles raw), raw events are kept ONLY for tiles that contain a query
head (semi-join), and the kernel stitches

    window(qt) = merge(tiles in [tail, headStart)) + raw head [headStart, qt)

with tail = floor((qt−w)/hop)·hop on the window's hop grid and
headStart = floor(qt / 5min)·5min. Hot keys thus cost O(tiles) ≈
105k/year instead of O(events), and the shuffle moves IRs, not rows.

Supported ops: the algebraic family (COUNT/SUM/AVERAGE/MIN/MAX/
VARIANCE/SKEW/KURTOSIS/FIRST/LAST) whose IRs merge losslessly across
tiles. temporal_events(mode="auto") picks this path when every part
qualifies, else the exact raw kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chronon_spark.api.types import FIVE_MINUTES_MS, GroupBy, Operation
from chronon_spark.operators.temporal import _SparseTable, output_field
from chronon_spark.sources.scan import TS_COL, null_key_filter

TILE_MS = FIVE_MINUTES_MS

NUMERIC_TILEABLE = {
    Operation.SUM,
    Operation.AVERAGE,
    Operation.MIN,
    Operation.MAX,
    Operation.VARIANCE,
    Operation.SKEW,
    Operation.KURTOSIS,
}
ANYTYPE_TILEABLE = {Operation.COUNT, Operation.FIRST, Operation.LAST}
TILEABLE = NUMERIC_TILEABLE | ANYTYPE_TILEABLE


BUCKETED_TILEABLE = {Operation.COUNT, Operation.SUM, Operation.AVERAGE}


def _part_tileable(part, ev_schema: T.StructType | None) -> bool:
    if part.bucket is not None:
        # bucketed additive ops tile as Map[bucket → stats] per tile
        if part.operation not in BUCKETED_TILEABLE:
            return False
        if part.operation is Operation.COUNT:
            return True
        if ev_schema is None:
            return True
        return isinstance(ev_schema[part.input_column].dataType, (T.NumericType, T.BooleanType))
    if part.operation in ANYTYPE_TILEABLE:
        return True
    if part.operation not in NUMERIC_TILEABLE:
        return False
    if ev_schema is None:
        return True
    dt = ev_schema[part.input_column].dataType
    return isinstance(dt, (T.NumericType, T.BooleanType))


def is_tileable(gb: GroupBy, ev_schema: T.StructType | None = None) -> bool:
    return all(_part_tileable(p, ev_schema) for p in gb.unpacked())


def split_by_tileability(
    gb: GroupBy, ev_schema: T.StructType | None = None
) -> tuple[GroupBy | None, GroupBy | None]:
    """Split a mixed GroupBy into (tileable, raw) halves at Aggregation
    granularity so the algebraic parts can ride the tiled path; both
    halves keep the original output-column names."""
    tiled_aggs, raw_aggs = [], []
    for agg in gb.aggregations:
        if all(_part_tileable(p, ev_schema) for p in agg.unpack()):
            tiled_aggs.append(agg)
        else:
            raw_aggs.append(agg)
    mk = lambda aggs, suffix: GroupBy(
        name=f"{gb.name}{suffix}",
        sources=gb.sources,
        key_columns=gb.key_columns,
        aggregations=tuple(aggs),
        accuracy=gb.accuracy,
    )
    return (
        mk(tiled_aggs, "__tiled") if tiled_aggs else None,
        mk(raw_aggs, "__raw") if raw_aggs else None,
    )


def _needed_bucket_pairs(gb: GroupBy) -> list[tuple[str, str]]:
    """(input_column, bucket_column) pairs used by bucketed parts."""
    return sorted({(p.input_column, p.bucket) for p in gb.unpacked() if p.bucket is not None})


def _bt_col(col: str, bucket: str, s: str) -> str:
    return f"__bt_{col}_{bucket}_{s}"


def _needed_stats(gb: GroupBy) -> dict[str, set[str]]:
    """Which tile statistics each input column needs (non-bucketed parts)."""
    need: dict[str, set[str]] = {}
    for p in gb.unpacked():
        if p.bucket is not None:
            continue
        s = need.setdefault(p.input_column, set())
        op = p.operation
        if op in (Operation.COUNT, Operation.SUM, Operation.AVERAGE):
            s.update({"n", "s1"})
        if op in (Operation.VARIANCE, Operation.SKEW, Operation.KURTOSIS):
            s.update({"n", "s1", "s2", "s3", "s4"})
        if op is Operation.MIN:
            s.add("mn")
        if op is Operation.MAX:
            s.add("mx")
        if op is Operation.FIRST:
            s.add("fst")
        if op is Operation.LAST:
            s.add("lst")
    return need


_STAT_EXPR = {
    "n": lambda c: f"count({c})",
    # float s1; integral inputs use _STAT_EXPR_S1_INT instead so long sums
    # accumulate exactly (no float64 2^53 loss) and finalize back to long
    "s1": lambda c: f"sum(CAST({c} AS DOUBLE))",
    "s2": lambda c: f"sum(CAST({c} AS DOUBLE) * CAST({c} AS DOUBLE))",
    "s3": lambda c: f"sum(CAST({c} AS DOUBLE) * CAST({c} AS DOUBLE) * CAST({c} AS DOUBLE))",
    "s4": lambda c: f"sum(CAST({c} AS DOUBLE) * CAST({c} AS DOUBLE) * CAST({c} AS DOUBLE) * CAST({c} AS DOUBLE))",
    "mn": lambda c: f"min(CAST({c} AS DOUBLE))",
    "mx": lambda c: f"max(CAST({c} AS DOUBLE))",
    "fst": lambda c: f"min(CASE WHEN {c} IS NOT NULL THEN named_struct('t', ts, 'v', {c}) END)",
    "lst": lambda c: f"max(CASE WHEN {c} IS NOT NULL THEN named_struct('t', ts, 'v', {c}) END)",
}


def _stat_expr(c: str, s: str, integral: bool) -> str:
    if s == "s1" and integral:
        return f"sum(CAST({c} AS BIGINT))"
    return _STAT_EXPR[s](c)


def _stat_col(c: str, s: str) -> str:
    return f"__t_{c}_{s}"


class _TilePrefix:
    """Prefix/sparse structures over the per-key tile arrays."""

    def __init__(self, tdf: pd.DataFrame, col: str, stats: set[str], integral: bool = False):
        n_t = len(tdf)
        self.n = None
        self.prefix: dict[str, np.ndarray] = {}
        for s in ("n", "s1", "s2", "s3", "s4"):
            if s in stats:
                arr = pd.to_numeric(tdf[_stat_col(col, s)], errors="coerce").to_numpy(np.float64)
                arr = np.nan_to_num(arr, nan=0.0)
                if s == "s1" and integral:
                    # per-tile long sums cumulated in int64: exact long SUM
                    # even when the running total exceeds 2^53
                    ip = np.empty(n_t + 1, dtype=np.int64)
                    ip[0] = 0
                    np.cumsum(arr.astype(np.int64), out=ip[1:])
                    self.prefix[s] = ip
                    continue
                p = np.empty(n_t + 1)
                p[0] = 0.0
                np.cumsum(arr, out=p[1:])
                self.prefix[s] = p
        self.tmin = (
            _SparseTable(
                np.nan_to_num(
                    pd.to_numeric(tdf[_stat_col(col, "mn")], errors="coerce").to_numpy(np.float64),
                    nan=np.inf,
                ),
                is_min=True,
            )
            if "mn" in stats
            else None
        )
        self.tmax = (
            _SparseTable(
                np.nan_to_num(
                    pd.to_numeric(tdf[_stat_col(col, "mx")], errors="coerce").to_numpy(np.float64),
                    nan=-np.inf,
                ),
                is_min=False,
            )
            if "mx" in stats
            else None
        )
        # indices of tiles whose first/last struct is non-null
        for fl in ("fst", "lst"):
            if fl in stats:
                vals = tdf[_stat_col(col, fl)].to_numpy(object)
                nn = np.array([v is not None for v in vals], dtype=bool)
                setattr(self, f"{fl}_vals", vals)
                setattr(self, f"{fl}_nn", np.flatnonzero(nn))


class _HeadCol:
    """Raw head-event arrays for one input column."""

    def __init__(self, hdf: pd.DataFrame, col: str, numeric: bool):
        self.numeric = numeric
        if numeric:
            vals = pd.to_numeric(hdf[col], errors="coerce").to_numpy(np.float64)
            self.mask = ~np.isnan(vals)
            z = np.where(self.mask, vals, 0.0)
            self.ps = np.concatenate([[0.0], np.cumsum(z)])
            self.p2 = np.concatenate([[0.0], np.cumsum(z * z)])
            self.p3 = np.concatenate([[0.0], np.cumsum(z * z * z)])
            self.p4 = np.concatenate([[0.0], np.cumsum(z * z * z * z)])
            self.vals = vals
        else:
            raw = hdf[col].to_numpy(object)
            self.mask = np.array([v is not None and v == v for v in raw], dtype=bool)
            self.vals = raw
        self.pc = np.concatenate([[0.0], np.cumsum(self.mask.astype(np.float64))])
        self.nn_idx = np.flatnonzero(self.mask)
        self._tmin = None
        self._tmax = None

    def tmin(self) -> _SparseTable:
        if self._tmin is None:
            self._tmin = _SparseTable(np.where(self.mask, self.vals, np.inf), is_min=True)
        return self._tmin

    def tmax(self) -> _SparseTable:
        if self._tmax is None:
            self._tmax = _SparseTable(np.where(self.mask, self.vals, -np.inf), is_min=False)
        return self._tmax


class _BucketPrefix:
    """Per-bucket prefix sums over tile maps + raw head rows for bucketed
    additive ops (Map[bucket → count/sum/avg])."""

    def __init__(self, tdf: pd.DataFrame, hdf: pd.DataFrame, col: str, bucket: str):
        n_maps = tdf[_bt_col(col, bucket, "n")].to_numpy(object) if len(tdf) else np.array([], object)
        s_maps = tdf[_bt_col(col, bucket, "s1")].to_numpy(object) if len(tdf) else np.array([], object)
        hb = hdf[bucket].to_numpy(object) if len(hdf) else np.array([], object)
        raw = hdf[col].to_numpy(object) if len(hdf) else np.array([], object)
        hv = pd.to_numeric(hdf[col], errors="coerce").to_numpy(np.float64) if len(hdf) else np.array([])
        hv = np.nan_to_num(hv, nan=0.0)
        # update guard: input non-null (any type — COUNT works on strings)
        # AND bucket non-null
        h_valid = (
            np.array([v is not None and v == v for v in raw], dtype=bool)
            & np.array([b is not None for b in hb], dtype=bool)
            if len(hdf)
            else np.array([], bool)
        )

        universe = set()
        for m in n_maps:
            if m:
                universe.update(m.keys())
        universe.update(str(b) for b, ok in zip(hb, h_valid) if ok)
        self.per_bucket: dict[str, tuple] = {}
        n_t = len(n_maps)
        for b in sorted(universe):
            # map values can be null (e.g. sum over a tile whose inputs were
            # all null) — treat as 0 contribution
            tn = np.array([float(m.get(b) or 0) if m else 0.0 for m in n_maps])
            ts_ = np.array([float((s_maps[i] or {}).get(b) or 0.0) for i in range(n_t)])
            mask = h_valid & np.array([str(x) == b for x in hb], dtype=bool) if len(hb) else np.array([], bool)
            pc_t = np.concatenate([[0.0], np.cumsum(tn)])
            ps_t = np.concatenate([[0.0], np.cumsum(ts_)])
            pc_h = np.concatenate([[0.0], np.cumsum(mask.astype(np.float64))])
            ps_h = np.concatenate([[0.0], np.cumsum(np.where(mask, hv, 0.0))])
            self.per_bucket[b] = (pc_t, ps_t, pc_h, ps_h)


def make_tiled_kernel(
    gb: GroupBy,
    slim_cols: list[str],
    stats_by_col: dict[str, set[str]],
    numeric_by_col: dict[str, bool],
    input_types: dict[str, T.DataType],
):
    from chronon_spark.operators.temporal import _INTEGRAL, _cast_feature

    parts = gb.unpacked()
    bucket_pairs = _needed_bucket_pairs(gb)
    integral_by_col = {
        c: isinstance(input_types[c], _INTEGRAL) for c in input_types
    }

    def kernel(qdf: pd.DataFrame, cdf: pd.DataFrame) -> pd.DataFrame:
        out = qdf.loc[:, slim_cols].copy()
        nq = len(qdf)
        if nq == 0:
            for p in parts:
                out[p.output_column] = pd.Series([], dtype=object)
            return out
        tdf = cdf[cdf["__kind"] == 0].sort_values(TS_COL, kind="mergesort").reset_index(drop=True)
        hdf = cdf[cdf["__kind"] == 1].sort_values(TS_COL, kind="mergesort").reset_index(drop=True)
        tile_ts = tdf[TS_COL].to_numpy(np.int64)
        head_ts = hdf[TS_COL].to_numpy(np.int64)
        qt = qdf[TS_COL].to_numpy(np.int64)
        head_start = (qt // TILE_MS) * TILE_MS

        # shared index arrays
        t_hi = np.searchsorted(tile_ts, head_start, side="left")  # tiles < headStart
        h_lo = np.searchsorted(head_ts, head_start, side="left")
        h_hi = np.searchsorted(head_ts, qt, side="left")  # strict ts < qt

        tcols = {
            c: _TilePrefix(tdf, c, st, integral=integral_by_col.get(c, False))
            for c, st in stats_by_col.items()
        }
        hcols = {c: _HeadCol(hdf, c, numeric_by_col[c]) for c in stats_by_col}
        bcols = {(c, b): _BucketPrefix(tdf, hdf, c, b) for c, b in bucket_pairs}

        for p in parts:
            if p.bucket is not None:
                bp = bcols[(p.input_column, p.bucket)]
                if p.window is None:
                    t_lo = np.zeros(nq, dtype=np.int64)
                    hl = h_lo
                else:
                    w, hop = p.window.millis, p.hop_millis
                    tail = ((qt - w) // hop) * hop
                    t_lo = np.searchsorted(tile_ts, tail, side="left")
                    hl = np.maximum(h_lo, np.searchsorted(head_ts, tail, side="left"))
                maps: list = [dict() for _ in range(nq)]
                sum_as_int = p.operation is Operation.SUM and integral_by_col.get(
                    p.input_column, False
                )
                for b, (pc_t, ps_t, pc_h, ps_h) in bp.per_bucket.items():
                    n = (pc_t[t_hi] - pc_t[t_lo]) + (pc_h[h_hi] - pc_h[hl])
                    s1 = (ps_t[t_hi] - ps_t[t_lo]) + (ps_h[h_hi] - ps_h[hl])
                    for i in range(nq):
                        if n[i] > 0:
                            if p.operation is Operation.COUNT:
                                maps[i][b] = int(n[i])
                            elif p.operation is Operation.SUM:
                                maps[i][b] = int(round(s1[i])) if sum_as_int else float(s1[i])
                            else:
                                maps[i][b] = float(s1[i] / n[i])
                out[p.output_column] = [m if m else None for m in maps]
                continue
            tc, hc = tcols[p.input_column], hcols[p.input_column]
            if p.window is None:
                t_lo = np.zeros(nq, dtype=np.int64)
            else:
                w, hop = p.window.millis, p.hop_millis
                tail = ((qt - w) // hop) * hop
                t_lo = np.searchsorted(tile_ts, tail, side="left")
                # head events are also bounded below by tail (tiny windows)
            op = p.operation
            res: list = [None] * nq

            if op in (
                Operation.COUNT,
                Operation.SUM,
                Operation.AVERAGE,
                Operation.VARIANCE,
                Operation.SKEW,
                Operation.KURTOSIS,
            ):
                # head lower bound: max(headStart, tail)
                if p.window is None:
                    hl = h_lo
                else:
                    hl = np.maximum(h_lo, np.searchsorted(head_ts, tail, side="left"))
                n = (tc.prefix["n"][t_hi] - tc.prefix["n"][t_lo]) + (hc.pc[h_hi] - hc.pc[hl])
                if op is Operation.COUNT:
                    res = [int(v) if v > 0 else None for v in n]
                    out[p.output_column] = pd.array(res, dtype="Int64")
                    continue
                if op is Operation.SUM and integral_by_col.get(p.input_column, False):
                    # exact long path: int64 tile prefix + head contribution
                    # (head spans ≤ one 5-min tile, exact in float64)
                    s1t = tc.prefix["s1"][t_hi] - tc.prefix["s1"][t_lo]
                    s1h = np.rint(hc.ps[h_hi] - hc.ps[hl]).astype(np.int64)
                    res = [
                        int(a) + int(b) if c_ > 0 else None
                        for a, b, c_ in zip(s1t, s1h, n)
                    ]
                    out[p.output_column] = _cast_feature(
                        np.array(res, dtype=object), p, input_types[p.input_column]
                    )
                    continue
                s1 = (tc.prefix["s1"][t_hi] - tc.prefix["s1"][t_lo]) + (hc.ps[h_hi] - hc.ps[hl])
                if op is Operation.SUM:
                    res = [float(s) if c_ > 0 else None for s, c_ in zip(s1, n)]
                elif op is Operation.AVERAGE:
                    res = [float(s / c_) if c_ > 0 else None for s, c_ in zip(s1, n)]
                else:
                    s2 = (tc.prefix["s2"][t_hi] - tc.prefix["s2"][t_lo]) + (hc.p2[h_hi] - hc.p2[hl])
                    s3 = (tc.prefix["s3"][t_hi] - tc.prefix["s3"][t_lo]) + (hc.p3[h_hi] - hc.p3[hl])
                    s4 = (tc.prefix["s4"][t_hi] - tc.prefix["s4"][t_lo]) + (hc.p4[h_hi] - hc.p4[hl])
                    for i in range(nq):
                        c_ = n[i]
                        if c_ <= 0:
                            continue
                        m1 = s1[i] / c_
                        m2 = s2[i] / c_ - m1**2
                        if op is Operation.VARIANCE:
                            res[i] = float(max(m2, 0.0))
                        elif op is Operation.SKEW:
                            if c_ < 3 or m2 <= 0:
                                res[i] = float("nan")
                            else:
                                m3 = s3[i] / c_ - 3 * m1 * s2[i] / c_ + 2 * m1**3
                                res[i] = float(m3 / m2**1.5)
                        else:
                            if c_ < 4 or m2 <= 0:
                                res[i] = float("nan")
                            else:
                                m4 = (
                                    s4[i] / c_
                                    - 4 * m1 * s3[i] / c_
                                    + 6 * m1**2 * s2[i] / c_
                                    - 3 * m1**4
                                )
                                res[i] = float(m4 / m2**2 - 3.0)
            elif op in (Operation.MIN, Operation.MAX):
                is_min = op is Operation.MIN
                table = tc.tmin if is_min else tc.tmax
                tv = table.query(t_lo, t_hi)
                if p.window is None:
                    hl = h_lo
                else:
                    hl = np.maximum(h_lo, np.searchsorted(head_ts, tail, side="left"))
                hv = (hc.tmin() if is_min else hc.tmax()).query(hl, h_hi)
                comb = np.minimum(tv, hv) if is_min else np.maximum(tv, hv)
                valid = np.isfinite(comb)
                res = [float(v) if ok else None for v, ok in zip(comb, valid)]
            elif op in (Operation.FIRST, Operation.LAST):
                fl = "fst" if op is Operation.FIRST else "lst"
                nn = getattr(tc, f"{fl}_nn")
                vals = getattr(tc, f"{fl}_vals")
                if p.window is None:
                    hl = h_lo
                else:
                    hl = np.maximum(h_lo, np.searchsorted(head_ts, tail, side="left"))
                # vectorized index lookups: tile pick + head pick per query
                t_pos_first = np.searchsorted(nn, t_lo, side="left")
                t_pos_last = np.searchsorted(nn, t_hi, side="left") - 1
                h_pos_first = np.searchsorted(hc.nn_idx, hl, side="left")
                h_pos_last = np.searchsorted(hc.nn_idx, h_hi, side="left") - 1
                for i in range(nq):
                    if op is Operation.FIRST:
                        j = t_pos_first[i]
                        if j < len(nn) and nn[j] < t_hi[i]:
                            res[i] = vals[nn[j]]["v"]
                        else:
                            k2 = h_pos_first[i]
                            if k2 < len(hc.nn_idx) and hc.nn_idx[k2] < h_hi[i]:
                                res[i] = hc.vals[hc.nn_idx[k2]]
                    else:
                        k2 = h_pos_last[i]
                        if k2 >= 0 and k2 < len(hc.nn_idx) and hc.nn_idx[k2] >= hl[i]:
                            res[i] = hc.vals[hc.nn_idx[k2]]
                        else:
                            j = t_pos_last[i]
                            if j >= 0 and nn[j] >= t_lo[i]:
                                res[i] = vals[nn[j]]["v"]
                # FIRST/LAST keep the input column's type
                out[p.output_column] = _cast_feature(
                    np.array(res, dtype=object), p, input_types[p.input_column]
                )
                continue
            else:  # pragma: no cover
                raise ValueError(f"op {op} not tileable")

            # same output typing as the raw kernel: long for COUNT/integral
            # SUM, input type for MIN/MAX, double for the rest
            out[p.output_column] = _cast_feature(
                np.array(res, dtype=object), p, input_types[p.input_column]
            )
        return out

    return kernel


def temporal_events_tiled(
    spark: SparkSession,
    gb: GroupBy,
    queries: DataFrame,
    events: DataFrame,
    passthrough: bool = False,
) -> DataFrame:
    """Tiled exact as-of aggregation (see module docstring)."""
    keys = list(gb.key_columns)
    if not is_tileable(gb, events.schema):
        raise ValueError("GroupBy contains non-tileable parts; use temporal_events")
    stats_by_col = _needed_stats(gb)

    events = null_key_filter(events, tuple(keys)).filter(F.col(TS_COL).isNotNull())
    events = events.select(*[F.col(c).alias(c) for c in events.columns])

    cond = F.col(TS_COL).isNotNull()
    kcond = None
    for k in keys:
        c = F.col(k).isNotNull()
        kcond = c if kcond is None else (kcond | c)
    if kcond is not None:
        cond = cond & kcond
    if passthrough:
        qlite = queries.filter(cond)
        pad = queries.filter(~cond)
    else:
        qlite = queries.select(*keys, TS_COL).filter(cond).distinct()
        pad = None

    # ---- tiles: per-(key, 5min) IR stats; map-side combine compresses the
    # raw volume before the shuffle
    tile_col = (F.col(TS_COL) / TILE_MS).cast("long") * TILE_MS
    aggs = []
    from chronon_spark.operators.temporal import _INTEGRAL

    for c, stats in stats_by_col.items():
        integral = isinstance(events.schema[c].dataType, _INTEGRAL)
        for s in sorted(stats):
            aggs.append(F.expr(_stat_expr(c, s, integral)).alias(_stat_col(c, s)))
    if not aggs:
        # all parts bucketed: still need tile spine rows (counts only)
        aggs = [F.expr("count(*)").alias("__t_rows")]
    tiles = (
        events.withColumn("__tile", tile_col)
        .groupBy(*keys, "__tile")
        .agg(*aggs)
        .withColumnRenamed("__tile", TS_COL)
    )

    # bucketed additive parts: per-tile Map[bucket → (n, s1)] via a second
    # (key, tile, bucket) aggregation rolled into map IRs
    bucket_pairs = _needed_bucket_pairs(gb)
    for col, bucket in bucket_pairs:
        bt = (
            events.withColumn("__tile", tile_col)
            .filter(F.col(bucket).isNotNull())
            .groupBy(*keys, "__tile", bucket)
            .agg(
                F.expr(f"count({col})").alias("__n"),
                F.expr(f"sum(CAST({col} AS DOUBLE))").alias("__s1"),
            )
            .groupBy(*keys, "__tile")
            .agg(
                F.expr(
                    f"map_from_entries(collect_list(named_struct('key', {bucket}, 'value', __n)))"
                ).alias(_bt_col(col, bucket, "n")),
                F.expr(
                    f"map_from_entries(collect_list(named_struct('key', {bucket}, 'value', __s1)))"
                ).alias(_bt_col(col, bucket, "s1")),
            )
            .withColumnRenamed("__tile", TS_COL)
        )
        tiles = tiles.join(bt, keys + [TS_COL], "left")
    tiles = tiles.withColumn("__kind", F.lit(0))

    # ---- head events: raw rows only inside tiles that contain a query
    heads = qlite.select(*keys, ((F.col(TS_COL) / TILE_MS).cast("long") * TILE_MS).alias("__tile")).distinct()
    head_events = (
        events.withColumn("__tile", tile_col)
        .join(heads, keys + ["__tile"], "left_semi")
        .drop("__tile")
        .withColumn("__kind", F.lit(1))
    )

    head_cols = sorted(
        set(stats_by_col) | {c for c, _ in bucket_pairs} | {b for _, b in bucket_pairs}
    )
    combined = tiles.unionByName(head_events.select(
        *keys, TS_COL, "__kind", *[F.col(c) for c in head_cols]
    ), allowMissingColumns=True)

    slim_cols = qlite.columns if passthrough else keys + [TS_COL]
    ev_schema = events.schema
    fields = [qlite.schema[c] for c in slim_cols]
    for p in gb.unpacked():
        # identical output schema to the raw kernel (output_field /
        # _plain_output_type): auto-dispatch must never change types —
        # integral SUM stays long, MIN/MAX keep the input type, AVERAGE/
        # moments are double, COUNT long
        fields.append(output_field(p, ev_schema))
    schema = T.StructType(fields)

    numeric_by_col = {
        c: isinstance(ev_schema[c].dataType, (T.NumericType, T.BooleanType))
        for c in stats_by_col
    }
    input_types = {c: ev_schema[c].dataType for c in stats_by_col}
    kernel = make_tiled_kernel(gb, slim_cols, stats_by_col, numeric_by_col, input_types)
    from chronon_spark.operators.temporal import kernel_partitions

    p_n = kernel_partitions(spark)
    feats = (
        qlite.repartition(p_n, *keys)
        .groupBy(*keys)
        .cogroup(combined.repartition(p_n, *keys).groupBy(*keys))
        .applyInPandas(kernel, schema=schema)
    )
    if passthrough:
        if pad is not None:
            for p in gb.unpacked():
                f = schema[p.output_column]
                pad = pad.withColumn(p.output_column, F.lit(None).cast(f.dataType))
            feats = feats.unionByName(pad)
        return feats
    return queries.join(feats, slim_cols, "left")
