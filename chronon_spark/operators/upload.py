"""Offline GroupByUpload / fetch analogue — the reference's serving
artifact rebuilt as a KV-shaped DataFrame.

The reference materializes, per key, a FinalBatchIr = collapsed prefix
IR + tail hop IRs at the batch-end boundary (spark/GroupByUpload.scala:
76-114, aggregator/windowing/SawtoothOnlineAggregator.scala:40-126) and
its fetcher merges that bounded state with the streamed head at fetch
time. This module is the same contract without a KV store: one row per
key whose width is O(window/hop) REGARDLESS of history length —

- per windowed aggregation: hop-aligned tail IRs covering exactly
  [floor_hop(boundary - window), boundary), the only hops any fetch in
  the serving day can reach;
- per unbounded aggregation: the collapsed full-prefix IR at the
  boundary;

— and ``fetch_features`` answers (key, ts) requests by merging the hop
IRs at/after each request's sawtooth window start with the streamed
events in [boundary, ts), per key, inside one Arrow-batched cogroup
kernel (the offline twin of the fetcher's in-memory merge).

Layout notes (deliberate deviations from the reference, documented):
- IRs are typed columns / flat parallel arrays, not serialized blobs —
  columnar-friendly, and every hop array is primitive-element only
  (array-of-struct-of-array inputs crash pyarrow's cogroup conversion).
- We store tail hops only for windowed ops; the reference additionally
  pre-collapses the hop majority per window. The merge count per fetch
  is ≤ window/hop (≤169 for 7d@1h) — bounded, so the pre-collapse is an
  optimization we skip, not a semantic.

Scope: the scalar-algebraic family (COUNT/SUM/AVERAGE/MIN/MAX/
VARIANCE/SKEW/KURTOSIS), FIRST/LAST (shared (ts, value) tie-break), and
APPROX_UNIQUE_COUNT (HLL register entries, functions/sketches.py).
Buckets, element-wise and set-like exact ops are rejected — those are
served offline by the lambda-tile path (streaming/lambda_tiles.py +
operators/tilestore.py), which covers every op at per-(key, tile)
granularity; this module exists for the bounded per-key serving LAYOUT.

At 100 TB: the upload is one groupBy per aggregation over the tail
range (partition-pruned scan: only ``window`` days of history are read
for windowed parts), producing key-partitioned frames that join
shuffle-free (all sides hash-partitioned on the keys), and the fetch is
one shuffle of (queries ∪ streamed-head) against the bounded per-key
state — no history scan at fetch time at all.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chronon_spark.api.types import (
    AggregationPart,
    GroupBy,
    Operation,
    sawtooth_hop_millis,
)
from chronon_spark.functions.sketches import HLL_M, hll_estimate, hll_idx_rho_exprs
from chronon_spark.sources.scan import TS_COL, null_key_filter

MS_DAY = 86_400_000

UPLOADABLE = {
    Operation.COUNT,
    Operation.SUM,
    Operation.AVERAGE,
    Operation.MIN,
    Operation.MAX,
    Operation.VARIANCE,
    Operation.SKEW,
    Operation.KURTOSIS,
    Operation.FIRST,
    Operation.LAST,
    Operation.APPROX_UNIQUE_COUNT,
}

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.BooleanType)

_MOMENT_STATES = {
    Operation.COUNT: ("n",),
    Operation.SUM: ("n", "s"),
    Operation.AVERAGE: ("n", "s1"),
    Operation.VARIANCE: ("n", "s1", "s2"),
    Operation.SKEW: ("n", "s1", "s2", "s3"),
    Operation.KURTOSIS: ("n", "s1", "s2", "s3", "s4"),
    Operation.MIN: ("n", "mn"),
    Operation.MAX: ("n", "mx"),
    Operation.FIRST: ("fst",),
    Operation.LAST: ("lst",),
}


def boundary_millis(end_ds: str) -> int:
    """Exclusive batch-end boundary: UTC midnight AFTER ``end_ds`` (the
    upload covers every event with ts < boundary)."""
    d = _dt.datetime.strptime(end_ds, "%Y-%m-%d").replace(tzinfo=_dt.timezone.utc)
    return int(d.timestamp()) * 1000 + MS_DAY


def _check_parts(gb: GroupBy) -> list[AggregationPart]:
    parts = list(gb.unpacked())
    bad = [
        p.output_column
        for p in parts
        if p.operation not in UPLOADABLE or p.bucket is not None or p.element_wise
    ]
    if bad:
        raise ValueError(
            f"not KV-uploadable (op outside the bounded-IR family, bucketed, "
            f"or element-wise): {bad}; serve these via the lambda-tile path "
            f"(operators/tilestore.py + streaming/lambda_tiles.py) instead"
        )
    return parts


def _lookback(p: AggregationPart, boundary: int) -> tuple[int, int]:
    """(hop_millis, first hop start any serving-day fetch can reach)."""
    r = sawtooth_hop_millis(p.window.millis)
    return r, ((boundary - p.window.millis) // r) * r


def _state_aggs(p: AggregationPart, integral: bool, lb: int | None = None) -> list:
    """Spark aggregate expressions for one part's IR states over a group
    (a hop group or the full prefix), named ``{output}__{state}``.
    ``lb``: when set, only rows with ts ≥ lb contribute — lets parts with
    DIFFERENT lookbacks share one hop-frame groupBy (hops before a
    part's own lookback carry empty states, which no fetch can reach:
    every serving-day window start is ≥ that part's lookback)."""
    c = F.col(p.input_column)
    if lb is not None:
        c = F.when(F.col(TS_COL) >= lb, c)
    o = p.output_column
    cd = c.cast("double")
    out = []
    for st in _MOMENT_STATES[p.operation]:
        if st == "n":
            out.append(F.count(c).alias(f"{o}__n"))
        elif st == "s":
            out.append(F.sum(c if integral else cd).alias(f"{o}__s"))
        elif st == "s1":
            out.append(F.sum(cd).alias(f"{o}__s1"))
        elif st == "s2":
            out.append(F.sum(cd * cd).alias(f"{o}__s2"))
        elif st == "s3":
            out.append(F.sum(cd * cd * cd).alias(f"{o}__s3"))
        elif st == "s4":
            out.append(F.sum(cd * cd * cd * cd).alias(f"{o}__s4"))
        elif st == "mn":
            out.append(F.min(c).alias(f"{o}__mn"))
        elif st == "mx":
            out.append(F.max(c).alias(f"{o}__mx"))
        elif st in ("fst", "lst"):
            # (ts, value) struct min/max — lexicographic struct ordering IS
            # the engine's shared exact-tie rule (operators/temporal.py
            # tie_compact): earliest ts, smallest value on ties for FIRST;
            # latest ts, largest value for LAST
            s = F.when(c.isNotNull(), F.struct(F.col(TS_COL).alias("t"), c.alias("v")))
            out.append(
                (F.min(s) if st == "fst" else F.max(s)).alias(f"{o}__{st}")
            )
    return out


def _explode_tv(df: DataFrame, o: str, st: str) -> DataFrame:
    """Split a struct(t, v) scalar state into flat _ts/_v columns."""
    col = f"{o}__{st}"
    return df.withColumn(f"{col}_ts", F.col(col)["t"]).withColumn(
        f"{col}_v", F.col(col)["v"]
    ).drop(col)


def group_by_upload(
    spark: SparkSession,
    gb: GroupBy,
    events: DataFrame,
    end_ds: str,
) -> DataFrame:
    """Per-key FinalBatchIr analogue at the ``end_ds`` boundary: exactly
    one row per key; every hop-IR column is a flat primitive array (see
    module docstring). ``events`` carries the GroupBy's key columns, an
    epoch-millis ``ts``, and each aggregation's input column."""
    parts = _check_parts(gb)
    keys = list(gb.key_columns)
    boundary = boundary_millis(end_ds)
    ev = null_key_filter(events, tuple(keys)).filter(
        F.col(TS_COL).isNotNull() & (F.col(TS_COL) < boundary)
    )
    ev_types = dict(zip(ev.schema.names, [f.dataType for f in ev.schema.fields]))

    def _integral(p):
        return isinstance(ev_types[p.input_column], _INTEGRAL)

    frames: list[DataFrame] = []

    # ---- all unbounded non-HLL parts: ONE full-prefix groupBy
    ub = [
        p
        for p in parts
        if p.window is None and p.operation is not Operation.APPROX_UNIQUE_COUNT
    ]
    if ub:
        aggs = [a for p in ub for a in _state_aggs(p, _integral(p))]
        f = ev.groupBy(*keys).agg(*aggs)
        for p in ub:
            for st in _MOMENT_STATES[p.operation]:
                if st in ("fst", "lst"):
                    f = _explode_tv(f, p.output_column, st)
        frames.append(f)

    # ---- windowed non-HLL parts: one hop frame PER RESOLUTION, shared
    # by every part at that hop (per-part lookback guards inside the agg)
    by_r: dict[int, list[AggregationPart]] = {}
    for p in parts:
        if p.window is not None and p.operation is not Operation.APPROX_UNIQUE_COUNT:
            by_r.setdefault(sawtooth_hop_millis(p.window.millis), []).append(p)
    for r, group in sorted(by_r.items()):
        lbs = {p.output_column: _lookback(p, boundary)[1] for p in group}
        lb_min = min(lbs.values())
        hop = F.expr(f"CAST({TS_COL} DIV {r} AS LONG) * {r}").alias("__h")
        aggs = [
            a
            for p in group
            for a in _state_aggs(
                p,
                _integral(p),
                lb=None if lbs[p.output_column] == lb_min else lbs[p.output_column],
            )
        ]
        g = ev.filter(F.col(TS_COL) >= lb_min).groupBy(*keys, hop).agg(*aggs)
        state_cols = [c for c in g.columns if "__" in c and c != "__h"]
        f = g.groupBy(*keys).agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("__h"), *state_cols))
            ).alias("__e")
        )

        def _ext(name):
            return lambda x: x[name]

        def _ext2(name, sub):
            return lambda x: x[name][sub]

        sel = [F.col(k) for k in keys] + [
            F.transform("__e", _ext("__h")).alias(f"__h{r}")
        ]
        for sc in state_cols:
            st = sc.rsplit("__", 1)[1]
            if st in ("fst", "lst"):
                sel.append(F.transform("__e", _ext2(sc, "t")).alias(f"{sc}_ts"))
                sel.append(F.transform("__e", _ext2(sc, "v")).alias(f"{sc}_v"))
            else:
                sel.append(F.transform("__e", _ext(sc)).alias(sc))
        frames.append(f.select(*sel))

    # ---- HLL parts: per-part two-stage register rollups
    for p in parts:
        o = p.output_column
        integral = _integral(p)
        if p.operation is Operation.APPROX_UNIQUE_COUNT:
            idx, rho = hll_idx_rho_exprs(p.input_column)
            base = ev.select(
                *keys, F.col(TS_COL), idx.alias("__i"), rho.alias("__r")
            ).filter(F.col("__i").isNotNull())
            if p.window is None:
                regs = base.groupBy(*keys, "__i").agg(F.max("__r").alias("__r"))
                f = regs.groupBy(*keys).agg(
                    F.sort_array(
                        F.collect_list(F.struct("__i", "__r"))
                    ).alias("__e")
                )
                f = f.select(
                    *keys,
                    F.transform("__e", lambda x: x["__i"]).alias(f"{o}__i"),
                    F.transform("__e", lambda x: x["__r"]).alias(f"{o}__r"),
                )
            else:
                r, lb = _lookback(p, boundary)
                hop = F.expr(f"CAST({TS_COL} DIV {r} AS LONG) * {r}").alias("__h")
                regs = (
                    base.filter(F.col(TS_COL) >= lb)
                    .groupBy(*keys, hop, "__i")
                    .agg(F.max("__r").alias("__r"))
                )
                f = regs.groupBy(*keys).agg(
                    F.sort_array(
                        F.collect_list(F.struct("__h", "__i", "__r"))
                    ).alias("__e")
                )
                f = f.select(
                    *keys,
                    F.transform("__e", lambda x: x["__h"]).alias(f"{o}__hh"),
                    F.transform("__e", lambda x: x["__i"]).alias(f"{o}__i"),
                    F.transform("__e", lambda x: x["__r"]).alias(f"{o}__r"),
                )
            frames.append(f)

    # ≤ (1 + #resolutions + #HLL-parts) narrow per-key frames — each the
    # output of groupBy(keys), so the outer joins line up on the keys
    out = frames[0]
    for f in frames[1:]:
        out = out.join(f, on=keys, how="outer")
    return out


# --------------------------------------------------------------------- fetch


def _np(row, col, dtype=None):
    v = row.get(col)
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return np.empty(0, dtype=dtype or np.float64)
    a = np.asarray(v, dtype=dtype) if dtype is not None else np.asarray(v)
    return a


def _nan_f(v):
    return np.nan if v is None else float(v)


def fetch_features(
    spark: SparkSession,
    gb: GroupBy,
    uploaded: DataFrame,
    streamed: DataFrame,
    queries: DataFrame,
    end_ds: str,
) -> DataFrame:
    """Serve point-in-time features for ``queries`` (keys + epoch-millis
    ``ts``, ts ≥ boundary) from the ``group_by_upload`` artifact plus the
    ``streamed`` head (events with ts ≥ boundary; earlier rows are
    ignored — they are the upload's job). Extra query columns pass
    through. One shuffle on the keys; per-key work is O(hops + head)
    via prefix/suffix state merges, never a history scan."""
    parts = _check_parts(gb)
    keys = list(gb.key_columns)
    boundary = boundary_millis(end_ds)

    st_types = dict(zip(streamed.schema.names, [f.dataType for f in streamed.schema.fields]))
    q_types = dict(zip(queries.schema.names, [f.dataType for f in queries.schema.fields]))
    inputs = sorted({p.input_column for p in parts})
    hll_cols = sorted(
        {p.input_column for p in parts if p.operation is Operation.APPROX_UNIQUE_COUNT}
    )
    passthrough = [c for c in queries.columns if c not in keys and c != TS_COL]

    head = null_key_filter(streamed, tuple(keys)).filter(
        F.col(TS_COL).isNotNull() & (F.col(TS_COL) >= boundary)
    )
    for c in hll_cols:
        idx, rho = hll_idx_rho_exprs(c)
        head = head.withColumn(f"__hi_{c}", idx).withColumn(f"__hr_{c}", rho)
    head_sel = (
        [F.col(k) for k in keys]
        + [F.lit(0).alias("__tag"), F.col(TS_COL)]
        + [F.col(c) for c in inputs]
        + [F.col(f"__hi_{c}") for c in hll_cols]
        + [F.col(f"__hr_{c}") for c in hll_cols]
        + [F.lit(None).cast(q_types[c]).alias(c) for c in passthrough]
    )
    q_sel = (
        [F.col(k) for k in keys]
        + [F.lit(1).alias("__tag"), F.col(TS_COL)]
        + [F.lit(None).cast(st_types[c]).alias(c) for c in inputs]
        + [F.lit(None).cast("int").alias(f"__hi_{c}") for c in hll_cols]
        + [F.lit(None).cast("int").alias(f"__hr_{c}") for c in hll_cols]
        + [F.col(c) for c in passthrough]
    )
    left = head.select(*head_sel).unionByName(queries.select(*q_sel))

    # ---- plain-python part configs for the kernel closure
    cfg = []
    for p in parts:
        integral = isinstance(st_types[p.input_column], _INTEGRAL)
        w = None if p.window is None else p.window.millis
        r = None if w is None else sawtooth_hop_millis(w)
        cfg.append(
            {
                "o": p.output_column,
                "op": p.operation,
                "col": p.input_column,
                "w": w,
                "r": r,
                # shared per-resolution hop-start array in the upload row
                "hop": None if r is None else f"__h{r}",
                "integral": integral,
                "numeric": isinstance(
                    st_types[p.input_column], (T.NumericType, T.BooleanType)
                ),
            }
        )
        if p.operation in (Operation.MIN, Operation.MAX) and not cfg[-1]["numeric"]:
            raise ValueError(
                f"{p.output_column}: MIN/MAX upload-fetch supports numeric "
                f"inputs only; use the lambda-tile path for {st_types[p.input_column]}"
            )

    out_fields = [T.StructField(k, q_types[k]) for k in keys]
    out_fields += [T.StructField(c, q_types[c]) for c in passthrough]
    for c in cfg:
        op = c["op"]
        if op in (Operation.COUNT, Operation.APPROX_UNIQUE_COUNT):
            t = T.LongType()
        elif op is Operation.SUM:
            t = T.LongType() if c["integral"] else T.DoubleType()
        elif op in (
            Operation.AVERAGE,
            Operation.VARIANCE,
            Operation.SKEW,
            Operation.KURTOSIS,
        ):
            t = T.DoubleType()
        else:  # MIN / MAX / FIRST / LAST — input-typed
            t = st_types[c["col"]]
        out_fields.append(T.StructField(c["o"], t))
    out_schema = T.StructType(out_fields)
    long_cols = {
        f.name
        for f in out_fields[len(keys) + len(passthrough) :]
        if isinstance(f.dataType, T.LongType)
    }

    def kernel(l: pd.DataFrame, up: pd.DataFrame) -> pd.DataFrame:
        q = l[l["__tag"] == 1]
        if not len(q):
            return pd.DataFrame({f.name: pd.Series(dtype=object) for f in out_fields})
        ev = l[l["__tag"] == 0]
        urow = up.iloc[0].to_dict() if len(up) else {}
        qt = q[TS_COL].to_numpy(np.int64)
        res: dict[str, np.ndarray] = {}

        # per-input-col compacted head arrays, (ts, value)-tie-ordered
        packs: dict[str, tuple] = {}

        def pack(col, numeric):
            if col not in packs:
                vals = ev[col]
                nn = vals.notna().to_numpy()
                ets = ev[TS_COL].to_numpy(np.int64)[nn]
                if numeric:
                    cv = pd.to_numeric(vals[nn]).to_numpy(np.float64)
                    order = np.lexsort((cv, ets))
                else:
                    cv = vals[nn].to_numpy(object)
                    order = np.lexsort(
                        (np.array([str(x) for x in cv], dtype=object), ets)
                    )
                cts, cv = ets[order], cv[order]
                packs[col] = (cts, cv)
            return packs[col]

        for c in cfg:
            o, op, col, w, r = c["o"], c["op"], c["col"], c["w"], c["r"]
            # ---------------- batch state at each query's window start
            if w is None:
                ws = None
                nb = np.full(len(qt), float(urow.get(f"{o}__n") or 0.0))
            else:
                ws = ((qt - w) // r) * r
            if op is Operation.APPROX_UNIQUE_COUNT:
                res[o] = _fetch_hll(c, urow, ev, qt, ws, boundary)
                continue
            cts, cv = pack(col, c["numeric"])
            j = np.searchsorted(cts, qt, side="left")
            lo = (
                np.zeros(len(qt), dtype=np.int64)
                if ws is None
                else np.searchsorted(cts, np.maximum(ws, boundary), side="left")
            )
            if op in (Operation.FIRST, Operation.LAST):
                res[o] = _fetch_firstlast(c, urow, cts, cv, lo, j, ws)
                continue
            # cumulative head states (prefix diffs serve ANY [lo, j) range)
            cn = np.arange(1, len(cts) + 1, dtype=np.float64)
            h_n = _rng(cn, lo, j)
            if w is None:
                b_n = nb
            else:
                hh = _np(urow, c["hop"], np.int64)
                bidx = np.searchsorted(hh, ws, side="left")
                b_n = _suffix_sum(_np(urow, f"{o}__n", np.float64), len(hh))[bidx]
            n = b_n + h_n
            if op is Operation.COUNT:
                res[o] = np.where(n > 0, n, np.nan)
                continue
            if op in (Operation.MIN, Operation.MAX):
                res[o] = _fetch_minmax(c, urow, cts, cv, lo, j, ws, boundary)
                continue
            # SUM / AVERAGE / moments
            powers = {"s": 1, "s1": 1, "s2": 2, "s3": 3, "s4": 4}
            need = [st for st in _MOMENT_STATES[op] if st != "n"]
            tot = {}
            for st in need:
                pw = powers[st]
                cs = np.concatenate(([0.0], np.cumsum(cv**pw)))
                h_s = cs[j] - cs[lo]
                if w is None:
                    b_s = np.full(len(qt), _nan_f(urow.get(f"{o}__{st}")))
                    b_s = np.where(np.isnan(b_s), 0.0, b_s)
                else:
                    hh = _np(urow, c["hop"], np.int64)
                    bidx = np.searchsorted(hh, ws, side="left")
                    arr = _np(urow, f"{o}__{st}", np.float64)
                    b_s = _suffix_sum(np.nan_to_num(arr), len(hh))[bidx]
                tot[st] = b_s + h_s
            empty = n == 0
            if op is Operation.SUM:
                res[o] = np.where(empty, np.nan, tot["s"])
            elif op is Operation.AVERAGE:
                res[o] = np.where(empty, np.nan, tot["s1"] / np.maximum(n, 1))
            else:
                res[o] = _finalize_moments(op, n, tot)

        out = {k: q[k].to_numpy() for k in keys}
        for c in passthrough:
            out[c] = q[c].to_numpy()
        pdf = pd.DataFrame(out)
        for c in cfg:
            vals = res[c["o"]]
            if c["o"] in long_cols:
                s = pd.array(
                    [None if (isinstance(v, float) and np.isnan(v)) or v is None else int(round(v)) for v in vals],
                    dtype="Int64",
                )
                pdf[c["o"]] = s
            elif isinstance(vals, np.ndarray) and vals.dtype == object:
                if c["op"] in (
                    Operation.VARIANCE,
                    Operation.SKEW,
                    Operation.KURTOSIS,
                ) or (c["numeric"] and c["op"] in (Operation.FIRST, Operation.LAST)):
                    # explicit mask keeps genuine NaN (skew/kurt n<3 rule)
                    # distinct from SQL null — object columns would fold
                    # NaN into null on the Arrow conversion
                    mask = np.array([v is None for v in vals], dtype=bool)
                    fv = np.array(
                        [0.0 if m else float(v) for v, m in zip(vals, mask)],
                        dtype=np.float64,
                    )
                    pdf[c["o"]] = pd.arrays.FloatingArray(fv, mask)
                else:
                    pdf[c["o"]] = vals
            else:
                # numeric doubles: NaN here always means "empty window"
                # (null inputs were compacted away; formula-NaN ops return
                # object arrays above) — emit SQL null, like the kernels
                fv = np.asarray(vals, dtype=np.float64)
                mask = np.isnan(fv)
                pdf[c["o"]] = pd.arrays.FloatingArray(
                    np.where(mask, 0.0, fv), mask
                )
        return pdf

    return (
        left.groupby(*keys)
        .cogroup(uploaded.groupby(*keys))
        .applyInPandas(kernel, schema=out_schema)
    )


def _rng(cum1, lo, j):
    cs = np.concatenate(([0.0], cum1))
    return cs[j] - cs[lo]


def _suffix_sum(arr: np.ndarray, n: int) -> np.ndarray:
    """suffix[i] = sum(arr[i:]); length n+1 (suffix[n] == 0) so a clipped
    searchsorted index past the end reads 0."""
    out = np.zeros(n + 1, dtype=np.float64)
    if n:
        out[:n] = np.cumsum(arr[::-1])[::-1]
    return out


def _finalize_moments(op, n, tot):
    """Population-moment finalize — bit-for-bit the raw kernel's formulas
    (operators/temporal.py:264-283): variance = m2 clipped ≥ 0; skew NaN
    when n<3 or m2≤0; kurtosis excess, NaN when n<4 or m2≤0; None (not
    NaN) when the window is empty."""
    with np.errstate(invalid="ignore", divide="ignore"):
        m1 = tot["s1"] / n
        m2 = tot["s2"] / n - m1**2
        if op is Operation.VARIANCE:
            vals = np.maximum(m2, 0.0)
        elif op is Operation.SKEW:
            m3 = tot["s3"] / n - 3 * m1 * tot["s2"] / n + 2 * m1**3
            vals = np.where(
                (n < 3) | (m2 <= 0), np.nan, m3 / np.power(np.maximum(m2, 1e-300), 1.5)
            )
        else:
            m4 = (
                tot["s4"] / n
                - 4 * m1 * tot["s3"] / n
                + 6 * m1**2 * tot["s2"] / n
                - 3 * m1**4
            )
            vals = np.where(
                (n < 4) | (m2 <= 0), np.nan, m4 / np.maximum(m2, 1e-300) ** 2 - 3.0
            )
    out = np.empty(len(n), dtype=object)
    out[:] = None
    has = n > 0
    out[has] = [float(v) for v in vals[has]]
    return out


def _fetch_minmax(c, urow, cts, cv, lo, j, ws, boundary):
    o, op = c["o"], c["op"]
    fn, acc = (np.fmin, np.minimum) if op is Operation.MIN else (np.fmax, np.maximum)
    sname = "mn" if op is Operation.MIN else "mx"
    # batch: suffix accumulate over hop states
    if ws is None:
        b = np.full(len(lo), _nan_f(urow.get(f"{o}__{sname}")))
    else:
        hh = _np(urow, c["hop"], np.int64)
        arr = _np(urow, f"{o}__{sname}", np.float64)
        suf = np.full(len(hh) + 1, np.nan)
        if len(hh):
            suf[:-1] = acc.accumulate(np.where(np.isnan(arr[::-1]), np.inf if op is Operation.MIN else -np.inf, arr[::-1]))[::-1]
            suf[np.isinf(suf)] = np.nan
        bidx = np.searchsorted(hh, ws, side="left")
        b = suf[bidx]
    # head: prefix accumulate covers lo == 0; short-window rows slice
    n = len(cts)
    h = np.full(len(lo), np.nan)
    if n:
        pre = acc.accumulate(cv)
        full = lo == 0
        jj = j[full]
        h[full] = np.where(jj > 0, pre[np.maximum(jj - 1, 0)], np.nan)
        for i in np.flatnonzero(~full):
            if j[i] > lo[i]:
                h[i] = cv[lo[i] : j[i]].min() if op is Operation.MIN else cv[lo[i] : j[i]].max()
    return fn(b, h)


def _fetch_firstlast(c, urow, cts, cv, lo, j, ws):
    o, op = c["o"], c["op"]
    first = op is Operation.FIRST
    nq = len(lo)
    out = np.empty(nq, dtype=object)
    out[:] = None
    if ws is None:
        bts = urow.get(f"{o}__{'fst' if first else 'lst'}_ts")
        bv = urow.get(f"{o}__{'fst' if first else 'lst'}_v")
        has_b = np.full(nq, bts is not None and not (isinstance(bts, float) and np.isnan(bts)))
        bvs = np.full(nq, bv, dtype=object)
    else:
        hh = _np(urow, c["hop"], np.int64)
        st = "fst" if first else "lst"
        hts = _np(urow, f"{o}__{st}_ts", np.float64)
        hv_raw = urow.get(f"{o}__{st}_v")
        hv = (
            np.empty(0, dtype=object)
            if hv_raw is None or (isinstance(hv_raw, float) and np.isnan(hv_raw))
            else np.asarray(hv_raw, dtype=object)
        )
        valid = np.flatnonzero(~np.isnan(hts)) if len(hts) else np.empty(0, np.int64)
        bidx = np.searchsorted(hh, ws, side="left")
        has_b = np.zeros(nq, dtype=bool)
        bvs = np.empty(nq, dtype=object)
        # FIRST: first valid hop ≥ window start; LAST: last valid hop
        # (hop ranges are disjoint ascending, so hop order is time order)
        for i in range(nq):
            k = np.searchsorted(valid, bidx[i], side="left")
            if first:
                if k < len(valid):
                    has_b[i] = True
                    bvs[i] = hv[valid[k]]
            else:
                if k < len(valid):
                    has_b[i] = True
                    bvs[i] = hv[valid[-1]]
    has_h = j > lo
    for i in range(nq):
        if first:
            out[i] = bvs[i] if has_b[i] else (cv[lo[i]] if has_h[i] else None)
        else:
            out[i] = cv[j[i] - 1] if has_h[i] else (bvs[i] if has_b[i] else None)
    if c["numeric"]:
        return np.array([np.nan if v is None else float(v) for v in out])
    return out


def _fetch_hll(c, urow, ev, qt, ws, boundary):
    o, col = c["o"], c["col"]
    nq = len(qt)
    # batch: per-hop-suffix dense register snapshots (windowed) or the
    # collapsed register entries (unbounded)
    if ws is None:
        bi = _np(urow, f"{o}__i", np.int64)
        br = _np(urow, f"{o}__r", np.int64)
        base = np.zeros(HLL_M, dtype=np.uint8)
        if len(bi):
            np.maximum.at(base, bi, br.astype(np.uint8))
        snaps, bidx = base[None, :], np.zeros(nq, dtype=np.int64)
    else:
        hh_e = _np(urow, f"{o}__hh", np.int64)  # hop per entry (sorted)
        bi = _np(urow, f"{o}__i", np.int64)
        br = _np(urow, f"{o}__r", np.int64)
        hops = np.unique(hh_e)
        snaps = np.zeros((len(hops) + 1, HLL_M), dtype=np.uint8)
        for k in range(len(hops) - 1, -1, -1):
            snaps[k] = snaps[k + 1]
            s0, s1 = np.searchsorted(hh_e, hops[k], "left"), np.searchsorted(
                hh_e, hops[k], "right"
            )
            np.maximum.at(snaps[k], bi[s0:s1], br[s0:s1].astype(np.uint8))
        bidx = np.searchsorted(hops, ws, side="left")
    # head: per-event (idx, rho) precomputed JVM-side
    hi = pd.to_numeric(ev[f"__hi_{col}"], errors="coerce").to_numpy(np.float64)
    ets = ev[TS_COL].to_numpy(np.int64)
    nn = ~np.isnan(hi)
    ets, hi = ets[nn], hi[nn].astype(np.int64)
    hr = (
        pd.to_numeric(ev[f"__hr_{col}"], errors="coerce")
        .to_numpy(np.float64)[nn]
        .astype(np.uint8)
    )
    order = np.argsort(ets, kind="stable")
    ets, hi, hr = ets[order], hi[order], hr[order]
    out = np.empty(nq, dtype=object)
    out[:] = None
    j = np.searchsorted(ets, qt, side="left")
    lo = (
        np.zeros(nq, dtype=np.int64)
        if ws is None
        else np.searchsorted(ets, np.maximum(ws, boundary), side="left")
    )
    for i in range(nq):
        regs = snaps[bidx[i]].copy()
        if j[i] > lo[i]:
            np.maximum.at(regs, hi[lo[i] : j[i]], hr[lo[i] : j[i]])
        if regs.any():
            out[i] = float(hll_estimate(regs))
        else:
            out[i] = np.nan
    return np.array([np.nan if v is None else v for v in out], dtype=np.float64)
