"""Temporal entities: point-in-time values over mutating dimension tables.

Semantics (spark/GroupBy.scala:179-274 temporalEntities + aggregator/
windowing/SawtoothMutationAggregator.scala:185-222): for a query at time
``qt`` on day ``D``, the value is

    EOD snapshot of day D-1   (all rows of snapshot partition ds = D-1)
  + mutations of day D with mutation_ts ≤ qt, where rows flagged
    ``is_before = true`` are DELETED from the aggregate and
    ``is_before = false`` rows are inserted
    (update = before+after pair, insert = after-only, delete =
    before-only — api/py/ai/chronon/query.py:66-72)

Abelian-group ops (COUNT/SUM/AVERAGE/VARIANCE/SKEW/KURTOSIS/HISTOGRAM)
honor deletes via ±1 weights; monoid ops (MIN/MAX/FIRST/LAST/...,
UNIQUE_COUNT) ignore deletes and fold inserts only, matching the
reference's isDeletable contract (api.thrift:155-185 comments).

Execution: the (snapshot ∪ mutations) union becomes a single weighted
event frame grouped by (keys, ds); one cogrouped Arrow kernel evaluates
every query with weighted prefix sums — same machinery as the events
kernel, plus a weight column. Windows: unbounded only in v1 (the
reference's windowed mutation path tiles per-day IRs; planned follow-up).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chronon_spark.api.types import GroupBy, Operation
from chronon_spark.operators.temporal import _plain_output_type, output_field
from chronon_spark.sources.scan import TS_COL, null_key_filter

DELETABLE = {
    Operation.COUNT,
    Operation.SUM,
    Operation.AVERAGE,
    Operation.VARIANCE,
    Operation.SKEW,
    Operation.KURTOSIS,
    Operation.HISTOGRAM,
}


def _weighted_kernel(gb: GroupBy, ev_schema: T.StructType, slim_cols: list[str]):
    parts = gb.unpacked()
    for p in parts:
        if p.window is not None:
            raise ValueError("temporal_entities v1 supports unbounded windows only")
        if p.bucket is not None:
            raise ValueError("buckets not supported in temporal_entities v1")
    input_types = {f.name: f.dataType for f in ev_schema.fields}

    def kernel(qdf: pd.DataFrame, edf: pd.DataFrame) -> pd.DataFrame:
        out = qdf.loc[:, slim_cols].copy()
        nq = len(qdf)
        if nq == 0:
            for p in parts:
                out[p.output_column] = pd.Series([], dtype=object)
            return out
        if len(edf) == 0:
            for p in parts:
                out[p.output_column] = None
            return out
        edf = edf.sort_values(TS_COL, kind="mergesort").reset_index(drop=True)
        ev_ts = edf[TS_COL].to_numpy(dtype=np.int64)
        w = edf["__w"].to_numpy(dtype=np.float64)
        qt = qdf[TS_COL].to_numpy(dtype=np.int64)
        # mutations at exactly qt are EXCLUDED (strictly mutationTs < queryTs,
        # SawtoothMutationAggregator.scala:204) — side='left'. Queries that
        # derive from the mutation stream must NOT see their own mutation.
        hi = np.searchsorted(ev_ts, qt, side="left")

        for p in parts:
            colname = p.input_column
            vals = pd.to_numeric(edf[colname], errors="coerce").to_numpy(dtype=np.float64) \
                if isinstance(input_types[colname], (T.NumericType, T.BooleanType)) \
                else None
            if p.operation is Operation.HISTOGRAM:
                # deletable histogram (SimpleAggregators.scala:250-322):
                # ± weighted counts per value; entries at exactly 0 are
                # removed, negative net counts are kept (reference
                # incrementInMap semantics).
                notna = edf[colname].notna().to_numpy()
                svals = edf[colname].astype(str).to_numpy(dtype=object)
                codes, uniques = pd.factorize(svals)
                res = []
                for i in range(nq):
                    n = hi[i]
                    if n == 0:
                        res.append(None)
                        continue
                    sel = notna[:n]
                    if not sel.any():
                        res.append(None)
                        continue
                    net = np.bincount(
                        codes[:n][sel], weights=w[:n][sel], minlength=len(uniques)
                    )
                    res.append(
                        {str(uniques[j]): int(net[j]) for j in range(len(uniques)) if net[j] != 0}
                    )
                out[p.output_column] = res
            elif p.operation in DELETABLE:
                mask = (~np.isnan(vals)) if vals is not None else edf[colname].notna().to_numpy()
                x = np.where(mask, vals if vals is not None else 0.0, 0.0)
                wm = np.where(mask, w, 0.0)
                pc = np.concatenate([[0.0], np.cumsum(wm)])
                ps = np.concatenate([[0.0], np.cumsum(wm * x)])
                n = pc[hi]
                s1 = ps[hi]
                if p.operation is Operation.COUNT:
                    out[p.output_column] = [int(v) if v > 0 else None for v in n]
                elif p.operation is Operation.SUM:
                    out[p.output_column] = [float(s) if c > 0 else None for s, c in zip(s1, n)]
                elif p.operation is Operation.AVERAGE:
                    out[p.output_column] = [
                        float(s / c) if c > 0 else None for s, c in zip(s1, n)
                    ]
                else:  # moments
                    p2 = np.concatenate([[0.0], np.cumsum(wm * x * x)])
                    p3 = np.concatenate([[0.0], np.cumsum(wm * x * x * x)])
                    p4 = np.concatenate([[0.0], np.cumsum(wm * x * x * x * x)])
                    res = []
                    for i in range(nq):
                        c = n[i]
                        if c <= 0:
                            res.append(None)
                            continue
                        m1 = s1[i] / c
                        m2 = p2[hi[i]] / c - m1**2
                        if p.operation is Operation.VARIANCE:
                            res.append(float(max(m2, 0.0)))
                        elif p.operation is Operation.SKEW:
                            if c < 3 or m2 <= 0:
                                res.append(float("nan"))
                            else:
                                m3 = p3[hi[i]] / c - 3 * m1 * p2[hi[i]] / c + 2 * m1**3
                                res.append(float(m3 / m2**1.5))
                        else:
                            if c < 4 or m2 <= 0:
                                res.append(float("nan"))
                            else:
                                m4 = (
                                    p4[hi[i]] / c
                                    - 4 * m1 * p3[hi[i]] / c
                                    + 6 * m1**2 * p2[hi[i]] / c
                                    - 3 * m1**4
                                )
                                res.append(float(m4 / m2**2 - 3.0))
                    out[p.output_column] = res
            else:
                # monoid / insert-only path (deletes ignored)
                ins = w > 0
                raw = edf[colname].to_numpy(dtype=object)
                nn = np.array([ins[i] and raw[i] is not None and raw[i] == raw[i] for i in range(len(raw))])
                res = []
                k = int(p.arg_map.get("k", 1))
                for i in range(nq):
                    sl = raw[: hi[i]][nn[: hi[i]]]
                    if len(sl) == 0:
                        res.append(None)
                        continue
                    if p.operation is Operation.MIN:
                        res.append(min(sl))
                    elif p.operation is Operation.MAX:
                        res.append(max(sl))
                    elif p.operation is Operation.FIRST:
                        res.append(sl[0])
                    elif p.operation is Operation.LAST:
                        res.append(sl[-1])
                    elif p.operation is Operation.LAST_K:
                        res.append(list(sl[-k:][::-1]))
                    elif p.operation is Operation.FIRST_K:
                        res.append(list(sl[:k]))
                    elif p.operation is Operation.UNIQUE_COUNT:
                        res.append(int(len(set(sl))))
                    else:
                        raise ValueError(f"unsupported mutation op {p.operation}")
                out[p.output_column] = res
            plain = _plain_output_type(p, input_types[colname])
            if isinstance(plain, T.LongType):
                out[p.output_column] = [
                    int(v) if v is not None and v == v else None for v in out[p.output_column]
                ]
        return out

    return kernel


def temporal_entities(
    spark: SparkSession,
    gb: GroupBy,
    queries: DataFrame,
    snapshots: DataFrame,
    mutations: DataFrame,
) -> DataFrame:
    """Point-in-time entity values at each query (keys, ts, ds).

    ``queries``: keys + ts (epoch ms) + ds (query day).
    ``snapshots``: keys + value columns + ds (EOD state per day).
    ``mutations``: keys + value columns + mutation_ts (epoch ms) +
    is_before (bool) + ds (day of mutation).
    """
    keys = list(gb.key_columns)
    parts = gb.unpacked()
    val_cols = sorted({p.input_column for p in parts})

    # day-D query sees day-(D-1) snapshot: shift snapshot ds forward.
    snap = (
        null_key_filter(snapshots, tuple(keys))
        .withColumn("ds", F.date_format(F.date_add(F.to_date("ds"), 1), "yyyy-MM-dd"))
        .select(
            *keys,
            F.lit(-(1 << 62)).alias(TS_COL),  # always before any query of the day
            F.lit(1.0).alias("__w"),
            *val_cols,
            "ds",
        )
    )
    mut = null_key_filter(mutations, tuple(keys)).select(
        *keys,
        F.col("mutation_ts").alias(TS_COL),
        F.when(F.col("is_before"), F.lit(-1.0)).otherwise(F.lit(1.0)).alias("__w"),
        *val_cols,
        "ds",
    )
    events = snap.unionByName(mut)
    events = events.select(*[F.col(c).alias(c) for c in events.columns])

    group_keys = keys + ["ds"]
    slim_cols = group_keys + [TS_COL]
    qlite = queries.select(*group_keys, TS_COL).filter(F.col(TS_COL).isNotNull()).distinct()

    ev_schema = events.schema
    schema = T.StructType(
        [qlite.schema[c] for c in slim_cols] + [output_field(p, ev_schema) for p in parts]
    )
    kernel = _weighted_kernel(gb, ev_schema, slim_cols)
    feats = (
        qlite.groupBy(*group_keys)
        .cogroup(events.groupBy(*group_keys))
        .applyInPandas(kernel, schema=schema)
    )
    return queries.join(feats, slim_cols, "left")
