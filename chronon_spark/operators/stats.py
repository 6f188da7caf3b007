"""Stats + Compare job family — feature-quality monitoring and
table-vs-table migration validation.

Re-expresses the reference's stats module on DataFrame primitives:

- ``column_summary`` — per-column daily summaries (null counts/rates,
  total row count, numeric percentiles), the StatsCompute.dailySummary +
  addDerivedMetrics semantics (spark/stats/StatsCompute.scala:34-117,
  aggregator/row/StatsGenerator.scala:85-131: IsNull→SUM per column,
  Raw→APPROX_PERCENTILE for numerics, One→COUNT total; null rate derived
  as null_sum / total_count).
- ``compare_tables`` — full-outer join two frames on keys and aggregate
  per-value-column match metrics (spark/stats/CompareBaseJob.scala:109-185
  + CompareMetrics.scala:35-120: both_null / left_null / right_null /
  mismatch sums, SMAPE average and left-minus-right percentiles for
  numerics, length percentiles + mismatch_length for sequences, total
  count). Returns BOTH the row-level comparison frame (the reference's
  ``*_comparison`` view) and the one-row metrics frame.

Percentile modes: the family defaults to ``percentile_mode="approx"`` —
Spark's ``percentile_approx`` (Greenwald-Khanna summary, O(accuracy)
aggregation buffer per group), which is the same bounded-memory contract
as the reference's KLL sketches (StatsCompute.scala percentile handling);
per-ds groups over a 100-TB table never buffer raw values.
``percentile_mode="exact"`` keeps Spark's exact ``percentile`` (linear
interpolation — matches numpy/DuckDB quantile_cont) as a test/oracle
mode. KLL *byte* parity stays blocked (datasketches wheel unavailable —
BENCH §limits).
String columns get the stats/EditDistance.scala metric via JVM-native
``levenshtein`` (absolute + max-length-normalized averages); ARRAY
columns keep length-based metrics only (a sequence DP edit distance is a
per-row Python loop — against the no-per-row-Python contract).

Scale shape: one shuffle for the summary groupBy (partial aggregation
map-side), one shuffle for the compare join (AQE may broadcast the
smaller side); metrics aggregate in a single pass over the joined frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# StatsGenerator.finalizedPercentilesMerged analogue: the percentile grid
# materialized for summaries
SUMMARY_PERCENTILES = (0.05, 0.25, 0.5, 0.75, 0.95)
# CompareMetrics.bins = 41 → 42-point grid for drift percentiles; a coarse
# 5-point grid keeps output width sane while preserving the semantics
COMPARE_PERCENTILES = (0.05, 0.25, 0.5, 0.75, 0.95)

_NUMERIC = (T.NumericType,)


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, T.NumericType)


# percentile modes: "approx" (default — bounded memory, GK summary) vs
# "exact" (test/oracle mode — buffers every group value; do NOT use on
# per-ds groups at scale)
PCT_APPROX = "approx"
PCT_EXACT = "exact"
# GK rank error = 1/accuracy; 10000 ⇒ 0.01% rank error, a few-hundred-KB
# aggregation buffer per group regardless of group size
DEFAULT_PCT_ACCURACY = 10000


def _pct_array(
    col_expr: str, ps, mode: str = PCT_APPROX, accuracy: int = DEFAULT_PCT_ACCURACY
) -> Column:
    arr = ", ".join(str(p) for p in ps)
    if mode == PCT_EXACT:
        return F.expr(f"percentile({col_expr}, array({arr}))")
    return F.expr(
        f"CAST(percentile_approx({col_expr}, array({arr}), {int(accuracy)}) AS array<double>)"
    )


def column_summary(
    df: DataFrame,
    keys: list[str] | tuple[str, ...] = (),
    ds_col: str = "ds",
    percentiles=SUMMARY_PERCENTILES,
    percentile_mode: str = PCT_APPROX,
) -> DataFrame:
    """Per-``ds`` (or global, when no ds column) summary row: total count,
    per-column null count + null rate, numeric percentiles.

    ``keys`` are excluded from summarization (StatsCompute noKeysDf)."""
    group = [ds_col] if ds_col in df.columns else []
    skip = set(keys) | set(group) | {"ts"}
    value_cols = [f for f in df.schema.fields if f.name not in skip]

    aggs: list[Column] = [F.count(F.lit(1)).alias("total_count")]
    for f in value_cols:
        aggs.append(
            F.sum(F.col(f.name).isNull().cast("long")).alias(f"{f.name}__null_count")
        )
        if _is_numeric(f.dataType):
            aggs.append(
                _pct_array(
                    f"CAST({f.name} AS DOUBLE)", percentiles, mode=percentile_mode
                ).alias(f"{f.name}__percentiles")
            )
    out = df.groupBy(*group).agg(*aggs) if group else df.agg(*aggs)
    for f in value_cols:
        out = out.withColumn(
            f"{f.name}__null_rate",
            F.col(f"{f.name}__null_count") / F.col("total_count"),
        )
    return out


def summary_job(
    spark,
    warehouse,
    input_table: str,
    output_table: str,
    keys: list[str] | tuple[str, ...] = (),
    start_ds: str | None = None,
    end_ds: str | None = None,
    step_days: int = 30,
    percentiles=SUMMARY_PERCENTILES,
    percentile_mode: str = PCT_APPROX,
) -> list[str]:
    """Incremental SummaryJob (spark/stats/SummaryJob.scala dailyRun):
    walk the UNFILLED output partitions only — each run summarizes just
    the days not yet in ``output_table`` and appends them with dynamic
    partition overwrite + lineage, exactly like every other range-walked
    job in the repo. A daily cron re-run therefore summarizes one new day,
    not the whole history. Returns the ds values written.

    ``start_ds``/``end_ds`` default to the input table's partition span.
    Scale shape: per step range, ONE groupBy(ds) with map-side partial
    aggregation and bounded-memory GK percentiles (percentile_mode
    default), reading only that range's input partitions (ds pushdown)."""
    from chronon_spark.plans.ranges import PartitionRange

    in_parts = warehouse.partitions(input_table)
    if not in_parts:
        return []
    start_ds = start_ds or min(in_parts)
    end_ds = end_ds or max(in_parts)
    written: list[str] = []
    for hole in warehouse.unfilled(output_table, PartitionRange(start_ds, end_ds)):
        for rng in hole.steps(step_days):
            df = warehouse.read(input_table).filter(
                (F.col("ds") >= rng.start) & (F.col("ds") <= rng.end)
            )
            out = column_summary(
                df, keys=keys, percentiles=percentiles, percentile_mode=percentile_mode
            )
            warehouse.insert_partitions(out, output_table)
            # days with no input rows produce no summary row; sidecars keep
            # them from re-reading as unfilled on the next cron run
            warehouse.record_days(output_table, rng.days(), {"kind": "summary"})
            written.extend(rng.days())
    return written


def compare_tables(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    mapping: dict[str, str] | None = None,
    percentile_mode: str = PCT_APPROX,
) -> tuple[DataFrame, DataFrame]:
    """Row-level comparison + aggregate metrics of two frames sharing keys.

    ``mapping``: left value column → right value column (CompareJob's
    rename map). Returns (comparison_df, metrics_df): comparison_df has
    keys + ``{col}_left`` / ``{col}_right`` pairs; metrics_df is one row
    of per-column sums/averages/percentile arrays."""
    mapping = dict(mapping or {})
    lvals = [c for c in left.columns if c not in keys]
    rvals = {c for c in right.columns if c not in keys}
    # consistency checks (CompareBaseJob.checkConsistency)
    missing = [mapping.get(c, c) for c in lvals if mapping.get(c, c) not in rvals]
    if missing:
        raise ValueError(f"right frame missing compare columns: {missing}")
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"key column '{k}' missing from one side")

    l_ren = left
    for c in lvals:
        l_ren = l_ren.withColumnRenamed(c, f"{c}_left")
    r_ren = right.select(*keys, *[F.col(mapping.get(c, c)).alias(f"{c}_right") for c in lvals])
    comparison = l_ren.join(r_ren, keys, "full_outer")

    ltypes = {f.name: f.dataType for f in left.schema.fields}
    aggs: list[Column] = [F.count(F.lit(1)).alias("total")]
    for c in lvals:
        lc, rc = F.col(f"{c}_left"), F.col(f"{c}_right")
        aggs += [
            F.sum((lc.isNull() & rc.isNull()).cast("long")).alias(f"{c}_both_null"),
            F.sum((lc.isNull() & rc.isNotNull()).cast("long")).alias(f"{c}_left_null"),
            F.sum((lc.isNotNull() & rc.isNull()).cast("long")).alias(f"{c}_right_null"),
        ]
        dt = ltypes[c]
        if not isinstance(dt, T.MapType):
            aggs.append(
                F.sum((lc.isNotNull() & rc.isNotNull() & (lc != rc)).cast("long")).alias(
                    f"{c}_mismatch"
                )
            )
        if _is_numeric(dt):
            denom = F.abs(lc) + F.abs(rc)
            smape = F.when(denom != 0.0, (F.abs(lc - rc) * 2).cast("double") / denom).otherwise(
                F.lit(0.0)
            )
            aggs += [
                F.avg(smape).alias(f"{c}_smape"),
                _pct_array(
                    f"CAST({c}_left - {c}_right AS DOUBLE)",
                    COMPARE_PERCENTILES,
                    mode=percentile_mode,
                ).alias(f"{c}_left_minus_right_pct"),
            ]
        if isinstance(dt, T.StringType):
            # EditDistance.scala metric for strings — JVM-native
            # levenshtein, averaged over rows where both sides present
            # (0 when equal), plus the reference's normalized variant
            # (distance / max length)
            both = lc.isNotNull() & rc.isNotNull()
            ed = F.when(both, F.levenshtein(lc, rc))
            norm = F.when(
                both,
                F.levenshtein(lc, rc)
                / F.greatest(F.length(lc), F.length(rc), F.lit(1)),
            )
            aggs += [
                F.avg(ed).alias(f"{c}_edit_distance"),
                F.avg(norm).alias(f"{c}_edit_distance_norm"),
            ]
        if isinstance(dt, T.ArrayType):
            aggs += [
                _pct_array(
                    f"CAST(size({c}_left) AS DOUBLE)", COMPARE_PERCENTILES, mode=percentile_mode
                ).alias(f"{c}_left_length_pct"),
                _pct_array(
                    f"CAST(size({c}_right) AS DOUBLE)", COMPARE_PERCENTILES, mode=percentile_mode
                ).alias(f"{c}_right_length_pct"),
                F.sum(
                    (lc.isNotNull() & rc.isNotNull() & (F.size(lc) != F.size(rc))).cast("long")
                ).alias(f"{c}_mismatch_length"),
            ]
    metrics = comparison.agg(*aggs)
    return comparison, metrics


def _bin_counts(df: DataFrame, col: str, edges: list[float]) -> "list[int]":
    """Per-bin counts over (-inf, e1], (e1, e2], ..., (en, +inf) in ONE
    map-side pass: bin index = number of edges strictly below the value
    (O(bins) JVM aggregate per row, no shuffle beyond the final tiny
    groupBy)."""
    arr = ", ".join(repr(float(e)) for e in edges)
    idx = F.expr(
        f"aggregate(array({arr}), 0, (acc, e) -> acc + CASE WHEN CAST({col} AS DOUBLE) > e "
        f"THEN 1 ELSE 0 END)"
    )
    rows = (
        df.filter(F.col(col).isNotNull())
        .select(idx.alias("__bin"))
        .groupBy("__bin")
        .count()
        .collect()
    )
    counts = [0] * (len(edges) + 1)
    for r in rows:
        counts[r["__bin"]] = r["count"]
    return counts


def _regularize(pmf, eps: float):
    """StatsGenerator.regularize: shift mass so no bin is zero while the
    distribution stays valid (aggregator/row/StatsGenerator.scala:175-188)."""
    import numpy as np

    pmf = np.asarray(pmf, dtype=np.float64)
    zeros = int((pmf == 0.0).sum())
    if zeros == 0:
        return pmf
    nonzero = len(pmf) - zeros
    out = pmf.copy()
    out[pmf == 0.0] = eps * nonzero / max(zeros, 1)
    out[pmf != 0.0] -= eps
    return out


def psi(
    reference: DataFrame,
    comparison: DataFrame,
    col: str,
    bins: int = 128,
    eps: float = 1e-6,
    percentile_mode: str = PCT_APPROX,
) -> float:
    """Population Stability Index between two frames' distributions of
    ``col`` — StatsGenerator.PSIKllSketch semantics
    (aggregator/row/StatsGenerator.scala:145-173): split points are the
    UNION of both sides' quantile grids, per-side PMFs are regularized
    against zero bins, PSI = Σ (p−q)·ln(p/q). Rules of thumb: <0.10
    little shift, 0.10-0.25 moderate, >0.25 action required.

    The reference reads bin masses off KLL sketches; the default
    ``percentile_mode="approx"`` matches that bounded-memory contract via
    ``percentile_approx`` (split points GK-approximate, bin masses exact
    from one counting pass per side); ``"exact"`` uses Spark's exact
    ``percentile`` as a test/oracle mode."""
    import numpy as np

    grid = [(i + 1) / (bins + 1) for i in range(bins)]
    edges = set()
    for df in (reference, comparison):
        q = df.agg(
            _pct_array(f"CAST({col} AS DOUBLE)", grid, mode=percentile_mode).alias("q")
        ).first()["q"]
        if q is None:
            return None
        edges.update(float(x) for x in q)
    split = sorted(edges)
    rc = np.asarray(_bin_counts(reference, col, split), dtype=np.float64)
    cc = np.asarray(_bin_counts(comparison, col, split), dtype=np.float64)
    if rc.sum() == 0 or cc.sum() == 0:
        return None
    p = _regularize(rc / rc.sum(), eps)
    q = _regularize(cc / cc.sum(), eps)
    return float(((p - q) * np.log(p / q)).sum())


def drift_series(
    spark,
    df: DataFrame,
    col: str,
    ds_col: str = "ds",
    bins: int = 32,
    eps: float = 1e-6,
    percentile_mode: str = PCT_APPROX,
) -> DataFrame:
    """Day-over-day drift: PSI of ``col`` between each ds and the
    previous ds (the SummaryJob temporal-drift read on summary
    percentiles). One groupBy(ds) computes every day's quantile grid;
    consecutive-day PSI is derived from the quantile functions driver-side
    (tiny: days × bins values). Returns (ds, psi vs previous ds)."""
    import numpy as np

    grid = [(i + 1) / (bins + 1) for i in range(bins)]
    rows = (
        df.filter(F.col(col).isNotNull())
        .groupBy(ds_col)
        .agg(_pct_array(f"CAST({col} AS DOUBLE)", grid, mode=percentile_mode).alias("q"))
        .orderBy(ds_col)
        .collect()
    )

    def pmf_from_quantiles(qs, split):
        # mass between split points = Δrank, rank via linear interpolation
        # on the inverse quantile function (the sketch getPMF analogue).
        # Deliberately written with FIXED operation order — ((j-1) +
        # frac)/ (B-1), division not reciprocal-multiply — so the DuckDB
        # gate oracle reproduces every float bit (numerically identical to
        # np.interp incl. duplicate-quantile ties, which resolve to the
        # last occurrence).
        B = len(qs)
        j = np.searchsorted(qs, split, side="right")  # count of q <= s
        ranks = np.empty(len(split))
        for i, s in enumerate(split):
            jj = j[i]
            if s <= qs[0]:
                ranks[i] = 0.0
            elif s >= qs[-1]:
                ranks[i] = 1.0
            elif qs[jj - 1] == s:
                ranks[i] = (jj - 1) / (B - 1)
            else:
                ranks[i] = ((jj - 1) + (s - qs[jj - 1]) / (qs[jj] - qs[jj - 1])) / (B - 1)
        return np.diff(np.concatenate([[0.0], ranks, [1.0]]))

    out = []
    for prev, cur in zip(rows, rows[1:]):
        qs_p, qs_c = np.asarray(prev["q"]), np.asarray(cur["q"])
        split = np.unique(np.concatenate([qs_p, qs_c]))
        p = _regularize(pmf_from_quantiles(qs_p, split), eps)
        q = _regularize(pmf_from_quantiles(qs_c, split), eps)
        out.append((cur[ds_col], float(((p - q) * np.log(p / q)).sum())))
    return spark.createDataFrame(out, f"{ds_col} string, psi double")


def consistency_job(
    spark,
    join,
    logged: DataFrame,
    sample_percent: float = 100.0,
    percentile_mode: str = PCT_APPROX,
) -> tuple[DataFrame, DataFrame]:
    """Online-offline consistency — the ConsistencyJob analogue
    (spark/stats/ConsistencyJob.scala:35-150) and the last member of the
    reference's stats job family (StatsCompute / CompareJob /
    ConsistencyJob / SummaryJob).

    ``logged`` carries the join's left key columns + ``ts`` + one column
    per ONLINE-SERVED feature value, named exactly as the offline
    backfill names them. The job rebuilds the comparison join with the
    logged rows as the left side (buildComparisonJoin: left keys + ts
    only — the served values must NOT leak into the recompute), runs the
    standard point-in-time enrichment offline over those rows, and feeds
    (logged, offline) through the same CompareMetrics machinery as
    ``compare_tables``. Returns (row-level comparison frame keyed by
    keys+ts, one-row metrics frame).

    ``sample_percent`` mirrors ``metaData.consistencySamplePercent``
    (api.thrift:285). Deviation, documented: the reference samples with
    ``RAND() <= pct``; we sample deterministically on
    ``xxhash64(keys, ts)`` so a resumed/re-run job compares the SAME row
    subset (checkpoint-stable lineage).

    Scale shape: sampling and key projection are map-side; the offline
    recompute is the ordinary enrichment path (small-mode IN / semi-join
    pruned right scans over the logged key set); the final compare joins
    on a per-row uid — with AQE the slim logged side broadcasts.
    """
    from chronon_spark.streaming.enrich import enrich_batch

    left_keys: list[str] = []
    for part in join.right_parts:
        for c in part.right_to_left().values():
            if c not in left_keys:
                left_keys.append(c)
    feature_cols = [
        c for c in logged.columns if c not in (*left_keys, "ts", "ds")
    ]
    if not feature_cols:
        raise ValueError("logged frame has no feature columns to check")
    if sample_percent < 100.0:
        bucket = F.pmod(
            F.xxhash64(*[F.col(k) for k in left_keys], F.col("ts")), F.lit(10_000)
        )
        logged = logged.filter(bucket < int(round(sample_percent * 100)))
    uid = "__log_uid"
    # persist: uid assignment must be computed once (monotonically_increasing_id
    # is plan-nondeterministic); eagerly materialize, then the comparison and
    # metrics frames both read the cached rows. Unpersisted after the single
    # metrics action below — comparison is returned re-reading the source.
    logged = logged.withColumn(uid, F.monotonically_increasing_id()).persist()
    try:
        offline = enrich_batch(spark, join, logged.select(uid, *left_keys, "ts"))
        comparison, metrics_df = compare_tables(
            logged.select(uid, *left_keys, "ts", *feature_cols),
            offline.select(uid, *left_keys, "ts", *feature_cols),
            keys=[uid, *left_keys, "ts"],
            percentile_mode=percentile_mode,
        )
        # materialize both outputs while the cache is live: metrics collapses
        # to one row; the comparison frame localCheckpoints so the returned
        # plan no longer depends on the soon-unpersisted cache.
        # The collect+createDataFrame round-trip is deliberate and bounded:
        # metrics_df is CompareMetrics output — one aggregated row per run
        # (a handful of scalar columns), never data-sized — and pinning it
        # driver-side frees the cached inputs immediately instead of
        # keeping a lazy plan referencing them.
        comparison = comparison.drop(uid).localCheckpoint(eager=True)
        metrics = spark.createDataFrame(metrics_df.collect(), metrics_df.schema)
    finally:
        logged.unpersist()
    return comparison, metrics
