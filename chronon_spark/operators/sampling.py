"""Deterministic sampling & splits — hash-uniform, partition-independent.

Training pipelines need sampling that is (a) per-stratum (domain/source
quotas), (b) reproducible bit-for-bit across reruns, and (c) stable
under repartitioning — ``DataFrame.sample(seed=...)`` fails (c): its
RNG is seeded per partition INDEX, so a different file split or an AQE
re-plan silently changes which rows are kept, which breaks
checkpoint-resumable backfills. Here membership is a pure function of
(row key, seed): ``md5(key:seed)``'s first 32 bits as a uniform in
[0, 1). The reference engine has no sampling operator — this is
beyond-reference training-data surface.

100 TB shape: a map-side filter — md5 + compare inside whole-stage
codegen, zero shuffle, no driver state; the stratum→rate table rides
the plan as a literal map. Survivors carry ``sample_weight = 1/rate``
so downstream aggregates stay unbiased (Horvitz-Thompson).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def uniform_hash(key_cols: list[str], seed: int = 0) -> Column:
    """Uniform in [0, 1), a pure function of the key columns + seed:
    first 8 hex chars of md5 over 2^32. Exactly representable as a
    double, so rate comparisons are reproducible across engines."""
    key = F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols], F.lit(str(seed)))
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
        / F.lit(float(2**32))
    ).alias("__u")


def sample_stratified(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "source",
    key_cols: list[str] | None = None,
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's rate: ``u(key, seed) < rate``.
    Rows of strata absent from ``rates`` use ``default_rate``. Adds
    ``sample_weight = 1/rate`` to the survivors."""
    key_cols = key_cols or ["doc_id"]
    pairs: list[Column] = []
    for k, v in rates.items():
        pairs += [F.lit(k), F.lit(float(v))]
    rate = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(stratum_col).cast("string")),
        F.lit(float(default_rate)),
    )
    u = uniform_hash(key_cols, seed)
    return (
        df.withColumn("__rate", rate)
        .filter(u < F.col("__rate"))
        .withColumn("sample_weight", F.lit(1.0) / F.col("__rate"))
        .drop("__rate")
    )


def mixture_rates(
    docs: DataFrame,
    stratum_col: str = "source",
    alpha: float = 0.7,
    target_total: int | None = None,
) -> DataFrame:
    """Temperature-based source mixing: per stratum, the sampling rate
    that realizes a ``count^alpha``-proportional mixture (alpha < 1
    upweights small sources — the standard pretraining mixing rule).

    Returns (stratum, n_docs, weight, rate): ``weight = n^alpha /
    sum(n^alpha)``; ``rate = min(1, weight * target_total / n)`` — capped
    because hash sampling draws without replacement. Feed the result to
    ``sample_stratified`` (collect to a dict; one row per stratum, so
    the collect is tiny even with 10^5 domains)."""
    agg = docs.groupBy(F.col(stratum_col).cast("string").alias("stratum")).agg(
        F.count("*").alias("n_docs")
    )
    total = F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))).alias("z")
    z = agg.agg(total)
    out = agg.crossJoin(F.broadcast(z)).withColumn(
        "weight", F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha))) / F.col("z")
    )
    tgt = F.lit(float(target_total if target_total is not None else docs.count()))
    return out.select(
        "stratum",
        "n_docs",
        F.round("weight", 6).alias("weight"),
        F.round(
            F.least(F.lit(1.0), F.col("weight") * tgt / F.col("n_docs")), 6
        ).alias("rate"),
    )


def sample_to_mixture(
    docs: DataFrame,
    stratum_col: str = "source",
    alpha: float = 0.7,
    target_total: int | None = None,
    key_cols: list[str] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Compose: derive temperature-mixture rates, then hash-sample to
    them. The rate table is one row per stratum (driver-collected)."""
    rates = {
        r["stratum"]: r["rate"]
        for r in mixture_rates(docs, stratum_col, alpha, target_total).collect()
    }
    return sample_stratified(docs, rates, stratum_col, key_cols, seed, default_rate=0.0)


def split_assign(
    df: DataFrame,
    weights: dict[str, float],
    key_cols: list[str] | None = None,
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to one split (e.g. train/valid/test) by cumulative
    weight interval over the same hash-uniform — deterministic, stable
    under repartitioning, and disjoint by construction. Weights must sum
    to 1 (validated); interval edges are half-open so a row lands in
    exactly one split."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    key_cols = key_cols or ["doc_id"]
    u = uniform_hash(key_cols, seed)
    expr: Column | None = None
    cum = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += w
        cond = u < F.lit(cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)
