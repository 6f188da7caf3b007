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
