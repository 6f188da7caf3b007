"""Batch model transform — the ModelTransformBatchJob analogue.

The reference's ModelTransformBatchJob
(spark/ModelTransformBatchJob.scala:26-126) walks the join output's
unfilled partition ranges, hands each range's frame to a pluggable
ModelBackend (online/ModelBackend.scala:33-53,
runModelInferenceBatchJob), and partition-inserts the scored frame into
the model-output table. This module keeps the same job shape —
unfilled-range set algebra, step ranges, dynamic-overwrite insert,
lineage — with the backend re-expressed Spark-first:

- ``LinearModelBackend`` — a real, runnable scorer:
  ``score = link(w · x + b)`` over an embedding array column. Small dims
  ride pure-SQL ``aggregate(zip_with(...))`` (JVM whole-stage codegen);
  above ``VECTORIZED_DIM_CUTOFF`` the weight vector broadcasts as numpy
  into one Arrow-batched pandas_udf — a single BLAS matvec per batch, no
  per-row Python (the similarity-module pattern).
- ``ExternalModelBackend`` — the integration point for real serving
  backends. Takes a ``(spark, df) -> df`` callable; without one it
  raises NotImplementedError (no model runtimes in this container — the
  Spark-side plumbing this module owns is the range walk, schema
  pass-through, and partitioned insert).

Scale shape: scoring is map-side (zero shuffles added on top of the
scan); each step range is an independent insert, so a killed backfill
resumes from the unfilled set exactly like the feature backfills.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from chronon_spark.operators.similarity import VECTORIZED_DIM_CUTOFF
from chronon_spark.plans.ranges import PartitionRange


def _apply_link(x: Column, link: str) -> Column:
    if link == "identity":
        return x
    if link == "sigmoid":
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-x))
    raise ValueError(f"unknown link '{link}'")


@dataclass
class LinearModelBackend:
    """``score = link(weights · input_col + bias)`` over an array column.

    Deterministic and oracle-expressible (DuckDB ``list_dot_product``) —
    the runnable stand-in for an external model runtime."""

    weights: np.ndarray
    bias: float = 0.0
    link: str = "identity"
    input_col: str = "embedding"
    output_col: str = "score"

    def transform(self, spark: SparkSession, df: DataFrame) -> DataFrame:
        w = np.asarray(self.weights, dtype=np.float64)
        dim = len(w)
        if dim <= VECTORIZED_DIM_CUTOFF:
            lits = ", ".join(repr(float(x)) for x in w)
            dot = (
                f"aggregate(zip_with({self.input_col}, array({lits}), "
                f"(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (a, v) -> a + v)"
            )
            raw = F.expr(dot) + F.lit(float(self.bias))
        else:
            bc = spark.sparkContext.broadcast(w)
            bias = float(self.bias)

            @pandas_udf(T.DoubleType())
            def score(v: pd.Series) -> pd.Series:
                m = bc.value
                out = np.full(len(v), np.nan)
                idx = [i for i, x in enumerate(v) if x is not None and len(x) == len(m)]
                if idx:
                    x = np.asarray([np.asarray(v.iloc[i], dtype=np.float64) for i in idx])
                    out[np.asarray(idx)] = x @ m + bias
                return pd.Series(out).where(pd.notna(out), None)

            raw = score(F.col(self.input_col))
        scored = F.when(
            F.col(self.input_col).isNotNull() & (F.size(self.input_col) == dim),
            _apply_link(raw, self.link),
        )
        return df.withColumn(self.output_col, scored)


@dataclass
class ExternalModelBackend:
    """Pluggable backend seam (online/ModelBackend.scala): ``fn`` receives
    (spark, range frame) and returns the scored frame. Absent a callable
    it raises — no model runtime ships in this container; a None return
    from ``fn`` means the backend wrote its own output (the reference's
    'assuming data has been written by ModelBackend' branch)."""

    fn: object = None
    name: str = "external"

    def transform(self, spark: SparkSession, df: DataFrame) -> DataFrame | None:
        if self.fn is None:
            raise NotImplementedError(
                "no external model runtime available — supply fn=(spark, df) -> df"
            )
        return self.fn(spark, df)


def model_transform_batch(
    spark: SparkSession,
    warehouse,
    input_table: str,
    output_table: str,
    backend,
    start_ds: str,
    end_ds: str,
    step_days: int = 30,
) -> list[str]:
    """Score the unfilled [start_ds, end_ds] partitions of ``input_table``
    into ``output_table`` in step ranges. Returns the ds values written.
    Mirrors ModelTransformBatchJob.run: unfilledRanges → per-range
    backend call → insertPartitions (resume-safe: already-written output
    partitions are skipped)."""
    requested = PartitionRange(start_ds, end_ds)
    written: list[str] = []
    for hole in warehouse.unfilled(output_table, requested):
        for rng in hole.steps(step_days):
            df = warehouse.read(input_table).filter(
                (F.col("ds") >= rng.start) & (F.col("ds") <= rng.end)
            )
            out = backend.transform(spark, df)
            if out is not None:
                warehouse.insert_partitions(out, output_table)
            # record the whole processed range — covers empty-output days
            # AND the external-backend branch (which writes its own data
            # but must still mark the range complete for resume)
            warehouse.record_days(
                output_table,
                rng.days(),
                {"kind": "model_transform", "backend": getattr(backend, "name", type(backend).__name__)},
            )
            written.extend(rng.days())
    return written
