"""Batch model transform (ModelTransformBatchJob analogue): linear
backend on both the SQL and Arrow paths vs numpy, unfilled-range resume,
external-backend seam."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chronon_spark.operators.model import (
    ExternalModelBackend,
    LinearModelBackend,
    model_transform_batch,
)
from chronon_spark.sources.warehouse import Warehouse


def _frame(spark, dim: int, n: int = 40, seed: int = 5):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [rng.normal(size=dim).astype(float).tolist() for _ in range(n)],
        }
    )
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    return pdf, spark.createDataFrame(pdf, schema=schema)


@pytest.mark.parametrize("dim", [8, 128])  # SQL path / Arrow matvec path
def test_linear_backend_matches_numpy(spark, dim):
    rng = np.random.default_rng(17)
    w = rng.normal(size=dim)
    pdf, df = _frame(spark, dim)
    be = LinearModelBackend(weights=w, bias=0.25, link="sigmoid")
    out = {r["vec_id"]: r["score"] for r in be.transform(spark, df).collect()}
    x = np.asarray(pdf["embedding"].tolist())
    exp = 1.0 / (1.0 + np.exp(-(x @ w + 0.25)))
    got = np.asarray([out[i] for i in range(len(pdf))])
    assert np.allclose(got, exp, rtol=1e-9, atol=1e-12)


def test_linear_backend_null_and_badsize(spark):
    df = spark.createDataFrame(
        [(0, [1.0] * 100), (1, None), (2, [1.0] * 7)],
        schema="vec_id long, embedding array<double>",
    )
    be = LinearModelBackend(weights=np.ones(100), bias=0.0)
    rows = {r["vec_id"]: r["score"] for r in be.transform(spark, df).collect()}
    assert abs(rows[0] - 100.0) < 1e-9
    assert rows[1] is None and rows[2] is None  # null / dim-mismatch → null


def test_model_transform_batch_resume(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    pdf, df = _frame(spark, 8, n=30)
    df = df.withColumn(
        "ds", F.concat(F.lit("2024-01-0"), (F.col("vec_id") % 3 + 1).cast("string"))
    )
    wh.insert_partitions(df, "features")
    be = LinearModelBackend(weights=np.ones(8), bias=0.0)
    written = model_transform_batch(
        spark, wh, "features", "scored", be, "2024-01-01", "2024-01-03", step_days=2
    )
    assert sorted(written) == ["2024-01-01", "2024-01-02", "2024-01-03"]
    out = wh.read("scored")
    assert out.count() == 30 and "score" in out.columns
    got = {r["vec_id"]: r["score"] for r in out.collect()}
    exp = {int(i): float(np.sum(e)) for i, e in zip(pdf["vec_id"], pdf["embedding"])}
    assert all(abs(got[i] - exp[i]) < 1e-9 for i in exp)

    # resume: everything filled → zero ranges recomputed
    assert model_transform_batch(
        spark, wh, "features", "scored", be, "2024-01-01", "2024-01-03"
    ) == []


def test_external_backend_seam(spark):
    _, df = _frame(spark, 8, n=3)
    with pytest.raises(NotImplementedError):
        ExternalModelBackend().transform(spark, df)
    be = ExternalModelBackend(fn=lambda s, d: d.withColumn("score", F.lit(1.0)))
    assert be.transform(spark, df).select("score").first()["score"] == 1.0
