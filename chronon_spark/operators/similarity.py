"""Approximate-nearest-neighbor search over an embedding column.

- brute-force cosine top-k: the correctness baseline. query set is
  broadcast (it is small by construction); one pass over the corpus, no
  corpus-side shuffle except the final per-query top-k.
- LSH-bucketed (random hyperplane) and IVF (k-means-lite coarse
  quantizer): the scale paths — restrict candidate scoring to matching
  buckets/cells, trading recall for a ~buckets× scan reduction.

All vector math is column algebra (zip_with / aggregate) executing in
the JVM; no UDF in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# Above this embedding dim, hyperplane/centroid math moves from inlined SQL
# literals into an Arrow-batched pandas_udf over a broadcast numpy matrix:
# at dim 768 × 16 tables the literal form is a ~100k-node Catalyst tree
# (plan-compile blowup + codegen limits); the udf keeps the plan O(1) and
# the math is one BLAS matmul per Arrow batch.
VECTORIZED_DIM_CUTOFF = 64


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), 0.0D, (s, v) -> s + v)"
    )


def _norm(a: str):
    return F.expr(
        f"sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)), 0.0D, (s, v) -> s + v))"
    )


def brute_force_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast queries × corpus scan.

    Output: (query_id, rank, vec_id, cosine)."""
    c = corpus.select(F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("cv")).withColumn(
        "cn", _norm("cv")
    )
    q = queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("qv")).withColumn(
        "qn", _norm("qv")
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine",
        F.when(F.col("cn") * F.col("qn") > 0, _dot("cv", "qv") / (F.col("cn") * F.col("qn"))).otherwise(
            F.lit(0.0)
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def plane_matrix(dim: int, n_planes: int, n_tables: int, seed: int) -> np.ndarray:
    """(n_tables, n_planes, dim) random hyperplanes — same seeding for the
    SQL and vectorized paths so buckets are reproducible."""
    return np.stack(
        [
            np.random.default_rng(seed + 7919 * t).normal(size=(n_planes, dim))
            for t in range(n_tables)
        ]
    )


def _hyperplane_bucket_sql(vec_col: str, planes: np.ndarray):
    """Single-table bucket string from inlined literals (small dims)."""
    n_planes, dim = planes.shape
    bits = []
    for p in range(n_planes):
        coefs = ", ".join(f"{planes[p][j]:.6f}D" for j in range(dim))
        dot = (
            f"aggregate(zip_with({vec_col}, array({coefs}), (x, w) -> cast(x as double) * w), "
            f"0.0D, (s, v) -> s + v)"
        )
        bits.append(f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END")
    return F.expr("concat(" + ", ".join(bits) + ")")


def hyperplane_buckets(spark, vec_col: str, dim: int, n_planes: int, n_tables: int, seed: int):
    """Array of per-table hyperplane bucket strings (one signature per
    table, independent planes). Small dims inline the planes as SQL
    literals (pure JVM codegen); above VECTORIZED_DIM_CUTOFF the planes
    are a broadcast numpy matrix applied by one Arrow-batched matmul —
    same pattern as the simhash bit-vote."""
    planes = plane_matrix(dim, n_planes, n_tables, seed)
    if dim <= VECTORIZED_DIM_CUTOFF:
        return F.array(*[_hyperplane_bucket_sql(vec_col, planes[t]) for t in range(n_tables)])

    flat = planes.reshape(n_tables * n_planes, dim)
    bc = spark.sparkContext.broadcast(flat)
    pows = 1 << np.arange(n_planes, dtype=np.int64)

    @pandas_udf(T.ArrayType(T.StringType()))
    def sig(v: pd.Series) -> pd.Series:
        m = bc.value
        out = [None] * len(v)
        idx = [i for i, x in enumerate(v) if x is not None and len(x) == m.shape[1]]
        if idx:
            x = np.asarray([np.asarray(v.iloc[i], dtype=np.float64) for i in idx])
            bits = (x @ m.T) >= 0  # (n, tables*planes)
            codes = bits.reshape(len(idx), n_tables, n_planes) @ pows  # (n, tables)
            for row_i, c in zip(idx, codes):
                out[row_i] = [str(int(b)) for b in c]
        return pd.Series(out)

    return sig(F.col(vec_col))


def lsh_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 17,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH: candidates = union
    over ``n_tables`` independent hash tables of corpus rows sharing the
    query's bucket; exact cosine scoring on candidates only. Same output
    schema as brute_force_top_k.

    Scale shape (mirrors the minhash band join): the bucket self-join runs
    on NARROW (id, table, bucket) rows; vectors are re-attached per
    deduped candidate pair, so the ~KB embedding arrays never ride the
    candidate-generation shuffle. Scan cost ≈ n_tables/2^n_planes of brute
    force; recall rises with n_tables (1-(1-p^b)^L amplification)."""
    dim = int(corpus.select(F.size(corpus_vec).alias("d")).first()["d"])
    spark = corpus.sparkSession
    c = corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_vec).alias("cv"),
        hyperplane_buckets(spark, corpus_vec, dim, n_planes, n_tables, seed).alias("bks"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("qv"),
        hyperplane_buckets(spark, query_vec, dim, n_planes, n_tables, seed).alias("bks"),
    )
    c_narrow = c.select("vec_id", F.posexplode("bks").alias("t", "bucket"))
    q_narrow = q.select("query_id", F.posexplode("bks").alias("t", "bucket"))
    cand = (
        c_narrow.join(F.broadcast(q_narrow), ["t", "bucket"])
        .select("query_id", "vec_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = (
        cand.join(c.select("vec_id", "cv"), "vec_id")
        .join(F.broadcast(q.select("query_id", "qv")), "query_id")
        .withColumn("cn", _norm("cv"))
        .withColumn("qn", _norm("qv"))
        .withColumn(
            "cosine",
            F.when(
                F.col("cn") * F.col("qn") > 0, _dot("cv", "qv") / (F.col("cn") * F.col("qn"))
            ).otherwise(F.lit(0.0)),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def _seeded_centroids(corpus, corpus_id, corpus_vec, n_cells, seed):
    """Deterministic pseudo-random centroid sample: order by a seeded hash
    of the id (an unordered limit() would be plan/parallelism-dependent)."""
    return [
        [float(x) for x in row["cv"]]
        for row in (
            corpus.select(F.col(corpus_id).alias("cid"), F.col(corpus_vec).alias("cv"))
            .orderBy(F.abs(F.xxhash64(F.col("cid") + F.lit(seed))), F.col("cid"))
            .limit(n_cells)
            .collect()
        )
    ]


def _nearest_cells_col(spark, cent_vecs, vec: str, top: int):
    """Array of the ``top`` nearest cell ids (ascending L2 distance, ties
    by cell id) for the vector expression ``vec``. Literal SQL for small
    dims; broadcast-matrix pandas_udf above the cutoff (plan stays O(1)
    in dim × n_cells)."""
    cents = list(enumerate(cent_vecs))
    dim = len(cent_vecs[0]) if cent_vecs else 0
    if dim <= VECTORIZED_DIM_CUTOFF:
        dists = []
        for i, cv in cents:
            coefs = ", ".join(f"{x:.6f}D" for x in cv)
            d = (
                f"aggregate(zip_with({vec}, array({coefs}), (x, c) -> (cast(x as double) - c) * (cast(x as double) - c)), "
                f"0.0D, (s, v) -> s + v)"
            )
            dists.append(f"named_struct('d', {d}, 'c', {i})")
        arr = f"array_sort(array({', '.join(dists)}))"
        return F.expr(f"transform(slice({arr}, 1, {top}), s -> s.c)")

    cmat = np.asarray([cv for _, cv in cents], dtype=np.float64)
    bc = spark.sparkContext.broadcast(cmat)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def cells(v: pd.Series) -> pd.Series:
        m = bc.value
        cn2 = (m * m).sum(axis=1)
        out = [None] * len(v)
        idx = [i for i, x in enumerate(v) if x is not None and len(x) == m.shape[1]]
        if idx:
            x = np.asarray([np.asarray(v.iloc[i], dtype=np.float64) for i in idx])
            # |x-c|^2 = |x|^2 - 2 x·c + |c|^2; |x|^2 constant per row ->
            # ranking needs only -2 x·c + |c|^2
            d2 = -2.0 * (x @ m.T) + cn2
            order = np.argsort(d2, axis=1, kind="stable")[:, :top]
            for row_i, o in zip(idx, order):
                out[row_i] = [int(j) for j in o]
        return pd.Series(out)

    return cells(F.col(vec))


def ivf_train(
    corpus,
    n_cells: int = 16,
    iters: int = 3,
    seed: int = 23,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Lloyd k-means for IVF coarse quantization (the real FAISS-style
    training the seeded sample approximates): assignment is one
    distributed pass per iteration (the same nearest-cell kernel the
    index uses), centroid recompute is a per-(cell, position) mean — the
    only driver-side data is the n_cells × dim centroid matrix. Empty
    cells keep their previous centroid. Deterministic for a fixed
    corpus."""
    spark = corpus.sparkSession
    cents = _seeded_centroids(corpus, corpus_id, vec_col, n_cells, seed)
    if not cents:
        return cents
    for _ in range(iters):
        assigned = corpus.select(
            F.element_at(_nearest_cells_col(spark, cents, vec_col, 1), 1).alias("cell"),
            F.posexplode(F.col(vec_col)).alias("pos", "x"),
        )
        means = (
            assigned.groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(named_struct('p', pos, 'v', m)))"
                    ", s -> s.v)"
                ).alias("cv")
            )
            .collect()
        )
        new = list(cents)
        for row in means:
            new[row["cell"]] = [float(x) for x in row["cv"]]
        cents = new
    return cents


def ivf_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
    seed: int = 23,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    centroids: list | None = None,
) -> DataFrame:
    """IVF-flat: coarse-quantize the corpus to n_cells centroids, assign
    each vector to its nearest cell, probe the n_probe nearest cells per
    query. Scan cost ≈ n_probe/n_cells of brute force. ``centroids``:
    pass `ivf_train` output for real k-means cells; the default is the
    deterministic sampled-centroid shortcut."""
    # deterministic pseudo-random centroid sample: order by a seeded hash
    # of the id (an unordered limit() would be plan/parallelism-dependent)
    cents = (
        [list(c) for c in centroids]
        if centroids is not None
        else _seeded_centroids(corpus, corpus_id, corpus_vec, n_cells, seed)
    )
    spark = corpus.sparkSession

    def nearest_cells_col(vec: str, top: int):
        return _nearest_cells_col(spark, cents, vec, top)

    c = corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_vec).alias("cv"),
        F.element_at(nearest_cells_col(corpus_vec, 1), 1).alias("cell"),
    ).withColumn("cn", _norm("cv"))
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("qv"),
        F.explode(nearest_cells_col(query_vec, n_probe)).alias("cell"),
    ).withColumn("qn", _norm("qv"))
    scored = c.join(F.broadcast(q), "cell").withColumn(
        "cosine",
        F.when(F.col("cn") * F.col("qn") > 0, _dot("cv", "qv") / (F.col("cn") * F.col("qn"))).otherwise(
            F.lit(0.0)
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
