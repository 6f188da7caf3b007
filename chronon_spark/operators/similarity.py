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
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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


def _hyperplane_bucket(vec_col: str, dim: int, n_planes: int, seed: int):
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))
    bits = []
    for p in range(n_planes):
        coefs = ", ".join(f"{planes[p][j]:.6f}D" for j in range(dim))
        dot = (
            f"aggregate(zip_with({vec_col}, array({coefs}), (x, w) -> cast(x as double) * w), "
            f"0.0D, (s, v) -> s + v)"
        )
        bits.append(f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END")
    return F.expr("concat(" + ", ".join(bits) + ")")


def _hyperplane_buckets(vec_col: str, dim: int, n_planes: int, n_tables: int, seed: int):
    """Array of per-table hyperplane bucket strings (one signature per
    table, independent planes)."""
    return F.array(
        *[
            _hyperplane_bucket(vec_col, dim, n_planes, seed + 7919 * t)
            for t in range(n_tables)
        ]
    )


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
    c = corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_vec).alias("cv"),
        _hyperplane_buckets(corpus_vec, dim, n_planes, n_tables, seed).alias("bks"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("qv"),
        _hyperplane_buckets(query_vec, dim, n_planes, n_tables, seed).alias("bks"),
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
) -> DataFrame:
    """IVF-flat: coarse-quantize the corpus to n_cells centroids (sampled
    corpus vectors as centroids — one cheap pass instead of full k-means),
    assign each vector to its nearest cell, probe the n_probe nearest
    cells per query. Scan cost ≈ n_probe/n_cells of brute force."""
    # deterministic pseudo-random centroid sample: order by a seeded hash
    # of the id (an unordered limit() would be plan/parallelism-dependent)
    cents = [
        (i, [float(x) for x in row["cv"]])
        for i, row in enumerate(
            corpus.select(F.col(corpus_id).alias("cid"), F.col(corpus_vec).alias("cv"))
            .orderBy(F.abs(F.xxhash64(F.col("cid") + F.lit(seed))), F.col("cid"))
            .limit(n_cells)
            .collect()
        )
    ]

    def cell_expr(vec: str):
        dists = []
        for i, cv in cents:
            coefs = ", ".join(f"{x:.6f}D" for x in cv)
            d = (
                f"aggregate(zip_with({vec}, array({coefs}), (x, c) -> (cast(x as double) - c) * (cast(x as double) - c)), "
                f"0.0D, (s, v) -> s + v)"
            )
            dists.append(f"named_struct('d', {d}, 'c', {i})")
        return f"array_sort(array({', '.join(dists)}))"

    c = corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_vec).alias("cv"),
        F.expr(f"element_at({cell_expr(corpus_vec)}, 1).c").alias("cell"),
    ).withColumn("cn", _norm("cv"))
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("qv"),
        F.explode(
            F.expr(f"transform(slice({cell_expr(query_vec)}, 1, {n_probe}), s -> s.c)")
        ).alias("cell"),
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
