"""Benchmark decontamination — n-gram overlap against a held-out set.

Training corpora must not contain evaluation data: the standard
pipeline step (the GPT-3 paper's appendix-C dedup, every major data
card since) flags a training document when it shares ``min_hits``
distinct word n-grams with any benchmark document. The reference
engine has no such operator — this is part of the beyond-reference
training-data surface, beside dedup/curation.

100 TB shape: the benchmark side is tiny (eval sets are thousands of
rows), so its distinct gram hashes ride a ``broadcast()``; the corpus
side is one map-side explode — JVM ``split``/``slice``/``xxhash64``
inside whole-stage codegen, no Python — into the broadcast hash join,
then ONE shuffle of only the HIT rows (8-byte gram hash + doc id, not
text) for the per-doc distinct-hit count. Document text never rides a
shuffle, and a clean corpus shuffles almost nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_hashes(text_col: str, n: int):
    """xxhash64 of each whitespace word n-gram, JVM-side (empty array
    when the document is shorter than n words)."""
    w = f"split({text_col}, ' ')"
    return F.expr(
        f"CASE WHEN size({w}) >= {n} THEN "
        f"transform(sequence(1, size({w}) - {n} + 1), "
        f"          i -> xxhash64(array_join(slice({w}, i, {n}), ' '))) "
        f"ELSE array() END"
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Per training doc: total gram positions (map-side size, duplicates
    counted), distinct grams shared with the benchmark, and the
    contamination flag (n_hits >= min_hits).

    Callers drop flagged docs or route them to review; the counts stay
    observable either way (silent removal is how eval leakage audits
    fail)."""
    grams = gram_hashes(text_col, n)
    bench_grams = (
        benchmark.select(F.explode(grams).alias("__g")).distinct()
    )
    hits = (
        docs.select(F.col(id_col), F.explode(grams).alias("__g"))
        .join(F.broadcast(bench_grams), "__g")
        .groupBy(id_col)
        .agg(F.count_distinct("__g").alias("n_hits"))
    )
    base = docs.select(
        F.col(id_col), F.size(grams).alias("n_grams")
    )
    return base.join(hits, id_col, "left").select(
        id_col,
        "n_grams",
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        (F.coalesce("n_hits", F.lit(0)) >= min_hits).cast("int").alias("contaminated"),
    )
