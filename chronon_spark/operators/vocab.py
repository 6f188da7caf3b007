"""Corpus vocabulary statistics — document frequency, term frequency,
TF-IDF — over the normalized token stream.

Corpus curation needs global term statistics (stopword discovery,
boilerplate detection, tf-idf keyword extraction for clustering /
domain tagging). The reference engine has no corpus-level text
operator — beyond-reference training-data surface.

100 TB shape: document text never rides a shuffle. Stage 1 explodes
tokens and groups by (doc, token) — Spark's partial aggregation
collapses within-doc duplicates map-side, so the wire carries one
narrow (doc_id, token, count) row per DISTINCT term per doc. Stage 2
re-keys by token for the corpus rollup; its input is already one row
per (doc, token). TF-IDF re-attachment broadcasts the (small, top-N)
vocabulary back against the per-doc term counts — no second scan of
the text column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chronon_spark.operators.textstats import tokens_sql


def doc_term_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per (doc, distinct token) with its in-doc count."""
    return (
        docs.select(
            F.col(id_col), F.explode(F.expr(tokens_sql(text_col))).alias("token")
        )
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
    )


def token_doc_freq(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Corpus rollup per token: ``doc_freq`` (docs containing it),
    ``term_freq`` (total occurrences), and smoothed
    ``idf = ln((N + 1) / (doc_freq + 1)) + 1``."""
    n_docs = docs.select(id_col).count()
    out = (
        doc_term_counts(docs, id_col, text_col)
        .groupBy("token")
        .agg(
            F.count("*").alias("doc_freq"),
            F.sum("tf").alias("term_freq"),
        )
        .filter(F.col("doc_freq") >= min_df)
    )
    return out.withColumn(
        "idf",
        F.log((F.lit(float(n_docs + 1))) / (F.col("doc_freq") + F.lit(1.0))) + F.lit(1.0),
    )


def doc_tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Per doc: its top-``k`` terms by tf·idf (ties broken bytewise on
    token, so ranks are deterministic). The vocabulary side is the
    corpus rollup — small after ``min_df`` — and broadcasts onto the
    per-doc term counts."""
    vocab = token_doc_freq(docs, id_col, text_col, min_df).select("token", "idf")
    # NO broadcast hint: with default min_df=1 the vocab is the corpus's
    # whole token set — tens of GB on a crawl — and an explicit hint is
    # never demoted (OOM at scale). Both join inputs end in aggregates,
    # so AQE sees the vocab side's REAL post-shuffle size and converts to
    # a broadcast join at runtime when it fits under
    # spark.sql.adaptive.autoBroadcastJoinThreshold, else keeps the
    # sort-merge join (plan-contract-tested both ways).
    scored = (
        doc_term_counts(docs, id_col, text_col)
        .join(vocab, "token")
        .withColumn("tfidf", F.col("tf") * F.col("idf"))
    )
    # rank on the ROUNDED score: ln() can differ by an ulp across engines
    # (JVM vs libm), and ranking on the raw double would let a real-valued
    # tie order differently per engine; 6dp + bytewise token tie-break
    # makes the ranking reproducible everywhere
    scored = scored.withColumn("tfidf", F.round("tfidf", 6))
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "token", "tf", "tfidf")
    )
