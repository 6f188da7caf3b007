"""Corpus curation — the composed training-data filter funnel.

The individual operators (quality scoring, language ID, exact dedup)
each ship and gate separately; real pipelines run them as ONE funnel
over the corpus (C4/Gopher-style curation). This module composes them
map-side-first so the whole chain costs one scan + one dedup shuffle:

  documents ─ quality features (map-side SQL)
            ─ language ID (map-side stopword vote)
            ─ filter (min_tokens, max punct ratio, allowed langs)
            ─ exact dedup: FIRST doc per normalized-text fingerprint
              (one window shuffle on the md5 — 16-byte keys, not text)

Returns both the curated frame and a one-row funnel-stats frame
(n_input → n_quality → n_lang → n_curated) so drop rates are observable
per stage — silent truncation is how corpora rot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chronon_spark.operators.textstats import lang_id, quality_features


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_punct_ratio: float = 0.2,
    langs: tuple[str, ...] = ("en",),
) -> tuple[DataFrame, DataFrame]:
    """Quality → language → dedup funnel. Returns (curated, funnel)."""
    q = lang_id(quality_features(df, text_col), text_col)
    q = q.withColumn(
        "__pass_quality",
        (F.col("n_tokens") >= min_tokens) & (F.col("punct_ratio") <= max_punct_ratio),
    ).withColumn(
        "__pass_lang",
        F.col("__pass_quality") & F.col("lang_pred").isin(list(langs)),
    )
    fp = F.md5(F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " "))
    survivors = q.filter(F.col("__pass_lang")).withColumn("__fp", fp)
    w = Window.partitionBy("__fp").orderBy(F.col(id_col))
    curated = (
        survivors.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__fp", "__pass_quality", "__pass_lang")
    )
    funnel = q.agg(
        F.count("*").alias("n_input"),
        F.sum(F.col("__pass_quality").cast("long")).alias("n_quality"),
        F.sum(F.col("__pass_lang").cast("long")).alias("n_lang"),
    ).crossJoin(curated.agg(F.count("*").alias("n_curated")))
    return curated, funnel
