"""Label join: forward-looking labels attached to feature rows.

Semantics of spark/LabelJoin.scala:35-291 (simplified to the common
case): for each feature row at day ``ds`` and each configured offset
``o``, compute the label GroupBy's snapshot aggregate as of day
``ds + o`` and attach it as ``{prefix}_{col}_{o}d``. Forward-looking by
construction — labels see [ds+1, ds+o] events, features see ≤ ds — so
the same row carries leak-free features AND their future label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.api.types import LabelPart
from chronon_spark.operators.groupby import group_by_backfill
from chronon_spark.sources.scan import shift_ds


def attach_labels(
    spark: SparkSession,
    features: DataFrame,
    label_part: LabelPart,
    start_ds: str,
    end_ds: str,
    available_until: str | None = None,
) -> DataFrame:
    """Attach per-offset label columns; when ``available_until`` is set,
    also add ``{prefix}_{col}_latest`` columns — the LATEST matured label
    version per row (the reference's latest-label view,
    spark/JoinUtils.scala:218-294 createLatestLabelView: for each feature
    ds, pick the largest label_ds that is already available). With
    ``available_until=None`` every offset is considered matured (pure
    backfill), so latest == the largest configured offset."""
    gb = label_part.group_by
    keys = list(gb.key_columns)
    max_off = max(label_part.label_offsets)
    # label table over the shifted range
    label_df = group_by_backfill(spark, gb, shift_ds(start_ds, 1), shift_ds(end_ds, max_off))
    feature_cols = [c for c in label_df.columns if c not in set(keys + ["ds"])]

    out = features
    for off in label_part.label_offsets:
        shifted = label_df.select(
            *keys,
            F.date_format(F.date_sub(F.to_date("ds"), off), "yyyy-MM-dd").alias("ds"),
            *[
                F.col(c).alias(f"{label_part.prefix}_{c}_{off}d")
                for c in feature_cols
            ],
        )
        out = out.join(shifted, keys + ["ds"], "left")

    offsets_desc = sorted(label_part.label_offsets, reverse=True)
    for c in feature_cols:
        branches = []
        for off in offsets_desc:
            col = f"{label_part.prefix}_{c}_{off}d"
            if available_until is None:
                branches.append(f"WHEN TRUE THEN {col}")
                break
            branches.append(
                f"WHEN date_add(to_date(ds), {off}) <= to_date('{available_until}') THEN {col}"
            )
        out = out.withColumn(
            f"{label_part.prefix}_{c}_latest",
            F.expr("CASE " + " ".join(branches) + " END"),
        )
    return out
