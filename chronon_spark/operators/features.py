"""Row-sequence feature operators: lag/lead and sessionization.

The reference has no sessionization (SURVEY §2.7 — explicitly absent);
these are the north-rule additions, built purely on Spark window
functions so they stay inside WholeStageCodegen, shuffling once on the
key hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lag_lead(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    cols: dict[str, list[int]] | None = None,
) -> DataFrame:
    """Add ``{col}_lag_{n}`` / ``{col}_lead_{n}`` columns per key ordered by
    ts. ``cols`` maps column → offsets (positive = lag, negative = lead)."""
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col))
    for col, offsets in (cols or {}).items():
        for n in offsets:
            if n > 0:
                df = df.withColumn(f"{col}_lag_{n}", F.lag(col, n).over(w))
            elif n < 0:
                df = df.withColumn(f"{col}_lead_{-n}", F.lead(col, -n).over(w))
    return df


def sessionize(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    gap_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """Assign ``session_id`` (0-based per key) and ``session_ts`` (session
    start time) using the classic gap rule: a new session starts when the
    time since the previous event exceeds ``gap_ms``.

    lag + running sum — one shuffle, no UDF."""
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col))
    df = df.withColumn("__prev_ts", F.lag(ts_col).over(w))
    df = df.withColumn(
        "__new_session",
        (F.col("__prev_ts").isNull() | ((F.col(ts_col) - F.col("__prev_ts")) > F.lit(gap_ms))).cast(
            "long"
        ),
    )
    df = df.withColumn(
        "session_id", F.sum("__new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1
    )
    w_sess = Window.partitionBy(*keys, "session_id")
    df = df.withColumn("session_ts", F.min(ts_col).over(w_sess))
    return df.drop("__prev_ts", "__new_session")


def session_stats(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    gap_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """One row per (keys, session): start/end ts, event count, duration."""
    s = sessionize(df, keys, ts_col, gap_ms)
    return s.groupBy(*keys, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("session_events"),
        (F.max(ts_col) - F.min(ts_col)).alias("session_duration_ms"),
    )
