"""chronon_spark — a PySpark-native point-in-time feature-engineering engine.

A from-scratch rebuild of the *semantics* of airbnb/chronon's offline engine
(GroupBy / Join backfill with windowed, point-in-time-correct aggregations)
expressed Spark-first: DataFrame/SQL plans that Catalyst/AQE can optimize,
with vectorized Arrow/pandas kernels only where column algebra cannot express
the semantics (exact sawtooth as-of windows). No per-row Python anywhere.

Reference semantics surveyed in /root/repo/SURVEY.md (file:line citations into
/root/reference). This package shares no code with the reference.
"""

from chronon_spark.api.types import (
    Accuracy,
    Aggregation,
    EventSource,
    GroupBy,
    Join,
    JoinPart,
    Operation,
    Query,
    TimeUnit,
    Window,
)
from chronon_spark.session import build_session

__all__ = [
    "Accuracy",
    "Aggregation",
    "EventSource",
    "GroupBy",
    "Join",
    "JoinPart",
    "Operation",
    "Query",
    "TimeUnit",
    "Window",
    "build_session",
]

__version__ = "0.1.0"
