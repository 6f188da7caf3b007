from chronon_spark.api.types import (
    Accuracy,
    Aggregation,
    EntitySource,
    EventSource,
    GroupBy,
    Join,
    JoinPart,
    Operation,
    Query,
    TimeUnit,
    Window,
)

__all__ = [
    "Accuracy",
    "Aggregation",
    "EntitySource",
    "EventSource",
    "GroupBy",
    "Join",
    "JoinPart",
    "Operation",
    "Query",
    "TimeUnit",
    "Window",
]
