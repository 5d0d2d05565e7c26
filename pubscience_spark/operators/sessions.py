"""Event sessionization — native session windows + a custom stateful op.

- ``session_aggregate``: ``F.session_window`` gap sessions; one expression,
  works on batch AND streaming DataFrames (Catalyst merges overlapping
  windows; on streams it is watermark-aware state).
- ``running_user_counts``: ``applyInPandasWithState`` — the custom stateful
  streaming operator shape (state = per-user running counters persisted in
  the state store across micro-batches).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StructField, StructType,
                               TimestampType)


def session_aggregate(events: DataFrame, *, gap: str = "30 minutes",
                      ts_col: str = "ts", key_col: str = "user_id",
                      watermark: str | None = None) -> DataFrame:
    """One row per (key, session): bounds + event count."""
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    return (events
            .groupBy(key_col,
                     F.session_window(F.col(ts_col), gap).alias("sw"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(key_col,
                    F.col("sw.start").alias("session_start"),
                    F.col("sw.end").alias("session_end"),
                    "n_events"))


def session_counts(events: DataFrame, *, gap: str = "30 minutes",
                   ts_col: str = "ts", key_col: str = "user_id") -> DataFrame:
    """Per-key session/event totals (equivalent to the lag+cumsum
    formulation in queries.q_sessionize — equivalence is tested)."""
    return (session_aggregate(events, gap=gap, ts_col=ts_col,
                              key_col=key_col)
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.sum("n_events").alias("n_events")))


_STATE_SCHEMA = StructType([StructField("n", LongType())])

_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events_total", LongType()),
    StructField("last_ts", TimestampType()),
])


def _count_fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
              ) -> Iterator[pd.DataFrame]:
    total = state.get[0] if state.exists else 0
    last_ts = None
    for pdf in pdfs:
        total += len(pdf)
        m = pdf["ts"].max()
        last_ts = m if last_ts is None else max(last_ts, m)
    state.update((total,))
    yield pd.DataFrame({"user_id": [key[0]], "n_events_total": [total],
                        "last_ts": [last_ts]})


def running_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: cumulative per-user event counts
    across micro-batches (applyInPandasWithState, Update mode). On a batch
    DataFrame Spark rejects stateful ops — use groupBy().count() there; this
    exists for the readStream path."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    return (events.select("user_id", "ts")
            .groupBy("user_id")
            .applyInPandasWithState(
                _count_fn, outputStructType=_OUT_SCHEMA,
                stateStructType=_STATE_SCHEMA, outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
