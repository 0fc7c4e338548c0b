"""Custom stateful streaming operator via applyInPandasWithState:
per-user running profile (event count, value sum, last-seen) that
survives across micro-batches in managed state.

This is the template for operators Structured Streaming's built-ins
can't express (custom counters, decaying scores, per-key ML state).
State is per-key and partitioned by the grouping hash — horizontal
scale is the number of distinct keys, and event-time timers
(GroupStateTimeout.EventTimeTimeout) evict idle keys so state stays
bounded on unbounded input while Trigger.AvailableNow replays still
terminate (processing-time timers would keep the query alive forever;
see _event_time_evict).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double, last_seen timestamp"
STATE_SCHEMA = "n bigint, s double, last timestamp"


_DAY_MS = 24 * 60 * 60 * 1000


def _event_time_evict(state: GroupState, last_ms: int, horizon_ms: int) -> bool:
    """Shared idle-key eviction: arm an EVENT-TIME timer at
    last-activity + horizon, or evict immediately when the watermark
    already passed it (replayed history). Event-time (not processing-
    time) on purpose: ProcessingTimeTimeout forces Spark to keep
    running empty micro-batches forever to fire its timers —
    Trigger.AvailableNow replays never terminate under it — while
    event-time timers ride the same watermark the operator already
    declares, terminate cleanly, and evict identically in replay and
    live runs. Returns True if the key was evicted now."""
    deadline = last_ms + horizon_ms
    if deadline <= state.getCurrentWatermarkMs():
        state.remove()
        return True
    state.setTimeoutTimestamp(deadline)
    return False


def user_profile_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    idle_horizon_days: int = 90,
) -> DataFrame:
    """Running per-user profile with managed state across batches.
    Users idle longer than ``idle_horizon_days`` of EVENT time are
    evicted (their final profile was already emitted on their last
    update), so state is bounded by the trailing-horizon live-key
    count, not the all-time one — see _event_time_evict for why the
    timer is event-time, not processing-time."""
    horizon_ms = idle_horizon_days * _DAY_MS

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                {"user_id": [], "n_events": [], "sum_value": [], "last_seen": []}
            )
            return
        if state.exists:
            n, s, last = state.get
            # the timer only fires for keys WITHOUT data in the batch;
            # a key returning after its horizon must expire its stale
            # carry on the data path too
            if (
                int(pd.Timestamp(last).value // 1_000_000) + horizon_ms
                <= state.getCurrentWatermarkMs()
            ):
                n, s, last = 0, 0.0, None
        else:
            n, s, last = 0, 0.0, None
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            mx = pdf["ts"].max()
            last = mx if last is None or mx > last else last
        state.update((n, round(s, 2), last))
        _event_time_evict(state, int(pd.Timestamp(last).value // 1_000_000), horizon_ms)
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
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
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


SESSION_OUT_SCHEMA = (
    "user_id bigint, session_start_sec bigint, session_end_sec bigint, n_events bigint"
)
SESSION_STATE_SCHEMA = "start_sec bigint, last_sec bigint, n bigint"


def session_timeout_stream(
    events: DataFrame, gap_s: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """Timer-driven session emission: a session summary row
    (user_id, start, end, n_events) is emitted when the user goes
    QUIET — either a later event arrives past the inactivity gap
    (in-stream close), or the event-time watermark passes the open
    session's deadline with no further events (EventTimeTimeout fires —
    the close a pure groupBy/session_window can also reach, but here
    the operator owns arbitrary per-session state, the shape custom
    sessionizers need).

    Semantics == the batch gaps-and-islands sessionize with the same
    gap: a new session starts when sec > prev_sec + gap_s. Three paths
    close a session:
      1. in-batch: the next event is past the previous event's gap;
      2. watermark already past the deadline when the batch lands
         (historical replay — setting a timer in the past is illegal,
         so the summary emits immediately and state clears);
      3. the timer: state.setTimeoutTimestamp(last + gap) fires once
         the watermark crosses it — the "user went quiet" case that
         never gets another event to trigger path 1.
    State per user is 3 ints; eviction is driven by event time, so a
    churning key space stays bounded by the LIVE session count."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_sec": [start],
                    "session_end_sec": [last],
                    "n_events": [n],
                }
            )
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        secs = (batch["ts"].astype("int64") // 1_000_000_000).tolist()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed = []
        for sec in secs:
            if last is None:
                start, last, n = sec, sec, 1
            elif sec > last + gap_s:
                closed.append((start, last, n))
                start, last, n = sec, sec, 1
            else:
                last, n = max(last, sec), n + 1
        deadline_ms = (last + gap_s) * 1000
        if deadline_ms <= state.getCurrentWatermarkMs():
            # replayed history: the session is already quiet past the
            # watermark — a timer in the past is illegal, close it now
            closed.append((start, last, n))
            state.remove()
        else:
            state.update((start, last, n))
            state.setTimeoutTimestamp(deadline_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start_sec": [c[0] for c in closed],
                "session_end_sec": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


TRANSITION_OUT_SCHEMA = "user_id bigint, prev_type string, next_type string"
TRANSITION_STATE_SCHEMA = "last_type string, last_ms bigint"


def transition_events_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    idle_horizon_days: int = 90,
) -> DataFrame:
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
    user, and an EVENT-TIME timer evicts users idle longer than
    ``idle_horizon_days`` so state stays bounded on a churning key
    space (a re-appearing user simply starts a fresh chain — the first
    event after eviction pairs with nothing, same as a brand-new user;
    see _event_time_evict for why the timer is event-time)."""
    horizon_ms = idle_horizon_days * _DAY_MS

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            # idle-key eviction: drop the carried type, emit nothing
            state.remove()
            yield pd.DataFrame({"user_id": [], "prev_type": [], "next_type": []})
            return
        last_type, last_ms = state.get if state.exists else (None, None)
        # stale-carry expiry on the data path (the timer only covers
        # keys with NO data in the batch): a user returning after the
        # horizon starts a fresh chain — the first event pairs with
        # nothing, same as if the timer had evicted them
        if last_ms is not None and last_ms + horizon_ms <= state.getCurrentWatermarkMs():
            last_type = None
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
        new_last_ms = int(pd.Timestamp(batch["ts"].max()).value // 1_000_000)
        state.update((prev, new_last_ms))
        _event_time_evict(state, new_last_ms, horizon_ms)
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
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
