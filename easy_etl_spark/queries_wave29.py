"""Wave-29 query catalog: dynamic-gap sessionization.

New operator family:
  - events_session_dynamic_gap   sessions whose inactivity timeout
                                 depends on the event (short gap after
                                 clicks, long after purchases) — the
                                 generalization of the fixed-gap
                                 sessionize; Structured Streaming's
                                 session_window(ts, expr) speaks the
                                 same semantics.

Hash-safety follows the catalog conventions (queries.py docstring):
gap comparison on exact integer seconds, session ids from an integer
running sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import register
from .session import load_table

#: per-event inactivity extension, seconds (a click keeps the session
#: alive briefly; a purchase holds it open much longer)
GAPS = {"click": 600, "view": 600, "error": 300, "signup": 1800, "purchase": 3600}


@register(
    "events_session_dynamic_gap",
    """
    WITH e AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CASE event_type WHEN 'click' THEN 600 WHEN 'view' THEN 600
                  WHEN 'error' THEN 300 WHEN 'signup' THEN 1800
                  ELSE 3600 END AS gap
      FROM events
    ),
    seq AS (
      SELECT user_id, event_id, sec,
             lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id)
               AS prev_sec,
             lag(gap) OVER (PARTITION BY user_id ORDER BY sec, event_id)
               AS prev_gap
      FROM e
    ),
    marked AS (
      SELECT user_id, event_id, sec,
             CASE WHEN prev_sec IS NULL OR sec > prev_sec + prev_gap
                  THEN 1 ELSE 0 END AS new_sess
      FROM seq
    ),
    sess AS (
      SELECT user_id, event_id, sec,
             CAST(sum(new_sess) OVER (PARTITION BY user_id
                                      ORDER BY sec, event_id) AS BIGINT)
               AS session_id
      FROM marked
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           CAST(max(sec) - min(sec) AS BIGINT) AS duration_s
    FROM sess GROUP BY user_id, session_id
    """,
)
def events_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap sessionization: each event extends its session by an
    event-specific inactivity window (clicks keep it alive 10 min,
    purchases an hour) — the semantics Structured Streaming's
    session_window(ts, CASE ...) applies on live streams, computed here
    as the batch twin: a new session starts when the gap since the
    previous event exceeds THAT event's extension. Integer-second
    arithmetic end to end; session ids are an exact running sum.

    Scale: one (user)-partitioned, (ts, id)-ordered window pass for the
    lag and the running sum, then a per-session rollup — identical
    posture to the fixed-gap sessionize, just a per-row gap column."""
    e = load_table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "click", 600)
    for t, g in list(GAPS.items())[1:]:
        gap = gap.when(F.col("event_type") == t, g)
    gap = gap.otherwise(3600)
    base = e.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("sec"),
        gap.alias("gap"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    seq = base.select(
        "user_id",
        "event_id",
        "sec",
        F.lag("sec").over(w).alias("prev_sec"),
        F.lag("gap").over(w).alias("prev_gap"),
    )
    new_sess = F.when(
        F.col("prev_sec").isNull()
        | (F.col("sec") > F.col("prev_sec") + F.col("prev_gap")),
        1,
    ).otherwise(0)
    sess = seq.withColumn("new_sess", new_sess).withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("sec") - F.min("sec")).cast("bigint").alias("duration_s"),
    )
