"""Wave-31 query catalog: interval-sweep concurrency.

New operator family:
  - peak_concurrency   per-day maximum number of simultaneously open
                       sessions (the +1/−1 boundary-sweep analytic —
                       capacity planning's first question)

Hash-safety follows the catalog conventions (queries.py docstring):
boundaries are exact integer seconds and the sweep is an integer
running sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import register
from .session import load_table

GAP_S = 1800


@register(
    "peak_concurrency",
    f"""
    WITH e AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events
    ),
    seq AS (
      SELECT user_id, event_id, sec,
             lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id)
               AS prev_sec
      FROM e
    ),
    marked AS (
      SELECT user_id, event_id, sec,
             CASE WHEN prev_sec IS NULL OR sec - prev_sec > {GAP_S}
                  THEN 1 ELSE 0 END AS new_sess
      FROM seq
    ),
    sess AS (
      SELECT user_id,
             CAST(sum(new_sess) OVER (PARTITION BY user_id
                                      ORDER BY sec, event_id)
                  AS BIGINT) AS session_id,
             sec
      FROM marked
    ),
    spans AS (
      SELECT user_id, session_id, min(sec) AS s, max(sec) AS t
      FROM sess GROUP BY 1, 2
    ),
    bounds AS (
      SELECT CAST(floor(s / 86400) AS BIGINT) AS day_num, s AS sec,
             CAST(1 AS BIGINT) AS delta
      FROM spans
      UNION ALL
      SELECT CAST(floor(s / 86400) AS BIGINT), t + 1, CAST(-1 AS BIGINT)
      FROM spans
    ),
    swept AS (
      SELECT day_num, sec,
             CAST(sum(delta) OVER (PARTITION BY day_num
                                   ORDER BY sec, delta
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS open_now
      FROM bounds
    )
    SELECT day_num, CAST(max(open_now) AS BIGINT) AS peak_concurrent,
           CAST(count(*) / 2 AS BIGINT) AS n_sessions
    FROM swept GROUP BY day_num
    """,
)
def peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day peak session concurrency: sessionize each user's stream
    (30-min gap), then sweep +1 at each session start and −1 just past
    its end in time order — the running sum's maximum is the largest
    number of simultaneously open sessions, capacity planning's first
    question. Session spans are attributed to their start day (spans
    crossing midnight count toward the day they began — stated, not
    hidden). Boundaries are exact integer seconds; at a tied
    second the −1 sorts before the +1 (delta ascending), so a session
    ending at the instant another starts never inflates the peak.

    Scale: sessionization partitions by user; the sweep partitions by
    day over 2 rows per session (a tiny fraction of the facts)."""
    e = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("sec", "event_id")
    base = e.select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("sec")
    )
    marked = base.withColumn(
        "new_sess",
        F.when(
            F.lag("sec").over(wu).isNull()
            | (F.col("sec") - F.lag("sec").over(wu) > GAP_S),
            1,
        ).otherwise(0),
    )
    # (sec, event_id): the running sum needs the same TOTAL order as
    # the lag — ties on sec alone would let the two engines assign a
    # same-second event to different sessions
    sess = marked.withColumn(
        "session_id",
        F.sum("new_sess").over(
            Window.partitionBy("user_id")
            .orderBy("sec", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    spans = sess.groupBy("user_id", "session_id").agg(
        F.min("sec").alias("s"), F.max("sec").alias("t")
    )
    day = F.floor(F.col("s") / F.lit(86400)).cast("bigint")
    starts = spans.select(
        day.alias("day_num"), F.col("s").alias("sec"), F.lit(1).cast("bigint").alias("delta")
    )
    ends = spans.select(
        day.alias("day_num"),
        (F.col("t") + 1).alias("sec"),
        F.lit(-1).cast("bigint").alias("delta"),
    )
    bounds = starts.unionAll(ends)
    ws = (
        Window.partitionBy("day_num")
        .orderBy(F.col("sec"), F.col("delta"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = bounds.withColumn("open_now", F.sum("delta").over(ws))
    return swept.groupBy("day_num").agg(
        F.max("open_now").cast("bigint").alias("peak_concurrent"),
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_sessions"),
    )
