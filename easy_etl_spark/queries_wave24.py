"""Wave-24 query catalog: conversion latency.

New operator family:
  - conversion_latency   signup -> first-purchase time-to-convert
                         percentiles (the DURATION view of the funnel,
                         vs events_funnel's step-count view)

Hash-safety follows the catalog conventions (queries.py docstring);
percentiles reuse the engine-portable rank interpolation
(queries_wave17._pct_sql / _pct_col).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.ranking import global_row_number
from .queries import register
from .queries_wave17 import _pct_col, _pct_sql
from .session import load_table


@register(
    "conversion_latency",
    f"""
    WITH s AS (
      SELECT user_id, min(ts) AS su FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT s.user_id, s.su, min(e.ts) AS pu
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s.su
      GROUP BY s.user_id, s.su
    ),
    lat AS (
      SELECT CAST(floor(epoch(pu)) AS BIGINT)
             - CAST(floor(epoch(su)) AS BIGINT) AS v
      FROM p
    ),
    r AS (
      SELECT v, row_number() OVER (ORDER BY v) AS rn,
             count(*) OVER () AS n
      FROM lat
    )
    SELECT max(n) AS n_converted,
           round(({_pct_sql(0.5, 'v')}) / 60.0, 4) AS p50_minutes,
           round(({_pct_sql(0.9, 'v')}) / 60.0, 4) AS p90_minutes
    FROM r
    """,
)
def conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert: per user, seconds between first signup and the
    first purchase AFTER it, summarized as interpolated p50/p90 minutes
    — the duration view of the funnel (events_funnel counts WHO
    converts; this measures HOW LONG conversion takes). Latencies are
    exact integer seconds; the percentile interpolation is the portable
    rank formula.

    Scale: two per-user aggregates co-partitioned on user_id; the
    latency frame (one row per converter) is ranked with the BANDED
    global row_number (operators/ranking.py) — range-partition on v,
    per-partition row_number, broadcast prefix offsets — so there is no
    single-partition sort even when the converter frame is billions of
    rows; the total count falls out of the offsets pass for free."""
    e = load_table(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("su"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("su"))
        .groupBy("user_id", "su")
        .agg(F.min("ts").alias("pu"))
    )
    lat = p.select(
        (F.unix_timestamp("pu") - F.unix_timestamp("su")).cast("bigint").alias("v")
    )
    ranked, total = global_row_number(
        lat, [F.col("v")], out_col="rn", with_total=True
    )
    r = ranked.withColumn("n", F.lit(total).cast("bigint"))
    return r.agg(
        F.max("n").alias("n_converted"),
        F.round(_pct_col(0.5, "v") / F.lit(60.0), 4).alias("p50_minutes"),
        F.round(_pct_col(0.9, "v") / F.lit(60.0), 4).alias("p90_minutes"),
    )
