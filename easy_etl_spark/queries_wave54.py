"""Wave-54 query catalog: OHLC time-bucket aggregation and
volatility-band breach detection.

New operator families:
  - ohlc_hourly           open/high/low/close candles of event value
                          per (hour, event_type) — the first/last-by-
                          time aggregation shape every time-series
                          store exposes; first/last are total-ordered
                          by (ts, event_id) so ties can never flip a
                          candle between engines
  - bollinger_breaches    Bollinger-band breach counting on daily
                          event counts per type (trailing 7-day mean
                          ± 2σ from exact integer window sums) — the
                          volatility-anomaly screen a metrics
                          pipeline runs on its own health counters

Hash-safety: candle prices are exact integer cents picked by
row_number over a total order; band math uses exact int64 rolling
sums with one identical float expression per day, and breaches are
strict inequalities on identically-computed doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import register
from .session import load_table

# ----------------------------------------------------------------------
# OHLC hourly candles
# ----------------------------------------------------------------------


@register(
    "ohlc_hourly",
    """
    WITH base AS (
      SELECT event_type,
             strftime(to_timestamp(floor(epoch(ts) / 3600) * 3600)::TIMESTAMP,
                      '%Y-%m-%d %H:%M:%S') AS hour_start,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
             ts, event_id
      FROM events
    ),
    ranked AS (
      SELECT event_type, hour_start, cents,
             row_number() OVER (PARTITION BY event_type, hour_start
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, hour_start
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM base
    )
    SELECT event_type, hour_start,
           count(*) AS n_events,
           CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
           CAST(max(cents) AS BIGINT) AS high_cents,
           CAST(min(cents) AS BIGINT) AS low_cents,
           CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents
    FROM ranked GROUP BY event_type, hour_start
    """,
)
def ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candles of event value per (hour, type): open/close are
    the first/last rows under the TOTAL (ts, event_id) order (a plain
    first()/last() would be tie- and partition-order-dependent);
    high/low are plain extremes. Prices are exact integer cents.

    Scale: both rank windows and the aggregate partition by
    (event_type, hour) — the natural time-bucket key with bounded
    rows per bucket; one shuffle serves all of it."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_format(
        F.timestamp_seconds(
            F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1e6 / 3600) * 3600
        ),
        "yyyy-MM-dd HH:mm:ss",
    )
    base = ev.select(
        "event_type",
        hour.alias("hour_start"),
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint").alias("cents"),
        "ts",
        "event_id",
    )
    wa = Window.partitionBy("event_type", "hour_start").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "hour_start").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = base.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    return ranked.groupBy("event_type", "hour_start").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.when(F.col("rn_a") == 1, F.col("cents")))
        .cast("bigint")
        .alias("open_cents"),
        F.max("cents").cast("bigint").alias("high_cents"),
        F.min("cents").cast("bigint").alias("low_cents"),
        F.max(F.when(F.col("rn_d") == 1, F.col("cents")))
        .cast("bigint")
        .alias("close_cents"),
    )


# ----------------------------------------------------------------------
# Bollinger-band breaches on daily counts
# ----------------------------------------------------------------------

BOLL_WINDOW = 7  # trailing days, excluding the current day
BOLL_K = 2.0


@register(
    "bollinger_breaches",
    f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS y
      FROM events GROUP BY 1, 2
    ),
    win AS (
      SELECT c.event_type, c.d, c.y,
             count(p.y) AS nw,
             CAST(sum(p.y) AS BIGINT) AS sw,
             CAST(sum(p.y * p.y) AS BIGINT) AS sw2
      FROM daily c
      JOIN daily p ON p.event_type = c.event_type
                  AND p.d >= c.d - {BOLL_WINDOW} AND p.d < c.d
      GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT event_type, y, nw, sw, sw2,
             sw * 1.0 / nw AS mu,
             sqrt((sw2 - (CAST(sw AS DOUBLE) * sw) / nw) / nw) AS sigma
      FROM win WHERE nw = {BOLL_WINDOW}
    )
    SELECT event_type,
           count(*) AS n_days_scored,
           CAST(sum(CASE WHEN y > mu + {BOLL_K} * sigma THEN 1 ELSE 0 END)
                AS BIGINT) AS n_upper_breaches,
           CAST(sum(CASE WHEN y < mu - {BOLL_K} * sigma THEN 1 ELSE 0 END)
                AS BIGINT) AS n_lower_breaches
    FROM scored GROUP BY event_type
    """,
)
def bollinger_breaches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band anomaly screen on daily event counts: a day
    breaches when its count leaves the trailing-7-day mean ± 2σ band
    (window excludes the current day, so a spike can't suppress its
    own alarm). Mean/σ come from exact int64 window sums via a
    date-range self-join (gap-proof, unlike row-offset frames), and
    the breach tests are strict inequalities on identically-computed
    doubles.

    Scale: the stream collapses to |types|×|days| first; the trailing
    window is a bounded date-range self-join on that collapsed table
    (≤7 partners per row)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    p = daily.select(
        "event_type", F.col("d").alias("pd"), F.col("y").alias("py")
    )
    win = (
        daily.join(p, "event_type")
        .where(
            (F.col("pd") >= F.date_sub("d", BOLL_WINDOW)) & (F.col("pd") < F.col("d"))
        )
        .groupBy("event_type", "d", "y")
        .agg(
            F.count("py").alias("nw"),
            F.sum("py").cast("bigint").alias("sw"),
            F.sum(F.col("py") * F.col("py")).cast("bigint").alias("sw2"),
        )
        .where(F.col("nw") == BOLL_WINDOW)
    )
    mu = F.col("sw") * 1.0 / F.col("nw")
    sigma = F.sqrt(
        (F.col("sw2") - (F.col("sw").cast("double") * F.col("sw")) / F.col("nw"))
        / F.col("nw")
    )
    return win.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days_scored"),
        F.sum(F.when(F.col("y") > mu + BOLL_K * sigma, 1).otherwise(0))
        .cast("bigint")
        .alias("n_upper_breaches"),
        F.sum(F.when(F.col("y") < mu - BOLL_K * sigma, 1).otherwise(0))
        .cast("bigint")
        .alias("n_lower_breaches"),
    )
