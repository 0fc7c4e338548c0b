"""Time-series regularization: resample to a fixed grain, zero-fill
gaps, forward-fill state (LOCF) — the hypertable/continuous-aggregate
companion to streaming/windows.rollup_reuse.

Scale design: the aggregation is one shuffle keyed by (series key,
bucket); the dense grid is generated from a 1-row min/max aggregate
crossed with the distinct key set (both tiny broadcast frames — the
raw data is never re-scanned and nothing touches the driver). The
forward-fill window partitions by series key, so parallelism tracks
the number of series, never the time axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exact import dec_sum


def resample_fill(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Hourly resample of an event stream with an explicit dense grid:

      - n_events / sum_value are zero-filled where an (hour, key) slot
        has no events (the "resample with fill" shape);
      - locf_value carries the last observed hourly sum forward across
        gaps (last-observation-carried-forward, the state-metric shape).

    Output: (key, hour_start string, n_events, sum_value, locf_value),
    one row per key per hour between the stream's min and max hour.
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    hourly = (
        events.groupBy(F.col(key_col).alias("__k"), hour.alias("__h"))
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum(value_col).alias("__sv"))
    )
    bounds = events.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("__h0"),
        F.date_trunc("hour", F.max(ts_col)).alias("__h1"),
    )
    keys = events.select(F.col(key_col).alias("__k")).distinct()
    grid = (
        bounds.select(
            F.explode(F.sequence("__h0", "__h1", F.expr("INTERVAL 1 HOUR"))).alias("__h")
        )
        .crossJoin(F.broadcast(keys))
    )
    joined = grid.join(hourly, ["__k", "__h"], "left")
    w = (
        Window.partitionBy("__k")
        .orderBy("__h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("__k").alias(key_col),
        F.date_format("__h", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("__sv", F.lit(0.0)).alias("sum_value"),
        F.last("__sv", ignorenulls=True).over(w).alias("locf_value"),
    )
