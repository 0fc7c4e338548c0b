"""Event-time window operators over the `events` table — batch
implementations whose semantics match the Structured Streaming jobs in
streaming/jobs.py (same windowing math, so the oracle that validates
these validates the streaming aggregations too).

Tumbling/sliding use epoch-grid arithmetic (identical in Spark and
DuckDB); sessionization is gaps-and-islands (lag → new-session flag →
running sum), the batch equivalent of F.session_window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FMT = "yyyy-MM-dd HH:mm:ss"


def _dec_sum(col, scale: int = 2):
    """Order-independent float sum (see functions/exact.py): per-row
    integer quantization makes the aggregation associative, so Spark's
    partition order and DuckDB's accumulation agree bit-for-bit."""
    from ..functions.exact import dec_sum

    return dec_sum(col, scale)


def _grid(ts, seconds: int):
    """Floor a timestamp onto an epoch grid (window start)."""
    return F.timestamp_seconds(F.floor(F.unix_timestamp(ts) / seconds) * seconds)


def tumbling(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Tumbling event-time windows: count + value stats per
    (window, event_type). Pure groupBy — partial aggregation map-side,
    shuffle ∝ #windows × #types."""
    win = _grid(F.col("ts"), minutes * 60)
    return (
        events.groupBy(
            F.date_format(win, FMT).alias("window_start"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dec_sum("value").alias("sum_value"),
            # exact distinct for oracle parity; at 100 TB swap for
            # approx_count_distinct (HLL) — one partial-agg pass.
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def sliding(events: DataFrame, length_min: int = 60, slide_min: int = 30) -> DataFrame:
    """Sliding windows via explicit window-start explode (each event
    belongs to length/slide windows). Matches F.window(ts, length,
    slide) semantics with oracle-expressible arithmetic."""
    n = length_min // slide_min
    slide_s = slide_min * 60
    offsets = F.array(*[F.lit(i * slide_s) for i in range(n)])
    base = _grid(F.col("ts"), slide_s)
    return (
        events.withColumn("__off", F.explode(offsets))
        .withColumn("window_start", F.date_format(
            F.timestamp_seconds(F.unix_timestamp(base) - F.col("__off")), FMT))
        .groupBy("window_start")
        .agg(F.count(F.lit(1)).alias("n_events"), _dec_sum("value").alias("sum_value"))
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session windows per user with a max-gap: gaps-and-islands.
    Two windows over the same (user_id, ts) partitioning — one shuffle,
    both windows pipeline on it."""
    gap_s = gap_minutes * 60
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_sess = (
        F.when(
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(by_user)) > gap_s, 1
        )
        .otherwise(0)
    )
    with_id = events.withColumn(
        "__new", F.when(F.lag("ts").over(by_user).isNull(), 1).otherwise(new_sess)
    ).withColumn("session_id", F.sum("__new").over(by_user.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        with_id.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), FMT).alias("session_start"),
            F.date_format(F.max("ts"), FMT).alias("session_end"),
            _dec_sum("value").alias("sum_value"),
        )
    )


def json_props_agg(events: DataFrame) -> DataFrame:
    """Semi-structured props column: JSON path extraction + typed agg
    (the multimodal-metadata pattern applied to JSON)."""
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def interval_pairs(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    minutes: int = 30,
    how: str = "inner",
) -> DataFrame:
    """Batch twin of the stream-stream interval join: (left, right)
    event pairs per user where the right event lands in
    [left.ts, left.ts + minutes). The join is an equi-join on user_id
    with a range residual — Catalyst shuffles on user_id only, so
    parallelism tracks the user dimension, not the interval.
    ``how="left"`` keeps unmatched left events with NULL right ids (the
    conversion-funnel shape: every click, purchased or not)."""
    a = events.filter(F.col("event_type") == left_type).select(
        "user_id", F.col("event_id").alias("left_id"), F.col("ts").alias("__lts")
    )
    b = events.filter(F.col("event_type") == right_type).select(
        F.col("user_id").alias("__uid"), F.col("event_id").alias("right_id"), F.col("ts").alias("__rts")
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("__uid"))
            & (F.col("__rts") >= F.col("__lts"))
            & (F.col("__rts") < F.col("__lts") + F.expr(f"INTERVAL {minutes} MINUTES")),
            how,
        )
        .select(
            "user_id",
            "left_id",
            "right_id",
            # cast("timestamp") tolerates TIMESTAMP_NTZ inputs (the
            # driver testdata stores naive-UTC micros, which Spark 4
            # reads as NTZ); under the UTC session it is a no-op for
            # LTZ and a same-wall-time promotion for NTZ. unix_micros
            # itself is LTZ-only and would fail analysis on NTZ.
            (F.unix_micros(F.col("__rts").cast("timestamp"))
             - F.unix_micros(F.col("__lts").cast("timestamp"))).alias("gap_us"),
        )
    )


def rollup_reuse(events: DataFrame, value_col: str = "value") -> DataFrame:
    """Multi-granularity rollup where coarser grains re-aggregate the
    finer grain's partials (the continuous-aggregate / hypertable
    pattern): hour → day → month each read the previous level's
    (count, sum) pairs, never the raw events again. At 100 TB the raw
    scan happens once; every additional grain costs only
    |hourly rows| ≈ |raw| / fan-in. avg is derived sum/count at each
    level, which re-aggregates exactly (unlike averaging averages).

    Output: one row per (grain, bucket_start) with n, total, avg.
    """
    hourly = (
        events.groupBy(F.date_trunc("hour", F.col("ts")).alias("b"))
        # integer-unit partials: exact, so re-aggregation at coarser
        # grains is order-independent too (the point of reusable partials)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col(value_col) * 1000000.0 + 0.5).cast("bigint")).alias("s"),
        )
    )
    daily = (
        hourly.groupBy(F.date_trunc("day", F.col("b")).alias("b"))
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    )
    monthly = (
        daily.groupBy(F.date_trunc("month", F.col("b")).alias("b"))
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    )
    out = None
    for grain, df in (("hour", hourly), ("day", daily), ("month", monthly)):
        level = df.select(
            F.lit(grain).alias("grain"),
            F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "n",
            F.round(F.col("s").cast("double") / F.lit(1000000.0), 2).alias("total"),
            F.round(F.col("s").cast("double") / F.lit(1000000.0) / F.col("n"), 4).alias("avg_value"),
        )
        out = level if out is None else out.unionByName(level)
    return out
