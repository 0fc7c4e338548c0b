"""Wave-17 query catalog: outlier correction and per-entity capping.

New operator families:
  - winsorize_values        clip values at exact p05/p95 per group
                            (the CORRECTION sibling of the MAD/z-score
                            detection family)
  - cap_events_per_user_day per-entity traffic capping with a
                            deterministic survivor set

Hash-safety follows the catalog conventions (queries.py docstring);
percentile bounds use the engine-portable rank-interpolation formula
(queries_wave3._pct_sql rationale) and clipped values are per-row
quantized before summing so the after-means are order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import register
from .session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _pct_sql(q: float, val: str) -> str:
    """DuckDB interpolated percentile over a ranked CTE carrying
    (``val``, rn, n) — parametrized version of queries_wave11._med_sql."""
    lo = f"CAST(floor((n - 1) * {q}) AS BIGINT) + 1"
    lo_v = f"max(CASE WHEN rn = {lo} THEN {val} END)"
    hi_v = f"max(CASE WHEN rn = least({lo} + 1, n) THEN {val} END)"
    frac = f"((max(n) - 1) * {q} - floor((max(n) - 1) * {q}))"
    return f"{lo_v} + ({hi_v} - {lo_v}) * {frac}"


def _pct_col(q: float, val: str):
    """Spark twin of :func:`_pct_sql` (same arithmetic, same order)."""
    lo = F.floor((F.col("n") - 1) * q).cast("bigint") + 1
    lo_v = F.max(F.when(F.col("rn") == lo, F.col(val)))
    hi_v = F.max(F.when(F.col("rn") == F.least(lo + 1, F.col("n")), F.col(val)))
    frac = (F.max("n") - 1) * q - F.floor((F.max("n") - 1) * q)
    return lo_v + (hi_v - lo_v) * frac


@register(
    "winsorize_values",
    f"""
    WITH v AS (
      SELECT event_id, event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vq
      FROM events
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY vq, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM v
    ),
    bounds AS (
      SELECT event_type, {_pct_sql(0.05, 'vq')} AS lo, {_pct_sql(0.95, 'vq')} AS hi
      FROM r GROUP BY event_type
    ),
    clipped AS (
      SELECT v.event_type, v.vq, bounds.lo, bounds.hi,
             CAST(floor(least(greatest(CAST(v.vq AS DOUBLE), lo), hi) * 10000 + 0.5)
                  AS BIGINT) AS cq
      FROM v JOIN bounds USING (event_type)
    )
    SELECT event_type, count(*) AS n,
           CAST(sum(CASE WHEN CAST(vq AS DOUBLE) < lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_low,
           CAST(sum(CASE WHEN CAST(vq AS DOUBLE) > hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_high,
           round(CAST(sum(vq) AS BIGINT) / 100.0 / count(*), 4) AS mean_before,
           round(CAST(sum(cq) AS BIGINT) / 1000000.0 / count(*), 4) AS mean_after
    FROM clipped GROUP BY event_type
    """,
)
def winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clip each group's values into its exact
    [p05, p95] band and report clip counts plus before/after means —
    the CORRECTION step that follows outlier DETECTION
    (robust_outliers_mad / events_anomaly_zscore) in a preprocessing
    pipeline. Percentile bounds come from the portable rank
    interpolation; clipped values are per-row quantized to 1e-4 cents
    before summing, so the after-mean is order-independent despite the
    fractional bounds.

    Scale: the rank windows partition by event_type; bounds broadcast
    back onto the fact rows; two aggregates total."""
    e = _t(spark, sf_dir, "events")
    v = e.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("vq"),
    )
    wt = Window.partitionBy("event_type")
    r = v.select(
        "*",
        F.row_number().over(wt.orderBy("vq", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    bounds = r.groupBy("event_type").agg(
        _pct_col(0.05, "vq").alias("lo"), _pct_col(0.95, "vq").alias("hi")
    )
    vd = F.col("vq").cast("double")
    clipped = v.join(F.broadcast(bounds), "event_type").withColumn(
        "cq",
        F.floor(
            F.least(F.greatest(vd, F.col("lo")), F.col("hi")) * 10000 + F.lit(0.5)
        ).cast("bigint"),
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(vd < F.col("lo"), 1).otherwise(0)).alias("n_clipped_low"),
        F.sum(F.when(vd > F.col("hi"), 1).otherwise(0)).alias("n_clipped_high"),
        F.round(F.sum("vq") / F.lit(100.0) / F.count(F.lit(1)), 4).alias(
            "mean_before"
        ),
        F.round(F.sum("cq") / F.lit(1000000.0) / F.count(F.lit(1)), 4).alias(
            "mean_after"
        ),
    )


@register(
    "cap_events_per_user_day",
    """
    WITH ranked AS (
      SELECT user_id,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             event_id,
             row_number() OVER (
               PARTITION BY user_id, datediff('day', DATE '1970-01-01',
                                              CAST(ts AS DATE))
               ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id, d AS day_num, count(*) AS n_events,
           CAST(sum(CASE WHEN rn <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rn <= 5 THEN event_id ELSE 0 END) AS BIGINT)
             AS kept_ids_sum
    FROM ranked GROUP BY user_id, d
    """,
)
def cap_events_per_user_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity traffic capping: keep at most 5 events per user per
    day, survivors chosen deterministically as the FIRST five by
    (ts, event_id) — the abuse/bot mitigation that stops a single hot
    entity from dominating a behavioral training set (the row-level
    sibling of the token-level source capping in
    curation.cap_sources_by_budget). kept_ids_sum fingerprints the
    exact survivor set.

    Scale: one window partitioned by (user, day) — small independent
    partitions — and one aggregate on the same key; nothing global."""
    e = _t(spark, sf_dir, "events")
    d = F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
    w = Window.partitionBy("user_id", "d").orderBy("ts", "event_id")
    ranked = e.select("user_id", d.alias("d"), "event_id", "ts").withColumn(
        "rn", F.row_number().over(w)
    )
    kept = F.col("rn") <= 5
    return ranked.groupBy("user_id", F.col("d").alias("day_num")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(kept, F.col("event_id")).otherwise(0)).alias("kept_ids_sum"),
    )
