"""Wave-46 query catalog: strict-order windowed funnels and lead-lag
cross-correlation.

New operator families:
  - window_funnel_strict  ClickHouse-windowFunnel-style STRICT-order
                          funnel: view → click → purchase where each
                          step must occur AFTER the previous step and
                          inside a 1-hour window anchored at the
                          first view — the semantics product teams
                          actually mean by "funnel", vs the weak
                          first-occurrence ordering `events_funnel`
                          measures (kept: the two together quantify
                          how much ordering assumptions move the
                          numbers)
  - leadlag_crosscorr     lead-lag Pearson cross-correlation between
                          the click and purchase daily series at lags
                          −7..+7 — "do clicks lead purchases, and by
                          how many days?" — the causal-direction
                          smell test run before any attribution model

Hash-safety: funnel counts come from exact timestamp comparisons
(micros); cross-correlation moments are exact int64 sums with the
Pearson expression written identically on both engines (IEEE sqrt is
correctly rounded), rounded at 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register
from .session import load_table

# ----------------------------------------------------------------------
# Strict-order windowed funnel
# ----------------------------------------------------------------------


@register(
    "window_funnel_strict",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, v.t1, min(e.ts) AS t2
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click'
        AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 1 HOUR
      GROUP BY e.user_id, v.t1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > c.t2 AND e.ts <= c.t1 + INTERVAL 1 HOUR
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_step1_view,
           (SELECT count(*) FROM c) AS n_step2_click,
           (SELECT count(*) FROM p) AS n_step3_purchase
    """,
)
def window_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order windowed funnel anchored at each user's FIRST
    view: a qualifying click must come strictly after that view, a
    qualifying purchase strictly after that click, and both inside
    one hour of the anchor. Deterministic greedy-from-first-anchor
    semantics (documented variant of ClickHouse's windowFunnel, which
    maximizes over anchors); compare with `events_funnel` (weak
    first-occurrence ordering) to see what ordering strictness costs.

    Scale: three user-keyed aggregates/joins — each step's frame is
    one row per surviving user, so the chain SHRINKS monotonically;
    no windows, no self-joins on the raw stream beyond the user-keyed
    equi-joins Spark shuffles once per step."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id", "t1")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_step1_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_step2_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_step3_purchase"))
    return nv.crossJoin(F.broadcast(nc)).crossJoin(F.broadcast(np_))


# ----------------------------------------------------------------------
# Lead-lag cross-correlation
# ----------------------------------------------------------------------

XCORR_MAX_LAG = 7


@register(
    "leadlag_crosscorr",
    f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS y
      FROM events GROUP BY 1, 2
    ),
    x AS (SELECT d, y AS xv FROM daily WHERE event_type = 'click'),
    yy AS (SELECT d, y AS yv FROM daily WHERE event_type = 'purchase'),
    lags AS (SELECT unnest(range(-{XCORR_MAX_LAG}, {XCORR_MAX_LAG + 1}))
                    AS lag),
    m AS (
      SELECT l.lag, x.xv, yy.yv
      FROM lags l
      JOIN x ON TRUE
      JOIN yy ON yy.d = x.d + CAST(l.lag AS INTEGER)
    ),
    s AS (
      SELECT lag, count(*) AS n,
             CAST(sum(xv) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
             CAST(sum(xv * xv) AS BIGINT) AS sxx,
             CAST(sum(yv * yv) AS BIGINT) AS syy,
             CAST(sum(xv * yv) AS BIGINT) AS sxy
      FROM m GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, n,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN round((n * sxy - sx * sy)
                           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                  * (n * syy - sy * sy)), 6)
                END AS r
    FROM s
    """,
)
def leadlag_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson cross-correlation between daily click counts x(d) and
    daily purchase counts y(d + lag) for lags −7..+7. A positive-lag
    peak means clicks LEAD purchases by that many days — the check an
    attribution model's assumed direction rests on.

    Scale: the stream collapses to |types|×|days| rows first; the lag
    expansion is a 15-row broadcast against the collapsed series, and
    every moment is an exact int64 sum, so r is a single deterministic
    float expression per lag."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    x = daily.where(F.col("event_type") == "click").select(
        "d", F.col("y").alias("xv")
    )
    yy = daily.where(F.col("event_type") == "purchase").select(
        F.col("d").alias("dy"), F.col("y").alias("yv")
    )
    lags = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(k) for k in range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1)])
        ).alias("lag")
    )
    m = (
        x.crossJoin(F.broadcast(lags))
        .withColumn("dy", F.date_add("d", F.col("lag")))
        .join(yy, "dy")
    )
    s = m.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xv").cast("bigint").alias("sx"),
        F.sum("yv").cast("bigint").alias("sy"),
        F.sum(F.col("xv") * F.col("xv")).cast("bigint").alias("sxx"),
        F.sum(F.col("yv") * F.col("yv")).cast("bigint").alias("syy"),
        F.sum(F.col("xv") * F.col("yv")).cast("bigint").alias("sxy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        F.col("lag").cast("bigint").alias("lag"),
        "n",
        F.when(
            (vx > 0) & (vy > 0),
            F.round(num / F.sqrt(vx.cast("double") * vy), 6),
        ).alias("r"),
    )
