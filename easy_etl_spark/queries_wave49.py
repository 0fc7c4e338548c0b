"""Wave-49 query catalog: survival comparison, rank correlation, and
quasi-experimental estimation.

New operator families:
  - logrank_test        Mantel-Haenszel log-rank test (1966) between
                        two customer cohorts' reorder-gap survival —
                        the hypothesis test that belongs next to the
                        `kaplan_meier_retention` curve: same duration
                        construction, exact integer observed−expected
                        accounting per event week
  - spearman_rho        Spearman rank correlation with midrank ties,
                        computed from per-value counts (doubled
                        midranks stay integer) — the monotone-
                        association complement to the catalog's
                        Pearson `corr_stats`
  - diff_in_diff        two-cohort pre/post difference-in-differences
                        point estimate on event values — the
                        quasi-experimental baseline for "did the
                        change move the metric", exact integer cents

Hash-safety: all counts/ranks/cents are exact int64 (midranks and
U-style statistics carried ×2); expected-event and variance terms are
single float expressions written identically on both engines,
rounded at 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register
from .session import load_table

# ----------------------------------------------------------------------
# Log-rank test between two reorder-gap survival curves
# ----------------------------------------------------------------------


@register(
    "logrank_test",
    """
    WITH horizon AS (SELECT max(CAST(o_orderdate AS DATE)) AS h FROM orders),
    seq AS (
      SELECT o_custkey, o_custkey % 2 AS grp,
             CAST(o_orderdate AS DATE) AS d,
             lead(CAST(o_orderdate AS DATE))
               OVER (PARTITION BY o_custkey
                     ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS nxt
      FROM orders
    ),
    dur AS (
      SELECT grp,
             CAST((CASE WHEN nxt IS NULL
                   THEN datediff('day', d, (SELECT h FROM horizon))
                   ELSE datediff('day', d, nxt) END) // 7 AS BIGINT) AS t_week,
             CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS event
      FROM seq
    ),
    wk AS (
      SELECT t_week,
             CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0w,
             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1w,
             CAST(sum(CASE WHEN grp = 0 THEN event ELSE 0 END) AS BIGINT) AS d0,
             CAST(sum(CASE WHEN grp = 1 THEN event ELSE 0 END) AS BIGINT) AS d1
      FROM dur GROUP BY t_week
    ),
    risk AS (
      SELECT t_week, d0, d1,
             CAST(sum(n0w) OVER (ORDER BY t_week DESC) AS BIGINT) AS r0,
             CAST(sum(n1w) OVER (ORDER BY t_week DESC) AS BIGINT) AS r1
      FROM wk
    ),
    terms AS (
      SELECT CAST(sum(d1) AS BIGINT) AS o1,
             sum((d0 + d1) * 1.0 * r1 / (r0 + r1)) AS e1,
             sum(CASE WHEN r0 + r1 > 1
                 THEN ((d0 + d1) * 1.0 * r0 * r1
                       * ((r0 + r1) - (d0 + d1)))
                      / ((r0 + r1) * 1.0 * (r0 + r1) * ((r0 + r1) - 1))
                 ELSE 0.0 END) AS v
      FROM risk WHERE d0 + d1 > 0
    )
    SELECT o1, round(e1, 6) AS e1,
           round(v, 6) AS var_o1,
           CASE WHEN v > 0 THEN round((o1 - e1) / sqrt(v), 6) END AS z
    FROM terms
    """,
)
def logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel log-rank test comparing reorder-gap survival
    between even and odd customer cohorts — same durations and weekly
    buckets as `kaplan_meier_retention`, with per-event-week
    hypergeometric expected counts and variance. z near 0 says the
    cohorts reorder at indistinguishable rates (they should — the
    split is arbitrary), so this doubles as an A/A calibration of the
    test machinery.

    Scale: one customer-partitioned window builds durations; the
    at-risk tail sums and O−E terms all run on the week-count-sized
    table (the oracle uses plain windows there; the Spark side rides
    the banded prefix primitive so no plan compiles to an
    unpartitioned window)."""
    from .operators.packing import global_running_offset

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.col("o_custkey") % 2).alias("grp"),
        F.to_date("o_orderdate").alias("d"),
        "o_orderkey",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    seq = orders.withColumn("nxt", F.lead("d").over(w))
    horizon = orders.agg(F.max("d").alias("h"))
    dur = seq.crossJoin(F.broadcast(horizon)).select(
        "grp",
        F.floor(
            F.when(F.col("nxt").isNull(), F.datediff("h", "d"))
            .otherwise(F.datediff("nxt", "d"))
            / 7
        )
        .cast("bigint")
        .alias("t_week"),
        F.when(F.col("nxt").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("event"),
    )
    wk = dur.groupBy("t_week").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("bigint").alias("n0w"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("bigint").alias("n1w"),
        F.sum(F.when(F.col("grp") == 0, F.col("event")).otherwise(0))
        .cast("bigint")
        .alias("d0"),
        F.sum(F.when(F.col("grp") == 1, F.col("event")).otherwise(0))
        .cast("bigint")
        .alias("d1"),
    )
    tot = wk.agg(
        F.sum("n0w").cast("bigint").alias("N0"),
        F.sum("n1w").cast("bigint").alias("N1"),
    )
    risk = (
        global_running_offset(
            global_running_offset(wk, "n0w", "t_week", out_col="__b0"),
            "n1w",
            "t_week",
            out_col="__b1",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "t_week",
            "d0",
            "d1",
            (F.col("N0") - F.col("__b0")).cast("bigint").alias("r0"),
            (F.col("N1") - F.col("__b1")).cast("bigint").alias("r1"),
        )
    )
    r0, r1, d0, d1 = F.col("r0"), F.col("r1"), F.col("d0"), F.col("d1")
    dd, rr = d0 + d1, r0 + r1
    e1_t = dd * 1.0 * r1 / rr
    v_t = F.when(
        rr > 1,
        (dd * 1.0 * r0 * r1 * (rr - dd)) / (rr * 1.0 * rr * (rr - 1)),
    ).otherwise(F.lit(0.0))
    terms = risk.where(dd > 0).agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.sum(e1_t).alias("e1"),
        F.sum(v_t).alias("v"),
    )
    return terms.select(
        "o1",
        F.round("e1", 6).alias("e1"),
        F.round("v", 6).alias("var_o1"),
        F.when(F.col("v") > 0, F.round((F.col("o1") - F.col("e1")) / F.sqrt("v"), 6)).alias(
            "z"
        ),
    )


# ----------------------------------------------------------------------
# Spearman rank correlation with midrank ties
# ----------------------------------------------------------------------


@register(
    "spearman_rho",
    """
    WITH base AS (
      SELECT CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS x,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS y
      FROM lineitem
    ),
    xr AS (
      SELECT x, count(*) AS t,
             CAST(2 * coalesce(sum(count(*)) OVER (ORDER BY x
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + count(*) + 1 AS BIGINT) AS rx2
      FROM base GROUP BY x
    ),
    yr AS (
      SELECT y, count(*) AS t,
             CAST(2 * coalesce(sum(count(*)) OVER (ORDER BY y
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + count(*) + 1 AS BIGINT) AS ry2
      FROM base GROUP BY y
    ),
    cells AS (SELECT x, y, count(*) AS c FROM base GROUP BY x, y),
    j AS (
      SELECT cells.c, xr.rx2, yr.ry2 FROM cells
      JOIN xr USING (x) JOIN yr USING (y)
    ),
    s AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(CAST(c AS DECIMAL(38, 0)) * rx2) AS DOUBLE) AS sx,
             CAST(sum(CAST(c AS DECIMAL(38, 0)) * ry2) AS DOUBLE) AS sy,
             CAST(sum(CAST(c AS DECIMAL(38, 0)) * rx2 * rx2) AS DOUBLE) AS sxx,
             CAST(sum(CAST(c AS DECIMAL(38, 0)) * ry2 * ry2) AS DOUBLE) AS syy,
             CAST(sum(CAST(c AS DECIMAL(38, 0)) * rx2 * ry2) AS DOUBLE) AS sxy
      FROM j
    )
    SELECT n,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN round((n * sxy - sx * sy)
                           / sqrt((n * sxx - sx * sx)
                                  * (n * syy - sy * sy)), 6)
                END AS rho
    FROM s
    """,
)
def spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between discount and quantity with
    midrank tie handling: per-value doubled midranks (2·below + t + 1,
    exact integers) join back to rows, then rho is Pearson over the
    doubled ranks — the ×2 cancels. The monotone-association
    complement to Pearson `corr_stats`.

    Scale: ranks come from per-value histograms (value-domain-sized)
    via the BANDED exclusive prefix sum; the fact table collapses to
    (x, y) CELLS before any rank arithmetic, so the moment reduce
    runs over ≤|domain(x)|·|domain(y)| rows. Moments accumulate in
    DECIMAL(38,0) (sxy ≤ 4N³ overflows int64 past ~1.3e6 rows; the
    decimal path is exact to 10³⁸ on both engines) and convert to
    double once, deterministically, before the single rho expression
    (the oracle uses plain windows over the same bounded grids)."""
    from .operators.packing import global_running_offset

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.floor(F.col("l_discount") * 100.0 + 0.5).cast("bigint").alias("x"),
        F.floor(F.col("l_quantity") + 0.5).cast("bigint").alias("y"),
    )
    xh = base.groupBy("x").agg(F.count(F.lit(1)).alias("t"))
    xr = global_running_offset(xh, "t", "x", out_col="__bx").select(
        "x", (2 * F.col("__bx") + F.col("t") + 1).cast("bigint").alias("rx2")
    )
    yh = base.groupBy("y").agg(F.count(F.lit(1)).alias("t"))
    yr = global_running_offset(yh, "t", "y", out_col="__by").select(
        "y", (2 * F.col("__by") + F.col("t") + 1).cast("bigint").alias("ry2")
    )
    cells = base.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c"))
    j = cells.join(F.broadcast(xr), "x").join(F.broadcast(yr), "y")
    cdec = F.col("c").cast("decimal(38,0)")
    s = j.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(cdec * F.col("rx2")).cast("double").alias("sx"),
        F.sum(cdec * F.col("ry2")).cast("double").alias("sy"),
        F.sum(cdec * F.col("rx2") * F.col("rx2")).cast("double").alias("sxx"),
        F.sum(cdec * F.col("ry2") * F.col("ry2")).cast("double").alias("syy"),
        F.sum(cdec * F.col("rx2") * F.col("ry2")).cast("double").alias("sxy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        "n",
        F.when((vx > 0) & (vy > 0), F.round(num / F.sqrt(vx * vy), 6)).alias("rho"),
    )


# ----------------------------------------------------------------------
# Difference-in-differences
# ----------------------------------------------------------------------


@register(
    "diff_in_diff",
    """
    WITH span AS (
      SELECT CAST((epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS BIGINT) AS mid_us
      FROM events
    ),
    base AS (
      SELECT user_id % 2 AS treated,
             CASE WHEN epoch_us(ts) >= (SELECT mid_us FROM span)
                  THEN 1 ELSE 0 END AS post,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    cell AS (
      SELECT treated, post, count(*) AS n, CAST(sum(cents) AS BIGINT) AS s
      FROM base GROUP BY 1, 2
    ),
    wide AS (
      SELECT max(CASE WHEN treated = 1 AND post = 1 THEN s * 1.0 / n END) AS y11,
             max(CASE WHEN treated = 1 AND post = 0 THEN s * 1.0 / n END) AS y10,
             max(CASE WHEN treated = 0 AND post = 1 THEN s * 1.0 / n END) AS y01,
             max(CASE WHEN treated = 0 AND post = 0 THEN s * 1.0 / n END) AS y00,
             CAST(sum(n) AS BIGINT) AS n_events
      FROM cell
    )
    SELECT n_events,
           round(y11 / 100.0, 6) AS treated_post,
           round(y10 / 100.0, 6) AS treated_pre,
           round(y01 / 100.0, 6) AS control_post,
           round(y00 / 100.0, 6) AS control_pre,
           round(((y11 - y10) - (y01 - y00)) / 100.0, 6) AS did_estimate
    FROM wide
    """,
)
def diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences point estimate of mean event value:
    even/odd user cohorts × pre/post the time-span midpoint. With an
    arbitrary split the estimate should hover near 0 — the A/A
    placebo run every DiD deployment does before trusting the design
    on a real rollout.

    Scale: one map-side-combined 4-cell aggregate over the events
    scan; the estimate is arithmetic on 4 exact integer-cents sums."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    span = ev.agg(
        F.expr(
            "CAST((unix_micros(CAST(min(ts) AS TIMESTAMP))"
            " + unix_micros(CAST(max(ts) AS TIMESTAMP))) div 2 AS BIGINT)"
        ).alias("mid_us")
    )
    base = ev.crossJoin(F.broadcast(span)).select(
        (F.col("user_id") % 2).alias("treated"),
        F.when(us >= F.col("mid_us"), 1).otherwise(0).alias("post"),
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    cell = base.groupBy("treated", "post").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").cast("bigint").alias("s")
    )

    def m(t, p):
        return F.max(
            F.when(
                (F.col("treated") == t) & (F.col("post") == p),
                F.col("s") * 1.0 / F.col("n"),
            )
        )

    wide = cell.agg(
        m(1, 1).alias("y11"),
        m(1, 0).alias("y10"),
        m(0, 1).alias("y01"),
        m(0, 0).alias("y00"),
        F.sum("n").cast("bigint").alias("n_events"),
    )
    return wide.select(
        "n_events",
        F.round(F.col("y11") / 100.0, 6).alias("treated_post"),
        F.round(F.col("y10") / 100.0, 6).alias("treated_pre"),
        F.round(F.col("y01") / 100.0, 6).alias("control_post"),
        F.round(F.col("y00") / 100.0, 6).alias("control_pre"),
        F.round(
            ((F.col("y11") - F.col("y10")) - (F.col("y01") - F.col("y00"))) / 100.0, 6
        ).alias("did_estimate"),
    )
