"""Wave-45 query catalog: forecast backtesting, probabilistic-score
decomposition, and graph mixing structure.

New operator families:
  - rolling_origin_backtest  rolling-origin evaluation (Tashman 2000)
                          of the lag-7 seasonal-naive forecaster at
                          three held-out origins — the time-series
                          cross-validation loop every forecasting
                          pipeline runs; splits are date arithmetic
                          (never row offsets), so the forecast only
                          ever reads pre-origin data
  - brier_decomposition   Murphy (1973) decomposition of the Brier
                          score into reliability − resolution +
                          uncertainty over 10 score bins, with the
                          within-bin variance residual REPORTED
                          rather than silently absorbed
  - degree_assortativity  Newman (2002) degree-mixing coefficient of
                          the part co-purchase graph — do hub parts
                          co-sell with hubs (r > 0) or with the long
                          tail (r < 0)?

Hash-safety: per-mille score quantization, error sums, and degree
sums are exact int64 end to end; each float expression is written in
the identical association order on both engines; the only
order-sensitive float reductions are 10-term bin sums (round-6 safe
by magnitude).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register
from .session import load_table

# ----------------------------------------------------------------------
# Rolling-origin backtest
# ----------------------------------------------------------------------

BACKTEST_ORIGINS = (7, 14, 21)


@register(
    "rolling_origin_backtest",
    f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS y
      FROM events GROUP BY 1, 2
    ),
    h AS (SELECT max(d) AS dmax FROM daily),
    o AS (SELECT unnest([{", ".join(str(x) for x in BACKTEST_ORIGINS)}])
                 AS days_back),
    test AS (
      SELECT o.days_back, c.event_type, c.y, s.y AS y_hat
      FROM daily c
      CROSS JOIN h
      CROSS JOIN o
      JOIN daily s ON s.event_type = c.event_type AND s.d = c.d - 7
      WHERE c.d > h.dmax - o.days_back
        AND c.d <= h.dmax - (o.days_back - 7)
    )
    SELECT CAST(days_back AS BIGINT) AS days_back, event_type,
           count(*) AS n_days,
           CAST(sum(abs(y - y_hat)) AS BIGINT) AS abs_err,
           round(sum(abs(y - y_hat)) * 1.0 / count(*), 6) AS mae
    FROM test GROUP BY 1, 2
    """,
)
def rolling_origin_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAE of the lag-7 seasonal-naive forecast over a 7-day test
    window at each of three rolling origins (7/14/21 days before the
    corpus end). The forecast for a test day is the count 7 days
    earlier — at or before the origin by construction, so no
    look-ahead leakage is possible. The per-origin MAE trend is the
    stability signal a forecasting pipeline gates deploys on.

    Scale: the event stream collapses to |types|×|days| rows first;
    origins and the horizon ride 1-row/3-row broadcasts; the forecast
    lookup is a date-shifted equi-join on the collapsed table. Error
    sums are exact integers."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    h = daily.agg(F.max("d").alias("dmax"))
    origins = (
        spark.range(1)
        .select(
            F.explode(F.array(*[F.lit(x) for x in BACKTEST_ORIGINS])).alias(
                "days_back"
            )
        )
    )
    lag7 = daily.select(
        "event_type", F.date_add("d", 7).alias("d"), F.col("y").alias("y_hat")
    )
    test = (
        daily.join(lag7, ["event_type", "d"])
        .crossJoin(F.broadcast(h))
        .crossJoin(F.broadcast(origins))
        .where(
            (F.col("d") > F.date_sub("dmax", F.col("days_back")))
            & (F.col("d") <= F.date_sub("dmax", F.col("days_back") - 7))
        )
    )
    return test.groupBy(
        F.col("days_back").cast("bigint").alias("days_back"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.abs(F.col("y") - F.col("y_hat"))).cast("bigint").alias("abs_err"),
        F.round(
            F.sum(F.abs(F.col("y") - F.col("y_hat"))) * 1.0 / F.count(F.lit(1)), 6
        ).alias("mae"),
    )


# ----------------------------------------------------------------------
# Brier decomposition
# ----------------------------------------------------------------------


@register(
    "brier_decomposition",
    """
    WITH scored AS (
      SELECT least(1000, CAST(floor(value * 10 + 0.5) AS BIGINT)) AS p,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    bins AS (
      SELECT least(9, p // 100) AS bucket,
             count(*) AS nk,
             CAST(sum(y) AS BIGINT) AS syk,
             CAST(sum(p) AS BIGINT) AS spk
      FROM scored GROUP BY 1
    ),
    g AS (
      SELECT CAST(sum(nk) AS BIGINT) AS n, CAST(sum(syk) AS BIGINT) AS sy
      FROM bins
    ),
    raw AS (
      SELECT (SELECT n FROM g) AS n,
             (SELECT sy FROM g) AS sy,
             (SELECT CAST(sum(p * p - 2000 * p * y + 1000000 * y) AS BIGINT)
              FROM scored) AS q,
             sum((CAST(spk - 1000 * syk AS DOUBLE)
                  * CAST(spk - 1000 * syk AS DOUBLE)) / nk) AS rel_num,
             sum((CAST((SELECT n FROM g) * syk
                       - nk * (SELECT sy FROM g) AS DOUBLE)
                  * CAST((SELECT n FROM g) * syk
                         - nk * (SELECT sy FROM g) AS DOUBLE)) / nk) AS res_num
      FROM bins
    )
    SELECT n, sy,
           round(q / (CAST(n AS DOUBLE) * 1000000.0), 6) AS brier,
           round(rel_num / (CAST(n AS DOUBLE) * 1000000.0), 6) AS reliability,
           round(res_num / (CAST(n AS DOUBLE) * n * n), 6) AS resolution,
           round((sy * 1.0 / n) * (1.0 - sy * 1.0 / n), 6) AS uncertainty,
           round(q / (CAST(n AS DOUBLE) * 1000000.0)
                 - (rel_num / (CAST(n AS DOUBLE) * 1000000.0)
                    - res_num / (CAST(n AS DOUBLE) * n * n)
                    + (sy * 1.0 / n) * (1.0 - sy * 1.0 / n)), 6) AS residual
    FROM raw
    """,
)
def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score of the per-mille
    quantized `value` score predicting purchase events:
    Brier = reliability − resolution + uncertainty + residual, where
    the residual is the within-bin variance term most dashboards
    silently fold into reliability — here it is reported, so a
    perfectly-binned scorer shows residual 0 and a coarse binning
    shows exactly what the binning cost.

    Scale: one map-side-combined 10-bin aggregate over the events
    scan plus one exact integer pass for the raw Brier sum
    (p² − 2000·p·y + 10⁶·y stays int64 at any rung); everything
    after operates on 10 rows. The bin sums are the only
    order-sensitive float reductions (10 O(1) terms — far inside
    round-6)."""
    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        F.least(F.lit(1000), F.floor(F.col("value") * 10 + F.lit(0.5)))
        .cast("bigint")
        .alias("p"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    bins = scored.groupBy(
        F.least(F.lit(9), F.expr("p div 100")).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("nk"),
        F.sum("y").cast("bigint").alias("syk"),
        F.sum("p").cast("bigint").alias("spk"),
    )
    q = scored.agg(
        F.sum(
            F.col("p") * F.col("p") - 2000 * F.col("p") * F.col("y") + 1000000 * F.col("y")
        )
        .cast("bigint")
        .alias("q")
    )
    g = bins.agg(
        F.sum("nk").cast("bigint").alias("n"), F.sum("syk").cast("bigint").alias("sy")
    )
    wb = bins.crossJoin(F.broadcast(g))
    e_rel = (F.col("spk") - 1000 * F.col("syk")).cast("double")
    e_res = (F.col("n") * F.col("syk") - F.col("nk") * F.col("sy")).cast("double")
    raw = wb.agg(
        F.max("n").alias("n"),
        F.max("sy").alias("sy"),
        F.sum(e_rel * e_rel / F.col("nk")).alias("rel_num"),
        F.sum(e_res * e_res / F.col("nk")).alias("res_num"),
    ).crossJoin(F.broadcast(q))
    n_d = F.col("n").cast("double")
    brier = F.col("q") / (n_d * 1000000.0)
    rel = F.col("rel_num") / (n_d * 1000000.0)
    res = F.col("res_num") / (n_d * F.col("n") * F.col("n"))
    unc = (F.col("sy") * 1.0 / F.col("n")) * (1.0 - F.col("sy") * 1.0 / F.col("n"))
    return raw.select(
        "n",
        "sy",
        F.round(brier, 6).alias("brier"),
        F.round(rel, 6).alias("reliability"),
        F.round(res, 6).alias("resolution"),
        F.round(unc, 6).alias("uncertainty"),
        F.round(brier - (rel - res + unc), 6).alias("residual"),
    )


# ----------------------------------------------------------------------
# Degree assortativity of the co-purchase graph
# ----------------------------------------------------------------------


@register(
    "degree_assortativity",
    """
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    nodes AS (SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges),
    deg AS (SELECT v, count(*) AS d FROM nodes GROUP BY v),
    ed AS (
      SELECT da.d AS x, db.d AS y
      FROM edges JOIN deg da ON da.v = a JOIN deg db ON db.v = b
    ),
    s AS (
      SELECT count(*) AS m,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x + y) AS BIGINT) AS sxpy,
             CAST(sum(x * x + y * y) AS BIGINT) AS sx2y2
      FROM ed
    )
    SELECT (SELECT count(*) FROM deg) AS n_nodes,
           m AS n_edges, sxy, sxpy, sx2y2,
           CASE WHEN sx2y2 * 1.0 / (2 * m)
                     - (sxpy * 1.0 / (2 * m)) * (sxpy * 1.0 / (2 * m)) > 0
                THEN round((sxy * 1.0 / m
                            - (sxpy * 1.0 / (2 * m)) * (sxpy * 1.0 / (2 * m)))
                           / (sx2y2 * 1.0 / (2 * m)
                              - (sxpy * 1.0 / (2 * m))
                                * (sxpy * 1.0 / (2 * m))), 6)
                END AS r
    FROM s
    """,
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree-mixing coefficient r of the part co-purchase
    graph: the Pearson correlation of endpoint degrees over edges
    (each undirected edge contributing both orientations via the
    symmetric sums). r > 0 means hub parts co-sell with hubs.

    Scale: edge generation is the in-row basket pair expansion
    (queries_wave10._basket_pair_edges — cost Σ basket², never
    corpus², one basket shuffle instead of a self-join); degrees are
    one groupBy over both edge directions; the degree lookup joins are
    node-keyed with NO broadcast hint on the array-free narrow table
    (AQE sizes it accurately — contrast triangle_count's nested-array
    adjacency, which is hinted). All sums exact int64; r is a single
    guarded float expression."""
    from .queries_wave10 import _basket_pair_edges

    li = load_table(spark, sf_dir, "lineitem")
    edges = _basket_pair_edges(li.select("l_orderkey", "l_partkey"))
    nodes = edges.select(F.col("a").alias("v")).unionAll(
        edges.select(F.col("b").alias("v"))
    )
    deg = nodes.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    ed = edges.join(
        deg.select(F.col("v").alias("a"), F.col("d").alias("x")), "a"
    ).join(deg.select(F.col("v").alias("b"), F.col("d").alias("y")), "b")
    s = ed.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") + F.col("y")).cast("bigint").alias("sxpy"),
        F.sum(F.col("x") * F.col("x") + F.col("y") * F.col("y"))
        .cast("bigint")
        .alias("sx2y2"),
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    mean = F.col("sxpy") * 1.0 / (2 * F.col("m"))
    var = F.col("sx2y2") * 1.0 / (2 * F.col("m")) - mean * mean
    cov = F.col("sxy") * 1.0 / F.col("m") - mean * mean
    return s.crossJoin(F.broadcast(nn)).select(
        "n_nodes",
        F.col("m").alias("n_edges"),
        "sxy",
        "sxpy",
        "sx2y2",
        F.when(var > 0, F.round(cov / var, 6)).alias("r"),
    )
