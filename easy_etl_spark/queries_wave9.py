"""Wave-9 query catalog: graph metrics, engagement windows, ABC
analysis, change detection, and skyline queries.

New operator families:
  - triangle_count          degree-oriented triangle counting + global
                            clustering coefficient
  - dau_wau_stickiness      rolling 7-day active users and DAU/WAU
  - pareto_revenue_deciles  ABC / Pareto concentration of customer revenue
  - cusum_changepoints      tabular CUSUM drift detection per event type
  - skyline_parts           2-D Pareto frontier (min price, max size)

Hash-safety follows the catalog conventions (queries.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import register
from .session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------
# Graph metrics: triangles + clustering coefficient
# ----------------------------------------------------------------------

@register(
    "triangle_count",
    """
    WITH edges AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    nodes AS (
      SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges
    ),
    deg AS (SELECT v, count(*) AS d FROM nodes GROUP BY v),
    oriented AS (
      SELECT CASE WHEN (da.d, a) < (db.d, b) THEN a ELSE b END AS src,
             CASE WHEN (da.d, a) < (db.d, b) THEN b ELSE a END AS dst
      FROM edges JOIN deg da ON da.v = a JOIN deg db ON db.v = b
    ),
    tri AS (
      SELECT count(*) AS n_triangles
      FROM oriented e1
      JOIN oriented e2 ON e1.src = e2.src AND e1.dst < e2.dst
      JOIN edges c ON c.a = e1.dst AND c.b = e2.dst
    )
    SELECT (SELECT count(*) FROM deg) AS n_nodes,
           (SELECT count(*) FROM edges) AS n_edges,
           (SELECT CAST(sum(CAST(d * (d - 1) / 2 AS BIGINT)) AS BIGINT) FROM deg)
             AS n_wedges,
           n_triangles,
           round(3.0 * n_triangles
                 / (SELECT CAST(sum(CAST(d * (d - 1) / 2 AS BIGINT)) AS BIGINT)
                    FROM deg), 6) AS global_clustering
    FROM tri
    """,
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the part
    co-purchase graph (parts appearing in the same order are adjacent).

    Scale: the classic degree-ordered orientation — every undirected
    edge points from its (degree, id)-smaller endpoint, so each
    triangle is enumerated EXACTLY once from its minimum vertex and the
    wedge join fans out by OUT-degree, bounded by O(sqrt(m)) per node
    instead of the raw degree (the difference between hours and seconds
    on power-law graphs). Both joins are equi-joins on node/pair keys —
    no cartesian. The degree joins carry NO broadcast hint on purpose:
    the degree table is node-count-sized, and a forced broadcast would
    OOM the driver on a billion-node graph — AQE picks broadcast when
    the table is actually small and shuffle-hash otherwise."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l1, l2 = li.alias("l1"), li.alias("l2")
    edges = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_partkey") < F.col("l2.l_partkey")),
        )
        .select(F.col("l1.l_partkey").alias("a"), F.col("l2.l_partkey").alias("b"))
        .distinct()
        # the edge list feeds FOUR consumers (degrees, orientation, the
        # closing join, the edge count) — without persist each one
        # replays the lineitem self-join + distinct
        .persist()
    )
    nodes = edges.select(F.col("a").alias("v")).unionAll(
        edges.select(F.col("b").alias("v"))
    )
    deg = nodes.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    with_deg = edges.join(da, "a").join(db, "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    ).persist()  # consumed twice by the wedge self-join
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.src") == F.col("e2.src")) & (F.col("e1.dst") < F.col("e2.dst")),
    ).select(F.col("e1.dst").alias("a"), F.col("e2.dst").alias("b"))
    tri = wedges.join(edges, ["a", "b"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    n_wedges = deg.agg(
        F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("bigint")).alias("w")
    )
    summary = (
        tri.crossJoin(F.broadcast(deg.agg(F.count(F.lit(1)).alias("n_nodes"))))
        .crossJoin(F.broadcast(edges.agg(F.count(F.lit(1)).alias("n_edges"))))
        .crossJoin(F.broadcast(n_wedges))
    )
    return summary.select(
        "n_nodes",
        "n_edges",
        F.col("w").alias("n_wedges"),
        "n_triangles",
        F.round(F.lit(3.0) * F.col("n_triangles") / F.col("w"), 6).alias(
            "global_clustering"
        ),
    )


# ----------------------------------------------------------------------
# Engagement: DAU / rolling-7-day WAU / stickiness
# ----------------------------------------------------------------------

@register(
    "dau_wau_stickiness",
    """
    WITH user_day AS (
      SELECT DISTINCT user_id,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
      FROM events
    ),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM user_day),
    wau AS (
      SELECT user_day.d + g.k AS t, count(DISTINCT user_id) AS wau
      FROM user_day, UNNEST(generate_series(0, 6)) AS g(k), bounds b
      WHERE user_day.d + g.k BETWEEN b.lo AND b.hi
      GROUP BY 1
    ),
    dau AS (SELECT d AS t, count(*) AS dau FROM user_day GROUP BY d)
    SELECT dau.t AS day_num, dau.dau, wau.wau,
           round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON dau.t = wau.t
    """,
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users, rolling 7-day active users (WAU ending each
    day), and the DAU/WAU stickiness ratio.

    Scale: the fact table first collapses to DISTINCT (user, day) —
    the only heavy shuffle, map-side combinable. Each user-day then
    fans out to at most 7 window-end days (a 7x explode of the REDUCED
    frame, not the facts) and the per-day COUNT(DISTINCT) runs on
    (day, user) pairs. No window function at all, so nothing needs a
    global sort."""
    e = _t(spark, sf_dir, "events")
    d = F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
    user_day = e.select("user_id", d.alias("d")).distinct()
    bounds = user_day.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    fan = (
        user_day.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("t"),
            "lo",
            "hi",
        )
        .filter((F.col("t") >= F.col("lo")) & (F.col("t") <= F.col("hi")))
    )
    wau = fan.groupBy("t").agg(F.countDistinct("user_id").alias("wau"))
    dau = user_day.groupBy(F.col("d").alias("t")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    return dau.join(wau, "t").select(
        F.col("t").alias("day_num"),
        "dau",
        "wau",
        F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
    )


# ----------------------------------------------------------------------
# ABC / Pareto analysis: revenue concentration by customer decile
# ----------------------------------------------------------------------

@register(
    "pareto_revenue_deciles",
    """
    WITH rev AS (
      SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, cents,
             row_number() OVER (ORDER BY cents DESC, o_custkey) AS rn,
             (SELECT count(*) FROM rev) AS n,
             (SELECT CAST(sum(cents) AS BIGINT) FROM rev) AS total
      FROM rev
    ),
    deciles AS (
      -- explicit floor: DuckDB's double->int CAST rounds, Spark's truncates
      SELECT CAST(floor((rn - 1) * 10 / n) AS BIGINT) + 1 AS decile,
             count(*) AS n_customers,
             CAST(sum(cents) AS BIGINT) AS dec_cents,
             max(total) AS total
      FROM ranked GROUP BY 1
    ),
    cum AS (
      SELECT decile, n_customers, dec_cents, total,
             CAST(sum(dec_cents) OVER (ORDER BY decile) AS BIGINT) AS cum_cents
      FROM deciles
    )
    SELECT decile, n_customers,
           dec_cents / 100.0 AS revenue,
           round(CAST(dec_cents AS DOUBLE) / total, 6) AS share,
           round(CAST(cum_cents AS DOUBLE) / total, 6) AS cum_share
    FROM cum
    """,
)
def pareto_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto concentration: customers ranked by lifetime revenue
    and split into 10 equal-count deciles; each decile's revenue share
    and the cumulative share (the 80/20 curve). Revenue is exact cents
    end-to-end; shares are one double division.

    Scale: the ranking window runs on the POST-AGGREGATION customer
    frame (|customers| rows, not |orders|). At 10^9 customers, swap the
    row_number for the repartitionByRange + partition-offset rank
    (operators/packing.global_running_offset pattern) — the decile math
    is unchanged; the 10-row cumulative window is trivial."""
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    rev = o.groupBy("o_custkey").agg(F.sum(cents).alias("cents"))
    totals = rev.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total")
    )
    w = Window.orderBy(F.col("cents").desc(), F.col("o_custkey"))
    ranked = rev.crossJoin(F.broadcast(totals)).withColumn(
        "rn", F.row_number().over(w)
    )
    deciles = (
        ranked.groupBy(
            F.floor((F.col("rn") - 1) * 10 / F.col("n")).cast("bigint").alias("__dm1")
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").alias("dec_cents"),
            F.max("total").alias("total"),
        )
        .select(
            (F.col("__dm1") + 1).alias("decile"),
            "n_customers",
            "dec_cents",
            "total",
        )
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = deciles.withColumn("cum_cents", F.sum("dec_cents").over(wc))
    return cum.select(
        "decile",
        "n_customers",
        (F.col("dec_cents") / F.lit(100.0)).alias("revenue"),
        F.round(F.col("dec_cents").cast("double") / F.col("total"), 6).alias("share"),
        F.round(F.col("cum_cents").cast("double") / F.col("total"), 6).alias(
            "cum_share"
        ),
    )


# ----------------------------------------------------------------------
# Change detection: tabular CUSUM over hourly means
# ----------------------------------------------------------------------

@register(
    "cusum_changepoints",
    """
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 3600) AS BIGINT) AS h,
             CAST(floor(CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                             AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(v) AS BIGINT) AS s,
             CAST(sum(v * v) AS BIGINT) AS q
      FROM hourly GROUP BY 1
    ),
    dev AS (
      SELECT hourly.event_type, h, v, n, s, q,
             CAST(sum(n * v - s) OVER (PARTITION BY hourly.event_type
                                       ORDER BY h) AS BIGINT) AS cusum
      FROM hourly JOIN stats ON hourly.event_type = stats.event_type
    )
    SELECT event_type, h AS hour_num,
           CAST(cusum AS DOUBLE) / n / 1000000.0 AS cusum_value,
           CASE WHEN cusum > 0 THEN 'up' ELSE 'down' END AS direction
    FROM dev
    WHERE n > 1
      AND abs(CAST(cusum AS DOUBLE)) >
          2.0 * n * sqrt((n * CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s)
                         / (CAST(n AS DOUBLE) * (n - 1)))
    """,
)
def cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tabular CUSUM drift detection on hourly mean value per event
    type: hours where the cumulative deviation from the per-type mean
    exceeds 2 sample-standard-deviations (a sustained level shift, not
    the single-hour spikes events_anomaly_zscore flags).

    Exactness: hourly means are rounded micro-unit integers; the
    n-scaled deviation (n*v - s) keeps the cumulative sum in exact
    bigints, so the only doubles are the identical threshold expression
    on both engines. Scale: the CUSUM window partitions by event_type
    over the HOURLY rollup (|types| x |hours| rows), never the facts;
    per-type moments broadcast back."""
    e = _t(spark, sf_dir, "events")
    h = F.floor(F.unix_timestamp("ts") / F.lit(3600)).cast("bigint")
    yq = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
    hourly = (
        e.groupBy("event_type", h.alias("h"))
        .agg(F.sum(yq).alias("s0"), F.count(F.lit(1)).alias("c0"))
        .select(
            "event_type",
            "h",
            F.floor(F.col("s0").cast("double") / F.col("c0") + F.lit(0.5))
            .cast("bigint")
            .alias("v"),
        )
    )
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("q"),
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dev = hourly.join(F.broadcast(stats), "event_type").withColumn(
        "cusum", F.sum(F.col("n") * F.col("v") - F.col("s")).over(wc)
    )
    sd = F.sqrt(
        (F.col("n") * F.col("q").cast("double") - F.col("s").cast("double") * F.col("s"))
        / (F.col("n").cast("double") * (F.col("n") - 1))
    )
    return (
        dev.filter(
            (F.col("n") > 1)
            & (F.abs(F.col("cusum").cast("double")) > F.lit(2.0) * F.col("n") * sd)
        )
        .select(
            "event_type",
            F.col("h").alias("hour_num"),
            (F.col("cusum").cast("double") / F.col("n") / F.lit(1000000.0)).alias(
                "cusum_value"
            ),
            F.when(F.col("cusum") > 0, "up").otherwise("down").alias("direction"),
        )
    )


# ----------------------------------------------------------------------
# Skyline: 2-D Pareto frontier (minimize price, maximize size)
# ----------------------------------------------------------------------

@register(
    "skyline_parts",
    """
    WITH groups AS (
      SELECT p_retailprice AS price, max(p_size) AS gmax
      FROM part GROUP BY 1
    ),
    run AS (
      SELECT price, gmax,
             max(gmax) OVER (ORDER BY price
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prior_max
      FROM groups
    )
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p JOIN run ON p.p_retailprice = run.price
    WHERE p.p_size = run.gmax
      AND (run.prior_max IS NULL OR run.prior_max < p.p_size)
    """,
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query: parts for which no other part
    is both cheaper-or-equal AND larger-or-equal (strictly better in
    one dimension) — minimize p_retailprice, maximize p_size. Classic
    OLAP operator; equal (price, size) points are mutually
    non-dominated and all kept.

    The 2-D skyline is a sort + running max, not a quadratic dominance
    self-join: collapse to one row per price (max size), scan prices
    ascending keeping the best size seen strictly before — a part
    survives iff it tops its price group and beats every cheaper group.
    Scale: the window runs over DISTINCT prices (tiny); at larger
    cardinality range-partition by price and prefix-merge per-partition
    maxima (same pattern as packing.global_running_offset)."""
    p = _t(spark, sf_dir, "part")
    groups = p.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").alias("gmax")
    )
    w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
    run = groups.withColumn("prior_max", F.max("gmax").over(w))
    return (
        p.join(F.broadcast(run), p.p_retailprice == run.price)
        .filter(
            (F.col("p_size") == F.col("gmax"))
            & (F.col("prior_max").isNull() | (F.col("prior_max") < F.col("p_size")))
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )
