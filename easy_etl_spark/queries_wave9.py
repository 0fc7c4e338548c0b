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
from .operators.ranking import global_prior_max, global_row_number
from .session import load_table, track_cache


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
    wedge fan-out is bounded by OUT-degree, O(sqrt(m)) per node instead
    of the raw degree (the difference between hours and seconds on
    power-law graphs).

    Shape: basket-style pair generation (per-order sorted item array,
    in-row pair expansion), ONE-shuffle undirected-adjacency build
    (collect_set per node = edge dedup + neighbor lists + degrees in a
    single aggregation), and the EDGE-ITERATOR close — per oriented
    edge (u,w), |N+(u) ∩ N+(w)| on sorted out-adjacency arrays — so
    the wedge set (Σ outdeg²; 148M pre-oriented wedges on the sf0.1
    graph) never materializes or shuffles. vs the round-3 self-join +
    wedge-join formulation: 11.7 s → 7.7 s cold, ~2.6 s warm at sf0.1
    (same counts bit-for-bit), and at cluster scale it removes the one
    shuffle that grows quadratically with degree — the difference
    between a dense co-occurrence graph job that finishes and one that
    doesn't. The degree join carries NO broadcast hint on purpose: the
    degree table is node-count-sized, and a forced broadcast would OOM
    the driver on a billion-node graph — AQE picks broadcast when it
    is actually small."""
    _PAIRS = (
        "flatten(transform({c}, (x, i) -> "
        "transform(slice({c}, i + 2, size({c})), y -> struct(x AS a, y AS b))))"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    raw = baskets.select(F.explode(F.expr(_PAIRS.format(c="ps"))).alias("e")).select(
        "e.a", "e.b"
    )
    # ONE shuffle builds the undirected adjacency: emit both directions
    # and collect_set per node — edge dedup, neighbor lists, and
    # degrees (= list size) all come out of the same aggregation, where
    # the join formulation needed distinct + a separate degree shuffle
    both = raw.select(F.col("a").alias("v"), F.col("b").alias("n")).unionAll(
        raw.select(F.col("b").alias("v"), F.col("a").alias("n"))
    )
    adj0 = track_cache(both.groupBy("v").agg(F.collect_set("n").alias("ns")))
    deg = adj0.select("v", F.size("ns").alias("d"))
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum("d") / 2).cast("bigint").alias("n_edges"),
        F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("bigint")).alias("w"),
    )
    # orientation: explode each node's list, keep only (degree, id)-
    # larger neighbors, regroup to the sorted OUT-adjacency. The degree
    # side is node-count-sized with no broadcast hint — AQE broadcasts
    # it when small and shuffle-joins on a billion-node graph
    ex = adj0.select("v", F.size("ns").alias("dv"), F.explode("ns").alias("n"))
    exd = ex.join(deg.select(F.col("v").alias("n"), F.col("d").alias("dn")), "n")
    keep = exd.filter(
        (F.col("dv") < F.col("dn"))
        | ((F.col("dv") == F.col("dn")) & (F.col("v") < F.col("n")))
    )
    adj_o = keep.groupBy("v").agg(F.array_sort(F.collect_set("n")).alias("ds"))
    # edge-iterator close: per oriented edge (u,w), triangles counted
    # at their orientation-minimal apex = |N+(u) ∩ N+(w)| on the sorted
    # out-adjacency arrays — the wedge set never materializes or
    # shuffles; the intersection is per-row CPU inside one stage.
    # The adjacency side carries a shuffle_hash hint: it is node-count
    # rows × O(sqrt(m)) arrays, and AQE's sizeInBytes for nested-array
    # aggregates underestimates badly enough that it elected to
    # BROADCAST it at the 25× local rung — driver OOM (observed), and
    # on a real cluster the same. Shuffled-hash keeps it executor-side
    # at every scale; per-key adjacency lists make the hash build cheap.
    eo = adj_o.select("v", F.col("ds").alias("du"), F.explode("ds").alias("w"))
    closed = eo.join(
        adj_o.select(F.col("v").alias("w"), F.col("ds").alias("dw")).hint(
            "shuffle_hash"
        ),
        "w",
        "left",
    ).select(
        F.when(F.col("dw").isNull(), F.lit(0))
        .otherwise(F.size(F.array_intersect("du", "dw")))
        .alias("t")
    )
    tri = closed.agg(
        F.coalesce(F.sum("t"), F.lit(0)).cast("bigint").alias("n_triangles")
    )
    return tri.crossJoin(F.broadcast(stats)).select(
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

    Scale: the ranking runs on the POST-AGGREGATION customer frame
    (|customers| rows, not |orders|) through the BANDED global
    row_number (operators/ranking.py — range-partition on the rank
    key, per-partition row_number, broadcast prefix offsets), so a
    10^9-customer frame never funnels through one task. The 10-row
    decile cumulative is a broadcast triangular self-join — no global
    window anywhere in the plan."""
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    rev = o.groupBy("o_custkey").agg(F.sum(cents).alias("cents"))
    totals = rev.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total")
    )
    ranked = global_row_number(
        rev, [F.col("cents").desc(), F.col("o_custkey")], out_col="rn"
    ).crossJoin(F.broadcast(totals))
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
    # 10-row cumulative share: broadcast triangular self-join instead
    # of a global ORDER BY window (the frame is 10 rows, but the plan
    # shape must stay single-partition-free for the catalog gate and
    # for composition into larger plans)
    a, b = deciles.alias("a"), deciles.alias("b")
    cum = (
        a.join(F.broadcast(b), F.col("b.decile") <= F.col("a.decile"))
        .groupBy(F.col("a.decile").alias("decile"))
        .agg(
            F.max(F.col("a.n_customers")).alias("n_customers"),
            F.max(F.col("a.dec_cents")).alias("dec_cents"),
            F.max(F.col("a.total")).alias("total"),
            F.sum(F.col("b.dec_cents")).alias("cum_cents"),
        )
    )
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
    Scale: the exclusive running max is the BANDED global_prior_max
    (operators/ranking.py) — range-partition by price, per-partition
    exclusive max window, driver prefix-merge of the numPartitions
    per-partition maxima — so the price frame never collapses onto one
    task at any cardinality."""
    p = _t(spark, sf_dir, "part")
    groups = p.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").alias("gmax")
    )
    run = global_prior_max(
        groups, "gmax", [F.col("price")], out_col="prior_max"
    )
    return (
        p.join(F.broadcast(run), p.p_retailprice == run.price)
        .filter(
            (F.col("p_size") == F.col("gmax"))
            & (F.col("prior_max").isNull() | (F.col("prior_max") < F.col("p_size")))
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )
