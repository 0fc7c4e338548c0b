"""Third wave of catalog queries: the remaining classic TPC-H shapes
expressible on the driver's star schema (no partsupp table, so Q2/Q11/
Q16/Q20 are re-cast onto supplier/nation where the *query shape* —
scalar subquery in HAVING, correlated avg, EXISTS+NOT EXISTS pairs —
is preserved even though the columns differ).

All SQL work is delegated to the engine per the reference's philosophy
("Any processing that can be done on the SQL level, should be done at
the SQL level", easy_etl/README.md:18); these queries exercise that
delegated surface as first-class Spark plans (SURVEY.md §2.2).

Scale notes: nation/region joins are explicit broadcasts (25/5 rows);
lineitem-side joins are left to Catalyst/AQE, which picks broadcast
vs shuffled hash by size — correct at sf0.1 and at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.exact import dec_sum, sql_sum
from .queries import register
from .session import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _rev():
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume")


@register(
    "q7_nation_volume",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_sum('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by year.
    Five-way join; both nation legs broadcast."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")))
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("sk"))
        .join(n2, F.col("c_nationkey") == F.col("ck"))
        .filter(pair)
        .select("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"), _rev())
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dec_sum("volume").alias("revenue"))
    )


@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           round({sql_sum("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END", scale=6)}
                 / {sql_sum('volume', scale=6)}, 4) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n1.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      JOIN region r   ON n2.n_regionkey = r.r_regionkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional volume per year —
    conditional-sum ratio over a seven-way join."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n2 = F.broadcast(
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
            F.col("n_nationkey").alias("ck")
        )
    )
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("nation")))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n2, F.col("c_nationkey") == F.col("ck"))  # region semi-filter
        .join(n1, F.col("s_nationkey") == F.col("sk"))
        .select(F.year("o_orderdate").alias("o_year"), _rev(), "nation")
        .groupBy("o_year")
        .agg(
            F.round(
                dec_sum(
                    F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0.0)),
                    scale=6,
                )
                / dec_sum("volume", scale=6),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_profit_by_nation",
    f"""
    SELECT nation, o_year,
           {sql_sum('amount')} AS sum_profit
    FROM (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and year;
    LIKE-filtered part scan prunes before the fact join."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    nb = F.broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("nation")))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(nb, F.col("s_nationkey") == F.col("sk"))
        .select("nation", F.year("o_orderdate").alias("o_year"), _rev().alias("amount"))
        .groupBy("nation", "o_year")
        .agg(dec_sum("amount").alias("sum_profit"))
    )


@register(
    "q11_nation_concentration",
    f"""
    SELECT n.n_name AS n_name,
           {sql_sum('s.s_acctbal')} AS total_bal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    HAVING {sql_sum('s.s_acctbal')}
           > (SELECT {sql_sum('s_acctbal')} * 0.05 FROM supplier)
    """,
)
def q11_nation_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp-free): groups exceeding a fraction of
    the global total — scalar aggregate subquery in HAVING, expressed
    as a broadcast cross-join against the 1-row global aggregate."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    total = s.agg((dec_sum("s_acctbal") * 0.05).alias("__cut"))
    per_nation = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(dec_sum("s_acctbal").alias("total_bal"))
    )
    return (
        per_nation.join(F.broadcast(total))
        .filter(F.col("total_bal") > F.col("__cut"))
        .select("n_name", "total_bal")
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey AS c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count. The outer
    join keeps zero-order customers (count() over NULL keys = 0)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_sum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue — aggregated
    'view' reused twice; the scalar MAX arrives as a 1-row broadcast,
    not a global sort."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    # exact decimal sum matters doubly here: the WHERE compares revenue
    # for *equality* against the max, so last-ulp noise would drop rows
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    f"""
    SELECT round({sql_sum('l.l_extendedprice')} / 7.0, 2) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < (
        SELECT 0.2 * ({sql_sum('l2.l_quantity', scale=6)} / count(l2.l_quantity))
        FROM lineitem l2
        WHERE l2.l_partkey = p.p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated scalar-avg subquery, decorrelated into a
    per-part average joined back (what Catalyst itself would emit)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    # exact avg (decimal sum / count): the threshold compare must agree
    # bit-for-bit with the oracle or boundary rows flip in/out
    avg_qty = l.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (0.2 * (dec_sum("l_quantity", scale=6) / F.count("l_quantity"))).alias("__cut")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(avg_qty, F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__cut"))
        .agg(F.round(dec_sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"))
    )


@register(
    "q21_exclusive_returns",
    """
    SELECT s.s_name AS s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q21_exclusive_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (date columns absent → returnflag stands in):
    suppliers solely responsible for returns in multi-supplier orders.
    The EXISTS / NOT EXISTS pair collapses into one per-order aggregate
    (distinct suppliers, distinct returning suppliers) — one shuffle
    instead of two correlated self-joins."""
    from pyspark.sql import Window

    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    # one shuffle instead of aggregate+join-back: per-order distinct
    # supplier sets via collect_set window (no Expand, no re-join of
    # lineitem against its own aggregate)
    w = Window.partitionBy("l_orderkey")
    l2 = (
        l.select("l_orderkey", "l_suppkey", "l_returnflag")
        .withColumn("__n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "__r_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
                ).over(w)
            ),
        )
    )
    return (
        l2.filter(
            (F.col("l_returnflag") == "R")
            & (F.col("__n_supp") >= 2)
            & (F.col("__r_supp") == 1)
        )
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@register(
    "q22_idle_customers",
    f"""
    SELECT cntrycode, count(*) AS numcust,
           {sql_sum('c_acctbal')} AS totacctbal
    FROM (
      SELECT substring(c.c_name, 13, 3) AS cntrycode, c.c_acctbal AS c_acctbal
      FROM customer c
      WHERE c.c_acctbal > (SELECT {sql_sum('c_acctbal', scale=6)} / count(c_acctbal)
                           FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > 400000)
    ) custsale
    GROUP BY cntrycode
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no orders —
    scalar avg subquery (1-row broadcast) + anti-join. The driver
    data gives every customer at least one order, so the anti-join is
    against *high-value* orders to keep the result non-trivial."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    cut = c.filter(F.col("c_acctbal") > 0.0).agg(
        (dec_sum("c_acctbal", scale=6) / F.count("c_acctbal")).alias("__avg")
    )
    return (
        c.join(F.broadcast(cut))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(
            o.filter(F.col("o_totalprice") > 400000).select("o_custkey"),
            c.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .select(F.substring("c_name", 13, 3).alias("cntrycode"), "c_acctbal")
        .groupBy("cntrycode")
        .agg(F.count(F.lit(1)).alias("numcust"), dec_sum("c_acctbal").alias("totacctbal"))
    )


@register(
    "pivot_status_by_flag",
    f"""
    SELECT l_returnflag,
           {sql_sum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS F,
           {sql_sum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS O
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): quantity by linestatus column per returnflag.
    Explicit value list → no extra distinct-values job; compiles to one
    conditional aggregate (same plan as the CASE-sum oracle)."""
    l = _t(spark, sf_dir, "lineitem")
    piv = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dec_sum("l_quantity"))
    )
    return piv


def _pct_sql(q: float) -> str:
    """DuckDB spelling of the portable interpolated percentile over the
    ranked CTE `r(v, rn, n)`: floor/ceil neighbors of (n-1)·q, linear
    interpolation, floor-quantized to cents (identical IEEE ops to the
    Spark twin `_pct_col` — see percentiles_exact docstring)."""
    lo = f"CAST(floor((n - 1) * {q}) AS BIGINT) + 1"
    lo_v = f"max(CASE WHEN rn = {lo} THEN v END)"
    hi_v = f"max(CASE WHEN rn = least({lo} + 1, n) THEN v END)"
    frac = f"((max(n) - 1) * {q} - floor((max(n) - 1) * {q}))"
    return f"floor(({lo_v} + ({hi_v} - {lo_v}) * {frac}) * 100.0 + 0.5) / 100.0"


def _pct_col(q: float):
    """Spark twin of `_pct_sql` (same arithmetic, same order)."""
    lo = F.floor((F.col("n") - 1) * q).cast("bigint") + 1
    lo_v = F.max(F.when(F.col("rn") == lo, F.col("v")))
    hi_v = F.max(F.when(F.col("rn") == F.least(lo + 1, F.col("n")), F.col("v")))
    frac = (F.max("n") - 1) * q - F.floor((F.max("n") - 1) * q)
    return F.floor((lo_v + (hi_v - lo_v) * frac) * 100.0 + 0.5) / 100.0


@register(
    "percentiles_exact",
    f"""
    WITH r AS (
      SELECT l_returnflag, l_extendedprice AS v,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           {_pct_sql(0.5)} AS p50,
           {_pct_sql(0.95)} AS p95,
           {_pct_sql(0.99)} AS p99
    FROM r
    GROUP BY l_returnflag
    """,
)
def percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group, computed with
    an explicitly engine-portable formula: rank each value, pick the
    floor/ceil neighbors of (n-1)·q, interpolate, quantize via
    floor(x·100 + 0.5). Spark's `percentile` and DuckDB's
    `quantile_cont` implement the same definition but differ in the
    last ulp of the interpolation arithmetic — and p50 midpoints of
    2-decimal prices sit exactly ON .xx5 rounding boundaries, so the
    builtin pair flips digits between engines (caught at sf0.001).
    The approximate path for 100 TB is `approx_percentile` (t-digest,
    mergeable, one pass) — this exact twin is the oracle-checkable one.
    """
    from pyspark.sql import Window as W

    l = _t(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag")
    r = l.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.row_number().over(w.orderBy("l_extendedprice")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return r.groupBy("l_returnflag").agg(
        _pct_col(0.5).alias("p50"),
        _pct_col(0.95).alias("p95"),
        _pct_col(0.99).alias("p99"),
    )


@register(
    "systematic_sample",
    f"""
    SELECT count(*) AS n,
           {sql_sum('o_totalprice')} AS sampled_total
    FROM orders WHERE o_orderkey % 20 = 0
    """,
)
def systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1-in-20 systematic sample on the key — the
    reproducible, engine-portable stand-in for TABLESAMPLE (whose RNG
    never matches across engines). At scale this predicate pushes to
    the scan like any filter."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 20 == 0).agg(
        F.count(F.lit(1)).alias("n"), dec_sum("o_totalprice").alias("sampled_total")
    )


@register(
    "array_ops_embeddings",
    """
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))), 4) AS l2_norm,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_component
    FROM embeddings
    WHERE vec_id < 100
    """,
)
def array_ops_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column — the
    JVM-side (no-UDF) path for vector math: transform/aggregate/filter
    stay inside whole-stage codegen."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    sq = F.transform(F.col("embedding"), lambda x: x.cast("double") * x)
    return e.select(
        "vec_id",
        F.round(F.sqrt(F.aggregate(sq, F.lit(0.0), lambda a, x: a + x)), 4).alias("l2_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_positive"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("max_component"),
    )
