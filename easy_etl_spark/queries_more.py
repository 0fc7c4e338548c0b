"""Second wave of catalog queries: deeper relational coverage
(correlated EXISTS, CUBE, distinct aggs, outer joins, disjunctive
predicate pushdown, scalar-function breadth), the Arrow UDF path, and
the EtlPipeline facade exercised end-to-end inside the correctness
gate.

Registered into the same QUERIES/ORACLES maps (imported from
queries.py at module bottom alongside queries_ext).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .functions.exact import dec_sum, sql_sum
from .queries import register
from .session import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 48)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → left-semi join (Catalyst decorrelates)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 48).select("l_orderkey")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q10_returned_customers",
    f"""
    SELECT c.c_custkey, c.c_name,
           {sql_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: returned-item revenue by customer, top 20."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_share",
    f"""
    SELECT round(100.0 * {sql_sum("CASE WHEN p.p_type = 'ECONOMY' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END", scale=6)}
                 / {sql_sum('l.l_extendedprice * (1 - l.l_discount)', scale=6)}, 4) AS promo_share
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation ratio (Q14 shape) — part broadcasts."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * dec_sum(F.when(F.col("p_type") == "ECONOMY", rev).otherwise(0.0), scale=6)
                / dec_sum(rev, scale=6),
                4,
            ).alias("promo_share")
        )
    )


@register(
    "q18_large_orders",
    f"""
    SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS totalprice, t.sum_qty
    FROM orders o
    JOIN (SELECT l_orderkey, {sql_sum('l_quantity')} AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) > 21000) t
      ON o.o_orderkey = t.l_orderkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: agg-subquery with HAVING joined back to orders."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    big = (
        l.groupBy("l_orderkey")
        .agg(dec_sum("l_quantity").alias("sum_qty"))
        # exact decimal sum makes the HAVING threshold cross-engine
        # stable too (a float sum straddling 210 would flip row counts)
        .filter(F.col("sum_qty") > 210)
    )
    return o.join(big, o.o_orderkey == big.l_orderkey).select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"), "sum_qty"
    )


@register(
    "q19_disjunctive",
    f"""
    SELECT {sql_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunctive mixed-table predicates after a broadcast
    join — Catalyst splits the single-table conjuncts out and pushes
    them below the join."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 40))
    )
    return j.filter(cond).agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


@register(
    "cube_agg",
    f"""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n,
           {sql_sum('o_totalprice')} AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dec_sum("o_totalprice").alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


@register(
    "distinct_agg",
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_suppliers,
           count(DISTINCT l_partkey) AS n_parts,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple distinct aggregates — Spark plans an expand + two-phase
    agg; at scale prefer approx_count_distinct (one pass)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "outer_join_counts",
    f"""
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
           coalesce({sql_sum('o.o_totalprice')}, 0.0) AS total_spend
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def outer_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving order-less customers (count 0)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dec_sum("o_totalprice"), F.lit(0.0)).alias("total_spend"),
        )
    )


@register(
    "scalar_functions",
    """
    SELECT o_orderkey,
           year(o_orderdate)                                  AS yr,
           month(o_orderdate)                                 AS mo,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since,
           abs(o_totalprice - 100000.0)                       AS abs_delta,
           CAST(ceil(o_totalprice / 1000.0) AS BIGINT)        AS price_k_ceil,
           CAST(floor(o_totalprice / 1000.0) AS BIGINT)       AS price_k_floor,
           round(sqrt(o_totalprice), 4)                       AS price_sqrt,
           round(ln(o_totalprice + 1.0), 4)                   AS price_ln,
           substr(o_orderstatus, 1, 1)                        AS status_c,
           concat(o_orderstatus, '-', o_orderpriority)        AS status_prio,
           length(o_orderpriority)                            AS prio_len,
           reverse(o_orderstatus)                             AS status_rev,
           greatest(o_totalprice, 50000.0)                    AS at_least_50k,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END                              AS size_band
    FROM orders
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function breadth (date/math/string/conditional) — the
    delegated SQL surface every extract can use."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).cast("bigint").alias("days_since"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("abs_delta"),
        F.ceil(F.col("o_totalprice") / 1000.0).alias("price_k_ceil"),
        F.floor(F.col("o_totalprice") / 1000.0).alias("price_k_floor"),
        F.round(F.sqrt("o_totalprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("o_totalprice") + 1.0), 4).alias("price_ln"),
        F.substring("o_orderstatus", 1, 1).alias("status_c"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.length("o_orderpriority").alias("prio_len"),
        F.reverse("o_orderstatus").alias("status_rev"),
        F.greatest(F.col("o_totalprice"), F.lit(50000.0)).alias("at_least_50k"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_band"),
    )


@register(
    "udf_pandas_scalar",
    """
    SELECT doc_id, reverse(lower(text)) AS rev_text,
           length(text) % 97 AS len_mod
    FROM documents
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF (the `func` builtin's fast
    path, easy_etl/__init__.py:151-154 → vectorized)."""

    @pandas_udf("string")
    def rev_lower(s: pd.Series) -> pd.Series:
        return s.str.lower().map(lambda x: x[::-1])

    @pandas_udf("long")
    def len_mod(s: pd.Series) -> pd.Series:
        return s.str.len() % 97

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", rev_lower("text").alias("rev_text"), len_mod("text").alias("len_mod"))


@register(
    "middleware_pandas",
    """
    SELECT event_id, event_type, CAST(floor(value / 50.0) AS BIGINT) AS value_bucket
    FROM events
    """,
)
def middleware_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-resultset middleware (O5) through the mapInPandas escape
    hatch: arbitrary Python over Arrow batches, schema change included."""
    from .pipeline import EtlPipeline

    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    pipe = EtlPipeline(spark).extract("SELECT event_id, event_type, value FROM events")

    def bucketize(df: DataFrame) -> DataFrame:
        import math

        def run(batches):
            for pdf in batches:
                pdf["value_bucket"] = pdf["value"].map(lambda v: math.floor(v / 50.0))
                yield pdf[["event_id", "event_type", "value_bucket"]]

        return df.mapInPandas(run, "event_id bigint, event_type string, value_bucket bigint")

    pipe.middleware(bucketize)
    return pipe.dataframe()


@register(
    "pipeline_end_to_end",
    """
    WITH dim AS (
      SELECT row_number() OVER (ORDER BY n_nationkey) AS id, n_nationkey FROM nation
    )
    SELECT c.c_custkey,
           upper(replace(c.c_name, 'Customer#', 'C-')) AS c_name,
           d.id AS nation_id
    FROM customer c LEFT JOIN dim d ON c.c_nationkey = d.n_nationkey
    """,
)
def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EtlPipeline facade itself inside the correctness gate:
    extract → chained transforms → link → ignore, compiled to one
    lineage."""
    from .operators.links import with_surrogate_id
    from .pipeline import EtlPipeline

    for t in ("customer", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    pipe = EtlPipeline(spark).extract(
        "SELECT c_custkey, c_name, c_mktsegment, c_nationkey FROM customer"
    )
    pipe.transform("c_name").replace("Customer#", "C-").upper()
    dim = with_surrogate_id(spark.table("nation"), "n_nationkey")
    pipe.link("c_nationkey", dim, "n_nationkey", name="nation_id")
    pipe.ignore("c_mktsegment")
    return pipe.dataframe().select("c_custkey", "c_name", "nation_id")


@register("sketch_distinct_users")  # rows-only: sketch estimates have no exact oracle
def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct counting, the 100 TB cardinality path:
    approx_count_distinct (HyperLogLog++, one mergeable partial-agg
    pass — no shuffle of distinct values) plus a DataSketches HLL
    sketch column (hll_sketch_agg) whose binary sketches can be merged
    across partitions/days (hll_union_agg) without re-scanning. The
    error-bound contract vs exact is pinned in
    tests/test_scale_stateful.py."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").alias("hll_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@register("sketch_quantiles_theta")  # rows-only: sketch estimates
def sketch_quantiles_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch quantiles + distinct counts (DataSketches KLL /
    theta): the one-pass, partial-aggregable versions of
    percentile/countDistinct. At 100 TB these are the only viable
    forms — sketches merge across partitions, days, and tables without
    re-scanning raw data (unlike exact percentile, which must shuffle
    every value). Error bounds vs exact are pinned in
    tests/test_scale_stateful.py."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.expr(
                "kll_sketch_get_quantile_double(kll_sketch_agg_double(l_extendedprice), 0.5)"
            ).alias("p50_est"),
            F.expr(
                "kll_sketch_get_quantile_double(kll_sketch_agg_double(l_extendedprice), 0.95)"
            ).alias("p95_est"),
            F.expr("theta_sketch_estimate(theta_sketch_agg(l_orderkey))").alias("orders_est"),
        )
        .orderBy("l_returnflag")
    )
