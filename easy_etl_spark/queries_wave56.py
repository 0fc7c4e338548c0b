"""Wave-56 query catalog: 3-itemset mining and day-k return curve.

New operator families:
  - frequent_part_triples size-3 frequent itemsets over order baskets
                          (the next FP-growth level above
                          `frequent_part_pairs` / `association_rules`)
                          via IN-ROW combination expansion of sorted
                          basket arrays — cost Σ C(basket,3), never a
                          3-way corpus join
  - day_k_return_curve    P(user active exactly k days after their
                          first event) for k = 0..29 — the day-offset
                          retention curve growth teams plot under
                          every launch; exact integer counts over one
                          user-keyed first-event join

Hash-safety: all counts exact integers; rates are single divisions
rounded at 6; basket combinations enumerate a deterministic sorted
order on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register
from .session import load_table

# ----------------------------------------------------------------------
# Frequent part triples
# ----------------------------------------------------------------------

TRIPLE_MIN_SUPPORT = 2
TRIPLE_TOP = 50


@register(
    "frequent_part_triples",
    f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_orderkey, a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    triples AS (
      -- each join step carries its own equi-key: the original 3-way
      -- form joined c on a.l_orderkey while filtering on b.l_partkey,
      -- which lets a cost model pick the (b x c) inequality pair first
      -- and degrade to an O(n^2) interval join (observed: DuckDB wedged
      -- 30 cores for 35+ min at sf1; this form runs in ~1 s)
      SELECT p.part_a, p.part_b, c.l_partkey AS part_c
      FROM pairs p
      JOIN items c ON p.l_orderkey = c.l_orderkey AND p.part_b < c.l_partkey
    )
    SELECT part_a, part_b, part_c, count(*) AS n_orders
    FROM triples GROUP BY 1, 2, 3
    HAVING count(*) >= {TRIPLE_MIN_SUPPORT}
    ORDER BY n_orders DESC, part_a, part_b, part_c
    LIMIT {TRIPLE_TOP}
    """,
)
def frequent_part_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-3 frequent itemsets over order baskets, support ≥ 2, top
    50 by (support, lexical) — the level-3 pass of an FP-growth-style
    miner.

    Scale: triples come from IN-ROW expansion of each order's sorted
    distinct-part array (one groupBy + one explode — cost Σ C(b,3)
    with b ≤ 7 in TPC-H-shaped baskets), NOT from the oracle's 3-way
    self-join: the join formulation shuffles the items table three
    times and re-derives the basket per level, where the array form
    pays one shuffle total at any scale."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    # in-row triple expansion over the sorted array: i < j < k
    expr = (
        "flatten(flatten(transform(ps, (x, i) ->"
        " transform(slice(ps, i + 2, size(ps)), (y, j) ->"
        "  transform(slice(ps, i + j + 3, size(ps)), z ->"
        "   struct(x AS part_a, y AS part_b, z AS part_c))))))"
    )
    tri = baskets.select(F.explode(F.expr(expr)).alias("t")).select(
        "t.part_a", "t.part_b", "t.part_c"
    )
    return (
        tri.groupBy("part_a", "part_b", "part_c")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= TRIPLE_MIN_SUPPORT)
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b", "part_c")
        .limit(TRIPLE_TOP)
    )


# ----------------------------------------------------------------------
# Day-k return curve
# ----------------------------------------------------------------------

RETURN_MAX_DAY = 29


@register(
    "day_k_return_curve",
    f"""
    WITH f AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ),
    n AS (SELECT count(*) AS n_users FROM f),
    act AS (
      SELECT DISTINCT e.user_id,
             datediff('day', f.d0, CAST(e.ts AS DATE)) AS k
      FROM events e JOIN f ON f.user_id = e.user_id
    ),
    grid AS (SELECT unnest(range({RETURN_MAX_DAY + 1})) AS k),
    ret AS (
      SELECT k, count(*) AS n_active FROM act
      WHERE k <= {RETURN_MAX_DAY} GROUP BY k
    )
    SELECT CAST(g.k AS BIGINT) AS day_k,
           CAST(coalesce(r.n_active, 0) AS BIGINT) AS n_active,
           round(coalesce(r.n_active, 0) * 1.0 / n.n_users, 6) AS return_rate
    FROM grid g LEFT JOIN ret r ON r.k = g.k CROSS JOIN n
    """,
)
def day_k_return_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic day-k retention: share of users active exactly k days
    after their own first event, k = 0..29 (day_0 is 1.0 by
    definition — a cheap self-check the pytest pins).

    Scale: first-event dates are one groupBy(user); the activity join
    is user-keyed; distinct (user, k) collapses before the 30-row
    curve aggregate."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    f = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    n = f.agg(F.count(F.lit(1)).alias("n_users"))
    act = (
        ev.join(f, "user_id")
        .select("user_id", F.datediff("d", "d0").alias("k"))
        .where(F.col("k") <= RETURN_MAX_DAY)
        .distinct()
    )
    ret = act.groupBy("k").agg(F.count(F.lit(1)).alias("n_active"))
    grid = spark.range(RETURN_MAX_DAY + 1).select(F.col("id").alias("k"))
    return (
        grid.join(ret, "k", "left")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("k").cast("bigint").alias("day_k"),
            F.coalesce("n_active", F.lit(0)).cast("bigint").alias("n_active"),
            F.round(
                F.coalesce("n_active", F.lit(0)) * 1.0 / F.col("n_users"), 6
            ).alias("return_rate"),
        )
    )
