"""Wave-23 query catalog: item-item recommendations.

New operator family:
  - item_recommendations   "customers also bought": top-3 similar
                           parts per popular part by co-occurrence
                           cosine (the serving-side output the
                           association-rule miner feeds)

Hash-safety follows the catalog conventions (queries.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import register
from .session import load_table


@register(
    "item_recommendations",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pop AS (SELECT l_partkey AS p, count(*) AS n FROM li GROUP BY 1),
    anchors AS (
      SELECT p, n FROM (
        SELECT p, n, row_number() OVER (ORDER BY n DESC, p) AS r FROM pop
      ) WHERE r <= 20
    ),
    co AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS nab
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT co.pa AS part, co.pb AS rec, co.nab,
             CAST(floor(co.nab / sqrt(CAST(anchors.n AS DOUBLE) * pop.n)
                        * 1000000 + 0.5) AS BIGINT) AS cosine_units
      FROM co
      JOIN anchors ON anchors.p = co.pa
      JOIN pop ON pop.p = co.pb
    )
    SELECT part, rec, nab, cosine_units, CAST(rnk AS BIGINT) AS rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY part
                                   ORDER BY cosine_units DESC, rec) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
)
def item_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Customers also bought": for the 20 most-purchased parts, the 3
    most-similar parts by co-occurrence cosine n_ab/sqrt(n_a*n_b) —
    the serving-side recommendation list that association_rules'
    confidence/lift mining feeds. The cosine quantizes to exact
    micro-units BEFORE ranking, so the top-3 (ties by part id) is
    engine-portable.

    Scale: co-occurrence pairs come from the order-keyed self-join
    (bounded by items-per-basket, never all parts x parts); anchor
    parts and popularity counts broadcast; the top-3 window partitions
    by the anchor part."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    pop = li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # anchor selection is a TakeOrderedAndProject (distributed
    # per-partition top-20 + tiny driver merge), NOT an unpartitioned
    # rank window — the same swap priority_sample got: a global-window
    # row_number here would funnel every part through one task
    anchors = pop.orderBy(F.col("n").desc(), "p").limit(20).select("p", "n")
    # co-occurrence counts from the in-row basket expansion (one row
    # per order-pair, both orientations via the swapped union) instead
    # of an items self-join — see queries_wave10._basket_pairs_per_order
    from .queries_wave10 import _basket_pairs_per_order

    up = _basket_pairs_per_order(li)
    co = (
        up.select(F.col("a").alias("pa"), F.col("b").alias("pb"))
        .unionAll(up.select(F.col("b").alias("pa"), F.col("a").alias("pb")))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("nab"))
    )
    an = anchors.select(F.col("p").alias("pa"), F.col("n").alias("na"))
    pb = pop.select(F.col("p").alias("pb"), F.col("n").alias("nb"))
    scored = (
        co.join(F.broadcast(an), "pa")
        .join(F.broadcast(pb), "pb")
        .select(
            F.col("pa").alias("part"),
            F.col("pb").alias("rec"),
            "nab",
            F.floor(
                F.col("nab")
                / F.sqrt(F.col("na").cast("double") * F.col("nb"))
                * 1000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("cosine_units"),
        )
    )
    w = Window.partitionBy("part").orderBy(F.col("cosine_units").desc(), "rec")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("part", "rec", "nab", "cosine_units", "rnk")
    )
