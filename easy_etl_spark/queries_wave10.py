"""Wave-10 query catalog: graph traversal and join-skew diagnostics.

New operator families:
  - bfs_hop_histogram      bounded BFS hop distances (Pregel frontier
                           loop; DuckDB replays via recursive CTE)
  - join_key_skew_profile  hot-key diagnostics ahead of a salted join

Hash-safety follows the catalog conventions (queries.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.graph import bfs_hops
from .queries import register
from .session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _basket_pairs_per_order(li: DataFrame) -> DataFrame:
    """One row per (order, part pair a < b) co-appearing in that order,
    via IN-ROW pair expansion of each order's sorted distinct-part
    array (the same shape as frequent_part_triples' level-3 expansion)
    instead of an items self-join — one map-side-combinable basket
    shuffle + explode replaces two scans plus an order-keyed join,
    halving shuffle volume; output verified bit-identical to the join
    form, ~30% faster at sf1 (BASELINE.md round 8). Support counters
    (frequent_part_pairs, association_rules) aggregate this directly;
    graph builders go through _basket_pair_edges/_copurchase_edges."""
    baskets = li.select("l_orderkey", "l_partkey").groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    return baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) ->"
                " transform(slice(ps, i + 2, size(ps)), y ->"
                "  struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select("p.a", "p.b")


def _basket_pair_edges(li: DataFrame) -> DataFrame:
    """Distinct (a < b) part pairs co-appearing in at least one order
    (see _basket_pairs_per_order)."""
    return _basket_pairs_per_order(li).distinct()


def _copurchase_edges(li: DataFrame) -> DataFrame:
    """Undirected co-purchase edges (both directions) between parts
    appearing in the same order (see _basket_pair_edges)."""
    pairs = _basket_pair_edges(li)
    return pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


@register(
    "bfs_hop_histogram",
    """
    WITH RECURSIVE
    li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM li l1 JOIN li l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    edges AS (
      SELECT a AS src, b AS dst FROM e0
      UNION SELECT b AS src, a AS dst FROM e0
    ),
    walk AS (
      SELECT (SELECT min(src) FROM edges) AS v, 0 AS d
      UNION
      SELECT e.dst AS v, w.d + 1 AS d
      FROM walk w JOIN edges e ON w.v = e.src
      WHERE w.d < 4
    ),
    dist AS (SELECT v, min(d) AS d FROM walk GROUP BY v)
    SELECT CAST(d AS BIGINT) AS hops, count(*) AS n_nodes
    FROM dist GROUP BY d
    """,
)
def bfs_hop_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-distance histogram of a bounded BFS (4 hops) from the
    smallest part id over the co-purchase graph — the traversal
    primitive behind reachability, ego networks, and influence radius.

    Scale: each round is one edge-list join keyed by node id plus a
    min-aggregate (Pregel-on-relational, same layout as pagerank);
    lineage is cut per round with localCheckpoint and the loop exits
    as soon as the frontier stops growing. The DuckDB oracle replays
    the identical bounded walk as a recursive CTE."""
    li = _t(spark, sf_dir, "lineitem")
    # Persist the self-join-derived edge list once: the source-pick
    # aggregate below and every BFS round inside bfs_hops re-read it
    # (bfs_hops re-persists the same frame — a no-op — and drops the
    # cache when its loop ends; dist is checkpointed, so the returned
    # histogram never re-reads edges).
    edges = _copurchase_edges(li).persist()
    try:
        source = edges.agg(F.min("src")).first()[0]
        dist = bfs_hops(edges, source, max_hops=4)
    finally:
        edges.unpersist()
    return dist.groupBy(F.col("d").alias("hops")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )


@register(
    "join_key_skew_profile",
    """
    WITH k AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1),
    t AS (SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS total FROM k)
    SELECT o_custkey, n,
           round(CAST(n AS DOUBLE) / total, 6) AS share,
           round(CAST(n AS DOUBLE) * n_keys / total, 4) AS skew_factor
    FROM k, t ORDER BY n DESC, o_custkey LIMIT 10
    """,
)
def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics: the 10 hottest o_custkey values with
    their row share and skew factor (multiple of the mean key load) —
    what you run BEFORE deciding whether a join needs salting
    (operators/scale.salted_join) or AQE's skew split.

    Scale: per-key counts are one map-side-combined aggregate; the
    top-10 is TakeOrderedAndProject (per-partition heaps merged on the
    driver — no global sort, no single-partition window)."""
    o = _t(spark, sf_dir, "orders")
    k = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    t = k.agg(
        F.count(F.lit(1)).alias("n_keys"), F.sum("n").alias("total")
    )
    return (
        k.crossJoin(F.broadcast(t))
        .select(
            "o_custkey",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
            F.round(
                F.col("n").cast("double") * F.col("n_keys") / F.col("total"), 4
            ).alias("skew_factor"),
        )
        .orderBy(F.col("n").desc(), "o_custkey")
        .limit(10)
    )
