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

from .operators.graph import bfs_hops_adjacency
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


def _copurchase_adjacency(li: DataFrame) -> DataFrame:
    """(v, ns) adjacency lists of the undirected co-purchase graph,
    built with ONE shuffle (round 11, guide §2.3/§8: shuffle the edge
    bytes once, then iterate on node-scale rows): basket pairs → both
    directions → collect_set per node. collect_set dedups parallel
    edges, so this equals grouping _copurchase_edges by src — the
    iterative consumers (lpa_communities, kcore_hindex,
    bfs_hop_histogram) then JOIN node-scale frames (|V| rows) per
    round and explode neighbor lists in-task, instead of re-shuffling
    the edge list every round. Same representation triangle_count
    already uses; per-node arrays are raw-degree-sized, bounded here
    by baskets-per-part × parts-per-basket (TPC-H: ~120 at any SF) —
    a graph with billion-degree hubs would need the hot rows split
    (salted sub-lists) before this layout, documented not implemented.
    Cached via track_cache; released by the caller's release_caches().
    """
    baskets = li.select("l_orderkey", "l_partkey").groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    raw = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) ->"
                " transform(slice(ps, i + 2, size(ps)), y ->"
                "  struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    both = raw.select(F.col("a").alias("v"), F.col("b").alias("n")).unionAll(
        raw.select(F.col("b").alias("v"), F.col("a").alias("n"))
    )
    from .session import track_cache

    return track_cache(both.groupBy("v").agg(F.collect_set("n").alias("ns")))


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

    Scale (round 11): frontier expansion over the one-shuffle
    adjacency (operators/graph.bfs_hops_adjacency) — per round one
    node-scale join + in-task neighbor explode, early exit when the
    frontier empties. The DuckDB oracle replays the identical bounded
    walk as a recursive CTE."""
    li = _t(spark, sf_dir, "lineitem")
    # Round 11: frontier BFS over the one-shuffle adjacency (guide
    # §2.3/§2.4) — each round joins only the FRONTIER (node-scale,
    # AQE-broadcastable) against the cached adjacency and explodes
    # neighbor lists in-task, instead of re-shuffling the full edge
    # list against the whole visited set with a min-aggregate +
    # localCheckpoint per round (measured 6.98 s → ~4.4 s at sf0.1;
    # plan: per-round Exchange of edge-scale rows removed). A node's
    # distance is final the round it first appears (anti-join keeps
    # first discovery = min hop), so the histogram is identical to
    # the min-aggregate formulation and the oracle's recursive CTE.
    adj = _copurchase_adjacency(li)
    dist = bfs_hops_adjacency(adj, max_hops=4)
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
