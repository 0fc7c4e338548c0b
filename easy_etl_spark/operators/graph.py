"""Graph algorithms over edge DataFrames: PageRank (the second graph
op next to dedup.duplicate_clusters' connected components).

Determinism design: ranks are carried as INTEGER units of 1e-15 —
per-edge contributions use integer division by out-degree, damping is
the exact rational 17/20, and every aggregation is an integer sum, so
the result is bit-identical under any partitioning AND engine (a
float PageRank drifts in the 12th digit per accumulation order, which
a value-hash gate would flag). Dangling-node mass is dropped (the
simplified textbook variant), documented rather than redistributed.

Scale shape: each iteration is one join of the edge list with the
current ranks (shuffle keyed by src) plus one dst-keyed aggregate —
the standard Pregel-on-relational layout. Iterations unroll into the
lineage; for tens of iterations insert localCheckpoint like
duplicate_clusters does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rank unit = 1e-15 of total mass
UNIT = 10**15


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Integer-unit PageRank with damping 0.85 (= 17/20 exactly).

    ``nodes``: one row per vertex (isolated vertices included);
    ``edges``: distinct directed (src, dst). Returns (node, rank_units)
    where rank_units ≈ rank · 1e15.
    """
    n = nodes.count()
    r0 = UNIT // n
    base = (3 * UNIT) // (20 * n)  # (1 - 17/20) / n in units

    deg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("__deg"))
    ranks = nodes.select(F.col(node_col)).withColumn("rank_units", F.lit(r0))
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges[src_col] == ranks[node_col])
            .join(deg, src_col)
            .select(
                F.col(dst_col).alias("__dst"),
                F.expr("rank_units div __deg").alias("__c"),
            )
        )
        incoming = contrib.groupBy("__dst").agg(F.sum("__c").alias("__m"))
        ranks = (
            nodes.select(F.col(node_col))
            .join(incoming, F.col(node_col) == F.col("__dst"), "left")
            .select(
                node_col,
                (
                    F.lit(base)
                    + F.expr("17 * coalesce(__m, 0L) div 20")
                ).alias("rank_units"),
            )
        )
    return ranks
