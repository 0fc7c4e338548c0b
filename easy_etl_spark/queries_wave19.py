"""Wave-19 query catalog: native recursive SQL.

New operator family:
  - recursive_org_rollup   hierarchy traversal with Spark 4's native
                           WITH RECURSIVE (same SQL shape on both
                           engines — no DataFrame loop needed)

The earlier iterative operators (dedup_clusters, bfs_hops, pagerank)
predate usable recursion and keep their explicit Pregel-style loops —
the right shape when you need checkpointing/convergence control; this
query covers the OTHER idiom: letting the engine run the fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .queries import register
from .session import load_table, track_cache


@register(
    "recursive_org_rollup",
    """
    WITH RECURSIVE org AS (
      SELECT CAST(1 AS BIGINT) AS k, CAST(0 AS BIGINT) AS depth,
             (SELECT c_acctbal FROM customer WHERE c_custkey = 1) AS bal
      UNION ALL
      SELECT c.c_custkey, o.depth + 1, c.c_acctbal
      FROM org o JOIN customer c
        ON c.c_custkey = 2 * o.k OR c.c_custkey = 2 * o.k + 1
    )
    SELECT depth, count(*) AS n,
           CAST(sum(CAST(floor(bal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM org GROUP BY depth
    """,
)
def recursive_org_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy traversal with the engine's NATIVE recursive CTE
    (Spark 4's WITH RECURSIVE): customers form an implicit binary org
    tree (parent of k = k div 2), and the recursion descends from the
    root collecting per-depth headcount and account-balance cents —
    the org-chart / BOM-rollup query shape that previously required a
    driver-side loop. The DuckDB oracle runs an independently-phrased
    recursive SQL (OR-join step) over the same tree.

    Scale: the recursive step EXPLODES each frontier node into its two
    child keys and equi-joins them against the customer dim — a hash
    join per level, never a nested-loop scan. (The naive phrasing
    `ON c_custkey = 2*k OR c_custkey = 2*k+1` is a non-equi predicate
    that Spark must plan as a broadcast nested-loop join each level —
    measured 15.7x slower at sf1: 157 s vs 10 s for this form.) The
    engine materializes level by level exactly like the hand-written
    Pregel loops (graph.bfs_hops) but plans/reuses it internally;
    depth is log2(|customers|), so ~30 levels even at billions of
    rows. The (c_custkey, c_acctbal) PROJECTION of the dim rides
    track_cache (round 11, guide §5): every recursion level hash-joins
    against it, so without the cache a depth-d tree re-reads and
    re-decodes the parquet d times — released by the caller's
    release_caches. The cache is the pruned projection under a scoped
    view name, NOT the verbatim base table under "customer": caching
    the raw load_table made Spark's CacheManager substitute the
    InMemoryRelation into EVERY later customer scan in the session
    (q3's c_mktsegment pushdown vanished — caught by the full-suite
    plan gate), and re-registering "customer" stomped the session
    view."""
    track_cache(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ).createOrReplaceTempView("__org_customer_r11")
    df = spark.sql(
        """
        WITH RECURSIVE org AS (
          SELECT CAST(1 AS BIGINT) AS k, CAST(0 AS BIGINT) AS depth,
                 (SELECT c_acctbal FROM __org_customer_r11
                  WHERE c_custkey = 1) AS bal
          UNION ALL
          SELECT c.c_custkey, f.depth + 1, c.c_acctbal
          FROM (SELECT explode(array(2 * k, 2 * k + 1)) AS child, depth
                FROM org) f
          JOIN __org_customer_r11 c ON c.c_custkey = f.child
        )
        SELECT depth, count(*) AS n,
               CAST(sum(CAST(floor(bal * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS bal_cents
        FROM org GROUP BY depth
        """
    )
    # spark.sql analyzes eagerly, so the resolved plan keeps the cached
    # projection; drop the scoped view so it cannot linger in the
    # session catalog across queries (ADVICE r11)
    spark.catalog.dropTempView("__org_customer_r11")
    return df
