"""Wave-51 query catalog: LSH deployment planning and whole-schema
referential integrity.

New operator families:
  - lsh_parameter_plan    the (bands, rows) S-curve planner for the
                          catalog's 48-hash MinHash family: for every
                          divisor layout r×b = 48, the collision
                          probability 1−(1−t^r)^b at a Jaccard grid —
                          the table an engineer reads to pick the
                          layout whose knee sits safely below their
                          verification threshold (dedup_minhash_lsh
                          runs r=3, b=16)
  - referential_integrity_audit  orphan counts for EVERY foreign-key
                          edge in the schema in one result — the
                          first data-quality gate an ETL deployment
                          runs after each load; each edge is one
                          broadcast/shuffle anti-join

Hash-safety: the S-curve is a closed-form double expression on a
literal grid, written identically on both engines; orphan counts are
exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register
from .session import load_table

# ----------------------------------------------------------------------
# LSH (bands x rows) S-curve planner
# ----------------------------------------------------------------------

LSH_TOTAL_HASHES = 48
LSH_ROW_CHOICES = (1, 2, 3, 4, 6, 8)
LSH_T_GRID = tuple(x / 10.0 for x in range(1, 10))  # 0.1 .. 0.9


@register(
    "lsh_parameter_plan",
    f"""
    WITH layouts AS (
      SELECT unnest([{", ".join(str(r) for r in LSH_ROW_CHOICES)}]) AS rows_per_band
    ),
    grid AS (
      SELECT CAST(unnest([{", ".join(str(t) for t in LSH_T_GRID)}]) AS DOUBLE)
             AS jaccard
    )
    SELECT CAST(l.rows_per_band AS BIGINT) AS rows_per_band,
           CAST({LSH_TOTAL_HASHES} // l.rows_per_band AS BIGINT) AS n_bands,
           g.jaccard,
           round(1.0 - power(1.0 - power(g.jaccard, l.rows_per_band),
                             {LSH_TOTAL_HASHES} // l.rows_per_band), 6)
             AS p_candidate
    FROM layouts l CROSS JOIN grid g
    """,
)
def lsh_parameter_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collision-probability table 1−(1−t^r)^b for every (r, b)
    layout of the catalog's 48 MinHash functions at a Jaccard grid —
    the planning table behind `dedup_minhash_lsh`'s r=3, b=16 choice
    (knee near t≈0.40, candidate probability ≥0.9988 at the 0.7
    verification threshold — the layout whose recall gamble the
    round-9 sf1 sweep retired). Deterministic pure math; takes
    sf_dir only to honor the catalog signature.

    Scale: 45 rows of closed-form arithmetic — the point is the
    DECISION it encodes for the operators that do scale."""
    rows = (
        spark.range(1)
        .select(
            F.explode(
                F.array(*[F.lit(r) for r in LSH_ROW_CHOICES])
            ).alias("rows_per_band")
        )
    )
    grid = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in LSH_T_GRID])).alias("jaccard")
    )
    b = (F.lit(LSH_TOTAL_HASHES) / F.col("rows_per_band")).cast("bigint")
    p = 1.0 - F.pow(
        1.0 - F.pow(F.col("jaccard"), F.col("rows_per_band")), b
    )
    return (
        rows.crossJoin(grid)
        .select(
            F.col("rows_per_band").cast("bigint").alias("rows_per_band"),
            b.alias("n_bands"),
            "jaccard",
            F.round(p, 6).alias("p_candidate"),
        )
    )


# ----------------------------------------------------------------------
# Whole-schema referential integrity audit
# ----------------------------------------------------------------------

FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def _ri_oracle() -> str:
    sels = []
    for child, fk, parent, pk in FK_EDGES:
        sels.append(
            f"""
    SELECT '{child}.{fk}' AS fk_edge,
           '{parent}.{pk}' AS references_pk,
           (SELECT count(*) FROM {child}) AS n_child_rows,
           (SELECT count(*) FROM {child} c
            WHERE c.{fk} IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM {parent} p
                              WHERE p.{pk} = c.{fk})) AS n_orphans,
           (SELECT count(*) FROM {child} WHERE {fk} IS NULL) AS n_null_fk"""
        )
    return "\nUNION ALL".join(sels)


@register("referential_integrity_audit", _ri_oracle())
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan and null-FK counts for every foreign-key edge in the
    schema, in one result set — the post-load data-quality gate. On
    the driver's generated data every count must be 0; on a real lake
    nonzero rows name exactly which feed broke integrity.

    Scale: each edge is ONE pass over the child (round 11, guide
    §1.2/§2.3): the child pre-aggregates to (fk, multiplicity) — a
    map-side-combined count whose shuffle is DISTINCT-FK-sized, not
    row-sized — then LEFT-joins the parent's distinct key column
    (distinct keeps NOT-EXISTS semantics even if a parent key were
    duplicated) and one aggregate weights rows, null FKs and orphans
    by multiplicity. The previous shape paid a second child scan +
    aggregate per edge for the row/null counts and shipped child ROWS
    into the anti-join. Even a fact-fact edge now joins two key-count
    frames. The generator of edges is the static FK catalog, not
    data."""
    out = None
    for child, fk, parent, pk in FK_EDGES:
        c = (
            load_table(spark, sf_dir, child)
            .groupBy(fk)
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        p = (
            load_table(spark, sf_dir, parent)
            .select(F.col(pk).alias("__pk"))
            .distinct()
        )
        row = (
            c.join(p, c[fk] == p["__pk"], "left")
            .agg(
                F.coalesce(F.sum("__cnt"), F.lit(0))
                .cast("bigint")
                .alias("n_child_rows"),
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col(fk).isNotNull() & F.col("__pk").isNull(),
                            F.col("__cnt"),
                        ).otherwise(0)
                    ),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("n_orphans"),
                F.coalesce(
                    F.sum(F.when(F.col(fk).isNull(), F.col("__cnt")).otherwise(0)),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("n_null_fk"),
            )
            .select(
                F.lit(f"{child}.{fk}").alias("fk_edge"),
                F.lit(f"{parent}.{pk}").alias("references_pk"),
                "n_child_rows",
                "n_orphans",
                "n_null_fk",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out
