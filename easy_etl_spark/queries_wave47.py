"""Wave-47 query catalog: distribution-distance matrices and exact
rank tests.

New operator families:
  - wasserstein_source_pairs  exact 1-D earth-mover (W₁) distance
                          between every pair of per-source doc-length
                          distributions, via the CDF-area identity
                          W₁ = ∫|F_a − F_b| — the drift metric that
                          (unlike KS) weighs HOW FAR mass moved, used
                          to rank which feeds changed most between
                          crawls; computed in exact integer units
  - mann_whitney_u        Mann-Whitney U / Wilcoxon rank-sum test
                          (1947) with midrank tie handling and
                          tie-corrected normal approximation —
                          the nonparametric "are these two feeds'
                          length distributions shifted?" test that
                          doesn't assume normality (complements the
                          exact KS already in the catalog)

Hash-safety: CDF areas and doubled midranks are exact int64
(fractional .5 midranks are carried ×2); the only floats are final
divisions/sqrt written identically on both engines, rounded at 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import register
from .session import load_table

# ----------------------------------------------------------------------
# Pairwise 1-D Wasserstein distances between source length profiles
# ----------------------------------------------------------------------


@register(
    "wasserstein_source_pairs",
    """
    WITH d AS (SELECT source, n_chars AS v FROM documents),
    vals AS (SELECT DISTINCT v FROM d),
    srcs AS (SELECT source, count(*) AS n FROM d GROUP BY source),
    grid AS (SELECT s.source, s.n, vals.v FROM srcs s CROSS JOIN vals),
    cnt AS (SELECT source, v, count(*) AS c FROM d GROUP BY source, v),
    cum AS (
      SELECT g.source, g.n, g.v,
             CAST(sum(coalesce(cnt.c, 0))
                  OVER (PARTITION BY g.source ORDER BY g.v) AS BIGINT) AS cdf
      FROM grid g LEFT JOIN cnt ON cnt.source = g.source AND cnt.v = g.v
    ),
    stepped AS (
      SELECT source, n, v, cdf,
             lead(v) OVER (PARTITION BY source ORDER BY v) - v AS gap
      FROM cum
    ),
    paired AS (
      SELECT a.source AS source_a, b.source AS source_b,
             a.n AS na, b.n AS nb,
             CAST(sum(abs(a.cdf * b.n - b.cdf * a.n) * a.gap) AS BIGINT)
               AS emd_units
      FROM stepped a
      JOIN stepped b ON b.v = a.v AND a.source < b.source
      WHERE a.gap IS NOT NULL
      GROUP BY 1, 2, 3, 4
    )
    SELECT source_a, source_b, emd_units,
           round(emd_units * 1.0 / (na * nb), 6) AS w1
    FROM paired
    """,
)
def wasserstein_source_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise W₁ (earth-mover) distance between per-source
    doc-length distributions via the CDF-area identity: on the merged
    value grid, Σ |cdf_a·n_b − cdf_b·n_a| · Δv is an exact integer
    (emd_units); w1 divides once by n_a·n_b. Unlike the KS statistic
    (already in the catalog), W₁ weighs how FAR mass moved — the
    right metric for ranking which feeds drifted most.

    Scale: the corpus collapses to a (source × distinct-value) grid
    first (histogram shuffle); CDFs are windows partitioned by source
    over that bounded grid; the pair join is value-keyed over the
    grid, never over documents. emd_units stays inside int64 for any
    realistic length domain (cdf·n ≤ N², ×Δv, summed over the grid —
    ~1e17 at the 25× local rung)."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").alias("v")
    )
    vals = d.select("v").distinct()
    srcs = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    # |sources| is bounded (a handful of feeds); broadcasting it turns
    # the source x distinct-value grid build into a BroadcastNestedLoop
    # replicated map-side against the value stream — no cartesian
    # shuffle even when the length domain grows with scale.
    grid = F.broadcast(srcs).crossJoin(vals)
    cnt = d.groupBy("source", "v").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        grid.join(cnt, ["source", "v"], "left")
        .withColumn("cdf", F.sum(F.coalesce("c", F.lit(0))).over(w).cast("bigint"))
    )
    lw = Window.partitionBy("source").orderBy("v")
    stepped = cum.select(
        "source", "n", "v", "cdf", (F.lead("v").over(lw) - F.col("v")).alias("gap")
    ).where(F.col("gap").isNotNull())
    a = stepped.select(
        F.col("source").alias("source_a"),
        F.col("n").alias("na"),
        "v",
        F.col("cdf").alias("cdfa"),
        "gap",
    )
    b = stepped.select(
        F.col("source").alias("source_b"),
        F.col("n").alias("nb"),
        "v",
        F.col("cdf").alias("cdfb"),
    )
    paired = (
        a.join(b, "v")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b", "na", "nb")
        .agg(
            F.sum(
                F.abs(F.col("cdfa") * F.col("nb") - F.col("cdfb") * F.col("na"))
                * F.col("gap")
            )
            .cast("bigint")
            .alias("emd_units")
        )
    )
    return paired.select(
        "source_a",
        "source_b",
        "emd_units",
        F.round(F.col("emd_units") * 1.0 / (F.col("na") * F.col("nb")), 6).alias("w1"),
    )


# ----------------------------------------------------------------------
# Mann-Whitney U rank-sum test
# ----------------------------------------------------------------------

MW_SRC_A = "src0"
MW_SRC_B = "src1"


@register(
    "mann_whitney_u",
    f"""
    WITH d AS (
      SELECT n_chars AS v,
             CASE WHEN source = '{MW_SRC_A}' THEN 1 ELSE 0 END AS g1
      FROM documents WHERE source IN ('{MW_SRC_A}', '{MW_SRC_B}')
    ),
    byv AS (
      SELECT v, count(*) AS t, CAST(sum(g1) AS BIGINT) AS t1
      FROM d GROUP BY v
    ),
    ranked AS (
      SELECT v, t, t1,
             CAST(coalesce(sum(t) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS below
      FROM byv
    ),
    s AS (
      SELECT CAST(sum(t1) AS BIGINT) AS n1,
             CAST(sum(t - t1) AS BIGINT) AS n2,
             CAST(sum(t1 * (2 * below + t + 1)) AS BIGINT) AS r1_x2,
             CAST(sum(t * t * t - t) AS BIGINT) AS tie_cubes
      FROM ranked
    )
    SELECT n1, n2,
           r1_x2 - n1 * (n1 + 1) AS u1_x2,
           round(((r1_x2 - n1 * (n1 + 1)) / 2.0 - n1 * 1.0 * n2 / 2.0)
                 / sqrt((n1 * 1.0 * n2 / 12.0)
                        * ((n1 + n2 + 1)
                           - tie_cubes * 1.0
                             / ((n1 + n2) * 1.0 * (n1 + n2 - 1)))), 6) AS z
    FROM s
    """,
)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U comparing doc lengths of two sources, with
    midrank tie handling (doubled midranks stay integer: 2·midrank =
    2·count_below + tie_size + 1) and the tie-corrected normal
    approximation. U is reported ×2 so the statistic is an exact
    integer; z is the standard large-sample test value.

    Scale: one histogram shuffle to per-value counts, one BANDED
    exclusive prefix sum over the value grid (bounded by the length
    domain — and still never an unpartitioned window), one 4-number
    reduce."""
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("source").isin(MW_SRC_A, MW_SRC_B))
        .select(
            F.col("n_chars").alias("v"),
            F.when(F.col("source") == MW_SRC_A, 1).otherwise(0).alias("g1"),
        )
    )
    byv = d.groupBy("v").agg(
        F.count(F.lit(1)).alias("t"), F.sum("g1").cast("bigint").alias("t1")
    )
    # exclusive below-count via the BANDED prefix sum — the frame is
    # value-domain-sized, but the catalog convention is that even
    # dims-sized cumulatives never compile to an unpartitioned window
    from .operators.packing import global_running_offset

    ranked = global_running_offset(byv, "t", "v", out_col="__below").withColumn(
        "below", F.col("__below").cast("bigint")
    )
    s = ranked.agg(
        F.sum("t1").cast("bigint").alias("n1"),
        F.sum(F.col("t") - F.col("t1")).cast("bigint").alias("n2"),
        F.sum(F.col("t1") * (2 * F.col("below") + F.col("t") + 1))
        .cast("bigint")
        .alias("r1_x2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie_cubes"),
    )
    u1_x2 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)
    n1, n2 = F.col("n1"), F.col("n2")
    mean_shift = u1_x2 / 2.0 - n1 * 1.0 * n2 / 2.0
    var = (n1 * 1.0 * n2 / 12.0) * (
        (n1 + n2 + 1)
        - F.col("tie_cubes") * 1.0 / ((n1 + n2) * 1.0 * (n1 + n2 - 1))
    )
    return s.select(
        "n1",
        "n2",
        u1_x2.alias("u1_x2"),
        F.round(mean_shift / F.sqrt(var), 6).alias("z"),
    )
