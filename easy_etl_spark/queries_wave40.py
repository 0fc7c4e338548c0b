"""Wave-40 query catalog: privacy / governance audits over tabular
data — the release-gating passes a data platform runs before sharing
a table (complementing pii_redaction's content-level pass).

New operator families:
  - k_anonymity_audit     k-anonymity + l-diversity summary for a
                          quasi-identifier combination (Sweeney 2002;
                          Machanavajjhala 2007): exact violating-cell
                          and at-risk-record counts, the suppression
                          fraction needed to reach k, and the minimum
                          sensitive-value diversity among released
                          cells
  - reidentification_risk unicity growth as the quasi-identifier
                          widens (1 -> 2 -> 3 columns): singleton-cell
                          records are individually re-identifiable;
                          the audit shows how fast risk compounds
  - dp_histogram          epsilon=1 Laplace-noised group counts with
                          md5-DERANDOMIZED noise draws (inverse-CDF on
                          a hash-uniform, quantized-ln exact) — a
                          bit-replayable simulation of a DP release;
                          a production release substitutes true
                          randomness for the hash, same plan shape

Hash-safety: exact integers; ln uses the catalog floor(ln*1e6+0.5)
quantization; md5 via the first-32-bit convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register
from .session import load_table

K_ANON = 10  # release threshold
_H32 = "(('0x' || substr(md5({s}), 1, 8))::BIGINT)"


def _kanon_oracle() -> str:
    return f"""
    WITH cells AS (
      SELECT o_orderpriority, o_orderstatus,
             date_trunc('month', o_orderdate) AS m,
             count(*) AS sz,
             count(DISTINCT CAST(floor(o_totalprice / 50000) AS BIGINT)) AS l_div
      FROM orders GROUP BY 1, 2, 3
    )
    SELECT CAST(sum(sz) AS BIGINT) AS n_records,
           count(*) AS n_cells,
           CAST(sum(CASE WHEN sz < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_cells,
           CAST(sum(CASE WHEN sz < {K_ANON} THEN sz ELSE 0 END) AS BIGINT)
             AS n_records_at_risk,
           CAST((10000 * sum(CASE WHEN sz < {K_ANON} THEN sz ELSE 0 END))
                // sum(sz) AS BIGINT) AS suppression_bp,
           CAST(min(CASE WHEN sz >= {K_ANON} THEN l_div END) AS BIGINT)
             AS min_l_released,
           CAST(sum(CASE WHEN sz >= {K_ANON} AND l_div < 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS released_cells_low_diversity
    FROM cells
    """


@register("k_anonymity_audit", _kanon_oracle())
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity + l-diversity release audit for the quasi-identifier
    (priority, status, order-month) with k=10 and the price band
    (50k buckets) as the sensitive attribute: how many QI cells are
    too small to release, how many records they hold (= the exact
    suppression cost of reaching k), and — for the cells that WOULD be
    released — the minimum sensitive diversity (a k-anonymous cell
    with one price band still leaks; Machanavajjhala 2007).

    Scale: one (QI) -> (count, distinct-sensitive) aggregation plus a
    7-value reduce — map-side combinable, shuffle keyed on the QI,
    output size bounded by the QI domain regardless of input rows."""
    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy(
        "o_orderpriority",
        "o_orderstatus",
        F.date_trunc("month", F.col("o_orderdate").cast("timestamp")).alias("m"),
    ).agg(
        F.count(F.lit(1)).alias("sz"),
        F.countDistinct(
            F.floor(F.col("o_totalprice") / 50000).cast("bigint")
        ).alias("l_div"),
    )
    viol = F.col("sz") < K_ANON
    return cells.agg(
        F.sum("sz").cast("bigint").alias("n_records"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(viol.cast("int")).cast("bigint").alias("n_violating_cells"),
        F.sum(F.when(viol, F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("n_records_at_risk"),
        F.min(F.when(~viol, F.col("l_div"))).cast("bigint").alias("min_l_released"),
        F.sum((~viol & (F.col("l_div") < 3)).cast("int"))
        .cast("bigint")
        .alias("released_cells_low_diversity"),
    ).select(
        "n_records",
        "n_cells",
        "n_violating_cells",
        "n_records_at_risk",
        F.expr("CAST((10000 * n_records_at_risk) DIV n_records AS BIGINT)").alias(
            "suppression_bp"
        ),
        "min_l_released",
        "released_cells_low_diversity",
    )


QI_SETS = [
    ("o_orderpriority",),
    ("o_orderpriority", "o_orderstatus"),
    ("o_orderpriority", "o_orderstatus", "o_orderdate"),
]


def _reident_oracle() -> str:
    rows = "\n      UNION ALL\n".join(
        f"""      SELECT CAST({len(qi)} AS BIGINT) AS qi_width,
             '{",".join(qi)}' AS qi_cols,
             count(*) AS n_cells,
             CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_singleton_cells,
             CAST((10000 * sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END))
                  // sum(sz) AS BIGINT) AS unicity_bp
      FROM (SELECT count(*) AS sz FROM orders GROUP BY {", ".join(qi)})"""
        for qi in QI_SETS
    )
    return rows


@register("reidentification_risk", _reident_oracle())
def reidentification_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicity growth as the quasi-identifier widens: a record alone in
    its QI cell is individually re-identifiable by anyone who knows
    those attributes. Three nested QI sets (priority; +status; +exact
    order date) show risk compounding from zero to material — the
    empirical heart of de Montjoye 2013-style unicity studies, exact
    here rather than sampled.

    Scale: one count aggregation per QI set (the sets are nested, so a
    cluster run could roll coarser sets up from the finest — kept as
    independent map-side-combinable aggs for clarity; each output is
    one row)."""
    o = load_table(spark, sf_dir, "orders")
    outs = []
    for qi in QI_SETS:
        sz = o.groupBy(*qi).agg(F.count(F.lit(1)).alias("sz"))
        outs.append(
            sz.agg(
                F.lit(len(qi)).cast("bigint").alias("qi_width"),
                F.lit(",".join(qi)).alias("qi_cols"),
                F.count(F.lit(1)).alias("n_cells"),
                F.sum((F.col("sz") == 1).cast("int"))
                .cast("bigint")
                .alias("n_singleton_cells"),
                F.sum("sz").alias("__n"),
            ).select(
                "qi_width",
                "qi_cols",
                "n_cells",
                "n_singleton_cells",
                F.expr(
                    "CAST((10000 * n_singleton_cells) DIV __n AS BIGINT)"
                ).alias("unicity_bp"),
            )
        )
    out = outs[0]
    for x in outs[1:]:
        out = out.unionByName(x)
    return out


TWO32 = 1 << 32
TWO31 = 1 << 31


def _dp_oracle() -> str:
    h = _H32.format(s="'noise:' || o_orderpriority")
    qln = "CAST(floor(ln(CAST({x} AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
    # inverse-CDF Laplace(b=1): x = -sgn(p-.5) * ln(1 - 2|p-.5|),
    # p = h/2^32; 1-2|p-.5| = (2^32 - |2h - 2^32|)/2^32, kept odd (+1)
    # so the quantized ln never sees zero.
    return f"""
    WITH c AS (
      SELECT o_orderpriority, count(*) AS exact_count,
             {h} AS h
      FROM orders GROUP BY 1
    ),
    n AS (
      SELECT o_orderpriority, exact_count,
             CASE WHEN h >= {TWO31} THEN 1 ELSE -1 END AS sgn,
             {TWO32} - abs(2 * h - {TWO32}) + 1 AS r_odd
      FROM c
    )
    SELECT o_orderpriority,
           CAST(exact_count AS BIGINT) AS exact_count,
           CAST(sgn * ({qln.format(x=TWO32)} - {qln.format(x="r_odd")})
                AS BIGINT) AS noise_micro,
           CAST(exact_count * 1000000
                + sgn * ({qln.format(x=TWO32)} - {qln.format(x="r_odd")})
                AS BIGINT) AS noisy_count_micro
    FROM n
    """


@register("dp_histogram", _dp_oracle())
def dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private histogram release (epsilon=1 Laplace
    mechanism over a count query, sensitivity 1): per-group counts
    plus a Laplace(1) draw in exact micro-units, via the inverse CDF
    -sgn(p-1/2)*ln(1-2|p-1/2|) evaluated on an md5-DERANDOMIZED
    uniform — bit-replayable by the oracle, so the correctness of the
    mechanism's plumbing (scale, symmetry, inverse-CDF algebra) is
    hash-gated. A production release swaps the hash for true
    randomness (the derandomized draw is NOT private — it's the
    audit/simulation mode, same plan shape).

    Scale: one map-side-combinable count per group + per-group O(1)
    noise arithmetic; the release size is the group domain, not the
    data."""
    o = load_table(spark, sf_dir, "orders")
    from .operators.sketches import _md5_u32

    c = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("exact_count"))
    h = _md5_u32(F.concat(F.lit("noise:"), F.col("o_orderpriority")))
    qln32 = "CAST(floor(ln(CAST(4294967296 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
    n = c.select(
        "o_orderpriority",
        F.col("exact_count").cast("bigint").alias("exact_count"),
        F.when(h >= TWO31, 1).otherwise(-1).alias("sgn"),
        (F.lit(TWO32) - F.abs(2 * h - TWO32) + 1).alias("r_odd"),
    )
    noise = F.expr(
        f"sgn * ({qln32}"
        " - CAST(floor(ln(CAST(r_odd AS DOUBLE)) * 1000000 + 0.5) AS BIGINT))"
    )
    return n.select(
        "o_orderpriority",
        "exact_count",
        noise.cast("bigint").alias("noise_micro"),
        (F.col("exact_count") * 1000000 + noise).cast("bigint").alias(
            "noisy_count_micro"
        ),
    )
