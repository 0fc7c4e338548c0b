"""Wave-44 query catalog: collocation mining, cohort economics, and
exact decision-stump feature scanning.

New operator families:
  - collocation_pmi       PMI-ranked bigram collocations (Church &
                          Hanks 1990) with a min-support cut — the
                          phrase-mining pass a tokenizer/vocab team
                          runs to decide which word pairs deserve a
                          merged token
  - cohort_ltv_curve      cumulative revenue per customer by annual
                          first-order cohort and month offset — the
                          LTV curve every growth dashboard plots;
                          exact integer cents end to end
  - decision_stump_scan   exact weighted-Gini split scan over two
                          candidate features (quantity, discount) for
                          predicting returns — the single-feature
                          baseline (and feature-screen) a modeling
                          team runs before training anything

Hash-safety: counts and cents are exact integers; PMI uses the
integer-quantized ln convention (`unigram_logprob` pattern —
floor(ln(x)*1e6 + 0.5), the double products written in the same
association order on both engines); Gini is rational arithmetic in
doubles with the identical expression tree both sides, rounded at 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import register
from .session import load_table

# ----------------------------------------------------------------------
# PMI bigram collocations
# ----------------------------------------------------------------------

PMI_MIN_COUNT = 5
PMI_TOP = 20


@register(
    "collocation_pmi",
    f"""
    WITH t AS (SELECT string_split(trim(text), ' ') AS w FROM documents),
    uni AS (SELECT unnest(w) AS tok FROM t),
    ucnt AS (SELECT tok, count(*) AS u FROM uni GROUP BY tok),
    utot AS (SELECT count(*) AS t_toks FROM uni),
    bi AS (
      SELECT w[i] AS w1, w[i+1] AS w2
      FROM t, UNNEST(generate_series(1, len(w) - 1)) AS g(i)
    ),
    bcnt AS (SELECT w1, w2, count(*) AS b FROM bi GROUP BY 1, 2),
    btot AS (SELECT count(*) AS t_bi FROM bi),
    scored AS (
      SELECT w1, w2, b,
             CAST(floor(ln(CAST(b AS DOUBLE) * t_toks * t_toks) * 1e6 + 0.5)
                  AS BIGINT)
             - CAST(floor(ln(CAST(t_bi AS DOUBLE) * ua.u * ub.u) * 1e6 + 0.5)
                    AS BIGINT) AS units
      FROM bcnt
      JOIN ucnt ua ON ua.tok = w1
      JOIN ucnt ub ON ub.tok = w2
      CROSS JOIN utot CROSS JOIN btot
      WHERE b >= {PMI_MIN_COUNT}
    )
    SELECT w1, w2, CAST(b AS BIGINT) AS n_pair,
           CAST(floor(units / 100.0 + 0.5) AS BIGINT) / 10000.0 + 0.0 AS pmi
    FROM scored
    ORDER BY units DESC, w1, w2 LIMIT {PMI_TOP}
    """,
)
def collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations by pointwise mutual information,
    min support 5: pmi = ln(b·T² / (B·u1·u2)) over exact unigram and
    adjacent-bigram counts. High-PMI pairs are the multi-word
    expressions worth merging into single vocab entries before BPE
    training.

    Scale: one token explode feeds the unigram count, one positional
    transform feeds the bigram count (both map-side-combined
    groupBys); the scoring joins are token-keyed (vocabulary-sized,
    not corpus-sized), totals ride a 1-row broadcast, and the final
    cut is TakeOrderedAndProject on the deterministic
    (units DESC, w1, w2) key."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.trim("text"), " ").alias("w"))
    uni = toks.select(F.explode("w").alias("tok"))
    ucnt = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("u"))
    # round 11 (guide §1.2): the totals are row counts of the exploded
    # streams, i.e. exact array-length sums — one explode-free scan
    # each (sum(size(w))) instead of re-running the corpus explode a
    # second time per stream
    utot = toks.agg(F.sum(F.size("w")).cast("bigint").alias("t_toks"))
    bi = (
        toks.where(F.size("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> struct(w[i-1] AS w1, w[i] AS w2))"
                )
            ).alias("g")
        )
        .select("g.w1", "g.w2")
    )
    bcnt = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("b"))
    btot = toks.where(F.size("w") >= 2).agg(
        F.sum(F.size("w") - 1).cast("bigint").alias("t_bi")
    )

    def qln(x):
        return F.floor(F.log(x) * 1e6 + F.lit(0.5)).cast("bigint")

    ua = ucnt.select(F.col("tok").alias("w1"), F.col("u").alias("u1"))
    ub = ucnt.select(F.col("tok").alias("w2"), F.col("u").alias("u2"))
    scored = (
        bcnt.where(F.col("b") >= PMI_MIN_COUNT)
        .join(ua, "w1")
        .join(ub, "w2")
        .crossJoin(F.broadcast(utot))
        .crossJoin(F.broadcast(btot))
        .withColumn(
            "units",
            qln(F.col("b").cast("double") * F.col("t_toks") * F.col("t_toks"))
            - qln(F.col("t_bi").cast("double") * F.col("u1") * F.col("u2")),
        )
    )
    return (
        scored.orderBy(F.col("units").desc(), "w1", "w2")
        .limit(PMI_TOP)
        .select(
            "w1",
            "w2",
            F.col("b").cast("bigint").alias("n_pair"),
            # integer-space half-up to 1e-4: round() on a double
            # diverges between engines at exact .5 ties (the sf5
            # revenue-bridge lesson, applied to every units/1e6 site)
            (
                F.floor(F.col("units") / F.lit(100.0) + F.lit(0.5)).cast("bigint")
                / F.lit(10000.0)
                + F.lit(0.0)
            ).alias("pmi"),
        )
    )


# ----------------------------------------------------------------------
# Cohort LTV curve
# ----------------------------------------------------------------------


@register(
    "cohort_ltv_curve",
    """
    WITH f AS (
      SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS fd
      FROM orders GROUP BY o_custkey
    ),
    coh AS (
      SELECT CAST(year(fd) AS BIGINT) AS cohort_year, count(*) AS n_cust
      FROM f GROUP BY 1
    ),
    o AS (
      SELECT CAST(year(f.fd) AS BIGINT) AS cohort_year,
             CAST((year(CAST(o.o_orderdate AS DATE)) * 12
                   + month(CAST(o.o_orderdate AS DATE)))
                  - (year(f.fd) * 12 + month(f.fd)) AS BIGINT) AS month_offset,
             CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders o JOIN f ON f.o_custkey = o.o_custkey
    ),
    cell AS (
      SELECT cohort_year, month_offset, count(*) AS n_orders,
             sum(cents) AS cents
      FROM o GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort_year, month_offset, CAST(n_orders AS BIGINT) AS n_orders,
             CAST(sum(cents) OVER (PARTITION BY cohort_year
                                   ORDER BY month_offset) AS BIGINT) AS cum_cents
      FROM cell
    )
    SELECT cohort_year, month_offset, n_orders,
           CAST((cum_cents * 200 + n_cust) // (2 * n_cust) AS BIGINT)
             / 10000.0 AS ltv_per_customer
    FROM cum JOIN coh USING (cohort_year)
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average cumulative revenue per customer by annual first-order
    cohort and month offset — the LTV curve. Revenue is quantized to
    exact integer cents per order BEFORE any aggregation (the
    functions.exact convention), so the running totals are
    order-independent integers and the only float op is the final
    per-customer division.

    Scale: first-order dates are one groupBy(custkey); the orders→
    cohort join is customer-keyed; the running total windows over the
    (cohorts × offsets)-sized aggregate, partitioned by cohort — a
    dims-sized frame at any corpus size."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("d"), "o_totalprice"
    )
    f = orders.groupBy("o_custkey").agg(F.min("d").alias("fd"))
    coh = f.groupBy(F.year("fd").cast("bigint").alias("cohort_year")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    o = orders.join(f, "o_custkey").select(
        F.year("fd").cast("bigint").alias("cohort_year"),
        (
            (F.year("d") * 12 + F.month("d")) - (F.year("fd") * 12 + F.month("fd"))
        ).cast("bigint").alias("month_offset"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint").alias("cents"),
    )
    cell = o.groupBy("cohort_year", "month_offset").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("cents").alias("cents")
    )
    w = (
        Window.partitionBy("cohort_year")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cell.select(
        "cohort_year",
        "month_offset",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.sum("cents").over(w).cast("bigint").alias("cum_cents"),
    )
    return cum.join(F.broadcast(coh), "cohort_year").select(
        "cohort_year",
        "month_offset",
        "n_orders",
        # round-half-up at 4 decimals computed in INTEGER space, then
        # one exact-integer-to-double division: round(double, 4) on a
        # 13-significant-digit quotient is a representability knife
        # edge across engines (caught by the round-8 sf1 sweep: one
        # row differed in the last ulp)
        (
            F.expr("(cum_cents * 200 + n_cust) div (2 * n_cust)") / 10000.0
        ).alias("ltv_per_customer"),
    )


# ----------------------------------------------------------------------
# Exact decision-stump split scan
# ----------------------------------------------------------------------


@register(
    "decision_stump_scan",
    """
    WITH base AS (
      SELECT 'quantity' AS feature,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS thr,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
      FROM lineitem
      UNION ALL
      SELECT 'discount_cents' AS feature,
             CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS thr,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
      FROM lineitem
    ),
    hist AS (
      SELECT feature, thr, count(*) AS n, CAST(sum(pos) AS BIGINT) AS p
      FROM base GROUP BY 1, 2
    ),
    tot AS (
      SELECT feature, CAST(sum(n) AS BIGINT) AS nt, CAST(sum(p) AS BIGINT) AS pt
      FROM hist GROUP BY feature
    ),
    cum AS (
      SELECT feature, thr,
             CAST(sum(n) OVER (PARTITION BY feature ORDER BY thr)
                  AS BIGINT) AS n_le,
             CAST(sum(p) OVER (PARTITION BY feature ORDER BY thr)
                  AS BIGINT) AS p_le
      FROM hist
    )
    SELECT c.feature, c.thr, c.n_le, c.p_le,
           t.nt - c.n_le AS n_gt, t.pt - c.p_le AS p_gt,
           round(
             (c.n_le * (1.0 - (c.p_le * 1.0 / c.n_le) * (c.p_le * 1.0 / c.n_le)
                        - ((c.n_le - c.p_le) * 1.0 / c.n_le)
                          * ((c.n_le - c.p_le) * 1.0 / c.n_le))
              + (t.nt - c.n_le)
                * (1.0 - ((t.pt - c.p_le) * 1.0 / (t.nt - c.n_le))
                         * ((t.pt - c.p_le) * 1.0 / (t.nt - c.n_le))
                       - (((t.nt - c.n_le) - (t.pt - c.p_le)) * 1.0
                          / (t.nt - c.n_le))
                         * (((t.nt - c.n_le) - (t.pt - c.p_le)) * 1.0
                            / (t.nt - c.n_le))))
             / t.nt, 6) AS weighted_gini
    FROM cum c JOIN tot t USING (feature)
    WHERE t.nt > c.n_le
    """,
)
def decision_stump_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted-Gini decision-stump scan: for every candidate
    threshold of two features (integer quantity, discount in cents),
    the impurity of the <=thr / >thr split for predicting
    l_returnflag = 'R'. The argmin row is the best single-feature
    rule; the full curve is the feature screen.

    Scale: two map-side-combined histograms over the fact scan (one
    union, one groupBy — thresholds come from the data, never a
    per-threshold pass); the cumulative and Gini arithmetic run on
    the ≤(distinct thresholds)-sized histogram, windowed per feature.
    Counts are exact integers; the Gini expression tree is written
    identically on both engines and rounded at 6."""
    li = load_table(spark, sf_dir, "lineitem")
    pos = F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("pos")
    base = (
        li.select(
            F.lit("quantity").alias("feature"),
            F.floor(F.col("l_quantity") + 0.5).cast("bigint").alias("thr"),
            pos,
        )
    ).unionAll(
        li.select(
            F.lit("discount_cents").alias("feature"),
            F.floor(F.col("l_discount") * 100.0 + 0.5).cast("bigint").alias("thr"),
            pos,
        )
    )
    hist = base.groupBy("feature", "thr").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").cast("bigint").alias("p")
    )
    tot = hist.groupBy("feature").agg(
        F.sum("n").cast("bigint").alias("nt"), F.sum("p").cast("bigint").alias("pt")
    )
    w = (
        Window.partitionBy("feature")
        .orderBy("thr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "feature",
        "thr",
        F.sum("n").over(w).cast("bigint").alias("n_le"),
        F.sum("p").over(w).cast("bigint").alias("p_le"),
    )
    j = cum.join(F.broadcast(tot), "feature").where(F.col("nt") > F.col("n_le"))
    n_le, p_le = F.col("n_le"), F.col("p_le")
    n_gt = F.col("nt") - n_le
    p_gt = F.col("pt") - p_le

    def gini(t, p):
        return 1.0 - (p * 1.0 / t) * (p * 1.0 / t) - ((t - p) * 1.0 / t) * (
            (t - p) * 1.0 / t
        )

    weighted = (n_le * gini(n_le, p_le) + n_gt * gini(n_gt, p_gt)) / F.col("nt")
    return j.select(
        "feature",
        "thr",
        "n_le",
        "p_le",
        n_gt.alias("n_gt"),
        p_gt.alias("p_gt"),
        F.round(weighted, 6).alias("weighted_gini"),
    )
