"""Wave-48 query catalog: corpus content-drift matrices and
aggregation-bias detection.

New operator families:
  - cross_entropy_matrix  add-one-smoothed unigram cross-entropy
                          H(a‖b) between every ordered source pair —
                          the CONTENT-drift companion to the
                          length-based `wasserstein_source_pairs`:
                          which feed's language does feed X resemble,
                          and how asymmetric is the resemblance?
                          (H(a‖b) − H(a‖a) is the KL divergence.)
  - simpsons_paradox_scan aggregate-vs-within-group Pearson
                          correlation sign comparison (the Simpson
                          1951 reversal check) for discount→quantity
                          within return-flag strata — the first audit
                          any observational "discounts drive volume"
                          claim has to pass

Hash-safety: token counts and correlation moments are exact int64;
ln appears only through the integer-quantized `unigram_logprob`
convention (floor(ln(rational)·1e6 + 0.5) summed as integers);
Pearson is a single guarded float expression per row, rounded at 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register
from .session import load_table

# ----------------------------------------------------------------------
# Smoothed unigram cross-entropy between sources
# ----------------------------------------------------------------------


@register(
    "cross_entropy_matrix",
    """
    WITH toks AS (
      SELECT source, unnest(string_split(trim(text), ' ')) AS tok
      FROM documents
    ),
    cnt AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2),
    tot AS (SELECT source, CAST(count(*) AS BIGINT) AS t FROM toks GROUP BY 1),
    voc AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM toks),
    grid AS (
      SELECT a.source AS source_a, a.tok, a.c AS ca, s.source AS source_b
      FROM cnt a CROSS JOIN (SELECT source FROM tot) s
    ),
    scored AS (
      SELECT g.source_a, g.source_b, g.ca,
             CAST(floor(ln((coalesce(b.c, 0) + 1) * 1.0 / (tb.t + voc.v))
                        * 1000000.0 + 0.5) AS BIGINT) AS qlnq
      FROM grid g
      LEFT JOIN cnt b ON b.source = g.source_b AND b.tok = g.tok
      JOIN tot tb ON tb.source = g.source_b
      CROSS JOIN voc
    )
    SELECT source_a, source_b,
           CAST(sum(ca * qlnq) AS BIGINT) AS units,
           round(-(CAST(sum(ca * qlnq) AS DOUBLE) / 1000000.0)
                 / ta.t, 4) AS cross_entropy_nats
    FROM scored JOIN tot ta ON ta.source = source_a
    GROUP BY source_a, source_b, ta.t
    """,
)
def cross_entropy_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram cross-entropy H(a‖b) = −Σ_t p_a(t)·ln q_b(t) for every
    ordered source pair, with add-one smoothing on the model side
    (q_b(t) = (c_b(t)+1)/(T_b+V)) so unseen tokens cost a finite,
    deterministic penalty. The diagonal is each source's own entropy
    (+smoothing bias); off-diagonal asymmetry is directional KL. This
    is the content-drift matrix; `wasserstein_source_pairs` is the
    length-drift one.

    Scale: everything after the token explode is vocabulary-sized —
    counts, the S-way grid, and the token-keyed LEFT join; per-pair
    contributions are exact integer unit sums (the quantized-ln
    convention), divided once per cell."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.trim("text"), " ")).alias("tok")
    )
    cnt = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    tot = toks.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    voc = toks.agg(F.count_distinct("tok").cast("bigint").alias("v"))
    srcs = tot.select("source")
    grid = (
        cnt.select(
            F.col("source").alias("source_a"), "tok", F.col("c").alias("ca")
        )
        .crossJoin(F.broadcast(srcs.select(F.col("source").alias("source_b"))))
    )
    b = cnt.select(
        F.col("source").alias("source_b"), "tok", F.col("c").alias("cb")
    )
    tb = tot.select(F.col("source").alias("source_b"), F.col("t").alias("tb"))
    scored = (
        grid.join(b, ["source_b", "tok"], "left")
        .join(F.broadcast(tb), "source_b")
        .crossJoin(F.broadcast(voc))
        .withColumn(
            "qlnq",
            F.floor(
                F.log(
                    (F.coalesce(F.col("cb"), F.lit(0)) + 1)
                    * 1.0
                    / (F.col("tb") + F.col("v"))
                )
                * 1000000.0
                + F.lit(0.5)
            ).cast("bigint"),
        )
    )
    ta = tot.select(F.col("source").alias("source_a"), F.col("t").alias("ta"))
    return (
        scored.groupBy("source_a", "source_b")
        .agg(F.sum(F.col("ca") * F.col("qlnq")).cast("bigint").alias("units"))
        .join(F.broadcast(ta), "source_a")
        .select(
            "source_a",
            "source_b",
            "units",
            F.round(
                -(F.col("units").cast("double") / 1000000.0) / F.col("ta"), 4
            ).alias("cross_entropy_nats"),
        )
    )


# ----------------------------------------------------------------------
# Simpson's paradox scan
# ----------------------------------------------------------------------


@register(
    "simpsons_paradox_scan",
    """
    WITH base AS (
      SELECT l_returnflag AS grp,
             CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS x,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS y
      FROM lineitem
    ),
    g AS (
      SELECT grp, count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM base GROUP BY grp
    ),
    o AS (
      SELECT CAST(sum(n) AS BIGINT) AS n,
             CAST(sum(sx) AS BIGINT) AS sx, CAST(sum(sy) AS BIGINT) AS sy,
             CAST(sum(sxx) AS BIGINT) AS sxx,
             CAST(sum(syy) AS BIGINT) AS syy,
             CAST(sum(sxy) AS BIGINT) AS sxy
      FROM g
    ),
    rg AS (
      SELECT grp, n,
             CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                  THEN round((n * sxy - sx * sy)
                             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                    * (n * syy - sy * sy)), 6)
                  END AS r_group
      FROM g
    ),
    ro AS (
      SELECT CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                  THEN round((n * sxy - sx * sy)
                             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                    * (n * syy - sy * sy)), 6)
                  END AS r_overall
      FROM o
    )
    SELECT grp, n, r_group, ro.r_overall,
           (r_group IS NOT NULL AND ro.r_overall IS NOT NULL
            AND ((r_group > 0 AND ro.r_overall < 0)
                 OR (r_group < 0 AND ro.r_overall > 0))) AS sign_flip
    FROM rg CROSS JOIN ro
    """,
)
def simpsons_paradox_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson-reversal audit for the discount→quantity relationship:
    Pearson r within each return-flag stratum vs the pooled r. A
    sign_flip row is the textbook aggregation trap — the pooled trend
    contradicts every stratum — and means the pooled number must not
    ship without stratification.

    Scale: one map-side-combined moment aggregate per stratum (six
    int64 sums), the pooled row is the 3-row sum of those — nothing
    after the first aggregate touches raw rows; each r is a single
    guarded float expression."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_returnflag").alias("grp"),
        F.floor(F.col("l_discount") * 100.0 + 0.5).cast("bigint").alias("x"),
        F.floor(F.col("l_quantity") + 0.5).cast("bigint").alias("y"),
    )
    g = base.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )

    def pearson(n, sx, sy, sxx, syy, sxy):
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        num = n * sxy - sx * sy
        return F.when(
            (vx > 0) & (vy > 0), F.round(num / F.sqrt(vx.cast("double") * vy), 6)
        )

    rg = g.select(
        "grp",
        "n",
        pearson(
            F.col("n"), F.col("sx"), F.col("sy"), F.col("sxx"), F.col("syy"), F.col("sxy")
        ).alias("r_group"),
    )
    o = g.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("sx").cast("bigint").alias("sx"),
        F.sum("sy").cast("bigint").alias("sy"),
        F.sum("sxx").cast("bigint").alias("sxx"),
        F.sum("syy").cast("bigint").alias("syy"),
        F.sum("sxy").cast("bigint").alias("sxy"),
    )
    ro = o.select(
        pearson(
            F.col("n"), F.col("sx"), F.col("sy"), F.col("sxx"), F.col("syy"), F.col("sxy")
        ).alias("r_overall")
    )
    flip = (
        F.col("r_group").isNotNull()
        & F.col("r_overall").isNotNull()
        & (
            ((F.col("r_group") > 0) & (F.col("r_overall") < 0))
            | ((F.col("r_group") < 0) & (F.col("r_overall") > 0))
        )
    )
    return rg.crossJoin(F.broadcast(ro)).select(
        "grp", "n", "r_group", "r_overall", flip.alias("sign_flip")
    )
