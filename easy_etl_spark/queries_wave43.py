"""Wave-43 query catalog: cross-source distribution alignment,
experiment evaluation, heavy-tail diagnostics, and arrival-process
dispersion.

New operator families:
  - quantile_normalize_values  quantile normalization (the
                          microarray-era classic: Bolstad 2003) of
                          per-source doc-length distributions onto the
                          pooled distribution — the transform a
                          multi-feed corpus applies so one feed's
                          length profile can't dominate a
                          length-stratified sampler; built on the
                          banded global_row_number (NO single-
                          partition sort anywhere)
  - ab_conversion_ztest   two-proportion pooled z-test of purchase
                          conversion between deterministic user
                          cohorts (even/odd user_id) — the A/B gate
                          every event pipeline ships; IEEE sqrt is
                          correctly rounded so the statistic is
                          bit-identical across engines
  - zipf_tail_alpha       Hill (1975) tail-index estimate of the
                          token-frequency distribution over the
                          top-100 tokens — the Zipf-alpha gauge that
                          tells a tokenizer team how head-heavy a
                          crawl is before they budget a vocab
  - interarrival_dispersion  per event-type dispersion of per-user
                          inter-arrival times: coefficient-of-
                          variation² and the Goh-Barabási burstiness
                          index — Poisson-ness check for synthetic
                          load vs organic traffic

Hash-safety: ranks/positions are pure integer arithmetic (floor
division, never round-half); variance uses exact int64 sums cast to
double in the SAME expression order on both engines; ln appears only
in the Hill sum (rounded at 6, the `unigram_logprob` precedent) and
sqrt is IEEE-correctly-rounded everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.ranking import global_row_number
from .queries import register
from .session import load_table

# ----------------------------------------------------------------------
# Quantile normalization of per-source doc lengths
# ----------------------------------------------------------------------


@register(
    "quantile_normalize_values",
    """
    WITH d AS (SELECT doc_id, source, n_chars FROM documents),
    s AS (SELECT source, count(*) AS n_s FROM d GROUP BY 1),
    t AS (SELECT count(*) AS n FROM d),
    wr AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS r
      FROM d
    ),
    pr AS (
      SELECT n_chars AS norm_val,
             row_number() OVER (ORDER BY n_chars, doc_id) AS grn
      FROM d
    ),
    m AS (
      SELECT wr.source, wr.r, s.n_s,
             1 + ((wr.r - 1) * (t.n - 1)) // greatest(s.n_s - 1, 1) AS pos
      FROM wr JOIN s USING (source) CROSS JOIN t
    ),
    j AS (SELECT m.source, m.r, m.n_s, pr.norm_val
          FROM m JOIN pr ON pr.grn = m.pos)
    SELECT source,
           count(*) AS n_docs,
           round(sum(norm_val) * 1.0 / count(*), 6) AS avg_norm,
           CAST(max(CASE WHEN r = (n_s + 1) // 2 THEN norm_val END)
                AS BIGINT) AS median_norm
    FROM j GROUP BY source
    """,
)
def quantile_normalize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalize each source's doc-length distribution onto
    the pooled corpus distribution: a doc at within-source rank r maps
    to the pooled value at position 1 + (r-1)(N-1)//(n_s-1) — pure
    integer arithmetic, so the mapping is identical on any engine.
    Reported per source: mean and median of the NORMALIZED lengths
    (after normalization all sources should sit on near-identical
    summaries — the residual spread IS the discretization error).

    Scale: the within-source rank is a window partitioned by source
    (each source shuffles independently); the pooled rank is the
    banded `global_row_number` — per-partition local sort + bounded
    offset scan, NO single-partition stage; the rank→value mapping is
    a corpus×corpus equi-join on a dense integer key AQE handles like
    any fact-fact join."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    n_s = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wr = d.withColumn("r", F.row_number().over(w))
    ranked, total = global_row_number(
        d.select("n_chars", "doc_id"), [F.col("n_chars"), F.col("doc_id")],
        out_col="grn", with_total=True,
    )
    pooled = ranked.select(F.col("n_chars").alias("norm_val"), "grn")
    # `div` is true integer floor division on both engines; a double
    # `/` + floor() could round a just-below-integer quotient up
    m = wr.join(F.broadcast(n_s), "source").withColumn(
        "pos",
        (
            1
            + F.expr(
                f"((r - 1) * CAST({int(total) - 1} AS BIGINT))"
                " div greatest(n_s - 1, 1)"
            )
        ).cast("bigint"),
    )
    j = m.join(pooled, m["pos"] == pooled["grn"])
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("norm_val") * 1.0 / F.count(F.lit(1)), 6).alias("avg_norm"),
        F.max(
            F.when(F.col("r") == F.expr("(n_s + 1) div 2"), F.col("norm_val"))
        ).cast("bigint").alias("median_norm"),
    )


# ----------------------------------------------------------------------
# Two-proportion conversion z-test
# ----------------------------------------------------------------------


@register(
    "ab_conversion_ztest",
    """
    WITH u AS (
      SELECT user_id % 2 AS cohort,
             max(CASE WHEN event_type = 'purchase' AND value > 95
                      THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT cohort, count(*) AS n, CAST(sum(conv) AS BIGINT) AS k
      FROM u GROUP BY cohort
    ),
    wide AS (
      SELECT max(CASE WHEN cohort = 0 THEN n END) AS n0,
             max(CASE WHEN cohort = 0 THEN k END) AS k0,
             max(CASE WHEN cohort = 1 THEN n END) AS n1,
             max(CASE WHEN cohort = 1 THEN k END) AS k1
      FROM c
    )
    SELECT n0, k0, n1, k1,
           round(k0 * 1.0 / n0, 6) AS p0,
           round(k1 * 1.0 / n1, 6) AS p1,
           CASE WHEN k0 + k1 > 0 AND k0 + k1 < n0 + n1
                THEN round((k0 * 1.0 / n0 - k1 * 1.0 / n1)
                     / sqrt(((k0 + k1) * 1.0 / (n0 + n1))
                            * (1.0 - (k0 + k1) * 1.0 / (n0 + n1))
                            * (1.0 / n0 + 1.0 / n1)), 6)
                END AS z
    FROM wide
    """,
)
def ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z-test of purchase conversion between the
    even and odd user_id cohorts (a deterministic 50/50 split — the
    hash-bucket assignment an experimentation platform would use).

    Scale: one groupBy(user_id) collapses the event stream to one row
    per user (the natural shuffle), one tiny groupBy(cohort), then a
    2-row pivot. The statistic is built from four exact integers with
    the division/sqrt sequence written identically on both engines —
    IEEE sqrt is correctly rounded, so z matches bit-for-bit before
    its round(6)."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 95), 1
            ).otherwise(0)
        ).alias("conv")
    )
    c = u.groupBy((F.col("user_id") % 2).alias("cohort")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").cast("bigint").alias("k")
    )
    wide = c.agg(
        F.max(F.when(F.col("cohort") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("cohort") == 0, F.col("k"))).alias("k0"),
        F.max(F.when(F.col("cohort") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("cohort") == 1, F.col("k"))).alias("k1"),
    )
    pp = (F.col("k0") + F.col("k1")) * 1.0 / (F.col("n0") + F.col("n1"))
    z = (F.col("k0") * 1.0 / F.col("n0") - F.col("k1") * 1.0 / F.col("n1")) / F.sqrt(
        pp * (1.0 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
    )
    nondegenerate = (F.col("k0") + F.col("k1") > 0) & (
        F.col("k0") + F.col("k1") < F.col("n0") + F.col("n1")
    )
    return wide.select(
        "n0", "k0", "n1", "k1",
        F.round(F.col("k0") * 1.0 / F.col("n0"), 6).alias("p0"),
        F.round(F.col("k1") * 1.0 / F.col("n1"), 6).alias("p1"),
        F.when(nondegenerate, F.round(z, 6)).alias("z"),
    )


# ----------------------------------------------------------------------
# Hill tail-index (Zipf alpha) of token frequencies
# ----------------------------------------------------------------------

HILL_K = 100


@register(
    "zipf_tail_alpha",
    f"""
    WITH tok AS (
      SELECT unnest(string_split(trim(text), ' ')) AS t FROM documents
    ),
    freq AS (SELECT t, count(*) AS f FROM tok GROUP BY t),
    top AS (SELECT f FROM freq ORDER BY f DESC, t LIMIT {HILL_K}),
    xmin AS (SELECT min(f) AS fmin FROM top)
    SELECT {HILL_K} AS k,
           CAST(fmin AS BIGINT) AS f_min,
           round(sum(ln(f * 1.0 / fmin)), 6) AS sum_ln,
           CASE WHEN sum(ln(f * 1.0 / fmin)) > 0
                THEN round(1.0 + {HILL_K} / sum(ln(f * 1.0 / fmin)), 6)
                END AS alpha
    FROM top CROSS JOIN xmin
    GROUP BY fmin
    """,
)
def zipf_tail_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the Zipf tail exponent over the 100 most
    frequent tokens: alpha = 1 + k / Σ ln(f_i / f_min). The
    head-heaviness gauge for a crawl — alpha near 2 is classic
    natural-language Zipf; far higher means a synthetic or
    template-heavy corpus.

    Scale: token frequency is the vocab explode+groupBy every text op
    pays; the top-k cut is TakeOrderedAndProject (distributed partial
    top-k, deterministic (f DESC, token) tie-break); everything after
    runs on k rows."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(F.split(F.trim("text"), " ")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    top = freq.orderBy(F.col("f").desc(), "t").limit(HILL_K).select("f")
    fmin = top.agg(F.min("f").cast("bigint").alias("f_min"))
    # per-row ln over the k frequencies, then one sum — association
    # order is irrelevant at round(6) for k=100 O(1)-sized terms
    ex = top.crossJoin(F.broadcast(fmin))
    s = ex.agg(
        F.max("f_min").alias("f_min"),
        F.sum(F.log(F.col("f") * 1.0 / F.col("f_min"))).alias("s"),
    )
    return s.select(
        F.lit(HILL_K).alias("k"),
        "f_min",
        F.round("s", 6).alias("sum_ln"),
        F.when(F.col("s") > 0, F.round(1.0 + F.lit(HILL_K) / F.col("s"), 6)).alias(
            "alpha"
        ),
    )


# ----------------------------------------------------------------------
# Inter-arrival dispersion / burstiness
# ----------------------------------------------------------------------


@register(
    "interarrival_dispersion",
    """
    WITH seq AS (
      SELECT event_type,
             floor(epoch(ts)) AS s,
             lead(floor(epoch(ts))) OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    gaps AS (
      SELECT event_type, CAST(nxt - s AS BIGINT) AS g
      FROM seq WHERE nxt IS NOT NULL
    ),
    agg AS (
      SELECT event_type, count(*) AS n_gaps,
             CAST(sum(g) AS BIGINT) AS sg,
             CAST(sum(g * g) AS BIGINT) AS sg2
      FROM gaps GROUP BY event_type
    )
    SELECT event_type, n_gaps,
           round(sg * 1.0 / n_gaps, 6) AS mean_gap_s,
           round((sg2 - (CAST(sg AS DOUBLE) * sg) / n_gaps) / n_gaps, 6)
             AS var_gap_s,
           round(((sg2 - (CAST(sg AS DOUBLE) * sg) / n_gaps) / n_gaps)
                 / ((sg * 1.0 / n_gaps) * (sg * 1.0 / n_gaps)), 6) AS cv2,
           round((sqrt(((sg2 - (CAST(sg AS DOUBLE) * sg) / n_gaps) / n_gaps))
                  - sg * 1.0 / n_gaps)
                 / (sqrt(((sg2 - (CAST(sg AS DOUBLE) * sg) / n_gaps) / n_gaps))
                    + sg * 1.0 / n_gaps), 6) AS burstiness
    FROM agg
    """,
)
def interarrival_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event-type dispersion of per-user inter-arrival times:
    CV² = Var/Mean² (1 for a Poisson process) and the Goh-Barabási
    burstiness B = (σ-μ)/(σ+μ) ∈ (-1, 1) — the standard check that a
    'user activity' stream is organic rather than a fixed-rate
    replay.

    Scale: ONE window partitioned by (user_id, event_type) — the
    natural key, no skew; per-type sums are exact int64 (gap seconds
    squared stay far under 2^63 at any rung) and every float op after
    is the same expression tree on both engines, so the round(6)
    comparison is deterministic. The int64→double promotion happens
    INSIDE the sg*sg term on purpose: a pure-int sg*sg would overflow
    int64 on Spark while DuckDB silently widens to hugeint — writing
    the cast explicitly makes both engines compute the identical
    double product."""
    ev = load_table(spark, sf_dir, "events")
    s = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1000000.0))
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select("event_type", s.alias("s"), "user_id", "ts", "event_id").withColumn(
        "nxt", F.lead("s").over(w)
    )
    gaps = seq.where(F.col("nxt").isNotNull()).select(
        "event_type", (F.col("nxt") - F.col("s")).cast("bigint").alias("g")
    )
    agg = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("g").cast("bigint").alias("sg"),
        F.sum(F.col("g") * F.col("g")).cast("bigint").alias("sg2"),
    )
    mean = F.col("sg") * 1.0 / F.col("n_gaps")
    var = (F.col("sg2") - (F.col("sg").cast("double") * F.col("sg")) / F.col("n_gaps")) / F.col(
        "n_gaps"
    )
    sd = F.sqrt(var)
    return agg.select(
        "event_type",
        "n_gaps",
        F.round(mean, 6).alias("mean_gap_s"),
        F.round(var, 6).alias("var_gap_s"),
        F.round(var / (mean * mean), 6).alias("cv2"),
        F.round((sd - mean) / (sd + mean), 6).alias("burstiness"),
    )
