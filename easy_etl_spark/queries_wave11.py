"""Wave-11 query catalog: marketing attribution, keyword extraction,
and robust (median/MAD) outlier detection.

New operator families:
  - attribution_touch      first-touch / last-touch conversion attribution
  - keyword_tfidf_top3     per-document TF-IDF keyword extraction
  - robust_outliers_mad    median/MAD robust outliers (vs the mean/sd
                           z-score family, which heavy tails corrupt)

Hash-safety follows the catalog conventions (queries.py docstring);
the interpolated median reuses percentiles_exact's engine-portable
rank formula (queries_wave3._pct_sql rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.textops import tokens
from .queries import register
from .session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------
# Marketing attribution: first / last touch before each conversion
# ----------------------------------------------------------------------

@register(
    "attribution_touch",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                         IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS first_touch,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_touch
      FROM events
    )
    SELECT coalesce(first_touch, 'none') AS first_touch,
           coalesce(last_touch, 'none') AS last_touch,
           count(*) AS n_purchases
    FROM seq WHERE event_type = 'purchase'
    GROUP BY 1, 2
    """,
)
def attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch attribution: every purchase is credited
    to the user's earliest and most recent preceding non-purchase
    event (the two canonical single-touch attribution models), rolled
    up to a (first_touch, last_touch) conversion matrix.

    Scale: both lookbacks ride ONE (user_id)-partitioned,
    (ts, event_id)-ordered window pass — per-user streams, no
    self-join of purchases against history (the naive formulation is
    O(purchases x events-per-user))."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    seq = e.select(
        "event_type",
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce("first_touch", F.lit("none")).alias("first_touch"),
            F.coalesce("last_touch", F.lit("none")).alias("last_touch"),
        )
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )


# ----------------------------------------------------------------------
# Keyword extraction: top-3 TF-IDF terms per document
# ----------------------------------------------------------------------

@register(
    "keyword_tfidf_top3",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
    nd AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
    scored AS (
      SELECT doc_id, tok, tf, df,
             CAST(floor(tf * ln((n + 1.0) / (df + 1.0)) * 1000000.0 + 0.5)
                  AS BIGINT) AS score_units
      FROM tf JOIN df USING (tok) CROSS JOIN nd
    ),
    ranked AS (
      SELECT doc_id, tok, tf, df, score_units,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_units DESC, tok) AS rnk
      FROM scored
    )
    SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, tok, tf, df, score_units
    FROM ranked WHERE rnk <= 3
    """,
)
def keyword_tfidf_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: the 3 highest TF-IDF terms
    (smoothed idf = ln((N+1)/(df+1)), quantized to exact micro-units
    before ranking so the order — and the emitted score — is
    engine-portable; ties break lexicographically).

    Scale: term frequencies are one map-side-combined aggregate; the
    document-frequency table is vocab-sized (bounded by language, not
    corpus) and broadcasts; the top-3 window partitions by doc_id.
    This is the per-doc sibling of the corpus-wide BM25 index in
    operators/search.py."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    nd = tf.agg(F.countDistinct("doc_id").alias("n"))
    scored = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            F.floor(
                F.col("tf")
                * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0))
                * 1000000.0
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("score_units"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score_units").desc(), "tok")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "tok", "tf", "df", "score_units")
    )


# ----------------------------------------------------------------------
# Robust outliers: median/MAD z-scores on per-(type,user,day) spend
# ----------------------------------------------------------------------

def _med_sql(val: str) -> str:
    """DuckDB interpolated median over a ranked CTE carrying
    (``val``, rn, n) — same portable formula as queries_wave3._pct_sql
    at q=0.5, without the cents re-quantization (inputs are already
    exact integers/halves)."""
    lo = "CAST(floor((n - 1) * 0.5) AS BIGINT) + 1"
    lo_v = f"max(CASE WHEN rn = {lo} THEN {val} END)"
    hi_v = f"max(CASE WHEN rn = least({lo} + 1, n) THEN {val} END)"
    frac = "((max(n) - 1) * 0.5 - floor((max(n) - 1) * 0.5))"
    return f"{lo_v} + ({hi_v} - {lo_v}) * {frac}"


def _med_col(val: str):
    """Spark twin of :func:`_med_sql` (same arithmetic, same order)."""
    lo = F.floor((F.col("n") - 1) * 0.5).cast("bigint") + 1
    lo_v = F.max(F.when(F.col("rn") == lo, F.col(val)))
    hi_v = F.max(F.when(F.col("rn") == F.least(lo + 1, F.col("n")), F.col(val)))
    frac = (F.max("n") - 1) * 0.5 - F.floor((F.max("n") - 1) * 0.5)
    return lo_v + (hi_v - lo_v) * frac


@register(
    "robust_outliers_mad",
    f"""
    WITH g AS (
      SELECT event_type, user_id,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS vq
      FROM events GROUP BY 1, 2, 3
    ),
    r1 AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY vq, user_id, d) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM g
    ),
    med AS (
      SELECT event_type, {_med_sql('vq')} AS med FROM r1 GROUP BY event_type
    ),
    dv AS (
      SELECT g.event_type, g.user_id, g.d, g.vq, med.med,
             abs(g.vq - med.med) AS dev
      FROM g JOIN med USING (event_type)
    ),
    r2 AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY dev, user_id, d) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM dv
    ),
    mad AS (
      SELECT event_type, {_med_sql('dev')} AS mad FROM r2 GROUP BY event_type
    )
    SELECT dv.event_type, dv.user_id, dv.d AS day_num,
           dv.vq / 100.0 AS day_spend,
           CAST(floor(0.6745 * (dv.vq - dv.med) / mad.mad * 1000000.0 + 0.5)
                AS BIGINT) AS rz_units
    FROM dv JOIN mad USING (event_type)
    WHERE abs(0.6745 * (dv.vq - dv.med) / mad.mad) > 3.5
    """,
)
def robust_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection on daily per-user spend: modified
    z-score 0.6745·(x − median)/MAD with the |z| > 3.5 Iglewicz-Hoaglin
    cut. Median/MAD resist the heavy tail that inflates a mean/sd
    z-score (events_anomaly_zscore's frame is Poisson-ish counts where
    mean/sd is fine; spend is not).

    Exactness: day-spend is exact cents; median and MAD come from the
    engine-portable rank-interpolation formula (values are .0/.5 exact
    in double), so the flag boundary is bit-deterministic. Scale: both
    rank windows partition by event_type over the (type, user, day)
    rollup — never the raw facts; medians broadcast back."""
    e = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    g = e.groupBy(
        "event_type",
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d"),
    ).agg(F.sum(cents).alias("vq"))
    wt = Window.partitionBy("event_type")
    r1 = g.select(
        "*",
        F.row_number().over(wt.orderBy("vq", "user_id", "d")).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    med = r1.groupBy("event_type").agg(_med_col("vq").alias("med"))
    dv = g.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("vq") - F.col("med"))
    )
    r2 = dv.select(
        "*",
        F.row_number().over(wt.orderBy("dev", "user_id", "d")).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    mad = r2.groupBy("event_type").agg(_med_col("dev").alias("mad"))
    rz = F.lit(0.6745) * (F.col("vq") - F.col("med")) / F.col("mad")
    return (
        dv.join(F.broadcast(mad), "event_type")
        .filter(F.abs(rz) > 3.5)
        .select(
            "event_type",
            "user_id",
            F.col("d").alias("day_num"),
            (F.col("vq") / F.lit(100.0)).alias("day_spend"),
            F.floor(rz * 1000000.0 + F.lit(0.5)).cast("bigint").alias("rz_units"),
        )
    )
