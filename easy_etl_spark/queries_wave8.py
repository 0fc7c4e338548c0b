"""Wave-8 query catalog: sequence mining, record survivorship,
incremental dedup, grouped regression, statistical testing,
embedding classification, and gap imputation.

New operator families (each distinct from every earlier wave):
  - event_transitions         Markov next-event transition matrix
  - golden_record_users       MDM survivorship (latest-wins golden record)
  - dedup_incremental         batch-vs-indexed-base near-dup (ingestion shape)
  - ols_trend_by_type         grouped closed-form OLS (trend per key)
  - chi2_type_value           chi-square independence contingency cells
  - label_centroids           per-class mean embedding (integer-exact)
  - nearest_centroid_confusion  nearest-centroid classifier + confusion matrix
  - events_interpolate        linear-interpolation gap fill (vs LOCF/zero fill)

Hash-safety follows the catalog conventions (queries.py module
docstring): identical aliases both engines, float aggregation through
integer-unit quantization, DuckDB integer ``sum()`` always cast to
BIGINT (never HUGEINT in output or arithmetic), double expressions
spelled with the same shape/order on both engines so IEEE rounding is
bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.exact import dec_sum, sql_sum
from .operators import dedup
from .queries import register
from .session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------
# Sequence mining: Markov transition matrix over per-user event streams
# ----------------------------------------------------------------------

@register(
    "event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (
      SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_total FROM trans GROUP BY 1
    )
    SELECT t.prev_type, t.next_type, t.n,
           round(CAST(t.n AS DOUBLE) / row_total, 6) AS p
    FROM trans t JOIN tot USING (prev_type)
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov next-event transition matrix: P(next | prev) from each
    user's time-ordered stream (tie-broken by event_id, so the order —
    and hence lag() — is total and deterministic).

    Scale: the lag window partitions by user_id — millions of small
    independent partitions, no global window. The transition counts
    collapse to |types|^2 rows; the row totals come from a window SUM
    over that tiny frame (round 11, guide §1.2): the aggregate+join
    form re-executed the whole events scan → lag window → count
    pipeline a second time just to build the |types|-row totals."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wt).cast("bigint"), 6
        ).alias("p"),
    )


# ----------------------------------------------------------------------
# MDM survivorship: latest-wins golden record per entity
# ----------------------------------------------------------------------

@register(
    "golden_record_users",
    f"""
    WITH ranked AS (
      SELECT user_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    stats AS (
      SELECT user_id, count(*) AS n_events,
             {sql_sum('value')} AS lifetime_value,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_seen
      FROM events GROUP BY user_id
    )
    SELECT r.user_id, r.event_type AS last_event_type, r.value AS last_value,
           strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
           s.n_events, s.lifetime_value, s.first_seen
    FROM ranked r JOIN stats s USING (user_id) WHERE rn = 1
    """,
)
def golden_record_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship (golden-record) consolidation: one row per user
    carrying the LATEST observed attributes (latest-wins policy with a
    total (ts, event_id) order) plus lifetime aggregates.

    Scale: both the ranking window and the aggregate partition by the
    entity key — per-entity work only, shuffle on user_id reused by
    both branches; the final join co-partitions on the same key."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        )
    )
    stats = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value").alias("lifetime_value"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_seen"),
    )
    return latest.join(stats, "user_id")


# ----------------------------------------------------------------------
# Incremental dedup: new batch vs already-indexed base corpus
# ----------------------------------------------------------------------

@register(
    "dedup_incremental",
    """
    WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      FROM toks, UNNEST(generate_series(1, greatest(len(t)-2, 1))) AS g(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT nw.doc_id AS new_id, b.doc_id AS base_id, count(*) AS i
      FROM sh nw JOIN sh b ON nw.s = b.s
      WHERE nw.doc_id % 10 >= 8 AND b.doc_id % 10 < 8
      GROUP BY 1, 2
    )
    SELECT new_id, base_id,
           round(i * 1.0 / (sn.n + sb.n - i), 4) AS jaccard
    FROM inter
    JOIN sizes sn ON sn.doc_id = new_id
    JOIN sizes sb ON sb.doc_id = base_id
    WHERE round(i * 1.0 / (sn.n + sb.n - i), 4) >= 0.8
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion dedup: which docs of an arriving batch
    (doc_id % 10 >= 8 stands in for 'today's crawl') near-duplicate the
    already-indexed base corpus? Unlike the self-join dedups, cost is
    proportional to the BATCH (new-index x base-index equi-join on the
    shingle key — never base x base), which is what keeps daily dedup
    affordable against a 100 TB historical index."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 10 < 8)
    new = docs.filter(F.col("doc_id") % 10 >= 8)
    return dedup.incremental_jaccard_dups(base, new, threshold=0.8)


# ----------------------------------------------------------------------
# Grouped closed-form OLS: value trend per event type
# ----------------------------------------------------------------------

@register(
    "ols_trend_by_type",
    """
    WITH m AS (SELECT CAST(min(floor(epoch(ts))) AS BIGINT) AS min_s FROM events),
    xy AS (
      SELECT event_type,
             CAST(floor((CAST(floor(epoch(ts)) AS BIGINT) - min_s) / 3600) AS BIGINT) AS x,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
      FROM events, m
    ),
    s AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx
      FROM xy GROUP BY event_type
    )
    SELECT event_type, n,
           round(CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
                 / 100.0, 6) + 0.0 AS slope_per_hour,
           round(CAST(sy AS DOUBLE) / 100.0 / n
                 - CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
                   / 100.0 * (CAST(sx AS DOUBLE) / n), 4) + 0.0 AS intercept
    FROM s
    """,
)
def ols_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares trend line (is `value` drifting over the
    month, per event type?) from the closed form — five exact integer
    co-moments (n, Sx, Sy, Sxy, Sxx) in centi-value units and hour
    offsets, then slope/intercept as the SAME double expression on both
    engines. No window, no iteration: one map-side-combined aggregate,
    so the shuffle carries |types| rows at any scale. The 1-row global
    min timestamp broadcasts."""
    e = _t(spark, sf_dir, "events")
    min_s = e.agg(F.min(F.unix_timestamp("ts")).alias("min_s"))
    x = F.floor(
        (F.unix_timestamp("ts") - F.col("min_s")) / F.lit(3600)
    ).cast("bigint")
    y = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    s = (
        e.crossJoin(F.broadcast(min_s))
        .select("event_type", x.alias("x"), y.alias("y"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den / F.lit(100.0)
    mean_y = F.col("sy").cast("double") / F.lit(100.0) / F.col("n")
    mean_x = F.col("sx").cast("double") / F.col("n")
    return s.select(
        "event_type",
        "n",
        # +0.0 maps a rounded -0.0 to 0.0 on both engines (Spark's
        # BigDecimal round already loses the sign; DuckDB's keeps it)
        (F.round(slope, 6) + F.lit(0.0)).alias("slope_per_hour"),
        (F.round(mean_y - slope * mean_x, 4) + F.lit(0.0)).alias("intercept"),
    )


# ----------------------------------------------------------------------
# Statistical testing: chi-square independence contingency table
# ----------------------------------------------------------------------

@register(
    "chi2_type_value",
    """
    WITH cells AS (
      SELECT event_type,
             CASE WHEN value < 100 THEN 'low'
                  WHEN value < 300 THEN 'mid' ELSE 'high' END AS bucket,
             count(*) AS o
      FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
    ct AS (SELECT bucket, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
    SELECT cells.event_type, cells.bucket, o,
           round(CAST(r AS DOUBLE) * c / n, 3) AS expected,
           round(CAST(o*n - r*c AS DOUBLE) * CAST(o*n - r*c AS DOUBLE)
                 / (CAST(n AS DOUBLE) * r * c), 6) AS chi2_term
    FROM cells JOIN rt USING (event_type) JOIN ct USING (bucket), tot
    """,
)
def chi2_type_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test cells: is event value magnitude
    (low/mid/high) independent of event type? Observed counts are
    exact; expected counts and per-cell chi2 contributions use the
    identical integer-derived double expression on both engines
    ((o*n - r*c)^2 / (n*r*c) — exact bigint inside the casts), so every
    cell is bit-deterministic. One aggregate over the fact table; row
    totals, column totals, and the grand total all derive from the
    |types| x |buckets| cell frame (tiny), then broadcast back."""
    e = _t(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 100, "low")
        .when(F.col("value") < 300, "mid")
        .otherwise("high")
    )
    cells = e.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("o")
    )
    rt = cells.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = cells.groupBy("bucket").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("n"))
    d = F.col("o") * F.col("n") - F.col("r") * F.col("c")
    chi2_term = (
        d.cast("double") * d.cast("double")
        / (F.col("n").cast("double") * F.col("r") * F.col("c"))
    )
    return (
        cells.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "bucket")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "bucket",
            "o",
            F.round(F.col("r").cast("double") * F.col("c") / F.col("n"), 3).alias(
                "expected"
            ),
            F.round(chi2_term, 6).alias("chi2_term"),
        )
    )


# ----------------------------------------------------------------------
# Embedding classification: per-label centroids + nearest-centroid
# ----------------------------------------------------------------------

@register(
    "label_centroids",
    """
    WITH dims AS (
      SELECT unnest(range(1, (SELECT CAST(max(len(embedding)) + 1 AS BIGINT)
                              FROM embeddings))) AS d
    ),
    ex AS (
      SELECT label, d,
             CAST(floor(CAST(embedding[d] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xq
      FROM embeddings CROSS JOIN dims
    ),
    agg AS (
      SELECT label, d, count(*) AS n_vecs, CAST(sum(xq) AS BIGINT) AS s
      FROM ex GROUP BY 1, 2
    )
    SELECT label, d - 1 AS dim, n_vecs,
           round(CAST(s AS DOUBLE) / n_vecs / 1000000.0, 6) + 0.0 AS centroid
    FROM agg
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class mean embedding (class centroids — the building block
    of centroid classifiers, semantic sharding, and prototype search).
    Each float is quantized to exact micro-units per (label, dim) so the
    mean is an integer sum divided once — order-independent and
    engine-portable. posexplode is map-side only; the single shuffle
    carries |labels| x dims groups."""
    emb = _t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("dim", "xv")
    ).select(
        "label",
        "dim",
        F.floor(F.col("xv").cast("double") * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("xq"),
    )
    agg = ex.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n_vecs"), F.sum("xq").alias("s")
    )
    return agg.select(
        "label",
        "dim",
        "n_vecs",
        (
            F.round(
                F.col("s").cast("double") / F.col("n_vecs") / F.lit(1000000.0), 6
            )
            + F.lit(0.0)
        ).alias("centroid"),
    )


@register(
    "nearest_centroid_confusion",
    """
    WITH dims AS (
      SELECT unnest(range(1, (SELECT CAST(max(len(embedding)) + 1 AS BIGINT)
                              FROM embeddings))) AS d
    ),
    ex AS (
      SELECT vec_id, label, d,
             CAST(floor(CAST(embedding[d] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS xq
      FROM embeddings CROSS JOIN dims
    ),
    cents AS (
      SELECT label AS pred_label, d,
             CAST(floor(CAST(sum(xq) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS cq
      FROM ex GROUP BY 1, 2
    ),
    dist AS (
      SELECT ex.vec_id, ex.label, cents.pred_label,
             CAST(sum((xq - cq) * (xq - cq)) AS BIGINT) AS dist
      FROM ex JOIN cents ON ex.d = cents.d
      GROUP BY 1, 2, 3
    ),
    best AS (
      SELECT vec_id, label, pred_label,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist, pred_label) AS rn
      FROM dist
    )
    SELECT label AS true_label, pred_label, count(*) AS n
    FROM best WHERE rn = 1 GROUP BY 1, 2
    """,
)
def nearest_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classification with a confusion matrix: every
    vector is assigned to the closest class centroid (squared L2 in
    exact milli-unit integers — distances, and thus the argmin, are
    engine-portable; ties break toward the lower label).

    Scale: centroids are |labels| x dims rows — broadcast. The explode
    + join + per-vector aggregate is one linear pass; the argmin window
    partitions by vec_id. No all-pairs anywhere; the train step is the
    same single aggregate as label_centroids."""
    emb = _t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "xv")
    ).select(
        "vec_id",
        "label",
        "dim",
        F.floor(F.col("xv").cast("double") * 1000 + F.lit(0.5))
        .cast("bigint")
        .alias("xq"),
    )
    cents = (
        ex.groupBy(F.col("label").alias("pred_label"), "dim")
        .agg(F.count(F.lit(1)).alias("nv"), F.sum("xq").alias("s"))
        .select(
            "pred_label",
            "dim",
            F.floor(F.col("s").cast("double") / F.col("nv") + F.lit(0.5))
            .cast("bigint")
            .alias("cq"),
        )
    )
    d = F.col("xq") - F.col("cq")
    dist = (
        ex.join(F.broadcast(cents), "dim")
        .groupBy("vec_id", "label", "pred_label")
        .agg(F.sum(d * d).alias("dist"))
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "pred_label")
    best = dist.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return best.groupBy(
        F.col("label").alias("true_label"), "pred_label"
    ).agg(F.count(F.lit(1)).alias("n"))


# ----------------------------------------------------------------------
# Gap imputation: linear interpolation over a regular time grid
# ----------------------------------------------------------------------

@register(
    "events_interpolate",
    """
    WITH obs AS (
      SELECT event_type,
             CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 900) AS BIGINT) AS b,
             CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS s,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    vq AS (
      SELECT event_type, b,
             CAST(floor(CAST(s AS DOUBLE) / cnt + 0.5) AS BIGINT) AS v
      FROM obs
    ),
    rng AS (SELECT event_type, min(b) AS lo, max(b) AS hi FROM vq GROUP BY 1),
    grid AS (SELECT event_type, unnest(range(lo, hi + 1)) AS b FROM rng),
    joined AS (
      SELECT grid.event_type, grid.b, vq.v FROM grid
      LEFT JOIN vq ON grid.event_type = vq.event_type AND grid.b = vq.b
    ),
    ctx AS (
      SELECT event_type, b, v,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pm,
             first_value(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY b
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY b
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nm
      FROM joined
    )
    SELECT event_type, b AS bucket, v IS NOT NULL AS is_observed,
           CAST(floor(CASE
             WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               CAST(pv AS DOUBLE)
               + CAST(nv - pv AS DOUBLE) * (b - pm) / (nm - pm)
             WHEN pv IS NOT NULL THEN CAST(pv AS DOUBLE)
             ELSE CAST(nv AS DOUBLE)
           END + 0.5) AS BIGINT) / 1000000.0 AS avg_value
    FROM ctx
    """,
)
def events_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill on a regular 15-minute grid (the
    imputation sibling of events_resample_fill's zero-fill/LOCF): empty
    buckets take the line between the nearest observed neighbors;
    leading/trailing gaps extend the nearest endpoint. Bucket means are
    exact micro-unit integers, so the interpolation inputs — and the
    single double expression both engines evaluate — are identical.

    Scale: the grid explodes per event_type between ITS min/max bucket
    (no global grid), and all four neighbor lookups ride one
    (event_type, b)-sorted window partition pair."""
    e = _t(spark, sf_dir, "events")
    b = F.floor(F.unix_timestamp("ts") / F.lit(900)).cast("bigint")
    yq = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
    obs = e.groupBy("event_type", b.alias("b")).agg(
        F.sum(yq).alias("s"), F.count(F.lit(1)).alias("cnt")
    )
    vq = obs.select(
        "event_type",
        "b",
        F.floor(F.col("s").cast("double") / F.col("cnt") + F.lit(0.5))
        .cast("bigint")
        .alias("v"),
    )
    grid = (
        vq.groupBy("event_type")
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("b"),
        )
    )
    joined = grid.join(vq, ["event_type", "b"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    marker = F.when(F.col("v").isNotNull(), F.col("b"))
    ctx = joined.select(
        "event_type",
        "b",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(marker, ignorenulls=True).over(wp).alias("pm"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(marker, ignorenulls=True).over(wn).alias("nm"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v").cast("double"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv").cast("double")
            + (F.col("nv") - F.col("pv")).cast("double")
            * (F.col("b") - F.col("pm"))
            / (F.col("nm") - F.col("pm")),
        )
        .when(F.col("pv").isNotNull(), F.col("pv").cast("double"))
        .otherwise(F.col("nv").cast("double"))
    )
    # floor-to-integer-micro-units, then ONE exact division: `round()`
    # on the raw double disagrees between engines at half-even
    # boundaries (see functions/exact.py) — floor(x + 0.5) does not.
    micro = F.floor(interp + F.lit(0.5)).cast("bigint")
    return ctx.select(
        "event_type",
        F.col("b").alias("bucket"),
        F.col("v").isNotNull().alias("is_observed"),
        (micro / F.lit(1000000.0)).alias("avg_value"),
    )
