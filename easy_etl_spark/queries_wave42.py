"""Wave-42 query catalog: cross-source duplication accounting,
survival analysis over reorder behaviour, forecast-accuracy
evaluation, and corpus boilerplate detection.

New operator families:
  - dup_source_matrix     which SOURCES duplicate each other: the
                          exact n-gram Jaccard near-dup pairs rolled
                          up to an (source_a, source_b) matrix — the
                          first question a crawl-curation team asks
                          before dropping a feed (is src3 just a
                          mirror of src1?)
  - kaplan_meier_retention Kaplan-Meier survival estimator (1958)
                          over customer reorder gaps with proper
                          right-censoring at the corpus horizon — the
                          canonical "how long until the next order"
                          curve, computed distributively from one
                          window pass + one bounded aggregate
  - seasonal_naive_mase   forecast-accuracy gate: MASE (Hyndman &
                          Koehler 2006) of the lag-7 seasonal-naive
                          forecast vs the lag-1 naive baseline on
                          daily event counts per type — the sanity
                          metric a pipeline tracks before trusting
                          any fancier forecaster
  - boilerplate_trigrams  C4-style boilerplate detection: the 20
                          globally most document-frequent word
                          trigrams, and per source the share of its
                          docs carrying at least one — the signal
                          used to strip nav-bars/license banners
                          before LLM training

Hash-safety follows the catalog conventions (queries.py docstring):
counts are exact integers; the only floats are final ratios rounded
at 6 (Jaccard inherits the operator's round-4 contract), and the
KM survival is exp(Σ ln·) with an explicit zero-hazard guard so
Spark's null-on-ln(0) and an oracle's -inf can never diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import dedup
from .operators.dedup import array_shingles
from .queries import register
from .session import load_table, track_cache

# ----------------------------------------------------------------------
# Cross-source duplication matrix
# ----------------------------------------------------------------------

_JACCARD_PAIRS_SQL = """
    toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      FROM toks, UNNEST(generate_series(1, greatest(len(t)-2, 1))) AS g(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b, round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8
    )
"""


@register(
    "dup_source_matrix",
    f"""
    WITH {_JACCARD_PAIRS_SQL}
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           count(*) AS n_pairs,
           round(avg(p.jaccard), 6) AS avg_jaccard
    FROM pairs p
    JOIN documents da ON da.doc_id = p.id_a
    JOIN documents db ON db.doc_id = p.id_b
    GROUP BY 1, 2
    """,
)
def dup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplication rolled up to the source level: every exact
    n-gram-Jaccard pair (threshold 0.8, the `dedup_ngram_jaccard`
    contract) contributes one cell count to the unordered
    (source_a, source_b) matrix. A diagonal-heavy matrix means
    within-feed re-posts; a hot off-diagonal cell means one feed
    mirrors another and can be dropped wholesale before training.

    Scale: pair generation is the inverted shingle index self-join
    (sub-quadratic, shared-shingle pairs only); the rollup adds two
    dim-sized joins to fetch sources (the doc->source map is tiny
    relative to the text it drops) and a groupBy over at most
    |sources|² cells."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.8)
    src = docs.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("__sa"))
    sb = src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("__sb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .groupBy(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("jaccard"), 6).alias("avg_jaccard"),
        )
    )


# ----------------------------------------------------------------------
# Kaplan-Meier reorder survival
# ----------------------------------------------------------------------


@register(
    "kaplan_meier_retention",
    """
    WITH horizon AS (SELECT max(CAST(o_orderdate AS DATE)) AS h FROM orders),
    seq AS (
      SELECT o_custkey,
             CAST(o_orderdate AS DATE) AS d,
             lead(CAST(o_orderdate AS DATE))
               OVER (PARTITION BY o_custkey
                     ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS nxt
      FROM orders
    ),
    dur AS (
      SELECT CASE WHEN nxt IS NULL
                  THEN datediff('day', d, (SELECT h FROM horizon))
                  ELSE datediff('day', d, nxt) END AS gap_days,
             CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS event
      FROM seq
    ),
    wk AS (
      SELECT CAST(gap_days // 7 AS BIGINT) AS t_week,
             CAST(sum(event) AS BIGINT) AS n_event,
             CAST(count(*) - sum(event) AS BIGINT) AS n_censored,
             count(*) AS n
      FROM dur GROUP BY 1
    ),
    km AS (
      SELECT t_week, n_event, n_censored,
             CAST(sum(n) OVER (ORDER BY t_week DESC) AS BIGINT) AS n_risk
      FROM wk
    )
    SELECT t_week, n_risk, n_event, n_censored,
           CASE WHEN max(CASE WHEN n_event >= n_risk THEN 1 ELSE 0 END)
                     OVER (ORDER BY t_week) = 1
                THEN 0.0
                ELSE round(exp(
                       CAST(sum(CASE WHEN n_event < n_risk AND n_event > 0
                                THEN CAST(floor(ln(1.0 - n_event * 1.0 / n_risk)
                                          * 1000000.0 + 0.5) AS BIGINT)
                                ELSE 0 END)
                            OVER (ORDER BY t_week) AS DOUBLE)
                       / 1000000.0), 6) END AS survival
    FROM km
    """,
)
def kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier estimate of the time-to-next-order curve, weekly
    buckets. Each order contributes one duration: to the customer's
    next order (event) or to the corpus horizon (right-censored) —
    the textbook product-limit estimator with censoring handled
    properly, not dropped.

    Scale: ONE window pass over orders partitioned by customer (the
    natural shuffle key, no skew — order counts per customer are
    bounded), then every downstream cumulative over the week-count-
    sized aggregate rides the BANDED prefix primitives
    (`packing.global_running_offset` / `ranking.global_prior_max`) —
    no Sort→Exchange-SinglePartition stage anywhere, so the catalog's
    global-sort gate holds even though the frame is provably tiny.
    The log-hazard is quantized to integer micro-nats (the
    unigram_logprob convention) so its prefix sum is EXACT integer
    arithmetic — order-free, engine-identical. Survival is
    exp(Σunits/1e6) with d==n handled by an explicit sticky zero flag,
    because Spark's ln(0) is NULL while SQL engines return -inf — the
    guard makes both emit exactly 0.0 from the first exhausted week
    onward."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("d"), "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    seq = orders.withColumn("nxt", F.lead("d").over(w))
    horizon = orders.agg(F.max("d").alias("h"))
    dur = seq.crossJoin(F.broadcast(horizon)).select(
        F.when(F.col("nxt").isNull(), F.datediff("h", "d"))
        .otherwise(F.datediff("nxt", "d"))
        .alias("gap_days"),
        F.when(F.col("nxt").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("event"),
    )
    wk = dur.groupBy(
        F.floor(F.col("gap_days") / 7).cast("bigint").alias("t_week")
    ).agg(
        F.sum("event").cast("bigint").alias("n_event"),
        (F.count(F.lit(1)) - F.sum("event")).cast("bigint").alias("n_censored"),
        F.count(F.lit(1)).alias("n"),
    )
    # the KM table is week-count-sized from here on, but cumulatives
    # still ride the BANDED primitives — never an unpartitioned window
    from .operators.packing import global_running_offset
    from .operators.ranking import global_prior_max

    total = wk.agg(F.sum("n").cast("bigint").alias("__N"))
    km = (
        global_running_offset(wk, "n", "t_week", out_col="__before")
        .crossJoin(F.broadcast(total))
        .withColumn("n_risk", (F.col("__N") - F.col("__before")).cast("bigint"))
    )
    hazard_units = F.when(
        (F.col("n_event") < F.col("n_risk")) & (F.col("n_event") > 0),
        F.floor(
            F.log(1.0 - F.col("n_event") / F.col("n_risk")) * 1000000.0 + F.lit(0.5)
        ).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    km = km.withColumn("__h", hazard_units).withColumn(
        "__dead", F.when(F.col("n_event") >= F.col("n_risk"), 1).otherwise(0)
    )
    km = global_running_offset(km, "__h", "t_week", out_col="__h_before")
    km = global_prior_max(km, "__dead", [F.col("t_week")], out_col="__dead_before")
    dead = F.greatest(F.coalesce(F.col("__dead_before"), F.lit(0)), F.col("__dead"))
    h_incl = (F.col("__h_before") + F.col("__h")).cast("double") / 1000000.0
    return km.select(
        "t_week",
        "n_risk",
        "n_event",
        "n_censored",
        F.when(dead == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(h_incl), 6))
        .alias("survival"),
    )


# ----------------------------------------------------------------------
# Seasonal-naive MASE
# ----------------------------------------------------------------------


@register(
    "seasonal_naive_mase",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS y
      FROM events GROUP BY 1, 2
    ),
    scored AS (
      SELECT c.event_type, c.y,
             s.y AS y_lag7, n.y AS y_lag1
      FROM daily c
      JOIN daily s ON s.event_type = c.event_type AND s.d = c.d - INTERVAL 7 DAY
      JOIN daily n ON n.event_type = c.event_type AND n.d = c.d - INTERVAL 1 DAY
    )
    SELECT event_type,
           count(*) AS n_days,
           CAST(sum(abs(y - y_lag7)) AS BIGINT) AS abs_err_seasonal,
           CAST(sum(abs(y - y_lag1)) AS BIGINT) AS abs_err_naive,
           round(sum(abs(y - y_lag7)) * 1.0 / sum(abs(y - y_lag1)), 6) AS mase
    FROM scored GROUP BY event_type
    """,
)
def seasonal_naive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE of the lag-7 seasonal-naive forecast of daily event counts
    per type, scaled by the lag-1 naive baseline — computed only on
    days where both references exist (equi-joins on shifted dates, so
    calendar gaps can never silently misalign the way a row-offset
    LAG would).

    Scale: the daily aggregate collapses the event stream to
    |types| × |days| rows before any join; the two self-joins and the
    final groupBy all run on that collapsed table. Error sums stay
    exact integers; MASE is the single final division."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    lag7 = daily.select(
        "event_type", F.date_add("d", 7).alias("d"), F.col("y").alias("y_lag7")
    )
    lag1 = daily.select(
        "event_type", F.date_add("d", 1).alias("d"), F.col("y").alias("y_lag1")
    )
    scored = daily.join(lag7, ["event_type", "d"]).join(lag1, ["event_type", "d"])
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.abs(F.col("y") - F.col("y_lag7"))).cast("bigint").alias("abs_err_seasonal"),
        F.sum(F.abs(F.col("y") - F.col("y_lag1"))).cast("bigint").alias("abs_err_naive"),
        F.round(
            F.sum(F.abs(F.col("y") - F.col("y_lag7")))
            / F.sum(F.abs(F.col("y") - F.col("y_lag1"))),
            6,
        ).alias("mase"),
    )


# ----------------------------------------------------------------------
# Boilerplate trigram detection
# ----------------------------------------------------------------------

BOILERPLATE_TOP = 20


def _exact_top_df_trigrams(sh: DataFrame, k: int) -> DataFrame:
    """Top-k trigrams by exact document frequency (ties: lexical),
    candidate-pruned — see boilerplate_trigrams docstring for the
    soundness argument. ``sh`` should be cached by the caller: the
    candidate pass, the exact-df pass, and the caller's hit join all
    re-read it. Returns a k-row LITERAL frame with column ``s`` (the
    winners are bounded metadata — k strings — so materializing them
    driver-side lets the caller's final action skip re-running both
    aggregation passes)."""
    spark = sh.sparkSession
    hashed = sh.withColumn("__h", F.xxhash64("s"))
    cnts = hashed.groupBy("__h").agg(F.count(F.lit(1)).alias("__cnt"))
    p = 512
    while True:
        cand_rows = (
            cnts.orderBy(F.col("__cnt").desc(), "__h").limit(p).collect()
        )  # bounded: p rows of (hash, count)
        vocab_covered = len(cand_rows) < p
        if not cand_rows:
            return spark.createDataFrame([], "s string")
        cand_hashes = spark.createDataFrame(
            [(r["__h"],) for r in cand_rows], "__h long"
        )
        top_rows = (
            hashed.join(F.broadcast(cand_hashes), "__h")
            .groupBy("s")
            .agg(F.count_distinct("doc_id").alias("df"))
            .orderBy(F.col("df").desc(), "s")
            .limit(k)
            .collect()
        )  # bounded: k rows
        m = min(r["__cnt"] for r in cand_rows)
        if (
            vocab_covered
            or p > 32768
            or (len(top_rows) == k and min(r["df"] for r in top_rows) > m)
        ):
            if not vocab_covered and p > 32768:
                # pruning unprovable (flat df plateau at rank k; never
                # observed on natural corpora): exact full-vocab pass
                top_rows = (
                    sh.groupBy("s")
                    .agg(F.count_distinct("doc_id").alias("df"))
                    .orderBy(F.col("df").desc(), "s")
                    .limit(k)
                    .collect()
                )
            return spark.createDataFrame([(r["s"],) for r in top_rows], "s string")
        p *= 4


@register(
    "boilerplate_trigrams",
    f"""
    WITH toks AS (SELECT doc_id, source, string_split(trim(text), ' ') AS t
                  FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      FROM toks, UNNEST(generate_series(1, greatest(len(t)-2, 1))) AS g(i)
    ),
    top AS (
      SELECT s FROM (
        SELECT s, count(DISTINCT doc_id) AS df FROM sh GROUP BY s
      ) ORDER BY df DESC, s LIMIT {BOILERPLATE_TOP}
    ),
    hit AS (
      SELECT DISTINCT sh.doc_id, sh.source FROM sh JOIN top USING (s)
    ),
    per_src AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
    SELECT p.source,
           p.n_docs,
           CAST(count(h.doc_id) AS BIGINT) AS n_docs_boilerplate,
           round(count(h.doc_id) * 1.0 / p.n_docs, 6) AS boilerplate_share
    FROM per_src p
    LEFT JOIN hit h ON h.source = p.source
    GROUP BY p.source, p.n_docs
    """,
)
def boilerplate_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate audit: the 20 most document-frequent word
    trigrams in the corpus (ties broken lexically, so the cut is
    deterministic), and per source the share of documents containing
    at least one — the per-feed nav-bar/banner contamination signal
    curation uses to decide where line-level stripping is needed.

    Scale (round 8, VERDICT r7 item 4): the document-frequency pass was
    the biggest absolute wall of the wave-42 additions (14.5 s sf1 /
    44.7 s sf2.5) because ``count_distinct(doc_id) GROUP BY s`` shuffles
    every (trigram-string, doc_id) pair twice. The df computation is now
    CANDIDATE-PRUNED and still exact:

      1. occurrence counts by ``xxhash64(s)`` — partial-aggregated
         map-side, 8-byte shuffle keys instead of trigram strings;
      2. top-P candidate hashes by count (TakeOrdered, P starts at 512);
      3. exact df only for candidate-hash rows (broadcast semi-join,
         then the count_distinct shuffle touches candidates only);
      4. soundness gate: any non-candidate s has df(s) <= cnt(s) <= m
         (m = min candidate count; hash collisions only RAISE cnt_h, so
         the bound survives them) — accept iff the 20th candidate df
         beats m, else escalate P x4; if the whole vocab fits in P the
         prune is vacuously exact. Unprovable after escalation (never
         observed; needs a near-uniform df plateau at rank 20) falls
         back to the original full plan.

    The gate's driver-side cost is bounded metadata (a 20-row collect
    per attempt); the hit test joins the shingle stream against the
    20-row broadcast as before. Nothing data-sized on the driver,
    nothing quadratic."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.split(F.trim("text"), " ").alias("__t")
    )
    # the shingle stream feeds three passes (candidate counts, exact
    # candidate df, hit join) — cache it so the explode runs once; a
    # performance cache only (released by release_caches, recompute-safe)
    sh = track_cache(
        toks.select(
            "doc_id", "source", F.explode(array_shingles(F.col("__t"), 3)).alias("s")
        )
    )
    top = _exact_top_df_trigrams(sh, BOILERPLATE_TOP)
    hit = sh.join(F.broadcast(top), "s").select("doc_id", "source").distinct()
    per_src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        per_src.join(hit, "source", "left")
        .groupBy("source", "n_docs")
        .agg(
            F.count("doc_id").cast("bigint").alias("n_docs_boilerplate"),
            F.round(F.count("doc_id") / F.col("n_docs"), 6).alias("boilerplate_share"),
        )
    )
