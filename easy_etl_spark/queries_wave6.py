"""Sixth wave: warehouse-maintenance, training-mix, search, and
time-series operators, each DuckDB-oracle-checked.

  - scd2_history / scd2_asof_view: the Kimball type-2 pattern the
    reference's star-schema domain implies (its upsert is type 1 —
    overwrite, history lost; easy_etl/__init__.py:89-94). The merge is
    one full-outer join on the natural key (operators/scd.py).
  - snapshot_diff_orders: CDC table diff (operators/scd.snapshot_diff).
  - source_token_budget: training-mix construction — cap each document
    source at a token budget, longest docs first (integer-exact
    ordering so the kept set is engine-portable).
  - lexical_search_topk: inverted-index lexical search
    (operators/search.py; float BM25 twin pytest-pinned).
  - events_resample_fill: dense-grid hourly resample with zero-fill
    and LOCF (operators/timeseries.py).
  - events_dedup: at-least-once delivery dedup, batch twin of
    streaming/jobs.dedup_stream.
  - fuzzy_name_pairs: edit-distance-1 entity matching via
    deletion-neighborhood blocking (operators/fuzzy.py).
  - corr_stats: exact (decimal co-moment) Pearson correlation —
    order-independent where the built-in corr() is not.
  - events_funnel / cohort_retention: behavioral analytics — ordered
    conversion funnel (conditional min aggregates, no self-joins) and
    the first-seen-day cohort retention matrix.
  - session_duration_stats: engagement metrics over sessionize.
  - incremental_agg_maintenance: mergeable-partial rollup absorb.
  - embedding_quantize_error: int8 vector compression + exact errors.
  - hybrid_search_rrf: lexical + vector reciprocal-rank fusion.
  - data_quality_checks: declarative validation suite
    (operators/quality.py; also gates pipeline loads via .expect()).
  - window_rank_functions: the full ranking-window family.
  - skew_salted_join: operators/scale.salted_join surfaced as an
    oracle-checked query — result must equal the plain join, proving
    salt replication neither drops nor duplicates rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.exact import dec_sum, sql_sum
from .operators import scd
from .operators.curation import cap_sources_by_budget
from .operators.scale import salted_join
from .queries import register
from .session import load_table

_T1, _T2 = "2024-01-01 00:00:00", "2024-02-01 00:00:00"


def _history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic two-snapshot type-2 history over customer:
    snapshot 1 = the table as-is; snapshot 2 bumps acctbal by +100 for
    custkey % 3 == 0 (change), drops custkey % 7 == 0 (delete under
    full_snapshot), and re-keys nothing (no inserts — the oracle stays
    a pure customer-table expression)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    hist = scd.scd2_init(c, _T1)
    snap2 = c.filter(F.col("c_custkey") % 7 != 0).withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 100).otherwise(
            F.col("c_acctbal")
        ),
    )
    return scd.scd2_merge(
        hist, snap2, keys=["c_custkey"], tracked=["c_acctbal"], ts=_T2, full_snapshot=True
    )


@register(
    "scd2_history",
    f"""
    WITH c AS (
      SELECT c_custkey, c_acctbal,
             (c_custkey % 3 = 0 AND c_custkey % 7 <> 0) AS changed,
             (c_custkey % 7 = 0) AS deleted
      FROM customer
    )
    SELECT count(*) + count(*) FILTER (WHERE changed) AS n_rows,
           count(*) FILTER (WHERE NOT deleted) AS n_current,
           count(*) FILTER (WHERE changed OR deleted) AS n_closed,
           {sql_sum("CASE WHEN changed THEN c_acctbal + 100 WHEN deleted THEN NULL ELSE c_acctbal END")} AS cur_acctbal
    FROM c
    """,
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 merge invariants after a change+delete snapshot: row
    counts per state and the open slice's acctbal total (which must
    reflect the +100 updates and exclude deletions)."""
    h = _history(spark, sf_dir)
    return h.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("is_current"), 1)).alias("n_current"),
        F.count(F.when(~F.col("is_current"), 1)).alias("n_closed"),
        dec_sum(F.when(F.col("is_current"), F.col("c_acctbal"))).alias("cur_acctbal"),
    )


@register(
    "scd2_asof_view",
    f"""
    SELECT count(*) AS n_dim_rows,
           {sql_sum("c_acctbal")} AS acctbal_asof
    FROM customer
    """,
)
def scd2_asof_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension view: as of a timestamp between the two
    snapshots, the history must read back exactly like snapshot 1 —
    every key present, original acctbal values."""
    h = _history(spark, sf_dir)
    asof = scd.scd2_asof(h, "2024-01-15 00:00:00")
    return asof.agg(
        F.count(F.lit(1)).alias("n_dim_rows"),
        dec_sum("c_acctbal").alias("acctbal_asof"),
    )


@register(
    "snapshot_diff_orders",
    """
    WITH c AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 13 = 0 THEN 'deleted'
                  WHEN o_orderkey % 5 = 0 THEN 'changed'
                  ELSE 'unchanged' END AS diff_status
      FROM orders
    )
    SELECT diff_status, count(*) AS n
    FROM (
      SELECT diff_status FROM c
      UNION ALL
      SELECT 'inserted' FROM orders WHERE o_orderkey % 17 = 0
    )
    GROUP BY diff_status ORDER BY diff_status
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot diff (operators/scd.snapshot_diff): the new
    snapshot deterministically deletes %13 keys, reprices %5 keys, and
    inserts re-keyed %17 rows; the per-status counts must match the
    rule applied directly to the source table."""
    from .operators.scd import snapshot_diff

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    new = (
        o.filter(F.col("o_orderkey") % 13 != 0)
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 17 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 100_000_000
            )
        )
    )
    d = snapshot_diff(o, new, keys=["o_orderkey"])
    return d.groupBy("diff_status").agg(F.count(F.lit(1)).alias("n")).orderBy("diff_status")


@register(
    "source_token_budget",
    """
    WITH t AS (
      SELECT source, doc_id,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok
      FROM documents
    ),
    c AS (
      SELECT source, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY n_tok DESC, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT source,
           count(*) AS n_docs_kept,
           CAST(sum(n_tok) AS BIGINT) AS tokens_kept,
           CAST(max(cum) AS BIGINT) AS max_cum
    FROM c WHERE cum <= 20000
    GROUP BY source
    """,
)
def source_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every source at 20k tokens, longest docs first
    (curation.cap_sources_by_budget), aggregated per source."""
    docs = load_table(spark, sf_dir, "documents")
    kept = cap_sources_by_budget(docs, budget_tokens=20_000)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tok").alias("tokens_kept"),
        F.max("cum_tok").alias("max_cum"),
    )


@register(
    "events_resample_fill",
    f"""
    WITH hourly AS (
      SELECT event_type AS k, date_trunc('hour', ts) AS h,
             count(*) AS n_events, {sql_sum("value")} AS sv
      FROM events GROUP BY 1, 2
    ),
    b AS (
      SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
      FROM events
    ),
    hours AS (
      SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b
    ),
    grid AS (
      SELECT k, h
      FROM (SELECT DISTINCT event_type AS k FROM events), hours
    ),
    j AS (
      SELECT g.k, g.h, coalesce(hourly.n_events, 0) AS n_events, hourly.sv
      FROM grid g LEFT JOIN hourly ON g.k = hourly.k AND g.h = hourly.h
    )
    SELECT k AS event_type,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
           n_events,
           coalesce(sv, 0.0) AS sum_value,
           last_value(sv IGNORE NULLS)
             OVER (PARTITION BY k ORDER BY h ROWS UNBOUNDED PRECEDING) AS locf_value
    FROM j
    """,
)
def events_resample_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with dense grid, zero-fill, and LOCF forward
    fill (operators/timeseries.resample_fill) — the gap-filling /
    continuous-aggregate shape time-series stores provide."""
    from .operators.timeseries import resample_fill

    return resample_fill(load_table(spark, sf_dir, "events"))


@register(
    "fuzzy_name_pairs",
    """
    WITH v AS (SELECT DISTINCT s_name FROM supplier)
    SELECT a.s_name AS name_a, b.s_name AS name_b,
           levenshtein(a.s_name, b.s_name) AS dist
    FROM v a, v b
    WHERE a.s_name < b.s_name AND levenshtein(a.s_name, b.s_name) <= 1
    """,
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 entity pairs via deletion-neighborhood blocking
    (operators/fuzzy.fuzzy_self_pairs). The oracle is the O(n²)
    levenshtein cross join over DISTINCT names — fuzzy_self_pairs
    declares distinct-VALUE pairs, and the two only coincide while
    names are unique (sf1's replicated copies exposed the old
    row-pair oracle as 100x over: 10 duplicate rows per name on each
    side). The blocked path must find exactly the same value pairs
    without ever materializing n²."""
    from .operators.fuzzy import fuzzy_self_pairs

    return fuzzy_self_pairs(load_table(spark, sf_dir, "supplier"), "s_name")


@register(
    "corr_stats",
    """
    WITH q AS (
      SELECT CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS qx,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS qy
      FROM lineitem
    ),
    s AS (
      SELECT count(*) AS n,
             CAST(sum(CAST(qx AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(qy AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(sum(CAST(qx * qx AS HUGEINT)) AS DOUBLE) AS sxx,
             CAST(sum(CAST(qy * qy AS HUGEINT)) AS DOUBLE) AS syy,
             CAST(sum(CAST(qx * qy AS HUGEINT)) AS DOUBLE) AS sxy
      FROM q
    )
    SELECT n AS n_rows,
           round(sx / n / 100.0, 4) AS mean_qty,
           round(sy / n / 100.0, 4) AS mean_price,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) + 0.0
             AS corr_qty_price
    FROM s
    """,
)
def corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent Pearson correlation + means: co-moment sums
    accumulate as exact decimal(38,0) integers (built-in corr()
    accumulates doubles in partition order — nondeterministic at the
    4th decimal across AQE re-plans), then ONE double conversion per
    sum feeds an identical closed-form expression in both engines, so
    the result is bit-stable under any partitioning AND engine."""
    li = load_table(spark, sf_dir, "lineitem")
    qx = F.floor(F.col("l_quantity") * 100.0 + 0.5).cast("bigint")
    qy = F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("bigint")
    q = li.select(qx.alias("qx"), qy.alias("qy"))
    dec = "decimal(38,0)"
    s = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("qx").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("qy").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("qx") * F.col("qx")).cast(dec)).cast("double").alias("sxx"),
        F.sum((F.col("qy") * F.col("qy")).cast(dec)).cast("double").alias("syy"),
        F.sum((F.col("qx") * F.col("qy")).cast(dec)).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    return s.select(
        n.alias("n_rows"),
        F.round(sx / n / 100.0, 4).alias("mean_qty"),
        F.round(sy / n / 100.0, 4).alias("mean_price"),
        F.round(
            (n * F.col("sxy") - sx * sy)
            / (F.sqrt(n * F.col("sxx") - sx * sx) * F.sqrt(n * F.col("syy") - sy * sy)),
            6,
        ).alias("corr_qty_price"),
    )


@register(
    "events_dedup",
    f"""
    SELECT count(*) AS n_events,
           {sql_sum("value")} AS sum_value
    FROM events
    """,
)
def events_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/jobs.dedup_stream (at-least-once
    delivery hygiene): the events table unioned with itself — every
    event delivered twice — must dedup back to exactly the source
    totals. dropDuplicates on the event key is one hash shuffle keyed
    by event_id (uniform), the canonical scale shape."""
    e = load_table(spark, sf_dir, "events").select("event_id", "value")
    delivered_twice = e.unionByName(e)
    dd = delivered_twice.dropDuplicates(["event_id"])
    return dd.agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value").alias("sum_value"),
    )


@register(
    "lexical_search_topk",
    """
    WITH tf AS (
      SELECT doc_id, tok AS term, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
            FROM documents)
      GROUP BY doc_id, tok
    )
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           count(*) AS n_terms_matched
    FROM tf WHERE term IN ('vector', 'hash', 'merge')
    GROUP BY doc_id
    ORDER BY total_tf DESC, n_terms_matched DESC, doc_id
    LIMIT 10
    """,
)
def lexical_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index lexical search (operators/search.lexical_topk):
    integer-exact query-term-frequency ranking with a total-order
    tie-break. The float-BM25 twin (search.bm25_topk) is pytest-pinned
    against a driver-side reference; this spelling is the
    cross-engine-hashable one."""
    from .operators.search import lexical_topk

    docs = load_table(spark, sf_dir, "documents")
    return lexical_topk(docs, ["vector", "hash", "merge"], k=10)


@register(
    "events_trailing_hour",
    """
    WITH e AS (
      SELECT event_id, user_id,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS qv,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM events
    )
    SELECT event_id, user_id,
           count(*) OVER w AS n_trailing,
           (CAST(sum(qv) OVER w AS DOUBLE) / 100.0) AS sum_trailing
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def events_trailing_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-hour activity per event via a RANGE window frame (value
    range, not row count — events in the same second all see each
    other, which a ROWS frame would get wrong). One shuffle keyed by
    user; the trailing sum aggregates pre-quantized integers so the
    frame math is exact on both engines."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("qv"),
        F.unix_timestamp("ts").alias("ts_s"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        (F.sum("qv").over(w).cast("double") / 100.0).alias("sum_trailing"),
    )


@register(
    "session_duration_stats",
    """
    WITH lagged AS (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      -- floor each endpoint BEFORE differencing: the engine gap test
      -- diffs second-truncated unix_timestamp values, and a fractional
      -- gap straddling 1800 s must sessionize identically on both sides
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800
                     THEN 1 ELSE 0 END AS new_sess
      FROM lagged
    ),
    ids AS (
      SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    sessions AS (
      SELECT user_id, session_id, count(*) AS n_events,
             -- floor each endpoint to whole seconds BEFORE differencing:
             -- the engine side derives durations from second-formatted
             -- session bounds, which truncates per endpoint
             CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT)
               AS duration_s
      FROM ids GROUP BY user_id, session_id
    )
    SELECT count(*) AS n_sessions,
           count(*) FILTER (WHERE n_events = 1) AS n_singletons,
           round(CAST(sum(duration_s) AS DOUBLE) / count(*), 4) AS avg_duration_s,
           max(duration_s) AS max_duration_s,
           round(CAST(sum(n_events) AS DOUBLE) / count(*), 4) AS avg_events
    FROM sessions
    """,
)
def session_duration_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-length distribution over the sessionized stream
    (streaming/windows.sessionize): counts, singleton share, and
    integer-exact average/max durations — the engagement metrics a
    session store derives. Durations are integer seconds, so every
    aggregate is order-independent."""
    from .streaming import windows as W

    s = W.sessionize(load_table(spark, sf_dir, "events"), gap_minutes=30)
    dur = (
        F.unix_timestamp("session_end") - F.unix_timestamp("session_start")
    ).cast("bigint")
    per = s.select(dur.alias("duration_s"), "n_events")
    return per.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count(F.when(F.col("n_events") == 1, 1)).alias("n_singletons"),
        F.round(F.sum("duration_s").cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_duration_s"
        ),
        F.max("duration_s").alias("max_duration_s"),
        F.round(F.sum("n_events").cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_events"
        ),
    )


@register(
    "data_quality_checks",
    """
    SELECT 'unique:o_orderkey' AS check_name,
           CAST((SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS BIGINT)
             AS n_violations,
           (SELECT count(*) = count(DISTINCT o_orderkey) FROM orders) AS passed
    UNION ALL
    SELECT 'not_null:o_custkey',
           (SELECT count(*) FILTER (WHERE o_custkey IS NULL) FROM orders),
           (SELECT count(*) FILTER (WHERE o_custkey IS NULL) FROM orders) = 0
    UNION ALL
    SELECT 'fk:o_custkey->c_custkey',
           (SELECT count(*) FROM orders
            WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
           (SELECT count(*) FROM orders
            WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) = 0
    UNION ALL
    SELECT 'range:l_discount',
           (SELECT count(*) FILTER (WHERE l_discount IS NULL
                                    OR l_discount < 0 OR l_discount > 0.1)
            FROM lineitem),
           (SELECT count(*) FILTER (WHERE l_discount IS NULL
                                    OR l_discount < 0 OR l_discount > 0.1)
            FROM lineitem) = 0
    UNION ALL
    SELECT 'accepted:o_orderstatus',
           (SELECT count(*) FILTER (WHERE o_orderstatus IS NULL
                                    OR o_orderstatus NOT IN ('O','F','P'))
            FROM orders),
           (SELECT count(*) FILTER (WHERE o_orderstatus IS NULL
                                    OR o_orderstatus NOT IN ('O','F','P'))
            FROM orders) = 0
    UNION ALL
    SELECT 'range:o_totalprice_under_400k',
           (SELECT count(*) FILTER (WHERE o_totalprice IS NULL
                                    OR o_totalprice < 0 OR o_totalprice > 400000)
            FROM orders),
           (SELECT count(*) FILTER (WHERE o_totalprice IS NULL
                                    OR o_totalprice < 0 OR o_totalprice > 400000)
            FROM orders) = 0
    ORDER BY check_name
    """,
)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative validation suite (operators/quality.py): uniqueness,
    null, referential-integrity, range, and accepted-values checks over
    the star schema, one report row each. The deliberately-tight
    price-ceiling check reports real violations — proving the report
    counts rather than rubber-stamps."""
    from .operators import quality as Q

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    report = Q.run_checks(
        [
            Q.unique(o, ["o_orderkey"]),
            Q.not_null(o, "o_custkey"),
            Q.foreign_key(o, "o_custkey", c, "c_custkey"),
            Q.in_range(li, "l_discount", 0.0, 0.1),
            Q.accepted_values(o, "o_orderstatus", ["O", "F", "P"]),
            Q.in_range(o, "o_totalprice", 0.0, 400000.0, name="range:o_totalprice_under_400k"),
        ]
    )
    return report.orderBy("check_name")


@register(
    "hybrid_search_rrf",
    """
    WITH tf AS (
      SELECT doc_id, tok AS term, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
            FROM documents)
      GROUP BY doc_id, tok
    ),
    lex AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY total_tf DESC, n_terms DESC, doc_id)
               AS rank
      FROM (
        SELECT doc_id, sum(tf) AS total_tf, count(*) AS n_terms
        FROM tf WHERE term IN ('vector', 'hash', 'merge')
        GROUP BY doc_id
        ORDER BY total_tf DESC, n_terms DESC, doc_id LIMIT 20
      )
    ),
    v AS (
      SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS e FROM embeddings
    ),
    n AS (SELECT vec_id, e, sqrt(list_sum([x*x FOR x IN e])) AS nrm FROM v),
    q AS (SELECT * FROM n WHERE vec_id = 0),
    vec AS (
      SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS rank
      FROM (
        SELECT c.vec_id AS doc_id,
               round(list_sum(list_zip(q.e, c.e).apply(p -> p[1]*p[2]))
                     / (q.nrm*c.nrm), 6) AS cosine
        FROM q JOIN n c ON c.vec_id != q.vec_id
        ORDER BY cosine DESC, doc_id LIMIT 20
      )
    )
    SELECT doc_id,
           round(sum(1.0 / (60 + rank)), 6) AS rrf_score,
           count(*) AS n_sources
    FROM (SELECT * FROM lex UNION ALL SELECT * FROM vec)
    GROUP BY doc_id
    ORDER BY rrf_score DESC, doc_id
    LIMIT 10
    """,
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: lexical top-20 (term frequency) and vector
    top-20 (cosine around the vec_id=0 embedding) fused by reciprocal
    rank (search.rrf_fuse, k=60). The synthetic corpora align doc i
    with embedding i, so both retrievers rank the same id space. Each
    retrieval keeps its own scale shape; fusion itself is a tiny
    union + groupBy."""
    from .operators.search import lexical_topk, rrf_fuse
    from .operators.similarity import brute_force_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    lex = lexical_topk(docs, ["vector", "hash", "merge"], k=20)
    lex_ranked = lex.select(
        "doc_id",
        F.row_number()
        .over(
            # 20-row frame: single-partition window is intended
            Window.partitionBy(F.lit(0)).orderBy(
                F.col("total_tf").desc(), F.col("n_terms_matched").desc(), F.col("doc_id")
            )
        )
        .alias("rank"),
    )
    vec = brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=20)
    vec_ranked = vec.select(F.col("neighbor_id").alias("doc_id"), F.col("rnk").alias("rank"))
    return rrf_fuse([lex_ranked, vec_ranked], id_col="doc_id", k=60).limit(10)


@register(
    "window_rank_functions",
    """
    SELECT o_custkey, o_orderkey,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           ntile(4)       OVER w AS quartile,
           lag(o_orderkey)  OVER w AS prev_key,
           lead(o_orderkey) OVER w AS next_key,
           round(percent_rank() OVER w, 6) AS prank,
           round(cume_dist()    OVER w, 6) AS cdist,
           first_value(o_orderkey) OVER w AS best_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-window family (rank/dense_rank/ntile/lag/lead/
    percent_rank/cume_dist/first_value) over a deterministic total
    order — one window shuffle keyed by customer. Rounds the two
    rational-valued functions so the exact small fractions hash
    identically."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.lag("o_orderkey").over(w).alias("prev_key"),
        F.lead("o_orderkey").over(w).alias("next_key"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.first("o_orderkey").over(w).alias("best_key"),
    )


@register(
    "embedding_quantize_error",
    """
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, label, v, list_min(v) AS mn,
             (list_max(v) - list_min(v)) / 255.0 AS sc
      FROM v
    ),
    e AS (
      SELECT label, len(v) AS d,
             CASE WHEN sc = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(v, x ->
                    CAST(floor(abs(x - (mn + floor((x - mn) / sc + 0.5) * sc))
                               * 1000000000.0 + 0.5) AS BIGINT)) END AS qe
      FROM q
    )
    SELECT label, count(*) AS n_vecs,
           round(CAST(sum(list_sum(qe)) AS DOUBLE) / sum(d) / 1000000000.0, 6)
             AS avg_abs_err,
           round(CAST(max(list_max(qe)) AS DOUBLE) / 1000000000.0, 6)
             AS max_abs_err
    FROM e GROUP BY label ORDER BY label
    """,
)
def embedding_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 vector compression quality (similarity.quantize_int8): per
    label, mean and max absolute reconstruction error. Errors are
    quantized to integer nano-units per element, so the per-vector and
    per-label reductions are exact integer sums — engine- and
    partition-order-independent. One map-only pass plus a label-keyed
    aggregate."""
    from .operators.similarity import quantize_int8

    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    src = e.select("vec_id", "label", v.alias("__v"))
    q = quantize_int8(e)
    j = src.join(q, "vec_id")
    recon_err = F.zip_with(
        F.col("__v"),
        F.col("codes"),
        lambda x, c: F.floor(
            F.abs(x - (F.col("vmin") + c.cast("double") * F.col("vscale")))
            * F.lit(1_000_000_000.0)
            + F.lit(0.5)
        ).cast("bigint"),
    )
    per_vec = j.select(
        "label",
        F.size("__v").alias("d"),
        recon_err.alias("qe"),
    ).select(
        "label",
        "d",
        F.aggregate("qe", F.lit(0).cast("bigint"), lambda a, x: a + x).alias("sum_qe"),
        F.array_max("qe").alias("max_qe"),
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum("sum_qe").cast("double") / F.sum("d") / 1_000_000_000.0, 6
            ).alias("avg_abs_err"),
            F.round(F.max("max_qe").cast("double") / 1_000_000_000.0, 6).alias(
                "max_abs_err"
            ),
        )
        .orderBy("label")
    )


@register(
    "pagerank_top20",
    """
    WITH e AS (
      SELECT DISTINCT 'C' || o_custkey AS src, 'S' || l_suppkey AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    nodes AS (
      SELECT 'C' || c_custkey AS node FROM customer
      UNION ALL
      SELECT 'S' || s_suppkey FROM supplier
    ),
    p AS (SELECT count(*) AS n FROM nodes),
    deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
    r0 AS (SELECT node, 1000000000000000 // (SELECT n FROM p) AS r FROM nodes),
    i1 AS (
      SELECT nodes.node,
             (3000000000000000 // (20 * (SELECT n FROM p)))
             + (17 * coalesce(m.m, 0)) // 20 AS r
      FROM nodes LEFT JOIN (
        SELECT e.dst AS node, sum(r0.r // deg.d) AS m
        FROM e JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst
      ) m USING (node)
    ),
    i2 AS (
      SELECT nodes.node,
             (3000000000000000 // (20 * (SELECT n FROM p)))
             + (17 * coalesce(m.m, 0)) // 20 AS r
      FROM nodes LEFT JOIN (
        SELECT e.dst AS node, sum(i1.r // deg.d) AS m
        FROM e JOIN i1 ON e.src = i1.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst
      ) m USING (node)
    ),
    i3 AS (
      SELECT nodes.node,
             (3000000000000000 // (20 * (SELECT n FROM p)))
             + (17 * coalesce(m.m, 0)) // 20 AS r
      FROM nodes LEFT JOIN (
        SELECT e.dst AS node, sum(i2.r // deg.d) AS m
        FROM e JOIN i2 ON e.src = i2.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst
      ) m USING (node)
    )
    SELECT node, CAST(r AS BIGINT) AS rank_units
    FROM i3 ORDER BY r DESC, node LIMIT 20
    """,
)
def pagerank_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three integer-exact PageRank iterations (operators/graph.py)
    over the customer→supplier purchase graph; top-20 vertices by
    rank. The oracle unrolls the identical integer recurrence as three
    CTE iterations — bit-equality proves the distributed loop."""
    from .operators.graph import pagerank

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("C"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("S"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    nodes = (
        load_table(spark, sf_dir, "customer")
        .select(F.concat(F.lit("C"), F.col("c_custkey")).alias("node"))
        .unionByName(
            load_table(spark, sf_dir, "supplier").select(
                F.concat(F.lit("S"), F.col("s_suppkey")).alias("node")
            )
        )
    )
    r = pagerank(nodes, edges, iters=3)
    return r.orderBy(F.col("rank_units").desc(), "node").limit(20)


@register(
    "frequent_part_pairs",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT part_a, part_b, count(*) AS n_orders
    FROM pairs GROUP BY part_a, part_b
    HAVING count(*) >= 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 50
    """,
)
def frequent_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence mining: part pairs appearing
    together in ≥2 orders, ranked by support. Pairs come from the
    in-row expansion of each order's sorted distinct-part array
    (queries_wave10._basket_pairs_per_order) — cost Σ basket² (baskets
    are tiny — ≤7 items in TPC-H-shaped data), never corpus², one
    basket shuffle instead of a self-join; support counting is one
    pair-keyed aggregate — the first pass of any FP-growth-style
    miner."""
    from .queries_wave10 import _basket_pairs_per_order

    li = load_table(spark, sf_dir, "lineitem")
    pairs = _basket_pairs_per_order(li.select("l_orderkey", "l_partkey")).select(
        F.col("a").alias("part_a"), F.col("b").alias("part_b")
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(50)
    )


@register(
    "association_rules",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM items),
    item_support AS (
      SELECT l_partkey, count(*) AS s FROM items GROUP BY l_partkey
    ),
    pair_support AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS s_ab
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 3
    )
    SELECT part_a, part_b, s_ab,
           round(CAST(s_ab AS DOUBLE) / sa.s, 6) AS confidence,
           round(CAST(s_ab AS DOUBLE) * (SELECT n FROM n_orders)
                 / (sa.s * sb.s), 6) AS lift
    FROM pair_support
    JOIN item_support sa ON part_a = sa.l_partkey
    JOIN item_support sb ON part_b = sb.l_partkey
    ORDER BY lift DESC, part_a, part_b
    LIMIT 25
    """,
)
def association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules a→b over the basket pairs: confidence
    s(ab)/s(a) and lift s(ab)·N/(s(a)·s(b)), top-25 by lift. All
    inputs are exact integer supports; each output is one double
    division — deterministic on any engine. The two support joins
    broadcast (item supports are part-dimension-sized)."""
    from .queries_wave10 import _basket_pairs_per_order

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = items.select("l_orderkey").distinct().count()
    item_s = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("s"))
    # pair supports from the in-row basket expansion (one row per
    # order-pair), not an items self-join — see _basket_pairs_per_order
    pair_s = (
        _basket_pairs_per_order(li.select("l_orderkey", "l_partkey"))
        .groupBy(F.col("a").alias("part_a"), F.col("b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("s_ab"))
        .filter(F.col("s_ab") >= 3)
    )
    sa = F.broadcast(item_s.select(F.col("l_partkey").alias("part_a"), F.col("s").alias("sa")))
    sb = F.broadcast(item_s.select(F.col("l_partkey").alias("part_b"), F.col("s").alias("sb")))
    return (
        pair_s.join(sa, "part_a")
        .join(sb, "part_b")
        .select(
            "part_a",
            "part_b",
            "s_ab",
            F.round(F.col("s_ab").cast("double") / F.col("sa"), 6).alias("confidence"),
            F.round(
                F.col("s_ab").cast("double") * F.lit(n_orders) / (F.col("sa") * F.col("sb")), 6
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(25)
    )


def _simhash32_oracle() -> str:
    """DuckDB twin of dedup.md5_simhash32: 32 bit-vote aggregates over
    the md5-derived token hash, generated rather than hand-typed."""
    votes = ",\n             ".join(
        f"sum(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(32)
    )
    pack = "\n             + ".join(
        f"CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(32)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents
    ),
    h AS (
      SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS hv FROM tok
    ),
    votes AS (
      SELECT doc_id,
             {votes}
      FROM h GROUP BY doc_id
    )
    SELECT doc_id,
           CAST({pack} AS BIGINT) AS simhash32
    FROM votes
    """


@register("dedup_simhash_md5", _simhash32_oracle())
def dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable SimHash signatures (dedup.md5_simhash32): the
    md5-derived 32-bit twin of the xxhash64 simhash, recomputed
    bit-for-bit by the DuckDB oracle — turning the simhash family from
    rows-only into value-hash-checked."""
    from .operators.dedup import md5_simhash32

    return md5_simhash32(load_table(spark, sf_dir, "documents"))


@register(
    "weighted_doc_sample",
    """
    WITH d AS (
      SELECT source, doc_id, n_chars,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 2000 AS u,
             least(n_chars, 2000) AS w
      FROM documents
    )
    SELECT source,
           count(*) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS chars_kept
    FROM d WHERE u < w
    GROUP BY source ORDER BY source
    """,
)
def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-proportional importance sampling
    (sampling.weighted_bernoulli): each doc keeps with probability
    min(n_chars, 2000)/2000, decided by the engine-portable md5 hash
    of its id — the DuckDB oracle reproduces the exact keep set, which
    no rand()-based sample could."""
    from .operators.sampling import weighted_bernoulli

    docs = load_table(spark, sf_dir, "documents")
    kept = weighted_bernoulli(
        docs, F.least(F.col("n_chars"), F.lit(2000)), max_weight=2000
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("chars_kept"),
        )
        .orderBy("source")
    )


@register(
    "sink_compaction",
    """
    SELECT 2 * count(*) AS n_rows,
           CAST(2 * sum(n_nationkey) AS BIGINT) AS key_sum,
           1 AS n_files_after,
           true AS rows_preserved
    FROM nation
    """,
)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (ParquetSink.compact): a fragmented table
    (two appends written across many partitions) compacts to a single
    file with rows and values bit-identical — the standing maintenance
    job of incremental ingest, proven by read-back checksums."""
    import shutil
    import tempfile

    from .sources.sinks import ParquetSink

    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    root = tempfile.mkdtemp(prefix="easy_etl_compact_")
    try:
        sink = ParquetSink(spark, root + "/t")
        sink.append(n.repartition(8))
        sink.append(n.repartition(8))

        def stats(df):
            r = df.agg(
                F.count(F.lit(1)).alias("n"), F.sum("n_nationkey").cast("bigint").alias("s")
            ).first()
            return int(r["n"]), int(r["s"])

        before = stats(sink.read())
        files_after = sink.compact(target_rows_per_file=10**9)
        after = stats(sink.read())
    finally:
        # the result is already materialized scalars — the scratch sink
        # must not outlive the call (repeated bench runs leak TMPDIR)
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [(after[0], after[1], files_after, before == after)],
        "n_rows bigint, key_sum bigint, n_files_after int, rows_preserved boolean",
    )


@register(
    "sink_time_travel",
    """
    SELECT 'current' AS state, 2 * count(*) AS n_rows,
           CAST(2 * sum(n_nationkey) AS BIGINT) AS key_sum
    FROM nation
    UNION ALL
    SELECT 'v1', count(*), CAST(sum(n_nationkey) AS BIGINT) FROM nation
    ORDER BY state
    """,
)
def sink_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned sink time travel (ParquetSink keep_versions): after
    two appends the current table holds both batches while version 1
    still reads back as the first state — audit/backfill reads without
    a transaction log. Oracle derives both states from the source."""
    import shutil
    import tempfile

    from .sources.sinks import ParquetSink

    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    root = tempfile.mkdtemp(prefix="easy_etl_tt_")
    try:
        sink = ParquetSink(spark, root + "/t", keep_versions=2)
        sink.append(n)
        sink.append(n)

        def state(df, tag):
            return df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("n_nationkey").cast("bigint").alias("key_sum"),
            ).select(F.lit(tag).alias("state"), "n_rows", "key_sum")

        out = state(sink.read(), "current").unionByName(
            state(sink.read(version=1), "v1")
        ).orderBy("state")
        rows, schema = out.collect(), out.schema
    finally:
        # materialize the 2 result rows before dropping the scratch
        # sink (the read plan is lazy; TMPDIR must not leak per run)
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


@register(
    "incremental_agg_maintenance",
    f"""
    SELECT event_type,
           count(*) AS n_events,
           {sql_sum("value")} AS sum_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a stored per-type
    aggregate built from the first half of the stream is merged with
    the delta batch's partial aggregate (count-sum merge via keyed
    upsert into a ParquetSink) and must read back equal to the full
    recompute — the mergeable-partial property that lets a 100 TB
    rollup absorb each new partition without re-scanning history.
    """
    import shutil
    import tempfile

    from .functions.exact import dec_sum as _ds
    from .sources.sinks import ParquetSink

    e = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")

    def agg(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"), _ds("value").alias("sum_value")
        )

    root = tempfile.mkdtemp(prefix="easy_etl_ivm_")
    try:
        sink = ParquetSink(spark, root + "/t")
        sink.append(agg(e.filter(F.col("ts") < cutoff)))
        stored = sink.read().select("event_type", "n_events", "sum_value")
        delta = agg(e.filter(F.col("ts") >= cutoff))
        merged = (
            stored.unionByName(delta)
            .groupBy("event_type")
            .agg(
                F.sum("n_events").alias("n_events"),
                # sums of already-quantized decimals: plain sum re-merges
                # exactly (the quantization happened once per raw row)
                F.round(F.sum("sum_value"), 2).alias("sum_value"),
            )
        )
        sink.upsert(merged, keys=["event_type"])
        out = sink.read().select("event_type", "n_events", "sum_value").orderBy("event_type")
        rows, schema = out.collect(), out.schema
    finally:
        # materialize the per-type rows before dropping the scratch
        # sink (lazy read plan; TMPDIR must not leak per run)
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


@register(
    "events_funnel",
    """
    WITH u AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'view')     AS t_view,
             min(ts) FILTER (WHERE event_type = 'click')    AS t_click,
             min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           count(t_view) AS n_view,
           count(*) FILTER (WHERE t_view < t_click) AS n_view_click,
           count(*) FILTER (WHERE t_view < t_click AND t_click < t_purchase)
             AS n_view_click_purchase
    FROM u
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion (view → click → purchase by first
    occurrence per user): one groupBy with conditional min aggregates —
    no self-joins, no windows, one shuffle keyed by user. NULL
    first-occurrence times fail the < comparisons, so drop-offs fall
    out of the boolean algebra for free."""
    e = load_table(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts"))).alias(f"t_{t}")

    u = e.groupBy("user_id").agg(first_ts("view"), first_ts("click"), first_ts("purchase"))
    return u.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.count(F.when(F.col("t_view") < F.col("t_click"), 1)).alias("n_view_click"),
        F.count(
            F.when(
                (F.col("t_view") < F.col("t_click"))
                & (F.col("t_click") < F.col("t_purchase")),
                1,
            )
        ).alias("n_view_click_purchase"),
    )


@register(
    "cohort_retention",
    """
    WITH first_day AS (
      SELECT user_id, date_trunc('day', min(ts)) AS cohort_day FROM events
      GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS active_day FROM events
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort,
           CAST(date_diff('day', cohort_day, active_day) AS BIGINT) AS day_offset,
           count(*) AS n_active
    FROM first_day JOIN activity USING (user_id)
    WHERE date_diff('day', cohort_day, active_day) <= 7
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, active
    user counts per day offset (first week). Two aggregations plus one
    user-keyed join — the cohort frame is |users|-sized and co-keyed
    with the activity frame, so the join shuffles on user_id only."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    first_day = e.groupBy("user_id").agg(F.date_trunc("day", F.min("ts")).alias("cohort_day"))
    activity = e.select("user_id", day.alias("active_day")).distinct()
    j = first_day.join(activity, "user_id")
    off = F.datediff(F.col("active_day"), F.col("cohort_day")).cast("bigint")
    return (
        j.select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
            off.alias("day_offset"),
        )
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort", "day_offset")
    )


@register(
    "skew_salted_join",
    f"""
    SELECT s_name,
           count(*) AS n_items,
           {sql_sum("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    ORDER BY s_name
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient salted join (operators/scale.salted_join): the
    lineitem fan-out across 16 salt replicas of supplier must aggregate
    to exactly the plain-join totals — the oracle IS the plain join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_extendedprice", "l_discount"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    joined = salted_join(li, sup, key="s_suppkey", salt=16)
    return (
        joined.groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy("s_name")
    )
