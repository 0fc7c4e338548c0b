"""Wave-36 query catalog: exact substring-span dedup, DSIR importance
resampling, and product-quantization ANN.

New operator families:
  - dedup_substring_spans   Lee-et-al.-style exact substring dedup:
                            maximal duplicated token spans per doc
                            (n-gram seeds instead of a suffix array —
                            the shuffle-decomposable equivalent)
  - dsir_importance_select  DSIR (Xie et al. 2023): integer-exact
                            unigram importance weights + derandomized
                            Gumbel-top-k selection toward a target
                            slice
  - knn_pq_int              product quantization with ADC scoring
                            (Jégou et al. 2011) under the pinned
                            integer contract of knn_ivf_int/knn_lsh_int

Hash-safety follows the catalog conventions (queries.py docstring):
every float that reaches the output is a deterministic function of
exact integers, and both engines feed ln identical rational doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import similarity
from .operators.curation import dsir_select
from .operators.dedup import cdc_chunk_dedup, duplicate_substring_spans
from .queries import register
from .session import load_table

_PAIR_D2 = (
    "CAST(list_sum(list_zip({a}, {b}).apply(p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT)"
)
_QV = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))"


@register(
    "dedup_substring_spans",
    """
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
    ),
    g AS (
      SELECT doc_id, i.i AS pos, array_to_string(toks[i.i:i.i + 7], ' ') AS g
      FROM t, UNNEST(generate_series(1, len(toks) - 7)) AS i(i)
      WHERE len(toks) >= 8
    ),
    occ AS (SELECT g, count(*) AS occ FROM g GROUP BY g),
    d AS (SELECT doc_id, pos FROM g JOIN occ USING (g) WHERE occ > 1),
    r AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
                  THEN 0 ELSE 1 END AS new_run
      FROM d
    ),
    runs AS (
      SELECT doc_id, pos,
             sum(new_run) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM r
    ),
    spans AS (
      SELECT doc_id, run, max(pos) - min(pos) + 8 AS span_toks
      FROM runs GROUP BY doc_id, run
    ),
    per_doc AS (
      SELECT doc_id, count(*) AS n_dup_spans,
             CAST(sum(span_toks) AS BIGINT) AS dup_tokens
      FROM spans GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(coalesce(n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           CAST(coalesce(dup_tokens, 0) AS BIGINT) AS dup_tokens,
           round(coalesce(dup_tokens, 0) * 1.0 / len(toks), 4) AS dup_frac
    FROM t LEFT JOIN per_doc USING (doc_id)
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup summary (operators/dedup.
    duplicate_substring_spans): per doc, the maximal token spans
    covered by 8-grams occurring more than once corpus-wide — the
    span-removal accounting of Lee et al. 2022, with positional
    n-grams as the distributed stand-in for the paper's suffix array.
    The DuckDB oracle replays the identical seed/merge pipeline."""
    return duplicate_substring_spans(
        load_table(spark, sf_dir, "documents"), min_len=8
    )


@register(
    "dsir_importance_select",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t
      FROM documents
    ),
    cnt AS (SELECT tok, count(*) AS cr, sum(is_t) AS ct FROM toks GROUP BY tok),
    tot AS (SELECT sum(cr) AS R, sum(ct) AS T, count(*) AS V FROM cnt),
    lr AS (
      SELECT tok,
             CAST(floor(ln((ct + 1) * 1.0 / (T + V)) * 1000000 + 0.5) AS BIGINT)
           - CAST(floor(ln((cr + 1) * 1.0 / (R + V)) * 1000000 + 0.5) AS BIGINT)
             AS lr
      FROM cnt CROSS JOIN tot
    ),
    scored AS (
      SELECT doc_id, count(*) AS n_tokens, CAST(sum(lr) AS BIGINT) AS score_units
      FROM toks JOIN lr USING (tok) GROUP BY doc_id
    ),
    keyed AS (
      SELECT *,
             score_units - CAST(floor(ln(
               -CAST(floor(ln(
                 ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 1000000) + 0.5) / 1000000.0
               ) * 1000000 + 0.5) AS BIGINT) / 1000000.0
             ) * 1000000 + 0.5) AS BIGINT) AS key_units
      FROM scored
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, score_units,
           round(score_units / 1000000.0 / n_tokens, 4) + 0.0 AS avg_logratio,
           key_units
    FROM keyed ORDER BY key_units DESC, doc_id LIMIT 200
    """,
)
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling toward the English slice
    (operators/curation.dsir_select): integer-quantized unigram
    log-likelihood ratios, md5-derandomized Gumbel-top-k — 200 docs
    sampled proportional to exp(score), bit-replayed by the oracle."""
    return dsir_select(
        load_table(spark, sf_dir, "documents"),
        F.col("lang") == "en",
        n_select=200,
    )


def _pq_int_oracle(m: int = 4, ks: int = 16, sub: int = 16) -> str:
    """DuckDB twin of similarity.int_pq_neighbors: pinned lowest-id
    codebooks, argmin integer-d² encoding (tie → lowest codeword),
    exact integer ADC sums."""
    return f"""
    WITH v AS (SELECT vec_id, {_QV} AS q FROM embeddings),
    seeds AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, q
      FROM (SELECT vec_id, q FROM v ORDER BY vec_id LIMIT {ks})
    ),
    cw AS (
      SELECT j, s.mi, q[(s.mi * {sub} + 1):(s.mi * {sub} + {sub})] AS cv
      FROM seeds, UNNEST(generate_series(0, {m - 1})) AS s(mi)
    ),
    subs AS (
      SELECT vec_id, s.mi, q[(s.mi * {sub} + 1):(s.mi * {sub} + {sub})] AS sub
      FROM v, UNNEST(generate_series(0, {m - 1})) AS s(mi)
    ),
    enc AS (
      SELECT vec_id, mi, j AS code FROM (
        SELECT subs.vec_id, subs.mi, cw.j,
               row_number() OVER (PARTITION BY subs.vec_id, subs.mi
                 ORDER BY {_PAIR_D2.format(a="subs.sub", b="cw.cv")}, cw.j) AS rn
        FROM subs JOIN cw ON cw.mi = subs.mi
      ) WHERE rn = 1
    ),
    adc AS (
      SELECT qs.vec_id AS query_id, e.vec_id AS neighbor_id,
             CAST(sum({_PAIR_D2.format(a="qs.sub", b="cw.cv")}) AS BIGINT)
               AS adc_d2
      FROM (SELECT * FROM subs WHERE vec_id < 5) qs
      JOIN enc e ON e.mi = qs.mi AND e.vec_id != qs.vec_id
      JOIN cw ON cw.mi = e.mi AND cw.j = e.code
      GROUP BY qs.vec_id, e.vec_id
    )
    SELECT query_id, neighbor_id, adc_d2, rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_d2, neighbor_id) AS rnk
      FROM adc
    ) WHERE rnk <= 10
    """


@register("knn_pq_int", _pq_int_oracle())
def knn_pq_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked product-quantization ANN
    (similarity.int_pq_neighbors): 4 sub-spaces x 16 pinned codewords,
    asymmetric-distance scoring — the compressed-index search mode
    that completes the ANN family next to brute force / LSH / IVF."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return similarity.int_pq_neighbors(emb, queries_df, k=10).select(
        "query_id", "neighbor_id", "adc_d2", "rnk"
    )


@register(
    "cdc_chunk_dedup",
    """
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
    ),
    th AS (
      SELECT doc_id, toks,
             list_transform(toks,
               x -> ('0x' || substr(md5(x), 1, 8))::BIGINT % 1048576) AS hs
      FROM t
    ),
    rl AS (
      SELECT doc_id, toks,
             list_transform(generate_series(1, len(hs)), i ->
               (list_sum(list_transform(generate_series(greatest(1, i - 7), i),
                  j -> hs[j] * CAST(2**(i - j) AS BIGINT))) % 2147483647)) AS roll
      FROM th
    ),
    pos AS (
      SELECT doc_id, i.i AS pos, toks[i.i] AS tok,
             CASE WHEN roll[i.i] % 32 = 0 THEN 1 ELSE 0 END AS cut
      FROM rl, UNNEST(generate_series(1, len(toks))) AS i(i)
    ),
    ch AS (
      SELECT doc_id, pos, tok,
             coalesce(sum(cut) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
      FROM pos
    ),
    fp AS (
      SELECT doc_id, chunk, md5(string_agg(tok, ' ' ORDER BY pos)) AS fp
      FROM ch GROUP BY doc_id, chunk
    ),
    occ AS (SELECT fp, count(*) AS occ FROM fp GROUP BY fp)
    SELECT doc_id, count(*) AS n_chunks,
           CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_chunks,
           round(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
             AS dup_frac
    FROM fp JOIN occ USING (fp) GROUP BY doc_id
    """,
)
def cdc_chunk_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (operators/dedup.cdc_chunk_dedup):
    FastCDC-style rolling-hash cuts at token granularity, md5 chunk
    fingerprints, per-doc chunk-duplication accounting — the
    storage-level dedup mode (backup systems, dataset versioning)
    whose cuts survive offset-shifting edits. The DuckDB oracle
    replays hash/cut/fingerprint decisions bit-for-bit."""
    return cdc_chunk_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "tfidf_keywords",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
    dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
    scored AS (
      SELECT doc_id, tok AS keyword, tf,
             tf * CAST(floor(ln((n + 1) * 1.0 / (df + 1)) * 1000000 + 0.5)
                       AS BIGINT) AS score_units
      FROM tf JOIN dfq USING (tok) CROSS JOIN nd
    )
    SELECT doc_id, keyword, tf, score_units, rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                 ORDER BY score_units DESC, keyword) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
)
def tfidf_keywords_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc tf-idf keyword extraction (operators/textops.
    tfidf_keywords): integer-quantized idf, exact integer scores,
    alphabetic tie-break — the baseline lexical summarizer, replayed
    verbatim by the oracle."""
    from .operators.textops import tfidf_keywords

    return tfidf_keywords(load_table(spark, sf_dir, "documents"), top_k=3)


def _k_center_oracle(k: int = 8) -> str:
    """DuckDB twin of similarity.int_k_center_select: the k-1 greedy
    farthest-point rounds unrolled as chained CTEs (argmax md, tie →
    lowest id; running least() of distances to chosen centers)."""
    d2 = _PAIR_D2
    parts = [
        f"v AS (SELECT vec_id, {_QV} AS q FROM embeddings)",
        "c0 AS (SELECT vec_id, q FROM v ORDER BY vec_id LIMIT 1)",
        "m0 AS (SELECT v.vec_id, v.q, "
        + d2.format(a="v.q", b="c0.q")
        + " AS md FROM v, c0)",
    ]
    for r in range(1, k):
        parts.append(
            f"c{r} AS (SELECT vec_id, q, md FROM m{r-1} "
            "ORDER BY md DESC, vec_id LIMIT 1)"
        )
        if r < k - 1:
            parts.append(
                f"m{r} AS (SELECT m.vec_id, m.q, least(m.md, "
                + d2.format(a="m.q", b=f"c{r}.q")
                + f") AS md FROM m{r-1} m, c{r})"
            )
    sels = [
        "SELECT 0 AS rank, vec_id AS center_id,"
        " CAST(0 AS BIGINT) AS radius_d2 FROM c0"
    ] + [
        f"SELECT {r} AS rank, vec_id AS center_id,"
        f" CAST(md AS BIGINT) AS radius_d2 FROM c{r}"
        for r in range(1, k)
    ]
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(sels)


@register("k_center_coreset", _k_center_oracle())
def k_center_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (similarity.
    int_k_center_select): 8 farthest-point rounds over the embedding
    corpus, exact integer distances, radii non-increasing — the
    diversity-maximizing data-selection primitive, oracle-replayed by
    unrolled CTE rounds."""
    return similarity.int_k_center_select(
        load_table(spark, sf_dir, "embeddings"), k=8
    )


def _hll_oracle() -> str:
    """DuckDB twin of sketches.hll_md5_distinct over events.user_id
    per event_type: identical md5 hashing, integer rank chain, exact
    dyadic register sums, same literal-arithmetic estimator."""
    rank_case = "CASE " + " ".join(
        f"WHEN rem >= {1 << (26 - rank)} THEN {rank}" for rank in range(1, 27)
    ) + " ELSE 27 END"
    alpha = (
        "(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)"
        " + CAST(1.079 AS DOUBLE) / CAST(64.0 AS DOUBLE)))"
    )
    return f"""
    WITH h AS (
      SELECT event_type, user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM events
    ),
    k AS (
      SELECT event_type, user_id, h % 64 AS idx,
             (SELECT {rank_case} FROM (SELECT h // 64 AS rem)) AS rank
      FROM h
    ),
    regs AS (
      SELECT event_type, idx, max(rank) AS m
      FROM k GROUP BY event_type, idx
    ),
    sums AS (
      SELECT event_type,
             CAST(sum(CAST(2**(27 - m) AS BIGINT)) AS BIGINT) AS s_present,
             count(*) AS n_idx
      FROM regs GROUP BY event_type
    ),
    est AS (
      SELECT event_type,
             s_present + (64 - n_idx) * CAST(134217728 AS BIGINT) AS s_int,
             CAST(64 - n_idx AS BIGINT) AS v_zero
      FROM sums
    ),
    fin AS (
      SELECT event_type, v_zero,
             {alpha} * CAST(4096.0 AS DOUBLE) * CAST(134217728.0 AS DOUBLE)
               / s_int AS e_raw
      FROM est
    ),
    ex AS (
      SELECT event_type, count(DISTINCT user_id) AS exact_distinct,
             count(*) AS n_rows
      FROM events GROUP BY event_type
    )
    SELECT fin.event_type,
           round(CASE WHEN e_raw <= CAST(160.0 AS DOUBLE) AND v_zero > 0
                      THEN CAST(64.0 AS DOUBLE)
                           * ln(CAST(64.0 AS DOUBLE) / v_zero)
                      ELSE e_raw END, 4) + 0.0 AS est_distinct,
           exact_distinct, n_rows
    FROM fin JOIN ex ON ex.event_type = fin.event_type
    """


@register("hll_distinct_md5", _hll_oracle())
def hll_distinct_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked HyperLogLog (operators/sketches.hll_md5_distinct):
    the engine-portable twin of the DataSketches surface
    (sketch_distinct_users stays rows-only) — md5-derived 32-bit
    hashes, 64 integer registers, exact dyadic indicator sums, the
    standard linear-counting correction; DuckDB replays register
    state AND the estimate bit-for-bit."""
    from .operators.sketches import hll_md5_distinct

    return hll_md5_distinct(
        load_table(spark, sf_dir, "events"), "user_id", ["event_type"]
    )


@register(
    "mutual_information_lang_source",
    """
    WITH cells AS (
      SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source
    ),
    rl AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nl FROM cells GROUP BY lang),
    cs AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns FROM cells GROUP BY source),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM cells)
    SELECT c.lang, c.source, CAST(c.n AS BIGINT) AS n_docs,
           CAST(floor((CAST(floor(ln(CAST(c.n AS DOUBLE) * n_tot) * 1000000 + 0.5) AS BIGINT)
                - CAST(floor(ln(CAST(nl AS DOUBLE) * ns) * 1000000 + 0.5) AS BIGINT))
                 / 100.0 + 0.5) AS BIGINT) / 10000.0 + 0.0 AS pmi,
           c.n * (CAST(floor(ln(CAST(c.n AS DOUBLE) * n_tot) * 1000000 + 0.5) AS BIGINT)
                - CAST(floor(ln(CAST(nl AS DOUBLE) * ns) * 1000000 + 0.5) AS BIGINT))
             AS mi_contrib_units
    FROM cells c JOIN rl USING (lang) JOIN cs USING (source) CROSS JOIN tot
    """,
)
def mutual_information_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between the lang and source
    columns — the dependence screen behind feature selection and
    stratification checks: pmi = ln(p(l,s)/(p(l)p(s))) per cell plus
    the cell's exact integer contribution to total MI
    (Σ contrib / N / 1e6 nats). Integer-quantized ln of rationals of
    counts (the unigram_logprob pattern) keeps both engines
    bit-identical.

    Scale: one map-side-combined cell count (|langs|x|sources| rows),
    two margin reduces over the CELLS (not the data), a broadcast
    total — nothing after the first aggregate touches raw rows."""
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    rl = cells.groupBy("lang").agg(F.sum("n").alias("nl"))
    cs = cells.groupBy("source").agg(F.sum("n").alias("ns"))
    tot = cells.agg(F.sum("n").alias("n_tot"))

    def qln(x):
        return F.floor(F.log(x) * 1e6 + F.lit(0.5)).cast("long")

    units = qln(F.col("n").cast("double") * F.col("n_tot")) - qln(
        F.col("nl").cast("double") * F.col("ns")
    )
    return (
        cells.join(rl, "lang")
        .join(cs, "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            F.col("n").cast("bigint").alias("n_docs"),
            # integer-space half-up to 1e-4 (engine-independent; round()
            # on a double diverges between engines at exact .5 ties)
            (
                F.floor(units / F.lit(100.0) + F.lit(0.5)).cast("bigint")
                / F.lit(10000.0)
                + F.lit(0.0)
            ).alias("pmi"),
            (F.col("n") * units).alias("mi_contrib_units"),
        )
    )


@register(
    "woe_information_value",
    """
    WITH base AS (
      SELECT least(CAST(floor(o_totalprice / 60000.0) AS BIGINT), 9) AS bucket,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
      FROM orders
    ),
    bins AS (
      SELECT bucket, CAST(sum(1 - bad) AS BIGINT) AS n_good,
             CAST(sum(bad) AS BIGINT) AS n_bad
      FROM base GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(sum(n_good) AS BIGINT) AS g_tot,
             CAST(sum(n_bad) AS BIGINT) AS b_tot,
             count(*) AS k FROM bins
    )
    SELECT bucket, n_good, n_bad,
           CAST(floor((CAST(floor(ln((n_good + 1) * 1.0 / (g_tot + k)) * 1000000 + 0.5)
                       AS BIGINT)
                - CAST(floor(ln((n_bad + 1) * 1.0 / (b_tot + k)) * 1000000 + 0.5)
                       AS BIGINT)) / 100.0 + 0.5) AS BIGINT) / 10000.0 + 0.0 AS woe,
           round(((n_good + 1) * 1.0 / (g_tot + k)
                 - (n_bad + 1) * 1.0 / (b_tot + k))
                 * (CAST(floor(ln((n_good + 1) * 1.0 / (g_tot + k)) * 1000000 + 0.5)
                         AS BIGINT)
                  - CAST(floor(ln((n_bad + 1) * 1.0 / (b_tot + k)) * 1000000 + 0.5)
                         AS BIGINT)) / 1000000.0, 6) + 0.0 AS iv_contrib
    FROM bins CROSS JOIN tot
    """,
)
def woe_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value profile of order value
    vs fulfillment status — the credit-scoring-style predictive-power
    screen run before binning a feature into a model: per fixed-width
    price bucket, WOE = ln(p(bucket|good)/p(bucket|bad)) with add-one
    smoothing and the bucket's IV contribution (sum >= 0.1 — weak,
    >= 0.3 — strong predictor). Integer-quantized ln of rationals of
    counts keeps engines bit-identical.

    Scale: one map-side-combined bucket x label count (<= 10 rows),
    broadcast totals — nothing after the first aggregate touches
    data."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.least(F.floor(F.col("o_totalprice") / 60000.0).cast("long"), F.lit(9)).alias(
            "bucket"
        ),
        (F.col("o_orderstatus") == "F").cast("long").alias("bad"),
    )
    bins = base.groupBy("bucket").agg(
        F.sum(1 - F.col("bad")).alias("n_good"), F.sum("bad").alias("n_bad")
    )
    tot = bins.agg(
        F.sum("n_good").alias("g_tot"),
        F.sum("n_bad").alias("b_tot"),
        F.count(F.lit(1)).alias("k"),
    )

    def qln(x):
        return F.floor(F.log(x) * 1e6 + F.lit(0.5)).cast("long")

    pg = (F.col("n_good") + 1) / (F.col("g_tot") + F.col("k"))
    pb = (F.col("n_bad") + 1) / (F.col("b_tot") + F.col("k"))
    units = qln(pg) - qln(pb)
    return bins.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_good",
        "n_bad",
        # integer-space half-up to 1e-4 (see lang/source pmi note)
        (
            F.floor(units / F.lit(100.0) + F.lit(0.5)).cast("bigint")
            / F.lit(10000.0)
            + F.lit(0.0)
        ).alias("woe"),
        (F.round((pg - pb) * units / 1e6, 6) + F.lit(0.0)).alias("iv_contrib"),
    )


@register(
    "ewma_revenue_trend",
    """
    WITH daily AS (
      SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT cur.day, src.rev_cents,
             CAST(2**(19 - (cur.day - src.day)) AS BIGINT) AS w
      FROM daily cur JOIN daily src
        ON src.day BETWEEN cur.day - 19 AND cur.day
    ),
    agg AS (
      SELECT day, CAST(sum(rev_cents * w) AS BIGINT) AS num,
             CAST(sum(w) AS BIGINT) AS den
      FROM pairs GROUP BY day
    )
    SELECT d.day, d.rev_cents,
           ((num // den) * 10000
            + ((num % den) * 20000 + den) // (2 * den)) / 10000.0
             AS ewma_cents
    FROM daily d JOIN agg USING (day)
    ORDER BY d.day LIMIT 100
    """,
)
def ewma_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily revenue with
    dyadic half-life-1-day weights over a bounded 20-day lookback —
    the smoothing/trend primitive behind monitoring dashboards,
    computed EXACTLY: weights 2^(19-lag) and revenue cents are
    integers, so numerator/denominator are exact BIGINTs and the
    single final division is the only float op (identical IEEE
    rounding on both engines). First 100 days shown (TakeOrdered).

    Scale: daily totals are one map-side-combined aggregate (rows =
    distinct days, not orders); the lookback is a bounded equi-ish
    range self-join over that DAY-COUNT-sized frame — the classic
    bounded-lag pattern that never touches raw rows twice."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        ).alias("day")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("rev_cents")
    )
    cur, src = daily.alias("cur"), daily.alias("src")
    pairs = cur.join(
        src,
        (F.col("src.day") >= F.col("cur.day") - 19)
        & (F.col("src.day") <= F.col("cur.day")),
    ).select(
        F.col("cur.day").alias("day"),
        F.col("src.rev_cents").alias("rev_cents"),
        F.pow(F.lit(2.0), (F.lit(19) - (F.col("cur.day") - F.col("src.day"))).cast("double"))
        .cast("long")
        .alias("w"),
    )
    agg = pairs.groupBy("day").agg(
        F.sum(F.col("rev_cents") * F.col("w")).alias("num"),
        F.sum("w").alias("den"),
    )
    return (
        daily.join(agg, "day")
        .select(
            "day",
            "rev_cents",
            # round-half-up at 4 decimals in INTEGER space via the
            # quotient/remainder split (num*20000 would overflow int64
            # at larger rungs; the remainder is < den <= 2^20 so its
            # scaled rounding term never does), then one exact
            # integer-to-double division — round(double, 4) at 14+
            # significant digits is engine-divergent at representability
            # knife edges (caught by the round-8 sf1 sweep)
            (
                F.expr(
                    "(num div den) * 10000"
                    " + ((num % den) * 20000 + den) div (2 * den)"
                )
                / 10000.0
            ).alias("ewma_cents"),
        )
        .orderBy("day")
        .limit(100)
    )


def _kcore_oracle(rounds: int = 3) -> str:
    """DuckDB twin of kcore_hindex: degree init + `rounds` h-index
    iterations unrolled (H over neighbor values via max(least(rn, c))
    on a desc row_number — order among equal values cannot change H)."""
    step = """
    r{t} AS (
      SELECT src AS v, max(least(rn, c)) AS c FROM (
        SELECT e.src, p.c,
               row_number() OVER (PARTITION BY e.src ORDER BY p.c DESC) AS rn
        FROM edges e JOIN r{p} p ON p.v = e.dst
      ) GROUP BY src
    )"""
    parts = [
        "li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)",
        """e0 AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM li l1 JOIN li l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    )""",
        "edges AS (SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0)",
        "r0 AS (SELECT src AS v, count(*) AS c FROM edges GROUP BY src)",
    ]
    for t in range(1, rounds + 1):
        parts.append(step.format(t=t, p=t - 1))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
    SELECT CAST(c AS BIGINT) AS coreness, count(*) AS n_nodes
    FROM r{rounds} GROUP BY c
    """
    )


@register("kcore_hindex", _kcore_oracle())
def kcore_hindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coreness (k-core number) histogram of the co-purchase graph via
    the iterated H-index (Lue et al. 2016: repeatedly replacing each
    node's value with the H-index of its neighbors' values converges
    from degrees to coreness) — the degeneracy/density screen behind
    community pruning and influence seeding. The registered query pins
    THREE rounds so the DuckDB oracle can unroll them as CTEs; the
    production path loops the same step to an exact fixpoint
    (convergence = zero changed values, like dedup_clusters).

    Round-8 rewrite: the per-round H-index no longer sorts an
    edge-sized frame. H over a neighbor-value multiset equals
    ``max over distinct values v of min(v, n_ge(v))`` where ``n_ge`` is
    the count of neighbors with value >= v (checking only the distinct
    values suffices: for any integer h between values, min(h, n_ge(h))
    is dominated by the next value up). Each round aggregates to
    (src, value, count) first — map-side combinable, output bounded by
    distinct values per node, not degree.

    Round-11 rewrite (guide §2.3/§2.4): the adjacency is built with
    ONE edge-byte shuffle (_copurchase_adjacency); each round joins it
    with the NODE-scale value frame and explodes neighbor lists
    in-task, so no edge-scale frame is ever re-shuffled. The
    descending cumulative-count window became an IN-ROW fold: collect
    the (value, count) pairs per node (second exchange, bounded by
    distinct values per node) and run the same max(min(c, n_ge))
    recurrence over the desc-sorted array with `aggregate` — the
    window's sort+Exchange disappear. Degrees fall out of the
    adjacency for free (size(ns)). No per-round localCheckpoint:
    three fixed rounds stay one lazy plan (AQE sees real exchange
    sizes; no dead checkpoint blocks — the round-11 degradation
    finding). Measured 7.83 s → ~4.4 s at sf0.1."""
    from .queries_wave10 import _copurchase_adjacency

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    adj = _copurchase_adjacency(li)
    c = adj.select("v", F.size("ns").cast("long").alias("c"))
    for _ in range(3):
        # Round 12 (guide §2.4): ONE src-keyed exchange per round — the
        # (src, value) pre-count plus its second exchange fold into a
        # single collect_list of RAW neighbor values with the same
        # desc-sorted H-index recurrence run positionally (min(v_i, i)
        # over the 1-based desc order; identical to the (value, count)
        # fold expanded). Byte trade recorded: the raw list forgoes the
        # (src, c)→count map-side combining, but neighbor values are
        # near-distinct per node here (multiplicity ~1), and the
        # whole second exchange disappears. Parity asserted at
        # sf0.001/sf0.1/sf1 (tools/exp_graph_r12.py); same-window A/B:
        # med 7.72 → 5.68 s at sf0.1, flat at sf1.
        c = (
            adj.join(c, "v")
            .select(F.explode("ns").alias("src"), "c")
            .groupBy(F.col("src").alias("v"))
            .agg(F.collect_list("c").alias("vs"))
            .select(
                "v",
                F.expr(
                    "aggregate(reverse(array_sort(vs)), "
                    "named_struct('i', 0L, 'best', 0L), "
                    "(a, x) -> named_struct('i', a.i + 1L, "
                    "'best', greatest(a.best, least(x, a.i + 1L))), "
                    "a -> a.best)"
                ).alias("c"),
            )
        )
    return c.groupBy(F.col("c").cast("bigint").alias("coreness")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
