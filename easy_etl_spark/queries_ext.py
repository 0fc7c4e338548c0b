"""Extension query catalog: dedup / similarity / text / multimodal /
event-window operators, registered into the same QUERIES/ORACLES maps
as the core catalog (imported from queries.py at module bottom).

Oracle notes: cosine math is written with explicit double casts on
both sides (DuckDB's list_cosine_similarity is float32 — NOT used);
hash-based ops (MinHash/SimHash/LSH) have no DuckDB-computable
equivalent (xxhash64) and register rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup, multimodal, similarity, textops
from .queries import register
from .session import load_table
from .streaming import windows


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


# ----------------------------------------------------------------------
# Deduplication
# ----------------------------------------------------------------------

@register(
    "dedup_exact",
    """
    SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_exact(_docs(spark, sf_dir)).select("fp", "doc_id", "n_copies")


@register(
    "dedup_ngram_jaccard",
    """
    WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      FROM toks, UNNEST(generate_series(1, greatest(len(t)-2, 1))) AS g(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index n-gram Jaccard self-join, threshold 0.8 (the
    planted near-dup pairs sit ≈0.99)."""
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.8)


@register(
    "dedup_minhash_lsh",
    # The LSH stage only *generates candidates* (deterministically —
    # seeded xxhash64 signatures); every candidate is then verified
    # with EXACT shingle Jaccard. DuckDB can't replay the xxhash64
    # bands, but it can compute the ground truth the verified output
    # must equal when recall is complete: all pairs with Jaccard ≥
    # threshold. The round-8 default banding (r=4, b=8, knee 0.59)
    # put only 89% candidate probability at j=0.7 and MEASURABLY
    # missed one true j=0.80 pair at sf1 (2559/2560 — found by the
    # round-9 full-registry sf1 sweep). The banding now runs r=3,
    # b=16 (knee ≈ 0.40, P(candidate) ≥ 0.9988 for every j ≥ the 0.7
    # verification threshold; ≥ 1−1e−5 at the corpus's lowest planted
    # pair, j=0.80): re-measured 2560/2560 at sf1 and hash-equal to
    # the exact ground truth at every rung, with recall additionally
    # pinned by pytest against the exact inverted-index path.
    """
    WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      FROM toks, UNNEST(generate_series(1, greatest(len(t)-2, 1))) AS g(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.7
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.7)


@register("dedup_simhash")  # rows-only: xxhash64-based
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_pairs(_docs(spark, sf_dir), max_hamming=3)


@register(
    "dedup_embedding_cosine",
    """
    WITH v AS (
      SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, e, sqrt(list_sum([x*x FOR x IN e])) AS nrm FROM v
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_sum(list_zip(a.e, b.e).apply(p -> p[1]*p[2])) / (a.nrm*b.nrm), 6) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_sum(list_zip(a.e, b.e).apply(p -> p[1]*p[2])) / (a.nrm*b.nrm) >= 0.45
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise cosine near-dup (double precision both sides)."""
    return dedup.embedding_dup_pairs(_emb(spark, sf_dir), threshold=0.45)


# ----------------------------------------------------------------------
# Similarity search
# ----------------------------------------------------------------------

@register(
    "knn_brute_force",
    """
    WITH v AS (
      SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS e FROM embeddings
    ),
    n AS (SELECT vec_id, e, sqrt(list_sum([x*x FOR x IN e])) AS nrm FROM v),
    q AS (SELECT * FROM n WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_sum(list_zip(q.e, c.e).apply(p -> p[1]*p[2])) / (q.nrm*c.nrm), 6) AS cosine
      FROM q JOIN n c ON c.vec_id != q.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored
    ) WHERE rnk <= 10
    """,
)
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 5)
    return similarity.brute_force_topk(emb, queries_df, k=10).select(
        "query_id", "neighbor_id", "cosine", "rnk"
    )


@register("knn_lsh_bucketed")  # rows-only: approximate by construction
def knn_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 5)
    return similarity.lsh_bucketed_neighbors(emb, queries_df, k=10).select(
        "query_id", "neighbor_id", "cosine", "rnk"
    )


@register("knn_ivf")  # rows-only: approximate by construction
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 5)
    return similarity.ivf_neighbors(emb, queries_df, k=10, n_lists=8, n_probe=3).select(
        "query_id", "neighbor_id", "cosine", "rnk"
    )


# Engine-portable ANN twins: quantize to BIGINT (floor(x*1e6 + 0.5)),
# integer squared-L2 distances, md5-derived ±1 planes — every decision
# the Spark side makes is an exact integer the oracle recomputes
# bit-for-bit (the dedup_simhash_md5 pattern applied to similarity).

_QV = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))"
_PAIR_D2 = "CAST(list_sum(list_zip({a}, {b}).apply(p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT)"
_SIGN = (
    "(CASE WHEN ('0x' || substr(md5(CAST({p} AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 8))::BIGINT"
    " % 2 = 1 THEN 1 ELSE -1 END)"
)


def _lsh_int_oracle(n_planes: int = 8) -> str:
    """DuckDB twin of similarity.int_lsh_neighbors: per-plane integer
    Rademacher projections via the (x, i) indexed lambda."""
    bucket = "\n           + ".join(
        f"CASE WHEN list_sum(list_transform(q, (x, i) -> x * {_SIGN.format(p=p)})) >= 0"
        f" THEN {1 << p} ELSE 0 END"
        for p in range(n_planes)
    )
    return f"""
    WITH v AS (SELECT vec_id, {_QV} AS q FROM embeddings),
    b AS (
      SELECT vec_id, q,
           {bucket} AS bucket
      FROM v
    ),
    scored AS (
      SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_PAIR_D2.format(a="qs.q", b="c.q")} AS d2
      FROM (SELECT * FROM b WHERE vec_id < 5) qs
      JOIN b c ON c.bucket = qs.bucket AND c.vec_id != qs.vec_id
    )
    SELECT query_id, neighbor_id, d2, rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY d2, neighbor_id) AS rnk
      FROM scored
    ) WHERE rnk <= 10
    """


def _ivf_int_oracle(n_lists: int = 8) -> str:
    """DuckDB twin of similarity.int_ivf_neighbors: pinned lowest-id
    seeds, argmin integer-d² assignment (tie → lowest cell)."""
    return f"""
    WITH v AS (SELECT vec_id, {_QV} AS q FROM embeddings),
    cent AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, q AS cq
      FROM (SELECT vec_id, q FROM v ORDER BY vec_id LIMIT {n_lists})
    ),
    dist AS (
      SELECT v.vec_id, v.q, cent.c,
             {_PAIR_D2.format(a="v.q", b="cent.cq")} AS d2
      FROM v, cent
    ),
    assign AS (
      SELECT vec_id, q, c AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
        FROM dist
      ) WHERE rn = 1
    ),
    scored AS (
      SELECT qs.vec_id AS query_id, a.vec_id AS neighbor_id,
             {_PAIR_D2.format(a="qs.q", b="a.q")} AS d2
      FROM (SELECT * FROM assign WHERE vec_id < 5) qs
      JOIN assign a ON a.cell = qs.cell AND a.vec_id != qs.vec_id
    )
    SELECT query_id, neighbor_id, d2, rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY d2, neighbor_id) AS rnk
      FROM scored
    ) WHERE rnk <= 10
    """


def _lsh_multi_oracle(n_planes: int = 8, n_tables: int = 2) -> str:
    """DuckDB twin of similarity.int_lsh_multi_neighbors: n_tables
    independent plane sets (table t uses global plane indices
    t*n_planes + p), a candidate qualifies if it shares a bucket in ANY
    table (the OR-join is the SQL form of the Spark side's
    union-then-distinct), then one exact integer-d² re-rank."""
    buckets = []
    for t in range(n_tables):
        b = "\n           + ".join(
            f"CASE WHEN list_sum(list_transform(q, (x, i) -> x * {_SIGN.format(p=t * n_planes + p)})) >= 0"
            f" THEN {1 << p} ELSE 0 END"
            for p in range(n_planes)
        )
        buckets.append(f"{b} AS b{t}")
    bucket_cols = ",\n           ".join(buckets)
    any_match = " OR ".join(f"c.b{t} = qs.b{t}" for t in range(n_tables))
    return f"""
    WITH v AS (SELECT vec_id, {_QV} AS q FROM embeddings),
    b AS (
      SELECT vec_id, q,
           {bucket_cols}
      FROM v
    ),
    scored AS (
      SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_PAIR_D2.format(a="qs.q", b="c.q")} AS d2
      FROM (SELECT * FROM b WHERE vec_id < 5) qs
      JOIN b c ON ({any_match}) AND c.vec_id != qs.vec_id
    )
    SELECT query_id, neighbor_id, d2, rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY d2, neighbor_id) AS rnk
      FROM scored
    ) WHERE rnk <= 10
    """


@register("knn_lsh_int", _lsh_int_oracle())
def knn_lsh_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked LSH neighbors (similarity.int_lsh_neighbors):
    the value-hash-verified twin of knn_lsh_bucketed."""
    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 5)
    return similarity.int_lsh_neighbors(emb, queries_df, k=10).select(
        "query_id", "neighbor_id", "d2", "rnk"
    )


@register("knn_lsh_multi", _lsh_multi_oracle())
def knn_lsh_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked multi-table LSH (similarity.int_lsh_multi_
    neighbors): 2 independent plane sets, candidates unioned across
    tables before the exact re-rank — the standard recall amplifier,
    value-hash-verified against the OR-join SQL form."""
    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 5)
    return similarity.int_lsh_multi_neighbors(
        emb, queries_df, k=10, n_tables=2
    ).select("query_id", "neighbor_id", "d2", "rnk")


@register("knn_ivf_int", _ivf_int_oracle())
def knn_ivf_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked IVF neighbors (similarity.int_ivf_neighbors):
    the value-hash-verified twin of knn_ivf."""
    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 5)
    return similarity.int_ivf_neighbors(emb, queries_df, k=10).select(
        "query_id", "neighbor_id", "d2", "rnk"
    )


# ----------------------------------------------------------------------
# Text analysis
# ----------------------------------------------------------------------

@register(
    "text_profile",
    """
    WITH t AS (SELECT doc_id, text, string_split(trim(text), ' ') AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           length(text) AS n_chars_computed,
           round(len(list_filter(toks, x -> x IN ('the','a'))) * 1.0 / len(toks), 4) AS stop_ratio,
           round(least(len(toks) / 100.0, 1.0)
                 * (1 - len(list_filter(toks, x -> x IN ('the','a'))) * 1.0 / len(toks)), 4) AS quality,
           CASE
             WHEN len(list_filter(toks, x -> x IN ('the','a','fast','slow','big')))
                  >= len(list_filter(toks, x -> x IN ('data','table','row','column','value')))
              AND len(list_filter(toks, x -> x IN ('the','a','fast','slow','big')))
                  >= len(list_filter(toks, x -> x IN ('join','merge','group','sort','hash')))
             THEN 'en'
             WHEN len(list_filter(toks, x -> x IN ('data','table','row','column','value')))
                  >= len(list_filter(toks, x -> x IN ('join','merge','group','sort','hash')))
             THEN 'es'
             ELSE 'de'
           END AS lang_guess,
           md5(lower(trim(text))) AS fp_md5
    FROM t
    """,
)
def text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID + quality + token counts + fingerprint in one
    narrow per-row pass (textops.text_profile)."""
    return textops.text_profile(_docs(spark, sf_dir))


@register(
    "text_stats_by_lang",
    """
    SELECT lang, source, count(*) AS n_docs,
           round(sum(n_chars) * 1.0 / count(*), 4) AS avg_chars,
           CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY lang, source
    """,
)
def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    # integer sum / one division: exact in any accumulation order —
    # round(avg(double)) was the round-1 flaky hash (VERDICT.md #2)
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("n_chars") * 1.0 / F.count(F.lit(1)), 4).alias("avg_chars"),
        F.sum(textops.token_count(F.col("text"))).alias("total_tokens"),
    )


# ----------------------------------------------------------------------
# Multimodal plumbing
# ----------------------------------------------------------------------

@register(
    "multimodal_features",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_hash
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: encode → mapInPandas featurize; the
    byte-length and content-hash columns are oracle-checked (the fake
    feature vector itself is covered by unit tests)."""
    media = multimodal.with_binary_payload(_docs(spark, sf_dir))
    return multimodal.featurize(media).select("doc_id", "n_bytes", "content_hash")


@register(
    "multimodal_decode",
    """
    WITH d AS (
      SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 3 AS h
      FROM documents WHERE doc_id < 100
    ),
    idx AS (
      SELECT doc_id, w, h, unnest(range(w * h * 3)) AS p FROM d
    ),
    px AS (
      SELECT doc_id, w, h, p % 3 AS c, (doc_id * 7 + p * 13) % 256 AS v
      FROM idx
    )
    SELECT doc_id,
           CAST(any_value(w) AS INTEGER) AS width,
           CAST(any_value(h) AS INTEGER) AS height,
           CAST(sum(v) FILTER (WHERE c = 0) AS BIGINT) AS r_sum,
           CAST(sum(v) FILTER (WHERE c = 1) AS BIGINT) AS g_sum,
           CAST(sum(v) FILTER (WHERE c = 2) AS BIGINT) AS b_sum,
           round(CAST(sum(v) FILTER (WHERE c = 0) AS DOUBLE) / (any_value(w) * any_value(h)), 4) AS mean_r,
           round(CAST(sum(v) FILTER (WHERE c = 1) AS DOUBLE) / (any_value(w) * any_value(h)), 4) AS mean_g,
           round(CAST(sum(v) FILTER (WHERE c = 2) AS DOUBLE) / (any_value(w) * any_value(h)), 4) AS mean_b
    FROM px GROUP BY doc_id
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: encode deterministic P6 PPM bytes
    per doc (multimodal.synth_ppm_images), parse them back with the
    pure-numpy decoder (multimodal.decode_image), and emit pixel-exact
    per-channel sums/means. The oracle never touches bytes — it replays
    the pixel formula as integer SQL, so any header/stride/channel
    mis-parse in the decoder shifts a sum and fails the hash."""
    media = multimodal.synth_ppm_images(_docs(spark, sf_dir), max_docs=100)
    return multimodal.image_stats(media)


# ----------------------------------------------------------------------
# Event-time windows (batch twins of the streaming jobs)
# ----------------------------------------------------------------------

@register(
    "events_tumbling",
    """
    SELECT strftime(to_timestamp(floor(epoch(ts) / 3600) * 3600)::TIMESTAMP,
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           (CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0) AS sum_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windows.tumbling(_events(spark, sf_dir), minutes=60)


@register(
    "events_sliding",
    """
    WITH e AS (
      SELECT value, to_timestamp(floor(epoch(ts) / 1800) * 1800)::TIMESTAMP AS base FROM events
    ),
    x AS (
      SELECT value, base - to_seconds(off) AS ws
      FROM e, UNNEST([0, 1800]) AS t(off)
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n_events,
           (CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0) AS sum_value
    FROM x GROUP BY 1
    """,
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windows.sliding(_events(spark, sf_dir), length_min=60, slide_min=30)


@register(
    "events_session",
    """
    WITH lagged AS (
      SELECT user_id, event_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800
                     THEN 1 ELSE 0 END AS new_sess
      FROM lagged
    ),
    ids AS (
      SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           (CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0) AS sum_value
    FROM ids GROUP BY user_id, session_id
    """,
)
def events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windows.sessionize(_events(spark, sf_dir), gap_minutes=30)


@register(
    "events_json_props",
    """
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
           max(CAST(props->>'$.k' AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windows.json_props_agg(_events(spark, sf_dir))


@register(
    "events_interval_join",
    """
    SELECT a.user_id AS user_id, a.event_id AS left_id, b.event_id AS right_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 30 MINUTE
    WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    """,
)
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join (jobs.
    interval_join_stream): click→purchase pairs within 30 minutes."""
    return windows.interval_pairs(_events(spark, sf_dir), "click", "purchase", 30)


@register(
    "dedup_clusters",
    """
    WITH RECURSIVE
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
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach AS (
      SELECT src AS node, src AS m FROM edges
      UNION
      SELECT r.node, e.dst AS m FROM reach r JOIN edges e ON r.m = e.src
    )
    SELECT node AS doc_id, min(m) AS cluster_id FROM reach GROUP BY node
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (n-gram Jaccard ≥ 0.8) resolved into duplicate
    clusters via distributed connected components; the DuckDB oracle
    computes the same components with a recursive transitive closure."""
    pairs = dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.8)
    return dedup.duplicate_clusters(pairs)


@register(
    "udtf_chunk_tokens",
    """
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, i AS chunk_idx,
           array_to_string(toks[(i*8+1):(i*8+8)], ' ') AS chunk_text,
           len(toks[(i*8+1):(i*8+8)]) AS n_tokens
    FROM t, unnest(generate_series(0, CAST(ceil(len(toks) / 8.0) AS INT) - 1)) AS g(i)
    """,
)
def udtf_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document → fixed-token-window chunks via a Python UDTF (Spark 4
    table function, LATERAL-joined) — context-window chunking for
    training pipelines (functions/udtfs.py)."""
    from .functions.udtfs import register_udtfs

    register_udtfs(spark)
    _docs(spark, sf_dir).filter(F.col("doc_id") < 50).createOrReplaceTempView("__chunk_in")
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM __chunk_in t, LATERAL chunk_tokens(t.doc_id, t.text) c
        """
    )


@register(
    "events_rollup_reuse",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS b, count(*) AS n,
             sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS s
      FROM events GROUP BY 1
    ),
    daily AS (
      SELECT date_trunc('day', b) AS b, sum(n) AS n, sum(s) AS s
      FROM hourly GROUP BY 1
    ),
    monthly AS (
      SELECT date_trunc('month', b) AS b, sum(n) AS n, sum(s) AS s
      FROM daily GROUP BY 1
    )
    SELECT grain, strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           CAST(n AS BIGINT) AS n,
           round(CAST(s AS DOUBLE) / 1000000.0, 2) AS total,
           round(CAST(s AS DOUBLE) / 1000000.0 / n, 4) AS avg_value
    FROM (
      SELECT 'hour' AS grain, * FROM hourly
      UNION ALL SELECT 'day', * FROM daily
      UNION ALL SELECT 'month', * FROM monthly
    )
    """,
)
def events_rollup_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour→day→month rollup with partial-aggregate reuse
    (streaming/windows.py:rollup_reuse)."""
    return windows.rollup_reuse(_events(spark, sf_dir))


@register(
    "curate_corpus",
    """
    WITH RECURSIVE
    t AS (SELECT doc_id, text, string_split(trim(text), ' ') AS toks FROM documents),
    q AS (
      SELECT doc_id, text, toks,
             round(least(len(toks) / 100.0, 1.0)
                   * (1 - len(list_filter(toks, x -> x IN ('the','a'))) * 1.0 / len(toks)), 4) AS quality
      FROM t
    ),
    good AS (SELECT * FROM q WHERE quality >= 0.5),
    ex AS (SELECT min(doc_id) AS doc_id FROM good GROUP BY md5(lower(trim(text)))),
    g2 AS (SELECT good.* FROM good JOIN ex USING (doc_id)),
    sh AS (
      SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
      FROM g2, UNNEST(generate_series(1, greatest(len(toks)-2, 1))) AS gg(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8
    ),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (SELECT src AS node, src AS m FROM edges
              UNION SELECT r.node, e.dst FROM reach r JOIN edges e ON r.m = e.src),
    labels AS (SELECT node, min(m) AS cluster_id FROM reach GROUP BY node)
    SELECT doc_id, quality FROM g2
    WHERE doc_id NOT IN (SELECT node FROM labels WHERE node != cluster_id)
    """,
)
def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship curation pipeline: quality filter → exact dedup →
    near-dup clustering → canonical survivors (operators/curation.py),
    oracle-checked end to end."""
    from .operators.curation import curate_corpus as _curate

    return _curate(_docs(spark, sf_dir), quality_threshold=0.5, jaccard_threshold=0.8)


@register(
    "events_interval_join_left",
    """
    SELECT a.user_id AS user_id, a.event_id AS left_id, b.event_id AS right_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 30 MINUTE
    """,
)
def events_interval_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer interval join: every click, with its purchase within
    30 minutes or NULL — the conversion-funnel shape."""
    return windows.interval_pairs(_events(spark, sf_dir), "click", "purchase", 30, how="left")
