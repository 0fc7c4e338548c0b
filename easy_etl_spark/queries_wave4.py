"""Fourth wave: training-data curation extensions — PII redaction,
repetition-based quality signal, deterministic stratified source
mixing, benchmark decontamination, sequence packing, Arrow-batched
model inference, one-pass column profiling, and vocab build +
tokenize-to-ids. The per-row maps are scan-shaped plans (no joins);
every join here is against a broadcast small side (benchmark gram set,
vocabulary), and packing's prefix sum is the partition-offset scheme —
nothing in this module has a single-partition stage, so the plans hold
at 100 TB (see SCALING.md).

Beyond the reference's surface (exit99/easy-etl has no text or
sampling ops); part of the BASELINE.json north-star extension set.
The corpus has no real PII, so the PII query synthesizes
deterministic PII spans from ``doc_id`` inline — the redaction is
therefore doing real work and the oracle checks exact semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.sampling import knuth_bucket
from .operators.textops import pii_count, redact_pii
from .queries import register
from .session import load_table


@register(
    "pii_redaction",
    r"""
    WITH seeded AS (
      SELECT doc_id,
             concat(text, ' contact user', doc_id, '@example.com from 10.',
                    doc_id % 256, '.3.', doc_id % 100, ' call 555-',
                    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t, '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS BIGINT) AS n_ip,
           CAST(len(regexp_extract_all(t, '\b\d{3}-\d{4}\b')) AS BIGINT) AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '[IP]', 'g'),
               '\b\d{3}-\d{4}\b', '[PHONE]', 'g')) AS red_md5
    FROM seeded
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus: typed placeholder redaction (emails →
    IPs → phones, order-significant) plus per-class match counts.
    Single narrow projection, zero shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            d.cast("string"),
            F.lit("@example.com from 10."),
            (d % 256).cast("string"),
            F.lit(".3."),
            (d % 100).cast("string"),
            F.lit(" call 555-"),
            F.lpad((d % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    t = F.col("t")
    return seeded.select(
        "doc_id",
        pii_count(t, "email").cast("long").alias("n_email"),
        pii_count(t, "ip").cast("long").alias("n_ip"),
        pii_count(t, "phone").cast("long").alias("n_phone"),
        F.md5(redact_pii(t)).alias("red_md5"),
    )


@register(
    "text_repetition",
    """
    WITH bg AS (
      SELECT doc_id,
             list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS b
      FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents)
    )
    SELECT doc_id,
           CAST(len(b) AS BIGINT) AS n_bigrams,
           round(CASE WHEN len(b) > 0
                      THEN 1.0 - CAST(len(list_distinct(b)) AS DOUBLE) / len(b)
                      ELSE 0.0 END, 4) AS rep_fraction
    FROM bg
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signal: per-doc fraction of
    bigram occurrences that repeat an earlier bigram. Higher-order
    array functions only — JVM-side, per-row, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    from .operators.textops import array_ngrams, dup_fraction, tokens

    # pre-materialize split + grams: no CSE inside HOF lambdas
    with_bg = docs.withColumn("__t", tokens(F.col("text"))).withColumn(
        "__bg", array_ngrams(F.col("__t"), 2)
    )
    return with_bg.select(
        "doc_id",
        F.size("__bg").cast("long").alias("n_bigrams"),
        F.round(dup_fraction(F.col("__bg")), 4).alias("rep_fraction"),
    )


@register(
    "stratified_source_mix",
    """
    WITH b AS (
      SELECT source, doc_id,
             (doc_id * 2654435761) % 4294967296 % 100 AS bucket,
             CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 30 ELSE 10 END AS rate
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS total,
           CAST(sum(CASE WHEN bucket < rate THEN 1 ELSE 0 END) AS BIGINT) AS kept,
           CAST(sum(CASE WHEN bucket < rate THEN doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum
    FROM b GROUP BY source
    """,
)
def stratified_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source re-weighting audit: per-source total vs
    kept under a Knuth-hash bucket rule (even-numbered sources 30%,
    odd 10%). One scan + one small aggregate; the keep decision is
    pure integer arithmetic, so it is reproducible across engines,
    runs, and partitionings (see operators/sampling.py)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = knuth_bucket(F.col("doc_id"))
    rate = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(30)
    ).otherwise(F.lit(10))
    kept = (bucket < rate).cast("long")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(kept).alias("kept"),
        F.sum(kept * F.col("doc_id")).alias("kept_id_sum"),
    )


@register(
    "decontaminate_overlap",
    """
    WITH g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS gram
      FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents)
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
    SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
    FROM g JOIN bench USING (gram)
    WHERE g.doc_id % 50 <> 0
    GROUP BY g.doc_id
    """,
)
def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (doc_id % 50 != 0)
    sharing any token n-gram with the held-out benchmark slice
    (doc_id % 50 == 0). Production uses n=8..13; n=3 here so the
    synthetic small-vocab corpus yields non-trivial overlap. The
    benchmark gram set is broadcast — training grams never shuffle
    (operators/curation.py:decontaminate)."""
    from .operators.curation import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return decontaminate(train, bench, n=3)


@register(
    "sequence_packing",
    """
    WITH toks AS (
      SELECT doc_id, len(string_split(trim(text), ' ')) AS n FROM documents
    ),
    ofs AS (
      SELECT doc_id, n,
             sum(n) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
               AS start_ofs
      FROM toks
    )
    SELECT CAST(start_ofs // 512 AS BIGINT) AS seq_id,
           CAST(count(*) AS BIGINT) AS docs_started,
           CAST(sum(n) AS BIGINT) AS tokens
    FROM ofs GROUP BY 1
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing audit: docs are laid out on a
    global token stream in doc_id order and each doc is assigned the
    512-token training sequence its first token lands in; per-sequence
    doc and token counts. The oracle's global window cumsum is
    replaced by the partition-offset prefix sum in
    operators/packing.py — no single-partition stage."""
    from .operators.packing import pack_sequences
    from .operators.textops import token_count

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", token_count(F.col("text")).alias("n"))
    packed = pack_sequences(toks, 512, n_col="n", order_col="doc_id")
    return packed.groupBy(F.col("seq_id").cast("long").alias("seq_id")).agg(
        F.count(F.lit(1)).alias("docs_started"),
        F.sum("n").alias("tokens"),
    )


def _w64_sql() -> str:
    from .operators.inference import default_weights

    return "[" + ", ".join(str(w) for w in default_weights(64)) + "]"


@register(
    "inference_batch_score",
    f"""
    SELECT vec_id,
           round(1.0 / (1.0 + exp(-list_dot_product(
                 list_transform(embedding, x -> CAST(x AS DOUBLE)),
                 {'[' + ', '.join(str(((j % 7) - 3) / 10.0) for j in range(64)) + ']'}))), 4) AS score
    FROM embeddings
    """,
)
def inference_batch_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched model inference: sigmoid(emb . w) via mapInPandas
    with per-task model setup and broadcast parameters — the quality-
    classifier/reward-scorer shape (operators/inference.py). The
    linear model is deliberately trivial so DuckDB can replay it;
    the Spark plumbing (iterator pattern, broadcast, vectorized
    batches) is the real artifact."""
    from .operators.inference import batch_score, default_weights

    emb = load_table(spark, sf_dir, "embeddings")
    scored = batch_score(emb, default_weights(64))
    return scored.select("vec_id", F.round("score", 4).alias("score"))


@register(
    "profile_columns",
    """
    SELECT 'o_orderstatus' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT)
    FROM orders
    """,
)
def profile_columns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift / data-quality profile: per-column row, null, and
    distinct counts in one scan (operators/profiling.py; the oracle's
    three scans are the naive SQL equivalent). exact=True here for the
    oracle; the approx_count_distinct twin is the no-Expand standing
    profile at scale."""
    from .operators.profiling import profile_columns

    orders = load_table(spark, sf_dir, "orders")
    prof = profile_columns(orders, ["o_orderstatus", "o_orderpriority", "o_custkey"])
    return prof.select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
    )


@register(
    "vocab_encode",
    """
    WITH tok AS (
      SELECT doc_id, pos, tok FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)+1),
                      i -> {'pos': i, 'tok': t[i]}), recursive := true)
        FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents)
      )
    ),
    vocab AS (
      SELECT tok, CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS token_id
      FROM (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok)
      ORDER BY cnt DESC, tok
      LIMIT 16
    )
    SELECT t.doc_id, CAST(t.pos AS BIGINT) AS pos,
           CAST(coalesce(v.token_id, 0) AS BIGINT) AS token_id
    FROM tok t LEFT JOIN vocab v USING (tok)
    """,
)
def vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize-to-ids: frequency-ranked top-16 vocabulary (small on
    purpose so OOV→UNK=0 actually occurs in the corpus), then encode
    every doc to (doc_id, pos, token_id). The vocab join is broadcast;
    the token stream never shuffles (operators/textops.py:build_vocab,
    encode_tokens)."""
    from .operators.textops import build_vocab, encode_tokens

    docs = load_table(spark, sf_dir, "documents")
    vocab = build_vocab(docs, top_n=16)
    return encode_tokens(docs, vocab)


@register(
    "knn_filtered",
    """
    WITH v AS (
      SELECT vec_id, label, [CAST(x AS DOUBLE) FOR x IN embedding] AS e FROM embeddings
    ),
    n AS (SELECT vec_id, label, e, sqrt(list_sum([x*x FOR x IN e])) AS nrm FROM v),
    q AS (SELECT * FROM n WHERE vec_id < 5),
    c AS (SELECT * FROM n WHERE label = 1),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_sum(list_zip(q.e, c.e).apply(p -> p[1]*p[2])) / (q.nrm*c.nrm), 6) AS cosine
      FROM q JOIN c ON c.vec_id != q.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored
    ) WHERE rnk <= 10
    """,
)
def knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid (filtered) vector search: exact top-k cosine among only
    the corpus vectors passing a metadata predicate (label = 1) — the
    filter composes BEFORE the distance work and pushes to the parquet
    scan, so the excluded vectors are never read, let alone scored.
    Same broadcast-query / partial-top-k shape as knn_brute_force."""
    from .operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("label") == 1)
    queries_df = emb.filter(F.col("vec_id") < 5)
    return similarity.brute_force_topk(corpus, queries_df, k=10).select(
        "query_id", "neighbor_id", "cosine", "rnk"
    )
