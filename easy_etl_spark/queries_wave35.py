"""Wave-35 query catalog: round-5 additions.

New operator families:
  - audio_flac_windows   REAL compressed-audio decode: native FLAC
                         (operators/flaccodec.py — Rice residuals,
                         fixed + quantized-LPC predictors, CRC-8/16,
                         multi-frame reassembly) with the integer-exact
                         windowed-energy oracle; closes the audio half
                         of the codec contract the way round 4's
                         PNG/JPEG closed images.
  - skew_salted_join_hot synthetic hot-key stress for the salted join
                         (bench evidence for the skew path).

Hash-safety follows the catalog conventions (queries.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import multimodal
from .queries import register
from .session import load_table


@register(
    "audio_flac_windows",
    """
    WITH d AS (
      SELECT doc_id, 192 + 64 * (doc_id % 4) AS n
      FROM documents WHERE doc_id < 100
    ),
    idx AS (SELECT doc_id, unnest(range(n)) AS i FROM d),
    s AS (
      SELECT doc_id, i // 64 AS win,
             ((doc_id * 37 + i * 23) % 65536) - 32768 AS v
      FROM idx
    )
    SELECT doc_id, CAST(win AS BIGINT) AS win, count(*) AS n_samples,
           CAST(sum(v * v) AS BIGINT) AS energy,
           CAST(max(v * v) AS BIGINT) AS peak
    FROM s GROUP BY doc_id, win
    """,
)
def audio_flac_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-audio decode end-to-end: encode deterministic
    16-bit mono FLAC streams per doc (multimodal.synth_flac_audio — the
    subframe strategy cycles auto/quantized-LPC/verbatim and the block
    size cycles 64/96/128 across docs), parse them back with the pure
    stdlib+numpy FLAC decoder (flaccodec.decode_flac: Rice partitions,
    fixed + LPC predictors, CRC-8 header / CRC-16 frame verification,
    multi-frame reassembly), and emit integer windowed energies. The
    oracle replays the SAMPLE FORMULA, never the codec — a decoder bug
    anywhere in the bit reader, predictors, or CRC path moves an
    energy sum. 12/20-bit depths and reserved structures refuse loudly
    (pytest-bound in tests/test_flac.py).

    Scale: synth → decode → window stats is one mapInPandas chain —
    blobs never shuffle; only the (tiny) per-window stats aggregate.
    Reference parity: the reference has no media path (easy-etl is
    RDBMS-row ETL); this is the multimodal extension family."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.synth_flac_audio(docs, max_docs=100)
    return multimodal.flac_window_energy(media, window=64)


from .functions.exact import dec_sum, sql_sum  # noqa: E402
from .operators.scale import salted_join  # noqa: E402


@register(
    "skew_salted_join_hot",
    f"""
    WITH hot AS (
      SELECT CASE WHEN l_orderkey % 10 < 7 THEN 1 ELSE l_suppkey END AS s_suppkey,
             l_extendedprice, l_discount
      FROM lineitem
    )
    SELECT s_name,
           count(*) AS n_items,
           {sql_sum("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM hot JOIN supplier USING (s_suppkey)
    GROUP BY s_name
    ORDER BY s_name
    """,
)
def skew_salted_join_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join under ENGINEERED skew: 70% of lineitem rows are
    remapped onto ONE hot supplier key (deterministic l_orderkey % 10
    rule, so the oracle replays it), then joined through
    operators/scale.salted_join — the hot key's rows scatter across 16
    salt replicas instead of one straggler reducer. The oracle is the
    plain join over the same remapping: salting must be a pure
    physical-plan rewrite with zero value drift.

    Scale evidence: tools/skew_bench.py measures this dataset with
    plain vs salted shuffle joins (broadcast + AQE skew-split disabled
    to simulate the big x big regime where neither applies) and
    BASELINE.md records the straggler-vs-salted wall ratio; this
    catalog entry keeps the salted path correctness-gated and in the
    bench v2 set at every round."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 10 < 7, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .alias("s_suppkey"),
        "l_extendedprice",
        "l_discount",
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    joined = salted_join(li, sup, key="s_suppkey", salt=16)
    return (
        joined.groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
        .orderBy("s_name")
    )


@register(
    "image_dhash_pairs",
    """
    WITH d AS (SELECT doc_id, doc_id % 4 AS grp, doc_id % 8 AS bx,
                      (doc_id // 8) % 8 AS by
               FROM documents WHERE doc_id < 100),
    px AS (
      SELECT doc_id, gx.x AS x, gy.y AS y,
             CASE WHEN gx.x // 3 = bx AND gy.y // 3 = by
                  THEN ((grp * 37 + gx.x * 5 + gy.y * 11) % 256 + 96) % 256
                  ELSE (grp * 37 + gx.x * 5 + gy.y * 11) % 256 END AS v
      FROM d, UNNEST(generate_series(0, 23)) AS gx(x),
              UNNEST(generate_series(0, 23)) AS gy(y)
    ),
    blocks AS (
      SELECT doc_id, y // 3 AS i, x // 3 AS j, CAST(sum(v) // 9 AS BIGINT) AS m
      FROM px GROUP BY 1, 2, 3
    ),
    bits AS (
      SELECT l.doc_id, l.i, l.j, CASE WHEN r.m > l.m THEN 1 ELSE 0 END AS bit
      FROM blocks l JOIN blocks r
        ON r.doc_id = l.doc_id AND r.i = l.i AND r.j = l.j + 1
    ),
    hashes AS (
      SELECT doc_id,
             CAST(sum(bit * (CAST(1 AS BIGINT)
                             << CAST(55 - (i * 7 + j) AS INTEGER))) AS BIGINT) AS h
      FROM bits GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.h, b.h)) AS INTEGER) AS hamming
    FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.h, b.h)) <= 4
    """,
)
def image_dhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup pairs over REAL compressed images:
    synth deterministic grayscale PNGs (four wrapped-gradient base
    patterns, one perturbed 3x3 block per doc), decode them with the
    native PNG codec, fingerprint with a 56-bit block-mean dHash
    (integer luma, floor block means, horizontal gradient sign bits),
    and report pairs within Hamming distance 4 via BANDED candidate
    generation (7 bands x 8 bits — pigeonhole-complete for distance
    <= 6, so nothing under the threshold is missed) + exact
    bit_count(xor) verification. The oracle replays pixels -> blocks ->
    bits -> hash -> pairs in pure integer SQL: any codec, luma, block
    boundary, or banding mistake moves the pair set.

    Scale: one fingerprint per blob inside mapInPandas (blobs never
    shuffle), then dedup runs on the hash table — the standard recipe
    for petabyte image-corpus dedup (a 100 TB image set reduces to a
    few GB of hashes; the band join is an equi-join on 8-bit keys)."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.synth_neardup_png_images(docs, max_docs=100)
    hashes = multimodal.dhash_images(media, rows=8, cols=7)
    return multimodal.dhash_near_dup_pairs(
        hashes, max_hamming=4, band_bits=8, n_bands=7
    )


from .operators.textops import gram_novelty, sliding_chunks  # noqa: E402


@register(
    "doc_chunks_overlap",
    """
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks
      FROM documents WHERE doc_id < 50
    ),
    c AS (
      SELECT doc_id, toks,
             1 + (greatest(len(toks) - 8, 0) + 3) // 4 AS n_chunks
      FROM t
    )
    SELECT doc_id, g.i AS chunk_idx,
           CAST(g.i * 4 AS BIGINT) AS start_tok,
           array_to_string(toks[(g.i * 4 + 1):(g.i * 4 + 8)], ' ') AS chunk_text,
           CAST(len(toks[(g.i * 4 + 1):(g.i * 4 + 8)]) AS BIGINT) AS n_tokens
    FROM c, UNNEST(generate_series(0, CAST(n_chunks AS INT) - 1)) AS g(i)
    """,
)
def doc_chunks_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunking (window 8, stride 4) — the
    RAG / context-window variant of udtf_chunk_tokens: stride < window
    keeps every boundary n-gram inside some chunk. Chunk i starts at
    token i*stride; the tail is always covered with no fully-contained
    trailing chunks. Pure JVM column algebra (sequence + explode +
    slice): the token arrays never leave the scan stage and nothing
    shuffles — at 100 TB this is a map-only pass."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    out = sliding_chunks(docs, window=8, stride=4)
    return out.withColumn("chunk_idx", F.col("chunk_idx").cast("int"))


@register(
    "gram_novelty",
    """
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
    ),
    p AS (
      SELECT DISTINCT doc_id, array_to_string(toks[g.i:g.i + 7], ' ') AS g
      FROM t, UNNEST(generate_series(1, greatest(len(toks) - 7, 1))) AS g(i)
    ),
    dfc AS (SELECT g, count(*) AS df FROM p GROUP BY g)
    SELECT doc_id, count(*) AS n_grams,
           CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           round(1.0 - CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                         / count(*), 4) AS novelty_ratio
    FROM p JOIN dfc USING (g) GROUP BY doc_id
    """,
)
def gram_novelty_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-internal novelty / memorization scan: per doc, the share
    of its DISTINCT 8-grams that occur in at least one OTHER document
    (decontaminate() is train-vs-benchmark; this is corpus-vs-itself —
    the dup-leakage metric curation pipelines threshold).

    Scale: one distinct (doc, gram) explode; gram document-frequency
    is a map-side-combined count; the join back is co-partitioned on
    the gram key; the per-doc rollup is the only other shuffle — no
    all-pairs comparison, no corpus-sized broadcast."""
    return gram_novelty(load_table(spark, sf_dir, "documents"), n=8)


from pyspark.sql import Window  # noqa: E402

from .operators.ranking import global_row_number  # noqa: E402
from .operators.sampling import md5_uniform  # noqa: E402


@register(
    "feature_matrix_pit",
    """
    WITH o AS (
      SELECT o_orderkey, o_custkey, o_orderdate,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_orderkey, o_custkey,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
           CAST(count(*) OVER wprev AS BIGINT) AS n_prior_orders,
           CAST(coalesce(sum(cents) OVER wprev, 0) AS BIGINT) AS prior_rev_cents,
           CAST(date_diff('day', CAST(lag(o_orderdate) OVER wo AS DATE),
                          CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev,
           cents AS label_cents
    FROM o
    WINDOW wo AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           wprev AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    """,
)
def feature_matrix_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time training matrix (the feature-store backfill
    pattern): one row per order with features computed ONLY from that
    customer's strictly-earlier history — prior order count, prior
    revenue cents, days since the previous order — plus the label.
    Leakage-correctness is the whole point: the frame ends at 1
    PRECEDING, so no feature ever sees its own label's row (the as-of
    discipline train/serve skew audits demand).

    Scale: every window is PARTITIONED BY customer with bounded
    per-entity frames — no global sort, shuffle keyed on the entity
    exactly once; revenue stays integer cents end-to-end."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wprev = wo.rowsBetween(Window.unboundedPreceding, -1)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.count(F.lit(1)).over(wprev).alias("n_prior_orders"),
        F.coalesce(F.sum("cents").over(wprev), F.lit(0)).alias("prior_rev_cents"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(wo),
        ).alias("days_since_prev"),
        F.col("cents").alias("label_cents"),
    )


@register(
    "contrastive_negatives",
    """
    WITH a AS (
      SELECT doc_id AS anchor_id, source AS a_src
      FROM documents WHERE doc_id < 30
    ),
    p AS (
      SELECT doc_id AS neg_id, source AS n_src FROM documents
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 50 = 0
    ),
    c AS (
      SELECT anchor_id, neg_id,
             ('0x' || substr(md5(concat_ws('-',
                 CAST(anchor_id AS VARCHAR),
                 CAST(neg_id AS VARCHAR))), 1, 8))::BIGINT AS rk
      FROM a JOIN p ON a_src <> n_src
    )
    SELECT anchor_id, neg_id, CAST(rn AS INTEGER) AS neg_rank
    FROM (
      SELECT anchor_id, neg_id,
             row_number() OVER (PARTITION BY anchor_id
                                ORDER BY rk, neg_id) AS rn
      FROM c
    )
    WHERE rn <= 3
    """,
)
def contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: per
    anchor doc, 3 negatives drawn from a BOUNDED md5-hash candidate
    pool (2% of the corpus), restricted to a different source and
    ranked by a portable per-pair md5 — replayable, seedless, and
    stable across engines/retries (the property that makes training
    runs reproducible).

    Scale: the pool is hash-sampled to a bounded size BEFORE any join
    (no anchor x corpus blow-up) and broadcast; the per-anchor rank
    window is pool-sized. Swap the pool rate, per-source caps, or a
    hard-negative scorer in without touching the shape."""
    docs = load_table(spark, sf_dir, "documents")
    anchors = docs.filter(F.col("doc_id") < 30).select(
        F.col("doc_id").alias("anchor_id"), F.col("source").alias("a_src")
    )
    pool = docs.filter(md5_uniform(F.col("doc_id"), 50) == 0).select(
        F.col("doc_id").alias("neg_id"), F.col("source").alias("n_src")
    )
    rk = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "-",
                    F.col("anchor_id").cast("string"),
                    F.col("neg_id").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    cand = anchors.join(
        F.broadcast(pool), F.col("a_src") != F.col("n_src")
    ).withColumn("rk", rk)
    w = Window.partitionBy("anchor_id").orderBy("rk", "neg_id")
    return (
        cand.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= 3)
        .select("anchor_id", "neg_id", F.col("neg_rank").cast("int"))
    )


@register(
    "audio_fingerprint_pairs",
    """
    WITH d AS (
      SELECT doc_id, doc_id % 3 AS g, doc_id % 8 AS w0
      FROM documents WHERE doc_id < 60
    ),
    idx AS (SELECT doc_id, g, w0, unnest(range(256)) AS i FROM d),
    s AS (
      SELECT doc_id, i // 32 AS win,
             ((g * 53 + i * 29) % 4096) - 2048
             + CASE WHEN i // 32 = w0 THEN 512 ELSE 0 END AS v
      FROM idx
    ),
    e AS (SELECT doc_id, win, CAST(sum(v * v) AS BIGINT) AS energy
          FROM s GROUP BY 1, 2),
    m AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_match
      FROM e a JOIN e b
        ON a.win = b.win AND a.energy = b.energy AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_match, CAST(8 AS BIGINT) AS n_windows
    FROM m WHERE n_match >= 6
    """,
)
def audio_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate detection over REAL decoded audio: synth
    grouped 16-bit WAVs (three base waveforms, one perturbed window
    per doc), decode with the native RIFF/WAVE codec, fingerprint each
    32-sample window by its exact integer energy, and find pairs
    agreeing on >= 6 of 8 windows via an inverted-index (window,
    energy) equi-join — the audio twin of image_dhash_pairs, and like
    it the oracle replays samples -> windows -> energies -> pairs in
    pure integer SQL, so any decode or windowing error moves the pair
    set. No all-pairs comparison anywhere: candidates come keyed."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.synth_group_wav_audio(docs, max_docs=60)
    en = multimodal.wav_window_energy(media, window=32)
    return multimodal.audio_fingerprint_pairs(en, n_windows=8, min_match=6)


@register(
    "psi_feature_drift",
    """
    WITH o AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             CASE WHEN o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
                  THEN 'base' ELSE 'target' END AS period
      FROM orders
    ),
    bucketed AS (
      SELECT least(9, cents // 5000000) AS bucket, period FROM o
    ),
    counts AS (
      SELECT g.b AS bucket,
             CAST(coalesce(sum(CASE WHEN period = 'base' THEN 1 END), 0)
                  AS BIGINT) AS n_base,
             CAST(coalesce(sum(CASE WHEN period = 'target' THEN 1 END), 0)
                  AS BIGINT) AS n_target
      FROM UNNEST(generate_series(0, 9)) AS g(b)
      LEFT JOIN bucketed ON bucketed.bucket = g.b
      GROUP BY 1
    ),
    tot AS (SELECT sum(n_base) AS tb, sum(n_target) AS tt FROM counts)
    SELECT bucket, n_base, n_target,
           round((CAST(n_base + 1 AS DOUBLE) / (tb + 10)
                  - CAST(n_target + 1 AS DOUBLE) / (tt + 10))
                 * ln((CAST(n_base + 1 AS DOUBLE) / (tb + 10))
                      / (CAST(n_target + 1 AS DOUBLE) / (tt + 10))) + 0.0,
                 6) AS psi_contrib
    FROM counts, tot
    """,
)
def psi_feature_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per bucket — the standard production
    feature-drift monitor: order value distribution in a base period
    vs a target period over 10 fixed-width buckets, add-one smoothed
    (integer counts, so the smoothed shares are rationals of integers
    and both engines feed ln identical doubles — the unigram_logprob
    exactness pattern). Sum psi_contrib >= 0.2 is the usual alarm.

    Scale: one map-side-combined bucket x period count (20 rows), a
    10-row scaffold join so empty buckets participate, broadcast
    totals — nothing beyond the initial aggregate touches data."""
    o = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
        F.when(
            F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"),
            F.lit("base"),
        )
        .otherwise(F.lit("target"))
        .alias("period"),
    )
    counts = (
        o.select(
            F.least(F.lit(9), F.floor(F.col("cents") / 5000000)).alias("bucket"),
            "period",
        )
        .groupBy("bucket")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("period") == "base", 1)), F.lit(0)
            ).alias("n_base"),
            F.coalesce(
                F.sum(F.when(F.col("period") == "target", 1)), F.lit(0)
            ).alias("n_target"),
        )
    )
    scaffold = spark.range(10).select(F.col("id").alias("bucket"))
    full = (
        scaffold.join(F.broadcast(counts), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            F.coalesce("n_target", F.lit(0)).alias("n_target"),
        )
    )
    tot = full.agg(
        F.sum("n_base").alias("tb"), F.sum("n_target").alias("tt")
    )
    p = (F.col("n_base") + 1).cast("double") / (F.col("tb") + 10)
    q = (F.col("n_target") + 1).cast("double") / (F.col("tt") + 10)
    return full.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_base",
        "n_target",
        F.round((p - q) * F.log(p / q) + F.lit(0.0), 6).alias("psi_contrib"),
    )


@register(
    "range_join_binned",
    """
    WITH spans AS (
      SELECT user_id,
             CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             min(ts) AS s_start, max(ts) AS s_end
      FROM events GROUP BY 1, 2
    ),
    incidents AS (
      SELECT event_id, ts AS i_start, ts + INTERVAL 30 MINUTE AS i_end
      FROM events WHERE event_type = 'error'
    )
    SELECT s.user_id, s.day,
           CAST(coalesce(count(i.event_id), 0) AS BIGINT) AS n_incidents
    FROM spans s LEFT JOIN incidents i
      ON s.s_start < i.i_end AND i.i_start < s.s_end
    GROUP BY 1, 2
    """,
)
def range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PURE range join — interval overlap with NO equi key: per
    user-day activity span, count the error incidents (30-minute
    windows from ANY user) overlapping it.

    Through round 8 this ran the Databricks range-join-hint shape
    (explode both interval sets onto an hour grid, equi-join the bin,
    dedup candidates, verify exactly). The round-9 full sf2.5 sweep
    killed that plan: incidents are GLOBAL (no user key), so the
    candidate pair set grows ~K^2 in the scale factor — ~6e9 pairs at
    sf2.5 — and the dedup shuffle OOMs the heap. Binning only helps
    when overlap density is bounded; here the semantics themselves are
    dense.

    The fix computes every span's count WITHOUT enumerating pairs.
    Incident windows all have the same width, so i_start < i_end and

        n(span) = #{i : i_start < s_end  AND  i_end > s_start}
                = #{i : i_start < s_end} - #{i : i_end <= s_start}

    (the subtracted set is a subset of the first: i_end <= s_start
    implies i_start < i_end <= s_start <= s_end). Each term is a CDF
    lookup of a span endpoint against the global multiset of incident
    endpoints — done by unioning probe rows into the per-timestamp
    count frame and taking a banded exclusive prefix sum
    (packing.global_running_offset — fourth consumer; no
    single-partition window). Strict vs inclusive comparison is an
    ordering tiebreak: probes sort BEFORE same-timestamp counts for
    `<`, AFTER them for `<=`. Work is O(|spans| + |incidents|) —
    independent of overlap density — all shuffles keyed or
    range-partitioned, driver traffic bounded to per-partition
    offsets. Zero-incident spans fall out as 0 - 0 (no scaffold
    re-join needed)."""
    e = load_table(spark, sf_dir, "events")
    spans = e.groupBy(
        "user_id", F.col("ts").cast("date").cast("string").alias("day")
    ).agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    inc = e.filter(F.col("event_type") == "error").select(
        F.unix_micros("ts").alias("start_us"),
        F.unix_micros(F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_us"),
    )

    def cdf_counts(points: DataFrame, probes: DataFrame, probe_first: bool, out: str) -> DataFrame:
        """For each probe (user_id, day, ts_us): running count of
        points with ts_us < probe (probe_first) or <= probe."""
        # probe rows carry an explicit marker — do NOT overload user_id
        # nullability as the sentinel (a NULL-user_id span group would be
        # silently dropped and diverge from the oracle's GROUP BY, which
        # keeps a NULL group).
        pt = points.groupBy("ts_us").agg(F.count(F.lit(1)).alias("c"))
        pt = pt.select(
            F.lit(None).cast("long").alias("user_id"),
            F.lit(None).cast("string").alias("day"),
            (F.col("ts_us") * 2 + (1 if probe_first else 0)).alias("ord"),
            F.col("c").cast("long").alias("c"),
            F.lit(False).alias("__is_probe"),
        )
        pr = probes.select(
            F.col("user_id").cast("long").alias("user_id"),
            "day",
            (F.col("ts_us") * 2 + (0 if probe_first else 1)).alias("ord"),
            F.lit(0).cast("long").alias("c"),
            F.lit(True).alias("__is_probe"),
        )
        cum = global_running_offset(pr.unionByName(pt), "c", "ord", out_col=out)
        return cum.filter(F.col("__is_probe")).select("user_id", "day", out)

    c_lt = cdf_counts(  # #{i_start < s_end}
        inc.select(F.col("start_us").alias("ts_us")),
        spans.select("user_id", "day", F.unix_micros("s_end").alias("ts_us")),
        probe_first=True,
        out="n_lt",
    )
    c_le = cdf_counts(  # #{i_end <= s_start}
        inc.select(F.col("end_us").alias("ts_us")),
        spans.select("user_id", "day", F.unix_micros("s_start").alias("ts_us")),
        probe_first=False,
        out="n_le",
    )
    # null-safe join: the span grouping keeps NULL user_id / day groups
    # (matching the oracle's GROUP BY); a plain equi-join would drop them
    return (
        c_lt.alias("lt")
        .join(
            c_le.alias("le"),
            F.col("lt.user_id").eqNullSafe(F.col("le.user_id"))
            & F.col("lt.day").eqNullSafe(F.col("le.day")),
        )
        .select(
            F.col("lt.user_id").alias("user_id"),
            F.col("lt.day").alias("day"),
            (F.col("n_lt") - F.col("n_le")).cast("bigint").alias("n_incidents"),
        )
    )


_SD_QV = (
    "list_transform(embedding, x -> "
    "CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))"
)
_SD_D2 = (
    "CAST(list_sum(list_zip({a}, {b}).apply(p -> (p[1]-p[2])*(p[1]-p[2])))"
    " AS BIGINT)"
)
_SD_T = 1_100_000_000_000


@register(
    "semantic_dedup",
    f"""
    WITH v AS (SELECT vec_id, {_SD_QV} AS q FROM embeddings),
    cent AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, q AS cq
      FROM (SELECT vec_id, q FROM v ORDER BY vec_id LIMIT 8)
    ),
    dist AS (
      SELECT v.vec_id, v.q, cent.c, {_SD_D2.format(a="v.q", b="cent.cq")} AS d2
      FROM v, cent
    ),
    assign AS (
      SELECT vec_id, q, c AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
        FROM dist
      ) WHERE rn = 1
    ),
    losers AS (
      SELECT DISTINCT b.vec_id AS loser
      FROM assign a JOIN assign b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE {_SD_D2.format(a="a.q", b="b.q")} <= {_SD_T}
    )
    SELECT vec_id, CAST(cell AS INTEGER) AS cell,
           vec_id NOT IN (SELECT loser FROM losers) AS kept
    FROM assign
    """,
)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup over the embeddings table
    (operators/similarity.semantic_dedup_int): IVF-cell coarse
    quantization bounds candidates to within-cell pairs, integer-d²
    threshold marks redundant vectors, min-id survivor kept — the
    embedding-space member of the dedup family, riding the same
    pinned-seed integer-exact machinery as knn_ivf_int so the DuckDB
    oracle replays quantize -> assign -> pairs -> survivors
    bit-for-bit."""
    from .operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup_int(emb, d2_threshold=_SD_T, n_lists=8)


@register(
    "classifier_calibration",
    """
    WITH scored AS (
      SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    )
    SELECT least(9, s // 5000) AS bucket,
           count(*) AS n,
           CAST(sum(y) AS BIGINT) AS n_pos,
           round(CAST(sum(s) AS DOUBLE) / count(*), 4) AS avg_score_cents,
           round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS pos_rate
    FROM scored GROUP BY 1
    """,
)
def classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration / reliability curve for the classifier_eval score:
    10 fixed-width score bins, each reporting mean predicted score and
    empirical positive rate — the reliability-diagram table model
    monitoring plots (a well-calibrated scorer tracks the diagonal).
    One map-side-combined aggregate; integers until the final
    divisions, same exactness posture as classifier_eval."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    return (
        scored.groupBy(F.least(F.lit(9), F.floor(F.col("s") / 5000)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").cast("bigint").alias("n_pos"),
            F.round(F.sum("s").cast("double") / F.count(F.lit(1)), 4).alias(
                "avg_score_cents"
            ),
            F.round(F.sum("y").cast("double") / F.count(F.lit(1)), 6).alias(
                "pos_rate"
            ),
        )
    )


@register(
    "equi_depth_histogram",
    """
    WITH o AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             o_orderkey
      FROM orders
    ),
    r AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, o_orderkey) AS rn,
             count(*) OVER () AS n
      FROM o
    )
    SELECT CAST((rn - 1) * 10 // n AS BIGINT) AS bucket,
           count(*) AS n_rows,
           min(cents) AS lo_cents,
           max(cents) AS hi_cents
    FROM r GROUP BY 1
    """,
)
def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth (10-bucket) histogram of order values — the
    boundary statistics an optimizer / data profiler collects, computed
    with EXACT ranks rather than approxQuantile. Second consumer of the
    banded global_row_number (operators/ranking.py): range-partitioned
    rank + broadcast prefix offsets, total count free from the offsets
    pass — no single-partition sort at any cardinality."""
    o = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
        "o_orderkey",
    )
    ranked, total = global_row_number(
        o, [F.col("cents"), F.col("o_orderkey")], out_col="rn", with_total=True
    )
    return (
        ranked.groupBy(
            F.floor((F.col("rn") - 1) * 10 / F.lit(total)).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
    )


@register(
    "attribution_time_decay",
    """
    WITH conv AS (
      SELECT event_id AS cid, user_id, ts AS cts
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, ts, event_type FROM events
      WHERE event_type <> 'purchase'
    ),
    pairs AS (
      SELECT conv.cid, t.event_type AS channel,
             CAST(1 AS BIGINT)
               << CAST(20 - date_diff('day', CAST(t.ts AS DATE),
                                      CAST(conv.cts AS DATE)) AS INTEGER)
               AS units
      FROM conv JOIN t
        ON t.user_id = conv.user_id
       AND t.ts < conv.cts
       AND date_diff('day', CAST(t.ts AS DATE), CAST(conv.cts AS DATE))
           BETWEEN 0 AND 20
    ),
    tot AS (SELECT CAST(sum(units) AS BIGINT) AS all_units FROM pairs)
    SELECT channel,
           count(*) AS n_touches,
           CAST(sum(units) AS BIGINT) AS units,
           round(CAST(sum(units) AS DOUBLE) / all_units, 6) AS share
    FROM pairs, tot
    GROUP BY channel, all_units
    """,
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay MULTI-touch attribution: every purchase credits each
    of the user's preceding non-purchase touches within 20 days,
    weighted by 2^(20 - days-before) — an INTEGER dyadic weight, so
    the per-channel credit shares stay exact rationals until one final
    division (no float halflife accumulation to drift between
    engines). Complements attribution_touch's single-touch models.

    Scale: the conversion x touch pairing is an equi-join on user_id
    with a 20-day range residual — the events_interval_join shape, so
    state and pair counts are bounded by the lookback window, never
    |purchases| x |history|."""
    e = load_table(spark, sf_dir, "events")
    conv = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("cuid"),
        F.col("ts").alias("cts"),
    )
    touches = e.filter(F.col("event_type") != "purchase").select(
        "user_id", "ts", F.col("event_type").alias("channel")
    )
    dd = F.datediff(F.col("cts").cast("date"), F.col("ts").cast("date"))
    pairs = (
        conv.join(touches, (F.col("user_id") == F.col("cuid")) & (F.col("ts") < F.col("cts")))
        .withColumn("dd", dd)
        .filter((F.col("dd") >= 0) & (F.col("dd") <= 20))
        .select(
            "cid",
            "channel",
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(20 - dd AS INT))").alias(
                "units"
            ),
        )
    )
    tot = pairs.agg(F.sum("units").cast("bigint").alias("all_units"))
    return (
        pairs.crossJoin(F.broadcast(tot))
        .groupBy("channel", "all_units")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("units").cast("bigint").alias("units"),
        )
        .select(
            "channel",
            "n_touches",
            "units",
            F.round(F.col("units").cast("double") / F.col("all_units"), 6).alias(
                "share"
            ),
        )
    )


from .operators.packing import global_running_offset  # noqa: E402


@register(
    "ks_two_sample",
    """
    WITH o AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             CASE WHEN o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
                  THEN 1 ELSE 0 END AS is_base
      FROM orders
    ),
    per_v AS (
      SELECT cents,
             CAST(sum(is_base) AS BIGINT) AS nb,
             CAST(sum(1 - is_base) AS BIGINT) AS nt
      FROM o GROUP BY cents
    ),
    tot AS (SELECT CAST(sum(nb) AS BIGINT) AS n_base,
                   CAST(sum(nt) AS BIGINT) AS n_target FROM per_v),
    cum AS (
      SELECT cents,
             CAST(sum(nb) OVER (ORDER BY cents) AS BIGINT) AS cb,
             CAST(sum(nt) OVER (ORDER BY cents) AS BIGINT) AS ct
      FROM per_v
    ),
    d AS (
      SELECT cents, abs(cb * n_target - ct * n_base) AS dnum
      FROM cum, tot
    ),
    best AS (SELECT cents, dnum FROM d ORDER BY dnum DESC, cents LIMIT 1)
    SELECT n_base, n_target, best.cents AS at_cents,
           round(CAST(dnum AS DOUBLE) / (n_base * n_target), 6) AS ks
    FROM best, tot
    """,
)
def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between the base
    and target periods' order-value distributions: KS = max over the
    value domain of |ECDF_base - ECDF_target|, kept EXACT by comparing
    the integer cross products |cum_base*n_target - cum_target*n_base|
    and dividing once at the end. Complements psi_feature_drift
    (binned, localization) with the classic distribution-free test.

    Scale: the cumulative counts run through the BANDED global prefix
    sum (packing.global_running_offset — third consumer) over the
    distinct-value frame, so the CDF never funnels through one task
    even when |distinct values| ~ |rows|; the argmax is a bounded-heap
    TakeOrdered, and totals broadcast."""
    o = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
        F.when(
            F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("is_base"),
    )
    per_v = o.groupBy("cents").agg(
        F.sum("is_base").cast("bigint").alias("nb"),
        F.sum(1 - F.col("is_base")).cast("bigint").alias("nt"),
    )
    tot = per_v.agg(
        F.sum("nb").cast("bigint").alias("n_base"),
        F.sum("nt").cast("bigint").alias("n_target"),
    )
    cb = global_running_offset(per_v, "nb", "cents", out_col="nb_excl")
    both = global_running_offset(cb, "nt", "cents", out_col="nt_excl")
    d = (
        both.crossJoin(F.broadcast(tot))
        .select(
            "cents",
            "n_base",
            "n_target",
            F.abs(
                (F.col("nb_excl") + F.col("nb")) * F.col("n_target")
                - (F.col("nt_excl") + F.col("nt")) * F.col("n_base")
            ).alias("dnum"),
        )
    )
    best = d.orderBy(F.col("dnum").desc(), "cents").limit(1)
    return best.select(
        "n_base",
        "n_target",
        F.col("cents").alias("at_cents"),
        F.round(
            F.col("dnum").cast("double") / (F.col("n_base") * F.col("n_target")), 6
        ).alias("ks"),
    )


@register(
    "benford_first_digit",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM orders
      WHERE o_totalprice > 0
    ),
    tot AS (SELECT count(*) AS n FROM d)
    SELECT digit,
           count(*) AS n_obs,
           round(CAST(count(*) AS DOUBLE) / n, 6) AS obs_share,
           round(log10(1.0 + 1.0 / digit), 6) AS benford_share
    FROM d, tot
    GROUP BY digit, n
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order values — the classic
    fraud / synthetic-data smell test a data-quality suite runs over
    monetary columns: observed first-significant-digit shares next to
    the Benford expectation log10(1 + 1/d). First digits come from the
    integer-cents string (no float log extraction to drift); shares
    are one division; the expected shares are constants both engines
    compute identically.

    Scale: one map-side-combined 9-group aggregate plus a broadcast
    total — a single pass at any size."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.substring(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    tot = d.agg(F.count(F.lit(1)).alias("n"))
    return (
        d.crossJoin(F.broadcast(tot))
        .groupBy("digit", "n")
        .agg(F.count(F.lit(1)).alias("n_obs"))
        .select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs").cast("double") / F.col("n"), 6).alias(
                "obs_share"
            ),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford_share"),
        )
    )
