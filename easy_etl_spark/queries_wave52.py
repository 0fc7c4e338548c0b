"""Wave-52 query catalog: curation threshold calibration sweeps.

New operator families:
  - dedup_threshold_sweep   pairs/docs-removed as a function of the
                          Jaccard threshold (0.5→0.9) from ONE pass
                          of the exact inverted-index pair join — the
                          knob-tuning curve a curation team reads
                          before committing a dedup threshold
                          (complements `lsh_parameter_plan`, which
                          calibrates the CANDIDATE stage)
  - quality_threshold_sweep docs/tokens retained as a function of the
                          unigram-LM mean-logprob cutoff — the
                          filter-calibration curve behind every
                          perplexity-style quality gate: pick the
                          threshold from this table, not by feel

Hash-safety: pair counts and doc/token counts are exact integers;
the logprob score reuses the quantized-ln `unigram_logprob` units so
bucketing is integer comparison, never float drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register
from .session import load_table

# ----------------------------------------------------------------------
# Dedup threshold sweep
# ----------------------------------------------------------------------

SWEEP_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)


@register(
    "dedup_threshold_sweep",
    f"""
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
    ),
    pairs AS (
      -- round(…, 4) BEFORE the filter: the Spark operator filters on
      -- its rounded output column, so the replay must too
      SELECT id_a, id_b, round(i * 1.0 / (sa.n + sb.n - i), 4) AS j
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE round(i * 1.0 / (sa.n + sb.n - i), 4) >= 0.5
    ),
    grid AS (SELECT CAST(unnest([{", ".join(str(t) for t in SWEEP_THRESHOLDS)}])
                         AS DOUBLE) AS threshold),
    hit AS (
      SELECT g.threshold, p.id_a, p.id_b FROM grid g
      JOIN pairs p ON p.j >= g.threshold
    ),
    docs_hit AS (
      SELECT threshold, count(DISTINCT d) AS n_docs_in_pairs FROM (
        SELECT threshold, id_a AS d FROM hit
        UNION ALL SELECT threshold, id_b FROM hit
      ) GROUP BY threshold
    ),
    pair_cnt AS (SELECT threshold, count(*) AS n_pairs FROM hit GROUP BY threshold)
    SELECT g.threshold,
           CAST(coalesce(pc.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(coalesce(dh.n_docs_in_pairs, 0) AS BIGINT) AS n_docs_in_pairs
    FROM grid g
    LEFT JOIN pair_cnt pc ON pc.threshold = g.threshold
    LEFT JOIN docs_hit dh ON dh.threshold = g.threshold
    """,
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair count and affected-document count at five Jaccard
    thresholds, from ONE inverted-index pair pass at the loosest
    threshold — the curve that shows where the corpus's duplication
    knee sits before anyone commits a threshold to production.

    Scale: the expensive step (exact shingle pair join) runs once at
    0.5; the sweep itself is a 5-row broadcast against the pair list,
    which is candidate-sized, not corpus-sized. Round 11 (guide §5):
    the PAIR LIST rides track_cache — it is candidate-sized (bounded,
    small at any scale) and feeds two aggregate consumers (pair counts
    + distinct-doc counts), each of which otherwise re-ran the whole
    shingle pipeline; a 4-variant same-window bisect measured this
    40% faster than the previous shape (med 5.30 → 3.14 s), and
    caching the pairs instead of the exploded INDEX is the only
    combination that also fits memory at 100 TB."""
    from .operators import dedup
    from .session import track_cache

    docs = load_table(spark, sf_dir, "documents")
    pairs = track_cache(
        dedup.ngram_jaccard_pairs(docs, threshold=0.5).select(
            "id_a", "id_b", F.col("jaccard").alias("j")
        )
    )
    grid = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in SWEEP_THRESHOLDS])).alias("threshold")
    )
    hit = pairs.crossJoin(F.broadcast(grid)).where(F.col("j") >= F.col("threshold"))
    pair_cnt = hit.groupBy("threshold").agg(F.count(F.lit(1)).alias("n_pairs"))
    docs_hit = (
        hit.select("threshold", F.col("id_a").alias("d"))
        .unionAll(hit.select("threshold", F.col("id_b").alias("d")))
        .groupBy("threshold")
        .agg(F.count_distinct("d").alias("n_docs_in_pairs"))
    )
    return (
        grid.join(pair_cnt, "threshold", "left")
        .join(docs_hit, "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce("n_docs_in_pairs", F.lit(0))
            .cast("bigint")
            .alias("n_docs_in_pairs"),
        )
    )


# ----------------------------------------------------------------------
# Quality (unigram-LM logprob) threshold sweep
# ----------------------------------------------------------------------

QUALITY_CUTS_MICRO = tuple(range(-7_500_000, -5_499_999, 500_000))


@register(
    "quality_threshold_sweep",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents
    ),
    freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT count(*) AS t FROM toks),
    scored AS (
      SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(CAST(floor(ln(c * 1.0 / t) * 1000000.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS units
      FROM toks JOIN freq USING (tok) CROSS JOIN tot
      GROUP BY doc_id
    ),
    grid AS (SELECT unnest([{", ".join(str(c) for c in QUALITY_CUTS_MICRO)}])
                    AS cut_micro),
    kept AS (
      SELECT g.cut_micro,
             count(*) AS n_docs_kept,
             CAST(sum(s.n_tokens) AS BIGINT) AS n_tokens_kept
      FROM grid g JOIN scored s ON s.units >= g.cut_micro * s.n_tokens
      GROUP BY g.cut_micro
    ),
    tot_docs AS (SELECT count(*) AS nd FROM scored)
    SELECT CAST(g.cut_micro AS BIGINT) AS cut_micro,
           CAST(coalesce(k.n_docs_kept, 0) AS BIGINT) AS n_docs_kept,
           CAST(coalesce(k.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept,
           round(coalesce(k.n_docs_kept, 0) * 1.0 / td.nd, 6) AS doc_keep_rate
    FROM grid g LEFT JOIN kept k ON k.cut_micro = g.cut_micro
    CROSS JOIN tot_docs td
    """,
)
def quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents and tokens retained at five unigram-LM mean-logprob
    cutoffs (−7.5 to −5.5 nats, integer micro-nat units) — the
    filter-calibration table behind a perplexity-style quality gate.
    The keep test compares exact integer unit SUMS against
    cut·n_tokens, so no per-doc float division ever happens: the same
    doc is kept or dropped on every engine, bit-for-bit.

    Scale: one token explode + vocab join (the unigram_logprob
    machinery), one 5-row broadcast sweep over the per-doc score
    table."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " ")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = toks.agg(F.count(F.lit(1)).alias("t"))
    scored = (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.floor(
                    F.log(F.col("c") * 1.0 / F.col("t")) * 1000000.0 + F.lit(0.5)
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("units"),
        )
    )
    grid = spark.range(1).select(
        F.explode(F.array(*[F.lit(c) for c in QUALITY_CUTS_MICRO])).alias("cut_micro")
    )
    kept = (
        scored.crossJoin(F.broadcast(grid))
        .where(F.col("units") >= F.col("cut_micro") * F.col("n_tokens"))
        .groupBy("cut_micro")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens_kept"),
        )
    )
    td = scored.agg(F.count(F.lit(1)).alias("nd"))
    return (
        grid.join(kept, "cut_micro", "left")
        .crossJoin(F.broadcast(td))
        .select(
            F.col("cut_micro").cast("bigint").alias("cut_micro"),
            F.coalesce("n_docs_kept", F.lit(0)).cast("bigint").alias("n_docs_kept"),
            F.coalesce("n_tokens_kept", F.lit(0))
            .cast("bigint")
            .alias("n_tokens_kept"),
            F.round(
                F.coalesce("n_docs_kept", F.lit(0)) * 1.0 / F.col("nd"), 6
            ).alias("doc_keep_rate"),
        )
    )
