"""Wave-12 query catalog: dataset splitting, corpus overlap audit,
token de-stutter cleaning, and period-over-period growth.

New operator families:
  - train_val_test_split   deterministic hash-based 80/10/10 split
  - source_overlap_matrix  pairwise cross-source near-dup audit
  - destutter_tokens       collapse consecutive repeated tokens
  - growth_wow             week-over-week growth per event type

Hash-safety follows the catalog conventions (queries.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import dedup
from .operators.sampling import md5_uniform
from .operators.textops import destutter
from .queries import register
from .session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------
# Dataset splitting: deterministic 80/10/10 with per-split census
# ----------------------------------------------------------------------

@register(
    "train_val_test_split",
    """
    WITH tagged AS (
      SELECT source, n_chars,
             CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT source, n_chars,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
                 AS b
        FROM documents
      )
    )
    SELECT split, source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM tagged GROUP BY 1, 2
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10) keyed on the
    portable md5 hash of doc_id — stable across runs, engines, and
    partition layouts (rand()-based splits are none of those), and
    membership is computable from the id alone, so downstream jobs
    never need a split-table join. Emits the per-split, per-source
    census used to sanity-check the assignment.

    Scale: a per-row map plus one map-side-combined aggregate — no
    shuffle beyond |splits| x |sources| groups."""
    docs = _t(spark, sf_dir, "documents")
    b = md5_uniform(F.col("doc_id"), 100)
    split = F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    return docs.groupBy(split.alias("split"), "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


# ----------------------------------------------------------------------
# Corpus audit: which sources near-duplicate each other?
# ----------------------------------------------------------------------

@register(
    "source_overlap_matrix",
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
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE round(i * 1.0 / (sa.n + sb.n - i), 4) >= 0.8
    )
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           count(*) AS n_dup_pairs
    FROM pairs
    JOIN documents da ON da.doc_id = pairs.id_a
    JOIN documents db ON db.doc_id = pairs.id_b
    GROUP BY 1, 2
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination audit: how many near-duplicate doc
    pairs (shingle Jaccard >= 0.8) join each unordered pair of sources
    — the first question a corpus curator asks before weighting or
    deduplicating sources against each other (a source that mirrors
    another contributes no new information at its listed size).

    Scale: rides the same inverted-index pair generation as the dedup
    family (cost sum over shingle buckets, never all-pairs); the
    source lookup joins the doc dimension twice on its key and the
    final rollup is |sources|^2 groups."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.8)
    src = docs.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa"))
    sb = src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_dup_pairs"))
    )


# ----------------------------------------------------------------------
# Cleaning: collapse consecutive repeated tokens (de-stutter)
# ----------------------------------------------------------------------

@register(
    "destutter_tokens",
    """
    WITH toks AS (
      SELECT doc_id, i AS pos, t[i] AS tok
      FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
           UNNEST(generate_series(1, len(t))) AS g(i)
    ),
    marked AS (
      SELECT doc_id, pos, tok,
             lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM toks
    ),
    kept AS (
      SELECT doc_id, pos, tok FROM marked
      WHERE prev IS NULL OR tok <> prev
    )
    SELECT m.doc_id,
           count(*) AS n_before,
           (SELECT count(*) FROM kept k WHERE k.doc_id = m.doc_id) AS n_after,
           (SELECT md5(string_agg(k.tok, ' ' ORDER BY k.pos))
            FROM kept k WHERE k.doc_id = m.doc_id) AS cleaned_fp
    FROM marked m
    GROUP BY m.doc_id
    """,
)
def destutter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token de-stutter cleaning: collapse runs of consecutive repeated
    tokens ("the the the" -> "the") — a standard crawl-text cleanup
    ahead of tokenizer training. Emits before/after token counts and
    the md5 fingerprint of the cleaned text (content-checkable without
    shipping megabyte strings through the result).

    Scale: see operators/textops.destutter (posexplode -> per-doc lag
    window -> deterministic sort_array re-assembly; everything
    partitions by doc_id)."""
    docs = _t(spark, sf_dir, "documents")
    return destutter(docs).select("doc_id", "n_before", "n_after", "cleaned_fp")


# ----------------------------------------------------------------------
# Period-over-period: week-over-week growth per event type
# ----------------------------------------------------------------------

@register(
    "growth_wow",
    """
    WITH weekly AS (
      SELECT event_type,
             CAST(floor(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) / 7)
                  AS BIGINT) AS week_num,
             count(*) AS n_events,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, week_num, n_events, cents,
             lag(cents) OVER (PARTITION BY event_type ORDER BY week_num)
               AS prev_cents
      FROM weekly
    )
    SELECT event_type, week_num, n_events,
           cents / 100.0 AS revenue,
           round((cents - prev_cents) * 100.0 / prev_cents, 4) + 0.0 AS growth_pct
    FROM lagged WHERE prev_cents IS NOT NULL AND prev_cents > 0
    """,
)
def growth_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth of value per event type — the standard
    period-over-period BI comparison, with exact-cents weekly totals so
    the growth percentage is one deterministic double expression.

    Scale: one map-side-combined weekly rollup (|types| x |weeks|
    groups), then a lag window partitioned by type over that tiny
    frame."""
    e = _t(spark, sf_dir, "events")
    week = F.floor(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")) / F.lit(7)
    ).cast("bigint")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    weekly = e.groupBy("event_type", week.alias("week_num")).agg(
        F.count(F.lit(1)).alias("n_events"), F.sum(cents).alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("week_num")
    lagged = weekly.withColumn("prev_cents", F.lag("cents").over(w))
    return (
        lagged.filter(F.col("prev_cents").isNotNull() & (F.col("prev_cents") > 0))
        .select(
            "event_type",
            "week_num",
            "n_events",
            (F.col("cents") / F.lit(100.0)).alias("revenue"),
            (
                F.round(
                    (F.col("cents") - F.col("prev_cents"))
                    * 100.0
                    / F.col("prev_cents"),
                    4,
                )
                + F.lit(0.0)
            ).alias("growth_pct"),
        )
    )
