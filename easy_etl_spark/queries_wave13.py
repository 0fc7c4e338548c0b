"""Wave-13 query catalog: audio-shaped multimodal features and exact
classifier evaluation.

New operator families:
  - audio_rms_windows   windowed PCM energy/peak via real numpy int8
                        decode in mapInPandas (SQL oracle replays the
                        energies from the synthetic signal's chars)
  - classifier_eval     tie-aware exact ROC-AUC (Mann-Whitney rank
                        form) + precision/recall/F1 at a threshold

Hash-safety follows the catalog conventions (queries.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.multimodal import pcm_window_energy, with_binary_payload
from .queries import register
from .session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------
# Multimodal audio analog: windowed PCM energy over binary payloads
# ----------------------------------------------------------------------

@register(
    "audio_rms_windows",
    """
    WITH chars AS (
      SELECT doc_id, CAST(floor((i - 1) / 64) AS BIGINT) AS win,
             ascii(substr(text, i, 1)) AS code
      FROM documents, UNNEST(generate_series(1, length(text))) AS g(i)
    )
    SELECT doc_id, win, count(*) AS n_samples,
           CAST(sum(code * code) AS BIGINT) AS energy,
           CAST(max(code * code) AS BIGINT) AS peak
    FROM chars GROUP BY 1, 2
    """,
)
def audio_rms_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction shape, end to end: build the binary
    payload column (with_binary_payload), ship it through Arrow into a
    mapInPandas numpy int8 decode, and emit per-64-sample-window
    energy and peak — the loudness profile a real audio pipeline
    computes per frame (operators/multimodal.pcm_window_energy).

    The Spark side does REAL binary work on the blob; the signal is
    synthetic (ascii text bytes as PCM), which is exactly what lets
    DuckDB replay the integer energies character-by-character — the
    one multimodal query whose pixel/sample math is oracle-checked
    rather than rows-only. (The char-by-char replay relies on the
    corpus being ASCII — true of the driver testdata; a non-ASCII
    regen would need octet-level DuckDB functions instead.) Scale: pure map-side, one output row per
    window, no shuffle before the (doc, win) aggregate inside the
    UDF's vectorized pass."""
    docs = _t(spark, sf_dir, "documents")
    return pcm_window_energy(with_binary_payload(docs), window=64)


# ----------------------------------------------------------------------
# Model evaluation: exact AUC + thresholded precision/recall/F1
# ----------------------------------------------------------------------

@register(
    "classifier_eval",
    """
    WITH scored AS (
      SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    per_score AS (
      SELECT s, count(*) AS c, CAST(sum(y) AS BIGINT) AS pos
      FROM scored GROUP BY s
    ),
    cum AS (
      SELECT s, c, pos,
             CAST(coalesce(sum(c) OVER (ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS c_less
      FROM per_score
    ),
    agg AS (
      SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
             CAST(sum(c - pos) AS BIGINT) AS n_neg,
             CAST(sum(pos * (2 * c_less + c + 1)) AS BIGINT) AS r2,
             CAST(sum(CASE WHEN s >= 25000 THEN pos ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN s >= 25000 THEN c - pos ELSE 0 END) AS BIGINT) AS fp
      FROM cum
    )
    SELECT n_pos, n_neg, tp, fp, n_pos - tp AS fn,
           round((CAST(r2 AS DOUBLE) - CAST(n_pos AS DOUBLE) * (n_pos + 1))
                 / (2.0 * n_pos * n_neg), 6) AS auc,
           round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision,
           round(CAST(tp AS DOUBLE) / n_pos, 6) AS recall,
           round(2.0 * tp / (2.0 * tp + fp + (n_pos - tp)), 6) AS f1
    FROM agg
    """,
)
def classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-classifier evaluation, exactly: ROC-AUC via the
    Mann-Whitney rank form with proper tied-score handling (average
    ranks carried as the integer 2·avg_rank = 2·c_less + c + 1, so AUC
    is one exact rational until the final division), plus
    precision/recall/F1 at the value >= 250 operating point (the
    F1 = 2tp/(2tp+fp+fn) form avoids the p+r intermediate). Scores
    here are the value column in cents against the is-purchase label —
    the metric machinery is what's under test, not the model.

    Scale: rows collapse to one group per DISTINCT score before any
    ranking, and the cumulative count-below is the BANDED exclusive
    prefix sum (packing.global_running_offset) — range-partitioned
    scores, driver-side prefix-merge of numPartitions partials, no
    single-partition sort even for an unbounded score domain.
    Everything else is one aggregate."""
    from .operators.packing import global_running_offset

    e = _t(spark, sf_dir, "events")
    scored = e.select(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    per_score = scored.groupBy("s").agg(
        F.count(F.lit(1)).alias("c"), F.sum("y").alias("pos")
    )
    cum = global_running_offset(per_score, "c", "s", out_col="c_less")
    hit = F.col("s") >= 25000
    agg = cum.agg(
        F.sum("pos").alias("n_pos"),
        F.sum(F.col("c") - F.col("pos")).alias("n_neg"),
        F.sum(F.col("pos") * (2 * F.col("c_less") + F.col("c") + 1)).alias("r2"),
        F.sum(F.when(hit, F.col("pos")).otherwise(0)).alias("tp"),
        F.sum(F.when(hit, F.col("c") - F.col("pos")).otherwise(0)).alias("fp"),
    )
    auc = (
        F.col("r2").cast("double") - F.col("n_pos").cast("double") * (F.col("n_pos") + 1)
    ) / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg"))
    return agg.select(
        "n_pos",
        "n_neg",
        "tp",
        "fp",
        (F.col("n_pos") - F.col("tp")).alias("fn"),
        F.round(auc, 6).alias("auc"),
        F.round(F.col("tp").cast("double") / (F.col("tp") + F.col("fp")), 6).alias(
            "precision"
        ),
        F.round(F.col("tp").cast("double") / F.col("n_pos"), 6).alias("recall"),
        F.round(
            F.lit(2.0)
            * F.col("tp")
            / (F.lit(2.0) * F.col("tp") + F.col("fp") + (F.col("n_pos") - F.col("tp"))),
            6,
        ).alias("f1"),
    )
