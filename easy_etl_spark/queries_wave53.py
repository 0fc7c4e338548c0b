"""Wave-53 query catalog: multimodal quality triage over REAL
decoded media.

New operator families:
  - image_blur_laplacian  variance-of-Laplacian sharpness score over
                          the decoded green channel of real P6 PPM
                          blobs — the standard "drop blurry images"
                          curation signal; the whole decode→convolve
                          →variance pipeline is verified bit-for-bit
                          against a closed-form pixel replay
  - audio_zero_crossing   zero-crossing rate, peak and RMS over real
                          decoded 16-bit RIFF/WAVE PCM — the
                          silence/clipping/noisiness triage an audio
                          corpus runs first; same fixture-replay
                          verification, integer-exact counts/energies

Hash-safety: Laplacian sums, crossing counts, peaks and energies are
exact int64 computed from decoded bytes on the Spark side and from
the fixtures' closed-form sample/pixel formulas on the oracle side;
the only floats are final divisions (and one IEEE sqrt), rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import multimodal
from .queries import register
from .session import load_table

# ----------------------------------------------------------------------
# Variance-of-Laplacian blur score (PPM fixtures)
# ----------------------------------------------------------------------


@register(
    "image_blur_laplacian",
    """
    WITH d AS (
      SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 3 AS h
      FROM documents WHERE doc_id < 100
    ),
    idx AS (
      SELECT doc_id, w, h, unnest(range((w - 2) * (h - 2))) AS q FROM d
    ),
    pt AS (
      SELECT doc_id, w, h,
             1 + q % (w - 2) AS x,
             1 + q // (w - 2) AS y
      FROM idx
    ),
    lap AS (
      SELECT doc_id, w, h,
             (4 * ((doc_id * 7 + (3 * (y * w + x) + 1) * 13) % 256)
              - ((doc_id * 7 + (3 * (y * w + x - 1) + 1) * 13) % 256)
              - ((doc_id * 7 + (3 * (y * w + x + 1) + 1) * 13) % 256)
              - ((doc_id * 7 + (3 * ((y - 1) * w + x) + 1) * 13) % 256)
              - ((doc_id * 7 + (3 * ((y + 1) * w + x) + 1) * 13) % 256)) AS l
      FROM pt
    )
    SELECT doc_id,
           CAST(any_value(w) AS INTEGER) AS width,
           CAST(any_value(h) AS INTEGER) AS height,
           count(*) AS n_interior,
           CAST(sum(l) AS BIGINT) AS lap_sum,
           CAST(sum(l * l) AS BIGINT) AS lap_sq_sum,
           round(CAST(count(*) * sum(l * l) - sum(l) * sum(l) AS DOUBLE)
                 / (count(*) * count(*)), 4) AS lap_var
    FROM lap GROUP BY doc_id
    """,
)
def image_blur_laplacian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-of-Laplacian blur score over REAL decoded images:
    encode deterministic P6 PPM bytes (multimodal.synth_ppm_images),
    decode them with the pure-numpy parser, convolve the green
    channel with the 4-neighbor Laplacian, and emit integer-exact
    variance terms. The oracle replays the closed-form pixel formula
    as SQL over the interior grid — a header/stride/channel mistake
    anywhere in the decode path moves lap_sum and fails the hash."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.synth_ppm_images(docs, max_docs=100)
    return multimodal.image_blur_scores(media)


# ----------------------------------------------------------------------
# Zero-crossing / peak / RMS audio triage (WAV fixtures)
# ----------------------------------------------------------------------


@register(
    "audio_zero_crossing",
    """
    WITH d AS (
      SELECT doc_id, 256 + 64 * (doc_id % 5) AS n
      FROM documents WHERE doc_id < 100
    ),
    smp AS (
      SELECT doc_id, n, unnest(range(n)) AS i FROM d
    ),
    s AS (
      SELECT doc_id, n, i,
             ((doc_id * 31 + i * 17) % 65536) - 32768 AS v
      FROM smp
    ),
    seq AS (
      SELECT doc_id, n, v,
             lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
      FROM s
    )
    SELECT doc_id,
           CAST(any_value(n) AS BIGINT) AS n_samples,
           CAST(sum(CASE WHEN pv IS NOT NULL
                         AND ((v >= 0) != (pv >= 0)) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_zero_crossings,
           round(sum(CASE WHEN pv IS NOT NULL
                          AND ((v >= 0) != (pv >= 0)) THEN 1 ELSE 0 END)
                 * 1.0 / (any_value(n) - 1), 6) AS zcr,
           CAST(max(abs(v)) AS BIGINT) AS peak_abs,
           round(sqrt(CAST(sum(v * v) AS DOUBLE) / any_value(n)), 4) AS rms
    FROM seq GROUP BY doc_id
    """,
)
def audio_zero_crossing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-crossing rate, peak amplitude and RMS over REAL decoded
    16-bit PCM: encode deterministic RIFF/WAVE blobs
    (multimodal.synth_wav_audio), decode with the chunk-walking
    parser, and emit integer-exact counts/energies. The oracle
    replays the closed-form sample formula with a lag() window — any
    sign/stride/header mistake in decode_wav moves the crossing count
    or the energy sum."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.synth_wav_audio(docs, max_docs=100)
    return multimodal.audio_zcr_stats(media)
