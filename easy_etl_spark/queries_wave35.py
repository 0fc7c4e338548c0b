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
