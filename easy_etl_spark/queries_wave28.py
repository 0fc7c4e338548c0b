"""Wave-28 query catalog: dedup explainability.

New operator family:
  - dedup_pair_explain   near-dup pairs with EVIDENCE — shared-shingle
                         counts, both set sizes, and a deterministic
                         sample of the shared material (what a human
                         reviewer needs to approve a merge queue)

Hash-safety follows the catalog conventions (queries.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.dedup import _shingle_index
from .queries import register
from .session import load_table


@register(
    "dedup_pair_explain",
    """
    WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      FROM toks, UNNEST(generate_series(1, greatest(len(t)-2, 1))) AS g(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             count(*) AS n_shared, min(a.s) AS sample_shingle
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_shared,
           CAST(sa.n AS BIGINT) AS size_a, CAST(sb.n AS BIGINT) AS size_b,
           round(n_shared * 1.0 / (sa.n + sb.n - n_shared), 4) AS jaccard,
           sample_shingle
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE round(n_shared * 1.0 / (sa.n + sb.n - n_shared), 4) >= 0.8
    """,
)
def dedup_pair_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup explainability: every near-dup pair (Jaccard >= 0.8) with
    the EVIDENCE a reviewer needs — shared-shingle count, both set
    sizes, the resulting Jaccard, and a deterministic sample of the
    shared material (the lexicographically smallest shared shingle).
    The dedup family says WHICH pairs merge; this is the merge-queue
    view that says WHY.

    Scale: identical inverted-index pair generation as the Jaccard
    dedup (min() rides the same aggregate — no extra pass for the
    sample)."""
    docs = load_table(spark, sf_dir, "documents")
    idx = _shingle_index(docs, "text", "doc_id", 3)
    sizes = idx.groupBy("__id").agg(F.count(F.lit(1)).alias("n"))
    a, b = idx.alias("a"), idx.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.__sh") == F.col("b.__sh"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.min(F.col("a.__sh")).alias("sample_shingle"),
        )
    )
    sa = sizes.select(F.col("__id").alias("id_a"), F.col("n").alias("size_a"))
    sb = sizes.select(F.col("__id").alias("id_b"), F.col("n").alias("size_b"))
    jac = F.round(
        F.col("n_shared")
        / (F.col("size_a") + F.col("size_b") - F.col("n_shared")),
        4,
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.8)
        .select(
            "id_a",
            "id_b",
            "n_shared",
            F.col("size_a").cast("bigint").alias("size_a"),
            F.col("size_b").cast("bigint").alias("size_b"),
            "jaccard",
            "sample_shingle",
        )
    )


@register(
    "video_frame_sample",
    """
    SELECT doc_id, CAST(g.off AS BIGINT) AS frame_offset,
           ascii(substr(text, g.off + 1, 1)) AS sample_byte
    FROM documents,
         UNNEST(generate_series(0, length(text) - 1, 64)) AS g(off)
    """,
)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads (the video analog: one blob
    -> one row per sampled frame offset), via the mapInPandas template
    in operators/multimodal.frame_sample — real byte indexing over
    Arrow-delivered blobs, with the synthetic text-byte signal letting
    DuckDB replay each sampled byte character-by-character (the same
    trick that makes audio_rms_windows' sample math oracle-checked
    instead of rows-only; like it, the replay assumes the ASCII corpus
    the driver generates).

    Scale: pure map-side — one vectorized pass per Arrow batch, one
    output row per frame, no shuffle at all."""
    from .operators.multimodal import frame_sample, with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    out = frame_sample(with_binary_payload(docs), every_n_bytes=64)
    return out.select(
        "doc_id",
        F.col("offset").cast("bigint").alias("frame_offset"),
        F.col("sample_byte").cast("int").alias("sample_byte"),
    )
