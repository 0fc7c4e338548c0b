"""Multimodal columns: image/audio/video as opaque `binary` columns
with typed metadata, processed by Arrow-batched pandas functions over
`mapInPandas`.

The Spark-side plumbing (schema, partition-preserving batch iteration,
UDF signatures, output shapes) is real and tested; the actual codec
calls are stubbed because image/audio libraries are not in this
container — `decode_image` raises NotImplementedError by contract,
and `fake_feature_extract` is the deterministic stand-in used by
tests/queries (features derived from the bytes themselves, so results
are reproducible anywhere).

Scale design: media blobs ride through `mapInPandas` in Arrow record
batches — columnar transfer, no per-row pickling; batch size is
governed by spark.sql.execution.arrow.maxRecordsPerBatch. Operators
are per-partition (no shuffle); downstream joins key on the metadata,
never the blob.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of featurize(): metadata + fixed-width feature vector
FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, content_hash string, features array<double>"
)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a multimodal-shaped frame from the documents table: the
    utf-8 bytes of `text` stand in for an image/audio blob, plus typed
    metadata — the schema a real ingest would produce."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col(text_col)).alias("orig_len"),
        ).alias("meta"),
    )


def decode_image(data: bytes) -> "object":
    """Codec stub — image libs are not available in this container.

    A real deployment plugs Pillow/libvips here; everything around this
    call (batching, schema, partitioning) is already exercised by
    `fake_feature_extract`.
    """
    raise NotImplementedError("image codecs not available in this environment")


def fake_feature_extract(data: bytes, n_features: int = 8) -> list[float]:
    """Deterministic stand-in for a feature extractor: fixed-width
    vector from byte statistics of equal-width chunks."""
    if not data:
        return [0.0] * n_features
    chunk = max(1, len(data) // n_features)
    out = []
    for i in range(n_features):
        piece = data[i * chunk : (i + 1) * chunk] or b"\x00"
        out.append(round(sum(piece) / len(piece) / 255.0, 6))
    return out


def featurize(media_df: DataFrame, n_features: int = 8) -> DataFrame:
    """mapInPandas feature extraction over the binary column: iterator
    of Arrow batches in, feature rows out. Per-partition, shuffle-free;
    this is the template a real decode/resize/frame-sample op uses."""
    # Ship this module's functions by value so executors never need
    # easy_etl_spark importable on their own sys.path (cloudpickle
    # serializes module-level functions by reference otherwise).
    import sys

    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass
    extract = fake_feature_extract

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            blobs = pdf["media"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(len),
                    "content_hash": blobs.map(lambda b: hashlib.md5(b).hexdigest()),
                    "features": blobs.map(lambda b: extract(bytes(b), n_features)),
                }
            )

    return media_df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media_df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' template: emit one row per sampled offset of
    each blob (the video-frame analog: one input row → many output
    rows, schema change, still per-partition)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "offset": [], "sample_byte": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(blob)
                for off in range(0, len(b), every_n_bytes):
                    rows["doc_id"].append(doc_id)
                    rows["offset"].append(off)
                    rows["sample_byte"].append(b[off])
            yield pd.DataFrame(rows)

    return media_df.mapInPandas(run, "doc_id bigint, offset int, sample_byte int")


def resize_image(data: bytes, width: int, height: int) -> bytes:
    """Codec stub — real deployments plug Pillow's resize here."""
    raise NotImplementedError("image codecs not available in this environment")


def fake_resize(data: bytes, factor: int = 4) -> bytes:
    """Deterministic stand-in for resize: keep every factor-th byte —
    same contract shape (binary in → smaller binary out)."""
    return bytes(data[::factor])


def resize(media_df: DataFrame, factor: int = 4) -> DataFrame:
    """Resize template over mapInPandas: binary in → binary out with
    updated metadata, per-partition, no shuffle. Swap fake_resize for
    resize_image when codecs exist; nothing else changes."""
    import sys

    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass
    shrink = fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["media"].map(lambda b: shrink(bytes(b), factor))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": blobs,
                    "n_bytes": blobs.map(len),
                }
            )

    return media_df.mapInPandas(run, "doc_id bigint, media binary, n_bytes int")
