"""Round-5 regression pins for the advisor findings: fully-purged
version snapshots stay readable (empty), apply_changes tolerates base
columns beyond the changelog payload, corrupt JPEG entropy segments
raise the documented ValueError, and operator-internal caches are
released by session.release_caches()."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from easy_etl_spark.session import load_table, release_caches
from easy_etl_spark.sources.sinks import ParquetSink


def test_fully_purged_version_reads_back_empty_not_missing(spark, tmp_path):
    """A version whose every row matches the purge predicate must stay
    in versions() and read back as the EMPTIED state — symmetric with
    partially-purged snapshots, not silently retired."""
    sink = ParquetSink(spark, str(tmp_path / "t"), keep_versions=3)
    sink.append(spark.createDataFrame([Row(uid=1, tag="pii")]))  # v1: all pii
    sink.append(spark.createDataFrame([Row(uid=2, tag="ok")]))
    versions_before = sink.versions()
    assert sink.delete_where("tag = 'pii'") == 1
    # delete itself may snapshot the pre-delete state as a new version,
    # but no pre-existing version may disappear just because all of its
    # rows matched the purge predicate
    assert set(sink.versions()) >= set(versions_before), "a purged version disappeared"
    v1 = sink.read(version=versions_before[0])
    assert v1.count() == 0
    assert set(v1.columns) >= {"uid", "tag"}, "purged snapshot lost its schema"


def test_fully_purged_partitioned_version_keeps_schema(spark, tmp_path):
    """Same pin on a hive-partitioned sink: the empty rewrite must go
    out unpartitioned (partition values as data columns) so the
    snapshot keeps a readable on-disk schema."""
    sink = ParquetSink(
        spark, str(tmp_path / "t"), partition_by=["tag"], keep_versions=3
    )
    sink.append(spark.createDataFrame([Row(uid=1, tag="pii")]))
    sink.append(spark.createDataFrame([Row(uid=2, tag="ok")]))
    first = sink.versions()[0]
    sink.delete_where("tag = 'pii'")
    assert first in sink.versions()
    v1 = sink.read(version=first)
    assert v1.count() == 0
    assert set(v1.columns) >= {"uid", "tag"}


def test_apply_changes_tolerates_surrogate_id_on_base(spark):
    """A base table previously populated by ParquetSink.append carries
    an `id` column the changelog payload lacks; apply_changes must
    null-fill instead of raising (advisor: strict unionByName broke
    foreach_batch_apply_changes against appended sinks)."""
    from easy_etl_spark.operators.scd import apply_changes

    base = spark.createDataFrame(
        [Row(id=10, k=1, v="a"), Row(id=11, k=2, v="b")]
    )
    changes = spark.createDataFrame(
        [Row(k=2, v="B", op="U", seq=1), Row(k=3, v="c", op="I", seq=1)]
    )
    got = {
        r.k: (r.v, r.id)
        for r in apply_changes(base, changes, keys=["k"], seq_col="seq").collect()
    }
    assert got == {1: ("a", 10), 2: ("B", None), 3: ("c", None)}


def test_jpeg_truncated_entropy_raises_valueerror():
    """decode_jpeg promises ValueError on corrupt streams; a truncated
    entropy-coded segment must not escape as the internal _MarkerHit or
    a raw IndexError."""
    from easy_etl_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    img = (np.arange(64 * 64) % 251).astype("uint8").reshape(64, 64)
    data = encode_jpeg(img)
    # cut inside the entropy segment (before the trailing EOI marker)
    truncated = data[: len(data) // 2]
    with pytest.raises(ValueError, match="truncated JPEG entropy"):
        decode_jpeg(truncated)
    # corrupt: splice an early EOI into the scan body
    spliced = data[: len(data) - len(data) // 4] + b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_jpeg(spliced)


def test_release_caches_frees_operator_internal_persists(spark, sf_dir):
    """build_vocab (and friends) persist intermediates; release_caches
    must leave the session CacheManager empty so long-lived sessions
    don't accumulate executor storage across invocations."""
    from easy_etl_spark.operators.textops import build_vocab

    docs = load_table(spark, sf_dir, "documents")
    vocab = build_vocab(docs, top_n=50)
    assert vocab.count() > 0  # materialize -> the persist is live
    release_caches()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "tracked caches were not released"
    )
