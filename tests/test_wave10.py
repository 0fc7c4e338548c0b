"""Wave-10 pins: bounded BFS, join-skew profile, binaryFile source."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Row

from easy_etl_spark.operators.graph import bfs_hops
from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table
from easy_etl_spark.sources.readers import binary_file_scan


def test_bfs_hops_on_line_graph(spark):
    # path 1-2-3-4-5 plus an unreachable island 10-11
    und = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in und] + [Row(src=b, dst=a) for a, b in und]
    )
    got = {r.v: r.d for r in bfs_hops(edges, 1, max_hops=8).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_cap_truncates_distances(spark):
    und = [(1, 2), (2, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in und] + [Row(src=b, dst=a) for a, b in und]
    )
    got = {r.v: r.d for r in bfs_hops(edges, 1, max_hops=2).collect()}
    assert got == {1: 0, 2: 1, 3: 2}  # nodes beyond the cap absent


def test_join_key_skew_profile_matches_python(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_custkey").collect()
    counts = Counter(r.o_custkey for r in orders)
    total = sum(counts.values())
    n_keys = len(counts)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = sorted(
        QUERIES["join_key_skew_profile"](spark, sf_dir).collect(),
        key=lambda r: (-r.n, r.o_custkey),
    )
    assert [(r.o_custkey, r.n) for r in got] == top
    for r in got:
        assert r.share == round(r.n / total, 6)
        assert r.skew_factor == round(r.n * n_keys / total, 4)


def test_binary_file_scan_reads_bytes_and_globs(spark, tmp_path):
    (tmp_path / "a.bin").write_bytes(b"\x00\x01payload-a")
    (tmp_path / "b.bin").write_bytes(b"payload-b")
    (tmp_path / "skip.txt").write_bytes(b"not me")
    rows = binary_file_scan(spark, str(tmp_path), glob="*.bin").collect()
    got = {r.path.rsplit("/", 1)[-1]: bytes(r.content) for r in rows}
    assert got == {"a.bin": b"\x00\x01payload-a", "b.bin": b"payload-b"}
    for r in rows:
        assert r.length == len(got[r.path.rsplit("/", 1)[-1]])


def test_delete_where_rewrites_only_touched_partitions(spark, tmp_path):
    import os

    from easy_etl_spark.sources.sinks import ParquetSink

    sink = ParquetSink(spark, str(tmp_path / "t"), partition_by=["grp"])
    rows = [Row(uid=i, grp=("a" if i < 10 else "b" if i < 20 else "c"), val=i * 1.0)
            for i in range(30)]
    sink.append(spark.createDataFrame(rows))

    untouched_files = {
        f: os.path.getmtime(f) for f in sink.data_files() if "/grp=c/" in f
    }
    # delete two users from partition a, ALL of partition b, none of c
    n = sink.delete_where("(grp = 'a' AND uid IN (1, 2)) OR grp = 'b'")
    assert n == 12

    left = sink.read().select("uid", "grp").collect()
    assert {r.uid for r in left if r.grp == "a"} == set(range(10)) - {1, 2}
    assert not [r for r in left if r.grp == "b"]
    assert {r.uid for r in left if r.grp == "c"} == set(range(20, 30))
    assert not os.path.exists(str(tmp_path / "t" / "grp=b"))
    # partition c was never rewritten: same files, same mtimes
    after = {f: os.path.getmtime(f) for f in sink.data_files() if "/grp=c/" in f}
    assert after == untouched_files


def test_delete_where_null_predicate_keeps_rows_and_unpartitioned_path(spark, tmp_path):
    from easy_etl_spark.sources.sinks import ParquetSink

    sink = ParquetSink(spark, str(tmp_path / "u"))
    sink.append(
        spark.createDataFrame(
            [Row(uid=1, tag="x"), Row(uid=2, tag=None), Row(uid=3, tag="y")]
        )
    )
    # NULL tag makes the predicate NULL -> row must survive
    assert sink.delete_where("tag = 'x'") == 1
    assert {r.uid for r in sink.read().collect()} == {2, 3}
    assert sink.delete_where("tag = 'zzz'") == 0


def test_delete_where_escaped_and_null_partition_values(spark, tmp_path):
    """Partition values Spark path-escapes (':' and ' ' in timestamps,
    '/' and '%' in strings) and NULL partitions (stored as
    __HIVE_DEFAULT_PARTITION__) must both delete cleanly — the touched
    directories are derived from input_file_name(), never re-rendered
    from the values."""
    from easy_etl_spark.sources.sinks import ParquetSink

    sink = ParquetSink(spark, str(tmp_path / "e"), partition_by=["batch"])
    rows = [
        Row(uid=1, batch="2024-01-01 10:30:00"),
        Row(uid=2, batch="2024-01-01 10:30:00"),
        Row(uid=3, batch="a/b%c"),
        Row(uid=4, batch=None),
        Row(uid=5, batch="plain"),
    ]
    sink.append(spark.createDataFrame(rows))
    # escaped-chars partition: delete one of its two rows (rewrite path)
    assert sink.delete_where("uid = 1") == 1
    # slash/percent partition: delete all of it (rmtree path)
    assert sink.delete_where("batch = 'a/b%c'") == 1
    # NULL partition: = NULL never matches, IS NULL must
    assert sink.delete_where("batch IS NULL") == 1
    left = {(r.uid, r.batch) for r in sink.read().select("uid", "batch").collect()}
    assert left == {(2, "2024-01-01 10:30:00"), (5, "plain")}


def test_delete_where_purges_retained_version_snapshots(spark, tmp_path):
    """A GDPR purge must not survive in time travel: retained .__v{k}
    snapshots are rewritten without the matching rows (and delete's
    default is purge_versions=True on both paths)."""
    from easy_etl_spark.sources.sinks import ParquetSink

    sink = ParquetSink(spark, str(tmp_path / "v"), keep_versions=3)
    sink.append(spark.createDataFrame([Row(uid=1, tag="pii"), Row(uid=2, tag="ok")]))
    sink.append(spark.createDataFrame([Row(uid=3, tag="ok")]))
    assert sink.versions()  # history exists and contains uid=1
    assert sink.delete_where("tag = 'pii'") == 1
    assert {r.uid for r in sink.read().collect()} == {2, 3}
    for v in sink.versions():
        snap = sink.read(version=v)
        assert snap.filter("tag = 'pii'").count() == 0, f"purged row survives in v{v}"
    # opt-out: rollback-style delete keeps history intact
    sink2 = ParquetSink(spark, str(tmp_path / "w"), keep_versions=2)
    sink2.append(spark.createDataFrame([Row(uid=1, tag="bad")]))
    sink2.append(spark.createDataFrame([Row(uid=2, tag="ok")]))
    assert sink2.delete_where("tag = 'bad'", purge_versions=False) == 1
    assert sink2.read(version=sink2.versions()[-1]).filter("tag = 'bad'").count() == 1


def test_persisted_shingle_index_matches_recompute_path(spark, sf_dir, tmp_path):
    from easy_etl_spark.operators.dedup import (
        incremental_dups_against_index,
        incremental_jaccard_dups,
        write_shingle_index,
    )
    from easy_etl_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter("doc_id % 10 < 8")
    new = docs.filter("doc_id % 10 >= 8")
    write_shingle_index(base, str(tmp_path / "idx"))
    via_index = incremental_dups_against_index(
        spark.read.parquet(str(tmp_path / "idx")), new, threshold=0.8
    ).collect()
    via_docs = incremental_jaccard_dups(base, new, threshold=0.8).collect()
    key = lambda r: (r.new_id, r.base_id)  # noqa: E731
    assert sorted(
        [(r.new_id, r.base_id, r.jaccard) for r in via_index]
    ) == sorted([(r.new_id, r.base_id, r.jaccard) for r in via_docs])
    assert via_docs, "planted near-dups must cross the base/new split"
