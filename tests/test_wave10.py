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
