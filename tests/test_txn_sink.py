"""TransactionalParquetSink: atomic commit protocol, optimistic
concurrent writers (conflict -> rebase -> retry), crash leftovers, and
vacuum reclamation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from easy_etl_spark.sources.txn import CommitConflict, TransactionalParquetSink


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_append_upsert_versions_and_time_travel(spark, tmp_path):
    sink = TransactionalParquetSink(spark, str(tmp_path / "t"))
    assert sink.read() is None and sink.current_version() == 0
    v1 = sink.append(spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")]))
    v2 = sink.upsert(spark.createDataFrame([Row(k=2, v="B"), Row(k=3, v="c")]), keys=["k"])
    assert (v1, v2) == (1, 2)
    assert _rows(sink.read(), "k", "v") == [(1, "a"), (2, "B"), (3, "c")]
    # time travel: v1 still reads the pre-upsert state
    assert _rows(sink.read(version=1), "k", "v") == [(1, "a"), (2, "b")]
    # surrogate ids: stable across the upsert for matched keys
    ids_v1 = {r["k"]: r["id"] for r in sink.read(version=1).collect()}
    ids_v2 = {r["k"]: r["id"] for r in sink.read().collect()}
    assert ids_v2[1] == ids_v1[1] and ids_v2[2] == ids_v1[2]
    assert ids_v2[3] not in ids_v1.values()
    with pytest.raises(ValueError, match="not committed"):
        sink.read(version=9)


def test_concurrent_writers_conflict_rebases_and_loses_no_rows(spark, tmp_path):
    """Writer overlap: A stages its snapshot, then B commits first. A's
    commit claim must fail atomically, its stale snapshot must never
    become visible, and the automatic rebase must replay A's append on
    top of B's table — both batches land, serialized as v2 then v3."""
    path = str(tmp_path / "t")
    a = TransactionalParquetSink(spark, path)
    b = TransactionalParquetSink(spark, path)
    a.append(spark.createDataFrame([Row(k=1, v="base")]))

    def interloper():
        a._pre_commit_hook = None  # fire once
        b.append(spark.createDataFrame([Row(k=2, v="from-b")]))

    a._pre_commit_hook = interloper
    v = a.append(spark.createDataFrame([Row(k=3, v="from-a")]))
    assert v == 3  # b won v2; a rebased and committed v3
    assert _rows(a.read(), "k", "v") == [(1, "base"), (2, "from-b"), (3, "from-a")]
    # the conflicted (pre-rebase) snapshot was reclaimed on the spot:
    # only the three committed snapshots remain
    live = {a._commit_record(vv)["dir"] for vv in a.versions()}
    on_disk = {os.path.join("_data", n) for n in os.listdir(os.path.join(path, "_data"))}
    assert on_disk == live


def test_try_commit_claim_is_exclusive(spark, tmp_path):
    """Two fully-staged snapshots racing for the same version: exactly
    one os.link claim wins; the loser sees False, not a clobber."""
    sink = TransactionalParquetSink(spark, str(tmp_path / "t"))
    d1 = sink._stage(spark.createDataFrame([Row(k=1)]))
    d2 = sink._stage(spark.createDataFrame([Row(k=2)]))
    assert sink._try_commit(1, d1, "append") is True
    assert sink._try_commit(1, d2, "append") is False
    assert sink._commit_record(1)["dir"] == d1  # winner's record intact
    assert _rows(sink.read(), "k") == [(1,)]


def test_crashed_writer_leftovers_invisible_and_vacuumed(spark, tmp_path):
    """A writer that dies after staging (orphan _data dir) or mid-claim
    (.tmp commit file) leaves nothing a reader can see; vacuum reclaims
    both."""
    sink = TransactionalParquetSink(spark, str(tmp_path / "t"))
    sink.append(spark.createDataFrame([Row(k=1, v="a")]))
    # simulate a crash: fully-written snapshot, no commit record
    orphan = sink._stage(spark.createDataFrame([Row(k=99, v="ghost")]))
    # and a half-finished commit claim
    tmp = os.path.join(sink._commit_dir(), ".tmp-deadbeef")
    open(tmp, "w").write("{")
    assert _rows(sink.read(), "k", "v") == [(1, "a")], "reader saw uncommitted data"
    assert sink.current_version() == 1
    # within the grace window the leftovers are PROTECTED — they are
    # indistinguishable from a live writer's staged-but-uncommitted work
    assert sink.vacuum() == 0
    assert os.path.exists(os.path.join(str(tmp_path / "t"), orphan))
    removed = sink.vacuum(grace_seconds=0.0)
    assert removed == 2
    assert not os.path.exists(os.path.join(str(tmp_path / "t"), orphan))
    assert not os.path.exists(tmp)
    assert _rows(sink.read(), "k", "v") == [(1, "a")]


def test_vacuum_keep_last_bounds_history(spark, tmp_path):
    sink = TransactionalParquetSink(spark, str(tmp_path / "t"))
    for i in range(4):
        sink.append(spark.createDataFrame([Row(k=i)]))
    assert sink.versions() == [1, 2, 3, 4]
    sink.vacuum(keep_last=2)
    assert sink.versions() == [3, 4]
    assert _rows(sink.read(), "k") == [(0,), (1,), (2,), (3,)]  # current intact
    with pytest.raises(ValueError, match="not committed"):
        sink.read(version=1)


def test_delete_where_commits_and_history_survives_until_vacuum(spark, tmp_path):
    sink = TransactionalParquetSink(spark, str(tmp_path / "t"))
    sink.append(spark.createDataFrame([Row(k=1, tag="pii"), Row(k=2, tag="ok")]))
    v = sink.delete_where("tag = 'pii'")
    assert v == 2
    assert _rows(sink.read(), "k") == [(2,)]
    # history still holds it (rollback safety) until vacuum retires it
    assert _rows(sink.read(version=1), "k") == [(1,), (2,)]
    sink.vacuum(keep_last=1)
    assert sink.versions() == [2]


def test_foreach_batch_streaming_ingest_commits_atomically(spark, tmp_path):
    """Streaming ingestion through the transactional sink: each
    micro-batch upserts as one atomic commit, and a replayed batch
    (crash-before-checkpoint redelivery) converges to the identical
    table state — the exactly-once-on-replay posture, now with a
    commit log recording every applied batch."""
    import pyspark.sql.functions as F

    d = tmp_path / "in"
    d.mkdir()
    spark.createDataFrame([Row(k=1, v=10), Row(k=2, v=20)], "k long, v long") \
        .coalesce(1).write.parquet(str(d / "a.parquet"))
    spark.createDataFrame([Row(k=2, v=99), Row(k=3, v=30)], "k long, v long") \
        .coalesce(1).write.parquet(str(d / "b.parquet"))
    sink = TransactionalParquetSink(spark, str(tmp_path / "t"))
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema("k long, v long")
        .parquet(str(d) + "/*.parquet")
    )

    def handle(bdf, bid):
        if not bdf.isEmpty():
            sink.upsert(bdf, keys=["k"])

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state = _rows(sink.read(), "k", "v")
    assert state == [(1, 10), (2, 99), (3, 30)]
    # redelivery of the last batch (simulated replay): same final state
    replay = spark.read.parquet(str(d / "b.parquet"))
    sink.upsert(replay, keys=["k"])
    assert _rows(sink.read(), "k", "v") == state
    # the commit log recorded every applied batch, atomically ordered
    assert sink.versions() == [1, 2, 3]


def test_commit_conflict_gives_up_after_max_retries(spark, tmp_path):
    path = str(tmp_path / "t")
    a = TransactionalParquetSink(spark, path, max_retries=2)
    b = TransactionalParquetSink(spark, path)

    def always_interlope():
        b.append(spark.createDataFrame([Row(k=0)]))

    a._pre_commit_hook = always_interlope
    with pytest.raises(CommitConflict, match="2 optimistic retries"):
        a.append(spark.createDataFrame([Row(k=1)]))


def test_optimize_compacts_as_new_commit(spark, tmp_path):
    """OPTIMIZE rewrites the snapshot with right-sized files as a new
    atomic commit: values identical, history intact, file count down."""
    import glob

    import pyspark.sql.functions as F

    sink = TransactionalParquetSink(spark, str(tmp_path / "t"))
    # explicit id column -> append writes the frame's own 16 partitions
    df = (
        spark.range(0, 1000)
        .select(F.col("id"), F.col("id").alias("k"))
        .repartition(16)
    )
    sink.append(df)
    before = _rows(sink.read(), "k")
    files_before = len(glob.glob(str(tmp_path / "t") + "/_data/*/*.parquet"))
    v = sink.compact(target_rows_per_file=1000)
    assert v == 2
    assert _rows(sink.read(), "k") == before
    cur_dir = sink._commit_record(2)["dir"]
    files_after = len(glob.glob(str(tmp_path / "t" / cur_dir) + "/*.parquet"))
    assert files_after < files_before and files_after <= 2
    # pre-compaction state still time-travels
    assert _rows(sink.read(version=1), "k") == before


def test_shallow_clone_zero_copy_and_vacuum_safety(spark, tmp_path):
    """Shallow clone: the clone's commit points at the SOURCE snapshot
    dir (no data copied), diverges on write, and the clone's vacuum
    never deletes source storage."""
    import glob
    import os

    src = TransactionalParquetSink(spark, str(tmp_path / "src"))
    src.append(spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")]))
    clone = TransactionalParquetSink(spark, str(tmp_path / "clone"))
    v = clone.clone_from(src)
    assert v == 1
    assert _rows(clone.read(), "k", "v") == [(1, "a"), (2, "b")]
    # zero copy: the clone owns no data files of its own yet
    assert glob.glob(str(tmp_path / "clone") + "/_data/*/*.parquet") == []
    # divergence: writes to the clone stage into its own storage
    clone.append(spark.createDataFrame([Row(k=3, v="c")]))
    assert _rows(clone.read(), "k", "v") == [(1, "a"), (2, "b"), (3, "c")]
    assert _rows(src.read(), "k", "v") == [(1, "a"), (2, "b")]
    # vacuum on the clone retires its commit records but NEVER touches
    # the source's snapshot directory
    src_dir = os.path.join(src.path, src._commit_record(1)["dir"])
    clone.vacuum(keep_last=1)
    assert clone.versions() == [2]
    assert os.path.isdir(src_dir)
    assert _rows(src.read(), "k", "v") == [(1, "a"), (2, "b")]
    with pytest.raises(ValueError, match="cannot clone an empty table"):
        TransactionalParquetSink(spark, str(tmp_path / "e")).clone_from(
            TransactionalParquetSink(spark, str(tmp_path / "e2"))
        )


def test_vacuum_grace_protects_inflight_writer(spark, tmp_path):
    """vacuum() running in the window between a concurrent writer's
    _stage() and _try_commit() must NOT reap the fully-staged (but not
    yet referenced) snapshot: the default grace window treats young
    unreferenced _data dirs as potentially in-flight, so the writer's
    commit lands on intact data."""
    sink = TransactionalParquetSink(spark, str(tmp_path / "t"))
    sink.append(spark.createDataFrame([Row(k=1)]))
    maint = TransactionalParquetSink(spark, str(tmp_path / "t"))

    def hostile_vacuum():
        maint.vacuum()  # default grace: must skip the staged snapshot
        sink._pre_commit_hook = None

    sink._pre_commit_hook = hostile_vacuum
    v = sink.append(spark.createDataFrame([Row(k=2)]))
    assert v == 2
    # the commit points at data vacuum could have deleted — prove it reads
    assert _rows(sink.read(), "k") == [(1,), (2,)]


def test_commit_log_checkpoint_bounds_listing(spark, tmp_path, monkeypatch):
    """With a checkpoint every 10 commits, resolving the version list
    must cost O(commits since checkpoint) — one _last_checkpoint read
    plus a sequential tail probe — never a full O(commits) log listing
    (the Delta _last_checkpoint pattern)."""
    sink = TransactionalParquetSink(
        spark, str(tmp_path / "t"), checkpoint_interval=10
    )
    one = spark.createDataFrame([Row(k=1)])
    for _ in range(25):
        sink.append(one)
    counts = {"listdir": 0, "exists": 0}
    real_listdir, real_exists = os.listdir, os.path.exists

    def counting_listdir(p):
        counts["listdir"] += 1
        return real_listdir(p)

    def counting_exists(p):
        counts["exists"] += 1
        return real_exists(p)

    monkeypatch.setattr(os, "listdir", counting_listdir)
    monkeypatch.setattr(os.path, "exists", counting_exists)
    assert sink.versions() == list(range(1, 26))
    assert counts["listdir"] == 0, "versions() listed the full commit log"
    assert counts["exists"] <= 25 % 10 + 1, "tail probe exceeded the checkpoint gap"


def test_checkpoint_coexists_with_vacuum_retirement(spark, tmp_path):
    """vacuum(keep_last) shrinks the checkpoint to the survivors BEFORE
    deleting anything, so time travel through the checkpointed log
    stays exact: retained versions read, retired versions raise, and
    new commits keep extending the log."""
    sink = TransactionalParquetSink(
        spark, str(tmp_path / "t"), checkpoint_interval=5
    )
    for i in range(12):
        sink.append(spark.createDataFrame([Row(k=i)]))
    sink.vacuum(keep_last=3, grace_seconds=0.0)
    assert sink.versions() == [10, 11, 12]
    assert len(sink.read(version=10).collect()) == 10
    with pytest.raises(ValueError, match="not committed"):
        sink.read(version=5)
    v = sink.append(spark.createDataFrame([Row(k=99)]))
    assert v == 13 and sink.versions() == [10, 11, 12, 13]
    assert len(sink.read().collect()) == 13
