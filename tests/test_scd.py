"""SCD Type-2 merge semantics (operators/scd.py) and token-budget
source capping (operators/curation.cap_sources_by_budget)."""

from __future__ import annotations

from pyspark.sql import functions as F

from easy_etl_spark.operators import scd
from easy_etl_spark.operators.curation import cap_sources_by_budget

T1, T2, T3 = "2024-01-01 00:00:00", "2024-02-01 00:00:00", "2024-03-01 00:00:00"


def _dim(spark, rows):
    return spark.createDataFrame(rows, "k bigint, attr string")


def _merge(hist, snap, **kw):
    return scd.scd2_merge(hist, snap, keys=["k"], tracked=["attr"], **kw)


def test_scd2_change_insert_unchanged(spark):
    hist = scd.scd2_init(_dim(spark, [(1, "a"), (2, "b")]), T1)
    snap = _dim(spark, [(1, "a"), (2, "B"), (3, "c")])  # unchanged / changed / new
    out = _merge(hist, snap, ts=T2).orderBy("k", "valid_from").collect()

    rows = [(r.k, r.attr, r.is_current, r.valid_to is not None) for r in out]
    assert rows == [
        (1, "a", True, False),   # unchanged: still open, original valid_from
        (2, "b", False, True),   # changed: closed at T2
        (2, "B", True, False),   # successor opens at T2
        (3, "c", True, False),   # new key
    ]
    closed = [r for r in out if not r.is_current][0]
    assert str(closed.valid_to).startswith("2024-02-01")
    succ = [r for r in out if r.k == 2 and r.is_current][0]
    assert str(succ.valid_from).startswith("2024-02-01")


def test_scd2_delta_vs_full_snapshot_deletes(spark):
    hist = scd.scd2_init(_dim(spark, [(1, "a"), (2, "b")]), T1)
    snap = _dim(spark, [(1, "a")])  # key 2 absent

    delta = _merge(hist, snap, ts=T2)  # delta: absence ≠ deletion
    assert delta.filter(F.col("k") == 2).collect()[0].is_current is True

    full = _merge(hist, snap, ts=T2, full_snapshot=True)
    r2 = full.filter(F.col("k") == 2).collect()
    assert len(r2) == 1 and r2[0].is_current is False
    assert str(r2[0].valid_to).startswith("2024-02-01")


def test_scd2_three_snapshot_chain_and_asof(spark):
    hist = scd.scd2_init(_dim(spark, [(1, "v1")]), T1)
    hist = _merge(hist, _dim(spark, [(1, "v2")]), ts=T2)
    hist = _merge(hist, _dim(spark, [(1, "v3")]), ts=T3)
    vers = hist.orderBy("valid_from").collect()
    assert [r.attr for r in vers] == ["v1", "v2", "v3"]
    # intervals chain with no gaps or overlaps
    assert [str(r.valid_to)[:10] for r in vers[:2]] == ["2024-02-01", "2024-03-01"]
    assert vers[2].valid_to is None

    # as-of inside each interval sees exactly that version
    for ts, want in [("2024-01-15", "v1"), ("2024-02-15", "v2"), ("2024-04-01", "v3")]:
        got = scd.scd2_asof(hist, f"{ts} 00:00:00").collect()
        assert [(r.k, r.attr) for r in got] == [(1, want)]


def test_scd2_null_tracked_values(spark):
    hist = scd.scd2_init(_dim(spark, [(1, None)]), T1)
    # NULL → NULL is NOT a change (null-safe compare)
    same = _merge(hist, _dim(spark, [(1, None)]), ts=T2)
    assert same.count() == 1 and same.collect()[0].is_current is True
    # NULL → value IS a change
    chg = _merge(hist, _dim(spark, [(1, "x")]), ts=T2)
    assert chg.count() == 2


def test_cap_sources_by_budget(spark):
    docs = spark.createDataFrame(
        [
            # source s1: lengths 5, 3, 2 (by construction) → budget 8
            # keeps the 5- and 3-token docs, drops the 2-token one
            (1, "s1", "a b c d e"),
            (2, "s1", "a b c"),
            (3, "s1", "a b"),
            # source s2: single doc over budget → nothing kept
            (4, "s2", " ".join(["w"] * 9)),
        ],
        "doc_id bigint, source string, text string",
    )
    kept = cap_sources_by_budget(docs, budget_tokens=8).orderBy("doc_id").collect()
    assert [(r.doc_id, r.n_tok, r.cum_tok) for r in kept] == [(1, 5, 5), (2, 3, 8)]


def test_cap_ties_break_by_doc_id(spark):
    docs = spark.createDataFrame(
        [(i, "s", "a b c") for i in (5, 1, 9, 3)],
        "doc_id bigint, source string, text string",
    )
    kept = cap_sources_by_budget(docs, budget_tokens=6)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3]


def test_snapshot_diff_statuses(spark):
    from easy_etl_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], "k bigint, attr string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, None), (5, "e")], "k bigint, attr string"
    )
    got = {r.k: r.diff_status for r in snapshot_diff(old, new, keys=["k"]).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",  # NULL == NULL under null-safe compare
        4: "deleted",
        5: "inserted",
    }


def test_streaming_scd2_matches_batch(spark, tmp_path):
    """Dimension snapshots streamed through foreachBatch must build the
    same type-2 history as sequential batch merges."""
    from easy_etl_spark.sources.sinks import ParquetSink
    from easy_etl_spark.streaming import jobs

    # two snapshot files, processed as separate micro-batches
    # (maxFilesPerTrigger=1 preserves file order)
    s1 = _dim(spark, [(1, "a"), (2, "b")])
    s2 = _dim(spark, [(1, "a"), (2, "B"), (3, "c")])
    src = tmp_path / "snaps"
    s1.coalesce(1).write.parquet(str(src / "b0"))
    s2.coalesce(1).write.parquet(str(src / "b1"))

    stream = (
        spark.readStream.schema("k bigint, attr string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    sink = ParquetSink(spark, str(tmp_path / "hist"))
    ts_by_batch = {0: T1, 1: T2}
    q = jobs.foreach_batch_scd2(
        stream, sink, keys=["k"], tracked=["attr"],
        ts_of_batch=lambda b: ts_by_batch[b],
        checkpoint=str(tmp_path / "ckpt"),
    ).start()
    q.awaitTermination()

    got = sorted(
        (r.k, r.attr, r.is_current, str(r.valid_from)[:10]) for r in sink.read().collect()
    )
    expect_hist = _merge(scd.scd2_init(s1, T1), s2, ts=T2)
    want = sorted(
        (r.k, r.attr, r.is_current, str(r.valid_from)[:10]) for r in expect_hist.collect()
    )
    assert got == want and len(got) == 4


def test_apply_changes_semantics_handbuilt(spark):
    """Every CDC path on a hand-built feed: latest-seq wins, same-seq
    D beats U (op DESC tiebreak), delete of an absent key is a no-op,
    insert of a new key lands, untouched base rows survive."""
    from pyspark.sql import Row

    from easy_etl_spark.operators.scd import apply_changes

    base = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c"), Row(k=4, v="d")]
    )
    changes = spark.createDataFrame(
        [
            # k=1: U then later D -> deleted
            Row(k=1, v="a2", op="U", seq=1),
            Row(k=1, v="a2", op="D", seq=2),
            # k=2: out-of-order arrival, latest seq wins -> v="b3"
            Row(k=2, v="b3", op="U", seq=5),
            Row(k=2, v="b2", op="U", seq=4),
            # k=3: same-seq tie, D beats U
            Row(k=3, v="c2", op="U", seq=1),
            Row(k=3, v="c3", op="D", seq=1),
            # k=9: delete of a key not in base -> no-op
            Row(k=9, v="x", op="D", seq=1),
            # k=5: brand-new insert
            Row(k=5, v="e", op="I", seq=1),
        ]
    )
    got = sorted(
        (r.k, r.v)
        for r in apply_changes(base, changes, keys=["k"], seq_col="seq").collect()
    )
    assert got == [(2, "b3"), (4, "d"), (5, "e")]
