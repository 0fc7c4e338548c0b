"""Structured Streaming jobs: file source → AvailableNow → memory
sink, checked against their batch twins (same windowing math).
"""

from __future__ import annotations

import shutil

import pytest

import pyspark.sql.functions as F

from easy_etl_spark.session import load_table, table_path
from easy_etl_spark.sources.sinks import ParquetSink
from easy_etl_spark.streaming import jobs, windows


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    # file-stream sources want a directory; stage the events parquet
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(table_path(sf_dir, "events"), d / "part-000.parquet")
    return str(d)


def test_streaming_tumbling_matches_batch(spark, sf_dir, events_dir):
    stream = jobs.read_events_stream(spark, events_dir)
    agg = jobs.tumbling_counts_stream(stream, minutes=60)
    jobs.run_to_memory(agg, "t_tumbling")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("t_tumbling").collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windows.tumbling(load_table(spark, sf_dir, "events"), minutes=60).collect()
    }
    assert got == batch and got


def test_streaming_session_windows_run(spark, events_dir):
    stream = jobs.read_events_stream(spark, events_dir)
    agg = jobs.session_window_stream(stream, gap_minutes=30)
    jobs.run_to_memory(agg, "t_sessions")
    rows = spark.table("t_sessions").collect()
    assert rows and all(r["n_events"] >= 1 for r in rows)


def test_streaming_dedup(spark, events_dir):
    stream = jobs.read_events_stream(spark, events_dir)
    jobs.run_to_memory(jobs.dedup_stream(stream), "t_dedup")
    n = spark.table("t_dedup").count()
    assert n == spark.read.parquet(events_dir).count()  # event_ids unique already


def test_foreach_batch_upsert(spark, events_dir, tmp_path):
    sink = ParquetSink(spark, str(tmp_path / "agg"))
    stream = jobs.read_events_stream(spark, events_dir)
    agg = jobs.tumbling_counts_stream(stream, minutes=60)
    writer = jobs.foreach_batch_upsert(
        agg.select("window_start", "event_type", "n_events", "sum_value"),
        sink,
        keys=["window_start", "event_type"],
        checkpoint=str(tmp_path / "ckpt"),
    )
    q = writer.outputMode("update").start()
    q.awaitTermination()
    out = sink.read()
    assert out is not None and out.count() > 0
    # keys unique after merge
    assert out.groupBy("window_start", "event_type").count().filter(F.col("count") > 1).count() == 0


def test_streaming_interval_join_matches_batch(spark, sf_dir, events_dir):
    stream = jobs.read_events_stream(spark, events_dir)
    joined = jobs.interval_join_stream(stream, stream, "click", "purchase", 30)
    jobs.run_to_memory(joined, "t_interval_join")
    got = {
        (r["user_id"], r["left_id"], r["right_id"], r["gap_us"])
        for r in spark.table("t_interval_join").collect()
    }
    batch = {
        (r["user_id"], r["left_id"], r["right_id"], r["gap_us"])
        for r in windows.interval_pairs(
            load_table(spark, sf_dir, "events"), "click", "purchase", 30
        ).collect()
    }
    assert got == batch and got


def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data contract: an event arriving in a later micro-batch,
    with its window closed before the checkpointed watermark, is
    dropped from the aggregation; a late-but-open event still updates.
    Two availableNow runs over one checkpoint make batch order (and
    the watermark carried between runs) deterministic."""
    import datetime as dt

    d = tmp_path / "late_events"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def write_file(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / name)
        )
        import glob as g
        import shutil as sh

        src = g.glob(str(tmp_path / name / "part-*.parquet"))[0]
        sh.copy(src, d / f"{name}.parquet")

    def run_once(qname):
        stream = spark.readStream.schema(schema).format("parquet").load(str(d))
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "60 minutes"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("w"), "n")
        )
        emitted = {}

        def sink(bdf, bid):
            for r in bdf.collect():
                emitted[r["w"]] = r["n"]

        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return emitted

    # run 1: events at 12:00 and 16:00 -> watermark checkpointed at 15:00
    write_file("b1", [(1, base, 7, "click", 1.0, "{}"),
                      (2, base + dt.timedelta(hours=4), 7, "click", 1.0, "{}")])
    first = run_once("t_late1")
    assert first == {"2024-01-01 12:00:00": 1, "2024-01-01 16:00:00": 1}

    # run 2 (same checkpoint): 12:30 is behind the 15:00 watermark ->
    # dropped (its window emits no update); 15:30 is open -> counted
    write_file("b2", [(3, base + dt.timedelta(minutes=30), 7, "click", 1.0, "{}"),
                      (4, base + dt.timedelta(minutes=210), 7, "click", 1.0, "{}")])
    second = run_once("t_late2")
    assert "2024-01-01 12:00:00" not in second   # late event dropped
    assert second.get("2024-01-01 15:00:00") == 1


def test_session_window_drops_late_and_finalizes_on_watermark(spark, tmp_path):
    """Late-data contract for SESSION windows, end-to-end in append
    mode: a late row behind the checkpointed watermark must NOT extend
    (or resurrect) an already-finalized session; a row ahead of the
    watermark opens a new session; sessions emit exactly once, when the
    watermark passes their close. Two availableNow runs over one
    checkpoint pin batch order and the carried watermark."""
    import datetime as dt
    import glob as g
    import shutil as sh

    d = tmp_path / "late_sess"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt_sess")
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def write_file(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / name)
        )
        src = g.glob(str(tmp_path / name / "part-*.parquet"))[0]
        sh.copy(src, d / f"{name}.parquet")

    def run_once():
        stream = spark.readStream.schema(schema).format("parquet").load(str(d))
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias("s"),
                "n",
            )
        )
        emitted = {}

        def sink(bdf, bid):
            for r in bdf.collect():
                emitted[r["s"]] = emitted.get(r["s"], 0) + r["n"]

        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return emitted

    # run 1: 12:00 + 12:10 merge into one session; 16:00 opens another
    # and checkpoints the watermark at 15:00. The 12:00 session (closed
    # 12:40 < 15:00) finalizes and emits exactly once, n=2.
    write_file("b1", [(1, base, 7, "click", 1.0, "{}"),
                      (2, base + dt.timedelta(minutes=10), 7, "click", 1.0, "{}"),
                      (3, base + dt.timedelta(hours=4), 7, "click", 1.0, "{}")])
    assert run_once() == {"2024-01-01 12:00:00": 2}

    # run 2 (same checkpoint): 12:20 is behind the 15:00 watermark ->
    # dropped (must not resurrect the finalized 12:00 session); 15:10
    # is ahead -> opens a session; 19:00 pushes the watermark to 18:00,
    # finalizing both the 15:10 and the 16:00 sessions.
    write_file("b2", [(4, base + dt.timedelta(minutes=20), 7, "click", 1.0, "{}"),
                      (5, base + dt.timedelta(minutes=190), 7, "click", 1.0, "{}"),
                      (6, base + dt.timedelta(hours=7), 7, "click", 1.0, "{}")])
    second = run_once()
    assert "2024-01-01 12:00:00" not in second  # late row dropped, no resurrect
    assert second.get("2024-01-01 15:10:00") == 1
    assert second.get("2024-01-01 16:00:00") == 1


def test_session_timeout_stream_drops_late_rows(spark, tmp_path):
    """Late-data contract for the custom stateful sessionizer
    (applyInPandasWithState + EventTimeTimeout): input rows behind the
    watermark are filtered before the function runs, so a late row
    neither extends a flushed session nor emits a spurious one."""
    import datetime as dt
    import glob as g
    import shutil as sh

    from easy_etl_spark.streaming.stateful import session_timeout_stream

    d = tmp_path / "late_state"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt_state")
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def write_file(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / name)
        )
        src = g.glob(str(tmp_path / name / "part-*.parquet"))[0]
        sh.copy(src, d / f"{name}.parquet")

    def run_once():
        stream = spark.readStream.schema(schema).format("parquet").load(str(d))
        out = session_timeout_stream(stream, gap_s=1800, watermark="1 hour")
        emitted = []

        def sink(bdf, bid):
            emitted.extend(
                (r["user_id"], r["session_start_sec"], r["n_events"])
                for r in bdf.collect()
            )

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return emitted

    sec = lambda t: int(t.timestamp())  # noqa: E731
    # run 1: one session (12:00, 12:10), then 16:00 -> watermark 15:00;
    # the timer fires in the extra no-data batch and flushes n=2
    write_file("b1", [(1, base, 7, "click", 1.0, "{}"),
                      (2, base + dt.timedelta(minutes=10), 7, "click", 1.0, "{}"),
                      (3, base + dt.timedelta(hours=4), 7, "click", 1.0, "{}")])
    first = run_once()
    assert (7, sec(base), 2) in first
    # run 2: 12:20 is behind the 15:00 watermark -> filtered out before
    # the stateful function ever sees it: no spurious session, no
    # resurrection; 19:00 advances the watermark and flushes 16:00 (n=1)
    write_file("b2", [(4, base + dt.timedelta(minutes=20), 7, "click", 1.0, "{}"),
                      (5, base + dt.timedelta(hours=7), 7, "click", 1.0, "{}")])
    second = run_once()
    starts = {s for (_, s, _) in second}
    assert sec(base) not in starts and sec(base + dt.timedelta(minutes=20)) not in starts
    assert (7, sec(base + dt.timedelta(hours=4)), 1) in second


def test_streaming_curation_maps_match_batch(spark, sf_dir, tmp_path_factory):
    # the wave-4 curation ops are stateless per-row maps, so they run
    # UNCHANGED on a stream: same Column expressions, same results —
    # the 100 TB batch pipeline is also the live-ingest pipeline
    from easy_etl_spark.operators.sampling import stratified_sample
    from easy_etl_spark.operators.textops import redact_pii

    d = tmp_path_factory.mktemp("docs_stream")
    shutil.copy(table_path(sf_dir, "documents"), d / "part-000.parquet")
    batch_docs = load_table(spark, sf_dir, "documents")
    stream = (
        spark.readStream.schema(batch_docs.schema).format("parquet").load(str(d))
    )

    def curate(df):
        kept = stratified_sample(df, {}, default_rate=30)
        return kept.select("doc_id", redact_pii(F.col("text")).alias("red"))

    q = (
        curate(stream)
        .writeStream.format("memory")
        .queryName("t_curated")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.doc_id, r.red) for r in spark.table("t_curated").collect()}
    want = {(r.doc_id, r.red) for r in curate(batch_docs).collect()}
    assert got == want and got


def test_stream_static_enrichment_matches_batch(spark, sf_dir, events_dir):
    """enrich_stream: each micro-batch joins the static user-profile
    dimension; the streamed enriched rows must equal the batch join."""
    e = load_table(spark, sf_dir, "events")
    dim = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_ev"))

    stream = jobs.read_events_stream(spark, events_dir)
    enriched = jobs.enrich_stream(stream, dim).select("event_id", "user_id", "n_ev")
    jobs.run_to_memory(enriched, "t_enriched")
    got = {tuple(r) for r in spark.table("t_enriched").collect()}
    batch = {
        tuple(r)
        for r in e.join(dim, "user_id").select("event_id", "user_id", "n_ev").collect()
    }
    assert got == batch and got


def test_dynamic_gap_session_window_stream_matches_batch_twin(spark, sf_dir, tmp_path):
    """Structured Streaming's session_window(ts, CASE...) with dynamic
    per-event gaps must produce the same per-user session event counts
    as the batch lag-based twin (events_session_dynamic_gap) — the
    merge-overlapping-intervals semantics are equivalent for a user's
    time-ordered stream."""
    import shutil
    from collections import Counter

    from easy_etl_spark.queries import QUERIES
    from easy_etl_spark.session import table_path
    from easy_etl_spark.streaming import jobs

    d = tmp_path / "ev"
    d.mkdir()
    shutil.copy(table_path(sf_dir, "events"), d / "p.parquet")
    stream = jobs.read_events_stream(spark, str(d))
    gap = F.expr(
        "CASE event_type WHEN 'click' THEN '600 seconds' "
        "WHEN 'view' THEN '600 seconds' WHEN 'error' THEN '300 seconds' "
        "WHEN 'signup' THEN '1800 seconds' ELSE '3600 seconds' END"
    )
    agg = (
        stream.withWatermark("ts", "10 days")
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_dyn_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_counts = Counter(
        (r["user_id"], r["n_events"]) for r in spark.table("t_dyn_sessions").collect()
    )
    batch_counts = Counter(
        (r.user_id, r.n_events)
        for r in QUERIES["events_session_dynamic_gap"](spark, sf_dir).collect()
    )
    assert stream_counts == batch_counts and stream_counts


def test_streaming_apply_changes_matches_batch(spark, tmp_path):
    """Streaming CDC consumption == one-shot batch application: a
    seq-ordered changelog split across micro-batches lands the same
    final table state as apply_changes over the whole log."""
    from pyspark.sql import Row

    from easy_etl_spark.operators.scd import apply_changes
    from easy_etl_spark.streaming.jobs import foreach_batch_apply_changes

    schema = "k long, v string, op string, seq long"
    log1 = [Row(k=1, v="a1", op="U", seq=1), Row(k=2, v="b", op="I", seq=1),
            Row(k=3, v="c", op="I", seq=1)]
    log2 = [Row(k=1, v="a2", op="U", seq=2), Row(k=3, v="c", op="D", seq=2),
            Row(k=4, v="d", op="I", seq=2)]
    d = tmp_path / "cdc"
    d.mkdir()
    spark.createDataFrame(log1, schema).coalesce(1).write.parquet(str(d / "a.parquet"))
    spark.createDataFrame(log2, schema).coalesce(1).write.parquet(str(d / "b.parquet"))

    sink = ParquetSink(spark, str(tmp_path / "t"), id_col="k")
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(schema)
        .parquet(str(d) + "/*.parquet")
    )
    q = foreach_batch_apply_changes(
        stream, sink, keys=["k"], seq_col="seq", checkpoint=str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination()
    got = sorted((r.k, r.v) for r in sink.read().collect())

    base = spark.createDataFrame([], "k long, v string")
    full = spark.createDataFrame(log1 + log2, schema)
    want = sorted(
        (r.k, r.v) for r in apply_changes(base, full, keys=["k"], seq_col="seq").collect()
    )
    assert got == want == [(1, "a2"), (2, "b"), (4, "d")]
    # replaying the last batch (crash-before-checkpoint) is idempotent
    sink._swap_write(
        apply_changes(sink.read(), spark.createDataFrame(log2, schema), keys=["k"], seq_col="seq")
    )
    assert sorted((r.k, r.v) for r in sink.read().collect()) == want


def test_streaming_interval_join_left_outer_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream LEFT OUTER interval join: matched rows stream out
    like the inner join; unmatched clicks emit their NULL row once the
    watermark passes their join window. A far-future sentinel click
    pushes the final watermark past every real click's window (the
    no-data batch flushes the held nulls), so the drained stream must
    equal the batch LEFT JOIN exactly — null rows included."""
    import datetime

    from easy_etl_spark.queries import QUERIES
    from easy_etl_spark.session import load_table

    events = load_table(spark, sf_dir, "events")
    d = tmp_path / "ev"
    d.mkdir()
    events.filter(F.col("ts") < F.lit("2024-01-15")).coalesce(1).write.parquet(
        str(d / "a.parquet")
    )
    events.filter(F.col("ts") >= F.lit("2024-01-15")).coalesce(1).write.parquet(
        str(d / "b.parquet")
    )
    max_ts = events.agg(F.max("ts")).first()[0]
    sentinel = spark.createDataFrame(
        [(-1, max_ts + datetime.timedelta(days=30), -1, "click", 0.0, "{}")],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).select(*events.columns)
    sentinel.coalesce(1).write.parquet(str(d / "c.parquet"))
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(events.schema)
        .parquet(str(d) + "/*.parquet")
    )
    joined = jobs.interval_join_stream(
        stream, stream, "click", "purchase", 30, how="left_outer"
    )
    jobs.run_to_memory(joined, "t_interval_join_left")
    got = {
        (r["user_id"], r["left_id"], r["right_id"], r["gap_us"])
        for r in spark.table("t_interval_join_left")
        .filter(F.col("left_id") >= 0)  # sentinel's own window stays open
        .collect()
    }
    batch = {
        (r["user_id"], r["left_id"], r["right_id"], r["gap_us"])
        for r in QUERIES["events_interval_join_left"](spark, sf_dir).collect()
    }
    assert got == batch and got
    assert any(r[2] is None for r in got), "no null rows flushed"


def test_streaming_image_dedup_ingest_lands_only_novel(spark, sf_dir, tmp_path):
    """Continuous image ingestion: after streaming near-dup PNGs in two
    micro-batches through foreach_batch_image_dedup_ingest, the landed
    table is pairwise perceptually-distinct (no dHash pair within the
    threshold) and every landed row carries its fingerprint."""
    from easy_etl_spark.operators.multimodal import (
        dhash_near_dup_pairs,
        synth_neardup_png_images,
    )
    from easy_etl_spark.session import load_table
    from easy_etl_spark.sources.sinks import ParquetSink

    docs = load_table(spark, sf_dir, "documents")
    media = synth_neardup_png_images(docs, max_docs=40)
    d = tmp_path / "imgs"
    d.mkdir()
    media.filter(F.col("doc_id") < 20).coalesce(1).write.parquet(str(d / "a.parquet"))
    media.filter(F.col("doc_id") >= 20).coalesce(1).write.parquet(str(d / "b.parquet"))
    sink = ParquetSink(spark, str(tmp_path / "landed"))
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema("doc_id bigint, media binary")
        .parquet(str(d) + "/*.parquet")
    )
    writer = jobs.foreach_batch_image_dedup_ingest(
        stream, sink, checkpoint=str(tmp_path / "ckpt"), max_hamming=4
    )
    writer.start().awaitTermination()
    landed = sink.read()
    assert landed is not None and "dhash" in landed.columns
    n = landed.count()
    assert 0 < n < 40, f"dedup did nothing (landed {n}/40)"
    # landed set is pairwise distinct under the same threshold
    leftover = dhash_near_dup_pairs(
        landed.select("doc_id", "dhash"), max_hamming=4
    ).count()
    assert leftover == 0, f"{leftover} near-dup pairs survived ingestion"
    # replaying the same files through a fresh query converges (no new rows)
    writer2 = jobs.foreach_batch_image_dedup_ingest(
        stream, sink, checkpoint=str(tmp_path / "ckpt2"), max_hamming=4
    )
    writer2.start().awaitTermination()
    assert sink.read().count() == n


def test_streaming_ohlc_matches_batch(spark, sf_dir, events_dir):
    """OHLC candles: the streaming min_by/max_by formulation must pick
    the identical open/close rows as the batch row_number rank — both
    resolve the same TOTAL (ts, event_id) order."""
    from easy_etl_spark.queries import QUERIES

    stream = jobs.read_events_stream(spark, events_dir)
    agg = jobs.ohlc_stream(stream, minutes=60)
    jobs.run_to_memory(agg, "t_ohlc")
    got = {
        (r["hour_start"], r["event_type"]): (
            r["n_events"], r["open_cents"], r["high_cents"],
            r["low_cents"], r["close_cents"],
        )
        for r in spark.table("t_ohlc").collect()
    }
    batch = {
        (r["hour_start"], r["event_type"]): (
            r["n_events"], r["open_cents"], r["high_cents"],
            r["low_cents"], r["close_cents"],
        )
        for r in QUERIES["ohlc_hourly"](spark, sf_dir).collect()
    }
    assert got == batch and got
