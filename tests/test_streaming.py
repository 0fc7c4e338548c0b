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
