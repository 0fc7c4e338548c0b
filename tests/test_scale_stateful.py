from __future__ import annotations

import shutil

import pyspark.sql.functions as F
import pytest

from easy_etl_spark.operators.scale import bucket_write, co_located_join, salted_join
from easy_etl_spark.plans.explain import plan_facts
from easy_etl_spark.session import load_table, table_path


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = (
        li.join(o, "l_orderkey")
        .agg(F.count(F.lit(1)), F.round(F.sum("o_totalprice"), 2))
        .first()
    )
    salted = (
        salted_join(li, o, "l_orderkey", salt=8)
        .agg(F.count(F.lit(1)), F.round(F.sum("o_totalprice"), 2))
        .first()
    )
    assert tuple(plain) == tuple(salted)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    bucket_write(li, "b_lineitem", "l_orderkey", buckets=8)
    bucket_write(o, "b_orders", "l_orderkey", buckets=8)
    joined = co_located_join(spark, "b_lineitem", "b_orders", "l_orderkey")
    # disable broadcast so the test exercises the bucketed SMJ path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        facts = plan_facts(joined)
        assert facts.exchanges == 0, facts.text  # bucketing replaced the shuffle
        assert joined.count() == load_table(spark, sf_dir, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_stateful_user_profile_stream(spark, sf_dir, tmp_path):
    from easy_etl_spark.streaming import jobs
    from easy_etl_spark.streaming.stateful import user_profile_stream

    d = tmp_path / "ev"
    d.mkdir()
    shutil.copy(table_path(sf_dir, "events"), d / "p.parquet")
    stream = jobs.read_events_stream(spark, str(d))
    out = user_profile_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_profiles")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in spark.table("t_profiles").collect()}
    events = load_table(spark, sf_dir, "events")
    want = {
        r["user_id"]: (r["n"], r["s"])
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    }
    assert got == want and got


def test_sketch_distinct_bounded_error(spark, sf_dir):
    """HLL estimates must land within the configured relative error of
    the exact distinct counts (2% rsd ⇒ assert 5% to absorb tail)."""
    import pyspark.sql.functions as F

    from easy_etl_spark.queries import QUERIES
    from easy_etl_spark.session import load_table

    got = {r["event_type"]: r for r in QUERIES["sketch_distinct_users"](spark, sf_dir).collect()}
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact) and got
    for et, n in exact.items():
        assert abs(got[et]["approx_users"] - n) <= max(1, 0.05 * n), (et, got[et]["approx_users"], n)
        assert abs(got[et]["hll_users"] - n) <= max(1, 0.05 * n), (et, got[et]["hll_users"], n)


def test_transform_with_state_matches_batch(spark, sf_dir, tmp_path):
    """transformWithStateInPandas per-user profile == batch groupBy.

    The TWS state protocol needs protobuf at runtime; environments
    without it (like this container) fall back to the
    applyInPandasWithState operator covered above."""
    pytest.importorskip("google.protobuf.descriptor")
    import shutil

    import pyspark.sql.functions as F

    from easy_etl_spark.session import load_table, table_path
    from easy_etl_spark.streaming import jobs
    from easy_etl_spark.streaming.stateful import user_profile_tws

    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(table_path(sf_dir, "events"), d / "part-000.parquet")
    stream = jobs.read_events_stream(spark, str(d))
    out = user_profile_tws(stream)
    jobs.run_to_memory(out, "t_tws_profile")
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in spark.table("t_tws_profile").collect()
    }
    batch = {
        r["user_id"]: (r["n"], r["s"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    }
    assert got == batch and got


def test_sketch_quantiles_theta_bounded_error(spark, sf_dir):
    """KLL quantile estimates within 2% rank error of exact percentiles;
    theta distinct estimates within 5% of exact."""
    import pyspark.sql.functions as F

    from easy_etl_spark.queries import QUERIES
    from easy_etl_spark.session import load_table

    got = {r["l_returnflag"]: r for r in QUERIES["sketch_quantiles_theta"](spark, sf_dir).collect()}
    l = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in l.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.40)").alias("p40"),
            F.expr("percentile(l_extendedprice, 0.60)").alias("p60"),
            F.expr("percentile(l_extendedprice, 0.90)").alias("p90"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
        .collect()
    }
    assert set(got) == set(exact) and got
    for k, e in exact.items():
        # rank-error bound: the p50/p95 estimates must land between
        # generous surrounding exact quantiles
        assert e["p40"] <= got[k]["p50_est"] <= e["p60"], k
        assert e["p90"] <= got[k]["p95_est"] <= e["p99"], k
        assert abs(got[k]["orders_est"] - e["n_orders"]) <= max(1, 0.05 * e["n_orders"]), k


def test_stateful_transitions_match_batch_across_batch_boundary(spark, sf_dir, tmp_path):
    """The streaming transition emitter must reproduce the batch
    transition counts EXACTLY — including pairs straddling micro-batch
    boundaries, which only the carried state can see. The events table
    is split into two time-ordered files replayed one per trigger."""
    from easy_etl_spark.queries import QUERIES
    from easy_etl_spark.streaming.stateful import transition_events_stream

    events = load_table(spark, sf_dir, "events")
    d = tmp_path / "ev"
    d.mkdir()
    # two time-ordered chunks -> the second trigger continues mid-stream
    events.filter(F.col("ts") < F.lit("2024-01-15")).coalesce(1).write.parquet(
        str(d / "a.parquet")
    )
    events.filter(F.col("ts") >= F.lit("2024-01-15")).coalesce(1).write.parquet(
        str(d / "b.parquet")
    )
    stream = spark.readStream.option("maxFilesPerTrigger", 1).schema(
        events.schema
    ).parquet(str(d) + "/*.parquet")
    out = transition_events_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_transitions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in spark.table("t_transitions")
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in QUERIES["event_transitions"](spark, sf_dir).collect()
    }
    assert got == want and got


def test_stateful_idle_keys_evicted_by_event_time_and_query_terminates(spark, tmp_path):
    """Bounded-state contract: a user idle past the event-time horizon
    is evicted (their chain resets on return — n_events restarts at 1,
    not continuing the old count), and the availableNow replay
    TERMINATES — the reason the eviction timer is event-time, not
    processing-time (ProcessingTimeTimeout keeps empty batches running
    forever)."""
    import datetime as dt

    from easy_etl_spark.streaming.stateful import user_profile_stream

    d = tmp_path / "ev"
    d.mkdir()
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def write_file(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(d / name))

    write_file("a.parquet", [(1, base, 7, "click", 1.0, "{}"),
                             (2, base + dt.timedelta(minutes=10), 7, "click", 1.0, "{}")])
    write_file("b.parquet", [(3, base + dt.timedelta(days=40), 8, "click", 1.0, "{}")])
    write_file("c.parquet", [(4, base + dt.timedelta(days=40, minutes=5), 7, "click", 1.0, "{}")])
    stream = spark.readStream.option("maxFilesPerTrigger", 1).schema(schema).parquet(
        str(d) + "/*.parquet"
    )
    out = user_profile_stream(stream, idle_horizon_days=1)
    q = (
        out.writeStream.format("memory")
        .queryName("t_evict")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "availableNow replay did not terminate"
    rows = [(r["n_events"]) for r in spark.table("t_evict").filter("user_id = 7").collect()]
    # first chain reached 2; after eviction the return restarts at 1
    assert 2 in rows and rows[-1] == 1 and 3 not in rows


def test_session_timeout_stream_matches_batch(spark, sf_dir, tmp_path):
    """Timer-driven session emission must reproduce the batch
    gaps-and-islands sessions EXACTLY. The corpus streams in two
    time-ordered chunks; a far-future sentinel batch then pushes the
    event-time watermark past every open session's deadline so the
    EventTimeTimeout timers fire (Spark runs the extra no-data batch
    for exactly this) — the sessions only the timer can close."""
    import datetime

    from easy_etl_spark.queries import QUERIES
    from easy_etl_spark.streaming.stateful import session_timeout_stream

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
        [(-1, max_ts + datetime.timedelta(days=30), -1, "sentinel", 0.0, "{}")],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).select(*events.columns)
    sentinel.coalesce(1).write.parquet(str(d / "c.parquet"))
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(events.schema)
        .parquet(str(d) + "/*.parquet")
    )
    out = session_timeout_stream(stream, gap_s=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("t_sessions_flush")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        map(
            tuple,
            spark.table("t_sessions_flush")
            .filter(F.col("user_id") >= 0)  # sentinel's own session stays open
            .collect(),
        )
    )
    want = sorted(map(tuple, QUERIES["events_session_flush"](spark, sf_dir).collect()))
    assert got == want and got


def test_streaming_dedup_ingest_lands_only_novel_docs(spark, sf_dir, tmp_path):
    """Continuous-ingestion dedup: after streaming the corpus in two
    batches through foreach_batch_dedup_ingest, the landed table is
    pairwise near-dup-free and every isolated (dup-less) doc arrived."""
    from easy_etl_spark.operators.dedup import ngram_jaccard_pairs
    from easy_etl_spark.sources.sinks import ParquetSink
    from easy_etl_spark.streaming.jobs import foreach_batch_dedup_ingest

    docs = load_table(spark, sf_dir, "documents")
    mid = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    d = tmp_path / "docs"
    d.mkdir()
    docs.filter(F.col("doc_id") <= mid).coalesce(1).write.parquet(str(d / "a.parquet"))
    docs.filter(F.col("doc_id") > mid).coalesce(1).write.parquet(str(d / "b.parquet"))
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(docs.schema)
        .parquet(str(d) + "/*.parquet")
    )
    sink = ParquetSink(spark, str(tmp_path / "corpus"))
    q = foreach_batch_dedup_ingest(
        stream, sink, checkpoint=str(tmp_path / "ckpt"), threshold=0.8
    ).start()
    q.awaitTermination()

    landed = sink.read()
    assert landed is not None
    landed_ids = {r.doc_id for r in landed.select("doc_id").collect()}
    # 1) the landed corpus is pairwise near-dup free
    assert ngram_jaccard_pairs(landed, threshold=0.8).count() == 0
    # 2) docs that near-dup nothing all arrived
    pairs = ngram_jaccard_pairs(docs, threshold=0.8).collect()
    paired = {p.id_a for p in pairs} | {p.id_b for p in pairs}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert (all_ids - paired) <= landed_ids
    # 3) dedup actually dropped something (the corpus plants near-dups)
    assert paired and len(landed_ids) < len(all_ids)


def test_foreach_batch_upsert_idempotent_on_replay(spark, sf_dir, tmp_path):
    """Exactly-once-on-replay: foreachBatch redelivers a micro-batch
    after a crash-before-checkpoint; a keyed upsert must converge to
    the identical table state when the same batch applies twice."""
    from easy_etl_spark.sources.sinks import ParquetSink

    sink = ParquetSink(spark, str(tmp_path / "t"))
    batch = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"),
        "event_type",
        F.col("value").alias("v"),
    ).groupBy("uid").agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("s"))
    sink.upsert(batch, keys=["uid"])
    first = sorted(map(tuple, sink.read().select("uid", "n", "s").collect()))
    # redelivery of the SAME batch (simulated replay)
    sink.upsert(batch, keys=["uid"])
    second = sorted(map(tuple, sink.read().select("uid", "n", "s").collect()))
    assert first == second and first
