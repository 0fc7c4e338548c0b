"""The engine must be correct under ANY caller's SparkSession.

The round-1 driver harness built its own session without our builder
confs and every events-table query died on the nanosecond-parquet read
(PARQUET_TYPE_ILLEGAL). load_table now pins the runtime-settable confs
itself; these tests simulate a conf-less caller by unsetting them on
the shared session before calling into the engine.
"""

from __future__ import annotations

import pytest

from easy_etl_spark.session import load_table

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


@pytest.fixture()
def confless(spark):
    """Strip the confs get_spark() set, restoring them after."""
    saved = {
        NANOS_CONF: spark.conf.get(NANOS_CONF, None),
        "spark.sql.session.timeZone": spark.conf.get("spark.sql.session.timeZone"),
    }
    spark.conf.unset(NANOS_CONF)
    yield spark
    for k, v in saved.items():
        if v is not None:
            spark.conf.set(k, v)


def test_load_table_self_sufficient(confless, sf_dir):
    # would raise PARQUET_TYPE_ILLEGAL before load_table pinned the conf
    events = load_table(confless, sf_dir, "events")
    assert events.count() > 0
    assert dict(events.dtypes)["ts"] == "timestamp"


def test_events_query_self_sufficient(confless, sf_dir):
    import __spark_entry__ as entry

    confless.conf.unset(NANOS_CONF)
    df = entry.queries()["events_tumbling"](confless, sf_dir)
    assert df.count() > 0


def test_streaming_reader_self_sufficient(confless, sf_dir):
    from easy_etl_spark.streaming.jobs import read_events_stream
    from easy_etl_spark.session import table_path

    confless.conf.unset(NANOS_CONF)
    stream = read_events_stream(confless, table_path(sf_dir, "events"))
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"


def test_wave6_queries_self_sufficient(confless, sf_dir):
    """Round-2 operator families run under a conf-stripped session —
    the exact failure mode of the round-1 driver harness (its own
    session, none of get_spark()'s confs)."""
    from easy_etl_spark.queries import QUERIES

    for name in (
        "events_trailing_hour",
        "scd2_history",
        "lexical_search_topk",
        "session_duration_stats",
        "dedup_simhash_md5",
        "weighted_doc_sample",
    ):
        assert QUERIES[name](confless, sf_dir).count() > 0, name


def test_wave7_queries_self_sufficient(confless, sf_dir):
    """Round-3 families under a conf-stripped session: new TPC-H
    shapes, calendar dimension, Z-order keys, ANN int twins, real
    multimodal decode, containment dedup, language-ID."""
    from easy_etl_spark.queries import QUERIES

    for name in (
        "q2_min_cost_supplier",
        "q12_latency_buckets",
        "date_dimension",
        "orders_by_calendar",
        "zorder_key_lineitem",
        "knn_lsh_int",
        "knn_ivf_int",
        "multimodal_decode",
        "dedup_containment",
        "language_id",
    ):
        assert QUERIES[name](confless, sf_dir).count() > 0, name


def test_wave8_to_12_queries_self_sufficient(confless, sf_dir):
    """Waves 8-12 under a conf-stripped session: one representative
    per new family (events-table entries exercise the ns-timestamp
    path; the rest guard against any builder-conf dependence)."""
    from easy_etl_spark.queries import QUERIES

    for name in (
        "event_transitions",
        "golden_record_users",
        "dedup_incremental",
        "ols_trend_by_type",
        "chi2_type_value",
        "label_centroids",
        "nearest_centroid_confusion",
        "events_interpolate",
        "triangle_count",
        "dau_wau_stickiness",
        "pareto_revenue_deciles",
        "cusum_changepoints",
        "skyline_parts",
        "bfs_hop_histogram",
        "join_key_skew_profile",
        "attribution_touch",
        "keyword_tfidf_top3",
        "robust_outliers_mad",
        "train_val_test_split",
        "source_overlap_matrix",
        "destutter_tokens",
        "growth_wow",
    ):
        assert QUERIES[name](confless, sf_dir).count() > 0, name


def test_wave13_to_30_queries_self_sufficient(confless, sf_dir):
    """Waves 13-30 under a conf-stripped session — one representative
    per family added since the mid-round batch."""
    from easy_etl_spark.queries import QUERIES

    for name in (
        "audio_rms_windows",
        "classifier_eval",
        "ndcg_retrieval_eval",
        "embedding_drift",
        "hard_negative_mining",
        "mlm_masking",
        "mmr_rerank_topk",
        "winsorize_values",
        "cap_events_per_user_day",
        "embedding_covariance",
        "recursive_org_rollup",
        "rag_context_assembly",
        "learning_curve_subsets",
        "vocab_coverage_curve",
        "corpus_build_report",
        "item_recommendations",
        "conversion_latency",
        "epoch_shuffle_plan",
        "orphan_routing",
        "weekly_auc_trend",
        "source_length_gini",
        "dedup_pair_explain",
        "video_frame_sample",
        "events_session_dynamic_gap",
        "priority_sample",
    ):
        assert QUERIES[name](confless, sf_dir).count() > 0, name


def test_wave31_to_34_queries_self_sufficient(confless, sf_dir):
    """Waves 31-34 (round-3 close + round-4) under a conf-stripped
    session — codecs, sinks, CDC, IVM, curriculum, splits."""
    from easy_etl_spark.queries import QUERIES

    for name in (
        "peak_concurrency",
        "ann_recall_at_10",
        "file_health_report",
        "multimodal_decode_png",
        "multimodal_decode_jpeg",
        "audio_wav_windows",
        "events_session_flush",
        "leakage_safe_splits",
        "curriculum_order",
        "cdc_apply_changes",
        "incremental_join_maintenance",
        "txn_sink_merge",
    ):
        assert QUERIES[name](confless, sf_dir).count() > 0, name
