"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query on /root/testdata/sf0.001 (smoke).
queries()     -> every implemented operator as (spark, sf_dir) -> DataFrame.
oracle_sql()  -> DuckDB-equivalent ANSI SQL per query (correctness gate).

Ordering: queries() yields one representative of EVERY operator family
first (reference ops O1-O17, SQL surface, streaming, dedup, similarity,
text/LLM, multimodal), then the remaining variants (additional TPC-H
shapes, sketches, extra window flavors). A harness that samples a
prefix of the registry still measures full family coverage; nothing is
redundant-first.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

#: Family representatives, surfaced first (see module docstring).
#: Round 8 rotation (VERDICT r7 item 3): the first 50 entries now
#: include eleven wave 41-56 family representatives so the driver's
#: 50-entry CORRECTNESS prefix covers the newest code; the displaced
#: intra-family variants (still oracle-checked by the full-registry
#: sweep, BASELINE.md) moved to positions 51+.
_PRIORITY = [
    # reference operators O1-O17 + source formats
    "pipeline_end_to_end",
    "incremental_watermark",
    "python_source",
    "cast_types",
    "middleware_pandas",
    "transform_strings",
    "default_falsy",
    "udf_pandas_scalar",
    "link_customer_nation",
    "link_closest_shipdate",
    "ignore_drop",
    "merge_upsert",
    "load_drop_sync",
    "load_metrics",
    "pipeline_reset_reuse",
    "source_formats_roundtrip",
    # delegated SQL surface
    "q1_pricing_summary",
    "q3_top_orders",
    "topk_per_group",
    "grouping_sets_rollup",
    "set_ops_except",
    "scalar_functions",
    # streaming / event-time (batch twins)
    "events_tumbling",
    "events_session",
    "events_interval_join",
    "events_dedup",
    # dedup
    "dedup_exact",
    "dedup_substring_spans",
    "cdc_chunk_dedup",
    "dedup_minhash_lsh",
    "dedup_simhash_md5",  # oracle-checked simhash rep; xxhash64 variant in tail
    "dedup_embedding_cosine",
    "curate_corpus",
    "leakage_safe_splits",
    # multimodal (real-decode reps — round-4 codecs inside the
    # driver's checked prefix window; byte-plumbing variant in tail)
    "multimodal_decode_png",
    "multimodal_decode_jpeg",
    "audio_flac_windows",
    "image_dhash_pairs",
    "gram_novelty",
    # waves 46-56 representatives (round-8 rotation)
    "window_funnel_strict",
    "ohlc_hourly",
    "wasserstein_source_pairs",
    "spearman_rho",
    "logrank_test",
    "dedup_threshold_sweep",
    "quality_threshold_sweep",
    "image_blur_laplacian",
    "audio_zero_crossing",
    "frequent_part_triples",
    "referential_integrity_audit",
    # --- end of the 50-entry driver prefix ---
    # displaced intra-family variants (rotation, round 8)
    "q5_region_volume",
    "running_total",
    "semi_anti_join",
    "events_session_flush",
    "events_json_props",
    "events_rollup_reuse",
    "dedup_clusters",
    "curriculum_order",
    "dsir_importance_select",
    "multimodal_decode",
    "audio_wav_windows",
    "doc_chunks_overlap",
    "skew_salted_join_hot",
    # similarity / search (oracle-checked int twins first; the
    # double/xxhash64 production variants are rows-only and follow in
    # the tail)
    "knn_brute_force",
    "knn_lsh_int",
    "knn_lsh_multi",
    "knn_ivf_int",
    "knn_pq_int",
    "k_center_coreset",
    "knn_filtered",
    "lexical_search_topk",
    # text / LLM-pipeline
    "text_profile",
    "tfidf_keywords",
    "pii_redaction",
    "decontaminate_overlap",
    "sequence_packing",
    "vocab_encode",
    "quality_rules",
    "source_token_budget",
    "multimodal_features",
    # time-series regularization, entity resolution, CDC, exact stats
    "events_resample_fill",
    "fuzzy_name_pairs",
    "snapshot_diff_orders",
    "cdc_apply_changes",
    "corr_stats",
    "hll_distinct_md5",
    "mutual_information_lang_source",
    # behavioral analytics, incremental view maintenance
    "events_funnel",
    "cohort_retention",
    "incremental_agg_maintenance",
    "incremental_join_maintenance",
    "embedding_quantize_error",
    "hybrid_search_rrf",
    "data_quality_checks",
    "session_duration_stats",
    "events_trailing_hour",
    "ewma_revenue_trend",
    "woe_information_value",
    "sink_time_travel",
    "sink_compaction",
    "txn_sink_merge",
    # graph & pattern mining
    "pagerank_top20",
    "kcore_hindex",
    "frequent_part_pairs",
    "association_rules",
    "weighted_doc_sample",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from easy_etl_spark.queries import QUERIES

    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def _ordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _PRIORITY if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from easy_etl_spark.queries import QUERIES

    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    from easy_etl_spark.queries import ORACLES

    return _ordered(dict(ORACLES))
