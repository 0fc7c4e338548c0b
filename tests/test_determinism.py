"""Aggregates must be bit-deterministic across partitioning.

Float sums accumulate in partition order; the driver's value-hash
compare (and any rerun of it) is only stable if the aggregation is
exact. These tests run the same catalog query under two very different
partitionings (scan split size + shuffle partition count) and require
identical collected values — the regression gate for the
functions/exact.py quantization scheme (round-1 `text_stats_by_lang`
flaked exactly here).
"""

from __future__ import annotations

import pytest

from easy_etl_spark.queries import QUERIES

# queries whose outputs are float aggregates over enough rows that
# IEEE order-noise would show up without exact aggregation
CASES = [
    "q1_pricing_summary",
    "q6_revenue_delta",
    "q9_profit_by_nation",
    "text_stats_by_lang",
    "events_tumbling",
    "events_rollup_reuse",
    "running_total",
    # wave-6 float aggregates
    "scd2_history",
    "skew_salted_join",
    "events_resample_fill",
    "events_dedup",
    "corr_stats",
    # waves 8-12: interpolation / regression / robust stats / growth —
    # all integer-unit exact inside, doubles only at the surface
    "events_interpolate",
    "ols_trend_by_type",
    "golden_record_users",
    "robust_outliers_mad",
    "growth_wow",
    "pareto_revenue_deciles",
    # waves 13-24 float surfaces
    "chi2_type_value",
    "winsorize_values",
    "classifier_eval",
    "ndcg_retrieval_eval",
    "embedding_covariance",
    "conversion_latency",
    "item_recommendations",
    # waves 25-29
    "source_length_gini",
    "weekly_auc_trend",
    "events_session_dynamic_gap",
    "epoch_shuffle_plan",
]


def _run(spark, name, sf_dir):
    rows = QUERIES[name](spark, sf_dir).collect()
    return sorted(tuple(repr(v) for v in row) for row in rows)


@pytest.fixture()
def repartitioned(spark):
    saved = {
        "spark.sql.shuffle.partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "spark.sql.files.maxPartitionBytes": spark.conf.get("spark.sql.files.maxPartitionBytes"),
    }
    yield spark
    for k, v in saved.items():
        spark.conf.set(k, v)


@pytest.mark.parametrize("name", CASES)
def test_agg_stable_across_partitioning(repartitioned, sf_dir, name):
    spark = repartitioned
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))  # many tiny splits
    a = _run(spark, name, sf_dir)
    spark.conf.set("spark.sql.shuffle.partitions", "29")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    b = _run(spark, name, sf_dir)
    assert a == b
