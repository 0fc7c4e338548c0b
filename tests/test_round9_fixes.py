"""Regression tests for the round-9 fixes:

1. embedding_dup_pairs has a pair-count blast-radius guard (VERDICT r8
   item 6): the exact O(n^2) verifier refuses, at plan-build time, any
   corpus whose estimated pair count exceeds a configurable budget —
   it can no longer be pointed at a full corpus by accident. The
   refusal names the bucketed scale paths; the default budget passes
   every test rung unchanged.
2. _SURROGATE_CACHE keys include the SparkContext applicationId
   (ADVICE r8): a stop()/recreate session cycle misses the old entry
   automatically instead of serving a localCheckpoint frame that
   references a dead context.
"""

from __future__ import annotations

import pytest

from easy_etl_spark.operators.dedup import embedding_dup_pairs
from easy_etl_spark.session import load_table


def test_exact_cosine_guard_fires_on_tiny_budget(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="exact-verifier budget"):
        embedding_dup_pairs(emb, max_pairs=10)


def test_exact_cosine_guard_names_scale_paths(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="semantic_dedup"):
        embedding_dup_pairs(emb, max_pairs=10)


def test_exact_cosine_guard_is_plan_build_time(spark, sf_dir):
    # the refusal must cost nothing: it happens before any Spark job,
    # so it raises even when the pipeline would be expensive to run
    emb = load_table(spark, sf_dir, "embeddings")
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    with pytest.raises(ValueError):
        embedding_dup_pairs(emb, max_pairs=1)
    after = tracker.getJobIdsForGroup(None)
    assert before == after


def test_exact_cosine_default_budget_passes_test_rungs(spark, sf_dir):
    # default budget (1e11 pairs) leaves the oracle entry unchanged:
    # the sf rungs all build and return the same pairs as before
    emb = load_table(spark, sf_dir, "embeddings")
    df = embedding_dup_pairs(emb, threshold=0.45)
    assert df.columns == ["id_a", "id_b", "cosine"]
    assert df.count() >= 0


def test_exact_cosine_guard_estimates_from_rows_when_stats_unusable(spark):
    # in-memory lineage has no file stats -> the guard falls back to an
    # exact 1-column count, which must still fire the budget
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(100)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="exact-verifier budget"):
        embedding_dup_pairs(emb, max_pairs=100)
    # 100 vectors = 4950 pairs: a budget just above passes
    assert embedding_dup_pairs(emb, max_pairs=5000).count() >= 0


def test_surrogate_cache_scoped_by_application_id(spark, sf_dir):
    from easy_etl_spark.operators.links import (
        _SURROGATE_CACHE,
        clear_surrogate_cache,
        with_surrogate_id,
    )

    clear_surrogate_cache()
    dim = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    with_surrogate_id(dim, "n_name")
    keys = list(_SURROGATE_CACHE)
    assert len(keys) == 1
    assert spark.sparkContext.applicationId in keys[0]
    clear_surrogate_cache()
