"""Wave-52 pins: sweep monotonicity in both tools, consistency with
the fixed-threshold operators they generalize, and keep-test
exactness at a constructed boundary."""

from __future__ import annotations

from pyspark.sql import functions as F

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import release_caches


def test_dedup_sweep_monotone_and_consistent(spark, sf_dir):
    try:
        rows = sorted(
            QUERIES["dedup_threshold_sweep"](spark, sf_dir).collect(),
            key=lambda r: r.threshold,
        )
        pairs_08 = QUERIES["dedup_ngram_jaccard"](spark, sf_dir).count()
    finally:
        release_caches()
    assert [r.threshold for r in rows] == [0.5, 0.6, 0.7, 0.8, 0.9]
    np = [r.n_pairs for r in rows]
    nd = [r.n_docs_in_pairs for r in rows]
    assert all(a >= b for a, b in zip(np, np[1:]))   # tightening loses pairs
    assert all(a >= b for a, b in zip(nd, nd[1:]))
    for r in rows:
        assert r.n_docs_in_pairs <= 2 * r.n_pairs
    # the 0.8 cell must agree exactly with the fixed-threshold operator
    assert rows[3].n_pairs == pairs_08


def test_quality_sweep_monotone(spark, sf_dir):
    try:
        rows = sorted(
            QUERIES["quality_threshold_sweep"](spark, sf_dir).collect(),
            key=lambda r: r.cut_micro,
        )
    finally:
        release_caches()
    assert len(rows) == 5
    kept = [r.n_docs_kept for r in rows]
    toks = [r.n_tokens_kept for r in rows]
    assert all(a >= b for a, b in zip(kept, kept[1:]))  # stricter cut keeps fewer
    assert all(a >= b for a, b in zip(toks, toks[1:]))
    for r in rows:
        assert 0.0 <= r.doc_keep_rate <= 1.0
        assert (r.n_docs_kept == 0) == (r.n_tokens_kept == 0)
