"""Wave-42 pins: KM estimator invariants (monotone survival, at-risk
accounting), MASE arithmetic identities, duplication-matrix mass
conservation against the pair operator, and boilerplate-share bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from easy_etl_spark.operators import dedup
from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table, release_caches


def test_kaplan_meier_invariants(spark, sf_dir):
    rows = sorted(
        QUERIES["kaplan_meier_retention"](spark, sf_dir).collect(),
        key=lambda r: r.t_week,
    )
    assert rows, "KM table must be non-empty"
    # survival is a product of factors in (0, 1]: non-increasing, in [0, 1]
    surv = [r.survival for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b - 1e-9 for a, b in zip(surv, surv[1:]))
    # at-risk counts strictly decrease over weeks and start at the
    # total number of durations (= total number of orders)
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert rows[0].n_risk == n_orders
    risks = [r.n_risk for r in rows]
    assert all(a > b for a, b in zip(risks, risks[1:]))
    # per-week mass: everyone at risk this week either survives to a
    # later bucket, events here, or censors here
    for a, b in zip(rows, rows[1:]):
        assert a.n_risk - a.n_event - a.n_censored == b.n_risk
    assert sum(r.n_event + r.n_censored for r in rows) == n_orders


def test_seasonal_naive_mase_identities(spark, sf_dir):
    rows = QUERIES["seasonal_naive_mase"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert len(rows) == ev.select("event_type").distinct().count()
    for r in rows:
        assert r.n_days >= 1
        assert r.abs_err_seasonal >= 0 and r.abs_err_naive >= 0
        if r.abs_err_naive:
            assert abs(r.mase - r.abs_err_seasonal / r.abs_err_naive) < 1e-6


def test_dup_source_matrix_mass(spark, sf_dir):
    """Every Jaccard>=0.8 pair lands in exactly one matrix cell."""
    docs = load_table(spark, sf_dir, "documents")
    try:
        n_pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.8).count()
        cells = QUERIES["dup_source_matrix"](spark, sf_dir).collect()
    finally:
        release_caches()
    assert sum(c.n_pairs for c in cells) == n_pairs
    for c in cells:
        assert c.source_a <= c.source_b
        assert 0.8 <= c.avg_jaccard <= 1.0


def test_boilerplate_trigrams_bounds(spark, sf_dir):
    rows = QUERIES["boilerplate_trigrams"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    per_src = {
        r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert {r.source for r in rows} == set(per_src)
    for r in rows:
        assert r.n_docs == per_src[r.source]
        assert 0 <= r.n_docs_boilerplate <= r.n_docs
        assert abs(r.boilerplate_share - r.n_docs_boilerplate / r.n_docs) < 1e-6
