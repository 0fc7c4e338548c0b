"""Wave-41 pins: Heaps-curve monotonicity and endpoint identity, SNM
recall accounting against the exact edit-distance pair set, and a
float replay of the exact-rational RBO."""

from __future__ import annotations

from pyspark.sql import functions as F

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.operators.textops import tokens
from easy_etl_spark.session import load_table, release_caches


def test_heaps_curve_monotone_and_endpoint(spark, sf_dir):
    rows = sorted(
        QUERIES["heaps_law_curve"](spark, sf_dir).collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    for a, b in zip(rows, rows[1:]):
        assert a.corpus_tokens <= b.corpus_tokens
        assert a.vocab_size <= b.vocab_size
    for r in rows:
        assert 1 <= r.vocab_size <= r.corpus_tokens
    docs = load_table(spark, sf_dir, "documents")
    all_types = (
        docs.select(F.explode(tokens(F.col("text"))).alias("t")).distinct().count()
    )
    all_occs = docs.select(F.explode(tokens(F.col("text"))).alias("t")).count()
    assert rows[-1].vocab_size == all_types
    assert rows[-1].corpus_tokens == all_occs


def test_snm_recall_and_precision(spark, sf_dir):
    """SNM is a candidate generator: every emitted pair is a true
    edit-distance<=1 pair within the rank window (precision 1 by
    construction — pinned anyway), and recall against the exact
    deletion-neighborhood set is reported-not-assumed: pairs whose
    names differ in an EARLY character sort far apart and are SNM's
    known blind spot."""
    got = {
        (r.name_a, r.name_b)
        for r in QUERIES["snm_candidate_pairs"](spark, sf_dir).collect()
    }
    exact = {
        tuple(sorted((r[0], r[1])))
        for r in QUERIES["fuzzy_name_pairs"](spark, sf_dir).collect()
    }
    release_caches()
    assert got, "SNM found nothing on a corpus with planted near-dups"
    norm_got = {tuple(sorted(p)) for p in got}
    assert norm_got <= exact  # precision 1
    recall = len(norm_got) / len(exact) if exact else 1.0
    # supplier near-dups are single-digit edits; suffix edits sort
    # adjacently, early-digit edits don't — recall is high, not total
    assert recall >= 0.5, f"recall {recall:.2f} collapsed"


def test_snm_window_bounds(spark, sf_dir):
    rows = QUERIES["snm_candidate_pairs"](spark, sf_dir).collect()
    for r in rows:
        assert 1 <= r.rank_gap <= 5
        assert 0 <= r.edit_dist <= 1
        assert r.name_a != r.name_b


def test_rbo_float_replay(spark, sf_dir):
    """Replay the exact-integer RBO in floats: overlap_d are exact, so
    (1-p) sum p^(d-1) overlap_d / d must match rbo_prefix_micro within
    1 micro-unit of quantization per depth."""
    rows = sorted(
        QUERIES["rbo_rank_overlap"](spark, sf_dir).collect(), key=lambda r: r.depth
    )
    assert [r.depth for r in rows] == list(range(1, 11))
    p = 0.9
    acc = 0.0
    prev = -1
    for r in rows:
        assert prev <= r.overlap_d <= r.depth
        prev = r.overlap_d
        acc += (1 - p) * p ** (r.depth - 1) * (r.overlap_d / r.depth)
        assert abs(acc * 1_000_000 - r.rbo_prefix_micro) <= len(rows)
    assert 0 <= rows[-1].rbo_prefix_micro <= 1_000_000
