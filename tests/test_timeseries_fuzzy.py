"""Gap-fill resampling (operators/timeseries.py) and edit-distance
blocking (operators/fuzzy.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from easy_etl_spark.operators.fuzzy import fuzzy_self_pairs
from easy_etl_spark.operators.timeseries import resample_fill


def _ev(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, event_type string, value double")


def test_resample_fill_dense_grid_and_locf(spark):
    ev = _ev(
        spark,
        [
            (datetime(2024, 1, 1, 0, 10), "a", 1.0),
            (datetime(2024, 1, 1, 0, 50), "a", 2.0),
            # hour 1 and 2: gap for "a"
            (datetime(2024, 1, 1, 3, 5), "a", 4.0),
            (datetime(2024, 1, 1, 2, 0), "b", 10.0),
        ],
    )
    out = {
        (r.event_type, r.hour_start): (r.n_events, r.sum_value, r.locf_value)
        for r in resample_fill(ev).collect()
    }
    # dense grid: 4 hours × 2 keys
    assert len(out) == 8
    assert out[("a", "2024-01-01 00:00:00")] == (2, 3.0, 3.0)
    assert out[("a", "2024-01-01 01:00:00")] == (0, 0.0, 3.0)  # gap: zero-fill + LOCF
    assert out[("a", "2024-01-01 02:00:00")] == (0, 0.0, 3.0)
    assert out[("a", "2024-01-01 03:00:00")] == (1, 4.0, 4.0)
    # "b" has no events before hour 2: LOCF is NULL until first obs
    assert out[("b", "2024-01-01 00:00:00")] == (0, 0.0, None)
    assert out[("b", "2024-01-01 02:00:00")] == (1, 10.0, 10.0)
    assert out[("b", "2024-01-01 03:00:00")] == (0, 0.0, 10.0)


def test_fuzzy_pairs_every_edit_kind(spark):
    vals = ["abcd", "abXd", "abd", "abcde", "zzzz"]
    df = spark.createDataFrame([(v,) for v in vals], "s_name string")
    got = {
        (r.name_a, r.name_b): r.dist for r in fuzzy_self_pairs(df, "s_name").collect()
    }
    assert got == {
        ("abXd", "abcd"): 1,  # substitution
        ("abcd", "abd"): 1,   # deletion
        ("abcd", "abcde"): 1, # insertion
        ("abXd", "abd"): 1,   # deleting X is a single edit
    }


def test_fuzzy_rejects_distance_two_block_collisions(spark):
    # "ab" and "ba" share deletion blocks {a, b} but are distance 2 —
    # the levenshtein verify must reject them
    df = spark.createDataFrame([("ab",), ("ba",)], "s_name string")
    assert fuzzy_self_pairs(df, "s_name").count() == 0


def test_fuzzy_matches_brute_force(spark, sf_dir):
    from easy_etl_spark.session import load_table

    sup = load_table(spark, sf_dir, "supplier")
    blocked = fuzzy_self_pairs(sup, "s_name")
    a = sup.select(F.col("s_name").alias("na"))
    b = sup.select(F.col("s_name").alias("nb"))
    brute = (
        a.crossJoin(b)
        .filter((F.col("na") < F.col("nb")) & (F.levenshtein("na", "nb") <= 1))
        .count()
    )
    assert blocked.count() == brute
