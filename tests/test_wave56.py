"""Wave-56 pins: triple expansion against a hand-enumerable basket,
containment in the pair set, and day-0 retention = 1 exactly."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table


def test_triples_hand_basket(spark, tmp_path):
    """One basket {1,2,3,4} twice, one basket {1,2,5} once: the four
    C(4,3) triples have support 2, {1,2,5} has support 1 (cut)."""
    rows = []
    for o in (10, 11):
        rows += [(o, p) for p in (1, 2, 3, 4)]
    rows += [(12, p) for p in (1, 2, 5)]
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        (r.part_a, r.part_b, r.part_c): r.n_orders
        for r in QUERIES["frequent_part_triples"](spark, str(tmp_path)).collect()
    }
    want = {t: 2 for t in itertools.combinations((1, 2, 3, 4), 3)}
    assert got == want


def test_triples_contained_in_pairs(spark, sf_dir):
    """Apriori property spot-check: every frequent triple's member
    pairs co-occur at least as often."""
    triples = QUERIES["frequent_part_triples"](spark, sf_dir).collect()
    if not triples:
        return
    pairs = {
        (r.part_a, r.part_b): r.n_orders
        for r in QUERIES["frequent_part_pairs"](spark, sf_dir).collect()
    }
    for t in triples:
        for a, b in ((t.part_a, t.part_b), (t.part_a, t.part_c), (t.part_b, t.part_c)):
            if (a, b) in pairs:  # pairs view is top-50-truncated
                assert pairs[(a, b)] >= t.n_orders


def test_day_k_curve_shape(spark, sf_dir):
    rows = sorted(
        QUERIES["day_k_return_curve"](spark, sf_dir).collect(), key=lambda r: r.day_k
    )
    assert [r.day_k for r in rows] == list(range(30))
    assert rows[0].return_rate == 1.0  # day 0 = first-event day
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert rows[0].n_active == n_users
    for r in rows:
        assert 0.0 <= r.return_rate <= 1.0
