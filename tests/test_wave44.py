"""Wave-44 pins: PMI collocation ordering/support invariants, LTV
curve monotonicity + mass accounting, and stump-scan Gini bounds with
a hand-built perfectly-separable fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table


def test_collocation_pmi_invariants(spark, sf_dir):
    rows = QUERIES["collocation_pmi"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    for r in rows:
        assert r.n_pair >= 5
        # PMI can't exceed ln of total tokens (b <= min(u1, u2))
        assert r.pmi < 25.0


def test_cohort_ltv_monotone_and_mass(spark, sf_dir):
    rows = QUERIES["cohort_ltv_curve"](spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    assert sum(r.n_orders for r in rows) == orders.count()
    by_cohort: dict[int, list] = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_year, []).append(r)
    for year, cells in by_cohort.items():
        cells.sort(key=lambda r: r.month_offset)
        assert cells[0].month_offset == 0  # every cohort starts at its birth
        ltv = [c.ltv_per_customer for c in cells]
        assert all(a <= b + 1e-9 for a, b in zip(ltv, ltv[1:])), year


def test_decision_stump_bounds(spark, sf_dir):
    rows = QUERIES["decision_stump_scan"](spark, sf_dir).collect()
    feats = {r.feature for r in rows}
    assert feats == {"quantity", "discount_cents"}
    for r in rows:
        assert r.n_le > 0 and r.n_gt > 0
        assert 0 <= r.p_le <= r.n_le and 0 <= r.p_gt <= r.n_gt
        assert 0.0 <= r.weighted_gini <= 0.5 + 1e-9


def test_decision_stump_perfect_split(spark, tmp_path):
    """A feature that perfectly separates the label must yield a
    threshold with weighted Gini exactly 0."""
    rows = [(i, float(i % 10), 0.0, "R" if i % 10 < 5 else "N") for i in range(1000)]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_quantity double, l_discount double, l_returnflag string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = QUERIES["decision_stump_scan"](spark, str(tmp_path)).collect()
    q = [r for r in out if r.feature == "quantity"]
    assert min(r.weighted_gini for r in q) == 0.0
    best = min(q, key=lambda r: r.weighted_gini)
    assert best.thr == 4  # <=4 is all-R, >4 all-N
