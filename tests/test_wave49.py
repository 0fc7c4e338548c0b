"""Wave-49 pins: log-rank A/A calibration + accounting identities,
Spearman vs an independent python midrank replay plus a monotone
fixture, and DiD placebo behavior plus a constructed-effect fixture."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table, release_caches


def test_logrank_aa_calibration(spark, sf_dir):
    """The even/odd cohort split is arbitrary: the log-rank z must be
    unremarkable (|z| < 5 is generous) and O/E accounting sane."""
    try:
        r = QUERIES["logrank_test"](spark, sf_dir).first()
    finally:
        release_caches()
    assert r.o1 >= 0 and r.e1 > 0 and r.var_o1 > 0
    assert abs(r.o1 - r.e1) < r.e1  # O within 2x of E on an A/A split
    assert abs(r.z) < 5.0


def test_spearman_python_replay(spark, sf_dir):
    try:
        r = QUERIES["spearman_rho"](spark, sf_dir).first()
    finally:
        release_caches()
    li = load_table(spark, sf_dir, "lineitem").select("l_discount", "l_quantity")
    rows = [(int(round(x.l_discount * 100)), int(round(x.l_quantity))) for x in li.collect()]
    assert r.n == len(rows)

    def midranks(vals):
        from collections import Counter

        cnt = Counter(vals)
        below, mr = 0, {}
        for v in sorted(cnt):
            mr[v] = below + (cnt[v] + 1) / 2.0
            below += cnt[v]
        return mr

    mx = midranks([a for a, _ in rows])
    my = midranks([b for _, b in rows])
    import math

    n = len(rows)
    sx = sum(mx[a] for a, _ in rows)
    sy = sum(my[b] for _, b in rows)
    sxx = sum(mx[a] ** 2 for a, _ in rows)
    syy = sum(my[b] ** 2 for _, b in rows)
    sxy = sum(mx[a] * my[b] for a, b in rows)
    rho = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert abs(r.rho - rho) < 1e-6


def test_spearman_monotone_fixture(spark, tmp_path):
    """A strictly monotone (non-linear) relationship has rho = 1."""
    rows = [(i, i * 0.01, float(i * 1000 + (i * 7) % 13), "N") for i in range(60)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_discount double, l_quantity double, l_returnflag string"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = QUERIES["spearman_rho"](spark, str(tmp_path)).first()
    assert r.rho == 1.0


def test_diff_in_diff_constructed_effect(spark, tmp_path):
    """Treated cohort gains exactly +10.00 post; controls flat =>
    did_estimate = 10 exactly (integer cents all the way)."""
    b = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(10):  # days 0-4 pre, 5-9 post (midpoint by span)
        post = day >= 5
        for u in range(4):
            treated = u % 2 == 1
            v = 20.0 + (10.0 if treated and post else 0.0)
            rows.append((eid, b + dt.timedelta(days=day), u, "view", v, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = QUERIES["diff_in_diff"](spark, str(tmp_path)).first()
    assert r.control_pre == 20.0 and r.control_post == 20.0
    assert r.treated_pre == 20.0 and r.treated_post == 30.0
    assert r.did_estimate == 10.0
