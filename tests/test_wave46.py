"""Wave-46 pins: strict-funnel monotone shrinkage + a hand-built
chain fixture, and cross-correlation bounds + self-correlation-at-
lag-0 on an identical-series fixture."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table


def test_window_funnel_shrinks(spark, sf_dir):
    r = QUERIES["window_funnel_strict"](spark, sf_dir).first()
    assert r.n_step1_view >= r.n_step2_click >= r.n_step3_purchase >= 0
    # strict funnel can never beat the weak first-occurrence funnel
    weak = QUERIES["events_funnel"](spark, sf_dir).first()
    assert r.n_step1_view == weak.n_view


def test_window_funnel_fixture(spark, tmp_path):
    """User 1 completes the chain inside the hour; user 2's purchase
    precedes the click (ordering violation); user 3's click falls
    outside the window."""
    b = dt.datetime(2024, 1, 1, 12, 0, 0)
    mk = lambda i, s, u, t: (i, b + dt.timedelta(seconds=s), u, t, 0.0, "{}")
    rows = [
        mk(1, 0, 1, "view"), mk(2, 60, 1, "click"), mk(3, 120, 1, "purchase"),
        mk(4, 0, 2, "view"), mk(5, 30, 2, "purchase"), mk(6, 60, 2, "click"),
        mk(7, 0, 3, "view"), mk(8, 4000, 3, "click"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = QUERIES["window_funnel_strict"](spark, str(tmp_path)).first()
    assert (r.n_step1_view, r.n_step2_click, r.n_step3_purchase) == (3, 2, 1)


def test_leadlag_crosscorr_bounds(spark, sf_dir):
    rows = QUERIES["leadlag_crosscorr"](spark, sf_dir).collect()
    lags = sorted(r.lag for r in rows)
    assert lags == list(range(-7, 8))
    for r in rows:
        if r.r is not None:
            assert -1.0 - 1e-9 <= r.r <= 1.0 + 1e-9


def test_leadlag_identical_series_fixture(spark, tmp_path):
    """click and purchase counts identical per day => r = 1 at lag 0."""
    b = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(14):
        n = 1 + (day * 7) % 5  # varying daily counts
        for k in range(n):
            for t in ("click", "purchase"):
                rows.append(
                    (eid, b + dt.timedelta(days=day, seconds=k), k, t, 0.0, "{}")
                )
                eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.lag: r for r in QUERIES["leadlag_crosscorr"](spark, str(tmp_path)).collect()}
    assert out[0].r == 1.0
    assert out[0].n == 14
