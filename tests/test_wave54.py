"""Wave-54 pins: OHLC invariants + a hand-ordered candle fixture, and
a constructed-spike Bollinger fixture where exactly one day breaches."""

from __future__ import annotations

import datetime as dt

from easy_etl_spark.queries import QUERIES


def test_ohlc_invariants(spark, sf_dir):
    rows = QUERIES["ohlc_hourly"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.low_cents <= r.open_cents <= r.high_cents
        assert r.low_cents <= r.close_cents <= r.high_cents
        assert r.n_events >= 1


def test_ohlc_fixture(spark, tmp_path):
    b = dt.datetime(2024, 1, 1, 9, 0, 0)
    rows = [
        (1, b + dt.timedelta(minutes=1), 1, "trade", 10.00, "{}"),   # open
        (2, b + dt.timedelta(minutes=20), 1, "trade", 99.99, "{}"),  # high
        (3, b + dt.timedelta(minutes=40), 1, "trade", 0.01, "{}"),   # low
        (4, b + dt.timedelta(minutes=59), 1, "trade", 55.55, "{}"),  # close
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = QUERIES["ohlc_hourly"](spark, str(tmp_path)).first()
    assert (r.open_cents, r.high_cents, r.low_cents, r.close_cents) == (
        1000, 9999, 1, 5555,
    )


def test_bollinger_spike_fixture(spark, tmp_path):
    """14 flat days then one 100x spike: the spike day is the only
    upper breach; flat days have sigma 0 and cannot breach."""
    b = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(15):
        n = 1000 if day == 14 else 10
        for k in range(n):
            rows.append((eid, b + dt.timedelta(days=day, seconds=k), k, "view", 0.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = QUERIES["bollinger_breaches"](spark, str(tmp_path)).first()
    assert r.n_days_scored == 8       # days 7..14 have a full window
    assert r.n_upper_breaches == 1    # only the spike day
    assert r.n_lower_breaches == 0
