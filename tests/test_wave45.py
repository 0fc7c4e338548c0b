"""Wave-45 pins: backtest leakage-freedom and arithmetic, Murphy
decomposition identity on a hand-built perfectly-calibrated fixture,
and assortativity sign on known graph shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table


def test_rolling_origin_backtest_shape(spark, sf_dir):
    rows = QUERIES["rolling_origin_backtest"](spark, sf_dir).collect()
    origins = {r.days_back for r in rows}
    assert origins == {7, 14, 21}
    for r in rows:
        assert 1 <= r.n_days <= 7
        assert r.abs_err >= 0
        assert abs(r.mae - r.abs_err / r.n_days) < 1e-6


def test_brier_decomposition_identity(spark, sf_dir):
    r = QUERIES["brier_decomposition"](spark, sf_dir).first()
    assert 0.0 <= r.brier <= 1.0
    assert r.reliability >= 0.0 and r.resolution >= -1e-9
    assert 0.0 <= r.uncertainty <= 0.25 + 1e-9
    # Murphy identity with the residual reported explicitly
    assert abs(r.brier - (r.reliability - r.resolution + r.uncertainty + r.residual)) < 5e-6
    # resolution can never exceed uncertainty
    assert r.resolution <= r.uncertainty + 1e-6


def test_brier_perfect_score_fixture(spark, tmp_path):
    """A scorer emitting exactly 0 or 1000 per-mille and always right
    has Brier 0, reliability 0, and resolution == uncertainty."""
    rows = []
    for i in range(400):
        conv = i % 4 == 0  # 25% positives
        rows.append(
            (i, None, i, "purchase" if conv else "view", 100.0 if conv else 0.0, "{}")
        )
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), u, t, v, p)
        for (i, _, u, t, v, p) in rows
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = QUERIES["brier_decomposition"](spark, str(tmp_path)).first()
    assert r.brier == 0.0
    assert r.reliability == 0.0
    assert abs(r.resolution - r.uncertainty) < 1e-6
    assert abs(r.uncertainty - 0.25 * 0.75) < 1e-6


def test_degree_assortativity_bounds_and_fixture(spark, sf_dir, tmp_path):
    r = QUERIES["degree_assortativity"](spark, sf_dir).first()
    assert r.n_edges > 0 and r.n_nodes > 0
    assert r.sxpy > 0 and r.sx2y2 >= r.sxy
    if r.r is not None:
        assert -1.0 - 1e-9 <= r.r <= 1.0 + 1e-9
    # star graph fixture: maximally disassortative (r = -1) — order i
    # pairs the hub part 100 with leaf part 200+i
    li = [(i, 100) for i in range(5)] + [(i, 200 + i) for i in range(5)]
    spark.createDataFrame(
        [(o, p) for o, p in li], "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    s = QUERIES["degree_assortativity"](spark, str(tmp_path)).first()
    assert s.n_edges == 5 and s.n_nodes == 6
    assert s.r == -1.0
