"""Wave-43 pins: quantile-normalization alignment property, z-test
arithmetic identity, Hill-estimator bounds, and dispersion sanity on
a hand-built Poisson-vs-burst fixture."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table, release_caches


def test_quantile_normalize_aligns_sources(spark, sf_dir):
    """After quantile normalization every source's summary must sit
    within discretization error of the pooled summary — that is the
    entire point of the transform."""
    try:
        rows = QUERIES["quantile_normalize_values"](spark, sf_dir).collect()
    finally:
        release_caches()
    docs = load_table(spark, sf_dir, "documents")
    pooled_avg = docs.agg(F.avg("n_chars")).first()[0]
    per_src = {r.source: r for r in rows}
    assert len(per_src) == docs.select("source").distinct().count()
    for r in rows:
        # discretization error shrinks with n; 5% is generous headroom
        assert abs(r.avg_norm - pooled_avg) / pooled_avg < 0.05
        assert r.median_norm is not None


def test_ab_ztest_identity(spark, sf_dir):
    r = QUERIES["ab_conversion_ztest"](spark, sf_dir).first()
    assert r.n0 > 0 and r.n1 > 0
    assert 0 <= r.k0 <= r.n0 and 0 <= r.k1 <= r.n1
    if r.z is not None:
        p0, p1 = r.k0 / r.n0, r.k1 / r.n1
        pp = (r.k0 + r.k1) / (r.n0 + r.n1)
        z = (p0 - p1) / math.sqrt(pp * (1 - pp) * (1 / r.n0 + 1 / r.n1))
        assert abs(r.z - z) < 1e-5


def test_zipf_alpha_bounds(spark, sf_dir):
    r = QUERIES["zipf_tail_alpha"](spark, sf_dir).first()
    assert r.k == 100 and r.f_min >= 1
    assert r.sum_ln >= 0
    if r.alpha is not None:
        assert r.alpha > 1.0  # Hill estimate is 1 + k/sum, sum > 0


def test_interarrival_dispersion_fixture(spark, tmp_path):
    """A strict fixed-rate arrival stream has variance 0 (burstiness
    -1); a two-scale bursty stream has cv2 near 1 or above with
    burstiness well over 0. The registered query reads from a dir, so
    the fixture is written as a parquet 'events' table."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(50):  # fixed rate: every 60s
        rows.append((i, base + dt.timedelta(seconds=60 * i), 1, "steady", 0.0, "{}"))
    t = base
    for i in range(50):  # bursty: long dead time, then a rapid burst
        t = t + dt.timedelta(seconds=5000 if i % 10 == 0 else 1)
        rows.append((1000 + i, t, 2, "bursty", 0.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    ev.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.event_type: r
        for r in QUERIES["interarrival_dispersion"](spark, str(tmp_path)).collect()
    }
    assert out["steady"].var_gap_s == 0.0
    assert out["steady"].burstiness == -1.0
    assert out["bursty"].cv2 > 0.9
    assert out["bursty"].burstiness > 0.4
