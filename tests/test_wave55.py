"""Wave-55 pins: path extraction respects session boundaries (fixture
with a gap splitting a would-be path), and entropy bounds + a
deterministic-chain fixture with H = 0, perplexity = 1."""

from __future__ import annotations

import datetime as dt
import math

from easy_etl_spark.queries import QUERIES


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_top_paths_session_boundary_fixture(spark, tmp_path):
    b = dt.datetime(2024, 1, 1)
    rows = [
        # session 1: a -> b -> c (one path)
        (1, b, 1, "a", 0.0, "{}"),
        (2, b + dt.timedelta(seconds=10), 1, "b", 0.0, "{}"),
        (3, b + dt.timedelta(seconds=20), 1, "c", 0.0, "{}"),
        # >30 min gap: d e f in a NEW session — no c->d->e or b->c->d path
        (4, b + dt.timedelta(seconds=20 + 1900), 1, "d", 0.0, "{}"),
        (5, b + dt.timedelta(seconds=20 + 1910), 1, "e", 0.0, "{}"),
        (6, b + dt.timedelta(seconds=20 + 1920), 1, "f", 0.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    paths = {r.path: r.n for r in QUERIES["top_event_paths"](spark, str(tmp_path)).collect()}
    assert paths == {"a -> b -> c": 1, "d -> e -> f": 1}


def test_transition_entropy_bounds(spark, sf_dir):
    r = QUERIES["transition_entropy"](spark, sf_dir).first()
    assert r.n_transitions > 0
    assert 0.0 <= r.cond_entropy_nats <= math.log(5) + 1e-6  # <= ln(|types|)
    assert abs(r.perplexity - math.exp(r.cond_entropy_nats)) < 2e-3


def test_transition_entropy_deterministic_chain(spark, tmp_path):
    """a->b->a->b...: next event is fully determined by prev =>
    H = 0, perplexity = 1."""
    b = dt.datetime(2024, 1, 1)
    rows = [
        (i, b + dt.timedelta(seconds=i), 1, "ab"[i % 2], 0.0, "{}")
        for i in range(100)
    ]
    _write_events(spark, tmp_path, rows)
    r = QUERIES["transition_entropy"](spark, str(tmp_path)).first()
    assert r.n_transitions == 99
    assert r.cond_entropy_nats == 0.0
    assert r.perplexity == 1.0
