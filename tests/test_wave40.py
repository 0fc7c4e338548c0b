"""Wave-40 pins: governance-audit semantics the oracle twin can't
express — accounting identities, monotone risk growth, and a pure-
Python replay of the derandomized Laplace draw."""

from __future__ import annotations

import hashlib
import math

from easy_etl_spark.queries import QUERIES


def test_kanon_accounting_identities(spark, sf_dir):
    r = QUERIES["k_anonymity_audit"](spark, sf_dir).first()
    assert 0 <= r.n_violating_cells <= r.n_cells
    assert 0 <= r.n_records_at_risk <= r.n_records
    assert r.suppression_bp == (10000 * r.n_records_at_risk) // r.n_records
    # released cells (if any) have size >= k, so diversity >= 1
    if r.min_l_released is not None:
        assert r.min_l_released >= 1
        assert r.released_cells_low_diversity <= r.n_cells - r.n_violating_cells
    else:
        # nothing releasable: every cell violates k
        assert r.n_violating_cells == r.n_cells


def test_reidentification_risk_grows_with_qi_width(spark, sf_dir):
    rows = sorted(
        QUERIES["reidentification_risk"](spark, sf_dir).collect(),
        key=lambda r: r.qi_width,
    )
    assert [r.qi_width for r in rows] == [1, 2, 3]
    # refining a partition can only split cells: cell counts and
    # singleton counts are monotone non-decreasing in QI width
    assert rows[0].n_cells <= rows[1].n_cells <= rows[2].n_cells
    assert (
        rows[0].n_singleton_cells
        <= rows[1].n_singleton_cells
        <= rows[2].n_singleton_cells
    )
    assert rows[0].n_cells <= 5  # priority domain
    assert rows[0].unicity_bp <= rows[2].unicity_bp


def test_dp_noise_replays_in_pure_python(spark, sf_dir):
    """The derandomized Laplace draw is exactly the inverse CDF on the
    md5 uniform: replay it independently for every group."""
    rows = QUERIES["dp_histogram"](spark, sf_dir).collect()
    assert len(rows) >= 1
    qln = lambda x: math.floor(math.log(x) * 1e6 + 0.5)
    for r in rows:
        h = int(
            hashlib.md5(f"noise:{r.o_orderpriority}".encode()).hexdigest()[:8], 16
        )
        sgn = 1 if h >= 1 << 31 else -1
        r_odd = (1 << 32) - abs(2 * h - (1 << 32)) + 1
        want = sgn * (qln(1 << 32) - qln(r_odd))
        assert r.noise_micro == want
        assert r.noisy_count_micro == r.exact_count * 1_000_000 + want


def test_dp_noise_scale_is_plausible(spark, sf_dir):
    """Laplace(1) draws live in single-digit nats with overwhelming
    probability; a unit bug (e.g. missing the 1e6 quantization) would
    blow this bound."""
    rows = QUERIES["dp_histogram"](spark, sf_dir).collect()
    for r in rows:
        assert abs(r.noise_micro) < 25_000_000  # 25 nats
