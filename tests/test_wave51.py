"""Wave-51 pins: S-curve shape properties (monotone in t, knee
ordering across layouts, the production layout's operating points)
and a broken-FK fixture for the integrity audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from easy_etl_spark.queries import QUERIES


def test_lsh_plan_scurve_properties(spark, sf_dir):
    rows = QUERIES["lsh_parameter_plan"](spark, sf_dir).collect()
    assert len(rows) == 6 * 9
    by_layout: dict[int, list] = {}
    for r in rows:
        assert r.rows_per_band * r.n_bands == 48
        assert 0.0 <= r.p_candidate <= 1.0
        by_layout.setdefault(r.rows_per_band, []).append(r)
    for rpb, cells in by_layout.items():
        cells.sort(key=lambda c: c.jaccard)
        ps = [c.p_candidate for c in cells]
        assert all(a <= b + 1e-9 for a, b in zip(ps, ps[1:])), rpb
    # the production layout (r=3, b=16): near-certain candidate by the
    # 0.7 verification threshold, steeper than r=1 at low similarity
    # (r=1 fires on everything)
    p3 = {c.jaccard: c.p_candidate for c in by_layout[3]}
    p1 = {c.jaccard: c.p_candidate for c in by_layout[1]}
    assert p3[0.7] > 0.998
    assert p1[0.1] > 0.99  # r=1 collapses the filter — why it's not used
    assert p3[0.1] < 0.05


def test_referential_integrity_clean_and_broken(spark, sf_dir, tmp_path):
    rows = QUERIES["referential_integrity_audit"](spark, sf_dir).collect()
    assert len(rows) == 7
    for r in rows:  # driver-generated data is referentially clean
        assert r.n_orphans == 0 and r.n_null_fk == 0
        assert r.n_child_rows > 0
    # broken fixture: clone the smallest rung, then corrupt nation
    # (2 orphan region keys + 1 null) and shrink region to one row —
    # the audit itself must localize the damage to the right edges
    from easy_etl_spark.session import load_table

    small = "/root/testdata/sf0.001"
    for t in ("lineitem", "orders", "part", "supplier", "customer"):
        load_table(spark, small, t).write.mode("overwrite").parquet(
            str(tmp_path / f"{t}.parquet")
        )
    nat = load_table(spark, small, "nation").select("n_nationkey", "n_name")
    nat.select(
        "n_nationkey",
        "n_name",
        F.when(F.col("n_nationkey") == 1, F.lit(99))
        .when(F.col("n_nationkey") == 2, F.lit(98))
        .when(F.col("n_nationkey") == 3, F.lit(None).cast("long"))
        .otherwise(F.lit(0))
        .alias("n_regionkey"),
    ).write.mode("overwrite").parquet(str(tmp_path / "nation.parquet"))
    load_table(spark, small, "region").where(F.col("r_regionkey") == 0).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "region.parquet"))
    out = {
        r.fk_edge: r
        for r in QUERIES["referential_integrity_audit"](spark, str(tmp_path)).collect()
    }
    assert out["nation.n_regionkey"].n_orphans == 2
    assert out["nation.n_regionkey"].n_null_fk == 1
    # unrelated edges stay clean — the audit localizes, not smears
    assert out["orders.o_custkey"].n_orphans == 0
    assert out["lineitem.l_orderkey"].n_orphans == 0
