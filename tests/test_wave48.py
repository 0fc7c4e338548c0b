"""Wave-48 pins: Gibbs' inequality on the cross-entropy matrix, a
translated-corpus fixture, and a hand-built Simpson-reversal fixture
where the pooled correlation contradicts every stratum."""

from __future__ import annotations

from pyspark.sql import functions as F

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table


def test_cross_entropy_gibbs(spark, sf_dir):
    """H(a||b) >= H(a||a) for every b (Gibbs' inequality holds up to
    the shared smoothing bias, which only weakens the diagonal)."""
    rows = QUERIES["cross_entropy_matrix"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_src = docs.select("source").distinct().count()
    assert len(rows) == n_src * n_src
    diag = {r.source_a: r.cross_entropy_nats for r in rows if r.source_a == r.source_b}
    for r in rows:
        assert r.cross_entropy_nats > 0
        assert r.cross_entropy_nats >= diag[r.source_a] - 1e-9


def test_cross_entropy_disjoint_fixture(spark, tmp_path):
    """Two sources with disjoint vocabularies: the cross terms pay the
    full smoothing penalty and dwarf the diagonal."""
    rows = [(i, "aa bb cc dd", "en", "A", 11) for i in range(50)]
    rows += [(100 + i, "xx yy zz ww", "en", "B", 11) for i in range(50)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        (r.source_a, r.source_b): r.cross_entropy_nats
        for r in QUERIES["cross_entropy_matrix"](spark, str(tmp_path)).collect()
    }
    assert out[("A", "B")] > out[("A", "A")] + 2.0
    assert out[("B", "A")] > out[("B", "B")] + 2.0


def test_simpsons_scan_real_data(spark, sf_dir):
    rows = QUERIES["simpsons_paradox_scan"](spark, sf_dir).collect()
    assert {r.grp for r in rows} == {"A", "N", "R"}
    for r in rows:
        if r.r_group is not None:
            assert -1.0 - 1e-9 <= r.r_group <= 1.0 + 1e-9
        assert isinstance(r.sign_flip, bool)


def test_simpsons_reversal_fixture(spark, tmp_path):
    """Classic construction: within each stratum x and y rise
    together; across strata the high-x stratum sits at much lower y,
    so the pooled correlation is negative — every row must flag."""
    rows = []
    k = 0
    for xc, y0, grp in ((0, 100, "A"), (8, 10, "R")):
        for i in range(5):
            for j in range(10):
                rows.append((k, (xc + i) / 100.0, float(y0 + i), grp))
                k += 1
    spark.createDataFrame(
        rows, "l_orderkey long, l_discount double, l_quantity double, l_returnflag string"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = QUERIES["simpsons_paradox_scan"](spark, str(tmp_path)).collect()
    assert {r.grp for r in out} == {"A", "R"}
    for r in out:
        assert r.r_group == 1.0   # perfect within-stratum correlation
        assert r.r_overall < 0    # pooled reverses
        assert r.sign_flip is True
