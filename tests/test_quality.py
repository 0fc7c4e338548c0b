"""Data-quality check framework (operators/quality.py)."""

from __future__ import annotations

import pytest

from easy_etl_spark.operators import quality as Q


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (2, "c", 999.0),   # dup key, out-of-range value
            (4, None, -5.0),   # null name, below range
            (5, "zz", 30.0),   # unaccepted name
        ],
        "k bigint, name string, v double",
    )


def test_report_counts(spark, frame):
    parent = spark.createDataFrame([(1,), (2,), (4,)], "pk bigint")
    report = Q.run_checks(
        [
            Q.unique(frame, ["k"]),
            Q.not_null(frame, "name"),
            Q.in_range(frame, "v", 0.0, 100.0),
            Q.accepted_values(frame, "name", ["a", "b", "c"]),
            Q.foreign_key(frame, "k", parent, "pk"),
        ]
    ).collect()
    got = {r.check_name: (r.n_violations, r.passed) for r in report}
    assert got["unique:k"] == (1, False)          # one extra row for k=2
    assert got["not_null:name"] == (1, False)
    assert got["range:v"] == (2, False)           # 999 and -5
    assert got["accepted:name"] == (2, False)     # None and "zz"
    assert got["fk:k->pk"] == (1, False)          # k=5 orphan
    assert all(n > 0 for n, _ in got.values())


def test_all_green_report(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, name string")
    report = Q.run_checks([Q.unique(df, ["k"]), Q.not_null(df, "name")]).collect()
    assert all(r.passed and r.n_violations == 0 for r in report)


def test_violations_rows(spark, frame):
    rows = Q.in_range(frame, "v", 0.0, 100.0).violations().collect()
    assert sorted(r.v for r in rows) == [-5.0, 999.0]
    with pytest.raises(ValueError):
        Q.unique(frame, ["k"]).violations()


def test_pipeline_expect_gate(spark, tmp_path):
    from easy_etl_spark.pipeline import EtlPipeline
    from easy_etl_spark.sources.sinks import ParquetSink

    df = spark.createDataFrame([(1, "a"), (2, None)], "k bigint, name string")
    sink = ParquetSink(spark, str(tmp_path / "t"))

    p = EtlPipeline(spark)
    p.extract_df(df).expect(lambda d: Q.not_null(d, "name"))
    with pytest.raises(ValueError, match="not_null:name=1"):
        p.load(sink)
    assert sink.read() is None  # nothing written: validate-then-write

    # a clean frame under the same expectation loads normally
    p2 = EtlPipeline(spark)
    p2.extract_df(df.filter("name IS NOT NULL")).expect(lambda d: Q.not_null(d, "name"))
    p2.load(sink)
    assert sink.read().count() == 1


def test_foreign_key_ignores_null_child_keys(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (None,), (99,)], "fk bigint"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    # NOT IN semantics: only the non-NULL orphan (99) violates; the
    # NULL child key is the not_null check's job
    r = Q.foreign_key(child, "fk", parent, "pk").report().first()
    assert r["n_violations"] == 1 and not r["passed"]
