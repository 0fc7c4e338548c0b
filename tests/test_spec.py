"""Spec-driven pipelines: config == code, and schema contracts."""

from __future__ import annotations

import pytest

from easy_etl_spark import EtlPipeline
from easy_etl_spark.session import load_table, register_views
from easy_etl_spark.spec import SchemaContractError, expect_schema, pipeline_from_spec

SPEC = {
    "extract": "SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer",
    "transforms": {"c_name": [["lower"], ["replace", "customer#", "cust-"]]},
    "defaults": {"c_acctbal": 0.0},
    "links": [
        {
            "field": "c_nationkey",
            "table": "nation",
            "child_field": "n_nationkey",
            "name": "nation_id",
        }
    ],
    "ignore": ["c_nationkey"],
    "expect_schema": {"c_custkey": "bigint", "c_name": "string"},
}


def _code_pipeline(spark, nation):
    pipe = EtlPipeline(spark).extract(
        "SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer"
    )
    pipe.transform("c_name").lower().replace("customer#", "cust-")
    pipe.transform("c_acctbal").default(0.0)
    pipe.link("c_nationkey", nation, "n_nationkey", name="nation_id")
    pipe.ignore("c_nationkey")
    return pipe


def test_spec_pipeline_equals_code_pipeline(spark, sf_dir):
    register_views(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    from_spec = pipeline_from_spec(spark, SPEC, tables={"nation": nation}).dataframe()
    from_code = _code_pipeline(spark, nation).dataframe()
    assert from_spec.columns == from_code.columns
    key = lambda r: r["c_custkey"]  # noqa: E731
    assert sorted(from_spec.collect(), key=key) == sorted(
        from_code.collect(), key=key
    )


def test_schema_contract_blocks_drift(spark, sf_dir):
    register_views(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    bad = dict(SPEC, expect_schema={"c_custkey": "string", "gone": "bigint"})
    pipe = pipeline_from_spec(spark, bad, tables={"nation": nation})
    with pytest.raises(SchemaContractError) as e:
        pipe.dataframe()
    msg = str(e.value)
    assert "c_custkey" in msg and "gone" in msg


def test_expect_schema_allows_extra_columns(spark, sf_dir):
    df = load_table(spark, sf_dir, "nation")
    out = expect_schema(df, {"n_nationkey": dict(df.dtypes)["n_nationkey"]})
    assert out is df


def test_spec_asof_link_matches_code_path(spark, sf_dir):
    register_views(spark, sf_dir)
    from easy_etl_spark.session import load_table as _lt

    li_dim = (
        _lt(spark, sf_dir, "lineitem")
        .select("l_shipdate")
        .distinct()
        .selectExpr("l_shipdate AS ship_key")
    )
    spec = {
        "extract": "SELECT o_orderkey, o_orderdate FROM orders",
        "links": [
            {
                "field": "o_orderdate",
                "table": "shipdates",
                "child_field": "ship_key",
                "name": "next_ship_id",
                "closest": ">=",
            }
        ],
    }
    from_spec = pipeline_from_spec(
        spark, spec, tables={"shipdates": li_dim}
    ).dataframe()
    code = EtlPipeline(spark).extract("SELECT o_orderkey, o_orderdate FROM orders")
    code.link_closest(
        "o_orderdate", li_dim, "ship_key", name="next_ship_id", method=">="
    )
    from_code = code.dataframe()
    key = lambda r: r["o_orderkey"]  # noqa: E731
    assert sorted(from_spec.collect(), key=key) == sorted(
        from_code.collect(), key=key
    )


def test_spec_watermark_extract_and_types(spark, sf_dir):
    """Typed incremental extract through the spec path: the watermark
    placeholder substitutes from the pipeline's write target and types
    compile like the fluent API."""
    register_views(spark, sf_dir)
    spec = {
        "extract": {
            "sql": "SELECT o_orderkey, o_totalprice FROM orders",
            "types": {"o_totalprice": float},
        },
    }
    pipe = pipeline_from_spec(spark, spec)
    df = pipe.dataframe()
    assert dict(df.dtypes)["o_totalprice"] == "double"
    assert df.count() > 0
