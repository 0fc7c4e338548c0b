"""Declarative pipeline specs: build an EtlPipeline from a plain dict.

The reference's API is fluent Python (easy_etl/README.md); production
ETL fleets usually ALSO want the pipeline as reviewable config (YAML/
JSON checked into a repo, one runner binary). This module maps such a
spec onto the exact same staged facade, so a config-driven pipeline is
provably the same engine path as the code-driven one (pytest pins
spec-run == code-run).

Spec shape (all sections optional except extract):

    {
      "extract": "SELECT ...",           # or {"sql": ..., "types": {...},
                                         #     "watermark_field": "o_orderkey"}
      "transforms": {                    # per-field chained methods
        "c_name": [["lower"], ["replace", "a", "b"]],
      },
      "defaults": {"c_acctbal": 0.0},    # falsy-coalesce (reference `default`)
      "links": [                         # broadcast FK links
        {"field": "c_nationkey", "table": "nation",
         "child_field": "n_nationkey", "name": "nation_id"},
        # as-of: add "closest": ">=" (or "<=", ">", "<")
      ],
      "ignore": ["c_nationkey"],
      "expect_schema": {"c_custkey": "bigint", ...},   # SOURCE contract:
                                         # validates the extracted frame
                                         # (middleware slot), failing fast
                                         # on upstream schema drift
    }

Link dimension tables resolve from the ``tables`` mapping passed by the
caller — specs stay pure data, no embedded DataFrames.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession

from .pipeline import EtlPipeline


class SchemaContractError(ValueError):
    """A column named in the contract is missing or has a different type."""


def expect_schema(df: DataFrame, contract: Mapping[str, str]) -> DataFrame:
    """Assert the frame satisfies a {column: spark_type_name} contract
    (a SUBSET check: extra columns are allowed, missing or mistyped
    ones raise). Run it at pipeline boundaries so producer drift fails
    fast and loudly instead of corrupting a 100 TB table silently."""
    have = dict(df.dtypes)
    problems = []
    for col, typ in contract.items():
        if col not in have:
            problems.append(f"missing column {col!r} (want {typ})")
        elif have[col] != typ:
            problems.append(f"column {col!r} is {have[col]}, contract says {typ}")
    if problems:
        raise SchemaContractError("; ".join(problems))
    return df


def pipeline_from_spec(
    spark: SparkSession,
    spec: Mapping[str, Any],
    tables: Mapping[str, DataFrame] | None = None,
) -> EtlPipeline:
    """Stage an EtlPipeline from a declarative spec (module docstring
    for the shape). Every section maps 1:1 onto the fluent API, so the
    compiled Catalyst plan is identical to the hand-written pipeline."""
    tables = tables or {}
    pipe = EtlPipeline(spark)

    extract = spec["extract"]
    if isinstance(extract, str):
        pipe.extract(extract)
    else:
        pipe.extract(
            extract["sql"],
            write_pk_field=extract.get("watermark_field"),
            types=extract.get("types"),
        )

    for field, chain in (spec.get("transforms") or {}).items():
        t = pipe.transform(field)
        for step in chain:
            method, *args = step
            t = getattr(t, method)(*args)

    for field, value in (spec.get("defaults") or {}).items():
        pipe.transform(field).default(value)

    for link in spec.get("links") or []:
        dim = tables[link["table"]]
        if "closest" in link:
            pipe.link_closest(
                link["field"],
                dim,
                link["child_field"],
                name=link.get("name"),
                method=link["closest"],
            )
        else:
            pipe.link(link["field"], dim, link["child_field"], name=link.get("name"))

    if spec.get("ignore"):
        pipe.ignore(*spec["ignore"])

    contract = spec.get("expect_schema")
    if contract:
        pipe.middleware(lambda df: expect_schema(df, contract))
    return pipe
