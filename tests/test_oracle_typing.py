"""Structural gate against the round-2 failure class: oracle SQL whose
DuckDB output carries an engine-specific type (HUGEINT int128 from an
uncast integer ``sum()``, DECIMAL from literal division, …) hashes
differently under the driver's comparator even when every value matches
Spark's. Every oracle must emit only types both engines serialize
identically.

No SparkSession needed — this runs each oracle through DuckDB alone and
inspects the relation's declared output types (cheap: prepare only, at
sf0.001 for the few oracles whose types require execution to infer).
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Types whose binary/text serialization is identical between DuckDB and
# Spark under the driver's comparator. Anything else (HUGEINT, DECIMAL,
# UHUGEINT, interval, nested list/struct) is a latent hash mismatch.
PORTABLE = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT",
    "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
}


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _base_type(t: str) -> str:
    return str(t).split("(")[0].strip()


def test_every_oracle_emits_only_portable_types(con):
    offenders = {}
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(sql)
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if _base_type(str(t)) not in PORTABLE
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle SQL emits non-portable types (wrap aggregates in "
        f"CAST(... AS BIGINT/DOUBLE)): {offenders}"
    )


def test_queries_and_oracles_keys_align():
    """Every oracle key must have a queries() entry (dangling oracles are
    dead weight; the reverse direction — rows-only queries — is allowed)."""
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert o <= q, f"oracles without a query: {sorted(o - q)}"
