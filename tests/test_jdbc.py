"""Live-JDBC extract parity.

The reference's whole test suite runs against a real MySQL server
(reference tests/conftest.py:19-20, Vagrantfile:12). This container has
no network, but Spark ships Apache Derby — a real embedded JDBC
database — so the extract path is exercised against a live JDBC source
end-to-end: seed over JDBC, extract with a remotely-executed query,
run the result through the EtlPipeline facade into a parquet sink.

Identifier note: Spark's JDBC writer quotes column names, so Derby
stores them case-sensitively — queries must quote them back.
"""

from __future__ import annotations

import pytest

from easy_etl_spark.pipeline import EtlPipeline
from easy_etl_spark.sources import readers
from easy_etl_spark.sources.sinks import ParquetSink

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def jdbc_url(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "db"
    url = f"jdbc:derby:{db};create=true"
    seed = spark.createDataFrame(
        [(1, 5.0, "keep"), (2, 250.0, "keep"), (3, 999.0, "drop")],
        "order_id int, amount double, tag string",
    )
    (
        seed.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "ORDERS_SRC")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    return url


def test_jdbc_extract_pushes_query_to_source(spark, jdbc_url):
    out = readers.jdbc_extract(
        spark,
        jdbc_url,
        'SELECT "order_id", "amount" FROM ORDERS_SRC WHERE "amount" > 100',
        driver=DRIVER,
    )
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == [(2, 250.0), (3, 999.0)]
    # the filter ran in the source DB: the scan node is a JDBC relation
    # scoped to the pushed query, not a full-table read
    plan = out._jdf.queryExecution().simpleString()
    assert "JDBCRelation" in plan


def test_jdbc_extract_through_pipeline_facade(spark, jdbc_url, tmp_path):
    sink = ParquetSink(spark, str(tmp_path / "jdbc_out"))
    p = EtlPipeline(spark)
    (
        # Spark's JDBC writer maps StringType → CLOB in Derby; the pushed
        # predicate casts it back to a comparable VARCHAR
        p.extract_jdbc(
            jdbc_url,
            'SELECT "order_id", "amount", CAST("tag" AS VARCHAR(32)) AS "tag" '
            "FROM ORDERS_SRC WHERE CAST(\"tag\" AS VARCHAR(32)) = 'keep'",
            driver=DRIVER,
        )
        .transform("tag")
        .upper()
    )
    p.ignore("amount")
    p.load(sink)
    got = {(r["order_id"], r["tag"]) for r in sink.read().select("order_id", "tag").collect()}
    assert got == {(1, "KEEP"), (2, "KEEP")}
    assert p.last_load_metrics["rows_loaded"] == 2
