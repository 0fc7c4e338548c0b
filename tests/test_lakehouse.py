"""DeltaTableSink adapter: the TransactionalParquetSink contract on a
real Delta table. The full scenarios run only where delta-spark is
importable (skip-with-reason otherwise); the import guard itself is
always tested."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

HAVE_DELTA = True
try:  # pragma: no cover - environment probe
    import delta  # noqa: F401
except ImportError:
    HAVE_DELTA = False

needs_delta = pytest.mark.skipif(
    not HAVE_DELTA,
    reason="delta-spark not installed in this environment "
    "(adapter is import-guarded; contract tests activate when it is)",
)


def test_import_guard_raises_actionable_error(spark, tmp_path):
    if HAVE_DELTA:
        pytest.skip("delta-spark present: the guard cannot fire")
    from easy_etl_spark.sources.lakehouse import DeltaTableSink

    with pytest.raises(ImportError, match="delta-spark"):
        DeltaTableSink(spark, str(tmp_path / "t"))


def test_adapter_surface_matches_txn_sink():
    """Signature parity is the adapter's whole point: every public
    method of the parquet protocol sink must exist on the Delta
    adapter (vacuum's argument semantics differ by documented
    contract)."""
    import inspect

    from easy_etl_spark.sources import lakehouse, txn

    proto = {
        n
        for n, _ in inspect.getmembers(
            txn.TransactionalParquetSink, predicate=inspect.isfunction
        )
        if not n.startswith("_")
    }
    adapter = {
        n
        for n, _ in inspect.getmembers(
            lakehouse.DeltaTableSink, predicate=inspect.isfunction
        )
        if not n.startswith("_")
    }
    missing = proto - adapter
    assert not missing, f"adapter missing protocol methods: {missing}"


@needs_delta
def test_delta_append_upsert_time_travel(spark, tmp_path):
    from easy_etl_spark.sources.lakehouse import DeltaTableSink

    sink = DeltaTableSink(spark, str(tmp_path / "t"))
    assert sink.read() is None
    sink.append(spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")]))
    v1 = sink.current_version()
    sink.upsert(spark.createDataFrame([Row(k=2, v="B"), Row(k=3, v="c")]), keys=["k"])
    rows = {(r.k, r.v) for r in sink.read().collect()}
    assert rows == {(1, "a"), (2, "B"), (3, "c")}
    old = {(r.k, r.v) for r in sink.read(version=v1).collect()}
    assert old == {(1, "a"), (2, "b")}
    ids_now = {r.k: r.id for r in sink.read().collect()}
    ids_old = {r.k: r.id for r in sink.read(version=v1).collect()}
    assert ids_now[2] == ids_old[2]  # matched key kept its surrogate id


@needs_delta
def test_delta_delete_where_and_compact(spark, tmp_path):
    from easy_etl_spark.sources.lakehouse import DeltaTableSink

    sink = DeltaTableSink(spark, str(tmp_path / "t"))
    sink.append(spark.createDataFrame([Row(k=1, tag="pii"), Row(k=2, tag="ok")]))
    sink.delete_where("tag = 'pii'")
    assert [r.k for r in sink.read().collect()] == [2]
    sink.compact()
    assert [r.k for r in sink.read().collect()] == [2]
