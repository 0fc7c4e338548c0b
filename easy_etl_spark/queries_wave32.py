"""Wave-32 query catalog: lake file-health reporting.

New operator family:
  - file_health_report   rows per backing parquet file — the
                         small-file / skewed-file detector that decides
                         when ParquetSink.compact is worth running

Hash-safety follows the catalog conventions (queries.py docstring);
file identity is the basename (Spark reports file:// URIs, DuckDB
plain paths — the basename is the portable part).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register
from .session import load_table


@register("file_health_report")  # rows-only: the oracle views cannot
# surface DuckDB's filename pseudo-column; ground truth is pinned by a
# pyarrow footer replay in tests instead
def file_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lake health: rows per backing parquet file plus each file's
    balance factor (multiple of the mean file load) — the report that
    says when a table has degraded into small or skewed files and
    ParquetSink.compact should run. File identity via input_file_name()
    (metadata column, no extra scan work); rows-only in the gate — a
    SQL view cannot surface file identity — with the per-file counts
    pinned exactly against the parquet footers via pyarrow in tests.

    Scale: one map-side-combined aggregate keyed by file — exactly as
    many groups as files."""
    li = load_table(spark, sf_dir, "lineitem")
    per_file = (
        li.select(
            F.regexp_extract(F.input_file_name(), "[^/]+$", 0).alias("file_name")
        )
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    tot = per_file.agg(
        F.count(F.lit(1)).alias("n_files"), F.sum("n_rows").alias("total")
    )
    return per_file.crossJoin(F.broadcast(tot)).select(
        "file_name",
        "n_rows",
        F.round(
            F.col("n_rows").cast("double") * F.col("n_files") / F.col("total"), 4
        ).alias("balance_factor"),
    )
