"""Warehouse dimension builders — the Kimball star-schema toolkit the
reference's domain implies (easy-etl builds "data cubes",
easy_etl/README.md:5,98: links resolve dimension surrogate keys; a date
dimension is the canonical dimension every such cube joins).

  - date_dimension: generate the calendar table spanning a fact
    column's range, with the standard attribute set. Built from
    sequence()/explode — one row per day, no driver loop, no UDF;
    the span comes from one bounded min/max aggregate.
  - zorder_key / ZORDER clustering: interleave the bits of two
    integer columns so range predicates on EITHER column cluster into
    few row groups — the multi-dimensional generalization of
    ParquetSink(cluster_by=...)'s 1-D sort. Pure integer Column
    algebra, bit-identical on any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def date_dimension(facts: DataFrame, date_col: str) -> DataFrame:
    """Calendar dimension spanning [min(date_col), max(date_col)]:
    date_key (yyyymmdd int), year / quarter / month / day, iso day of
    week, week of year, month name, weekend flag, and first/last-of-
    month markers.

    Shape: ONE min/max aggregate over the fact column (map-side
    partial, two scalars), then sequence() + explode on a single row —
    the driver never materializes the calendar, and a 100 TB fact
    table contributes only its pruned date column to the aggregate.
    """
    span = facts.agg(
        F.to_date(F.min(date_col)).alias("d0"), F.to_date(F.max(date_col)).alias("d1")
    )
    days = span.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("d")
    )
    dow = F.dayofweek("d")  # 1=Sunday … 7=Saturday
    iso_dow = ((dow + 5) % 7) + 1  # 1=Monday … 7=Sunday
    return days.select(
        (F.year("d") * 10000 + F.month("d") * 100 + F.dayofmonth("d")).alias("date_key"),
        F.col("d").alias("date"),
        F.year("d").alias("year"),
        F.quarter("d").alias("quarter"),
        F.month("d").alias("month"),
        F.dayofmonth("d").alias("day"),
        iso_dow.alias("iso_dow"),
        F.weekofyear("d").alias("week_of_year"),
        F.date_format("d", "MMMM").alias("month_name"),
        iso_dow.isin(6, 7).alias("is_weekend"),
        (F.dayofmonth("d") == 1).alias("is_month_start"),
        (F.col("d") == F.last_day("d")).alias("is_month_end"),
    )


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of two
    non-negative integer columns — a's bit i lands at position 2i+1,
    b's at 2i, so sorting by the key clusters BOTH dimensions at once
    and min/max row-group stats prune range predicates on either.
    Pure shift/mask integer algebra (codegen'd, engine-portable)."""
    a, b = a.cast("long"), b.cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (
            out
            + (F.shiftright(a, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1)))
            + (F.shiftright(b, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i)))
        )
    return out


def zorder_cluster(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16, num_files: int | None = None
) -> DataFrame:
    """Repartition-by-range + sort on the Morton key of (col_a, col_b):
    the write-side layout pass before a ParquetSink append, so both
    columns' min/max file statistics become selective. The range
    exchange samples the key distribution — no driver collect.
    ``num_files`` pins the output partition count (else the range
    partitioner / AQE chooses; tiny frames coalesce to one file)."""
    keyed = df.withColumn("__z", zorder_key(F.col(col_a), F.col(col_b), bits))
    parts = [num_files] if num_files else []
    return (
        keyed.repartitionByRange(*parts, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
