"""Data-quality profiling: per-column row/null/distinct counts in ONE
pass over the table.

The reference's implicit contract surfaces schema drift only when a
load breaks (easy_etl/__init__.py:113-117 drop-sync); a profiling pass
is how a 100 TB pipeline notices drift *before* loading. One job, one
scan: all metrics ride a single aggregate, then unpivot to a long
(col_name, n_rows, n_null, n_distinct) frame driver-side-free.

Scale note: ``exact=True`` uses COUNT(DISTINCT col) for N columns,
which Spark plans as an Expand (×N rows through the shuffle) — fine
for audits, expensive as a standing job. ``exact=False`` switches to
``approx_count_distinct`` (HLL++): plain aggregates, no Expand, one
map-side-combined shuffle regardless of N — the always-on profile at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str], *, exact: bool = True) -> DataFrame:
    distinct = (
        (lambda c: F.count_distinct(F.col(c))) if exact
        else (lambda c: F.approx_count_distinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
        aggs.append(distinct(c).alias(f"__dist_{c}"))
    wide = df.agg(*aggs)
    stack = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.col("__n").alias("n_rows"),
                    F.col(f"__null_{c}").alias("n_null"),
                    F.col(f"__dist_{c}").alias("n_distinct"),
                )
                for c in cols
            ]
        )
    ).alias("p")
    return wide.select(stack).select("p.col_name", "p.n_rows", "p.n_null", "p.n_distinct")
