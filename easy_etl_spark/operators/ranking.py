"""Banded (range-partitioned) global ranking primitives.

``row_number() OVER (ORDER BY ...)`` with an empty PARTITION BY plans
as Sort -> Exchange SinglePartition: every row funnels through ONE
task — fine on a dimension-sized frame at sf0.1, fatal when the frame
is billions of rows at 100 TB. These helpers produce the identical
values with no single-partition stage, the same partition-offset
scheme as ``operators.packing.global_running_offset`` /
``sources.sinks.dense_ids``:

1. ``repartitionByRange`` on the rank key — Spark's RangePartitioner
   assigns globally ordered, non-overlapping key ranges to partitions
   (partition id order == global key order), rows stay distributed;
2. a numPartitions-row per-partition aggregate (count / max) is
   collected and prefix-scanned on the driver — bounded metadata, not
   data (the same collect contract as dense_ids);
3. each row combines its partition's offset (a broadcast literal map)
   with an intra-partition window PARTITIONED BY the partition id —
   embarrassingly parallel.

Correctness notes:
  - equal keys land in one partition (RangePartitioner binary-searches
    boundary values), so ties never straddle an offset boundary;
  - the range-partitioned frame is PINNED via an eager
    localCheckpoint (session.pin_frame) before the offsets pass. This
    is load-bearing, not an optimization: RangePartitioner's reservoir
    sampling is seeded by the physical RDD id, so two separate actions
    over an unpinned plan instantiate DIFFERENT boundaries whenever
    a partition holds more rows than the sample size — offsets from
    pass one would then misalign with pass two's partitions, yielding
    duplicate/skipped ranks (reproduced on a raw 15k-row scan; small
    aggregated frames only escape because the sampler takes every
    row). localCheckpoint materializes ONE instantiation and truncates
    lineage, so no later event — cache eviction, an intervening
    session.release_caches(), a re-plan — can ever re-draw the
    boundaries; the blocks are GC-reclaimed when the frame dies.

Reference parity: the reference delegates ranking wholesale to its
source database (easy_etl/README.md:18); these are the scale-path
equivalents of the SQL it would push down.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..session import pin_frame


def _banded(df: DataFrame, order_by: list[Column], num_partitions: int | None):
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    # pin_frame (eager localCheckpoint) is LOAD-BEARING: it materializes
    # ONE physical instantiation of the sampled range boundaries and
    # truncates lineage, so neither cache eviction nor a stray
    # release_caches() between the offsets pass and the consuming
    # action can re-draw boundaries (see module docstring)
    return pin_frame(
        df.repartitionByRange(num_partitions, *order_by).withColumn(
            "__pid", F.spark_partition_id()
        )
    )


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    *,
    out_col: str = "rn",
    num_partitions: int | None = None,
    with_total: bool = False,
):
    """Exact global ``row_number()`` in ``order_by`` order with no
    single-partition sort. Ties order arbitrarily within their key
    (exactly like the window form). With ``with_total=True`` returns
    ``(df, total_rows)`` — the row count falls out of the offsets pass
    for free (saves callers a second scan for ``count(*) OVER ()``)."""
    part = _banded(df, order_by, num_partitions)
    counts = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n")).collect()
    if not counts:
        out = df.withColumn(out_col, F.lit(None).cast("long"))
        return (out, 0) if with_total else out
    offsets: dict[int, int] = {}
    acc = 0
    # partition ids ARE in global rank order under range partitioning
    for r in sorted(counts, key=lambda r: r["__pid"]):
        offsets[r["__pid"]] = acc
        acc += r["__n"]
    off_map = F.create_map(
        *[lit for pid, o in offsets.items() for lit in (F.lit(pid), F.lit(o))]
    )
    w = Window.partitionBy("__pid").orderBy(*order_by)
    out = part.withColumn(
        out_col, (F.row_number().over(w) + off_map[F.col("__pid")]).cast("long")
    ).drop("__pid")
    return (out, acc) if with_total else out


def global_prior_max(
    df: DataFrame,
    val_col: str,
    order_by: list[Column],
    *,
    out_col: str = "prior_max",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive global running max — ``max(val) OVER (ORDER BY ...
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)`` — banded.
    NULL for the globally-first rows, exactly like the window form.
    The prefix-max across partitions is scanned on the driver from the
    numPartitions-row per-partition maxima."""
    part = _banded(df, order_by, num_partitions)
    stats = part.groupBy("__pid").agg(F.max(val_col).alias("__m")).collect()
    if not stats:
        return df.withColumn(out_col, F.lit(None))
    prior: dict[int, object] = {}
    acc = None
    for r in sorted(stats, key=lambda r: r["__pid"]):
        prior[r["__pid"]] = acc  # max over ALL earlier partitions
        m = r["__m"]
        if m is not None and (acc is None or m > acc):
            acc = m
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    intra = F.max(val_col).over(w)
    entries = [
        lit
        for pid, p in prior.items()
        if p is not None
        for lit in (F.lit(pid), F.lit(p))
    ]
    if entries:
        # greatest() skips NULLs: rows with no intra-partition
        # predecessor still see the cross-partition prefix max
        out = F.greatest(F.create_map(*entries)[F.col("__pid")], intra)
    else:
        out = intra
    return part.withColumn(out_col, out).drop("__pid")
