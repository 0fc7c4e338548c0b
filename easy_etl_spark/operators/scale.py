"""Scale utilities: skew-salted joins and bucketed co-location.

These are the knobs a 100 TB deployment turns when AQE's automatic
skew splitting and broadcast thresholds aren't enough:

  - salted_join: explode a hot build-side key into `salt` replicas and
    scatter the probe side across them — turns one straggler partition
    into `salt` even ones. Use when one key holds >~1 partition of
    rows and the small side can afford `salt`× replication.
  - bucket_write / bucketed co-location: pre-shuffle both join sides
    into the same bucket layout once, so every subsequent join on the
    bucket key is shuffle-free (Spark reuses the bucketing as the
    required distribution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join resilient to a skewed `key` distribution on `big`.

    big rows get a random-but-deterministic salt in [0, salt); small
    rows are replicated across all salts. The join key becomes
    (key, salt), splitting each hot key's rows across `salt` reducers.
    Column set of the result matches big ⋈ small on `key`.

    Only inner/left/left_semi/left_anti are supported: the small side
    is replicated `salt` times, so any join type that emits unmatched
    SMALL-side rows (right/full outer) would emit each of them `salt`
    times.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti joins; got how={how!r} "
            "(the replicated small side would duplicate unmatched rows)"
        )
    salted_big = big.withColumn("__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)))
    replicated = small.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return salted_big.join(replicated, [key, "__salt"], how).drop("__salt")


def bucket_write(df: DataFrame, table: str, key: str, buckets: int = 32, sort: bool = True) -> None:
    """Persist `df` bucketed (and sorted) by the join key. Two tables
    written with the same (key, buckets) join with ZERO exchange —
    the shuffle is paid once at write time instead of per query."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def co_located_join(spark, left_table: str, right_table: str, key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables; with bucketing aligned Spark
    plans SortMergeJoin with no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def ensure_min_partitions(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the input has fewer partitions
    than the cluster has cores — a no-op on real multi-file datasets
    (where maxPartitionBytes already yields thousands of splits) but
    rescues per-row-heavy stages (n-gram explode, UDF batches) from a
    single-small-file local scan that would serialize them on one task.
    """
    spark = df.sparkSession
    if min_parts is None:
        min_parts = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= min_parts:
        return df
    return df.repartition(min_parts)
