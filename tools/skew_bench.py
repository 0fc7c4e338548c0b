"""Skew-stress evidence for operators/scale.salted_join.

Builds the engineered hot-key dataset (70% of lineitem remapped onto
one supplier key — the skew_salted_join_hot catalog query's rule) and
times the join+aggregate three ways at $SPARK_GRAFT_SF_DIR:

  aqe_default : plain shuffle join, broadcast disabled, AQE skew-split
                ON — what stock Spark does about the straggler.
  straggler   : plain shuffle join, broadcast disabled, AQE skew-split
                OFF — the pre-AQE single-hot-reducer baseline. This is
                the regime salting exists for: big x big joins where
                the dim cannot broadcast and the engine has no runtime
                re-plan (or the skew survives AQE's split because it
                sits in a single huge map output).
  salted      : operators/scale.salted_join (salt=16) under the same
                disabled-guards config — the hot key scatters across
                16 reducers by construction.

Broadcast is disabled in ALL variants: at this SF supplier would
broadcast and no variant would shuffle, which is precisely the
first-line answer at 100 TB too — salting is the fallback when the
build side is itself too big. Prints one JSON line; BASELINE.md
records the straggler/salted ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from easy_etl_spark.operators.scale import salted_join
from easy_etl_spark.session import get_spark, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: probe-side amplification: sf0.1's hot key holds ~420k rows — small
#: enough that one reducer shrugs it off. x8 puts ~3.4M rows on the hot
#: key, and the post-join per-row fingerprint (sha2 — standing in for
#: the feature/fingerprint work real pipelines do after a join) makes
#: reducer time proportional to reducer rows, so the straggler regime
#: local[32] is simulating (one reducer owning most of a 100 TB
#: shuffle) actually shows up in wall time.
REPLICATE = int(os.environ.get("SKEW_BENCH_REPLICATE", "8"))


def _materialize_hot(spark, path: str) -> None:
    """Stage the amplified hot-key probe table ONCE with real scan
    parallelism (64 files), so every timed variant measures the
    shuffle+reduce, not a 3-split parquet scan."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        F.when(F.col("l_orderkey") % 10 < 7, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .alias("s_suppkey"),
        "l_extendedprice",
        "l_discount",
    )
    li = li.withColumn(
        "__r", F.explode(F.array(*[F.lit(i) for i in range(REPLICATE)]))
    ).drop("__r")
    li.repartition(64).write.mode("overwrite").parquet(path)


def _agg(joined):
    # post-join per-row fingerprint: the reduce-side work whose
    # serialization on one hot task IS the skew problem
    fp = F.sha2(
        F.concat_ws("|", "s_name", "l_extendedprice", "l_discount"), 256
    )
    return joined.groupBy("s_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.max(fp).alias("fp_max"),
    )


def _run(spark, hot_path: str, salted: bool) -> float:
    li = spark.read.parquet(hot_path)
    sup = load_table(spark, SF_DIR, "supplier").select("s_suppkey", "s_name")
    joined = (
        salted_join(li, sup, key="s_suppkey", salt=16)
        if salted
        else li.join(sup, "s_suppkey")
    )
    t0 = time.perf_counter()
    _agg(joined).write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    import tempfile

    spark = get_spark("skew-bench")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    hot_path = os.path.join(tempfile.mkdtemp(prefix="skew_bench_"), "hot")
    _materialize_hot(spark, hot_path)
    # warmup (codegen/scan caches)
    _run(spark, hot_path, salted=False)

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    aqe_default = _run(spark, hot_path, salted=False)

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    straggler = _run(spark, hot_path, salted=False)
    salted = _run(spark, hot_path, salted=True)

    # restore defaults for anyone reusing the session
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    print(
        json.dumps(
            {
                "metric": "skew_hot_key_join_seconds",
                "sf_dir": SF_DIR,
                "aqe_default": aqe_default,
                "straggler": straggler,
                "salted": salted,
                "straggler_over_salted": round(straggler / salted, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
