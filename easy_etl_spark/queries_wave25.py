"""Wave-25 query catalog: epoch shuffling and orphan routing.

New operator families:
  - epoch_shuffle_plan   deterministic per-epoch training order
                         (md5(epoch, doc) sort keys — reproducible
                         multi-epoch data loading)
  - orphan_routing       FK-violation quarantine split (clean rows
                         load, orphans route to a dead-letter frame)

Hash-safety follows the catalog conventions (queries.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register
from .session import load_table


@register(
    "epoch_shuffle_plan",
    """
    WITH keyed AS (
      SELECT e.epoch, doc_id,
             ('0x' || substr(md5(CAST(e.epoch AS VARCHAR) || ':' ||
                                 CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS k
      FROM documents, (SELECT unnest(generate_series(0, 2)) AS epoch) e
    ),
    firsts AS (
      SELECT epoch, doc_id, k FROM (
        SELECT *, row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id) AS r
        FROM keyed
      ) WHERE r <= 5
    )
    SELECT keyed.epoch AS epoch, count(*) AS n_docs,
           CAST(sum(k) AS BIGINT) AS key_checksum,
           (SELECT md5(string_agg(CAST(f.doc_id AS VARCHAR), ','
                                  ORDER BY f.k, f.doc_id))
            FROM firsts f WHERE f.epoch = keyed.epoch) AS head_fp
    FROM keyed GROUP BY keyed.epoch
    """,
)
def epoch_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multi-epoch shuffle plan: epoch e orders the
    corpus by the 32-bit md5(e, doc_id) key (32 bits keeps the exact
    key_checksum inside BIGINT even at billions of docs) — a different
    but perfectly reproducible
    permutation per epoch, recomputable from ids alone on any engine /
    run / partitioning (rand()-seeded shuffles are none of those, and
    an irreproducible data order makes training runs uncomparable).
    Emits per-epoch doc counts, the exact key checksum, and the md5
    fingerprint of the first five docs in epoch order.

    Scale: the sort key is a per-row hash; the training loader sorts
    within range partitions of k (a repartitionByRange write), never
    globally — here only the 5-row head per epoch is ranked, via a
    per-epoch-partitioned window."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("epoch"),
    ).select(
        "epoch",
        "doc_id",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("epoch"), F.col("doc_id"))), 1, 8
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("k"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("epoch").orderBy("k", "doc_id")
    firsts = (
        keyed.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 5)
        .groupBy("epoch")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("k", "doc_id"))
                        ),
                        lambda s: s["doc_id"].cast("string"),
                    ),
                )
            ).alias("head_fp")
        )
    )
    sums = keyed.groupBy("epoch").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("k").alias("key_checksum")
    )
    return sums.join(firsts, "epoch").select(
        F.col("epoch").cast("bigint").alias("epoch"),
        "n_docs",
        "key_checksum",
        "head_fp",
    )


@register(
    "orphan_routing",
    """
    WITH routed AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_custkey IS NOT NULL
                       AND o_custkey IN (SELECT c_custkey FROM customer
                                         WHERE c_custkey % 97 <> 0)
                  THEN 'clean' ELSE 'quarantine' END AS route
      FROM orders
    )
    SELECT route, count(*) AS n_rows,
           CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
    FROM routed GROUP BY route
    """,
)
def orphan_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter routing: orders whose customer FK resolves load as
    'clean'; NULL or unmatched keys route to 'quarantine' instead of
    silently joining away or poisoning the load — the ETL pattern that
    keeps referential breakage visible and replayable (every c_custkey
    divisible by 97 stands in for a purged parent row — the exact
    aftermath of a delete_where GDPR purge). Emits per-route counts
    plus an order-key checksum pinning EXACTLY which rows took each
    path.

    Scale: one broadcast(ish) semi-join against the parent key set and
    a 2-group rollup; the routed frames would each feed their own sink
    (clean -> fact table, quarantine -> replay queue)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    keys = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 97 != 0)
        .select(F.col("c_custkey").alias("o_custkey"))
        .distinct()
    )
    matched = o.join(F.broadcast(keys), "o_custkey", "left_semi")
    clean_ids = matched.select("o_orderkey")
    # route via semi/anti against the matched set (null-safe: NULL FKs
    # never match the semi-join, so they quarantine)
    quarantine = o.join(clean_ids, "o_orderkey", "left_anti")
    clean = o.join(clean_ids, "o_orderkey", "left_semi")
    c = clean.agg(
        F.lit("clean").alias("route"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").alias("key_checksum"),
    )
    q = quarantine.agg(
        F.lit("quarantine").alias("route"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").alias("key_checksum"),
    )
    return c.unionAll(q)
