"""Wave-27 query catalog: corpus inequality measurement.

New operator family:
  - source_length_gini   Gini coefficient of document lengths per
                         source — the inequality index curators use to
                         spot sources whose token mass hides in a few
                         giant documents (a high-Gini source shrinks
                         dramatically under per-doc caps).

Hash-safety follows the catalog conventions (queries.py docstring):
the rank-weighted sum Σ(2i−n−1)·x_i is exact integers end to end; the
Gini itself is one double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import register
from .session import load_table


@register(
    "source_length_gini",
    """
    WITH t AS (
      SELECT source, doc_id, CAST(n_chars AS BIGINT) AS x FROM documents
    ),
    r AS (
      SELECT source, x,
             row_number() OVER (PARTITION BY source ORDER BY x, doc_id)
               AS i,
             count(*) OVER (PARTITION BY source) AS n
      FROM t
    ),
    s AS (
      SELECT source, max(n) AS n,
             CAST(sum(x) AS BIGINT) AS total,
             CAST(sum((2 * i - n - 1) * x) AS BIGINT) AS wsum
      FROM r GROUP BY source
    )
    SELECT source, n AS n_docs, total AS total_chars,
           round(CAST(wsum AS DOUBLE) / (CAST(n AS DOUBLE) * total), 6) + 0.0
             AS gini
    FROM s
    """,
)
def source_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document length per source (0 = all docs
    equal, ->1 = one giant doc holds everything): the inequality index
    that predicts how hard a source is hit by per-doc truncation or
    per-source caps, and the standard balance check before weighting a
    training mix. Computed from the exact rank form
    G = Σ(2i−n−1)·x_i / (n·Σx) — integer until the final division.

    Scale: the rank window partitions by source; one aggregate after.
    (Ties in x order by doc_id; any tie order yields the same sum —
    the weight Σ(2i−n−1) over a tied run is invariant.)"""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("source", "doc_id", F.col("n_chars").cast("bigint").alias("x"))
    ws = Window.partitionBy("source")
    r = t.select(
        "source",
        "x",
        F.row_number().over(ws.orderBy("x", "doc_id")).alias("i"),
        F.count(F.lit(1)).over(ws).alias("n"),
    )
    s = r.groupBy("source").agg(
        F.max("n").alias("n"),
        F.sum("x").alias("total"),
        F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("x")).alias("wsum"),
    )
    gini = F.col("wsum").cast("double") / (
        F.col("n").cast("double") * F.col("total")
    )
    return s.select(
        "source",
        F.col("n").alias("n_docs"),
        F.col("total").alias("total_chars"),
        (F.round(gini, 6) + F.lit(0.0)).alias("gini"),
    )
