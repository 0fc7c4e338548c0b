"""Wave-30 query catalog: fixed-size weighted sampling.

New operator family:
  - priority_sample   sequential Poisson ("priority") sampling
                      (Ohlsson): a FIXED-SIZE weighted sample without
                      replacement — the complement of the Bernoulli
                      weighted sampler (weighted_doc_sample), whose
                      output size is only expected, not exact.

Hash-safety follows the catalog conventions (queries.py docstring):
the uniform comes from the portable md5 hash, the priority u/w is one
deterministic double division, and the top-k ranks with a doc-id
tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import register
from .session import load_table

K = 50
#: md5_uniform modulus — large so priority ties are hash collisions only
M = 1_000_000_007


@register(
    "priority_sample",
    f"""
    WITH pri AS (
      SELECT doc_id, source, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                  % {M} AS DOUBLE) / n_chars AS priority
      FROM documents WHERE n_chars > 0
    )
    , topk AS (
      SELECT * FROM pri ORDER BY priority, doc_id LIMIT {K}
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
           round(priority, 6) AS priority,
           CAST(row_number() OVER (ORDER BY priority, doc_id) AS BIGINT) AS rnk
    FROM topk
    """,
)
def priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential Poisson / priority sampling (Ohlsson): every doc gets
    priority u/w (u = portable md5 uniform, w = its length weight) and
    the K smallest priorities form a fixed-size weighted sample without
    replacement — heavier docs sample more often, the sample size is
    EXACTLY K (the Bernoulli sampler's is only K in expectation), and
    the whole draw replays from ids alone on any engine or run.

    Scale: priority is a per-row map; the top-K is ORDER BY + LIMIT,
    which compiles to TakeOrderedAndProject (per-partition heaps merged
    on the driver — plan-gated); only the K survivors see the final
    rank window. (The first cut ranked the full corpus with a global
    row_number — a real scale hazard the plan gates caught.)"""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        ),
        F.lit(M),
    )
    pri = docs.select(
        "doc_id",
        "source",
        "n_chars",
        (u.cast("double") / F.col("n_chars")).alias("priority"),
    )
    topk = pri.orderBy("priority", "doc_id").limit(K)
    w = Window.orderBy("priority", "doc_id")
    return (
        topk.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("weight"),
            F.round("priority", 6).alias("priority"),
            "rnk",
        )
    )
