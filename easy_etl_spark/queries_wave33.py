"""Wave-33 query catalog: ANN fidelity evaluation.

New operator family:
  - ann_recall_at_10   recall@10 of the integer-exact LSH retrieval
                       against the integer-exact brute force — the ANN
                       quality gate (NDCG judges label relevance; this
                       judges how faithful the INDEX is to exact
                       search), fully oracle-checked because both
                       retrievals are engine-portable integer math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import similarity
from .operators.similarity import _d2_int, qvec
from .queries import register
from .queries_ext import _PAIR_D2, _QV, _SIGN
from .session import load_table


def _recall_oracle(n_planes: int = 8, k: int = 10) -> str:
    bucket = "\n           + ".join(
        f"CASE WHEN list_sum(list_transform(q, (x, i) -> x * {_SIGN.format(p=p)})) >= 0"
        f" THEN {1 << p} ELSE 0 END"
        for p in range(n_planes)
    )
    return f"""
    WITH v AS (SELECT vec_id, {_QV} AS q FROM embeddings),
    b AS (
      SELECT vec_id, q,
           {bucket} AS bucket
      FROM v
    ),
    lsh AS (
      SELECT query_id, neighbor_id FROM (
        SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY qs.vec_id
                 ORDER BY {_PAIR_D2.format(a="qs.q", b="c.q")}, c.vec_id) AS rnk
        FROM (SELECT * FROM b WHERE vec_id < 5) qs
        JOIN b c ON c.bucket = qs.bucket AND c.vec_id != qs.vec_id
      ) WHERE rnk <= {k}
    ),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY qs.vec_id
                 ORDER BY {_PAIR_D2.format(a="qs.q", b="c.q")}, c.vec_id) AS rnk
        FROM (SELECT * FROM v WHERE vec_id < 5) qs
        JOIN v c ON c.vec_id != qs.vec_id
      ) WHERE rnk <= {k}
    )
    SELECT e.query_id, CAST({k} AS BIGINT) AS k,
           CAST(sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit,
           round(sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 / {k}.0, 4) AS recall
    FROM exact e LEFT JOIN lsh l
      ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """


@register("ann_recall_at_10", _recall_oracle())
def ann_recall_at_10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN fidelity gate: recall@10 of the integer-exact LSH retrieval
    (similarity.int_lsh_neighbors) against the integer-exact brute
    force over the same quantized vectors — how much of the TRUE top-10
    the index surfaces. NDCG evaluates relevance of results; recall@k
    evaluates the index itself, and because both retrievals are
    engine-portable integer math the whole evaluation is value-hash
    oracle-checked (most ANN benchmarks can only sample-audit this).

    Scale: exact search is the intentionally-quadratic verifier run on
    the 5-query panel; the LSH side is the production path. The recall
    join touches |queries| x k rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    k = 10
    lsh = similarity.int_lsh_neighbors(emb, queries_df, k=k).select(
        "query_id", "neighbor_id"
    )
    corpus = emb.select(F.col("vec_id").alias("__id"), qvec(F.col("embedding")).alias("__q"))
    q = queries_df.select(
        F.col("vec_id").alias("query_id"), qvec(F.col("embedding")).alias("__qq")
    )
    scored = (
        corpus.join(F.broadcast(q), F.col("query_id") != F.col("__id"))
        .select(
            "query_id",
            F.col("__id").alias("neighbor_id"),
            _d2_int(F.col("__qq"), F.col("__q")).alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    exact = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id")
    )
    hit = lsh.withColumn("__hit", F.lit(1))
    joined = exact.join(hit, ["query_id", "neighbor_id"], "left")
    return joined.groupBy("query_id").agg(
        F.lit(k).cast("bigint").alias("k"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hit"),
        F.round(
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))) / F.lit(float(k)), 4
        ).alias("recall"),
    )
