"""Wave-14 query catalog: retrieval-quality evaluation and embedding
drift monitoring.

New operator families:
  - ndcg_retrieval_eval   NDCG@10 of the exact kNN retrieval against
                          label relevance (integer-quantized discounts)
  - embedding_drift       per-label centroid shift between two cohorts
                          (the ML-ops drift monitor)

Hash-safety follows the catalog conventions (queries.py docstring).
The log2 discount is spelled ln(x)/ln(2) on BOTH engines — Spark's
log2() and DuckDB's log2() are different library calls, but the
explicit ln-quotient is the same IEEE computation everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import similarity
from .queries import register
from .session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------
# Retrieval evaluation: NDCG@10 of exact kNN vs label relevance
# ----------------------------------------------------------------------

@register(
    "ndcg_retrieval_eval",
    """
    WITH v AS (
      SELECT vec_id, label, [CAST(x AS DOUBLE) FOR x IN embedding] AS e
      FROM embeddings
    ),
    n AS (SELECT vec_id, label, e, sqrt(list_sum([x*x FOR x IN e])) AS nrm FROM v),
    q AS (SELECT * FROM n WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS qlabel,
             c.vec_id AS neighbor_id, c.label AS nlabel,
             round(list_sum(list_zip(q.e, c.e).apply(p -> p[1]*p[2]))
                   / (q.nrm*c.nrm), 6) AS cosine
      FROM q JOIN n c ON c.vec_id != q.vec_id
    ),
    top AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM scored
      ) WHERE rnk <= 10
    ),
    dcg AS (
      SELECT query_id,
             CAST(sum(CASE WHEN qlabel = nlabel THEN
               CAST(floor(1000000.0 / (ln(rnk + 1) / ln(2)) + 0.5) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS dcg_units
      FROM top GROUP BY query_id
    ),
    corpus AS (SELECT label, count(*) AS cnt FROM v GROUP BY label),
    nrel AS (
      SELECT q.vec_id AS query_id, corpus.cnt - 1 AS n_rel
      FROM q JOIN corpus ON corpus.label = q.label
    ),
    ideal AS (
      SELECT query_id, n_rel,
             CAST(sum(CAST(floor(1000000.0 / (ln(i + 1) / ln(2)) + 0.5) AS BIGINT))
                  AS BIGINT) AS idcg_units
      FROM nrel, UNNEST(generate_series(1, 10)) AS g(i)
      WHERE i <= n_rel
      GROUP BY query_id, n_rel
    )
    SELECT dcg.query_id, CAST(n_rel AS BIGINT) AS n_rel, dcg_units, idcg_units,
           round(CAST(dcg_units AS DOUBLE) / idcg_units, 6) AS ndcg
    FROM dcg JOIN ideal USING (query_id)
    """,
)
def ndcg_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation: NDCG@10 of the exact cosine kNN
    (same ranking as knn_brute_force) where a neighbor is relevant iff
    it shares the query's label. Per-rank discounts 1/log2(rank+1) are
    quantized to micro-units BEFORE summing, so DCG/IDCG are exact
    integers and the one double division at the end is deterministic.
    The ideal DCG uses min(k, #relevant-in-corpus) ranks — textbook
    NDCG, not the top-k-only shortcut.

    Scale: rides brute_force_topk (the intentionally-exact verifier);
    evaluating an ANN variant swaps one input. Label counts and the
    query frame broadcast; everything downstream of the kNN is
    |queries| x k rows."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    top = similarity.brute_force_topk(emb, queries_df, k=10)
    qlab = queries_df.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    nlab = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel")
    )
    discount = lambda rank: (  # noqa: E731 — shared spelling, see module doc
        F.floor(
            F.lit(1000000.0) / (F.log(rank + 1) / F.log(F.lit(2.0))) + F.lit(0.5)
        ).cast("bigint")
    )
    rel = top.join(F.broadcast(qlab), "query_id").join(nlab, "neighbor_id")
    dcg = rel.groupBy("query_id").agg(
        F.sum(
            F.when(F.col("qlabel") == F.col("nlabel"), discount(F.col("rnk"))).otherwise(
                F.lit(0)
            )
        ).alias("dcg_units")
    )
    corpus = emb.groupBy("label").agg(F.count(F.lit(1)).alias("cnt"))
    nrel = qlab.join(
        F.broadcast(corpus), qlab.qlabel == corpus.label
    ).select("query_id", (F.col("cnt") - 1).alias("n_rel"))
    ideal = (
        nrel.select(
            "query_id", "n_rel", F.explode(F.sequence(F.lit(1), F.lit(10))).alias("i")
        )
        .filter(F.col("i") <= F.col("n_rel"))
        .groupBy("query_id", "n_rel")
        .agg(F.sum(discount(F.col("i"))).alias("idcg_units"))
    )
    return dcg.join(ideal, "query_id").select(
        "query_id",
        F.col("n_rel").cast("bigint").alias("n_rel"),
        "dcg_units",
        "idcg_units",
        F.round(F.col("dcg_units").cast("double") / F.col("idcg_units"), 6).alias(
            "ndcg"
        ),
    )


# ----------------------------------------------------------------------
# Drift monitoring: per-label centroid shift between two cohorts
# ----------------------------------------------------------------------

@register(
    "embedding_drift",
    """
    WITH dims AS (
      SELECT unnest(range(1, (SELECT CAST(max(len(embedding)) + 1 AS BIGINT)
                              FROM embeddings))) AS d
    ),
    ex AS (
      SELECT label, vec_id % 2 AS half, d,
             CAST(floor(CAST(embedding[d] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
               AS xq
      FROM embeddings CROSS JOIN dims
    ),
    cents AS (
      SELECT label, half, d,
             CAST(floor(CAST(sum(xq) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS c,
             count(*) AS nv
      FROM ex GROUP BY 1, 2, 3
    ),
    paired AS (
      SELECT a.label, a.d, a.c AS c0, b.c AS c1, a.nv AS nv0, b.nv AS nv1
      FROM cents a JOIN cents b
        ON a.label = b.label AND a.d = b.d AND a.half = 0 AND b.half = 1
    )
    SELECT label,
           CAST(min(nv0) AS BIGINT) AS n_even,
           CAST(min(nv1) AS BIGINT) AS n_odd,
           CAST(sum((c0 - c1) * (c0 - c1)) AS BIGINT) AS shift2_units,
           round(sqrt(CAST(sum((c0 - c1) * (c0 - c1)) AS BIGINT)) / 1000000.0, 6)
             AS drift_l2
    FROM paired GROUP BY label
    """,
)
def embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift monitor: per-label L2 distance between the
    centroids of two cohorts (even vs odd vec_id — stand-ins for
    last-week vs this-week batches). The production alarm for "the
    upstream encoder changed" / "the data distribution moved":
    centroids are exact micro-unit integers, the squared shift is an
    exact bigint, and the single sqrt is correctly-rounded IEEE on
    both engines.

    Scale: one aggregate to |labels| x 2 x dims centroids, one
    self-pair join on that tiny frame — the fact-sized work is the
    same single exploded pass as label_centroids."""
    emb = _t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("d", "xv"),
    ).select(
        "label",
        "half",
        "d",
        F.floor(F.col("xv").cast("double") * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("xq"),
    )
    cents = ex.groupBy("label", "half", "d").agg(
        F.floor(F.sum("xq").cast("double") / F.count(F.lit(1)) + F.lit(0.5))
        .cast("bigint")
        .alias("c"),
        F.count(F.lit(1)).alias("nv"),
    )
    a = cents.filter(F.col("half") == 0).select(
        "label", "d", F.col("c").alias("c0"), F.col("nv").alias("nv0")
    )
    b = cents.filter(F.col("half") == 1).select(
        "label", "d", F.col("c").alias("c1"), F.col("nv").alias("nv1")
    )
    paired = a.join(b, ["label", "d"])
    shift2 = F.sum((F.col("c0") - F.col("c1")) * (F.col("c0") - F.col("c1")))
    return paired.groupBy("label").agg(
        F.min("nv0").cast("bigint").alias("n_even"),
        F.min("nv1").cast("bigint").alias("n_odd"),
        shift2.alias("shift2_units"),
        F.round(F.sqrt(shift2) / F.lit(1000000.0), 6).alias("drift_l2"),
    )
