"""Wave-18 query catalog: multivariate statistics at scale.

New operator family:
  - embedding_covariance   exact sample covariance matrix of the
                           embedding dimensions (numpy partial-matmul
                           per Arrow batch + integer merge — the
                           building block of PCA/whitening)

Hash-safety follows the catalog conventions (queries.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.similarity import covariance_partials
from .queries import register
from .session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "embedding_covariance",
    """
    WITH dims AS (
      SELECT unnest(range(1, (SELECT CAST(max(len(embedding)) + 1 AS BIGINT)
                              FROM embeddings))) AS d
    ),
    ex AS (
      SELECT vec_id, d,
             CAST(floor(CAST(embedding[d] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS xq
      FROM embeddings CROSS JOIN dims
    ),
    sx AS (SELECT d, CAST(sum(xq) AS BIGINT) AS s FROM ex GROUP BY d),
    tot AS (SELECT count(*) AS n FROM embeddings),
    sxy AS (
      SELECT a.d AS d1, b.d AS d2, CAST(sum(a.xq * b.xq) AS BIGINT) AS sxy
      FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.d <= b.d
      GROUP BY 1, 2
    )
    SELECT d1 - 1 AS dim1, d2 - 1 AS dim2, tot.n AS n,
           round(CAST(tot.n * sxy - sa.s * sb.s AS DOUBLE)
                 / (CAST(tot.n AS DOUBLE) * (tot.n - 1)) / 1000000.0, 6) + 0.0
             AS cov
    FROM sxy
    JOIN sx sa ON sa.d = sxy.d1
    JOIN sx sb ON sb.d = sxy.d2, tot
    """,
)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact sample covariance matrix of the embedding dimensions
    (upper triangle) — the input to PCA, whitening, and Mahalanobis
    scoring. Cross-moments are exact integer sums: each Arrow batch
    contributes one int64 X^T X matmul (operators/similarity.
    covariance_partials) and the d² partial cells merge by integer
    addition, so the matrix is bit-identical under any partitioning;
    sample covariance (n·Sxy − Sx·Sy)/(n(n−1)) is one double
    expression per cell.

    Scale: one linear pass over the vectors; the shuffle carries
    (#batches × d²) partial rows — independent of corpus size per
    batch — and per-dim sums ride a cheap posexplode aggregate. The
    DuckDB oracle replays the same integers via a dimension
    self-join."""
    emb = _t(spark, sf_dir, "embeddings")
    partials = covariance_partials(emb)
    sxy = partials.groupBy("d1", "d2").agg(F.sum("sxy").alias("sxy"))
    ex = emb.select(F.posexplode("embedding").alias("d", "xv")).select(
        "d",
        F.floor(F.col("xv").cast("double") * 1000 + F.lit(0.5))
        .cast("bigint")
        .alias("xq"),
    )
    sx = ex.groupBy("d").agg(F.sum("xq").alias("s"))
    tot = emb.agg(F.count(F.lit(1)).alias("n"))
    sa = sx.select(F.col("d").alias("d1"), F.col("s").alias("s1"))
    sb = sx.select(F.col("d").alias("d2"), F.col("s").alias("s2"))
    cov = (
        F.col("n") * F.col("sxy") - F.col("s1") * F.col("s2")
    ).cast("double") / (F.col("n").cast("double") * (F.col("n") - 1)) / F.lit(
        1000000.0
    )
    return (
        sxy.join(F.broadcast(sa), "d1")
        .join(F.broadcast(sb), "d2")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("d1").cast("bigint").alias("dim1"),
            F.col("d2").cast("bigint").alias("dim2"),
            "n",
            (F.round(cov, 6) + F.lit(0.0)).alias("cov"),  # +0.0: -0.0 -> 0.0 both engines
        )
    )


@register("pca_project_2d")  # rows-only: eigendecomposition has no SQL replay
def pca_project_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D PCA projection of the embedding corpus (dimensionality
    reduction for visualization / cheap indexing): components come
    from the exact integer covariance, eigen-factorized once on the
    driver and sign-canonicalized, then broadcast into a linear
    mapInPandas projection pass. Rows-only in the gate (DuckDB cannot
    replay an eigendecomposition); determinism and correctness are
    pinned by the numpy-replay pytest instead."""
    from .operators.similarity import pca_project

    emb = _t(spark, sf_dir, "embeddings")
    return pca_project(emb, k=2)
