"""Wave-16 query catalog: MMR diversity re-ranking.

New operator family:
  - mmr_rerank_topk   maximal-marginal-relevance re-ranking of the
                      exact kNN (applyInPandas greedy; the oracle
                      replays the greedy argmax UNROLLED step by step,
                      the same technique as pagerank's unrolled
                      recurrence)

Hash-safety follows the catalog conventions (queries.py docstring):
relevance is the pre-rounded cosine shared with knn_brute_force,
within-candidate similarities are the identical left-fold dot product
on both engines, and the MMR score is floor-quantized to micro-units.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import similarity
from .queries import register
from .session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _mmr_oracle_sql(k_out: int = 5) -> str:
    """Unrolled greedy MMR in DuckDB SQL: step k scores every
    unselected candidate as 0.5*rel - 0.5*greatest(sim to each prior
    pick) and takes the (score DESC, id) argmax."""
    head = """
    WITH v AS (
      SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS e FROM embeddings
    ),
    n AS (SELECT vec_id, e, sqrt(list_sum([x*x FOR x IN e])) AS nrm FROM v),
    q AS (SELECT * FROM n WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
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
    pair AS (
      SELECT t1.query_id, t1.neighbor_id AS a, t2.neighbor_id AS b,
             list_sum(list_zip(va.e, vb.e).apply(p -> p[1]*p[2]))
               / (va.nrm*vb.nrm) AS sim
      FROM top t1
      JOIN top t2 ON t1.query_id = t2.query_id AND t1.neighbor_id != t2.neighbor_id
      JOIN n va ON va.vec_id = t1.neighbor_id
      JOIN n vb ON vb.vec_id = t2.neighbor_id
    ),
    s1 AS (
      SELECT query_id, neighbor_id AS p1, cosine AS rel1,
             CAST(floor(0.5 * cosine * 1000000 + 0.5) AS BIGINT) AS u1
      FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS r
        FROM top
      ) WHERE r = 1
    )"""
    parts = [head]
    for k in range(2, k_out + 1):
        prior = ", ".join(f"s{j}" for j in range(1, k))
        sim_joins = "\n".join(
            f"      JOIN pair q{j} ON q{j}.query_id = top.query_id"
            f" AND q{j}.a = top.neighbor_id AND q{j}.b = s{j}.p{j}"
            for j in range(1, k)
        )
        on_query = "\n".join(
            f"        AND s{j}.query_id = top.query_id" for j in range(1, k)
        )
        not_in = " AND ".join(
            f"top.neighbor_id != s{j}.p{j}" for j in range(1, k)
        )
        maxsim = (
            f"greatest({', '.join(f'q{j}.sim' for j in range(1, k))})"
            if k > 2
            else "q1.sim"
        )
        parts.append(
            f""",
    c{k} AS (
      SELECT top.query_id, top.neighbor_id, top.cosine,
             0.5 * top.cosine - 0.5 * {maxsim} AS score
      FROM top, {prior}
{sim_joins}
      WHERE {not_in}
{on_query}
    ),
    s{k} AS (
      SELECT query_id, neighbor_id AS p{k}, cosine AS rel{k},
             CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS u{k}
      FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, neighbor_id) AS r
        FROM c{k}
      ) WHERE r = 1
    )"""
        )
    selects = "\n    UNION ALL ".join(
        f"SELECT query_id, CAST({k} AS BIGINT) AS pick_rank, p{k} AS neighbor_id,"
        f" rel{k} AS rel, u{k} AS mmr_units FROM s{k}"
        for k in range(1, k_out + 1)
    )
    return "".join(parts) + f"\n    {selects}"


@register("mmr_rerank_topk", _mmr_oracle_sql(5))
def mmr_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity re-ranking of the exact kNN with Maximal Marginal
    Relevance (lambda = 0.5, 10 candidates -> 5 picks) — the standard
    fix for retrieval result sets full of near-duplicates of the same
    answer. The greedy per-query loop runs in applyInPandas
    (operators/similarity.mmr_rerank — the custom-operator tier for
    logic Spark built-ins can't express); the oracle replays the same
    greedy UNROLLED, one CTE per pick.

    Scale: per-query work only — k_cand rows per group, partitioned by
    query_id; candidate generation is the swappable kNN front end."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return similarity.mmr_rerank(emb, queries_df, k_cand=10, k_out=5, lam=0.5)
