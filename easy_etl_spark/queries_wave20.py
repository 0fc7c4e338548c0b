"""Wave-20 query catalog: RAG context assembly.

New operator family:
  - rag_context_assembly   top-k retrieval -> token-budgeted context
                           concatenation (the serving-side sibling of
                           sequence packing)

Hash-safety follows the catalog conventions (queries.py docstring);
the assembled context is emitted as an md5 fingerprint plus exact
token counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import similarity
from .operators.textops import tokens
from .queries import register
from .session import load_table

BUDGET = 64


@register(
    "rag_context_assembly",
    f"""
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
      ) WHERE rnk <= 3
    ),
    toks AS (
      SELECT top.query_id, top.rnk, string_split(trim(d.text), ' ') AS t
      FROM top JOIN documents d ON d.doc_id = top.neighbor_id
    ),
    budgeted AS (
      SELECT query_id, rnk, t,
             CAST(len(t) AS BIGINT) AS n_tok,
             CAST(sum(len(t)) OVER (PARTITION BY query_id ORDER BY rnk)
                  AS BIGINT) AS cum
      FROM toks
    ),
    sliced AS (
      SELECT query_id, rnk,
             CAST(least(greatest({BUDGET} - (cum - n_tok), 0), n_tok) AS BIGINT)
               AS take_n,
             array_to_string(list_slice(t, 1,
               CAST(least(greatest({BUDGET} - (cum - n_tok), 0), n_tok) AS BIGINT)),
               ' ') AS piece
      FROM budgeted
    )
    SELECT query_id,
           CAST(sum(CASE WHEN take_n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_used,
           CAST(sum(take_n) AS BIGINT) AS n_tokens,
           md5(string_agg(piece, ' ' ORDER BY rnk) FILTER (WHERE take_n > 0))
             AS context_fp
    FROM sliced GROUP BY query_id
    """,
)
def rag_context_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG context assembly: for each query vector, retrieve the top-3
    documents (exact cosine, the swappable ANN slot) and concatenate
    their text in rank order under a 64-token budget, truncating the
    document that crosses it — the serving-side sibling of
    sequence_packing's training-side concat-and-split. Emits docs-used
    and token counts plus the md5 fingerprint of the assembled context
    (content-checked without shipping the strings).

    Scale: retrieval is the broadcast-scan kNN; the assembly touches
    k rows per query with a query-partitioned cumulative window and a
    deterministic sort_array re-assembly."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    queries_df = emb.filter(F.col("vec_id") < 5)
    top = similarity.brute_force_topk(emb, queries_df, k=3).select(
        "query_id", "neighbor_id", "rnk"
    )
    toks = top.join(
        docs.select(F.col("doc_id").alias("neighbor_id"), "text"), "neighbor_id"
    ).select("query_id", "rnk", tokens(F.col("text")).alias("t"))
    w = Window.partitionBy("query_id").orderBy("rnk")
    budgeted = toks.select(
        "query_id",
        "rnk",
        "t",
        F.size("t").cast("bigint").alias("n_tok"),
        F.sum(F.size("t")).over(w).cast("bigint").alias("cum"),
    )
    take_n = F.least(
        F.greatest(F.lit(BUDGET) - (F.col("cum") - F.col("n_tok")), F.lit(0)),
        F.col("n_tok"),
    ).cast("int")
    sliced = budgeted.select(
        "query_id",
        "rnk",
        take_n.cast("bigint").alias("take_n"),
        F.concat_ws(
            " ", F.expr("slice(t, 1, int(least(greatest({b} - (cum - n_tok), 0), n_tok)))".format(b=BUDGET))
        ).alias("piece"),
    )
    assembled = F.concat_ws(
        " ",
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("take_n") > 0, F.struct("rnk", "piece"))
                )
            ),
            lambda s: s["piece"],
        ),
    )
    return sliced.groupBy("query_id").agg(
        F.sum(F.when(F.col("take_n") > 0, 1).otherwise(0)).alias("n_docs_used"),
        F.sum("take_n").alias("n_tokens"),
        F.md5(assembled).alias("context_fp"),
    )
