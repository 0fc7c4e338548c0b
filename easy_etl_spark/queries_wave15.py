"""Wave-15 query catalog: contrastive-training pair construction and
masked-LM corpus construction.

New operator families:
  - hard_negative_mining   per-query most-similar DIFFERENT-label
                           vectors (contrastive negatives)
  - mlm_masking            deterministic token masking (masked-LM /
                           denoising objective construction)

Hash-safety follows the catalog conventions (queries.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import similarity
from .operators.textops import tokens
from .queries import register
from .session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------
# Contrastive training data: hard negatives per anchor
# ----------------------------------------------------------------------

@register(
    "hard_negative_mining",
    """
    WITH v AS (
      SELECT vec_id, label, [CAST(x AS DOUBLE) FOR x IN embedding] AS e
      FROM embeddings
    ),
    n AS (SELECT vec_id, label, e, sqrt(list_sum([x*x FOR x IN e])) AS nrm FROM v),
    q AS (SELECT * FROM n WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             c.vec_id AS negative_id, c.label AS negative_label,
             round(list_sum(list_zip(q.e, c.e).apply(p -> p[1]*p[2]))
                   / (q.nrm*c.nrm), 6) AS cosine
      FROM q JOIN n c ON c.label != q.label
    )
    SELECT query_id, query_label, negative_id, negative_label, cosine, rnk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, negative_id) AS rnk
      FROM scored
    ) WHERE rnk <= 5
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard negatives for contrastive training: each anchor's 5
    most-similar vectors with a DIFFERENT label (the near-misses that
    actually teach a margin — random negatives are trivially
    separable). Same broadcast-scan + per-query top-k window as
    brute_force_topk; the label inequality lives in the join, so
    same-label pairs never materialize (operators/similarity.
    hard_negatives)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return similarity.hard_negatives(emb, queries_df, k=5).select(
        "query_id", "query_label", "negative_id", "negative_label", "cosine", "rnk"
    )


# ----------------------------------------------------------------------
# Training-objective construction: deterministic masked-LM corpus
# ----------------------------------------------------------------------

@register(
    "mlm_masking",
    """
    WITH toks AS (
      SELECT doc_id, i AS pos, t[i] AS tok
      FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
           UNNEST(generate_series(1, len(t))) AS g(i)
    ),
    marked AS (
      SELECT doc_id, pos, tok,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)), 1, 8))::BIGINT % 5 = 0
               AS masked
      FROM toks
    )
    SELECT doc_id,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
           md5(string_agg(CASE WHEN masked THEN '<X>' ELSE tok END,
                          ' ' ORDER BY pos)) AS corrupted_fp,
           md5(coalesce(string_agg(CASE WHEN masked THEN tok END,
                                   ' ' ORDER BY pos), '')) AS targets_fp
    FROM marked GROUP BY doc_id
    """,
)
def mlm_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked-LM corpus construction: every token is masked with
    probability 1/5 decided by the portable md5 hash of (doc_id, pos) —
    the SAME tokens mask on every run, engine, and partition layout, so
    a training corpus built twice is bit-identical (rand()-based
    masking is not reproducible, and irreproducible corpora make
    training regressions undebuggable). Emits mask counts plus md5
    fingerprints of the corrupted text and the mask targets.

    Scale: posexplode -> per-row hash -> per-doc re-assembly via
    sort_array over (pos, token) structs; everything partitions by
    doc_id."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id"), F.col("pos"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    marked = toks.withColumn("masked", F.pmod(h, F.lit(5)) == 0)
    corrupted = F.concat_ws(
        " ",
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "pos",
                        F.when(F.col("masked"), "<X>").otherwise(F.col("tok")).alias(
                            "out"
                        ),
                    )
                )
            ),
            lambda s: s["out"],
        ),
    )
    targets = F.concat_ws(
        " ",
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("masked"), F.struct("pos", "tok"))
                )
            ),
            lambda s: s["tok"],
        ),
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("masked"), 1).otherwise(0)).alias("n_masked"),
        F.md5(corrupted).alias("corrupted_fp"),
        F.md5(targets).alias("targets_fp"),
    )
