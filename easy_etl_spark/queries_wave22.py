"""Wave-22 query catalog: the full corpus-build composition.

New operator family:
  - corpus_build_report   the COMPLETE training-corpus assembly line —
                          quality curation -> near-dup survivors ->
                          benchmark decontamination -> per-source token
                          caps -> train split — with a per-stage census
                          the oracle replays end to end.

Every stage is an already-proven operator; what this query pins is the
COMPOSITION: stages see each other's outputs, so a subtle contract
break between any two (column drift, survivor-choice change, hash
change) flips the census even when each stage's own gate stays green.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.curation import cap_sources_by_budget, curate_corpus, decontaminate
from .operators.sampling import md5_uniform
from .operators.textops import tokens
from .queries import register
from .session import load_table, track_cache

BUDGET_PER_SOURCE = 5000


@register(
    "corpus_build_report",
    f"""
    WITH RECURSIVE
    t AS (SELECT doc_id, source, text, string_split(trim(text), ' ') AS toks
          FROM documents),
    q AS (
      SELECT doc_id, text, toks,
             round(least(len(toks) / 100.0, 1.0)
                   * (1 - len(list_filter(toks, x -> x IN ('the','a'))) * 1.0
                      / len(toks)), 4) AS quality
      FROM t
    ),
    good AS (SELECT * FROM q WHERE quality >= 0.5),
    ex AS (SELECT min(doc_id) AS doc_id FROM good GROUP BY md5(lower(trim(text)))),
    g2 AS (SELECT good.* FROM good JOIN ex USING (doc_id)),
    sh AS (
      SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
      FROM g2, UNNEST(generate_series(1, greatest(len(toks)-2, 1))) AS gg(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8
    ),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (SELECT src AS node, src AS m FROM edges
              UNION SELECT r.node, e.dst FROM reach r JOIN edges e ON r.m = e.src),
    labels AS (SELECT node, min(m) AS cluster_id FROM reach GROUP BY node),
    curated AS (
      SELECT doc_id FROM g2
      WHERE doc_id NOT IN (SELECT node FROM labels WHERE node != cluster_id)
    ),
    traincands AS (SELECT doc_id FROM curated WHERE doc_id % 50 <> 0),
    g AS (
      SELECT tt.doc_id,
             unnest(list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS gram
      FROM t tt JOIN traincands USING (doc_id)
    ),
    bg AS (
      SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS gram
      FROM t WHERE doc_id % 50 = 0
    ),
    flagged AS (SELECT DISTINCT g.doc_id FROM g JOIN bg USING (gram)),
    decon AS (
      SELECT doc_id FROM traincands
      WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
    ),
    capped AS (
      SELECT doc_id, n_tok FROM (
        SELECT tt.source, tt.doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
               sum(CAST(len(toks) AS BIGINT)) OVER (
                 PARTITION BY tt.source
                 ORDER BY len(toks) DESC, tt.doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM t tt JOIN decon USING (doc_id)
      ) WHERE cum <= {BUDGET_PER_SOURCE}
    ),
    train AS (
      SELECT doc_id, n_tok FROM capped
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80
    )
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS stage_ord, 'raw' AS stage,
             count(*) AS n_docs, CAST(sum(len(toks)) AS BIGINT) AS n_tokens
      FROM t
      UNION ALL
      SELECT 2, 'curated', count(*), CAST(sum(len(toks)) AS BIGINT)
      FROM t JOIN curated USING (doc_id)
      UNION ALL
      SELECT 3, 'decontaminated', count(*), CAST(sum(len(toks)) AS BIGINT)
      FROM t JOIN decon USING (doc_id)
      UNION ALL
      SELECT 4, 'capped', count(*), CAST(sum(n_tok) AS BIGINT) FROM capped
      UNION ALL
      SELECT 5, 'train_split', count(*), CAST(sum(n_tok) AS BIGINT) FROM train
    )
    """,
)
def corpus_build_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The assembled training-corpus pipeline, stage by stage: raw ->
    quality curation + exact/near dedup survivors (curate_corpus) ->
    benchmark decontamination (n-gram overlap vs the held-out slice,
    benchmark docs excluded) -> per-source token caps (longest-first)
    -> deterministic md5 train split. Emits the per-stage doc/token
    census; the oracle replays every stage AND their composition.

    Scale: each stage is an already-audited operator (their individual
    entries carry the plan posture); the composition adds only id
    anti-joins/semi-joins between stages."""
    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(tokens(F.col("text"))).cast("bigint")
    # Round 11 (guide §1.2: don't recompute what you already have):
    # the three id-census rows each re-tokenized their doc subset —
    # tokenize ONCE into a tiny cached (doc_id, n_tok) frame and make
    # every census an aggregate over id joins against it. Same tokens()
    # expression, so the sums are bit-identical.
    meta = track_cache(docs.select("doc_id", ntok.alias("__n_tok")))

    def census(ids: DataFrame | None, ord_: int, name: str) -> DataFrame:
        joined = meta if ids is None else meta.join(ids.select("doc_id"), "doc_id")
        return joined.agg(
            F.lit(ord_).cast("bigint").alias("stage_ord"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n_tok").alias("n_tokens"),
        )

    # each stage feeds BOTH its census row and the next stage — persist
    # the small id frames so the curation/shingle chain runs once
    curated = track_cache(
        curate_corpus(docs, quality_threshold=0.5, jaccard_threshold=0.8)
    )
    traincands = curated.filter(F.col("doc_id") % 50 != 0).select("doc_id")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    flagged = decontaminate(
        docs.join(traincands, "doc_id"), bench, n=3
    ).select("doc_id")
    decon = track_cache(traincands.join(flagged, "doc_id", "left_anti"))
    capped = track_cache(cap_sources_by_budget(
        docs.join(decon, "doc_id"), budget_tokens=BUDGET_PER_SOURCE
    ))
    train = capped.filter(md5_uniform(F.col("doc_id"), 100) < 80)

    capped_census = capped.agg(
        F.lit(4).cast("bigint").alias("stage_ord"),
        F.lit("capped").alias("stage"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )
    train_census = train.agg(
        F.lit(5).cast("bigint").alias("stage_ord"),
        F.lit("train_split").alias("stage"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )
    return (
        census(None, 1, "raw")
        .unionAll(census(curated, 2, "curated"))
        .unionAll(census(decon, 3, "decontaminated"))
        .unionAll(capped_census)
        .unionAll(train_census)
    )
