"""Wave-21 query catalog: scaling-law experiment construction and
vocabulary coverage analysis.

New operator families:
  - learning_curve_subsets   nested 10/25/50/100% corpus subsets
                             (monotone by construction — the data-
                             scaling-law experiment ladder)
  - vocab_coverage_curve     tokens needed to cover 50/90/99% of the
                             corpus (tokenizer sizing / long-tail)

Hash-safety follows the catalog conventions (queries.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.sampling import md5_uniform
from .operators.textops import tokens
from .queries import register
from .session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "learning_curve_subsets",
    """
    WITH hashed AS (
      SELECT source, n_chars,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
               AS b
      FROM documents
    ),
    fanned AS (
      SELECT source, n_chars, pct
      FROM hashed, UNNEST([10, 25, 50, 100]) AS p(pct)
      WHERE b < pct
    )
    SELECT CAST(pct AS BIGINT) AS subset_pct, source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM fanned GROUP BY 1, 2
    """,
)
def learning_curve_subsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scaling-law experiment ladder: nested 10/25/50/100% corpus
    subsets keyed on the SAME md5 bucket, so each rung strictly
    contains the previous one (train-on-10% is a true subset of
    train-on-25% — unnested random subsets confound scaling curves
    with sample variance). Emits the per-rung, per-source census.

    Scale: one per-row hash + a 4x fan-out of the survivors + one
    map-side-combined aggregate; membership at ANY rung recomputes
    from the id alone."""
    docs = _t(spark, sf_dir, "documents")
    b = md5_uniform(F.col("doc_id"), 100)
    fanned = (
        docs.select("source", "n_chars", b.alias("b"))
        .select(
            "source",
            "n_chars",
            "b",
            F.explode(F.array(F.lit(10), F.lit(25), F.lit(50), F.lit(100))).alias(
                "pct"
            ),
        )
        .filter(F.col("b") < F.col("pct"))
    )
    return fanned.groupBy(
        F.col("pct").cast("bigint").alias("subset_pct"), "source"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "vocab_coverage_curve",
    """
    WITH toks AS (
      SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents
    ),
    freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rnk,
             CAST(sum(c) OVER (ORDER BY c DESC, tok) AS BIGINT) AS cum,
             (SELECT CAST(sum(c) AS BIGINT) FROM freq) AS total
      FROM freq
    )
    SELECT pct AS coverage_pct,
           CAST(min(CASE WHEN cum * 100 >= pct * total THEN rnk END) AS BIGINT)
             AS vocab_size,
           max(total) AS total_tokens
    FROM ranked, UNNEST([50, 90, 99]) AS p(pct)
    GROUP BY pct
    """,
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage knees: the number of distinct tokens
    (frequency-ranked, ties lexicographic) needed to cover 50/90/99%
    of all token occurrences — the long-tail profile that sizes
    tokenizer vocabularies and OOV budgets. The threshold test uses
    exact integer cross-multiplication (cum*100 >= pct*total), no
    float share.

    Scale: token counting is map-side combined; rank and cumulative
    coverage ride the BANDED global machinery (ranking.
    global_row_number over (c desc, tok), then packing.
    global_running_offset over the unique rank) — no single-partition
    sort even when the vocabulary itself is huge. The 3-way fan-out
    rides the ranked frame."""
    from .operators.packing import global_running_offset
    from .operators.ranking import global_row_number

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("total"))
    by_rank = global_row_number(
        freq, [F.col("c").desc(), F.col("tok")], out_col="rnk"
    )
    # inclusive cumulative = exclusive banded prefix sum + own count
    ranked = (
        global_running_offset(by_rank, "c", "rnk", out_col="_ofs")
        .withColumn("cum", (F.col("_ofs") + F.col("c")).cast("long"))
        .drop("_ofs")
        .crossJoin(F.broadcast(total))
    )
    fanned = ranked.select(
        "rnk",
        "cum",
        "total",
        F.explode(F.array(F.lit(50), F.lit(90), F.lit(99))).alias("pct"),
    )
    return fanned.groupBy(F.col("pct").cast("bigint").alias("coverage_pct")).agg(
        F.min(
            F.when(F.col("cum") * 100 >= F.col("pct") * F.col("total"), F.col("rnk"))
        )
        .cast("bigint")
        .alias("vocab_size"),
        F.max("total").alias("total_tokens"),
    )
