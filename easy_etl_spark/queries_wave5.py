"""Fifth wave: corpus-statistics quality scoring and winnowing
fingerprints — the remaining standard LLM-training-data curation ops
(perplexity-proxy filtering, Gopher-style rule filters, MOSS-style
winnowed fingerprints), each with an exact DuckDB oracle.

Scale notes: unigram scoring broadcasts the (vocab-bounded) frequency
table so the token stream is shuffled only once (by doc); quality
rules are a pure per-row projection; winnowing's only shuffle is the
per-doc window — all embarrassingly parallel across documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .functions.exact import sql_avg
from .operators import textops
from .queries import register
from .session import load_table

# integer-space half-up mean (functions/exact.sql_avg): the sf5 sweep
# caught a doc whose mean ln-prob is an exact 1e-4 half-tie, where
# round() diverges between Spark and DuckDB
_SQL_AVG_LP = sql_avg("ln(c * 1.0 / t)", ndigits=4, scale=6)


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@register(
    "unigram_logprob",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents
    ),
    freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT count(*) AS t FROM toks)
    SELECT doc_id, count(*) AS n_tokens,
           {_SQL_AVG_LP} AS avg_logprob
    FROM toks JOIN freq USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM mean log-prob per doc (perplexity-proxy quality
    filter; textops.unigram_logprob_scores)."""
    return textops.unigram_logprob_scores(_docs(spark, sf_dir))


@register(
    "quality_rules",
    """
    WITH t AS (
      SELECT doc_id, trim(text) AS tx, string_split(trim(text), ' ') AS toks
      FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           round((length(tx) - (len(toks) - 1)) * 1.0 / len(toks), 4) AS mean_tok_len,
           round(length(regexp_replace(tx, '[A-Za-z0-9 ]', '', 'g')) * 1.0
                 / length(tx), 4) AS symbol_ratio,
           len(list_filter(toks, x -> x IN ('the','a'))) AS n_stopwords,
           (len(toks) >= 5 AND len(toks) <= 5000
            AND (length(tx) - (len(toks) - 1)) >= 2 * len(toks)
            AND (length(tx) - (len(toks) - 1)) <= 12 * len(toks)
            AND 20 * length(regexp_replace(tx, '[A-Za-z0-9 ]', '', 'g')) <= length(tx)
           ) AS passes_quality
    FROM t
    """,
)
def quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style integer-exact rule filter (textops.quality_rules)."""
    return textops.quality_rules(_docs(spark, sf_dir))


@register(
    "winnow_fingerprints",
    """
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
      WHERE len(string_split(trim(text), ' ')) >= 3
    ),
    sh AS (
      SELECT doc_id, g.i AS pos, len(toks) - 2 AS n_sh,
             md5(toks[g.i] || ' ' || toks[g.i+1] || ' ' || toks[g.i+2]) AS h
      FROM t, UNNEST(generate_series(1, len(toks) - 2)) AS g(i)
    ),
    w AS (
      SELECT doc_id, pos, n_sh,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      FROM sh
    ),
    fps AS (
      SELECT DISTINCT doc_id, fp FROM w
      WHERE pos <= greatest(n_sh - 4, 0) + 1
    )
    SELECT doc_id, count(*) AS n_fingerprints, min(fp) AS min_fp
    FROM fps GROUP BY doc_id
    """,
)
def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed (window-min) shingle-hash fingerprints per doc
    (textops.winnow_fingerprints; k=3 shingles, w=4 windows)."""
    return textops.winnow_fingerprints(_docs(spark, sf_dir))
