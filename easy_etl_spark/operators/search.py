"""Full-text lexical search: inverted index, TF ranking, BM25.

Training-data-pipeline extension (no reference counterpart — the
reference delegates all querying to SQL, easy_etl/README.md:18). Use
cases: corpus exploration ("which documents mention X"), hard-negative
mining for retrieval training, and the lexical half of hybrid
(lexical + vector) search next to similarity.brute_force_topk.

Scale design: the index is one explode + groupBy keyed by term —
uniform hash keys, the canonical 100 TB shuffle. Query scoring joins
the (tiny, broadcast) term list against the index and aggregates per
doc; corpus-level term statistics (df) aggregate from the index
itself, so the raw text is scanned once. No Python in the hot path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import tokens


def term_frequencies(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-(doc, term) frequencies plus per-doc length — the inverted
    index rows. One explode + one groupBy."""
    return (
        docs.withColumn("__t", tokens(F.col(text_col)))
        .select(F.col(id_col), F.explode("__t").alias("term"), F.size("__t").alias("doc_len"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("doc_len").alias("doc_len"))
    )


def lexical_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Integer-exact lexical ranking: docs scored by total query-term
    frequency (ties: more distinct query terms matched, then doc_id).
    Fully integer arithmetic → identical results on any engine or
    partition layout, unlike float BM25 (whose ln() can differ by an
    ulp between engines). The ranking BM25 would produce differs only
    in length normalization; this is the hash-gate-safe spelling.
    """
    tf = term_frequencies(docs, text_col, id_col)
    q = F.broadcast(
        docs.sparkSession.createDataFrame([(t,) for t in query_terms], "term string")
    )
    scored = (
        tf.join(q, "term")
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("total_tf"),
            F.count(F.lit(1)).alias("n_terms_matched"),
        )
    )
    return (
        scored.orderBy(
            F.col("total_tf").desc(), F.col("n_terms_matched").desc(), F.col(id_col)
        )
        .limit(k)
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k:

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len/avgdl))
        idf(t)   = ln((N − df + 0.5)/(df + 0.5) + 1)

    All statistics (N, avgdl, df) are computed distributed from the
    term-frequency index; the two corpus scalars ride in as a crossed
    1-row broadcast frame (no driver collect in the lineage — the plan
    stays one job). Float math → deterministic within one engine;
    use lexical_topk where cross-engine hash equality matters.
    """
    tf = term_frequencies(docs, text_col, id_col)
    q = F.broadcast(
        docs.sparkSession.createDataFrame([(t,) for t in query_terms], "term string")
    )
    corpus = F.broadcast(
        docs.agg(
            F.count(F.lit(1)).alias("__n_docs"),
            F.avg(F.size(tokens(F.col(text_col)))).alias("__avgdl"),
        )
    )
    df_ = tf.join(q, "term").groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    matched = tf.join(q, "term").join(F.broadcast(df_), "term").crossJoin(corpus)
    idf = F.log(
        ((F.col("__n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)) + 1.0
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("doc_len") / F.col("__avgdl"))
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    return (
        matched.withColumn("__s", contrib)
        .groupBy(id_col)
        .agg(F.round(F.sum("__s"), 6).alias("bm25"), F.count(F.lit(1)).alias("n_terms_matched"))
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )


def bm25_reference(
    corpus: dict[int, list[str]], query_terms: list[str], k1: float = 1.2, b: float = 0.75
) -> dict[int, float]:
    """Driver-side reference implementation for tests (plain Python
    floats, no Spark)."""
    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n
    df: dict[str, int] = {}
    for t in query_terms:
        df[t] = sum(1 for toks in corpus.values() if t in toks)
    out: dict[int, float] = {}
    for doc_id, toks in corpus.items():
        s = 0.0
        for t in query_terms:
            tf = toks.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(toks) / avgdl))
        if s > 0:
            out[doc_id] = s
    return out


def rrf_fuse(rankings: "list[DataFrame]", id_col: str = "doc_id", k: int = 60) -> DataFrame:
    """Reciprocal-rank fusion of N ranked retrievals: each input frame
    carries (id_col, rank) with rank 1-based; fused score is
    Σ 1/(k + rank) over the retrievers that returned the id. The
    standard way to combine lexical and vector search without score
    calibration. Ranks are small integers, so the score is a sum of
    identical small rationals — deterministic on any engine.

    Scale shape: each retrieval is already top-N (tiny); fusion is a
    union + groupBy on the id — negligible next to retrieval itself.
    """
    tagged = None
    for r in rankings:
        t = r.select(F.col(id_col), F.col("rank"))
        tagged = t if tagged is None else tagged.unionByName(t)
    return (
        tagged.groupBy(id_col)
        .agg(
            F.round(F.sum(1.0 / (F.lit(k) + F.col("rank"))), 6).alias("rrf_score"),
            F.count(F.lit(1)).alias("n_sources"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col))
    )
