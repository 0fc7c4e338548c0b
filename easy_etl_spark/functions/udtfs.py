"""Python UDTFs (Spark 4 table functions) — the modern form of the
reference's "middleware" surface (whole-resultset in → rows out,
easy_etl/__init__.py:58-75): one input row may yield any number of
output rows with a new schema.

Arrow-optimized UDTFs batch rows through the Python worker; for purely
relational row-expansion prefer explode()/inline() (JVM-side), and use
a UDTF only when the expansion logic is genuinely imperative — like
tokenizer-aware chunking below.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="doc_id bigint, chunk_idx int, chunk_text string, n_tokens int")
class ChunkTokens:
    """Split a document into fixed-size token windows (context-window
    chunking for training pipelines). Token rule matches the oracle:
    single-space split of the trimmed text."""

    def eval(self, doc_id: int, text: str, chunk_size: int = 8):  # noqa: D102
        if text is None:
            return
        toks = text.strip().split(" ")
        k = chunk_size
        for i in range((len(toks) + k - 1) // k):
            window = toks[i * k : (i + 1) * k]
            yield doc_id, i, " ".join(window), len(window)


def register_udtfs(spark) -> None:
    """Register all UDTFs for SQL LATERAL use."""
    spark.udtf.register("chunk_tokens", ChunkTokens)
