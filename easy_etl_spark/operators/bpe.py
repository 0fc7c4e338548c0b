"""Distributed BPE merge training — the tokenizer-construction step of
an LLM data pipeline, run on the *word-frequency table* (the standard
recipe: corpus → (word, count) vocab, then merges trained on the vocab,
so a 100 TB corpus contributes one word-count aggregate and every
iteration after that touches only the dimension-sized vocab).

Exact-parity design (what makes this oracle-checkable when real BPE
trainers are not): the symbol state of each word is a SPACE-JOINED
string (" d a t a "), a merge applies as a literal replace of
" x y " → " xy " repeated to fixpoint, and the pair to merge is the
(count DESC, pair ASC) argmax of weighted adjacent-pair counts. Both
Spark's `replace` and DuckDB's `replace` substitute left-to-right
non-overlapping, and the fixpoint of that pass equals the greedy BPE
merge; every count is an integer — so a SQL oracle replays training
bit-for-bit (merge table and all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import tokens


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) vocabulary — the only pass that touches the corpus."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _spaced(col):
    # "data" → " d a t a "  (sentinel spaces make ' x y ' matches exact)
    return F.concat(F.lit(" "), F.trim(F.regexp_replace(col, "(.)", "$1 ")), F.lit(" "))


def _adjacent_pairs(s):
    sy = F.split(F.trim(s), " ")
    n = F.size(sy)
    return F.zip_with(
        F.slice(sy, 1, n - 1),
        F.slice(sy, 2, n - 1),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )


def train_merges_with_state(
    docs: DataFrame, k: int = 4, text_col: str = "text"
) -> "tuple[DataFrame, DataFrame]":
    """train_merges plus the final vocab symbol state (w, cnt, s) —
    the encode side reuses the state instead of replaying merges."""
    return _train(docs, k, text_col)


def train_merges(docs: DataFrame, k: int = 4, text_col: str = "text") -> DataFrame:
    """Learn the first k BPE merges; returns one row per merge:
    (rank, pair, merged, support).

    Per iteration: one weighted pair-count aggregate over the vocab
    (argmax collected — a single bounded row) and a replace-to-fixpoint
    map pass (checkpointed; the fixpoint loop reruns only while some
    word still contains the pair, which resolves in a couple of passes
    since each replace strictly shortens the symbol string)."""
    return _train(docs, k, text_col)[0]


def _train(docs: DataFrame, k: int, text_col: str):
    spark = docs.sparkSession
    words = (
        word_counts(docs, text_col)
        .select("w", "cnt", _spaced(F.col("w")).alias("s"))
        .localCheckpoint()
    )
    out = []
    for rank in range(1, k + 1):
        best = (
            words.select("cnt", F.explode(_adjacent_pairs(F.col("s"))).alias("pr"))
            .groupBy("pr")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), "pr")
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, support = best[0]["pr"], int(best[0]["c"])
        merged = pair.replace(" ", "")
        pat, rep = f" {pair} ", f" {merged} "
        while True:
            words = words.withColumn(
                "s", F.replace(F.col("s"), F.lit(pat), F.lit(rep))
            ).localCheckpoint()
            if words.filter(F.instr(F.col("s"), pat) > 0).count() == 0:
                break
        out.append((rank, pair, merged, support))
    merges = spark.createDataFrame(
        out, "rank int, pair string, merged string, support bigint"
    )
    return merges, words


def bpe_oracle_sql(k: int = 4) -> str:
    """DuckDB twin of train_merges, generated per rank: pair counts →
    (count DESC, pair ASC) argmax → recursive replace-to-fixpoint."""
    blocks = [
        r"""
    w0 AS (
      SELECT w AS word, cnt,
             ' ' || trim(regexp_replace(w, '(.)', '\1 ', 'g')) || ' ' AS s
      FROM (
        SELECT w, count(*) AS cnt FROM (
          SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents
        ) GROUP BY w
      )
    )"""
    ]
    for i in range(1, k + 1):
        prev = f"w{i - 1}"
        blocks.append(
            f"""
    p{i} AS (
      SELECT pr, CAST(sum(cnt) AS BIGINT) AS c FROM (
        SELECT cnt,
               unnest(list_transform(range(1, len(string_split(trim(s), ' '))),
                                     j -> string_split(trim(s), ' ')[j] || ' ' ||
                                          string_split(trim(s), ' ')[j+1])) AS pr
        FROM {prev}
      ) GROUP BY pr
    ),
    best{i} AS (SELECT pr, c FROM p{i} ORDER BY c DESC, pr LIMIT 1),
    r{i} AS (
      SELECT word, cnt, s FROM {prev}
      UNION ALL
      SELECT word, cnt,
             replace(s, (SELECT ' ' || pr || ' ' FROM best{i}),
                        (SELECT ' ' || replace(pr, ' ', '') || ' ' FROM best{i}))
      FROM r{i}
      WHERE position((SELECT ' ' || pr || ' ' FROM best{i}) IN s) > 0
    ),
    w{i} AS (
      SELECT word, cnt, s FROM r{i}
      WHERE position((SELECT ' ' || pr || ' ' FROM best{i}) IN s) = 0
    )"""
        )
    finals = "\n    UNION ALL ".join(
        f"SELECT {i} AS rank, pr AS pair, replace(pr, ' ', '') AS merged, c AS support FROM best{i}"
        for i in range(1, k + 1)
    )
    return (
        "\n    WITH RECURSIVE "
        + ",".join(blocks)
        + f"\n    SELECT CAST(rank AS INTEGER) AS rank, pair, merged, support FROM ({finals})"
    )


def encode_stats(docs: DataFrame, k: int = 4, text_col: str = "text") -> DataFrame:
    """Apply the trained merges and report per-language compression:
    (lang, n_words, n_chars, n_subwords, chars_per_subword). The encode
    side is one broadcast-able join of the per-(lang, word) counts with
    the trained vocab state — documents are never re-tokenized beyond
    the word level."""
    _, words = train_merges_with_state(docs, k, text_col)
    lw = (
        docs.select("lang", F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n_sym = F.size(F.split(F.trim(F.col("s")), " "))
    return (
        lw.join(words.select("w", "s"), "w")
        .groupBy("lang")
        .agg(
            F.sum("cnt").alias("n_words"),
            F.sum(F.col("cnt") * F.length("w")).alias("n_chars"),
            F.sum(F.col("cnt") * n_sym).alias("n_subwords"),
        )
        .select(
            "lang",
            "n_words",
            "n_chars",
            "n_subwords",
            F.round(F.col("n_chars").cast("double") / F.col("n_subwords"), 4).alias(
                "chars_per_subword"
            ),
        )
    )


def bpe_encode_oracle_sql(k: int = 4) -> str:
    """DuckDB twin of encode_stats: train via the same blocks, then
    join per-(lang, word) counts with the final symbol state."""
    train = bpe_oracle_sql(k)
    body = train[: train.rindex("\n    SELECT CAST(rank")]
    return (
        body
        + f""",
    lw AS (
      SELECT lang, w, count(*) AS cnt FROM (
        SELECT lang, unnest(string_split(trim(text), ' ')) AS w FROM documents
      ) GROUP BY 1, 2
    )
    SELECT lang,
           CAST(sum(lw.cnt) AS BIGINT) AS n_words,
           CAST(sum(lw.cnt * length(lw.w)) AS BIGINT) AS n_chars,
           CAST(sum(lw.cnt * len(string_split(trim(s), ' '))) AS BIGINT) AS n_subwords,
           round(CAST(sum(lw.cnt * length(lw.w)) AS DOUBLE)
                 / sum(lw.cnt * len(string_split(trim(s), ' '))), 4) AS chars_per_subword
    FROM lw JOIN w{k} ON lw.w = w{k}.word
    GROUP BY lang
    """
    )
