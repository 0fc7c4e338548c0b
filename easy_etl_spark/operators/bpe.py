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
    docs: DataFrame, k: int = 4, text_col: str = "text", batched: bool = True
) -> "tuple[DataFrame, DataFrame]":
    """train_merges plus the final vocab symbol state (w, cnt, s) —
    the encode side reuses the state instead of replaying merges."""
    return (_train_batched if batched else _train_sequential)(docs, k, text_col)


def train_merges(
    docs: DataFrame, k: int = 4, text_col: str = "text", batched: bool = True
) -> DataFrame:
    """Learn the first k BPE merges; returns one row per merge:
    (rank, pair, merged, support). Default is the ROUND-BATCHED trainer
    (several provably-independent merges per Spark round, bit-equal to
    sequential greedy); ``batched=False`` runs the one-merge-per-round
    reference implementation."""
    return (_train_batched if batched else _train_sequential)(docs, k, text_col)[0]


def _init_words(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        word_counts(docs, text_col)
        .select("w", "cnt", _spaced(F.col("w")).alias("s"))
        .localCheckpoint()
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    return (
        words.select("cnt", F.explode(_adjacent_pairs(F.col("s"))).alias("pr"))
        .groupBy("pr")
        .agg(F.sum("cnt").alias("c"))
    )


def _apply_merges(words: DataFrame, pats: "list[tuple[str, str]]") -> DataFrame:
    """Replace-to-fixpoint for a set of SYMBOL-DISJOINT patterns in one
    chained map pass per round (disjointness makes the replaces commute
    and equal the sequential per-pattern fixpoints)."""
    while True:
        col = F.col("s")
        for pat, rep in pats:
            col = F.replace(col, F.lit(pat), F.lit(rep))
        words = words.withColumn("s", col).localCheckpoint()
        remaining = None
        for pat, _rep in pats:
            c = F.instr(F.col("s"), pat) > 0
            remaining = c if remaining is None else (remaining | c)
        if words.filter(remaining).isEmpty():
            return words


def _train_sequential(docs: DataFrame, k: int, text_col: str):
    """One full pair-count pass + argmax per merge — the reference
    formulation the batched trainer is proven against."""
    spark = docs.sparkSession
    words = _init_words(docs, text_col)
    out = []
    for rank in range(1, k + 1):
        best = (
            _pair_counts(words).orderBy(F.col("c").desc(), "pr").limit(1).collect()
        )
        if not best:
            break
        pair, support = best[0]["pr"], int(best[0]["c"])
        merged = pair.replace(" ", "")
        words = _apply_merges(words, [(f" {pair} ", f" {merged} ")])
        out.append((rank, pair, merged, support))
    merges = spark.createDataFrame(
        out, "rank int, pair string, merged string, support bigint"
    )
    return merges, words


def _select_batch(top: list, window: int) -> "tuple[list, int]":
    """Driver-side batch selection over the collected top-``window``
    pair counts (sorted by count DESC, pair ASC). Returns (batch,
    stop_count) where batch is the maximal PREFIX of candidates that is
    pairwise independent:

      - symbol-disjoint (merging one cannot create or destroy
        occurrences of another),
      - merged strings distinct and never equal to another candidate's
        symbol (no within-batch symbol collisions).

    The prefix rule matters: the first incompatible candidate STOPS the
    scan (we may not skip it — after earlier merges it could be the
    true next argmax), and its count becomes the conservative bound on
    every pair outside the batch.

    SELF-PAIRS (x x) end the batch after themselves: merging a run
    "x x x" creates a (xx, x) riser whose bridge is the self-pair
    ITSELF — bounded by its own support, not by stop_count — so no
    later candidate's exactness can be certified past it."""
    batch: list[tuple[str, int, list[str], str]] = []
    stop_count = 0
    for i, row in enumerate(top):
        pr, c = row["pr"], int(row["c"])
        syms = pr.split(" ")
        merged = pr.replace(" ", "")
        ok = True
        for _p2, _c2, syms2, m2 in batch:
            if (
                set(syms) & set(syms2)
                or merged == m2
                or merged in syms2
                or m2 in syms
            ):
                ok = False
                break
        if not ok:
            stop_count = c
            break
        batch.append((pr, c, syms, merged))
        if syms[0] == syms[1]:
            stop_count = c  # self-pair: own risers bounded only by c
            break
    else:
        # window exhausted with no conflict: anything unseen is bounded
        # by the last seen count (sorted order) — unless the window was
        # not even filled, in which case there IS nothing unseen
        stop_count = int(top[-1]["c"]) if len(top) >= window else 0
    return batch, stop_count


def _train_batched(docs: DataFrame, k: int, text_col: str, window: int = 32):
    """Round-batched exact BPE: per Spark round, ONE pair-count
    aggregate (+ a bounded top-``window`` collect) yields SEVERAL
    merges instead of one, cutting a 32k-merge vocabulary from 32k
    sequential rounds to the order of hundreds — the scheduler-
    overhead fix for production-sized tokenizers (SCALING.md).

    Bit-equality with sequential greedy is PROVEN, not assumed, via
    two driver-side rules over the collected counts:

    1. The batch is the maximal prefix of (count DESC, pair ASC)-sorted
       candidates that is pairwise symbol-disjoint with collision-free
       merged symbols (_select_batch) — so applying any batch subset
       changes no other batch member's count, and supports stay exact.
    2. Candidate i (1-based) is RETAINED only while
       ``count_i > 2^(i-1) * stop_count`` where stop_count bounds every
       non-batch pair. Induction: before any merge every non-batch
       count <= stop_count; each applied merge can at most add one
       bounded bridge-pair's worth of new occurrences to any single
       pair, doubling the bound per step. A retained candidate
       therefore still beats every possible riser (strictly — ties
       cannot flip) at its sequential turn, and candidate 1 is the
       literal argmax. Anything past the first failure re-enters the
       next round's fresh count.
    """
    spark = docs.sparkSession
    words = _init_words(docs, text_col)
    out = []
    while len(out) < k:
        top = (
            _pair_counts(words)
            .orderBy(F.col("c").desc(), "pr")
            .limit(window)
            .collect()
        )
        if not top:
            break
        batch, stop_count = _select_batch(top, window)
        retained = [batch[0]]
        for i, cand in enumerate(batch[1:], start=2):
            if cand[1] > (1 << (i - 1)) * stop_count:
                retained.append(cand)
            else:
                break
        retained = retained[: k - len(out)]
        words = _apply_merges(
            words, [(f" {pr} ", f" {merged} ") for pr, _c, _s, merged in retained]
        )
        base = len(out)
        out.extend(
            (base + j + 1, pr, merged, c)
            for j, (pr, c, _s, merged) in enumerate(retained)
        )
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
