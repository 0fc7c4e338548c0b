"""Text-analysis operators over the `documents` table: tokenization,
token counting, quality scoring, language-ID, fingerprinting.

Beyond the reference's surface (exit99/easy-etl has no text ops) —
these are the training-data-pipeline extensions. Everything is
built-in-function Column algebra (split / size / filter / aggregate /
md5 / xxhash64): zero Python UDFs, fully whole-stage-codegen, and
embarrassingly parallel (per-row, no shuffle), so the same plan holds
at 100 TB — the only shuffles below are the final small aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..session import track_cache

#: tiny deterministic "stopword" profiles over the synthetic corpus
#: vocabulary — the language-ID heuristic scores token overlap per
#: profile and argmaxes (tie → profile priority order en > es > de).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast", "slow", "big"),
    "es": ("data", "table", "row", "column", "value"),
    "de": ("join", "merge", "group", "sort", "hash"),
}

STOPWORDS = ("the", "a")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (corpus is single-space separated)."""
    return F.split(F.trim(text), " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-approximating token count: words + punctuation splits, the
    common `len(text)/4`-style estimator refined by a regex split —
    deterministic, JVM-side."""
    return F.size(F.split(F.trim(text), r"\s+|(?=[.,!?;:])"))


def stopword_ratio_arr(t: Column) -> Column:
    """Over a pre-split token array (see `array_ngrams` on why hot
    paths pre-split: no CSE inside HOF lambdas)."""
    stops = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    return stops.cast("double") / F.size(t).cast("double")


def stopword_ratio(text: Column) -> Column:
    return stopword_ratio_arr(tokens(text))


def quality_score_arr(t: Column) -> Column:
    n = F.size(t).cast("double")
    stops = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS))).cast("double")
    return F.round(F.least(n / 100.0, F.lit(1.0)) * (1.0 - stops / n), 4)


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length saturation ×
    (1 - stopword ratio). Mirrors the shape of production quality
    filters (length/punct/stopword mix) with reproducible arithmetic."""
    return quality_score_arr(tokens(text))


def lang_scores_arr(t: Column) -> dict[str, Column]:
    def profile_count(words: tuple[str, ...]) -> Column:
        # single-arg lambda: pyspark passes (element, index) to 2-arg
        # lambdas, so the words must be bound via closure, not defaults
        return F.size(F.filter(t, lambda x: x.isin(*words)))

    return {lang: profile_count(words) for lang, words in LANG_PROFILES.items()}


def lang_scores(text: Column) -> dict[str, Column]:
    return lang_scores_arr(tokens(text))


def lang_id_arr(t: Column) -> Column:
    s = lang_scores_arr(t)
    return (
        F.when((s["en"] >= s["es"]) & (s["en"] >= s["de"]), F.lit("en"))
        .when(s["es"] >= s["de"], F.lit("es"))
        .otherwise(F.lit("de"))
    )


def lang_id(text: Column) -> Column:
    """Argmax of profile scores with fixed priority tie-break."""
    return lang_id_arr(tokens(text))


def fingerprint_md5(text: Column) -> Column:
    """Whole-document fingerprint: md5 of the normalized text (lower +
    trim). md5 exists in both Spark and DuckDB, so oracle-checkable."""
    return F.md5(F.lower(F.trim(text)))


def rolling_min_hash(text: Column, shingle_k: int = 3) -> Column:
    """Rolling-hash document signature: min xxhash64 over k-token
    shingles (a 1-permutation MinHash) — the winnowing-style compact
    fingerprint for near-dup prefiltering."""
    t = tokens(text)
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(t) - shingle_k, F.lit(0))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(t, i + 1, shingle_k))),
    )
    return F.array_min(shingles)


#: PII patterns (portable subset: identical semantics under Java regex
#: (Spark) and RE2 (DuckDB) — no backrefs, no lookarounds).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "phone": r"\b\d{3}-\d{4}\b",
}


def redact_pii(text: Column) -> Column:
    """Replace emails, IPv4s, and phone-shaped tokens with typed
    placeholders. Order matters: emails first (their domain would
    otherwise survive as an IP-ish token), then IPs, then phones.
    Pure `regexp_replace` — JVM-side, codegen, no shuffle: the same
    single-pass map applies unchanged at 100 TB."""
    out = text
    for kind in ("email", "ip", "phone"):
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"[{kind.upper()}]")
    return out


def pii_count(text: Column, kind: str) -> Column:
    """Match count per PII class (regexp_extract_all idx=0 — portable
    to DuckDB's len(regexp_extract_all(...)))."""
    return F.size(F.regexp_extract_all(text, F.lit(PII_PATTERNS[kind]), 0))


def array_ngrams(t: Column, n: int) -> Column:
    """Adjacent n-grams over an ALREADY-SPLIT token array column.

    Two deliberate performance choices (5x, measured at sf0.1):
    - callers in hot paths should materialize the split into a real
      column first (``withColumn("__t", tokens(...))``) — Catalyst does
      NOT common-subexpression-eliminate inside higher-order-function
      lambdas, so an inline ``split()`` is re-evaluated on every
      reference;
    - each gram is one ``slice`` + ``concat_ws`` (one reference to the
      array) instead of n ``element_at`` calls.

    Guarded: Spark's sequence(1, 0) would produce a DESCENDING [1,0]
    (step inferred as -1), so short docs must short-circuit to [].
    """
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )
    return F.when(F.size(t) >= n, grams).otherwise(F.array().cast("array<string>"))


def bigrams(text: Column) -> Column:
    """Adjacent token pairs from raw text (see `array_ngrams`)."""
    return array_ngrams(tokens(text), 2)


def token_ngrams(text: Column, n: int) -> Column:
    """Adjacent token n-grams as space-joined strings from raw text
    (portable to DuckDB list_transform — no hashing, so
    oracle-checkable). Hot paths: pre-split and use `array_ngrams`."""
    return array_ngrams(tokens(text), n)


def dup_fraction(grams: Column) -> Column:
    """Fraction of gram occurrences that repeat an earlier gram
    (1 - distinct/total); 0 for empty gram arrays. Pass a
    pre-materialized gram column in hot paths (see `array_ngrams`)."""
    n = F.size(grams)
    return F.when(
        n > 0,
        1.0 - F.size(F.array_distinct(grams)).cast("double") / n.cast("double"),
    ).otherwise(F.lit(0.0))


def dup_bigram_fraction(text: Column) -> Column:
    """Gopher-style repetition signal, simplified: `dup_fraction` over
    adjacent token pairs of raw text."""
    return dup_fraction(bigrams(text))


def text_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document feature frame: one narrow projection, no shuffle.
    The split is materialized once and every feature reads the token
    array — without this the five token-consuming features would each
    re-split the text (no CSE across expressions)."""
    text = F.col(text_col)
    t = F.col("__t")
    return (
        docs.withColumn("__t", tokens(text))
        .select(
            "doc_id",
            F.size(t).alias("n_tokens"),
            F.length(text).alias("n_chars_computed"),
            F.round(stopword_ratio_arr(t), 4).alias("stop_ratio"),
            quality_score_arr(t).alias("quality"),
            lang_id_arr(t).alias("lang_guess"),
            fingerprint_md5(text).alias("fp_md5"),
        )
    )


def build_vocab(
    docs: DataFrame, top_n: int, text_col: str = "text"
) -> DataFrame:
    """Frequency-ranked token vocabulary: (tok, token_id) with ids
    1..top_n by (count DESC, token ASC) — fully deterministic incl.
    ties. Corpus-side work is one explode + map-side-combined count.

    Ranking is FULLY DISTRIBUTED — nothing ever lands on the driver, so
    a 1M-entry vocab costs the same plan as a 100-entry one: range-
    partition the (vocab-sized) count table on the rank key, assign
    per-partition row_numbers (window partitioned by the shuffle
    partition — embarrassingly parallel), and convert them to global
    ranks by adding per-partition offsets. The offsets come from a
    numPartitions-row prefix sum computed as a broadcast triangular
    self-join — no single-partition sort exchange anywhere in the plan
    (gated by test_plan_quality.test_vocab_rank_distributed)."""
    from pyspark.sql import Window

    # vocab-sized cache BEFORE repartitionByRange: the range exchange
    # runs a boundary-sampling job over its child, which would
    # otherwise re-execute the whole corpus tokenize+count pass just
    # to pick split points (round 11, guide §1.2/§5 — the plan showed
    # the documents scan 6x; the sample now reads this tiny cache)
    counts = track_cache(
        docs.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # range partitions follow the rank order, so partition id order ==
    # global rank order; persist so the offsets pass and the rank pass
    # share one materialization (and one partition assignment)
    part = counts.repartitionByRange(
        F.col("cnt").desc(), F.col("tok")
    ).withColumn("__pid", F.spark_partition_id())
    part = track_cache(part)
    pc = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    a, b = pc.alias("a"), pc.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col("b.__pid") < F.col("a.__pid"), "left")
        .groupBy(F.col("a.__pid").alias("__pid"))
        .agg(F.coalesce(F.sum("b.__n"), F.lit(0)).alias("__off"))
    )
    w = Window.partitionBy("__pid").orderBy(F.col("cnt").desc(), F.col("tok"))
    return (
        part.join(F.broadcast(offsets), "__pid")
        .withColumn(
            "token_id", (F.row_number().over(w) + F.col("__off")).cast("long")
        )
        .filter(F.col("token_id") <= top_n)
        .select("tok", "token_id")
    )


def encode_tokens(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Vocab-encode the corpus to (id, pos, token_id) long format —
    the text→ids step before sequence packing. Out-of-vocab → 0 (UNK).
    JVM-only: posexplode + a BROADCAST left join against the (small by
    construction) vocab — the token stream itself is never shuffled."""
    pos_tok = (
        docs.withColumn("__t", tokens(F.col(text_col)))
        .select(id_col, F.posexplode(F.col("__t")).alias("pos0", "tok"))
    )
    return (
        pos_tok.join(F.broadcast(vocab), "tok", "left")
        .select(
            id_col,
            (F.col("pos0") + 1).cast("long").alias("pos"),
            F.coalesce(F.col("token_id"), F.lit(0)).cast("long").alias("token_id"),
        )
    )


def unigram_logprob_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-level unigram language-model score per document — the
    cheap perplexity proxy production pipelines use for quality
    filtering (low mean log-prob ⇒ off-distribution text).

    Two passes over the token stream, both embarrassingly parallel:
    (1) explode → map-side-combined count per token (shuffle ∝ vocab);
    (2) explode → broadcast-join the frequency table → per-doc mean of
    ln(count·1.0/total). The frequency table is vocab-sized (bounded
    by language, not corpus), so the join broadcasts at any SF; the
    token stream itself is only shuffled once, by doc, for the final
    per-doc aggregate. ln values are quantized to 1e-6 units before
    summing AND the display mean is rounded in integer space
    (functions/exact.dec_avg) — the sf5 sweep caught a doc whose mean
    landed on an exact 1e-4 half-tie, where Spark's round() and
    DuckDB's disagree.
    """
    from ..functions.exact import dec_avg

    toks = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("t"))
    scored = (
        toks.join(F.broadcast(freq), "tok")
        .join(F.broadcast(total))
        .withColumn("__lp", F.log(F.col("c") * F.lit(1.0) / F.col("t")))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        dec_avg(F.col("__lp"), ndigits=4, scale=6).alias("avg_logprob"),
    )


def quality_rules(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style heuristic quality rules, all integer-derived (no
    float accumulation → exact and engine-portable): token count
    bounds, mean token length band, symbol-character budget, stopword
    presence. One narrow per-row projection, zero shuffles — the same
    plan at 100 TB.

    Threshold comparisons are written over integers (e.g. 20·symbols ≤
    chars instead of ratio ≤ 0.05) so the pass/fail booleans cannot
    straddle a float boundary between engines.
    """
    text = F.trim(F.col(text_col))
    t = F.col("__t")
    n_tok = F.size(t)
    n_chars = F.length(text)
    # single-space corpus: token chars = chars - (n_tok - 1) separators
    tok_chars = n_chars - (n_tok - 1)
    symbols = F.length(F.regexp_replace(text, "[A-Za-z0-9 ]", ""))
    stops = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    passes = (
        (n_tok >= 5)
        & (n_tok <= 5000)
        & (tok_chars >= 2 * n_tok)   # mean token length ≥ 2
        & (tok_chars <= 12 * n_tok)  # mean token length ≤ 12
        & (20 * symbols <= n_chars)  # symbol ratio ≤ 5%
    )
    return docs.withColumn("__t", tokens(text)).select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(tok_chars * F.lit(1.0) / n_tok, 4).alias("mean_tok_len"),
        F.round(symbols * F.lit(1.0) / n_chars, 4).alias("symbol_ratio"),
        stops.alias("n_stopwords"),
        passes.alias("passes_quality"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    shingle_k: int = 3,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., MOSS): hash
    every k-token shingle, slide a w-window over the hash sequence,
    keep each window's minimum — the guaranteed-coverage sparse
    fingerprint set used for plagiarism/near-dup detection at scale.

    md5 is the shingle hash (identical in Spark and DuckDB → oracle-
    checkable; swap xxhash64 for speed when cross-engine parity isn't
    needed). The only shuffle is the per-doc window/aggregate, keyed
    by document — embarrassingly parallel across docs at 100 TB.
    """
    from pyspark.sql import Window as W

    grams = (
        docs.withColumn("__t", tokens(F.col(text_col)))
        .withColumn("__n", F.size(F.col("__t")))
        .select(
            F.col(id_col),
            F.col("__n"),
            F.posexplode(array_ngrams(F.col("__t"), shingle_k)).alias("pos0", "s"),
        )
        .withColumn("__h", F.md5(F.col("s")))
    )
    n_sh = F.col("__n") - (shingle_k - 1)  # shingle count per doc
    win = W.partitionBy(id_col).orderBy("pos0").rowsBetween(0, window - 1)
    fps = (
        grams.withColumn("__fp", F.min("__h").over(win))
        # windows start at every position that has w hashes ahead of it
        # (short docs: the single partial window at pos 0)
        .filter(F.col("pos0") <= F.greatest(n_sh - window, F.lit(0)))
        .select(id_col, "__fp")
        .distinct()
    )
    return fps.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.min("__fp").alias("min_fp"),
    )


def destutter(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Collapse runs of consecutive repeated tokens ("the the the" ->
    "the") — standard crawl-text cleanup ahead of tokenizer training.
    Returns (id, n_before, n_after, cleaned_text, cleaned_fp).

    posexplode -> per-doc lag window -> filter -> deterministic
    re-assembly: sort_array over (pos, tok) structs, NOT a bare
    collect_list (whose order follows partitioning). Everything
    partitions by the doc id; no global operation."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    kept = toks.withColumn("prev", F.lag("tok").over(w)).filter(
        F.col("prev").isNull() | (F.col("tok") != F.col("prev"))
    )
    before = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_before"))
    cleaned = F.concat_ws(
        " ",
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tok"))),
            lambda s: s["tok"],
        ),
    )
    after = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_after"),
        cleaned.alias("cleaned_text"),
    )
    return before.join(after, id_col).select(
        id_col,
        "n_before",
        "n_after",
        "cleaned_text",
        F.md5("cleaned_text").alias("cleaned_fp"),
    )


def sliding_chunks(
    docs: DataFrame,
    window: int = 8,
    stride: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping sliding-window chunking — the RAG / context-window
    shape (stride < window keeps boundary n-grams inside some chunk,
    unlike the non-overlapping udtf_chunk_tokens). Chunk i covers
    tokens [i*stride, i*stride + window); the last start is the first
    multiple of stride at or past n - window (tail always covered,
    no degenerate fully-contained trailing chunks). JVM-only column
    algebra: sequence + explode + slice, zero Python, zero shuffle."""
    t = F.col("__toks")
    n = F.size(t)
    n_chunks = (
        F.lit(1)
        + F.floor(
            (F.greatest(n - window, F.lit(0)) + stride - 1) / F.lit(stride)
        ).cast("int")
    )
    return (
        docs.withColumn("__toks", tokens(F.col(text_col)))
        .select(
            id_col,
            "__toks",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            (F.col("chunk_idx") * stride).cast("bigint").alias("start_tok"),
            F.array_join(
                F.slice(t, F.col("chunk_idx") * stride + 1, window), " "
            ).alias("chunk_text"),
            F.size(F.slice(t, F.col("chunk_idx") * stride + 1, window))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )


def gram_novelty(
    docs: DataFrame, n: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-internal novelty / memorization scan: for each doc, the
    fraction of its DISTINCT n-grams that appear in at least one OTHER
    doc — the dup-leakage metric curation pipelines threshold before
    training (decontaminate() covers train-vs-benchmark; this is
    corpus-vs-itself). Returns (doc_id, n_grams, n_shared,
    novelty_ratio) with novelty = 1 - shared/total, 4-dp rounded.

    Scale shape (round 11, guide §2.3/§2.4): the only corpus-sized
    exchange left is the map-side-combined groupBy(gram). Per-doc
    distinct grams dedup IN-ROW (array_distinct — no (doc,gram)
    distinct shuffle), per-doc totals are a map-side-combined count
    keyed by doc (doc-count-sized shuffle bytes), and instead of
    joining document-frequency back onto the full pair stream,
    n_shared is derived by complement: a gram with df == 1 has exactly
    one owner, recoverable as min(doc_id) INSIDE the same gram
    aggregate, so n_shared = n_grams − n_unique where n_unique counts
    the doc's df==1 grams. vs the round-8 shape (distinct → groupBy g
    → join back → groupBy doc) this removes BOTH full-stream
    exchanges (the distinct and the join re-shuffle); the cost is the
    tokenize running once per branch — pure in-task CPU, no network.
    No broadcast of corpus-sized state, no all-pairs join. The explode
    fans out ~|doc| grams per row, so the input is first spread across
    cores (scan partitioning is sized by PRE-explode bytes — a compact
    parquet file otherwise serializes the tokenize + explode on a
    couple of tasks; measured 18.7 s → 8.9 s at sf1)."""
    from .scale import ensure_min_partitions

    t = tokens(F.col(text_col))
    grams_arr = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(t, i, n), " "),
    )
    # the repartition exchange is shared by both branches (ReuseExchange),
    # so the parquet scan runs once; only the in-row tokenize repeats
    spread = ensure_min_partitions(docs.select(id_col, text_col))
    pairs = spread.select(id_col, F.explode(F.array_distinct(grams_arr)).alias("g"))
    totals = pairs.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    uniq = (
        pairs.groupBy("g")
        .agg(F.count(F.lit(1)).alias("__df"), F.min(id_col).alias("__owner"))
        .filter(F.col("__df") == 1)
        .groupBy(F.col("__owner").alias(id_col))
        .agg(F.count(F.lit(1)).alias("__n_unique"))
    )
    return (
        totals.join(uniq, id_col, "left")
        .select(
            id_col,
            "n_grams",
            (F.col("n_grams") - F.coalesce(F.col("__n_unique"), F.lit(0))).alias(
                "n_shared"
            ),
        )
        .select(
            id_col,
            "n_grams",
            "n_shared",
            F.round(
                F.lit(1.0) - F.col("n_shared").cast("double") / F.col("n_grams"), 4
            ).alias("novelty_ratio"),
        )
    )


def tfidf_keywords(
    docs: DataFrame,
    top_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc keyword extraction by tf-idf: the top_k tokens ranked
    by term-frequency x inverse-document-frequency — the baseline
    lexical summarizer behind tagging, routing, and sparse retrieval.
    Returns (doc_id, keyword, tf, score_units) with ties broken
    alphabetically.

    Exactness: idf is integer-quantized (qln((N+1)/(df+1)), the
    unigram_logprob pattern) and score_units = tf * idf_units stays
    an exact integer, so ranking is reproducible under any
    partitioning and bit-replayable in SQL.

    Scale: tf is one map-side-combined (doc, tok) count; df one
    tok-keyed distinct-doc count joined back on tok; the top_k is a
    window PARTITIONED by doc — nothing global, no Python."""
    from .scale import ensure_min_partitions

    toks = ensure_min_partitions(docs.select(id_col, text_col)).select(
        id_col, F.explode(tokens(F.col(text_col))).alias("tok")
    )
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("__df"))
    n_docs = docs.select(id_col).distinct().count()
    idf_units = F.floor(
        F.log((F.lit(n_docs) + 1) / (F.col("__df") + 1)) * 1e6 + F.lit(0.5)
    ).cast("long")
    scored = tf.join(df_, "tok").select(
        id_col,
        F.col("tok").alias("keyword"),
        "tf",
        (F.col("tf") * idf_units).alias("score_units"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score_units"), F.asc("keyword")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select(id_col, "keyword", "tf", "score_units", "rnk")
    )
