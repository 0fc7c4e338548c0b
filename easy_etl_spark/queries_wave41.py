"""Wave-41 query catalog: corpus growth laws, entity-resolution
blocking strategies, and rank-similarity evaluation.

New operator families:
  - heaps_law_curve     vocabulary growth vs corpus size (Heaps 1978):
                        distinct-token count at each corpus decile via
                        token FIRST-OCCURRENCE doc — the curve that
                        predicts how much new vocabulary the next
                        10 TB of crawl will add (complements
                        vocab_coverage_curve, which profiles coverage
                        at FIXED corpus size)
  - snm_candidate_pairs sorted-neighborhood record linkage (Hernandez
                        & Stolfo 1995): sort entities by key, verify
                        only pairs within a rank window w — the
                        classic O(n*w) blocking alternative to
                        deletion-neighborhood blocking; the oracle
                        replays the strategy exactly, the pytest pins
                        recall against the exact edit-distance-1 set
  - rbo_rank_overlap    rank-biased overlap (Webber et al. 2010,
                        p=9/10) between two top-10 part rankings
                        (by revenue vs by quantity) in EXACT rational
                        arithmetic — the top-weighted "did the ranking
                        change" metric a retrieval/reporting pipeline
                        tracks across releases

Hash-safety: exact integers; RBO uses a common denominator
lcm(1..10)*10^10 / 10^6 folded into integer micro-units; money is quantized to
exact cents before ranking.
"""

from __future__ import annotations

from math import gcd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.textops import tokens
from .queries import register
from .session import load_table

# ----------------------------------------------------------------------
# Heaps'-law vocabulary growth
# ----------------------------------------------------------------------

HEAPS_STEPS = 10  # corpus deciles by doc_id


def _heaps_oracle() -> str:
    return f"""
    WITH d AS (SELECT doc_id, text FROM documents),
    bounds AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM d),
    dd AS (
      SELECT doc_id,
             least(CAST(({HEAPS_STEPS} * (doc_id - b.lo))
                        // (b.hi - b.lo + 1) AS BIGINT) + 1,
                   {HEAPS_STEPS}) AS decile,
             text
      FROM d CROSS JOIN bounds b
    ),
    tok AS (
      SELECT decile, doc_id, unnest(string_split(trim(text), ' ')) AS tok
      FROM dd
    ),
    occ AS (SELECT decile, count(*) AS occs FROM tok GROUP BY 1),
    first_seen AS (SELECT tok, min(decile) AS first_decile FROM tok GROUP BY 1),
    new_vocab AS (
      SELECT first_decile AS decile, count(*) AS new_types
      FROM first_seen GROUP BY 1
    ),
    steps AS (SELECT unnest(generate_series(1, {HEAPS_STEPS})) AS decile)
    SELECT CAST(s.decile AS BIGINT) AS decile,
           CAST(sum(o.occs) AS BIGINT) AS corpus_tokens,
           CAST(sum(coalesce(v.new_types, 0)) AS BIGINT) AS vocab_size
    FROM steps s
    JOIN occ o ON o.decile <= s.decile
    LEFT JOIN new_vocab v ON v.decile = o.decile
    GROUP BY 1
    """


@register("heaps_law_curve", _heaps_oracle())
def heaps_law_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth: cumulative corpus size (token
    occurrences) and vocabulary size (distinct types) at each corpus
    decile, computed from each type's FIRST-occurrence decile — one
    pass, no per-milestone rescan. The curve's flattening rate is what
    sizes tokenizer vocabularies for the NEXT crawl increment, where
    vocab_coverage_curve profiles the corpus you already have.

    Scale: token explode -> (per-decile occurrence counts) + (per-type
    min-decile) — both map-side combinable; the decile join is over
    10 x 10 bounded rows. First-occurrence via min() is the standard
    trick that turns 10 cumulative-distinct problems into one
    aggregation."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b = d.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
    dd = d.crossJoin(F.broadcast(b)).select(
        F.least(
            F.expr(
                f"CAST(({HEAPS_STEPS} * (doc_id - lo)) DIV (hi - lo + 1) AS BIGINT)"
            )
            + 1,
            F.lit(HEAPS_STEPS).cast("bigint"),
        ).alias("decile"),
        "text",
    )
    tok = dd.select("decile", F.explode(tokens(F.col("text"))).alias("tok"))
    occ = tok.groupBy("decile").agg(F.count(F.lit(1)).alias("occs"))
    new_vocab = (
        tok.groupBy("tok")
        .agg(F.min("decile").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    per = occ.join(new_vocab, "decile", "left").na.fill({"new_types": 0})
    steps = spark.range(1, HEAPS_STEPS + 1).select(F.col("id").alias("decile"))
    return (
        steps.join(F.broadcast(per), per["decile"] <= steps["decile"])
        .groupBy(steps["decile"].cast("bigint").alias("decile"))
        .agg(
            F.sum("occs").cast("bigint").alias("corpus_tokens"),
            F.sum("new_types").cast("bigint").alias("vocab_size"),
        )
    )


# ----------------------------------------------------------------------
# sorted-neighborhood record linkage
# ----------------------------------------------------------------------

SNM_W = 5  # rank window


def _snm_oracle() -> str:
    return f"""
    WITH names AS (SELECT DISTINCT s_name AS v FROM supplier),
    r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM names)
    SELECT a.v AS name_a, b.v AS name_b,
           CAST(b.rn - a.rn AS BIGINT) AS rank_gap,
           CAST(levenshtein(a.v, b.v) AS BIGINT) AS edit_dist
    FROM r a JOIN r b
      ON b.rn > a.rn AND b.rn <= a.rn + {SNM_W}
    WHERE levenshtein(a.v, b.v) <= 1
    """


@register("snm_candidate_pairs", _snm_oracle())
def snm_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood record linkage (Hernandez & Stolfo 1995):
    rank distinct names, compare each only to its w=5 rank successors,
    keep edit-distance <= 1 — O(n*w) candidate generation instead of
    O(n^2). The oracle replays the STRATEGY exactly (SNM is a
    candidate generator, not ground truth); the pytest MEASURES its
    recall against the exact deletion-neighborhood pair set
    (fuzzy_name_pairs): suffix edits sort adjacently and are caught,
    early-character edits sort far apart and are SNM's documented
    blind spot (production adds a second pass on a reversed/phonetic
    key and unions — still O(n*w)).

    Scale: ranking rides operators/ranking.global_row_number (banded,
    no single-partition sort); the window join is an explode of w
    rank offsets -> equi-join on rank, so candidates stay n*w even at
    100 TB. Multi-pass SNM (second sort key, e.g. reversed name)
    unions another n*w — still linear."""
    from .operators.ranking import global_row_number

    names = (
        load_table(spark, sf_dir, "supplier").select(F.col("s_name").alias("v")).distinct()
    )
    r = global_row_number(names, [F.col("v")], out_col="rn")
    probes = r.select(
        "v",
        F.explode(
            F.array(*[F.col("rn") + F.lit(i) for i in range(1, SNM_W + 1)])
        ).alias("rn_b"),
        F.col("rn").alias("rn_a"),
    )
    b = r.select(F.col("v").alias("name_b"), F.col("rn").alias("rn_b"))
    return (
        probes.join(b, "rn_b")
        .select(
            F.col("v").alias("name_a"),
            "name_b",
            (F.col("rn_b") - F.col("rn_a")).cast("bigint").alias("rank_gap"),
            F.levenshtein(F.col("v"), F.col("name_b")).cast("bigint").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 1)
    )


# ----------------------------------------------------------------------
# rank-biased overlap
# ----------------------------------------------------------------------

RBO_K = 10  # lcm(1..10)*10^10 ~ 2.5e13 keeps every weighted sum in int64
RBO_P_NUM, RBO_P_DEN = 9, 10  # p = 0.9


def _lcm(a: int, b: int) -> int:
    return a * b // gcd(a, b)


def _rbo_weights() -> tuple[list[int], int]:
    """Integer RBO weights: RBO@k = (1-p) * sum_{d=1..k} p^(d-1) A_d
    with A_d = overlap_d / d. Over the common denominator
    D = lcm(1..k) * den^k, the weight of overlap_d is
    w_d = (den-num) * num^(d-1) * den^(k-d) * (lcm/d) — all integers,
    so sum_d w_d * overlap_d is exact; micro-units divide by D DIV 1e6."""
    L = 1
    for d in range(1, RBO_K + 1):
        L = _lcm(L, d)
    ws = [
        (RBO_P_DEN - RBO_P_NUM)
        * (RBO_P_NUM ** (d - 1))
        * (RBO_P_DEN ** (RBO_K - d))
        * (L // d)
        for d in range(1, RBO_K + 1)
    ]
    D = L * RBO_P_DEN**RBO_K
    return ws, D


def _rbo_oracle() -> str:
    ws, D = _rbo_weights()
    w_case = " ".join(f"WHEN {d} THEN {w}" for d, w in enumerate(ws, start=1))
    return f"""
    WITH m AS (
      SELECT l_partkey,
             sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                 * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)))
               AS rev_c,
             CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1
    ),
    ra AS (
      SELECT l_partkey, row_number() OVER (ORDER BY rev_c DESC, l_partkey) AS rk
      FROM m QUALIFY rk <= {RBO_K}
    ),
    rb AS (
      SELECT l_partkey, row_number() OVER (ORDER BY qty DESC, l_partkey) AS rk
      FROM m QUALIFY rk <= {RBO_K}
    ),
    depths AS (SELECT unnest(generate_series(1, {RBO_K})) AS d),
    ov AS (
      SELECT dp.d,
             (SELECT count(*) FROM ra JOIN rb USING (l_partkey)
              WHERE ra.rk <= dp.d AND rb.rk <= dp.d) AS overlap_d
      FROM depths dp
    )
    SELECT CAST(d AS BIGINT) AS depth,
           CAST(overlap_d AS BIGINT) AS overlap_d,
           CAST(sum((CASE d {w_case} END) * overlap_d) OVER (ORDER BY d)
                // {D // 1_000_000} AS BIGINT) AS rbo_prefix_micro
    FROM ov
    """


@register("rbo_rank_overlap", _rbo_oracle())
def rbo_rank_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010) between the top-10
    parts by revenue and by quantity, p=0.9, in EXACT integer
    arithmetic (weights over lcm(1..10)*10^10, reported as cumulative
    micro-RBO per depth) — the top-weighted rank-similarity metric a
    reporting/retrieval pipeline tracks across releases, where
    Kendall/Spearman over-weight the tail.

    Scale: one part-keyed aggregate; both top-10s are TakeOrdered
    (orderBy().limit(k) — no global sort materializes); the depth
    table is 10 rows, so the overlap triangle join is constant-size
    regardless of data."""
    ws, D = _rbo_weights()
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy("l_partkey").agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("bigint")
            * (100 - F.floor(F.col("l_discount") * 100.0 + 0.5).cast("bigint"))
        ).alias("rev_c"),
        F.sum(F.floor(F.col("l_quantity") + 0.5).cast("bigint")).alias("qty"),
    )
    ra = (
        m.orderBy(F.col("rev_c").desc(), "l_partkey")
        .limit(RBO_K)
        .select(
            "l_partkey",
            F.row_number()
            .over(Window.orderBy(F.col("rev_c").desc(), "l_partkey"))
            .alias("rk_a"),
        )
    )
    rb = (
        m.orderBy(F.col("qty").desc(), "l_partkey")
        .limit(RBO_K)
        .select(
            "l_partkey",
            F.row_number()
            .over(Window.orderBy(F.col("qty").desc(), "l_partkey"))
            .alias("rk_b"),
        )
    )
    both = ra.join(rb, "l_partkey").select("rk_a", "rk_b")
    depths = spark.range(1, RBO_K + 1).select(F.col("id").alias("depth"))
    ov = (
        depths.join(
            F.broadcast(both),
            (F.col("rk_a") <= F.col("depth")) & (F.col("rk_b") <= F.col("depth")),
            "left",
        )
        .groupBy("depth")
        .agg(F.sum(F.when(F.col("rk_a").isNotNull(), 1).otherwise(0)).alias("overlap_d"))
    )
    w_case = " ".join(f"WHEN {d} THEN {w}" for d, w in enumerate(ws, start=1))
    wov = ov.select(
        F.col("depth").cast("bigint").alias("depth"),
        F.col("overlap_d").cast("bigint").alias("overlap_d"),
        F.expr(f"(CASE depth {w_case} END) * overlap_d").alias("__wov"),
    )
    # prefix sum over the 10-row depth frame via a bounded self-join —
    # an unpartitioned running window would be a global sort in the plan
    contrib = wov.select(F.col("depth").alias("d2"), F.col("__wov").alias("w2"))
    return (
        wov.join(F.broadcast(contrib), F.col("d2") <= F.col("depth"))
        .groupBy("depth", "overlap_d")
        .agg(
            F.expr(f"CAST(sum(w2) DIV {D // 1_000_000} AS BIGINT)").alias(
                "rbo_prefix_micro"
            )
        )
    )
