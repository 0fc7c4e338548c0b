"""Wave-39 query catalog: exact set-similarity at scale, schema
profiling, and optimizer cardinality estimation.

New operator families:
  - jaccard_prefix_join   prefix-filtered exact set-similarity join
                          (PPJoin family — Chaudhuri et al. 2006,
                          Xiao et al. 2008): index only each doc's
                          rarest n - ceil(t*n) + 1 shingles; any pair
                          with Jaccard >= t MUST collide in those
                          prefixes, so the exact answer comes from a
                          candidate set far smaller than the full
                          inverted-index join. The oracle computes the
                          UNFILTERED quadratic answer — hash-matching
                          it proves the filter admits no false
                          negatives.
  - fd_discovery          functional-dependency / candidate-key
                          profiling: exact violation counts for a
                          panel of A -> B hypotheses (the schema-
                          inference pass a catalog crawler runs)
  - join_size_cms         sketch-based join cardinality estimation
                          (AGMS/CMS inner product): |A join B| is
                          estimated as the inner product of the two
                          sides' count-min rows BEFORE running the
                          join — the optimizer stat that picks
                          broadcast vs shuffle; the estimate is a
                          provable overcount, published per hash row
                          against the exact join size.

Hash-safety: exact integers everywhere; Jaccard as (10000*i) DIV u
basis points; md5 hashes reuse the first-32-bit convention and the
wave-37 CMS geometry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import dedup
from .operators.sketches import _md5_u32
from .queries import register
from .queries_wave37 import CMS_D, CMS_W, _H32
from .session import load_table

# ----------------------------------------------------------------------
# prefix-filtered exact Jaccard join
# ----------------------------------------------------------------------

PF_BP = 8000  # Jaccard threshold in basis points (0.8)


def _prefix_join_oracle() -> str:
    # The UNFILTERED inverted-index answer: if the Spark side's prefix
    # filter dropped a true pair, the hashes cannot match.
    return f"""
    WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      FROM toks, UNNEST(generate_series(1, greatest(len(t)-2, 1))) AS g(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, CAST(i AS BIGINT) AS inter,
           CAST((10000 * i) // (sa.n + sb.n - i) AS BIGINT) AS jaccard_bp
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE (10000 * i) // (sa.n + sb.n - i) >= {PF_BP}
    """


def prefix_filtered_jaccard_pairs(
    docs: DataFrame,
    threshold_bp: int = PF_BP,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard-threshold pairs via prefix filtering: shingles are
    canonically ordered by (global frequency asc, shingle asc); a doc
    with n shingles indexes only its first p = n - ceil(t*n) + 1. Two
    docs with J >= t share > (1-t)(na+nb)/(1+t) shingles, so their
    rarest-p prefixes must intersect — candidates come from the
    prefix-x-prefix join, then exact intersections are computed only
    for candidates. Returns (id_a, id_b, inter, jaccard_bp).

    Scale: the prefix index is ~(1-t) of the full inverted index and
    skips the head of the shingle frequency distribution entirely (the
    rarest shingles are the prefix), so the candidate join avoids the
    hot buckets that dominate a full index self-join; every stage is
    an equi-join or keyed window — no all-pairs anywhere."""
    from .session import track_cache

    # the index feeds FOUR consumers (freq, ranking, sizes, both
    # intersection probes) — cache so tokenize+explode runs once
    idx = track_cache(dedup._shingle_index(docs, text_col, id_col, k))
    freq = idx.groupBy("__sh").agg(F.count(F.lit(1)).alias("__df"))
    ranked = idx.join(freq, "__sh").withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("__id").orderBy("__df", "__sh")
        ),
    )
    sizes = idx.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"))
    t_num, t_den = threshold_bp, 10000
    prefix = (
        ranked.join(sizes, "__id")
        # p = n - ceil(t*n) + 1, ceil via (t_num*n + t_den-1) DIV t_den
        .filter(
            F.col("__rn")
            <= F.col("__n")
            - F.expr(f"CAST(({t_num} * __n + {t_den - 1}) DIV {t_den} AS INT)")
            + 1
        )
        .select("__id", "__sh")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(b, (F.col("a.__sh") == F.col("b.__sh")) & (F.col("a.__id") < F.col("b.__id")))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    ia = idx.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sha"))
    ib = idx.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__shb"))
    inter = (
        cand.join(ia, "id_a")
        .join(ib, ["id_b"])
        .filter(F.col("__sha") == F.col("__shb"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"))
    sb = sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard_bp",
            F.expr("CAST((10000 * inter) DIV (__na + __nb - inter) AS BIGINT)"),
        )
        .filter(F.col("jaccard_bp") >= threshold_bp)
        .select("id_a", "id_b", F.col("inter").cast("bigint").alias("inter"), "jaccard_bp")
    )


@register("jaccard_prefix_join", _prefix_join_oracle())
def jaccard_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.8 pairs via PPJoin-style prefix filtering;
    the oracle runs the UNFILTERED quadratic inverted-index join, so a
    hash match proves the prefix filter's no-false-negative theorem on
    real data (see prefix_filtered_jaccard_pairs for the scale
    argument; pytest additionally pins candidate-count < full-index
    pair count — the pruning evidence)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return prefix_filtered_jaccard_pairs(docs)


# ----------------------------------------------------------------------
# functional-dependency discovery
# ----------------------------------------------------------------------

FD_PANEL = [
    ("o_orderkey", "o_custkey"),  # key -> anything: holds
    ("o_orderkey", "o_orderstatus"),  # holds (key lhs)
    ("o_custkey", "o_orderpriority"),  # fails: customers reorder
    ("o_orderpriority", "o_orderstatus"),  # fails: 5 -> 3 values
]


def _fd_oracle() -> str:
    rows = "\n      UNION ALL\n".join(
        f"""      SELECT '{a}' AS lhs, '{b}' AS rhs,
             count(*) AS n_groups,
             CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_groups,
             CAST(sum(ndv - 1) AS BIGINT) AS n_surplus_values,
             CAST(CASE WHEN sum(ndv - 1) = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS holds
      FROM (SELECT {a}, count(DISTINCT {b}) AS ndv FROM orders GROUP BY 1)"""
        for a, b in FD_PANEL
    )
    return rows


@register("fd_discovery", _fd_oracle())
def fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency profiling: for each A -> B hypothesis in
    the panel, the exact number of A-groups carrying more than one B
    value and the total surplus — the schema-inference pass a catalog
    crawler runs to find keys and denormalization opportunities.
    holds=1 iff the dependency is exact.

    Scale: each hypothesis is one (A, B) distinct-count aggregation —
    map-side combinable, shuffle keyed on A; the panel is fixed-size,
    so the whole audit is a handful of independent scans Catalyst can
    share via cache or run concurrently."""
    orders = load_table(spark, sf_dir, "orders")
    outs = []
    for a, b in FD_PANEL:
        g = orders.groupBy(a).agg(F.countDistinct(b).alias("ndv"))
        outs.append(
            g.agg(
                F.lit(a).alias("lhs"),
                F.lit(b).alias("rhs"),
                F.count(F.lit(1)).alias("n_groups"),
                F.sum((F.col("ndv") > 1).cast("int"))
                .cast("bigint")
                .alias("n_violating_groups"),
                F.sum(F.col("ndv") - 1).cast("bigint").alias("n_surplus_values"),
            ).select(
                "lhs",
                "rhs",
                "n_groups",
                "n_violating_groups",
                "n_surplus_values",
                F.when(F.col("n_surplus_values") == 0, 1)
                .otherwise(0)
                .cast("bigint")
                .alias("holds"),
            )
        )
    out = outs[0]
    for x in outs[1:]:
        out = out.unionByName(x)
    return out


# ----------------------------------------------------------------------
# sketch-based join cardinality estimation
# ----------------------------------------------------------------------


def _join_size_oracle() -> str:
    h = _H32.format(s="CAST(ds.d AS VARCHAR) || ':' || CAST({k} AS VARCHAR)")
    return f"""
    WITH ds AS (SELECT unnest([0, 1, 2, 3]) AS d),
    a AS (SELECT user_id FROM events WHERE event_type = 'click'),
    b AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
    ra AS (
      SELECT ds.d, {h.format(k="a.user_id")} % {CMS_W} AS idx, count(*) AS reg
      FROM a CROSS JOIN ds GROUP BY 1, 2
    ),
    rb AS (
      SELECT ds.d, {h.format(k="b.user_id")} % {CMS_W} AS idx, count(*) AS reg
      FROM b CROSS JOIN ds GROUP BY 1, 2
    ),
    est AS (
      SELECT ra.d, sum(ra.reg * rb.reg) AS est_join
      FROM ra JOIN rb ON ra.d = rb.d AND ra.idx = rb.idx
      GROUP BY 1
    ),
    ex AS (
      SELECT sum(ca.c * cb.c) AS exact_join FROM
        (SELECT user_id, count(*) AS c FROM a GROUP BY 1) ca
        JOIN (SELECT user_id, count(*) AS c FROM b GROUP BY 1) cb
        USING (user_id)
    )
    SELECT CAST(est.d AS BIGINT) AS d,
           CAST(est.est_join AS BIGINT) AS est_join,
           CAST(ex.exact_join AS BIGINT) AS exact_join,
           CAST(est.est_join - ex.exact_join AS BIGINT) AS overcount
    FROM est CROSS JOIN ex
    """


@register("join_size_cms", _join_size_oracle())
def join_size_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join cardinality estimation from count-min sketches (the
    AGMS-style inner product): |clicks join purchases on user_id| =
    sum_k a_k*b_k is estimated per hash row as sum_w A[d][w]*B[d][w]
    — computable from two 256-counter sketches BEFORE running the
    join, which is how an optimizer decides broadcast vs shuffle vs
    skew handling. Hash collisions only ADD cross terms, so every
    row's estimate is >= the exact size (overcount >= 0, published
    per row; the serving estimate takes the min).

    Scale: each side's sketch is one map-side-combinable aggregate
    into d*w = 256 counters regardless of input size, mergeable
    across partitions; the estimate is a 256-row join. The exact
    column is the audit — at 100 TB you'd publish only the sketch."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")

    def regs(df: DataFrame) -> DataFrame:
        keyed = df.select(
            F.posexplode(
                F.array(
                    *[
                        (
                            _md5_u32(
                                F.concat(
                                    F.lit(f"{d}:"), F.col("user_id").cast("string")
                                )
                            )
                            % CMS_W
                        )
                        for d in range(CMS_D)
                    ]
                )
            ).alias("d", "idx")
        )
        return keyed.groupBy("d", "idx").agg(F.count(F.lit(1)).alias("reg"))

    a = ev.filter(F.col("event_type") == "click")
    b = ev.filter(F.col("event_type") == "purchase")
    ra = regs(a)
    rb = regs(b).select("d", "idx", F.col("reg").alias("reg_b"))
    est = (
        ra.join(rb, ["d", "idx"])
        .groupBy("d")
        .agg(F.sum(F.col("reg") * F.col("reg_b")).alias("est_join"))
    )
    ca = a.groupBy("user_id").agg(F.count(F.lit(1)).alias("ca"))
    cb = b.groupBy("user_id").agg(F.count(F.lit(1)).alias("cb"))
    ex = (
        ca.join(cb, "user_id")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("exact_join"))
    )
    return est.crossJoin(F.broadcast(ex)).select(
        F.col("d").cast("bigint").alias("d"),
        F.col("est_join").cast("bigint").alias("est_join"),
        F.col("exact_join").cast("bigint").alias("exact_join"),
        (F.col("est_join") - F.col("exact_join")).cast("bigint").alias("overcount"),
    )
