"""Seventh wave: the four TPC-H shapes that complete q1-q22 coverage
(adapted to the driver schema — no partsupp table, no
shipmode/commitdate columns; each keeps its original query's
*structural* challenge), plus the language-ID text operator as an
oracle-checked query.

  - q2_min_cost_supplier: Q2's correlated-min subquery (cheapest
    supplier per part), decorrelated into an aggregate + equality
    join on the min — the rewrite Catalyst itself applies to Q2.
  - q12_latency_buckets: Q12's CASE-bucketed dual conditional counts
    over the orders⋈lineitem join (ship latency stands in for the
    absent shipmode column).
  - q16_supplier_counts: Q16's COUNT(DISTINCT) per part attribute
    with a NOT-IN supplier exclusion (anti-join).
  - q20_promo_excess_suppliers: Q20's nested IN-subquery chain
    (parts slice → shipped-quantity threshold → supplier semi-join).
  - language_id: textops.lang_id confusion counts per labeled lang —
    the n-gram/profile-overlap heuristic of the LLM-pipeline brief,
    replayed exactly by the oracle's list_filter counts.

Scale notes per query are in the docstrings; every dimension-sized
side is broadcast and each query's only shuffles are the fact-fact
equi-join and the final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.exact import dec_sum, sql_sum
from .operators import textops
from .queries import register
from .session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q2_min_cost_supplier",
    """
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS min_unit
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, min(min_unit) AS best_unit FROM unit GROUP BY l_partkey
    )
    SELECT p.p_partkey, s.s_name, s.s_acctbal, n.n_name,
           round(u.min_unit, 4) AS unit_price
    FROM part p
    JOIN unit u ON u.l_partkey = p.p_partkey
    JOIN best b ON b.l_partkey = u.l_partkey AND u.min_unit = b.best_unit
    JOIN supplier s ON s.s_suppkey = u.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size >= 45 AND p.p_type = 'STANDARD'
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style minimum-cost supplier. The correlated min
    subquery decorrelates into a per-(part, supplier) aggregate plus
    an equality join against the per-part min — both aggregates
    partial-merge map-side, and the min-unit equality join keys on
    l_partkey so it rides the same shuffle as the aggregate. part /
    supplier / nation broadcast. The min is over identical double
    divisions on both engines, so the equality filter is bit-exact."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") >= 45) & (F.col("p_type") == "STANDARD")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("min_unit")
    )
    best = unit.groupBy("l_partkey").agg(F.min("min_unit").alias("best_unit"))
    return (
        unit.join(best, ["l_partkey"])
        .filter(F.col("min_unit") == F.col("best_unit"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey",
            "s_name",
            "s_acctbal",
            "n_name",
            F.round("min_unit", 4).alias("unit_price"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q12_latency_buckets",
    """
    SELECT CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                               CAST(l.l_shipdate AS DATE)) > 30
                THEN 'slow' ELSE 'fast' END AS ship_bucket,
           count(*) AS n_lines,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_lines
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def q12_latency_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style dual conditional counts per shipping bucket
    (ship latency replaces the absent shipmode column). One fact-fact
    equi-join, then a 2-group CASE aggregate — the conditional sums
    partial-aggregate before the exchange, so the shuffle carries two
    rows per map partition."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 30, "slow"
    ).otherwise("fast")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_lines"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_lines"),
        )
    )


@register(
    "q16_supplier_counts",
    """
    SELECT p.p_brand, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_type <> 'PROMO'
      AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
    LIMIT 40
    """,
)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style supplier counts per part attribute with a
    NOT-IN exclusion: the subquery compiles to a broadcast anti-join
    (complaint-supplier list is dimension-sized), the distinct count
    expands to a two-phase aggregate keyed by (brand, size, suppkey)
    then (brand, size) — no Expand node, both phases partial-merge."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") != "PROMO")
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
        .limit(40)
    )


@register(
    "q20_promo_excess_suppliers",
    f"""
    WITH promo AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
    shipped AS (
      SELECT l_suppkey, {sql_sum("l_quantity")} AS qty
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM promo)
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_name, s.s_acctbal, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM shipped WHERE qty > 100)
    ORDER BY s.s_name
    """,
)
def q20_promo_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style nested-IN chain: promo-parts slice → broadcast
    semi-join restricts the lineitem scan → per-supplier shipped
    quantity → threshold → semi-join back to supplier. Every IN is a
    (broadcast) left-semi; the only shuffle is the per-supplier
    aggregate. The date filter pushes to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    promo = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    excess = (
        li.join(F.broadcast(promo), "l_partkey", "left_semi")
        .groupBy("l_suppkey")
        .agg(dec_sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return (
        s.join(F.broadcast(excess), "s_suppkey", "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "s_acctbal", "n_name")
        .orderBy("s_name")
    )


def _lang_id_oracle() -> str:
    """DuckDB twin of textops.lang_id: profile-overlap counts +
    priority argmax, generated from LANG_PROFILES so the two can't
    drift."""
    counts = {
        lang: (
            "len(list_filter(toks, x -> x IN ("
            + ", ".join(f"'{w}'" for w in words)
            + ")))"
        )
        for lang, words in textops.LANG_PROFILES.items()
    }
    return f"""
    WITH t AS (
      SELECT lang, string_split(trim(text), ' ') AS toks FROM documents
    ),
    s AS (
      SELECT lang, {counts['en']} AS en, {counts['es']} AS es,
             {counts['de']} AS de
      FROM t
    )
    SELECT lang,
           CASE WHEN en >= es AND en >= de THEN 'en'
                WHEN es >= de THEN 'es'
                ELSE 'de' END AS predicted,
           count(*) AS n
    FROM s GROUP BY 1, 2
    """


@register("language_id", _lang_id_oracle())
def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion counts: textops.lang_id (profile-overlap
    argmax with fixed priority tie-break) against the labeled lang
    column. Pure Column algebra per row (split/filter/size — zero
    UDFs, embarrassingly parallel); the only shuffle is the final
    ≤15-group aggregate."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("lang", textops.lang_id(F.col("text")).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "date_dimension",
    """
    WITH span AS (
      SELECT CAST(min(o_orderdate) AS DATE) AS d0,
             CAST(max(o_orderdate) AS DATE) AS d1
      FROM orders
    ),
    days AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS d FROM span
    )
    SELECT CAST(year(d) * 10000 + month(d) * 100 + day(d) AS INTEGER) AS date_key,
           d AS date,
           CAST(year(d) AS INTEGER) AS year,
           CAST(quarter(d) AS INTEGER) AS quarter,
           CAST(month(d) AS INTEGER) AS month,
           CAST(day(d) AS INTEGER) AS day,
           CAST(isodow(d) AS INTEGER) AS iso_dow,
           CAST(week(d) AS INTEGER) AS week_of_year,
           monthname(d) AS month_name,
           isodow(d) IN (6, 7) AS is_weekend,
           day(d) = 1 AS is_month_start,
           d = last_day(d) AS is_month_end
    FROM days
    """,
)
def date_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kimball calendar dimension spanning the orders fact table
    (operators/dimensions.date_dimension) — the canonical dimension of
    the reference's star-schema domain (easy_etl/README.md:98,161-165
    links facts to a date dimension). One bounded min/max aggregate +
    sequence/explode; no driver loop."""
    from .operators.dimensions import date_dimension as build

    dim = build(_t(spark, sf_dir, "orders"), "o_orderdate")
    return dim.select(
        "date_key", "date", "year", "quarter", "month", "day", "iso_dow",
        "week_of_year", "month_name", "is_weekend", "is_month_start",
        "is_month_end",
    )


def _zorder_oracle(bits: int = 16) -> str:
    """DuckDB twin of dimensions.zorder_key — the interleave generated
    from the same bit positions."""
    terms = " + ".join(
        f"(((a >> {i}) & 1) << {2 * i + 1}) + (((b >> {i}) & 1) << {2 * i})"
        for i in range(bits)
    )
    return f"""
    WITH x AS (
      SELECT l_orderkey, l_linenumber,
             l_partkey % 65536 AS a, l_suppkey % 65536 AS b
      FROM lineitem WHERE l_orderkey < 200
    )
    SELECT l_orderkey, l_linenumber, CAST({terms} AS BIGINT) AS zkey
    FROM x
    """


@register("zorder_key_lineitem", _zorder_oracle())
def zorder_key_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton keys over (partkey, suppkey) (dimensions.zorder_key):
    the write-side clustering primitive that makes BOTH columns'
    row-group min/max statistics selective — multi-dimensional file
    skipping for the two-predicate scans a star schema issues. The
    oracle replays the bit interleave exactly."""
    from .operators.dimensions import zorder_key

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        zorder_key(F.col("l_partkey") % 65536, F.col("l_suppkey") % 65536).alias("zkey"),
    )


@register(
    "orders_by_calendar",
    f"""
    WITH span AS (
      SELECT CAST(min(o_orderdate) AS DATE) AS d0,
             CAST(max(o_orderdate) AS DATE) AS d1
      FROM orders
    ),
    days AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS d FROM span
    ),
    dim AS (
      SELECT d, CAST(year(d) AS INTEGER) AS year,
             CAST(quarter(d) AS INTEGER) AS quarter,
             isodow(d) IN (6, 7) AS is_weekend
      FROM days
    )
    SELECT dim.year, dim.quarter, dim.is_weekend,
           count(*) AS n_orders,
           {sql_sum("o.o_totalprice")} AS total_price
    FROM orders o JOIN dim ON CAST(o.o_orderdate AS DATE) = dim.d
    GROUP BY 1, 2, 3
    """,
)
def orders_by_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Kimball loop closed: facts joined to the GENERATED calendar
    dimension (dimensions.date_dimension) on the date key, rolled up
    by its attributes — the reference's star-schema pattern with the
    dimension built by the engine instead of hand-loaded. The dim is
    dimension-sized by construction (one row per day) → broadcast;
    the only shuffle is the ≤40-group aggregate."""
    from .operators.dimensions import date_dimension as build

    o = _t(spark, sf_dir, "orders")
    dim = build(o, "o_orderdate").select("date", "year", "quarter", "is_weekend")
    return (
        o.join(F.broadcast(dim), F.to_date("o_orderdate") == F.col("date"))
        .groupBy("year", "quarter", "is_weekend")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice").alias("total_price"),
        )
    )


@register(
    "dedup_containment",
    """
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
    SELECT id_a, id_b,
           round(i * 1.0 / least(sa.n, sb.n), 4) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE i * 1.0 / least(sa.n, sb.n) >= 0.9
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-superset dedup (dedup.containment_pairs):
    |A∩B| / min(|A|,|B|) ≥ 0.9 — catches excerpts and boilerplate
    wrappers whose symmetric Jaccard stays tiny. Same inverted-index
    self-join posture as dedup_ngram_jaccard."""
    from .operators import dedup as D

    return D.containment_pairs(_t(spark, sf_dir, "documents"), threshold=0.9)


@register(
    "null_safe_join",
    """
    WITH a AS (
      SELECT nullif(c_nationkey % 5, 0) AS k, count(*) AS n_customers
      FROM customer GROUP BY 1
    ),
    b AS (
      SELECT nullif(s_nationkey % 5, 0) AS k, count(*) AS n_suppliers
      FROM supplier GROUP BY 1
    )
    SELECT CAST(a.k AS INTEGER) AS k, a.n_customers, b.n_suppliers
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): the NULL
    bucket must match the NULL bucket, which a plain equi-join drops
    silently. Spark plans eqNullSafe as a hash join on a
    null-canonicalized key — same shuffle shape as ordinary equality,
    no nested-loop degradation."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    a = (
        c.select(F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    b = (
        s.select(F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(
        a["k"].alias("k"), "n_customers", "n_suppliers"
    )


from .operators.bpe import bpe_oracle_sql  # noqa: E402


@register("bpe_merges", bpe_oracle_sql(k=4))
def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, first 4 merges (operators/bpe.py):
    weighted adjacent-symbol pair counts over the word-frequency vocab,
    (count DESC, pair ASC) argmax, replace-to-fixpoint merge — the
    DuckDB oracle replays the whole training loop bit-for-bit,
    recursive-CTE fixpoint included. The corpus is touched once (word
    counts); every merge iteration runs on the dimension-sized vocab."""
    from .operators.bpe import train_merges

    return train_merges(_t(spark, sf_dir, "documents"), k=4)


from .operators.bpe import bpe_encode_oracle_sql  # noqa: E402


@register("bpe_encode_stats", bpe_encode_oracle_sql(k=4))
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language subword compression after the 4 trained BPE merges
    (operators/bpe.encode_stats): the encode is one join of
    (lang, word) counts against the trained vocab state — the oracle
    retrains and re-encodes from scratch, so the whole train+apply
    path is value-hash-checked."""
    from .operators.bpe import encode_stats

    return encode_stats(_t(spark, sf_dir, "documents"), k=4)


@register(
    "temperature_mix",
    """
    WITH src AS (
      SELECT source, count(*) AS n_docs,
             CAST(floor(sqrt(count(*)) * 1000000 + 0.5) AS BIGINT) AS wq
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(wq) AS BIGINT) AS w_all, count(*) AS n_src FROM src),
    base AS (
      SELECT source, n_docs, wq,
             (1000 * wq) // w_all AS floor_share,
             (1000 * wq) % w_all AS rem
      FROM src, tot
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rr,
             CAST((SELECT 1000 - sum(floor_share) FROM base) AS BIGINT) AS leftover
      FROM base
    )
    SELECT source, n_docs,
           CAST(floor_share + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS target_docs
    FROM ranked
    """,
)
def temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted training mix (T5-style): per-source budget
    ∝ n^0.5, allocated by largest-remainder rounding to exactly 1000
    docs. Integer-exact throughout — sqrt quantizes to fixed-point
    BEFORE the sum, so the total weight is an integer sum (order-free)
    and every share is integer division; no float accumulation ever
    crosses a floor boundary differently per engine. The whole
    computation runs on the per-source summary (dimension-sized); the
    corpus contributes one count aggregate."""
    docs = _t(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs")).withColumn(
        "wq", F.floor(F.sqrt(F.col("n_docs")) * 1000000 + F.lit(0.5)).cast("long")
    )
    tot = src.agg(F.sum("wq").cast("long").alias("w_all"))
    base = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.expr("1000 * wq div w_all").alias("floor_share"),
        ((F.lit(1000) * F.col("wq")) % F.col("w_all")).alias("rem"),
    )
    leftover = base.agg((F.lit(1000) - F.sum("floor_share")).cast("long").alias("lo"))
    from .operators.ranking import global_row_number

    # largest-remainder rank is the BANDED global row_number — the
    # per-source frame is dimension-sized today, but the plan carries
    # no single-partition sort at any cardinality
    return (
        global_row_number(
            base.crossJoin(F.broadcast(leftover)),
            [F.col("rem").desc(), F.col("source")],
            out_col="rr",
        )
        .select(
            "source",
            "n_docs",
            (
                F.col("floor_share")
                + F.when(F.col("rr") <= F.col("lo"), 1).otherwise(0)
            ).cast("long").alias("target_docs"),
        )
    )


@register(
    "unpivot_part_measures",
    """
    SELECT p_partkey, measure, round(value, 2) AS value
    FROM (
      SELECT p_partkey,
             CAST(p_size AS DOUBLE) AS size,
             p_retailprice AS retailprice
      FROM part WHERE p_partkey < 100
    )
    UNPIVOT (value FOR measure IN (size, retailprice))
    """,
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt (the inverse of pivot_status_by_flag): Spark's
    unpivot/melt against DuckDB's UNPIVOT. Map-side only — one row in,
    two out, no shuffle."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    wide = p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    return wide.unpivot(
        "p_partkey", ["size", "retailprice"], "measure", "value"
    ).select("p_partkey", "measure", F.round("value", 2).alias("value"))


@register(
    "histogram_order_totals",
    """
    SELECT CASE WHEN o_totalprice < 0 THEN 0
                WHEN o_totalprice >= 600000 THEN 13
                ELSE CAST(floor(o_totalprice / 50000.0) AS BIGINT) + 1 END AS bucket,
           count(*) AS n_orders,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders GROUP BY 1
    """,
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram over order totals (width_bucket semantics,
    spelled as explicit floor division so BOTH engines evaluate the
    identical IEEE expression — this DuckDB build lacks width_bucket).
    Pure map expression; the only shuffle is the ≤14-group aggregate."""
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 0, 0)
        .when(F.col("o_totalprice") >= 600000, 13)
        .otherwise(F.floor(F.col("o_totalprice") / 50000.0).cast("long") + 1)
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@register(
    "events_anomaly_zscore",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS q
      FROM hourly GROUP BY 1
    )
    SELECT hourly.event_type,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           c AS n_events,
           round((c - CAST(s AS DOUBLE) / n)
                 / sqrt((n * CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s)
                        / (CAST(n AS DOUBLE) * (n - 1))), 4) AS z
    FROM hourly JOIN stats ON hourly.event_type = stats.event_type
    WHERE n > 1
      AND abs((c - CAST(s AS DOUBLE) / n)
              / sqrt((n * CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s)
                     / (CAST(n AS DOUBLE) * (n - 1)))) > 2
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: hours whose event count sits >2
    sample-standard-deviations from the per-type mean. Moments are
    exact integer sums (S, Q) aggregated map-side; mean/variance/z are
    the SAME double expressions on both engines, so the |z|>2 cut is
    bit-deterministic. The per-type stats (≤ #types rows) broadcast
    back onto the hourly frame — two aggregates and a broadcast join,
    no window, at any scale."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (
        F.col("n") * F.col("q").cast("double") - F.col("s").cast("double") * F.col("s")
    ) / (F.col("n").cast("double") * (F.col("n") - 1))
    z = (F.col("c") - mean) / F.sqrt(var)
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .filter((F.col("n") > 1) & (F.abs(z) > 2))
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.col("c").alias("n_events"),
            F.round(z, 4).alias("z"),
        )
    )


@register(
    "events_enriched_heavy_users",
    f"""
    WITH user_stats AS (
      SELECT user_id, count(*) AS n_ev FROM events GROUP BY user_id
    )
    SELECT e.event_type,
           count(*) AS n_events,
           CAST(sum(CASE WHEN us.n_ev >= 50 THEN 1 ELSE 0 END) AS BIGINT)
             AS heavy_user_events,
           {sql_sum("CASE WHEN us.n_ev >= 50 THEN e.value ELSE 0 END")}
             AS heavy_user_value
    FROM events e JOIN user_stats us ON e.user_id = us.user_id
    GROUP BY e.event_type
    """,
)
def events_enriched_heavy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment join
    (streaming/jobs.enrich_stream): every event looks up its user's
    profile (here: lifetime event count) and the per-type aggregate
    splits out heavy-user traffic. The profile dimension broadcasts;
    the only shuffles are the profile aggregate and the ≤5-group
    rollup."""
    e = _t(spark, sf_dir, "events")
    us = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_ev"))
    heavy = F.col("n_ev") >= 50
    return (
        e.join(F.broadcast(us), "user_id")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(heavy, 1).otherwise(0)).alias("heavy_user_events"),
            dec_sum(F.when(heavy, F.col("value")).otherwise(0.0)).alias("heavy_user_value"),
        )
    )
