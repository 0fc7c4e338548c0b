"""Wave-50 query catalog: revenue bridge decomposition and
business-day latency.

New operator families:
  - revenue_bridge_decomposition  the finance-classic price/volume/mix
                          bridge between two years: ΔRevenue split
                          into price effect, volume effect, cross
                          term, new-part and discontinued-part
                          buckets, with the bridge identity residual
                          REPORTED (exactly 0 up to the documented
                          double-sum noise) — the waterfall every
                          revenue dashboard draws, computed exactly
  - business_days_latency weekday-count (Mon-Fri) latency from
                          commit to receipt per order priority, via
                          the closed-form weekdays-before-epoch-
                          anchor formula — pure integer arithmetic,
                          no calendar table scan, identical on both
                          engines

Hash-safety: revenue is quantized to exact integer cents per row
before any aggregation; business days are pure integer closed-form;
per-part unit prices are the only divisions and the effect sums are
documented order-dependent at ~1e-9 (rounded at 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register
from .session import load_table

# ----------------------------------------------------------------------
# Price/volume/mix revenue bridge
# ----------------------------------------------------------------------

BRIDGE_Y0, BRIDGE_Y1 = 1996, 1997


@register(
    "revenue_bridge_decomposition",
    f"""
    WITH li AS (
      SELECT l_partkey,
             year(CAST(l_shipdate AS DATE)) AS yr,
             CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                  AS BIGINT) AS cents,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty
      FROM lineitem
      WHERE year(CAST(l_shipdate AS DATE)) IN ({BRIDGE_Y0}, {BRIDGE_Y1})
    ),
    per_part AS (
      SELECT l_partkey,
             CAST(sum(CASE WHEN yr = {BRIDGE_Y0} THEN cents ELSE 0 END)
                  AS BIGINT) AS c0,
             CAST(sum(CASE WHEN yr = {BRIDGE_Y0} THEN qty ELSE 0 END)
                  AS BIGINT) AS q0,
             CAST(sum(CASE WHEN yr = {BRIDGE_Y1} THEN cents ELSE 0 END)
                  AS BIGINT) AS c1,
             CAST(sum(CASE WHEN yr = {BRIDGE_Y1} THEN qty ELSE 0 END)
                  AS BIGINT) AS q1
      FROM li GROUP BY l_partkey
    ),
    eff AS (
      SELECT
        CAST(sum(c0) AS BIGINT) AS rev0_cents,
        CAST(sum(c1) AS BIGINT) AS rev1_cents,
        CAST(sum(CASE WHEN q0 > 0 AND q1 > 0
             THEN CAST(floor(c1 * q0 * 10000.0 / q1 + 0.5) AS BIGINT)
                  - c0 * 10000 ELSE 0 END) AS BIGINT) AS price_u,
        CAST(sum(CASE WHEN q0 > 0 AND q1 > 0
             THEN CAST(floor(c0 * (q1 - q0) * 10000.0 / q0 + 0.5) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS vol_u,
        CAST(sum(CASE WHEN q0 > 0 AND q1 > 0
             THEN CAST(floor(c1 * (q1 - q0) * 10000.0 / q1 + 0.5) AS BIGINT)
                  - CAST(floor(c0 * (q1 - q0) * 10000.0 / q0 + 0.5) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS cross_u,
        CAST(sum(CASE WHEN q0 = 0 THEN c1 ELSE 0 END) AS BIGINT)
          AS new_cents,
        CAST(sum(CASE WHEN q1 = 0 THEN c0 ELSE 0 END) AS BIGINT)
          AS gone_cents
      FROM per_part
    )
    SELECT round(rev0_cents / 100.0, 2) AS revenue_y0,
           round(rev1_cents / 100.0, 2) AS revenue_y1,
           CAST(floor(price_u / 100.0 + 0.5) AS BIGINT) / 10000.0
             AS price_effect,
           CAST(floor(vol_u / 100.0 + 0.5) AS BIGINT) / 10000.0
             AS volume_effect,
           CAST(floor(cross_u / 100.0 + 0.5) AS BIGINT) / 10000.0
             AS cross_effect,
           round(new_cents / 100.0, 2) AS new_parts,
           round(gone_cents / 100.0, 2) AS discontinued_parts,
           CAST(floor(((rev1_cents - rev0_cents) * 10000
                       - (price_u + vol_u + cross_u
                          + (new_cents - gone_cents) * 10000)) / 100.0 + 0.5)
                AS BIGINT) / 10000.0
             + 0.0 AS residual
    FROM eff
    """,
)
def revenue_bridge_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price/volume/mix bridge from {y0} to {y1} revenue at part
    grain: for parts sold both years, ΔRev splits into price effect
    (Δunit-price × old volume), volume effect (old price × Δvolume)
    and the cross term; parts sold only in one year land in the
    new/discontinued buckets. Every per-part effect is quantized to
    exact integer 10⁻⁴-cent units (floor(x·10⁴ + 0.5) of a rational
    whose numerator stays far inside 2⁵³), so the effect SUMS are
    order-free integers and hash identically on any engine; the
    bridge identity ΔRev = price + volume + cross + new − discontinued
    holds up to the reported `residual`, which is pure per-part
    quantization (≤10⁻⁴ cents × parts) — anything larger means the
    decomposition itself broke.

    Scale: one filtered scan (year predicate pushed to parquet), one
    part-keyed aggregate, one 7-number integer reduce. Unit prices
    are the only divisions.
    """.format(y0=BRIDGE_Y0, y1=BRIDGE_Y1)
    li = load_table(spark, sf_dir, "lineitem")
    yr = F.year(F.to_date("l_shipdate"))
    base = li.where(yr.isin(BRIDGE_Y0, BRIDGE_Y1)).select(
        "l_partkey",
        yr.alias("yr"),
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0 + F.lit(0.5)
        )
        .cast("bigint")
        .alias("cents"),
        F.floor(F.col("l_quantity") + 0.5).cast("bigint").alias("qty"),
    )

    def ysum(col, y):
        return F.sum(F.when(F.col("yr") == y, F.col(col)).otherwise(0)).cast("bigint")

    per_part = base.groupBy("l_partkey").agg(
        ysum("cents", BRIDGE_Y0).alias("c0"),
        ysum("qty", BRIDGE_Y0).alias("q0"),
        ysum("cents", BRIDGE_Y1).alias("c1"),
        ysum("qty", BRIDGE_Y1).alias("q1"),
    )
    both = (F.col("q0") > 0) & (F.col("q1") > 0)

    def qdiv(num, den):
        # exact half-up quantization of a rational to 1e-4-cent units;
        # the double numerator stays far inside 2^53 at any rung
        return F.floor(num * 10000.0 / den + F.lit(0.5)).cast("bigint")

    dq = F.col("q1") - F.col("q0")
    price_u = F.when(
        both, qdiv(F.col("c1") * F.col("q0"), F.col("q1")) - F.col("c0") * 10000
    ).otherwise(F.lit(0))
    vol_u = F.when(both, qdiv(F.col("c0") * dq, F.col("q0"))).otherwise(F.lit(0))
    cross_u = F.when(
        both, qdiv(F.col("c1") * dq, F.col("q1")) - qdiv(F.col("c0") * dq, F.col("q0"))
    ).otherwise(F.lit(0))
    eff = per_part.agg(
        F.sum("c0").cast("bigint").alias("rev0_cents"),
        F.sum("c1").cast("bigint").alias("rev1_cents"),
        F.sum(price_u).cast("bigint").alias("price_u"),
        F.sum(vol_u).cast("bigint").alias("vol_u"),
        F.sum(cross_u).cast("bigint").alias("cross_u"),
        F.sum(F.when(F.col("q0") == 0, F.col("c1")).otherwise(0))
        .cast("bigint")
        .alias("new_cents"),
        F.sum(F.when(F.col("q1") == 0, F.col("c0")).otherwise(0))
        .cast("bigint")
        .alias("gone_cents"),
    )
    def q4(col):
        # half-up to 1e-4 dollars IN INTEGER SPACE, then one double
        # division: engine-independent, unlike round(x, 4) on a double
        # (Spark's BigDecimal half-up vs DuckDB's binary rounding
        # disagree on exact .5 ties — caught by the sf5 sweep when the
        # residual landed on -5650e-6, a 4-decimal tie)
        return F.floor(col / F.lit(100.0) + F.lit(0.5)).cast("bigint") / F.lit(10000.0)

    return eff.select(
        F.round(F.col("rev0_cents") / 100.0, 2).alias("revenue_y0"),
        F.round(F.col("rev1_cents") / 100.0, 2).alias("revenue_y1"),
        q4(F.col("price_u")).alias("price_effect"),
        q4(F.col("vol_u")).alias("volume_effect"),
        q4(F.col("cross_u")).alias("cross_effect"),
        F.round(F.col("new_cents") / 100.0, 2).alias("new_parts"),
        F.round(F.col("gone_cents") / 100.0, 2).alias("discontinued_parts"),
        (
            q4(
                (F.col("rev1_cents") - F.col("rev0_cents")) * 10000
                - (
                    F.col("price_u")
                    + F.col("vol_u")
                    + F.col("cross_u")
                    + (F.col("new_cents") - F.col("gone_cents")) * 10000
                )
            )
            + F.lit(0.0)
        ).alias("residual"),
    )


# ----------------------------------------------------------------------
# Business-day latency
# ----------------------------------------------------------------------

# Monday anchor: 1995-01-02 is a Monday; weekdays_before(d) counts
# Mon-Fri days in [anchor, d)
_ANCHOR = "1995-01-02"


def _wb_sql(col: str) -> str:
    return (
        f"(5 * (datediff('day', DATE '{_ANCHOR}', {col}) // 7)"
        f" + least(datediff('day', DATE '{_ANCHOR}', {col}) % 7, 5))"
    )


@register(
    "business_days_latency",
    f"""
    WITH li AS (
      SELECT o.o_orderpriority AS priority,
             CAST(o.o_orderdate AS DATE) AS cd,
             CAST(l.l_shipdate AS DATE) AS rd
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
        AND o.o_orderdate >= TIMESTAMP '{_ANCHOR} 00:00:00'
    ),
    scored AS (
      SELECT priority,
             CAST({_wb_sql('rd')} - {_wb_sql('cd')} AS BIGINT) AS bdays
      FROM li
    )
    SELECT priority, count(*) AS n,
           CAST(sum(bdays) AS BIGINT) AS total_bdays,
           round(sum(bdays) * 1.0 / count(*), 4) AS avg_bdays
    FROM scored GROUP BY priority
    """,
)
def business_days_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average order→ship latency in BUSINESS days (Mon-Fri) per
    order priority, using the closed-form weekday count from a Monday
    anchor: weekdays_before(d) = 5·(days//7) + min(days%7, 5). Pure
    integer arithmetic — no calendar-dimension scan, no UDF, and
    bit-identical across engines.

    Scale: one fact-fact equi-join (orderkey) and one
    map-side-combined aggregate per priority; the date predicates push
    to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("rd")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("cd"),
    )
    anchor = F.lit(_ANCHOR).cast("date")

    def wb(c):
        days = F.datediff(F.col(c), anchor)
        return 5 * F.floor(days / 7).cast("bigint") + F.least(
            (days % 7).cast("bigint"), F.lit(5).cast("bigint")
        )

    scored = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .where((F.col("rd") >= F.col("cd")) & (F.col("cd") >= anchor))
        .select("priority", (wb("rd") - wb("cd")).cast("bigint").alias("bdays"))
    )
    return scored.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bdays").cast("bigint").alias("total_bdays"),
        F.round(F.sum("bdays") * 1.0 / F.count(F.lit(1)), 4).alias("avg_bdays"),
    )
