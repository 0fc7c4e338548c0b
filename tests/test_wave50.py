"""Wave-50 pins: bridge identity with quantization-bounded residual +
a constructed price-only/volume-only fixture, and business-day
arithmetic against a python calendar replay."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table


def test_bridge_identity_real_data(spark, sf_dir):
    r = QUERIES["revenue_bridge_decomposition"](spark, sf_dir).first()
    assert r.revenue_y0 > 0 and r.revenue_y1 > 0
    # residual is pure per-part quantization: <= 1e-4 cents per part
    li = load_table(spark, sf_dir, "lineitem")
    n_parts = li.select("l_partkey").distinct().count()
    assert abs(r.residual) <= n_parts * 3e-6 + 1e-6
    lhs = r.revenue_y1 - r.revenue_y0
    rhs = r.price_effect + r.volume_effect + r.cross_effect + r.new_parts - r.discontinued_parts
    assert abs(lhs - rhs) < max(1.0, abs(lhs) * 1e-4)


def test_bridge_constructed_effects(spark, tmp_path):
    """Part 1: price doubles, volume constant => pure price effect.
    Part 2: volume doubles, price constant => pure volume effect."""
    rows = []
    k = 0
    # part 1: y0 10 units @ $1; y1 10 units @ $2
    for yr, price in ((1996, 1.0), (1997, 2.0)):
        for _ in range(10):
            rows.append((k, 1, 1.0, price, 0.0, dt.datetime(yr, 6, 1)))
            k += 1
    # part 2: y0 10 units @ $1; y1 20 units @ $1
    for yr, n in ((1996, 10), (1997, 20)):
        for _ in range(n):
            rows.append((k, 2, 1.0, 1.0, 0.0, dt.datetime(yr, 6, 1)))
            k += 1
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = QUERIES["revenue_bridge_decomposition"](spark, str(tmp_path)).first()
    assert r.revenue_y0 == 20.0 and r.revenue_y1 == 40.0
    assert r.price_effect == 10.0   # part 1: ($2-$1) x 10 units
    assert r.volume_effect == 10.0  # part 2: $1 x (20-10)
    assert r.cross_effect == 0.0 and r.residual == 0.0
    assert r.new_parts == 0.0 and r.discontinued_parts == 0.0


def test_business_days_python_replay(spark, sf_dir):
    rows = QUERIES["business_days_latency"](spark, sf_dir).collect()
    assert len(rows) >= 1
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("cd")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("rd")
    )
    sample = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .where(F.col("cd") >= F.lit("1995-01-02").cast("date"))
        .where(F.col("rd") >= F.col("cd"))
        .limit(200)
        .collect()
    )

    def bdays(a, b):
        n = 0
        d = a
        while d < b:
            if d.weekday() < 5:
                n += 1
            d += dt.timedelta(days=1)
        return n

    # spot-check the closed form against brute force on sampled rows
    anchor = dt.date(1995, 1, 2)

    def wb(d):
        days = (d - anchor).days
        return 5 * (days // 7) + min(days % 7, 5)

    for s in sample[:50]:
        assert wb(s.rd) - wb(s.cd) == bdays(s.cd, s.rd)


def test_business_days_weekend_fixture(spark, tmp_path):
    """Friday -> Monday spans zero business days beyond Friday itself:
    wb counts Mon-Fri in [a, b), so Fri->Mon = 1 (the Friday)."""
    fri = dt.datetime(2024, 1, 5)   # Friday
    mon = dt.datetime(2024, 1, 8)   # Monday
    spark.createDataFrame(
        [(1, mon)], "l_orderkey long, l_shipdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, "1-URGENT", fri)],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = QUERIES["business_days_latency"](spark, str(tmp_path)).first()
    assert r.n == 1 and r.total_bdays == 1 and r.avg_bdays == 1.0
