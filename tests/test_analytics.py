"""Hand-computed semantics for the behavioral-analytics operators
(funnel, cohort retention, trailing-hour RANGE frames) — the oracle
gate cross-checks them against DuckDB on driver data; these pin the
semantics on crafted inputs that survive testdata regeneration."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Window, functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )


def test_funnel_ordering_semantics(spark):
    d = datetime
    ev = _events(
        spark,
        [
            # user 1: full ordered funnel
            (1, d(2024, 1, 1, 0), 1, "view", 0.0),
            (2, d(2024, 1, 1, 1), 1, "click", 0.0),
            (3, d(2024, 1, 1, 2), 1, "purchase", 0.0),
            # user 2: purchase BEFORE click — not a conversion
            (4, d(2024, 1, 1, 0), 2, "view", 0.0),
            (5, d(2024, 1, 1, 2), 2, "click", 0.0),
            (6, d(2024, 1, 1, 1), 2, "purchase", 0.0),
            # user 3: view only
            (7, d(2024, 1, 1, 0), 3, "view", 0.0),
            # user 4: no view at all
            (8, d(2024, 1, 1, 0), 4, "click", 0.0),
        ],
    )

    def first_ts(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts"))).alias(f"t_{t}")

    u = ev.groupBy("user_id").agg(first_ts("view"), first_ts("click"), first_ts("purchase"))
    row = u.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.count(F.when(F.col("t_view") < F.col("t_click"), 1)).alias("n_vc"),
        F.count(
            F.when((F.col("t_view") < F.col("t_click")) & (F.col("t_click") < F.col("t_purchase")), 1)
        ).alias("n_vcp"),
    ).first()
    assert (row.n_users, row.n_view, row.n_vc, row.n_vcp) == (4, 3, 2, 1)


def test_cohort_day_offsets(spark):
    d = datetime
    ev = _events(
        spark,
        [
            (1, d(2024, 1, 1, 5), 1, "view", 0.0),   # cohort 01-01
            (2, d(2024, 1, 3, 6), 1, "view", 0.0),   # offset 2
            (3, d(2024, 1, 3, 7), 1, "click", 0.0),  # same day: one active row
            (4, d(2024, 1, 2, 1), 2, "view", 0.0),   # cohort 01-02
        ],
    )
    first_day = ev.groupBy("user_id").agg(F.date_trunc("day", F.min("ts")).alias("cohort_day"))
    activity = ev.select("user_id", F.date_trunc("day", F.col("ts")).alias("active_day")).distinct()
    j = first_day.join(activity, "user_id").select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
        F.datediff("active_day", "cohort_day").alias("off"),
    )
    got = sorted((r.cohort, r.off) for r in j.collect())
    assert got == [("2024-01-01", 0), ("2024-01-01", 2), ("2024-01-02", 0)]


def test_trailing_hour_range_frame(spark):
    d = datetime
    ev = _events(
        spark,
        [
            (1, d(2024, 1, 1, 0, 0, 0), 1, "view", 1.0),
            (2, d(2024, 1, 1, 0, 30, 0), 1, "view", 2.0),
            (3, d(2024, 1, 1, 1, 0, 0), 1, "view", 4.0),   # exactly 3600s after e1: in frame
            (4, d(2024, 1, 1, 2, 30, 0), 1, "view", 8.0),  # all others out of range
            (5, d(2024, 1, 1, 0, 30, 0), 2, "view", 16.0), # other user: own partition
        ],
    )
    w = Window.partitionBy("user_id").orderBy(F.unix_timestamp("ts")).rangeBetween(-3600, 0)
    out = {
        r.event_id: r.n
        for r in ev.select("event_id", F.count(F.lit(1)).over(w).alias("n")).collect()
    }
    assert out == {1: 1, 2: 2, 3: 3, 4: 1, 5: 1}


def test_pagerank_integer_recurrence_handcomputed(spark):
    from easy_etl_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([("A",), ("B",), ("C",), ("D",)], "node string")
    edges = spark.createDataFrame(
        [("A", "B"), ("A", "C"), ("B", "C")], "src string, dst string"
    )
    got = {r.node: r.rank_units for r in pagerank(nodes, edges, iters=1).collect()}
    # N=4: r0 = 1e15//4 = 250e12; base = 3e15//80 = 37.5e12
    # B gets A's 250e12//2; C gets 125e12 (A) + 250e12 (B)
    assert got == {
        "A": 37_500_000_000_000,              # no incoming: base only
        "B": 37_500_000_000_000 + (17 * 125_000_000_000_000) // 20,
        "C": 37_500_000_000_000 + (17 * 375_000_000_000_000) // 20,
        "D": 37_500_000_000_000,              # isolated vertex retained
    }


def test_frequent_pairs_basket_semantics(spark):
    from pyspark.sql import functions as F

    items = spark.createDataFrame(
        # order 1: {10, 20, 30}; order 2: {10, 20}; order 3: {10}
        [(1, 10), (1, 20), (1, 30), (2, 10), (2, 20), (3, 10), (1, 10)],
        "l_orderkey bigint, l_partkey bigint",
    ).distinct()
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .count()
    )
    got = {(r.pa, r.pb): r["count"] for r in pairs.collect()}
    assert got == {(10, 20): 2, (10, 30): 1, (20, 30): 1}


def test_pagerank_until_converges_and_extends_fixed_iters(spark, sf_dir):
    from easy_etl_spark.operators.graph import pagerank, pagerank_until
    from easy_etl_spark.session import load_table

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("C"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("S"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    nodes = (
        load_table(spark, sf_dir, "customer")
        .select(F.concat(F.lit("C"), F.col("c_custkey")).alias("node"))
        .unionByName(
            load_table(spark, sf_dir, "supplier").select(
                F.concat(F.lit("S"), F.col("s_suppkey")).alias("node")
            )
        )
    )
    tol = 10**10
    ranks, rounds, delta = pagerank_until(nodes, edges, tol_units=tol, max_iter=40)
    assert delta <= tol, f"did not converge in 40 rounds (delta={delta})"
    assert 1 <= rounds < 40  # converges strictly before the safety cap
    # the convergence loop runs the SAME recurrence as the fixed-iters
    # oracle-checked variant: its state at round k equals pagerank(iters=k)
    fixed = pagerank(nodes, edges, iters=rounds)
    assert (
        ranks.alias("a")
        .join(fixed.alias("b"), "node")
        .filter(F.col("a.rank_units") != F.col("b.rank_units"))
        .count()
        == 0
    )


def test_zorder_cluster_narrows_file_bounding_boxes(spark, sf_dir, tmp_path):
    """The point of Z-ordering: after clustering on the Morton key of
    (a, b), EACH file's min/max range on BOTH columns is a small slice
    of the domain, so predicates on either column skip most files.
    Compare the summed per-file b-range against a layout partitioned
    only by a — which leaves every file's b-range at ~full width."""
    import pyarrow.parquet as pq

    from easy_etl_spark.operators.dimensions import zorder_cluster
    from easy_etl_spark.session import load_table

    # decorrelated full-domain keys (sf0.001's natural keys are too
    # low-cardinality to show clustering)
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 1024).alias("a"),
        ((F.col("l_orderkey") * 7919 + F.col("l_linenumber")) % 1024).alias("b"),
    )

    def ranges(path):
        out = []
        for f in (tmp_path / path).glob("*.parquet"):
            md = pq.read_metadata(f)
            names = md.schema.names
            bi = names.index("b")
            lo = min(md.row_group(i).column(bi).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(bi).statistics.max for i in range(md.num_row_groups))
            out.append(hi - lo)
        return out

    zorder_cluster(li, "a", "b", bits=10, num_files=8).write.parquet(str(tmp_path / "z"))
    li.repartitionByRange(8, "a").write.parquet(str(tmp_path / "bya"))
    z_ranges, a_ranges = ranges("z"), ranges("bya")
    assert len(z_ranges) >= 4
    # a-only layout: b is unclustered → every file spans ~the full domain
    assert min(a_ranges) > 900
    # z-order: average per-file b-width shrinks to a fraction of the domain
    assert sum(z_ranges) / len(z_ranges) < 0.7 * (sum(a_ranges) / len(a_ranges)), (
        z_ranges, a_ranges,
    )
