"""Wave-9 semantics pins: triangles, DAU/WAU, Pareto deciles, CUSUM,
and skyline — planted ground truths plus brute-force replays."""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import datetime, timedelta

from pyspark.sql import Row

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table


def test_triangle_count_on_planted_graph(spark, tmp_path):
    # order 1 holds parts {1,2,3} (a triangle), order 2 holds {3,4}
    rows = [
        Row(l_orderkey=1, l_partkey=1),
        Row(l_orderkey=1, l_partkey=2),
        Row(l_orderkey=1, l_partkey=3),
        Row(l_orderkey=2, l_partkey=3),
        Row(l_orderkey=2, l_partkey=4),
    ]
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = QUERIES["triangle_count"](spark, str(tmp_path)).collect()[0]
    assert got.n_nodes == 4
    assert got.n_edges == 4          # (1,2) (1,3) (2,3) (3,4)
    assert got.n_wedges == 5         # degs 2,2,3,1 -> 1+1+3+0
    assert got.n_triangles == 1
    assert got.global_clustering == 0.6


def test_dau_wau_matches_python_replay(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select("user_id", "ts").collect()
    epoch = datetime(1970, 1, 1).date()
    user_day = {(r.user_id, (r.ts.date() - epoch).days) for r in events}
    days = sorted({d for _, d in user_day})
    dau = defaultdict(set)
    for u, d in user_day:
        dau[d].add(u)
    got = {r.day_num: r for r in QUERIES["dau_wau_stickiness"](spark, sf_dir).collect()}
    assert set(got) == set(days)
    for d in days:
        wau = {u for u, dd in user_day if d - 6 <= dd <= d}
        assert got[d].dau == len(dau[d])
        assert got[d].wau == len(wau)
        assert got[d].stickiness == round(len(dau[d]) / len(wau), 6)


def test_pareto_deciles_partition_and_cumulate(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").collect()
    cents = defaultdict(int)
    for r in o:
        cents[r.o_custkey] += math.floor(r.o_totalprice * 100 + 0.5)
    got = sorted(
        QUERIES["pareto_revenue_deciles"](spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in got] == list(range(1, 11))
    assert sum(r.n_customers for r in got) == len(cents)
    # deciles are in descending revenue order, so shares never increase
    shares = [r.share for r in got]
    assert all(a >= b for a, b in zip(shares, shares[1:]))
    assert got[-1].cum_share == 1.0
    total = sum(cents.values())
    ordered = sorted(cents.items(), key=lambda kv: (-kv[1], kv[0]))
    n = len(ordered)
    by_dec = defaultdict(int)
    counts = defaultdict(int)
    for i, (_, c) in enumerate(ordered):
        d = (i * 10) // n + 1
        by_dec[d] += c
        counts[d] += 1
    for r in got:
        assert r.n_customers == counts[r.decile]
        assert r.share == round(by_dec[r.decile] / total, 6)


def test_cusum_flags_planted_level_shift(spark, tmp_path):
    t0 = datetime(2024, 5, 1)
    rows = []
    for h in range(48):
        v = 10.0 if h < 24 else 20.0
        rows.append(
            Row(
                event_id=h,
                ts=t0 + timedelta(hours=h),
                user_id=1,
                event_type="shift",
                value=v,
                props="{}",
            )
        )
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "events.parquet"))
    got = QUERIES["cusum_changepoints"](spark, str(tmp_path)).collect()
    # python replay: v_i in micro-units, n-scaled cumulative deviation
    vs = [10_000_000] * 24 + [20_000_000] * 24
    n, s = len(vs), sum(vs)
    q = sum(v * v for v in vs)
    sd = math.sqrt((n * q - s * s) / (n * (n - 1)))
    cusum, flagged = 0, {}
    for i, v in enumerate(vs):
        cusum += n * v - s
        if abs(cusum) > 2.0 * n * sd:
            flagged[i] = cusum
    assert flagged, "planted shift must flag at least one hour"
    got_by_idx = {r.hour_num - int(datetime(2024, 5, 1).timestamp() // 3600): r for r in got}
    assert set(got_by_idx) == set(flagged)
    for i, c in flagged.items():
        r = got_by_idx[i]
        assert r.cusum_value == c / n / 1_000_000.0
        assert r.direction == ("up" if c > 0 else "down")


def test_skyline_matches_bruteforce_dominance(spark, sf_dir):
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    ).collect()
    pts = [(r.p_partkey, r.p_retailprice, r.p_size) for r in parts]

    def dominated(p):
        return any(
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
            for q in pts
        )

    expected = {p[0] for p in pts if not dominated(p)}
    got = {r.p_partkey for r in QUERIES["skyline_parts"](spark, sf_dir).collect()}
    assert got == expected and expected
