"""Wave-8 semantics pins: transitions, survivorship, incremental
dedup, grouped OLS, chi-square cells, centroids/classification, and
linear interpolation — each checked against an independent Python
recomputation or a planted ground truth."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import datetime, timedelta
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import Row

from easy_etl_spark.operators.dedup import incremental_jaccard_dups
from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table


def test_event_transitions_match_python_replay(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for r in events:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    expected = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, prev), (_, _, nxt) in zip(seq, seq[1:]):
            expected[(prev, nxt)] += 1
    got = QUERIES["event_transitions"](spark, sf_dir).collect()
    assert {(r.prev_type, r.next_type): r.n for r in got} == dict(expected)
    row_totals = Counter()
    for (prev, _), n in expected.items():
        row_totals[prev] += n
    for r in got:
        assert r.p == round(r.n / row_totals[r.prev_type], 6)


def test_golden_record_latest_wins(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    ).collect()
    by_user = defaultdict(list)
    for r in events:
        by_user[r.user_id].append(r)
    got = {r.user_id: r for r in QUERIES["golden_record_users"](spark, sf_dir).collect()}
    assert set(got) == set(by_user)
    for uid, rows in by_user.items():
        latest = max(rows, key=lambda r: (r.ts, r.event_id))
        g = got[uid]
        assert g.last_event_type == latest.event_type
        assert g.last_value == latest.value
        assert g.n_events == len(rows)
        assert g.first_seen == min(r.ts for r in rows).strftime("%Y-%m-%d %H:%M:%S")


def test_incremental_dedup_finds_planted_cross_dup_only(spark):
    base_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    base = spark.createDataFrame(
        [Row(doc_id=1, text=base_text), Row(doc_id=2, text="one two three four five six")]
    )
    new = spark.createDataFrame(
        [
            Row(doc_id=10, text=near),  # near-dup of base doc 1
            Row(doc_id=11, text="totally different words entirely here now"),
            Row(doc_id=12, text=near),  # near-dup of 10 too — but new x new must NOT pair
        ]
    )
    pairs = incremental_jaccard_dups(base, new, threshold=0.5).collect()
    assert {(p.new_id, p.base_id) for p in pairs} == {(10, 1), (12, 1)}
    assert all(p.jaccard >= 0.5 for p in pairs)


def test_ols_recovers_planted_line(spark, tmp_path):
    t0 = datetime(2024, 3, 1)
    rows = [
        Row(
            event_id=h,
            ts=t0 + timedelta(hours=h),
            user_id=1,
            event_type="steady",
            value=10.0 + 2.0 * h,
            props="{}",
        )
        for h in range(48)
    ]
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "events.parquet"))
    got = QUERIES["ols_trend_by_type"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0].n == 48
    assert got[0].slope_per_hour == 2.0
    assert got[0].intercept == 10.0


def test_chi2_cells_match_python_contingency(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    cells = Counter()
    for r in events:
        b = "low" if r.value < 100 else ("mid" if r.value < 300 else "high")
        cells[(r.event_type, b)] += 1
    n = sum(cells.values())
    rt = Counter()
    ct = Counter()
    for (t, b), o in cells.items():
        rt[t] += o
        ct[b] += o
    got = QUERIES["chi2_type_value"](spark, sf_dir).collect()
    assert {(r.event_type, r.bucket): r.o for r in got} == dict(cells)
    for r in got:
        e = rt[r.event_type] * ct[r.bucket] / n
        assert math.isclose(r.expected, e, abs_tol=5e-4)
        d = r.o * n - rt[r.event_type] * ct[r.bucket]
        assert math.isclose(
            r.chi2_term, d * d / (n * rt[r.event_type] * ct[r.bucket]), abs_tol=5e-7
        )
        assert r.chi2_term >= 0


def test_label_centroids_match_python_mean(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings").select("label", "embedding").collect()
    sums = defaultdict(lambda: [0, 0])  # (label, dim) -> [n, sum_micro]
    for r in vecs:
        for d, x in enumerate(r.embedding):
            acc = sums[(r.label, d)]
            acc[0] += 1
            acc[1] += math.floor(float(x) * 1_000_000 + 0.5)
    got = QUERIES["label_centroids"](spark, sf_dir).collect()
    assert len(got) == len(sums)
    for r in got:
        n, s = sums[(r.label, r.dim)]
        assert r.n_vecs == n
        # Spark round(double, 6) = HALF_UP on the shortest decimal repr
        # (BigDecimal.valueOf) — not Python's half-even round().
        expected = float(
            Decimal(repr(s / n / 1_000_000.0)).quantize(
                Decimal("1e-6"), rounding=ROUND_HALF_UP
            )
        )
        assert r.centroid == expected


def test_nearest_centroid_confusion_matches_python(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    q = {
        r.vec_id: [math.floor(float(x) * 1000 + 0.5) for x in r.embedding]
        for r in vecs
    }
    labels = {r.vec_id: r.label for r in vecs}
    by_label = defaultdict(list)
    for vid, xs in q.items():
        by_label[labels[vid]].append(xs)
    cents = {
        lab: [
            math.floor(sum(col) / len(col) + 0.5)
            for col in zip(*members)
        ]
        for lab, members in by_label.items()
    }
    expected = Counter()
    for vid, xs in q.items():
        best = min(
            cents,
            key=lambda lab: (sum((a - b) ** 2 for a, b in zip(xs, cents[lab])), lab),
        )
        expected[(labels[vid], best)] += 1
    got = QUERIES["nearest_centroid_confusion"](spark, sf_dir).collect()
    assert {(r.true_label, r.pred_label): r.n for r in got} == dict(expected)


def test_interpolate_fills_midpoint_and_marks_observed(spark, tmp_path):
    t0 = datetime(2024, 3, 1)  # midnight — aligned to the 900 s grid
    rows = [
        Row(event_id=1, ts=t0, user_id=1, event_type="a", value=1.0, props="{}"),
        Row(event_id=2, ts=t0, user_id=1, event_type="a", value=3.0, props="{}"),
        Row(
            event_id=3,
            ts=t0 + timedelta(seconds=1800),
            user_id=1,
            event_type="a",
            value=4.0,
            props="{}",
        ),
    ]
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "events.parquet"))
    got = sorted(
        QUERIES["events_interpolate"](spark, str(tmp_path)).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.avg_value for r in got] == [2.0, 3.0, 4.0]
    assert [r.is_observed for r in got] == [True, False, True]
