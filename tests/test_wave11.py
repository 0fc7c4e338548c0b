"""Wave-11 pins: attribution, TF-IDF keywords, MAD outliers."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import datetime, timedelta

from pyspark.sql import Row

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table


def test_attribution_first_last_touch_crafted(spark, tmp_path):
    t0 = datetime(2024, 6, 1)

    def ev(i, uid, typ):
        return Row(
            event_id=i,
            ts=t0 + timedelta(minutes=i),
            user_id=uid,
            event_type=typ,
            value=1.0,
            props="{}",
        )

    rows = [
        # user 1: view, click, purchase, view, purchase
        ev(1, 1, "view"),
        ev(2, 1, "click"),
        ev(3, 1, "purchase"),
        ev(4, 1, "view"),
        ev(5, 1, "purchase"),
        # user 2: purchase with no prior touch
        ev(6, 2, "purchase"),
    ]
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        (r.first_touch, r.last_touch): r.n_purchases
        for r in QUERIES["attribution_touch"](spark, str(tmp_path)).collect()
    }
    assert got == {
        ("view", "click"): 1,   # first purchase
        ("view", "view"): 1,    # second purchase: last touch is the later view
        ("none", "none"): 1,    # user 2
    }


def test_keyword_tfidf_matches_python_replay(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    tf = defaultdict(Counter)
    for r in docs:
        for tok in r.text.strip().split(" "):
            tf[r.doc_id][tok] += 1
    df = Counter()
    for c in tf.values():
        for tok in c:
            df[tok] += 1
    n = len(tf)
    expected = {}
    for did, c in tf.items():
        scored = [
            (math.floor(t * math.log((n + 1.0) / (df[tok] + 1.0)) * 1e6 + 0.5), tok, t)
            for tok, t in c.items()
        ]
        scored.sort(key=lambda s: (-s[0], s[1]))
        for rnk, (units, tok, t) in enumerate(scored[:3], start=1):
            expected[(did, rnk)] = (tok, t, df[tok], units)
    got = QUERIES["keyword_tfidf_top3"](spark, sf_dir).collect()
    assert len(got) == len(expected)
    for r in got:
        assert expected[(r.doc_id, r.rnk)] == (r.tok, r.tf, r.df, r.score_units)


def _interp_median(sorted_vals):
    n = len(sorted_vals)
    lo = math.floor((n - 1) * 0.5)
    frac = (n - 1) * 0.5 - lo
    hi = min(lo + 1, n - 1)
    return sorted_vals[lo] + (sorted_vals[hi] - sorted_vals[lo]) * frac


def test_robust_outliers_match_python_replay(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "ts", "value"
    ).collect()
    epoch = datetime(1970, 1, 1).date()
    g = defaultdict(int)
    for r in events:
        key = (r.event_type, r.user_id, (r.ts.date() - epoch).days)
        g[key] += math.floor(r.value * 100 + 0.5)
    by_type = defaultdict(list)
    for (t, u, d), vq in g.items():
        by_type[t].append(vq)
    med = {t: _interp_median(sorted(vs)) for t, vs in by_type.items()}
    mad = {
        t: _interp_median(sorted(abs(v - med[t]) for v in vs))
        for t, vs in by_type.items()
    }
    expected = {}
    for (t, u, d), vq in g.items():
        rz = 0.6745 * (vq - med[t]) / mad[t]
        if abs(rz) > 3.5:
            expected[(t, u, d)] = (vq / 100.0, math.floor(rz * 1e6 + 0.5))
    got = QUERIES["robust_outliers_mad"](spark, sf_dir).collect()
    assert {
        (r.event_type, r.user_id, r.day_num): (r.day_spend, r.rz_units) for r in got
    } == expected
    assert expected, "sf0.001 daily spend should flag at least one outlier"
