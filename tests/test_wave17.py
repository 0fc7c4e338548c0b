"""Wave-17 pins: winsorization and per-entity capping."""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import datetime

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table


def _interp_pct(sorted_vals, q):
    n = len(sorted_vals)
    lo = math.floor((n - 1) * q)
    frac = (n - 1) * q - lo
    hi = min(lo + 1, n - 1)
    return sorted_vals[lo] + (sorted_vals[hi] - sorted_vals[lo]) * frac


def test_winsorize_matches_python_replay(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    by_type = defaultdict(list)
    for r in events:
        by_type[r.event_type].append(math.floor(r.value * 100 + 0.5))
    got = {r.event_type: r for r in QUERIES["winsorize_values"](spark, sf_dir).collect()}
    assert set(got) == set(by_type)
    any_clipped = False
    for t, vs in by_type.items():
        s = sorted(vs)
        lo, hi = _interp_pct(s, 0.05), _interp_pct(s, 0.95)
        n_low = sum(1 for v in vs if v < lo)
        n_high = sum(1 for v in vs if v > hi)
        cq = [math.floor(min(max(float(v), lo), hi) * 10000 + 0.5) for v in vs]
        g = got[t]
        assert (g.n, g.n_clipped_low, g.n_clipped_high) == (len(vs), n_low, n_high)
        assert g.mean_before == round(sum(vs) / 100.0 / len(vs), 4)
        assert g.mean_after == round(sum(cq) / 1e6 / len(vs), 4)
        # clipping from both sides must pull the mean inward or hold it
        any_clipped = any_clipped or n_low or n_high
    assert any_clipped


def test_cap_events_keeps_first_five_deterministically(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    ).collect()
    epoch = datetime(1970, 1, 1).date()
    groups = defaultdict(list)
    for r in events:
        groups[(r.user_id, (r.ts.date() - epoch).days)].append((r.ts, r.event_id))
    got = {
        (r.user_id, r.day_num): r
        for r in QUERIES["cap_events_per_user_day"](spark, sf_dir).collect()
    }
    assert set(got) == set(groups)
    saw_capped = False
    for key, rows in groups.items():
        rows.sort()
        kept = rows[:5]
        g = got[key]
        assert g.n_events == len(rows)
        assert g.n_kept == min(5, len(rows))
        assert g.kept_ids_sum == sum(eid for _, eid in kept)
        saw_capped = saw_capped or len(rows) > 5
    assert saw_capped, "sf0.001 must include at least one capped user-day"
