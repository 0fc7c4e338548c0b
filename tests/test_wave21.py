"""Wave-21 pins: nested subsets and vocab coverage knees."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table


def _bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100


def test_learning_curve_subsets_nested_and_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    expected = defaultdict(lambda: [0, 0])
    members = defaultdict(set)
    for r in docs:
        b = _bucket(r.doc_id)
        for pct in (10, 25, 50, 100):
            if b < pct:
                acc = expected[(pct, r.source)]
                acc[0] += 1
                acc[1] += r.n_chars
                members[pct].add(r.doc_id)
    got = QUERIES["learning_curve_subsets"](spark, sf_dir).collect()
    assert {(r.subset_pct, r.source): [r.n_docs, r.total_chars] for r in got} == dict(
        expected
    )
    # strict nesting: each rung contains the previous one
    assert members[10] <= members[25] <= members[50] <= members[100]
    assert len(members[100]) == len(docs)


def test_vocab_coverage_matches_python_curve(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    freq = Counter()
    for r in docs:
        freq.update(r.text.strip().split(" "))
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(freq.values())
    got = {r.coverage_pct: r for r in QUERIES["vocab_coverage_curve"](spark, sf_dir).collect()}
    assert set(got) == {50, 90, 99}
    for pct in (50, 90, 99):
        cum = 0
        size = None
        for i, (_, c) in enumerate(ranked, start=1):
            cum += c
            if cum * 100 >= pct * total:
                size = i
                break
        assert got[pct].vocab_size == size
        assert got[pct].total_tokens == total
    assert got[50].vocab_size <= got[90].vocab_size <= got[99].vocab_size


def test_conversion_latency_matches_python(spark, sf_dir):
    import math

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    signup, purchases = {}, defaultdict(list)
    for r in events:
        if r.event_type == "signup":
            signup[r.user_id] = min(signup.get(r.user_id, r.ts), r.ts)
        elif r.event_type == "purchase":
            purchases[r.user_id].append(r.ts)
    lats = []
    for u, su in signup.items():
        after = [p for p in purchases.get(u, []) if p > su]
        if after:
            lats.append(
                int(min(after).timestamp()) - int(su.timestamp())
            )
    lats.sort()

    def interp(q):
        n = len(lats)
        lo = math.floor((n - 1) * q)
        frac = (n - 1) * q - lo
        hi = min(lo + 1, n - 1)
        return lats[lo] + (lats[hi] - lats[lo]) * frac

    got = QUERIES["conversion_latency"](spark, sf_dir).collect()[0]
    assert got.n_converted == len(lats) > 0
    assert got.p50_minutes == round(interp(0.5) / 60.0, 4)
    assert got.p90_minutes == round(interp(0.9) / 60.0, 4)
