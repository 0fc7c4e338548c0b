"""Wave-12 pins: split census, source overlap, de-stutter, WoW growth."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from datetime import datetime

from pyspark.sql import Row

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table


def _bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100


def test_split_census_matches_python_md5(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    expected = defaultdict(lambda: [0, 0])
    for r in docs:
        b = _bucket(r.doc_id)
        split = "train" if b < 80 else ("val" if b < 90 else "test")
        acc = expected[(split, r.source)]
        acc[0] += 1
        acc[1] += r.n_chars
    got = QUERIES["train_val_test_split"](spark, sf_dir).collect()
    assert {(r.split, r.source): [r.n_docs, r.total_chars] for r in got} == dict(
        expected
    )
    # ratios should be near 80/10/10 at the doc level
    by_split = Counter()
    for (split, _), (n, _c) in expected.items():
        by_split[split] += n
    total = sum(by_split.values())
    assert 0.7 < by_split["train"] / total < 0.9


def test_source_overlap_matches_pair_regroup(spark, sf_dir):
    pairs = QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
    src = {
        r.doc_id: r.source
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "source").collect()
    }
    expected = Counter()
    for p in pairs:
        a, b = sorted((src[p.id_a], src[p.id_b]))
        expected[(a, b)] += 1
    got = QUERIES["source_overlap_matrix"](spark, sf_dir).collect()
    assert {(r.source_a, r.source_b): r.n_dup_pairs for r in got} == dict(expected)
    assert expected, "sf0.001 corpus plants near-dups; overlap must be non-empty"


def test_destutter_collapses_runs(spark, tmp_path):
    rows = [
        Row(doc_id=1, text="a a b b b c a", lang="en", source="s", n_chars=13),
        Row(doc_id=2, text="x y z", lang="en", source="s", n_chars=5),
    ]
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: r for r in QUERIES["destutter_tokens"](spark, str(tmp_path)).collect()}
    assert (got[1].n_before, got[1].n_after) == (7, 4)
    assert got[1].cleaned_fp == hashlib.md5(b"a b c a").hexdigest()
    assert (got[2].n_before, got[2].n_after) == (3, 3)
    assert got[2].cleaned_fp == hashlib.md5(b"x y z").hexdigest()


def test_growth_wow_matches_python(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    ).collect()
    epoch = datetime(1970, 1, 1).date()
    weekly = defaultdict(lambda: [0, 0])
    for r in events:
        week = (r.ts.date() - epoch).days // 7
        acc = weekly[(r.event_type, week)]
        acc[0] += 1
        acc[1] += math.floor(r.value * 100 + 0.5)
    expected = {}
    by_type = defaultdict(list)
    for (t, wk), (n, cents) in weekly.items():
        by_type[t].append((wk, n, cents))
    for t, rows in by_type.items():
        rows.sort()
        for (pw, _pn, pc), (wk, n, cents) in zip(rows, rows[1:]):
            if pc > 0:
                expected[(t, wk)] = (n, cents / 100.0, round((cents - pc) * 100.0 / pc, 4))
    got = QUERIES["growth_wow"](spark, sf_dir).collect()
    assert {
        (r.event_type, r.week_num): (r.n_events, r.revenue, r.growth_pct) for r in got
    } == expected
