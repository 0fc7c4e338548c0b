"""Wave-23 pin: item-item recommendations vs Python replay."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table


def test_item_recommendations_match_python_replay(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    pop = Counter()
    co = Counter()
    for parts in baskets.values():
        for p in parts:
            pop[p] += 1
        for p in parts:
            for q in parts:
                if p != q:
                    co[(p, q)] += 1
    anchors = sorted(pop.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    expected = {}
    for p, na in anchors:
        scored = sorted(
            (
                (
                    -math.floor(nab / math.sqrt(float(na) * pop[q]) * 1e6 + 0.5),
                    q,
                    nab,
                )
                for (a, q), nab in co.items()
                if a == p
            )
        )[:3]
        for rnk, (negu, q, nab) in enumerate(scored, start=1):
            expected[(p, rnk)] = (q, nab, -negu)
    got = QUERIES["item_recommendations"](spark, sf_dir).collect()
    assert len(got) == len(expected)
    for r in got:
        assert expected[(r.part, r.rnk)] == (r.rec, r.nab, r.cosine_units)
