"""Wave-14 pins: NDCG retrieval evaluation and embedding drift."""

from __future__ import annotations

import math
from collections import defaultdict

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table


def test_ndcg_matches_python_replay(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    es = {r.vec_id: [float(x) for x in r.embedding] for r in vecs}
    lab = {r.vec_id: r.label for r in vecs}
    nrm = {v: math.sqrt(sum(x * x for x in e)) for v, e in es.items()}

    def disc(rank):
        return math.floor(1e6 / (math.log(rank + 1) / math.log(2.0)) + 0.5)

    expected = {}
    label_counts = defaultdict(int)
    for v in lab.values():
        label_counts[v] += 1
    for q in [v for v in es if v < 5]:
        scored = sorted(
            (
                (
                    -round(
                        sum(a * b for a, b in zip(es[q], es[c])) / (nrm[q] * nrm[c]), 6
                    ),
                    c,
                )
                for c in es
                if c != q
            ),
        )[:10]
        dcg = sum(
            disc(i) for i, (_, c) in enumerate(scored, start=1) if lab[c] == lab[q]
        )
        n_rel = label_counts[lab[q]] - 1
        idcg = sum(disc(i) for i in range(1, min(10, n_rel) + 1))
        expected[q] = (n_rel, dcg, idcg, round(dcg / idcg, 6))
    got = QUERIES["ndcg_retrieval_eval"](spark, sf_dir).collect()
    assert {
        r.query_id: (r.n_rel, r.dcg_units, r.idcg_units, r.ndcg) for r in got
    } == expected
    assert expected


def test_embedding_drift_matches_python_replay(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    groups = defaultdict(list)
    for r in vecs:
        groups[(r.label, r.vec_id % 2)].append(
            [math.floor(float(x) * 1e6 + 0.5) for x in r.embedding]
        )
    expected = {}
    labels = {lab for lab, _ in groups}
    for lab in labels:
        even, odd = groups.get((lab, 0)), groups.get((lab, 1))
        if not even or not odd:
            continue
        c0 = [math.floor(sum(col) / len(col) + 0.5) for col in zip(*even)]
        c1 = [math.floor(sum(col) / len(col) + 0.5) for col in zip(*odd)]
        s2 = sum((a - b) ** 2 for a, b in zip(c0, c1))
        expected[lab] = (len(even), len(odd), s2, round(math.sqrt(s2) / 1e6, 6))
    got = QUERIES["embedding_drift"](spark, sf_dir).collect()
    assert {
        r.label: (r.n_even, r.n_odd, r.shift2_units, r.drift_l2) for r in got
    } == expected
    assert expected
