"""Wave-16 pin: MMR re-ranking vs a full Python greedy replay."""

from __future__ import annotations

import math

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table


def _fold_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def test_mmr_matches_python_greedy_replay(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    es = {r.vec_id: [float(x) for x in r.embedding] for r in vecs}
    nrm = {v: math.sqrt(_fold_dot(e, e)) for v, e in es.items()}

    def cos(a, b, rounded):
        c = _fold_dot(es[a], es[b]) / (nrm[a] * nrm[b])
        return round(c, 6) if rounded else c

    expected = {}
    for q in [v for v in es if v < 5]:
        top = sorted(((-cos(q, c, True), c) for c in es if c != q))[:10]
        cands = {c: -negrel for negrel, c in top}
        selected = []
        for rank in range(1, 6):
            best = None
            for c, rel in cands.items():
                if c in selected:
                    continue
                if selected:
                    score = 0.5 * rel - 0.5 * max(cos(c, s, False) for s in selected)
                else:
                    score = 0.5 * rel
                if best is None or (-score, c) < best[0]:
                    best = ((-score, c), score)
            (_, c), score = best
            selected.append(c)
            expected[(q, rank)] = (c, cands[c], math.floor(score * 1e6 + 0.5))
    got = QUERIES["mmr_rerank_topk"](spark, sf_dir).collect()
    assert len(got) == len(expected)
    for r in got:
        assert expected[(r.query_id, r.pick_rank)] == (
            r.neighbor_id,
            r.rel,
            r.mmr_units,
        ), (r.query_id, r.pick_rank)
    # rank 1 is always the plain most-relevant neighbor
    for (q, rank), (c, rel, _u) in expected.items():
        if rank == 1:
            assert rel == max(v for (qq, _), (_, v, _u2) in expected.items() if qq == q)
