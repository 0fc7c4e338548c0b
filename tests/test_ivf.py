from __future__ import annotations

import math

from easy_etl_spark.operators import similarity
from easy_etl_spark.session import load_table


def test_ivf_recall_and_exact_scores(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id < 5")
    brute = similarity.brute_force_topk(emb, q, k=10).collect()
    brute_pairs = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in brute}
    all_scores = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in similarity.brute_force_topk(emb, q, k=10_000).collect()
    }
    ivf = similarity.ivf_neighbors(emb, q, k=10, n_lists=8, n_probe=3).collect()
    assert ivf
    # per-query result bounds + exact cosine agreement with brute force
    from collections import Counter

    per_q = Counter(r["query_id"] for r in ivf)
    assert all(v <= 10 for v in per_q.values())
    for r in ivf:
        assert math.isclose(all_scores[(r["query_id"], r["neighbor_id"])], r["cosine"], abs_tol=1e-9)
    # recall vs exact top-10 (probing 3/8 lists on weakly-clustered
    # random data still recovers a meaningful fraction)
    hits = sum(1 for r in ivf if (r["query_id"], r["neighbor_id"]) in brute_pairs)
    recall = hits / len(brute)
    assert recall >= 0.3, f"recall {recall}"


def test_ivf_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id < 2")
    a = sorted((r["query_id"], r["neighbor_id"]) for r in similarity.ivf_neighbors(emb, q, k=5).collect())
    b = sorted((r["query_id"], r["neighbor_id"]) for r in similarity.ivf_neighbors(emb, q, k=5).collect())
    assert a == b
