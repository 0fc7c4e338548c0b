"""Wave-18 pin: exact embedding covariance vs a numpy replay."""

from __future__ import annotations

import math

import numpy as np

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table


def test_embedding_covariance_matches_numpy_exact_replay(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings").select("embedding").collect()
    X = np.floor(
        np.array([np.asarray(r.embedding, dtype=np.float64) for r in vecs]) * 1000
        + 0.5
    ).astype(np.int64)
    n, d = X.shape
    G = X.T @ X
    s = X.sum(axis=0)
    got = QUERIES["embedding_covariance"](spark, sf_dir).collect()
    assert len(got) == d * (d + 1) // 2
    for r in got:
        assert r.n == n
        num = n * int(G[r.dim1, r.dim2]) - int(s[r.dim1]) * int(s[r.dim2])
        expected = round(num / (n * (n - 1)) / 1e6, 6) + 0.0
        # tolerate only the HALF_UP-vs-half-even boundary (same guard as
        # the oracle gate; values here are not at boundaries in practice)
        assert math.isclose(r.cov, expected, abs_tol=1e-6), (r.dim1, r.dim2)
        if r.dim1 == r.dim2:
            assert r.cov >= 0.0


def test_pca_projection_matches_numpy_and_is_deterministic(spark, sf_dir):
    from easy_etl_spark.operators.similarity import pca_components
    from easy_etl_spark.queries import QUERIES

    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in vecs]
    X = np.floor(
        np.array([np.asarray(r.embedding, dtype=np.float64) for r in vecs]) * 1000
        + 0.5
    )
    emb = load_table(spark, sf_dir, "embeddings")
    mean_units, W, vals = pca_components(emb, k=2)
    # replay: same quantized data -> same covariance -> same factorization
    n = X.shape[0]
    Xi = X.astype(np.int64)
    G = Xi.T @ Xi
    s = Xi.sum(axis=0)
    cov = (n * G.astype(np.float64) - np.outer(s, s).astype(np.float64)) / (n * (n - 1))
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:2]
    Wref = evecs[:, order]
    for j in range(2):
        i = int(np.argmax(np.abs(Wref[:, j])))
        if Wref[i, j] < 0:
            Wref[:, j] = -Wref[:, j]
    assert np.array_equal(W, Wref)
    assert vals[0] >= vals[1] >= 0
    Yref = (X - mean_units) @ Wref / 1000
    got = {r.vec_id: (r.pc1, r.pc2) for r in QUERIES["pca_project_2d"](spark, sf_dir).collect()}
    for i, vid in enumerate(ids):
        assert got[vid] == (Yref[i, 0], Yref[i, 1])
    # top component captures at least as much variance as any axis
    assert vals[0] >= cov.diagonal().max() - 1e-9


def test_pca_rejects_degenerate_corpus(spark, sf_dir):
    """0 or 1 vectors cannot form a sample covariance — the guard must
    raise a clear ValueError, not ZeroDivisionError/max-of-empty."""
    import pytest

    from easy_etl_spark.operators.similarity import pca_components

    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="at least 2 vectors"):
        pca_components(emb.limit(0))
    with pytest.raises(ValueError, match="at least 2 vectors"):
        pca_components(emb.limit(1))


def test_recursive_org_rollup_matches_python_tree(spark, sf_dir):
    import math as _math

    from easy_etl_spark.queries import QUERIES

    cust = {
        r.c_custkey: r.c_acctbal
        for r in load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .collect()
    }
    levels = {}
    frontier = [1] if 1 in cust else []
    depth = 0
    while frontier:
        levels[depth] = frontier
        nxt = []
        for k in frontier:
            for c in (2 * k, 2 * k + 1):
                if c in cust:
                    nxt.append(c)
        frontier = nxt
        depth += 1
    got = {r.depth: (r.n, r.bal_cents) for r in QUERIES["recursive_org_rollup"](spark, sf_dir).collect()}
    assert set(got) == set(levels)
    for d, ks in levels.items():
        cents = sum(_math.floor(cust[k] * 100 + 0.5) for k in ks)
        assert got[d] == (len(ks), cents)
