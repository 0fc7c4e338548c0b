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
