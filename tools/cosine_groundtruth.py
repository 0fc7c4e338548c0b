"""Blockwise-numpy ground truth for ``dedup_embedding_cosine``
(round 10; repeatable version of the round-9 ad hoc check).

The DuckDB oracle for exact all-pairs cosine is a quadratic SQL join —
infeasible past sf1 (1.25G-pair SQL at sf2.5). Ground truth instead:
float64 blockwise all-pairs cosine in numpy over the raw parquet,
thresholded and rounded exactly like the engine (>= 0.45, round 6,
id_a < id_b), compared as an exact multiset against the engine's
distributed block-matrix result.

Usage: python tools/cosine_groundtruth.py SF_DIR [threshold]
Prints one JSON line; exit 0 iff the engine matches ground truth
row-for-row.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def ground_truth(sf_dir: str, threshold: float, block: int = 2048):
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
    mat = np.asarray(t["embedding"].combine_chunks().to_numpy(zero_copy_only=False).tolist(), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    n = len(ids)
    pairs = []
    for s in range(0, n, block):
        lm = mat[s : s + block]
        li = ids[s : s + block]
        # only the upper triangle: compare block s against rows >= s
        rm = mat[s:]
        ri = ids[s:]
        sims = lm @ rm.T
        mask = sims >= threshold
        # global row index comparison keeps each unordered pair once
        gi = np.arange(s, min(s + block, n))[:, None]
        gj = np.arange(s, n)[None, :]
        mask &= gi < gj
        ai, bj = np.nonzero(mask)
        a, b = li[ai], ri[bj]
        pairs.append(
            np.stack(
                [np.minimum(a, b), np.maximum(a, b), np.round(sims[ai, bj], 6)],
                axis=1,
            )
        )
    out = np.concatenate(pairs) if pairs else np.empty((0, 3))
    return {(int(r[0]), int(r[1]), float(r[2])) for r in out}, n


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf5"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.45

    t0 = time.time()
    truth, n_vec = ground_truth(sf_dir, threshold)
    t_numpy = round(time.time() - t0, 1)

    from easy_etl_spark.queries import QUERIES
    from easy_etl_spark.session import get_spark

    spark = get_spark("cosine-groundtruth")
    t0 = time.time()
    rows = QUERIES["dedup_embedding_cosine"](spark, sf_dir).collect()
    engine = {(r["id_a"], r["id_b"], r["cosine"]) for r in rows}
    t_engine = round(time.time() - t0, 1)

    only_truth = truth - engine
    only_engine = engine - truth
    res = {
        "metric": "cosine_groundtruth",
        "sf_dir": sf_dir,
        "threshold": threshold,
        "n_vectors": n_vec,
        "truth_pairs": len(truth),
        "engine_pairs": len(engine),
        "missing_from_engine": len(only_truth),
        "extra_in_engine": len(only_engine),
        "numpy_secs": t_numpy,
        "engine_secs": t_engine,
        "ok": not only_truth and not only_engine and len(rows) == len(engine),
    }
    print(json.dumps(res))
    if only_truth or only_engine:
        print("sample missing:", sorted(only_truth)[:3], file=sys.stderr)
        print("sample extra:", sorted(only_engine)[:3], file=sys.stderr)
    return 0 if res["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
