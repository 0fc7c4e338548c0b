"""Wave-53 pins: a flat image scores exactly 0 blur-variance, a
checkerboard scores high; an alternating-sign tone has ZCR exactly 1
and a DC signal exactly 0 — all through the REAL encode→decode path."""

from __future__ import annotations

import numpy as np

from easy_etl_spark.operators import multimodal
from easy_etl_spark.queries import QUERIES


def _media_df(spark, items):
    import pandas as pd  # noqa: F401

    return spark.createDataFrame(items, "doc_id long, media binary")


def test_blur_score_flat_vs_checkerboard(spark):
    flat = np.full((10, 12, 3), 77, dtype="uint8")
    yy, xx = np.mgrid[0:10, 0:12]
    checker = (((xx + yy) % 2) * 255).astype("uint8")
    board = np.stack([checker] * 3, axis=2)
    df = _media_df(
        spark,
        [(1, bytearray(multimodal.encode_ppm(flat))),
         (2, bytearray(multimodal.encode_ppm(board)))],
    )
    out = {r.doc_id: r for r in multimodal.image_blur_scores(df).collect()}
    assert out[1].lap_var == 0.0 and out[1].lap_sum == 0
    # checkerboard: every interior Laplacian is ±8·255 — maximal detail
    assert out[2].lap_var > 100000.0
    assert out[2].n_interior == 8 * 10


def test_zcr_alternating_vs_dc(spark):
    alt = np.array([1000, -1000] * 100, dtype="int64")
    dc = np.full(200, 500, dtype="int64")
    df = _media_df(
        spark,
        [(1, bytearray(multimodal.encode_wav(alt, bits=16))),
         (2, bytearray(multimodal.encode_wav(dc, bits=16)))],
    )
    out = {r.doc_id: r for r in multimodal.audio_zcr_stats(df).collect()}
    assert out[1].zcr == 1.0 and out[1].n_zero_crossings == 199
    assert out[2].zcr == 0.0 and out[2].n_zero_crossings == 0
    assert out[1].peak_abs == 1000
    assert out[2].rms == 500.0


def test_registered_queries_shapes(spark, sf_dir):
    blur = QUERIES["image_blur_laplacian"](spark, sf_dir).collect()
    zcr = QUERIES["audio_zero_crossing"](spark, sf_dir).collect()
    assert len(blur) == 100 and len(zcr) == 100
    for r in blur:
        assert r.n_interior == (r.width - 2) * (r.height - 2)
        assert r.lap_var >= 0.0
    for r in zcr:
        assert 0.0 <= r.zcr <= 1.0
        assert 0 <= r.peak_abs <= 32768
