"""Batch model inference over embedding columns — the quality-
classifier / reward-scorer shape of a training-data pipeline, done the
way it must be done at 100 TB:

- ``mapInPandas`` with the ITERATOR pattern: per-task setup (model
  deserialization) happens ONCE before the batch loop, not once per
  row or per Arrow batch — the canonical Spark pattern for expensive
  model loads;
- model parameters ship via broadcast, not closure-per-task pickling
  of large arrays through every task's serialized closure;
- compute is numpy matmul over whole Arrow batches (vectorized,
  zero-copy columnar transfer) — never row-at-a-time Python.

The linear-sigmoid "model" here is deliberately trivial so the result
is oracle-checkable (DuckDB list_dot_product); swap ``_load_model``
for a real fastText/sklearn/torch load and nothing about the Spark
plumbing changes. Beyond the reference's surface (exit99/easy-etl has
no inference); part of the BASELINE.json north-star extension set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def default_weights(dim: int) -> list[float]:
    """Deterministic rational weights (exact binary doubles come from
    the same decimal literals in Spark and the SQL oracle)."""
    return [((j % 7) - 3) / 10.0 for j in range(dim)]


def batch_score(
    df: DataFrame,
    weights: list[float],
    *,
    bias: float = 0.0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """sigmoid(emb . weights + bias) per row, Arrow-batched. Returns
    the raw double score — callers round for display/compare (numpy's
    half-even rounding differs from SQL half-up, so rounding belongs
    in the engine layer where both sides share semantics)."""
    import numpy as np

    spark = df.sparkSession
    b_model = spark.sparkContext.broadcast(
        {"w": np.asarray(weights, dtype=np.float64), "b": float(bias)}
    )

    def score_partition(batches):
        import pandas as pd

        model = b_model.value  # once per task, before the batch loop
        w, b = model["w"], model["b"]
        for pdf in batches:
            if len(pdf) == 0:  # np.stack raises on an empty Arrow batch
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            z = x @ w + b
            s = 1.0 / (1.0 + np.exp(-z))
            yield pd.DataFrame({id_col: pdf[id_col], "score": s})

    return df.select(id_col, vec_col).mapInPandas(
        score_partition, schema=f"{id_col} long, score double"
    )
