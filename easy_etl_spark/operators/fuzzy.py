"""Fuzzy string matching: edit-distance-≤1 joins via deletion-
neighborhood blocking (the FastSS scheme).

Entity-resolution companion to the dedup family: find record pairs
whose keys differ by one typo without the O(n²) cross join. Each
string s generates the candidate block set {s} ∪ {s minus one char};
two strings within edit distance 1 (substitution, insertion, deletion,
or equality) necessarily share a block, so candidates come from an
equi-join on the block string, then exact `levenshtein` verifies
(shared blocks can also arise from distance-2 transpositions — e.g.
"ab"/"ba" — which the verify step rejects).

Scale design: block keys hash uniformly (strings), the join is the
canonical candidate-generate → verify shape (same as MinHash-LSH →
Jaccard): O(Σ block²) not O(n²), and blocks are tiny for natural keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_blocks(s: Column) -> Column:
    """{s} ∪ every single-character deletion of s, deduplicated."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(F.substring(s, F.lit(1), i - 1), F.substr(s, i + 1)),
    )
    return F.array_distinct(F.concat(F.array(s), dels))


def fuzzy_self_pairs(df: DataFrame, col: str, max_dist: int = 1) -> DataFrame:
    """All distinct value pairs of ``df[col]`` within edit distance
    ``max_dist`` (must be ≤1 — the deletion-neighborhood guarantee only
    holds there). Returns (name_a, name_b, dist) with name_a < name_b.
    """
    if max_dist != 1:
        raise ValueError("deletion-neighborhood blocking covers edit distance 1 only")
    vals = df.select(F.col(col).alias("__s")).distinct()
    blocks = vals.select("__s", F.explode(deletion_blocks(F.col("__s"))).alias("__b"))
    l, r = blocks.alias("l"), blocks.alias("r")
    cand = (
        l.join(r, (F.col("l.__b") == F.col("r.__b")) & (F.col("l.__s") < F.col("r.__s")))
        .select(F.col("l.__s").alias("name_a"), F.col("r.__s").alias("name_b"))
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
    )
