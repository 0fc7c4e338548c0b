"""Stratified / deterministic sampling for corpus mixing.

Training-data pipelines re-weight heterogeneous sources (web crawl vs
books vs code) into a target mixture. Two paths:

- ``stratified_sample``: deterministic keep/drop via a multiplicative
  (Knuth/Fibonacci) hash bucket of a stable id — reproducible across
  runs, engines, and partitionings, because it is pure integer
  arithmetic (``id * 2654435761 mod 2^32 mod 100``) rather than an
  engine-specific hash. This is the oracle-checkable and
  restart-stable path: re-running the pipeline after adding data keeps
  every previously-kept row kept.
- ``sample_by_rates``: Spark's native ``DataFrame.sampleBy`` (seeded
  Bernoulli per stratum) for when statistical rather than
  deterministic sampling is wanted.

Both are per-row maps with no shuffle — the plan is a scan + filter
and scales linearly to 100 TB; the only aggregation is whatever the
caller does afterwards.

Beyond the reference's surface (exit99/easy-etl has no sampling); part
of the BASELINE.json north-star extension set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Knuth's multiplicative constant (2^32 / phi); bucket space 0..99.
KNUTH = 2654435761
BUCKETS = 100


def knuth_bucket(id_col: Column) -> Column:
    """Deterministic bucket in [0, 100) from a stable integer id.

    ``pmod(id * 2654435761, 2^32) % 100`` — stays in int64 for ids up
    to ~2^31, which holds for any per-source sequence id; for larger
    ids pre-fold with ``id % 2^31``. ``pmod`` (not ``%``) so negative
    ids still land in [0, 100) instead of silently passing every
    ``bucket < rate`` check; identical to ``%`` for the non-negative
    ids this is meant for.
    """
    return F.pmod(id_col.cast("long") * KNUTH, F.lit(2**32)) % BUCKETS


def stratified_sample(
    df: DataFrame,
    rates: dict[str, int] | Column,
    *,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_rate: int = 0,
) -> DataFrame:
    """Keep rows whose hash bucket falls under the stratum's rate
    (percent, 0-100). ``rates`` is a dict stratum->percent, or a
    Column computing the percent per row (for rule-based mixtures).
    """
    if isinstance(rates, dict):
        rate = F.lit(default_rate)
        for k, v in rates.items():
            rate = F.when(F.col(stratum_col) == k, F.lit(v)).otherwise(rate)
    else:
        rate = rates
    return df.filter(knuth_bucket(F.col(id_col)) < rate)


def sample_by_rates(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    stratum_col: str = "source",
    seed: int = 42,
) -> DataFrame:
    """Statistical stratified sampling (Spark-native Bernoulli)."""
    return df.sampleBy(stratum_col, fractions=fractions, seed=seed)


def md5_uniform(id_col: Column, modulus: int) -> Column:
    """Engine-portable pseudo-uniform integer in [0, modulus) from a
    stable id: the first 8 hex chars of md5(str(id)) parsed as an
    integer. md5 is bit-identical everywhere (unlike xxhash64, which
    only Spark has), so an oracle engine reproduces the exact keep
    set: Spark `conv(substr(md5(x),1,8),16,10)` == DuckDB
    `('0x'||substr(md5(x),1,8))::BIGINT`. Per-row map, no shuffle."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(modulus))


def weighted_bernoulli(
    df: DataFrame,
    weight: Column,
    max_weight: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Importance sampling: keep each row with probability
    weight/max_weight (weights are integers ≤ max_weight), decided by
    the portable md5 hash of its id — deterministic across runs,
    engines, and partition layouts, unlike rand()-based sampling.
    The training-mix use: sample documents proportional to a
    length/quality score instead of uniformly."""
    return df.filter(md5_uniform(F.col(id_col), max_weight) < weight)
