"""Engine-portable mergeable sketches with EXACT replayability.

The production sketch path is Spark's built-in DataSketches surface
(`sketch_distinct_users`, `sketch_quantiles_theta` — rows-only in the
correctness gate, because their binary sketches are engine-specific).
This module supplies the oracle-checkable twin, the same move the ANN
family made with int_lsh/int_ivf/int_pq: an md5-derived HyperLogLog
whose every intermediate is an exact integer, so a SQL engine replays
register state AND the final estimate bit-for-bit.

Exactness argument for the estimator: register ranks M_j are integers
in [0, 27]; the HLL indicator sum Σ 2^-M_j is computed as the INTEGER
numerator S = Σ 2^(27-M_j) (≤ 64·2^27 ≈ 2^33, far inside BIGINT), so
the only float operations are one division by S, multiplications by
exact powers of two, the alpha constant — written as the same literal
arithmetic on both engines — and ln of a rational of integers.  Each
has exactly one correct IEEE rounding, so Spark and DuckDB produce the
same double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: registers (m = 2^P); 32-bit md5 hash = P index bits + R rank bits
HLL_P = 6
HLL_M = 1 << HLL_P  # 64
HLL_R = 32 - HLL_P  # 26 remaining bits -> ranks 1..27
_RANK_MAX = HLL_R + 1


def _md5_u32(col: Column) -> Column:
    """First 32 bits of md5 as an unsigned integer (engine-portable:
    DuckDB spells it ('0x' || substr(md5(x), 1, 8))::BIGINT)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def _rank_of(rem: Column) -> Column:
    """HLL rank = leading zeros of the R-bit remainder + 1, via an
    exact integer comparison chain (floor(log2(.)) is float-fragile:
    engines may round 2^k to k-ε). rem == 0 -> max rank."""
    expr = F.lit(_RANK_MAX)
    # rem >= 2^(R-1) -> rank 1; rem >= 2^(R-2) -> rank 2; ...
    for rank in range(HLL_R, 0, -1):
        expr = F.when(rem >= (1 << (HLL_R - rank)), F.lit(rank)).otherwise(expr)
    return expr


def hll_md5_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate (Flajolet et al.
    2007, m=64 registers) over md5-hashed keys, plus the exact
    distinct count for error accounting. Returns group_cols +
    (est_distinct, exact_distinct, n_rows).

    Every decision is replayable: hash = first 32 md5 bits, register
    index = hash % m, rank via the integer comparison chain, register
    = max rank (duplicates collapse by construction — the whole point
    of HLL), estimate = alpha·m²/Σ2^-M with the standard
    linear-counting small-range correction, computed through the
    integer numerator Σ2^(27-M).

    Scale: ONE map-side-combinable aggregation builds the registers
    ((group, idx) max — 64 rows per group regardless of data size) and
    a second 64-row-per-group reduce finishes the estimate; the
    sketch is mergeable across partitions/days by the same max, which
    is exactly how the partial aggregation already evaluates it. The
    exact count (for the error column) is the only part that wouldn't
    survive 100 TB — drop it there; the estimator path shuffles
    nothing but register rows."""
    h = _md5_u32(F.col(key_col))
    keyed = df.select(
        *group_cols,
        (h % HLL_M).alias("__idx"),
        _rank_of(F.floor(h / HLL_M).cast("long")).alias("__rank"),
        F.col(key_col).alias("__k"),
    )
    regs = keyed.groupBy(*group_cols, "__idx").agg(F.max("__rank").alias("__m"))
    # integer numerator of sum(2^-M): present registers contribute
    # 2^(27-M), absent ones (rank 0) contribute 2^27
    sums = regs.groupBy(*group_cols).agg(
        F.sum(
            # 2^(27-M) exactly (exponent <= 27 << double mantissa)
            F.pow(F.lit(2.0), (F.lit(_RANK_MAX) - F.col("__m")).cast("double"))
            .cast("long")
        ).alias("__s_present"),
        F.count(F.lit(1)).alias("__n_idx"),
    )
    two_pow = float(1 << _RANK_MAX)
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(HLL_M)))
    s_int = (
        F.col("__s_present")
        + (F.lit(HLL_M) - F.col("__n_idx")) * F.lit(1 << _RANK_MAX).cast("long")
    )
    v_zero = (F.lit(HLL_M) - F.col("__n_idx")).cast("long")
    e_raw = alpha * F.lit(float(HLL_M * HLL_M)) * F.lit(two_pow) / s_int
    est = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (v_zero > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v_zero),
    ).otherwise(e_raw)
    exact = keyed.groupBy(*group_cols).agg(
        F.countDistinct("__k").alias("exact_distinct"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return (
        sums.join(exact, group_cols)
        .select(
            *group_cols,
            (F.round(est, 4) + F.lit(0.0)).alias("est_distinct"),
            "exact_distinct",
            "n_rows",
        )
    )
