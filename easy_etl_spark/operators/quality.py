"""Declarative data-quality checks over DataFrames — the validation
layer an ETL deployment runs between extract and load (dbt-test /
expectations style), absent from the reference (its only validation is
the hard KeyError on ignoring a missing field, easy_etl/__init__.py:
108-111).

Row-predicate checks (not_null / in_range / accepted_values) compile
to one conditional count over the frame; set-level checks (unique /
foreign_key) compile to one keyed aggregate or anti-join whose single
violation count feeds the same report shape. `run_checks` unions the
1-row reports. Nothing materializes violating rows unless
`violations()` asks for them.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    name: str
    frame: DataFrame
    #: row-level: True ⇒ the row violates the check. None ⇒ `frame`
    #: is already a 1-row aggregate carrying the violation count in __v
    predicate: Column | None = None

    def report(self) -> DataFrame:
        if self.predicate is None:
            counted = self.frame
        else:
            counted = self.frame.agg(
                F.count(F.when(self.predicate, 1)).alias("__v")
            )
        return counted.select(
            F.lit(self.name).alias("check_name"),
            F.col("__v").cast("bigint").alias("n_violations"),
            (F.col("__v") == 0).alias("passed"),
        )

    def violations(self, limit: int = 100) -> DataFrame:
        if self.predicate is None:
            raise ValueError(f"{self.name}: set-level check has no row predicate")
        return self.frame.filter(self.predicate).limit(limit)


def not_null(df: DataFrame, col: str, name: str | None = None) -> Check:
    return Check(name or f"not_null:{col}", df, F.col(col).isNull())


def in_range(df: DataFrame, col: str, lo, hi, name: str | None = None) -> Check:
    c = F.col(col)
    return Check(
        name or f"range:{col}", df, c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi))
    )


def accepted_values(df: DataFrame, col: str, values: list, name: str | None = None) -> Check:
    c = F.col(col)
    return Check(name or f"accepted:{col}", df, c.isNull() | ~c.isin(values))


def unique(df: DataFrame, cols: list[str], name: str | None = None) -> Check:
    """Key uniqueness: violations = rows beyond the first per key
    (one shuffle keyed by the candidate key)."""
    agg = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("__v"))
    )
    return Check(name or f"unique:{','.join(cols)}", agg)


def foreign_key(
    child: DataFrame, col: str, parent: DataFrame, pcol: str, name: str | None = None
) -> Check:
    """Referential integrity: non-NULL child rows whose key has no
    parent. NULL child keys are excluded (SQL NOT IN semantics; pair
    with a ``not_null`` check when NULLs should also fail). The
    anti-join broadcasts the parent key set when dimension-sized."""
    orphans = (
        child.select(F.col(col).alias("__k"))
        .filter(F.col("__k").isNotNull())
        .join(parent.select(F.col(pcol).alias("__k")).distinct(), "__k", "left_anti")
    )
    return Check(name or f"fk:{col}->{pcol}", orphans.agg(F.count(F.lit(1)).alias("__v")))


def run_checks(checks: list[Check]) -> DataFrame:
    """One report row per check: (check_name, n_violations, passed)."""
    out = None
    for c in checks:
        r = c.report()
        out = r if out is None else out.unionByName(r)
    return out
