"""Plan-inspection utilities: assert the physical plan is the one you
want (broadcasts where dims are small, filters pushed to the scan,
pruned read schemas, no accidental sort-merge joins or cartesian
products). Used by tests/test_plan_quality.py as a regression gate so
a future refactor can't silently trade a broadcast join for a 100 TB
shuffle.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PlanFacts:
    text: str
    broadcast_joins: int
    sort_merge_joins: int
    cartesian: int
    exchanges: int
    pushed_filters: list[str]
    partition_filters: list[str]
    read_schemas: list[str]
    codegen_stages: int

    def scans_only_columns(self, *cols: str) -> bool:
        """True if every scan's ReadSchema is a subset of cols."""
        allowed = set(cols)
        for rs in self.read_schemas:
            got = set(re.findall(r"(\w+):", rs))
            if not got <= allowed:
                return False
        return True


def plan_facts(df: DataFrame) -> PlanFacts:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    s = buf.getvalue()
    return PlanFacts(
        text=s,
        broadcast_joins=s.count("BroadcastHashJoin") + s.count("BroadcastNestedLoopJoin"),
        sort_merge_joins=s.count("SortMergeJoin"),
        cartesian=s.count("CartesianProduct"),
        exchanges=s.count("Exchange"),
        pushed_filters=[m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", s) if m],
        partition_filters=[m for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", s) if m],
        read_schemas=re.findall(r"ReadSchema: struct<([^>]*)>", s),
        # formatted explain marks codegen membership as "[codegen id : N]"
        codegen_stages=len(set(re.findall(r"\[codegen id : (\d+)\]", s))),
    )


def executed_plan_facts(df: DataFrame) -> PlanFacts:
    """PlanFacts from the *executed* (AQE-final) plan: runs the query
    to completion first, so codegen spans ("*(N)") and AQE's runtime
    join/coalesce choices are visible. Must execute via an action on
    THIS Dataset — a .write would plan a separate command and leave
    this QueryExecution at isFinalPlan=false."""
    qe = df._jdf.queryExecution()
    qe.toRdd().count()  # executes THIS QueryExecution, no driver collect
    s = qe.executedPlan().toString()
    # AQE prints "== Final Plan ==" then "== Initial Plan ==": count
    # only the final (runtime-adapted) section
    s = s.split("== Initial Plan ==")[0]
    return PlanFacts(
        text=s,
        broadcast_joins=s.count("BroadcastHashJoin") + s.count("BroadcastNestedLoopJoin"),
        sort_merge_joins=s.count("SortMergeJoin"),
        cartesian=s.count("CartesianProduct"),
        exchanges=s.count("Exchange"),
        pushed_filters=[m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", s) if m],
        partition_filters=[m for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", s) if m],
        read_schemas=re.findall(r"ReadSchema: struct<([^>]*)>", s),
        # executed-plan text prefixes codegen'd operators with "*(N) "
        codegen_stages=len(set(re.findall(r"\*\((\d+)\)", s))),
    )
