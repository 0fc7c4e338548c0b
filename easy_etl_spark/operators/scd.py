"""Slowly-changing-dimension (SCD Type 2) history maintenance.

The reference is a Kimball star-schema ETL tool (easy_etl/README.md:5,
98, 145): its upsert load (easy_etl/__init__.py:89-94) is SCD Type 1 —
overwrite in place, history lost. Type 2 is the standard next step a
dimension-building deployment needs: every attribute change closes the
old row (valid_to stamped) and opens a new one, so facts can join to
the dimension *as of* their event time (operators/links.asof_link).

Scale design: one full-outer shuffle join between the open slice of
the history and the incoming snapshot, keyed by the natural key —
AQE broadcasts the snapshot when it is delta-sized and splits skewed
keys otherwise. Change detection is a null-safe comparison on the
tracked columns (no row-at-a-time Python). Closed history rows are
never rewritten (at 100 TB the closed slice dwarfs the open slice, so
a partition-on-is_current layout makes the merge touch only the open
partition).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: SCD2 bookkeeping columns added to the dimension's natural schema.
META_COLS = ("valid_from", "valid_to", "is_current")


def scd2_init(snapshot: DataFrame, ts: str) -> DataFrame:
    """Bootstrap a type-2 history from the first snapshot: every row
    open from ``ts`` (an ISO timestamp string) with no end."""
    return (
        snapshot.withColumn("valid_from", F.lit(ts).cast("timestamp"))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )


def _same(cols: list[str]) -> F.Column:
    """Null-safe 'all tracked columns equal' predicate between the
    history (h) and snapshot (s) sides of the merge join."""
    return reduce(
        lambda acc, c: acc & F.col(f"h.{c}").eqNullSafe(F.col(f"s.{c}")),
        cols[1:],
        F.col(f"h.{cols[0]}").eqNullSafe(F.col(f"s.{cols[0]}")),
    )


def scd2_merge(
    history: DataFrame,
    snapshot: DataFrame,
    keys: list[str],
    tracked: list[str],
    ts: str,
    full_snapshot: bool = False,
) -> DataFrame:
    """Merge ``snapshot`` (natural key + tracked attributes, valid as
    of ``ts``) into a type-2 ``history``:

      - changed key  → open row closed (valid_to = ts), new open row;
      - new key      → new open row;
      - unchanged    → untouched;
      - key absent from the snapshot → untouched (delta semantics), or
        closed with no successor when ``full_snapshot=True`` (the
        snapshot is the complete dimension, so absence means deletion).

    Pure DataFrame algebra: closed rows pass through untouched; the
    open slice joins the snapshot once (full outer on the natural key).
    """
    dim_cols = [c for c in history.columns if c not in META_COLS]
    snap = snapshot.select(*dim_cols)
    closed = history.filter(~F.col("is_current"))
    open_ = history.filter(F.col("is_current"))

    j = open_.alias("h").join(
        snap.alias("s"), [F.col(f"h.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys], "full_outer"
    )
    in_hist = F.col(f"h.{keys[0]}").isNotNull()
    in_snap = F.col(f"s.{keys[0]}").isNotNull()
    changed = in_hist & in_snap & ~_same(tracked)

    h_side = [F.col(f"h.{c}").alias(c) for c in dim_cols]
    s_side = [F.col(f"s.{c}").alias(c) for c in dim_cols]
    ts_lit = F.lit(ts).cast("timestamp")

    # open rows that stay open: unchanged matches + (delta mode) absents
    keep_open_pred = (in_hist & in_snap & ~changed) | (
        in_hist & ~in_snap & F.lit(not full_snapshot)
    )
    keep_open = j.filter(keep_open_pred).select(
        *h_side, F.col("h.valid_from").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"), F.lit(True).alias("is_current"),
    )
    # rows to close: changed + (full-snapshot mode) deleted keys
    close_pred = changed | (in_hist & ~in_snap & F.lit(full_snapshot))
    closes = j.filter(close_pred).select(
        *h_side, F.col("h.valid_from").alias("valid_from"),
        ts_lit.alias("valid_to"), F.lit(False).alias("is_current"),
    )
    # new open rows: changed keys' successors + brand-new keys
    opens = j.filter(changed | (~in_hist & in_snap)).select(
        *s_side, ts_lit.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"), F.lit(True).alias("is_current"),
    )
    return closed.unionByName(keep_open).unionByName(closes).unionByName(opens)


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str], compare: list[str] | None = None
) -> DataFrame:
    """Change-data-capture between two table snapshots: one full-outer
    join on the natural key classifying every key as ``inserted``
    (only in new), ``deleted`` (only in old), ``changed`` (present in
    both, any compared column differs, null-safe), or ``unchanged``.

    Returns the key columns plus ``diff_status``. The feed for an
    incremental load when the source can't produce a changelog itself:
    apply inserted+changed via upsert, deleted via anti-join (or a
    type-2 close, scd2_merge). Same scale shape as the SCD2 merge —
    one keyed shuffle join, AQE broadcasts delta-sized snapshots.
    """
    if compare is None:
        compare = [c for c in old.columns if c in set(new.columns) and c not in keys]
    o = old.select(*keys, *compare)
    n = new.select(*keys, *compare)
    j = o.alias("h").join(
        n.alias("s"), [F.col(f"h.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys], "full_outer"
    )
    in_old = F.col(f"h.{keys[0]}").isNotNull()
    in_new = F.col(f"s.{keys[0]}").isNotNull()
    status = (
        F.when(~in_old, F.lit("inserted"))
        .when(~in_new, F.lit("deleted"))
        .when(~_same(compare), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    key_cols = [F.coalesce(F.col(f"h.{k}"), F.col(f"s.{k}")).alias(k) for k in keys]
    return j.select(*key_cols, status.alias("diff_status"))


def scd2_asof(history: DataFrame, ts: str) -> DataFrame:
    """Point-in-time view: the dimension exactly as it looked at ``ts``
    (the query every fact backfill runs against a type-2 dimension).
    A pure filter — partition pruning on valid_from/valid_to at scale.
    """
    t = F.lit(ts).cast("timestamp")
    return history.filter(
        (F.col("valid_from") <= t) & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).drop(*META_COLS)


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC changelog (I/U/D rows) to a base table and return
    the resulting state — the lakehouse APPLY CHANGES INTO / Delta
    CDF-consumer primitive. Semantics match Debezium-style feeds:

      - per key, only the LATEST change by ``seq_col`` counts
        (ties broken by op ASC, so a same-sequence 'D' beats a
        replayed 'I'/'U' — deterministic, documented);
      - latest op D  → key removed (even if absent from base: no-op);
      - latest op I/U → key takes the change row's payload columns
        (full-row image, the Debezium "after" state);
      - keys without changes keep their base row.

    Scale shape: one window over the changelog partitioned by key
    (changelogs are delta-sized — the window never touches the base),
    then one keyed anti-join + union against the base. The base table
    is never shuffled beyond the merge join key; AQE broadcasts the
    deduplicated changelog when it is small. This is exactly the plan
    a Delta MERGE compiles from MATCHED/NOT MATCHED clauses, minus the
    transaction log (pair with sources/txn.TransactionalParquetSink
    for the atomic-commit version)."""
    from pyspark.sql import Window

    payload = [c for c in changes.columns if c not in (seq_col, op_col)]
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(), F.col(op_col).asc()
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    survivors = base.join(latest.select(*keys), on=keys, how="left_anti")
    upserts = latest.filter(F.col(op_col) != "D").select(*payload)
    # the base table may carry columns beyond the changelog payload
    # (e.g. the surrogate id column ParquetSink.append adds); upserted
    # rows take NULL there — the sink's id backfill owns re-keying.
    # allowMissingColumns also keeps this total when the changelog
    # ADDS columns the base predates (schema evolution on the feed).
    return survivors.unionByName(upserts, allowMissingColumns=True)
