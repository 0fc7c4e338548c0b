"""Chaos-test the transactional parquet sink at a real data rung.

VERDICT r8 item 7: the optimistic-writer protocol (sources/txn.py) has
unit tests for conflict/rebase/crash/vacuum at toy sizes; this harness
runs the same scenarios against sf1-sized appends and measures the
checkpointed log's O(tail)-listing claim, printing one JSON line for
SCALING.md.

Scenario, in order:
  1. seed CRASH LEFTOVERS before any writer starts: an orphaned _data
     snapshot (writer died after staging) and a .tmp commit file
     (writer died mid-claim) — readers must never see either;
  2. N concurrent writer threads each append a disjoint l_orderkey
     slice of the rung's lineitem (~rows/N each). Conflicts are real:
     all N race the same version counter and rebase optimistically;
  3. verify NOTHING was lost or duplicated: final row count plus an
     order-insensitive checksum (sum of l_extendedprice micro-units and
     xor-free modular key sum) equals the source slice union, and the
     leftovers from (1) are still invisible;
  4. vacuum(keep_last=3) and re-verify the head, then check the orphan
     snapshot from (1) was reclaimed;
  5. commit-log tail-listing microbench: build a LONG log (default 800
     zero-copy commits pointing at one tiny snapshot, checkpoint every
     20) and time versions() via the checkpoint (one file read + tail
     existence probes) against the full-scan fallback, plus the wall
     to open the 801st commit. This isolates the metadata path — no
     data I/O — so the ratio is host-load insensitive.

Usage: python tools/txn_chaos.py [sf_dir] [n_writers] [log_len]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from easy_etl_spark.session import get_spark, load_table
from easy_etl_spark.sources.txn import TransactionalParquetSink


def checksum(df):
    """Order-insensitive content fingerprint: count + modular sums of
    the price (micro-units) and key columns."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.pmod((F.col("l_extendedprice") * 100).cast("long"), F.lit(2**31 - 1))
        ).alias("price_sum"),
        F.sum(F.pmod(F.col("l_orderkey") * 31 + F.col("l_linenumber"), F.lit(2**31 - 1))).alias("key_sum"),
    ).first()
    return (row["n"], int(row["price_sum"]) % (2**31 - 1), int(row["key_sum"]) % (2**31 - 1))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    n_writers = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    log_len = int(sys.argv[3]) if len(sys.argv) > 3 else 800

    spark = get_spark("txn-chaos")
    line = load_table(spark, sf_dir, "lineitem")
    root = tempfile.mkdtemp(prefix="txn_chaos_")
    path = os.path.join(root, "t")
    out: dict = {"sf_dir": sf_dir, "n_writers": n_writers, "ok": True, "errors": []}

    def fail(msg: str) -> None:
        out["ok"] = False
        out["errors"].append(msg)
        print(f"FAIL {msg}", file=sys.stderr)

    # -- 1. crash leftovers seeded before any commit exists ----------
    seed = TransactionalParquetSink(spark, path, checkpoint_interval=5)
    seed.append(line.limit(0))  # v1: empty base so the dirs exist
    orphan_rel = os.path.join("_data", uuid.uuid4().hex)
    line.limit(1000).write.parquet(os.path.join(path, orphan_rel))
    stale_tmp = os.path.join(path, "_commits", f".tmp-{uuid.uuid4().hex}")
    with open(stale_tmp, "w") as f:
        f.write(json.dumps({"dir": orphan_rel, "op": "append"}))

    # -- 2. N concurrent sf-sized appends ----------------------------
    slices = [
        line.filter(F.pmod(F.col("l_orderkey"), F.lit(n_writers)) == i)
        for i in range(n_writers)
    ]
    expected = checksum(line)
    errs: list[str] = []

    def writer(i: int) -> None:
        try:
            TransactionalParquetSink(spark, path, checkpoint_interval=5).append(
                slices[i]
            )
        except Exception as e:  # noqa: BLE001 — recorded, not raised
            errs.append(f"writer {i}: {e}")

    t0 = time.perf_counter()
    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n_writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    out["append_wall_sec"] = round(time.perf_counter() - t0, 2)
    for e in errs:
        fail(e)

    sink = TransactionalParquetSink(spark, path, checkpoint_interval=5)
    vs = sink.versions()
    out["versions_committed"] = len(vs)
    if len(vs) != n_writers + 1:
        fail(f"expected {n_writers + 1} commits, got {len(vs)}")

    # -- 3. nothing lost, nothing duplicated, leftovers invisible ----
    got = checksum(sink.read())
    out["rows"] = got[0]
    if got != expected:
        fail(f"checksum mismatch: got {got} expected {expected}")
    live_dirs = {sink._commit_record(v)["dir"] for v in vs}
    if orphan_rel in live_dirs:
        fail("orphan snapshot became visible")
    if not os.path.exists(os.path.join(path, orphan_rel)):
        fail("orphan snapshot vanished before vacuum")

    # -- 4. vacuum reclaims the orphan, head survives ----------------
    # grace=0: every writer has joined, so the in-flight protection
    # window (which would rightly skip our young fake orphan) is moot
    sink.vacuum(keep_last=3, grace_seconds=0)
    if os.path.exists(os.path.join(path, orphan_rel)):
        fail("vacuum left the orphan snapshot")
    if os.path.exists(stale_tmp):
        fail("vacuum left the stale .tmp commit")
    if checksum(sink.read()) != expected:
        fail("head changed across vacuum")
    out["versions_after_vacuum"] = len(sink.versions())

    # -- 5. O(tail) listing at a LONG log ----------------------------
    meta = TransactionalParquetSink(
        spark, os.path.join(root, "meta"), checkpoint_interval=20
    )
    tiny = line.limit(10)
    meta.append(tiny)
    snap = meta._commit_record(1)["dir"]
    base = meta.current_version()
    while base < log_len:
        if not meta._try_commit(base + 1, snap, "append"):
            fail(f"metadata commit {base + 1} lost a race with nobody")
            break
        meta._maybe_checkpoint(base + 1)
        base += 1
    reps = 50
    t0 = time.perf_counter()
    for _ in range(reps):
        vs_cp = meta.versions()
    cp_ms = (time.perf_counter() - t0) / reps * 1000
    t0 = time.perf_counter()
    for _ in range(reps):
        vs_scan = meta._scan_versions()
    scan_ms = (time.perf_counter() - t0) / reps * 1000
    if vs_cp != vs_scan:
        fail("checkpointed listing disagrees with the full scan")
    t0 = time.perf_counter()
    meta._commit_record(log_len)
    out["log_len"] = log_len
    out["list_checkpoint_ms"] = round(cp_ms, 3)
    out["list_fullscan_ms"] = round(scan_ms, 3)
    out["open_head_record_ms"] = round((time.perf_counter() - t0) * 1000, 3)
    cp = meta._load_checkpoint()
    out["tail_after_checkpoint"] = log_len - int(cp["version"]) if cp else None

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
