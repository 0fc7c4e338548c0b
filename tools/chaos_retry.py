"""Task-retry chaos harness (round 10, VERDICT r9 item 4).

Proves that the engine's output is HASH-IDENTICAL under forced task
failures + retries — the execution reality of a 1000-executor cluster,
where preemption, spot loss, and fetch failures re-run tasks
constantly. The round-5 defect class this targets: an operator that
collects driver-side boundary metadata (banded ranking offsets, IVF
centroids, surrogate boundaries) from a frame that a retried task
re-evaluates DIFFERENTLY — pin_frame/localCheckpoint is the defense,
and this harness is the regression gate for it.

Mechanics (single host, local mode):

* the session runs with master ``local[N, R]`` (R = task retries;
  plain ``local[N]`` treats ANY task failure as fatal) via
  SPARK_GRAFT_TASK_RETRIES — set BEFORE session build.
* every parquet scan is wrapped (DataFrameReader.parquet patch) with a
  pass-through mapInPandas that RAISES on attempt 0 of the first
  ``fail_parts`` partitions; the final result frame is wrapped the
  same way. TaskContext.attemptNumber() guarantees the retry (attempt
  1+) succeeds, so the job completes with every injected task having
  failed exactly once — first-stage recompute AND last-stage re-pull
  both exercised.
* three runs per query: CLEAN (no wrapper), WRAPPED-NOFAIL (wrapper
  inserted, no failures — proves the wrapper itself is transparent),
  and CHAOS (failures injected). All three order-insensitive
  sha256 hashes must match.

Usage: python tools/chaos_retry.py [sf_dir] [query ...]
Exit 0 = all hashes identical; prints one JSON line per query.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_TASK_RETRIES", "4")

DEFAULT_QUERIES = [
    "kcore_hindex",
    "corpus_build_report",
    "range_join_binned",
    "dedup_minhash_lsh",
]

FAIL_PARTS = 3  # attempt-0 failure injected into this many partitions per frame


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    return repr(v)


def frame_hash(df) -> tuple[str, int]:
    """Order-insensitive sha256 over the sorted repr multiset (same
    normalization as tools/compare_oracle.py)."""
    cols = sorted(df.columns)
    rows = sorted(tuple(_norm(r[c]) for c in cols) for r in df.collect())
    return hashlib.sha256(repr(rows).encode()).hexdigest(), len(rows)


def inject(df, tag: str, fail: bool, mark_dir: str | None = None):
    """Pass-through mapInPandas that fails attempt 0 of the first
    FAIL_PARTS partitions when ``fail`` is set. Each injected failure
    drops a marker file into ``mark_dir`` BEFORE raising, so the
    harness can assert the chaos actually fired (a vacuous gate that
    injected nothing would still 'pass'). Local-mode only: workers
    share the driver's filesystem."""
    n_fail = FAIL_PARTS if fail else 0

    def gen(it):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if (
            ctx is not None
            and n_fail
            and ctx.partitionId() < n_fail
            and ctx.attemptNumber() == 0
        ):
            if mark_dir:
                safe = tag.replace("/", "_")
                open(
                    os.path.join(
                        mark_dir,
                        f"{safe}_s{ctx.stageId()}_p{ctx.partitionId()}",
                    ),
                    "w",
                ).close()
            raise RuntimeError(
                f"chaos[{tag}]: injected failure partition={ctx.partitionId()}"
            )
        yield from it

    return df.mapInPandas(gen, schema=df.schema)


class ScanInjector:
    """Context manager patching DataFrameReader.parquet so every scan
    in the query's plan carries the injector — no query rewrite."""

    def __init__(self, fail: bool, mark_dir: str | None = None):
        self.fail = fail
        self.mark_dir = mark_dir

    def __enter__(self):
        import pyspark.sql.readwriter as rw

        self._orig = rw.DataFrameReader.parquet
        fail, mark_dir = self.fail, self.mark_dir

        def patched(reader, *paths, **opts):
            df = self._orig(reader, *paths, **opts)
            return inject(
                df, f"scan:{os.path.basename(str(paths[0]))}", fail, mark_dir
            )

        rw.DataFrameReader.parquet = patched
        return self

    def __exit__(self, *exc):
        import pyspark.sql.readwriter as rw

        rw.DataFrameReader.parquet = self._orig


def run_one(spark, name: str, sf_dir: str) -> dict:
    from easy_etl_spark.queries import QUERIES
    from easy_etl_spark.session import release_caches

    out: dict = {"query": name, "sf_dir": sf_dir}
    t0 = time.time()
    h_clean, n_clean = frame_hash(QUERIES[name](spark, sf_dir))
    release_caches()
    out["clean"] = {"hash": h_clean, "rows": n_clean, "secs": round(time.time() - t0, 1)}

    t0 = time.time()
    with ScanInjector(fail=False):
        h_wrap, n_wrap = frame_hash(
            inject(QUERIES[name](spark, sf_dir), "final", fail=False)
        )
    release_caches()
    out["wrapped_nofail"] = {"hash": h_wrap, "rows": n_wrap, "secs": round(time.time() - t0, 1)}

    t0 = time.time()
    import tempfile

    mark_dir = tempfile.mkdtemp(prefix="chaos_marks_")
    try:
        with ScanInjector(fail=True, mark_dir=mark_dir):
            h_chaos, n_chaos = frame_hash(
                inject(QUERIES[name](spark, sf_dir), "final", fail=True, mark_dir=mark_dir)
            )
        release_caches()
        injected = len(os.listdir(mark_dir))
    finally:
        import shutil

        shutil.rmtree(mark_dir, ignore_errors=True)
    out["chaos"] = {
        "hash": h_chaos,
        "rows": n_chaos,
        "secs": round(time.time() - t0, 1),
        "injected_failures": injected,
    }

    out["ok"] = (
        h_clean == h_wrap == h_chaos
        and n_clean == n_wrap == n_chaos
        and injected > 0  # the gate must not pass vacuously
    )
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_QUERIES

    from easy_etl_spark.session import get_spark

    spark = get_spark("chaos-retry")
    assert "," in spark.sparkContext.master, (
        f"session master {spark.sparkContext.master} has no task-retry budget; "
        "SPARK_GRAFT_TASK_RETRIES must be set before session build"
    )

    bad = []
    for name in names:
        res = run_one(spark, name, sf_dir)
        print(json.dumps(res), flush=True)
        if not res["ok"]:
            bad.append(name)
    print(json.dumps({"metric": "chaos_retry", "queries": len(names), "failed": bad}))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
