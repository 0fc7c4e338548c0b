"""Chunked, parallel, fresh-JVM oracle sweep orchestrator.

Rounds 7-9 established that per-rung DuckDB sweeps (sf1, sf2.5) are the
only tool that finds scale-only defects (5 real bugs in 4 rounds, all
invisible at sf0.01) — but each sweep was orchestrated ad hoc. This
tool makes the recipe repeatable:

* the registry is split into chunks; each chunk runs
  ``tools/compare_oracle.py SF_DIR name...`` in its OWN subprocess, so
  every chunk gets a fresh JVM (no session fatigue — the round-7/8
  lesson) and its own DuckDB spill dir (the round-9 lesson).
* N streams drain a shared queue; known-heavy queries are scheduled
  FIRST in solo chunks (longest-job-first keeps the makespan near the
  heaviest single oracle instead of heaviest + tail).
* a chunk timeout kills the subprocess; names the chunk never reported
  on are re-queued as solo chunks with the (larger) retry timeout.
  Names that did report keep their results — a straggler never
  invalidates its chunk-mates.
* results land in a JSON ledger {name: {status, secs, detail}} plus a
  one-line summary, so BASELINE.md entries can cite a file instead of
  a terminal scrollback.

Usage:
  python tools/sweep_oracle.py SF_DIR [--out ledger.json]
      [--chunk 8] [--streams 3] [--cpus 10] [--timeout 1200]
      [--retry-timeout 5400] [--only a,b,...] [--exclude a,b,...]
      [--skip-heavy]

Scale posture: this is test harness code (single host), but the
scheduling lesson transfers — on a real cluster the same sweep is one
Spark job per chunk with the heavy oracles on their own queue.
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import re
import shutil
import subprocess
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Oracles measured >120 s DuckDB-side at sf1/sf2.5 (BASELINE.md rounds
# 8-9). Solo chunks, scheduled first.
HEAVY = [
    "corpus_build_report",   # 1198 s sf1 / 2013 s sf2.5 (full-pipeline replay)
    "dedup_clusters",        # 357 s sf1
    "kcore_hindex",          # 296 s sf2.5 (DuckDB unrolled 3-round oracle)
    "lpa_communities",       # 251 s sf2.5
    "triangle_count",        # 294 s sf1; INFEASIBLE at sf2.5 (wedge join spills >78 GB)
    "dedup_embedding_cosine",  # INFEASIBLE at sf2.5 in DuckDB (1.25G-pair SQL); numpy path instead
    "bfs_hop_histogram",
    "semantic_dedup",
    "video_frame_sample",    # large result collect
    "events_session_flush",  # ~1M-row multiset compare
    "range_join_binned",     # engine is linear, but the DuckDB oracle is a quadratic IEJoin
    "recursive_org_rollup",  # 755 s DuckDB-side at sf2.5
    "jaccard_prefix_join",   # engine ~15 min at sf5; oracle is the UNFILTERED quadratic index join
]

# Known-infeasible (oracle-side) per rung: swept only with --force via
# --only; their ground truth comes from structural/numpy checks
# (BASELINE.md round 9).
INFEASIBLE = {
    "testdata_sf25": {"triangle_count", "dedup_embedding_cosine"},
    # corpus_build_report's COMPOSED replay oracle needs >90 GB of
    # DuckDB spill at sf5 (observed: filled the disk twice, round 10);
    # every constituent stage is individually oracle-verified at sf5
    # and the composition is anchored by the full oracle at sf2.5.
    "testdata_sf5": {"triangle_count", "dedup_embedding_cosine", "corpus_build_report"},
    "testdata_sf10": {"triangle_count", "dedup_embedding_cosine", "corpus_build_report"},
}

# Full-row-output queries (result cardinality ~ input cardinality):
# multi-million rows at sf5, past the collect path's driver-memory
# ceiling. Scheduled in their own chunks with --via-parquet (round 9's
# parquet-mediated compare; the 17 names verified that way in
# SWEEP_sf5_r09.json).
VIA_PARQUET = {
    "cast_types",
    "cdc_apply_changes",
    "default_falsy",
    "events_session",
    "events_session_dynamic_gap",
    "events_session_flush",
    "events_trailing_hour",
    "feature_matrix_pit",
    "ignore_drop",
    "incremental_join_maintenance",
    "incremental_watermark",
    "link_closest_shipdate",
    "merge_upsert",
    "middleware_pandas",
    "running_total",
    "scalar_functions",
    "window_rank_functions",
}

LINE = re.compile(r"^(OK|FAIL|SKIP)\s+(\S+?):?\s+(.*)$")

# Infrastructure failures, not correctness verdicts: the chunk's JVM or
# DuckDB died out from under the remaining queries. Requeued solo like
# unresolved names instead of being recorded as FAIL.
TRANSIENT = re.compile(
    r"Connection refused|No space left|Could not write file|"
    r"Java gateway process|Py4JNetworkError|Answer from Java side is empty"
)


def registry_names() -> list[str]:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    return list(entry.queries().keys())


def parse_chunk_output(text: str) -> dict[str, tuple[str, str]]:
    out: dict[str, tuple[str, str]] = {}
    for raw in text.splitlines():
        m = LINE.match(raw.strip())
        if m:
            status, name, detail = m.groups()
            out[name] = (status, detail.strip())
    return out


def run_chunk(sf_dir: str, names: list[str], timeout: int, cpus: int) -> tuple[dict, list[str], str]:
    """Run one compare_oracle subprocess; return (results, unresolved, err)."""
    # orchestrator-owned spill dir: a SIGKILLed chunk (timeout) cannot
    # clean up after itself, and a leaked sf2.5 spill is ~30 GB
    spill = tempfile.mkdtemp(prefix="sweep_spill_")
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_ORACLE_TMP=spill)
    flags = ["--via-parquet"] if all(n in VIA_PARQUET for n in names) else []
    cmd = [sys.executable, os.path.join(REPO, "tools", "compare_oracle.py"), *flags, sf_dir, *names]
    t0 = time.time()
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO
        )
        text, err = proc.stdout, ("" if proc.returncode in (0, 1) else proc.stderr[-2000:])
    except subprocess.TimeoutExpired as e:
        text = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
        err = f"chunk timeout after {timeout}s"
    finally:
        shutil.rmtree(spill, ignore_errors=True)
    chunk_secs = round(time.time() - t0, 1)
    parsed = parse_chunk_output(text)
    results = {}
    for n, (st, d) in parsed.items():
        if n not in names:
            continue
        # per-query secs: compare_oracle prints "..., 4.5s)" on OK/SKIP
        # lines — use that; stamping every chunk-mate with the whole-chunk
        # elapsed overstated light queries (ADVICE round 9). chunk_secs is
        # kept separately for makespan accounting.
        m = re.search(r"([\d.]+)s\)\s*$", d)
        secs = float(m.group(1)) if m else chunk_secs
        results[n] = {"status": st, "detail": d, "secs": secs, "chunk_secs": chunk_secs}
    unresolved = [n for n in names if n not in results]
    return results, unresolved, err


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--out", default=None)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--streams", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=10, help="SPARK_GRAFT_CPUS per stream")
    ap.add_argument("--timeout", type=int, default=1200)
    ap.add_argument("--retry-timeout", type=int, default=5400)
    ap.add_argument("--only", default="")
    ap.add_argument("--exclude", default="")
    ap.add_argument("--skip-heavy", action="store_true", help="drop HEAVY names entirely")
    args = ap.parse_args()

    names = registry_names()
    rung = os.path.basename(os.path.normpath(args.sf_dir))
    infeasible = INFEASIBLE.get(rung, set())
    only = {s for s in args.only.split(",") if s}
    exclude = {s for s in args.exclude.split(",") if s}
    if only:
        names = [n for n in names if n in only]
    else:
        names = [n for n in names if n not in exclude and n not in infeasible]
        if args.skip_heavy:
            names = [n for n in names if n not in HEAVY]

    heavy = [n for n in HEAVY if n in names]
    viap = [n for n in names if n in VIA_PARQUET and n not in heavy]
    light = [n for n in names if n not in heavy and n not in viap]
    chunks: list[list[str]] = [[n] for n in heavy]
    # via-parquet names chunk together so the whole chunk can carry the
    # flag (compare_oracle applies it invocation-wide)
    chunks += [viap[i : i + args.chunk] for i in range(0, len(viap), args.chunk)]
    chunks += [light[i : i + args.chunk] for i in range(0, len(light), args.chunk)]

    work: queue.Queue = queue.Queue()
    for c in chunks:
        work.put((c, args.timeout, False))

    ledger: dict[str, dict] = {}
    lock = threading.Lock()
    t_start = time.time()

    def worker():
        while True:
            try:
                chunk, tmo, is_retry = work.get_nowait()
            except queue.Empty:
                return
            results, unresolved, err = run_chunk(args.sf_dir, chunk, tmo, args.cpus)
            if not is_retry:
                # infra-killed chunk mates (dead JVM / full disk) get a
                # fresh solo attempt instead of a recorded FAIL
                transient = [
                    n
                    for n, r in results.items()
                    if r["status"] == "FAIL" and TRANSIENT.search(r["detail"])
                ]
                for n in transient:
                    del results[n]
                unresolved = unresolved + transient
            with lock:
                ledger.update(results)
                for n, r in results.items():
                    print(f"[{time.time()-t_start:7.0f}s] {r['status']:4} {n} ({r['detail'][:100]})", flush=True)
                for n in unresolved:
                    if is_retry:
                        ledger[n] = {"status": "TIMEOUT", "detail": err, "secs": tmo}
                        print(f"[{time.time()-t_start:7.0f}s] TIMEOUT {n} ({err})", flush=True)
                    else:
                        work.put(([n], args.retry_timeout, True))
                        print(f"[{time.time()-t_start:7.0f}s] RETRY {n} solo ({err or 'unresolved in chunk'})", flush=True)
            work.task_done()

    threads = [threading.Thread(target=worker, daemon=True) for _ in range(args.streams)]
    for t in threads:
        t.start()
    # workers re-enqueue retries; join the queue, then let workers drain
    while any(t.is_alive() for t in threads):
        time.sleep(5)
        if work.unfinished_tasks == 0:
            break
    for t in threads:
        t.join(timeout=args.retry_timeout + 60)

    counts: dict[str, int] = {}
    for r in ledger.values():
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    summary = {
        "sf_dir": args.sf_dir,
        "total": len(names),
        "counts": counts,
        "wall_secs": round(time.time() - t_start, 1),
        "excluded_infeasible": sorted(infeasible & set(registry_names())) if not only else [],
        "results": ledger,
    }
    out = args.out or f"SWEEP_{rung}.json"
    with open(os.path.join(REPO, out), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    bad = [n for n, r in ledger.items() if r["status"] in ("FAIL", "TIMEOUT")]
    print(f"\n== {counts} wall={summary['wall_secs']}s -> {out}")
    if bad:
        print("== BAD:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
