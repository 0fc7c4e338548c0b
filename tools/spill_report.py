"""Spill / peak-memory evidence for the heavy shuffle queries
(round 10, VERDICT r9 item 6).

Round 9 root-caused triangle_count's sf5 superlinearity to single-box
page-cache exhaustion by hand; this tool turns that diagnosis into a
repeatable measurement and a regression gate:

* ``run`` mode executes ONE query in THIS process with the Spark event
  log enabled (static conf — needs its own JVM), stops the session,
  and parses the completed log into per-query totals: peak execution
  memory (max over tasks), memory/disk bytes spilled, shuffle
  read/write bytes, input bytes, wall seconds.
* ``sweep`` mode spawns one ``run`` subprocess per query (fresh JVM,
  no cross-query GC/page-cache pollution) and writes a JSON ledger.
* ``gate`` mode compares two ledgers taken at different scale rungs:
  for each query, shuffle bytes and spill must not grow more than
  ``--slack`` x the data ratio (superlinear shuffle growth means the
  plan degraded — the round-9 K^2 pair explosion in range_join_binned
  is exactly what this catches); spill that appears out of nowhere
  (zero at the small rung, >1 GiB at the big one) also fails.

Usage:
  python tools/spill_report.py run SF_DIR QUERY
  python tools/spill_report.py sweep SF_DIR q1,q2,... --out ledger.json
  python tools/spill_report.py gate SMALL.json BIG.json --ratio 2.0 [--slack 2.0]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEAVY5 = [
    "triangle_count",
    "kcore_hindex",
    "lpa_communities",
    "corpus_build_report",
    "range_join_binned",
]


def _log_lines(path: str):
    """Spark 4 event logs are directories (eventlog_v2_*/events_*);
    older Sparks write a single file. Yield every line either way."""
    files = (
        sorted(
            p
            for p in glob.glob(os.path.join(path, "*"))
            if os.path.basename(p).startswith("events")
        )
        if os.path.isdir(path)
        else [path]
    )
    for fp in files:
        with open(fp) as f:
            yield from f


def parse_event_log(path: str) -> dict:
    peak = 0
    mem_spill = disk_spill = shuf_read = shuf_write = input_bytes = 0
    tasks = 0
    for line in _log_lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") != "SparkListenerTaskEnd":
            continue
        m = ev.get("Task Metrics") or {}
        tasks += 1
        peak = max(peak, m.get("Peak Execution Memory", 0))
        mem_spill += m.get("Memory Bytes Spilled", 0)
        disk_spill += m.get("Disk Bytes Spilled", 0)
        sr = m.get("Shuffle Read Metrics") or {}
        shuf_read += sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)
        sw = m.get("Shuffle Write Metrics") or {}
        shuf_write += sw.get("Shuffle Bytes Written", 0)
        im = m.get("Input Metrics") or {}
        input_bytes += im.get("Bytes Read", 0)
    return {
        "tasks": tasks,
        "peak_execution_memory": peak,
        "memory_bytes_spilled": mem_spill,
        "disk_bytes_spilled": disk_spill,
        "shuffle_read_bytes": shuf_read,
        "shuffle_write_bytes": shuf_write,
        "input_bytes": input_bytes,
    }


def run_one(sf_dir: str, name: str) -> dict:
    log_dir = tempfile.mkdtemp(prefix="spill_evlog_")
    # static conf: must be set BEFORE the session builds; get_spark
    # reads this env and rides it on the builder
    os.environ["SPARK_GRAFT_EVENTLOG_DIR"] = log_dir

    from easy_etl_spark.queries import QUERIES
    from easy_etl_spark.session import get_spark, release_caches

    spark = get_spark(f"spill-{name}")
    assert spark.sparkContext.getConf().get("spark.eventLog.enabled") == "true", (
        "event log conf did not reach the session (another session already "
        "active in this process?)"
    )
    t0 = time.time()
    QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
    wall = round(time.time() - t0, 1)
    release_caches()
    spark.stop()
    def _finalized():
        return [
            p
            for p in glob.glob(os.path.join(log_dir, "*"))
            if not p.endswith(".inprogress")
        ]

    logs = _finalized()
    if not logs:  # stop() should finalize; tolerate the rename racing
        time.sleep(2)
        logs = _finalized()
    truncated = False
    if not logs:
        # only an in-progress log exists: parse it but mark the record
        # loudly — its metrics undercount (the log is still being
        # written) and a gate must not treat them as a full measurement
        logs = glob.glob(os.path.join(log_dir, "*"))
        truncated = True
        if not logs:
            raise RuntimeError(f"no event log produced in {log_dir}")
    out = parse_event_log(sorted(logs)[-1])
    out.update({"query": name, "sf_dir": sf_dir, "wall_secs": wall})
    if truncated:
        out["error"] = "event log never finalized; metrics parsed from .inprogress (undercount)"
    import shutil

    shutil.rmtree(log_dir, ignore_errors=True)
    return out


def sweep(sf_dir: str, names: list[str], out_path: str, cpus: int) -> int:
    ledger: dict[str, dict] = {}
    for name in names:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "run", sf_dir, name],
            capture_output=True,
            text=True,
            env=dict(os.environ, SPARK_GRAFT_CPUS=str(cpus)),
            cwd=REPO,
            timeout=7200,
        )
        line = next(
            (l for l in reversed(proc.stdout.strip().splitlines()) if l.startswith("{")),
            None,
        )
        if proc.returncode != 0 or line is None:
            ledger[name] = {"query": name, "error": proc.stderr[-1500:]}
        else:
            ledger[name] = json.loads(line)
        print(f"{name}: {json.dumps(ledger[name])}", flush=True)
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "results": ledger}, f, indent=1, sort_keys=True)
    bad = [n for n, r in ledger.items() if "error" in r]
    print(f"== {len(ledger) - len(bad)}/{len(ledger)} ok -> {out_path}")
    return 1 if bad else 0


#: spill smaller than this is measurement noise, not a regression.
#: Applies ONLY to the spill metrics — shuffle bytes are deterministic
#: plan output, not noise, so a superlinear shuffle-growth regression
#: must fail the gate even when it stays under 1 GiB at the big rung
#: (ADVICE r10: the shared 1 GiB floor silently passed small-rung
#: shuffle regressions). Shuffle gets a small floor that only masks
#: empty/near-empty shuffles (broadcast-only plans).
SPILL_FLOOR = 1 << 30  # 1 GiB
SHUFFLE_FLOOR = 16 << 20  # 16 MiB


def gate(small_path: str, big_path: str, ratio: float, slack: float) -> int:
    small = json.load(open(small_path))["results"]
    big = json.load(open(big_path))["results"]
    failures = []
    for name, b in big.items():
        s = small.get(name)
        if not s or "error" in s or "error" in b:
            continue
        limit = ratio * slack
        for metric in ("shuffle_write_bytes", "memory_bytes_spilled", "disk_bytes_spilled"):
            sv, bv = s.get(metric, 0), b.get(metric, 0)
            floor = SHUFFLE_FLOOR if metric == "shuffle_write_bytes" else SPILL_FLOOR
            if bv <= floor:
                continue  # absolute noise floor (per-metric, see above)
            if sv == 0:
                failures.append(
                    f"{name}.{metric}: 0 -> {bv/2**30:.2f} GiB (appeared from nothing)"
                )
            elif bv > sv * limit:
                failures.append(
                    f"{name}.{metric}: {sv/2**30:.2f} -> {bv/2**30:.2f} GiB "
                    f"= {bv/sv:.1f}x > allowed {limit:.1f}x (data ratio {ratio} x slack {slack})"
                )
    for msg in failures:
        print("GATE FAIL", msg)
    if not failures:
        print(f"GATE OK: every metric within {slack}x the data ratio {ratio}")
    return 1 if failures else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="mode", required=True)
    r = sub.add_parser("run")
    r.add_argument("sf_dir")
    r.add_argument("query")
    s = sub.add_parser("sweep")
    s.add_argument("sf_dir")
    s.add_argument("queries", nargs="?", default=",".join(HEAVY5))
    s.add_argument("--out", default=None)
    s.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    g = sub.add_parser("gate")
    g.add_argument("small")
    g.add_argument("big")
    g.add_argument("--ratio", type=float, required=True, help="big/small data size ratio")
    g.add_argument("--slack", type=float, default=2.0)
    args = ap.parse_args()

    if args.mode == "run":
        print(json.dumps(run_one(args.sf_dir, args.query)))
        return 0
    if args.mode == "sweep":
        rung = os.path.basename(os.path.normpath(args.sf_dir))
        out = args.out or os.path.join(REPO, f"SPILL_{rung}.json")
        return sweep(args.sf_dir, args.queries.split(","), out, args.cpus)
    return gate(args.small, args.big, args.ratio, args.slack)


if __name__ == "__main__":
    sys.exit(main())
