"""Streaming throughput at scale: run the core Structured Streaming
jobs over a rung's events table with Trigger.AvailableNow and report
rows/sec per job.

The batch twins' scaling is covered by scale_report.py; this measures
the STREAMING runtime itself — watermark bookkeeping, state store
updates, micro-batch scheduling — on real volume. The input is
re-written as a multi-file directory and streamed with
maxFilesPerTrigger so the run exercises several micro-batches (state
carry-over between batches), not one degenerate mega-batch.

Usage: python tools/stream_bench.py [rung_dir] [n_files] [files_per_trigger]
Prints one JSON line: {"rows": N, "jobs": {name: {"wall": s,
"rows_per_sec": r, "batches": b}}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from easy_etl_spark.session import get_spark, load_table  # noqa: E402
from easy_etl_spark.streaming import jobs  # noqa: E402


def main() -> None:
    rung = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1"
    )
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    per_trigger = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    spark = get_spark("easy-etl-spark-stream-bench")
    work = tempfile.mkdtemp(prefix="stream_bench_")
    src = os.path.join(work, "events")
    # multi-file copy so maxFilesPerTrigger yields real micro-batches
    ev = load_table(spark, rung, "events")
    ev.repartition(n_files).write.mode("overwrite").parquet(src)
    n_rows = spark.read.parquet(src).count()

    def run(name, build):
        out = os.path.join(work, f"out_{name}")
        ckpt = os.path.join(work, f"ckpt_{name}")
        stream = jobs.read_events_stream(
            spark, src, options={"maxFilesPerTrigger": per_trigger}
        )
        df = build(stream)
        t0 = time.perf_counter()
        q = (
            df.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        batches = q.lastProgress["batchId"] + 1 if q.lastProgress else None
        return {
            "wall": round(wall, 2),
            "rows_per_sec": round(n_rows / wall),
            "batches": batches,
        }

    results = {
        # watermarked tumbling agg: windowed state + eviction
        "tumbling_counts": run("tumbling", lambda s: jobs.tumbling_counts_stream(s)),
        # exact dedup: per-key state within the watermark horizon
        "dedup_stream": run("dedup", lambda s: jobs.dedup_stream(s)),
        # session windows: merging state
        "session_windows": run("session", lambda s: jobs.session_window_stream(s)),
    }
    print(json.dumps({"rung": rung, "rows": n_rows, "jobs": results}))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
