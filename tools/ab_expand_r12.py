"""Round-12 A/B: streaming two-level pair expansion (shipped) vs the
round-11 single-shot flatten(transform(...)) expansion, interleaved in
one session/window, through the two hottest consumers
(dedup_threshold_sweep, dedup_minhash_lsh). Monkeypatches
dedup._expand_sorted_pairs per rep so everything else is identical.

Usage: python tools/ab_expand_r12.py [--reps 4] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def flatten_expand(grouped, ids_col: str = "ids"):
    """The round-11 expansion (whole |ids|²/2 array per row)."""
    return grouped.select(
        F.explode(
            F.expr(
                f"flatten(transform({ids_col}, (x, i) ->"
                f" transform(slice({ids_col}, i + 2, size({ids_col})), y ->"
                "  struct(x AS id_a, y AS id_b))))"
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from easy_etl_spark.operators import dedup
    from easy_etl_spark.queries import QUERIES
    from easy_etl_spark.session import get_spark, reclaim_blocks, release_caches

    streaming = dedup._expand_sorted_pairs
    names = ["dedup_threshold_sweep", "dedup_minhash_lsh"]

    spark = get_spark("ab-expand-r12")
    warm = "/root/testdata/sf0.001"
    for n in names:
        QUERIES[n](spark, warm).write.mode("overwrite").format("noop").save()
        release_caches()
    spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet")).count()

    walls: dict[str, list[float]] = {}
    for rep in range(args.reps):
        modes = ("stream", "flatten") if rep % 2 == 0 else ("flatten", "stream")
        for mode in modes:
            dedup._expand_sorted_pairs = (
                streaming if mode == "stream" else flatten_expand
            )
            for n in names:
                spark.sparkContext.setJobDescription(f"ab-expand {n} {mode} r{rep}")
                t0 = time.perf_counter()
                QUERIES[n](spark, args.sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                walls.setdefault(f"{n}:{mode}", []).append(
                    round(time.perf_counter() - t0, 3)
                )
                release_caches()
                reclaim_blocks(spark)
    dedup._expand_sorted_pairs = streaming
    out = {
        k: {"runs": v, "min": min(v), "med": round(statistics.median(v), 3)}
        for k, v in walls.items()
    }
    out["sf_dir"] = args.sf_dir
    print(json.dumps(out))


if __name__ == "__main__":
    main()
