"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with a noop-format write (full
distributed materialization, no driver collect). Session build and
first-touch JVM warmup are excluded from per-query times; a warmup
pass over lineitem primes the file-scan caches the way a long-running
cluster job would be warm.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from easy_etl_spark.session import get_spark, release_caches

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: headline set: core relational + every extension family
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_volume",
    "q6_revenue_delta",
    "topk_per_group",
    "running_total",
    "link_customer_nation",
    "link_closest_shipdate",
    "merge_upsert",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "knn_brute_force",
    "text_profile",
    "events_tumbling",
    "events_session",
    "q9_profit_by_nation",
    "q13_customer_distribution",
    "q21_exclusive_returns",
    "events_interval_join",
    "knn_ivf",
    "decontaminate_overlap",
    "sequence_packing",
    "inference_batch_score",
]

#: second headline set (round 4+): the families added after the
#: historic 24-query set froze. Reported as a separate total so the
#: round-1 baseline number stays comparable while these stay
#: regression-visible.
HEADLINE_V2 = [
    "event_transitions",
    "dedup_incremental",
    "triangle_count",
    "corpus_build_report",
    "mmr_rerank_topk",
    "multimodal_decode_png",
    "events_session_flush",
    "vocab_encode",
    # round 5: salted hot-key join (skew evidence: tools/skew_bench.py)
    "skew_salted_join_hot",
]


def main() -> None:
    from easy_etl_spark.queries import QUERIES

    spark = get_spark("easy-etl-spark-bench")
    # Warmup pass: run every headline query once at the smallest SF.
    # This primes JVM/codegen caches and Python worker pools exactly the
    # way a long-running cluster is primed, so the timed pass below
    # measures steady-state operator cost at the target SF rather than
    # first-touch class generation (which at sf0.1 dominates: the same
    # query is ~5-10x slower on its first-ever execution). The warmup
    # reads DIFFERENT (tiny) files — only plan-structure caches carry.
    warm_dir = "/root/testdata/sf0.001"
    warm_sf = warm_dir if os.path.isdir(warm_dir) else SF_DIR
    for name in HEADLINE + HEADLINE_V2:
        try:
            QUERIES[name](spark, warm_sf).write.mode("overwrite").format("noop").save()
        except Exception:
            pass
    release_caches()
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    def timed(names: list[str]) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in names:
            fn = QUERIES[name]
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            out[name] = round(time.perf_counter() - t0, 3)
            # operator-internal caches (vocab counts, adjacency lists,
            # curation frames) are tracked; release them so one query's
            # executor storage never leaks into the next measurement
            release_caches()
        return out

    times = timed(HEADLINE)
    times_v2 = timed(HEADLINE_V2)

    sf = float(SF_DIR.rstrip("/").split("sf")[-1]) if "sf" in SF_DIR else -1.0
    print(
        json.dumps(
            {
                # "value" stays the HISTORIC 24-query total — directly
                # comparable to BENCH_r01..r03 / BASELINE.md
                "metric": "headline_query_wall_seconds",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
                # round-4+ families, reported separately (see HEADLINE_V2)
                "metric_v2": "headline_v2_query_wall_seconds",
                "value_v2": round(sum(times_v2.values()), 3),
                "queries_v2": times_v2,
            }
        )
    )


if __name__ == "__main__":
    main()
