"""Scaling evidence: time a query set across scale-factor rungs and
print per-query seconds + rung-over-rung ratios.

A query whose runtime grows ~linearly with SF (ratio ≈ rung size
ratio, minus fixed per-query overhead) scales; one whose ratio blows
past the data ratio has a super-linear stage (all-pairs join, driver
collect, single-partition funnel) and is a 100 TB bug regardless of
its absolute sf0.1 time.

Usage: python tools/scale_report.py [dir ...]   (default: sf0.01,
sf0.1 from /root/testdata + the repo's generated testdata_sf1)

Prints one JSON line: {"dirs": [...], "rows": {query: [sec, ...]},
"totals": [...], "ratios": {query: [r1, ...]}} — ratios are
consecutive-rung runtime ratios.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, HEADLINE_V2, _prime_ivf  # noqa: E402
from easy_etl_spark.session import get_spark, release_caches  # noqa: E402

DEFAULT_DIRS = [
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1"),
]


def main() -> None:
    from easy_etl_spark.queries import QUERIES

    dirs = [d for d in (sys.argv[1:] or DEFAULT_DIRS) if os.path.isdir(d)]
    if not dirs:
        sys.exit(
            "scale_report: no rung directory exists — pass parquet dirs as "
            "arguments or generate one with tools/gen_sf.py"
        )
    names = HEADLINE + HEADLINE_V2
    spark = get_spark("easy-etl-spark-scale-report")

    # warmup (codegen/JVM/python-worker priming) at the smallest rung
    for name in names:
        try:
            QUERIES[name](spark, dirs[0]).write.mode("overwrite").format("noop").save()
        except Exception:
            pass
    release_caches()

    rows: dict[str, list] = {n: [] for n in names}
    for d in dirs:
        _prime_ivf(spark, d)
        for name in names:
            # one query failing at one rung (OOM at the largest SF, a
            # missing optional table) must not discard every timing
            # already collected — record None and keep sweeping
            t0 = time.perf_counter()
            try:
                QUERIES[name](spark, d).write.mode("overwrite").format("noop").save()
                rows[name].append(round(time.perf_counter() - t0, 3))
            except Exception as e:
                print(f"FAIL {name} @ {d}: {e}", file=sys.stderr)
                rows[name].append(None)
            release_caches()

    ratios = {
        n: [
            round(v[i + 1] / v[i], 2) if v[i] and v[i + 1] else None
            for i in range(len(v) - 1)
        ]
        for n, v in rows.items()
    }
    print(
        json.dumps(
            {
                "dirs": dirs,
                "rows": rows,
                "totals": [
                    round(sum(v[i] for v in rows.values() if v[i] is not None), 3)
                    for i in range(len(dirs))
                ],
                "ratios": ratios,
            }
        )
    )


if __name__ == "__main__":
    main()
