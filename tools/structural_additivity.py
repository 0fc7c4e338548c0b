"""Structural K-additivity check for ``triangle_count`` (round 11;
repeatable version of the rounds 9-10 ad hoc verification).

The DuckDB oracle for triangle_count is a quadratic wedge join —
infeasible past sf1 (>78 GB spill at sf2.5, SWEEP_sf25_r09.json). The
gen_sf rungs replicate the lineitem graph as K DISJOINT isomorphic
components (per-copy key offsets, tools/gen_sf.py), so exact ground
truth at any rung is pure arithmetic on the sf0.1 oracle answer:

  n_nodes / n_edges / n_wedges / n_triangles scale EXACTLY by K, and
  global_clustering = round(3*T/W, 6) is invariant (the ratio is
  preserved; both engines round the same double).

This tool runs the DuckDB oracle at the sf0.1 anchor, the Spark engine
at the target rung, and asserts the K-scaled equality field by field.
A pass is exact ground truth, not a heuristic: any lost or duplicated
triangle/wedge/edge anywhere in the distributed plan breaks an
equality.

Usage: python tools/structural_additivity.py RUNG_DIR K
Prints one JSON line; exit 0 iff all five fields match.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ANCHOR = "/root/testdata/sf0.1"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def oracle_anchor() -> dict:
    import duckdb

    from __spark_entry__ import oracle_sql

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(ANCHOR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    row = con.execute(oracle_sql()["triangle_count"]).fetchone()
    cols = [d[0] for d in con.description]
    return dict(zip(cols, row))


def engine_rung(rung_dir: str) -> dict:
    from easy_etl_spark.queries import QUERIES
    from easy_etl_spark.session import get_spark, release_caches

    spark = get_spark("structural-additivity")
    t0 = time.time()
    rows = QUERIES["triangle_count"](spark, rung_dir).collect()
    wall = round(time.time() - t0, 1)
    release_caches()
    assert len(rows) == 1, f"triangle_count returned {len(rows)} rows"
    return dict(rows[0].asDict()), wall


def main() -> int:
    rung_dir, k = sys.argv[1], int(sys.argv[2])
    anchor = oracle_anchor()
    engine, wall = engine_rung(rung_dir)
    checks = {}
    ok = True
    for field in ("n_nodes", "n_edges", "n_wedges", "n_triangles"):
        want, got = anchor[field] * k, engine[field]
        checks[field] = {"anchor": anchor[field], "want": want, "got": got}
        ok &= want == got
    want_cc = round(
        3.0 * anchor["n_triangles"] / anchor["n_wedges"], 6
    )
    checks["global_clustering"] = {
        "want": want_cc,
        "got": engine["global_clustering"],
    }
    ok &= want_cc == engine["global_clustering"]
    print(
        json.dumps(
            {
                "rung_dir": rung_dir,
                "k": k,
                "anchor": ANCHOR,
                "engine_wall_secs": wall,
                "checks": checks,
                "match": bool(ok),
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
