"""Round-12 A/B: dedup_minhash_lsh candidate generation — in-row bucket
expansion (round 11 shape, shipped) vs the (band, band_hash) bucket
self-join (round 10 shape). VERDICT r11 item 1: the driver measured the
touched query 23% slower in a degraded window while the builder's
same-window pair showed −12%; this script settles it with an
interleaved same-window A/B (noop sink, caches released between reps)
at any rung.

Usage:
  python tools/ab_minhash_r12.py [--reps 5] [--sf-dir DIR]
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

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def lsh_pairs(docs: DataFrame, cand_mode: str) -> DataFrame:
    """minhash_lsh_pairs with swappable candidate generation; everything
    else (index/signature caches, verification joins) is byte-identical
    to operators/dedup.minhash_lsh_pairs at its query defaults."""
    from easy_etl_spark.operators.dedup import (
        _shingle_index,
        _signatures_from_index,
    )
    from easy_etl_spark.session import track_cache

    threshold, num_perm, bands, k = 0.7, 48, 16, 3
    text_col, id_col = "text", "doc_id"
    rows_per_band = num_perm // bands
    idx = track_cache(_shingle_index(docs, text_col, id_col, k))
    sigs = track_cache(
        _signatures_from_index(idx, num_perm, id_col, with_sizes=True)
    )
    band_cols = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda bi: F.struct(
            bi.alias("band"),
            F.xxhash64(
                F.slice(F.col("sig"), bi * rows_per_band + 1, rows_per_band)
            ).alias("bh"),
        ),
    )
    buckets = sigs.select(
        F.col(id_col).alias("__id"), F.explode(band_cols).alias("b")
    ).select("__id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))
    if cand_mode == "inrow":
        cand = (
            buckets.groupBy("band", "bh")
            .agg(F.sort_array(F.collect_list("__id")).alias("ids"))
            .filter(F.size("ids") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "flatten(transform(ids, (x, i) ->"
                        " transform(slice(ids, i + 2, size(ids)), y ->"
                        "  struct(x AS id_a, y AS id_b))))"
                    )
                ).alias("p")
            )
            .select("p.id_a", "p.id_b")
            .distinct()
        )
    elif cand_mode == "selfjoin":
        l, r = buckets.alias("l"), buckets.alias("r")
        cand = (
            l.join(
                r,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bh") == F.col("r.bh"))
                & (F.col("l.__id") < F.col("r.__id")),
            )
            .select(
                F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b")
            )
            .distinct()
        )
    else:
        raise ValueError(cand_mode)
    sizes = sigs.select(F.col(id_col).alias("__id"), "__n")
    ia = idx.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sha"))
    ib = idx.select(F.col("__id").alias("__idb"), F.col("__sh").alias("__shb"))
    inter = (
        cand.join(ia, "id_a")
        .join(
            ib,
            (F.col("id_b") == F.col("__idb"))
            & (F.col("__sha") == F.col("__shb")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    sa = sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"))
    sb = sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("__inter")
                / (F.col("__na") + F.col("__nb") - F.col("__inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from easy_etl_spark.session import (
        get_spark,
        load_table,
        reclaim_blocks,
        release_caches,
    )

    spark = get_spark("ab-minhash-r12")
    warm_dir = "/root/testdata/sf0.001"
    for mode in ("inrow", "selfjoin"):
        lsh_pairs(load_table(spark, warm_dir, "documents"), mode).write.mode(
            "overwrite"
        ).format("noop").save()
        release_caches()
    spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet")).count()

    walls: dict[str, list[float]] = {"inrow": [], "selfjoin": []}
    docs = load_table(spark, args.sf_dir, "documents")
    # interleave so host drift hits both variants equally
    for rep in range(args.reps):
        for mode in ("inrow", "selfjoin") if rep % 2 == 0 else ("selfjoin", "inrow"):
            spark.sparkContext.setJobDescription(f"ab-minhash {mode} rep{rep}")
            t0 = time.perf_counter()
            lsh_pairs(docs, mode).write.mode("overwrite").format("noop").save()
            walls[mode].append(round(time.perf_counter() - t0, 3))
            release_caches()
            reclaim_blocks(spark)
    out = {
        m: {
            "runs": v,
            "min": min(v),
            "med": round(statistics.median(v), 3),
        }
        for m, v in walls.items()
    }
    out["sf_dir"] = args.sf_dir
    print(json.dumps(out))


if __name__ == "__main__":
    main()
