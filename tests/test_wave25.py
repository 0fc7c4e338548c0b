"""Wave-25 pins: epoch shuffles and orphan routing."""

from __future__ import annotations

import hashlib

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table


def _key(epoch: int, doc_id: int) -> int:
    return int(hashlib.md5(f"{epoch}:{doc_id}".encode()).hexdigest()[:8], 16)


def test_epoch_shuffle_deterministic_and_distinct_per_epoch(spark, sf_dir):
    ids = [
        r.doc_id
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    got = {r.epoch: r for r in QUERIES["epoch_shuffle_plan"](spark, sf_dir).collect()}
    assert set(got) == {0, 1, 2}
    heads = set()
    for e in (0, 1, 2):
        keys = [( _key(e, d), d) for d in ids]
        head = [d for _, d in sorted(keys)[:5]]
        fp = hashlib.md5(",".join(str(d) for d in head).encode()).hexdigest()
        assert got[e].n_docs == len(ids)
        assert got[e].key_checksum == sum(k for k, _ in keys)
        assert got[e].head_fp == fp
        heads.add(fp)
    # each epoch is a DIFFERENT permutation
    assert len(heads) == 3


def test_orphan_routing_partitions_rows_exactly(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    ).collect()
    keys = {
        r.c_custkey
        for r in load_table(spark, sf_dir, "customer").select("c_custkey").collect()
        if r.c_custkey % 97 != 0
    }
    clean = [r.o_orderkey for r in orders if r.o_custkey in keys]
    quarantine = [r.o_orderkey for r in orders if r.o_custkey not in keys]
    got = {r.route: r for r in QUERIES["orphan_routing"](spark, sf_dir).collect()}
    assert got["clean"].n_rows == len(clean)
    assert got["clean"].key_checksum == sum(clean)
    assert got["quarantine"].n_rows == len(quarantine)
    assert got["quarantine"].key_checksum == sum(quarantine)
    assert quarantine, "the simulated purge must orphan some orders"
    assert got["clean"].n_rows + got["quarantine"].n_rows == len(orders)


def test_weekly_auc_matches_python_per_week(spark, sf_dir):
    import math
    from collections import defaultdict
    from datetime import datetime

    from tests.test_wave13 import _exact_auc

    events = load_table(spark, sf_dir, "events").select(
        "ts", "value", "event_type"
    ).collect()
    epoch = datetime(1970, 1, 1).date()
    by_week = defaultdict(list)
    for r in events:
        wk = (r.ts.date() - epoch).days // 7
        by_week[wk].append(
            (math.floor(r.value * 100 + 0.5), 1 if r.event_type == "purchase" else 0)
        )
    got = {r.week_num: r for r in QUERIES["weekly_auc_trend"](spark, sf_dir).collect()}
    expected_weeks = {
        wk
        for wk, pairs in by_week.items()
        if 0 < sum(y for _, y in pairs) < len(pairs)
    }
    assert set(got) == expected_weeks and expected_weeks
    for wk in expected_weeks:
        pairs = by_week[wk]
        assert got[wk].n_pos == sum(y for _, y in pairs)
        assert got[wk].n_neg == len(pairs) - got[wk].n_pos
        assert math.isclose(got[wk].auc, _exact_auc(pairs), abs_tol=5e-7)


def test_source_length_gini_matches_python(spark, sf_dir):
    import math
    from collections import defaultdict

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    ).collect()
    by_source = defaultdict(list)
    for r in docs:
        by_source[r.source].append((r.n_chars, r.doc_id))
    got = {r.source: r for r in QUERIES["source_length_gini"](spark, sf_dir).collect()}
    assert set(got) == set(by_source)
    for src, rows in by_source.items():
        rows.sort()
        n = len(rows)
        total = sum(x for x, _ in rows)
        wsum = sum((2 * i - n - 1) * x for i, (x, _) in enumerate(rows, start=1))
        g = got[src]
        assert g.n_docs == n and g.total_chars == total
        # half-up (engines) vs half-even (python round) can differ in
        # the last digit at exact .5 boundaries — compare with tolerance
        assert math.isclose(g.gini, wsum / (n * total), abs_tol=6e-7)
        assert 0.0 <= g.gini < 1.0


def test_dedup_pair_explain_consistent_with_pairs(spark, sf_dir):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    got = QUERIES["dedup_pair_explain"](spark, sf_dir).collect()
    assert {(r.id_a, r.id_b): r.jaccard for r in got} == pairs and pairs
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }

    def shingles(text):
        t = text.strip().split(" ")
        return {" ".join(t[i : i + 3]) for i in range(max(len(t) - 2, 1))}

    for r in got:
        sa, sb = shingles(docs[r.id_a]), shingles(docs[r.id_b])
        shared = sa & sb
        assert r.n_shared == len(shared)
        assert (r.size_a, r.size_b) == (len(sa), len(sb))
        assert r.sample_shingle == min(shared)
        assert r.sample_shingle in sa and r.sample_shingle in sb


def test_video_frame_sample_matches_python_bytes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    expected = {}
    for r in docs:
        bs = r.text.encode()
        for off in range(0, len(bs), 64):
            expected[(r.doc_id, off)] = bs[off]
    got = QUERIES["video_frame_sample"](spark, sf_dir).collect()
    assert {(r.doc_id, r.frame_offset): r.sample_byte for r in got} == expected


def test_dynamic_gap_sessions_match_python_replay(spark, sf_dir):
    from collections import defaultdict

    GAPS = {"click": 600, "view": 600, "error": 300, "signup": 1800, "purchase": 3600}
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for r in events:
        by_user[r.user_id].append((int(r.ts.timestamp()), r.event_id, r.event_type))
    expected = {}
    for uid, rows in by_user.items():
        rows.sort()
        sid = 0
        sessions = defaultdict(list)
        prev = None
        for sec, _eid, typ in rows:
            if prev is None or sec > prev[0] + GAPS[prev[1]]:
                sid += 1
            sessions[sid].append(sec)
            prev = (sec, typ)
        for s, secs in sessions.items():
            expected[(uid, s)] = (len(secs), max(secs) - min(secs))
    got = QUERIES["events_session_dynamic_gap"](spark, sf_dir).collect()
    assert {
        (r.user_id, r.session_id): (r.n_events, r.duration_s) for r in got
    } == expected
    # dynamic gaps must actually differ from the fixed-1800s behaviour
    fixed = QUERIES["events_session"](spark, sf_dir).count()
    assert len(got) != fixed


def test_priority_sample_matches_python_and_is_fixed_size(spark, sf_dir):
    import hashlib

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    M = 1_000_000_007
    pri = []
    for r in docs:
        if r.n_chars <= 0:
            continue
        u = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16) % M
        pri.append((u / r.n_chars, r.doc_id, r.source, r.n_chars))
    pri.sort()
    expected = {
        d: (src, w, round(p, 6), i + 1)
        for i, (p, d, src, w) in enumerate(pri[:50])
    }
    got = QUERIES["priority_sample"](spark, sf_dir).collect()
    assert len(got) == 50
    for r in got:
        assert expected[r.doc_id] == (r.source, r.weight, r.priority, r.rnk)
    # weighted: the sampled docs skew long (mean weight above corpus mean)
    corpus_mean = sum(r.n_chars for r in docs) / len(docs)
    sample_mean = sum(r.weight for r in got) / len(got)
    assert sample_mean > corpus_mean


def test_peak_concurrency_matches_python_sweep(spark, sf_dir):
    from collections import defaultdict

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    ).collect()
    by_user = defaultdict(list)
    for r in events:
        by_user[r.user_id].append((int(r.ts.timestamp()), r.event_id))
    spans = []
    for uid, rows in by_user.items():
        rows.sort()
        start = prev = rows[0][0]
        for sec, _eid in rows[1:]:
            if sec - prev > 1800:
                spans.append((start, prev))
                start = sec
            prev = sec
        spans.append((start, prev))
    bounds = defaultdict(list)
    for s, t in spans:
        day = s // 86400
        bounds[day].append((s, 1))
        bounds[day].append((t + 1, -1))
    expected = {}
    for day, bs in bounds.items():
        bs.sort(key=lambda b: (b[0], b[1]))  # -1 before +1 at ties
        peak = cur = 0
        for _, d in bs:
            cur += d
            peak = max(peak, cur)
        expected[day] = (peak, len(bs) // 2)
    got = {r.day_num: (r.peak_concurrent, r.n_sessions)
           for r in QUERIES["peak_concurrency"](spark, sf_dir).collect()}
    # the python replay uses local-tz epoch; normalize by comparing the
    # multiset of per-day values (day numbering may shift, values not)
    assert sorted(got.values()) == sorted(expected.values())
    assert len(got) == len(expected) and got


def test_file_health_report_matches_parquet_footers(spark, sf_dir, tmp_path):
    import os

    import pyarrow.parquet as pq

    # write a multi-file copy so there is more than one file to report on
    src = load_table(spark, sf_dir, "lineitem")
    src.repartition(4).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = {r.file_name: r.n_rows
           for r in QUERIES["file_health_report"](spark, str(tmp_path)).collect()}
    expected = {}
    root = tmp_path / "lineitem.parquet"
    for f in os.listdir(root):
        if f.endswith(".parquet"):
            expected[f] = pq.ParquetFile(str(root / f)).metadata.num_rows
    assert got == expected and len(expected) == 4
    rep = QUERIES["file_health_report"](spark, str(tmp_path)).collect()
    n_files, total = len(expected), sum(expected.values())
    for r in rep:
        assert r.balance_factor == round(r.n_rows * n_files / total, 4)


def test_ann_recall_consistent_with_component_queries(spark, sf_dir):
    """recall@10 must equal the overlap between the registered int-LSH
    retrieval and an exact int-d2 ranking computed independently."""
    import math

    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    qv = {
        r.vec_id: [math.floor(float(x) * 1e6 + 0.5) for x in r.embedding]
        for r in vecs
    }
    lsh = QUERIES["knn_lsh_int"](spark, sf_dir).collect()
    lsh_sets = {}
    for r in lsh:
        lsh_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {r.query_id: r for r in QUERIES["ann_recall_at_10"](spark, sf_dir).collect()}
    for q in [v for v in qv if v < 5]:
        exact = sorted(
            (sum((a - b) ** 2 for a, b in zip(qv[q], qv[c])), c)
            for c in qv
            if c != q
        )[:10]
        hits = sum(1 for _, c in exact if c in lsh_sets.get(q, set()))
        g = got[q]
        assert (g.k, g.n_hit, g.recall) == (10, hits, round(hits / 10.0, 4))
        assert 0 <= g.recall <= 1
