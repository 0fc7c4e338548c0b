"""Round-batched BPE trainer: bit-equality with the sequential
reference on corpora ENGINEERED so naive batching would diverge —
overlapping top pairs, merge-created risers that outrank later
candidates, and self-pair bridges."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from easy_etl_spark.operators.bpe import (
    _select_batch,
    train_merges,
    train_merges_with_state,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def _merge_rows(df):
    return [
        (r.rank, r.pair, r.merged, r.support)
        for r in df.orderBy("rank").collect()
    ]


def _assert_parity(spark, texts, k):
    docs = _docs(spark, texts)
    seq = _merge_rows(train_merges(docs, k=k, batched=False))
    bat = _merge_rows(train_merges(docs, k=k, batched=True))
    assert bat == seq
    # the final symbol states must agree too (encode-side contract)
    _, ws = train_merges_with_state(docs, k=k, batched=False)
    _, wb = train_merges_with_state(docs, k=k, batched=True)
    assert sorted(map(tuple, ws.collect())) == sorted(map(tuple, wb.collect()))
    return seq


def test_batched_equals_sequential_disjoint_corpus(spark):
    """All top pairs symbol-disjoint: one round must emit several
    merges and still match sequential exactly."""
    texts = ["ab"] * 400 + ["cd"] * 100 + ["ef"] * 20 + ["gh"] * 4
    seq = _assert_parity(spark, texts, k=4)
    assert [m[1] for m in seq] == ["a b", "c d", "e f", "g h"]


def test_batched_prefix_stop_when_merge_spawns_better_pair(spark):
    """After merging (a b), the created (q ab) pair outranks (z y) —
    a batcher that skipped the conflicting (q a) and took (z y) in
    round 1 would be wrong. The prefix rule must stop at (q a)."""
    texts = ["qab"] * 100 + ["zy"] * 100
    seq = _assert_parity(spark, texts, k=3)
    # sequential truth: (a b) tie-breaks first, then the riser (q ab)
    # beats (z y) lexicographically at equal support
    assert [m[1] for m in seq] == ["a b", "q ab", "z y"]


def test_batched_count_bound_blocks_equal_count_riser(spark):
    """Merging (a y) destroys (y z) and creates (ay z) at the SAME
    support as the disjoint non-self candidate (c d) — and (ay z) wins
    the lexicographic tie, so batching (c d) in round 1 would emit the
    wrong rank-2 merge. The 2^(i-1) count bound must keep it out."""
    texts = ["ayz"] * 60 + ["cd"] * 60
    seq = _assert_parity(spark, texts, k=3)
    assert [m[1] for m in seq] == ["a y", "ay z", "c d"]


def test_batched_self_pair_bridges_its_own_riser(spark):
    """(a a) over runs 'a a a' creates (aa a) with support bounded by
    (a a)'s OWN count, not by stop_count — batching anything after a
    self-pair is unsound, and sequential truth shows it: (aa a) beats
    the disjoint (c d)."""
    texts = ["aaa"] * 100 + ["cd"] * 60
    seq = _assert_parity(spark, texts, k=3)
    assert [m[1] for m in seq][:2] == ["a a", "aa a"]


def test_batched_randomized_corpora_parity(spark):
    """Randomized stress: words with heavy symbol overlap, repeated
    runs, and shared prefixes."""
    import random

    rng = random.Random(99)
    alphabet = list("abcdef")
    texts = []
    for _ in range(300):
        n = rng.randrange(1, 6)
        texts.append("".join(rng.choice(alphabet) for _ in range(n)))
    _assert_parity(spark, texts, k=6)


def test_select_batch_rules_unit():
    rows = [
        {"pr": "a b", "c": 100},
        {"pr": "b c", "c": 90},  # shares b -> stops the scan
        {"pr": "x y", "c": 80},
    ]
    batch, stop = _select_batch(rows, window=32)
    assert [b[0] for b in batch] == ["a b"] and stop == 90
    rows = [
        {"pr": "a a", "c": 100},  # self-pair ends the batch after itself
        {"pr": "x y", "c": 80},
    ]
    batch, stop = _select_batch(rows, window=32)
    assert [b[0] for b in batch] == ["a a"] and stop == 100
    rows = [
        {"pr": "a b", "c": 100},
        {"pr": "c d", "c": 90},
        {"pr": "ab x", "c": 80},  # collides with merged("a b")
    ]
    batch, stop = _select_batch(rows, window=32)
    assert [b[0] for b in batch] == ["a b", "c d"] and stop == 80
    # window NOT exhausted and fully disjoint: nothing unseen -> 0
    rows = [{"pr": "a b", "c": 100}, {"pr": "c d", "c": 90}]
    batch, stop = _select_batch(rows, window=32)
    assert len(batch) == 2 and stop == 0
    # window exhausted: the unseen tail is bounded by the last count
    batch, stop = _select_batch(rows, window=2)
    assert stop == 90


def test_batched_uses_fewer_rounds(spark, monkeypatch):
    """The point of batching: a disjoint-heavy corpus must train k
    merges in strictly fewer pair-count rounds than sequential's k."""
    import easy_etl_spark.operators.bpe as bpe

    calls = {"n": 0}
    real = bpe._pair_counts

    def counting(words):
        calls["n"] += 1
        return real(words)

    monkeypatch.setattr(bpe, "_pair_counts", counting)
    texts = ["ab"] * 400 + ["cd"] * 100 + ["ef"] * 20 + ["gh"] * 4
    train_merges(_docs(spark, texts), k=4, batched=True)
    assert calls["n"] == 1, f"expected 1 counting round, got {calls['n']}"
