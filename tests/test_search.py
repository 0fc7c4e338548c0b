"""Lexical search + BM25 (operators/search.py)."""

from __future__ import annotations

import pytest

from easy_etl_spark.operators import search

CORPUS = [
    (1, "spark join hash join join"),        # tf(join)=3
    (2, "hash hash hash hash"),              # tf(hash)=4 but 1 term
    (3, "spark filter scan"),                # no query terms
    (4, "join hash spark"),                  # 2 terms, tf=2
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id bigint, text string")


def test_term_frequencies(spark, docs):
    tf = {(r.doc_id, r.term): (r.tf, r.doc_len) for r in search.term_frequencies(docs).collect()}
    assert tf[(1, "join")] == (3, 5)
    assert tf[(2, "hash")] == (4, 4)
    assert tf[(4, "spark")] == (1, 3)
    assert (3, "join") not in tf


def test_lexical_topk_ranking_and_ties(spark, docs):
    out = search.lexical_topk(docs, ["join", "hash"], k=10).collect()
    # doc1: tf 3+1=4 / 2 terms; doc2: tf 4 / 1 term; doc4: tf 2 / 2 terms
    assert [(r.doc_id, r.total_tf, r.n_terms_matched) for r in out] == [
        (1, 4, 2),  # tie on total_tf=4 broken by more distinct terms
        (2, 4, 1),
        (4, 2, 2),
    ]


def test_bm25_matches_reference(spark, docs):
    corpus = {i: t.split() for i, t in CORPUS}
    ref = search.bm25_reference(corpus, ["join", "hash"])
    got = {r.doc_id: r.bm25 for r in search.bm25_topk(docs, ["join", "hash"], k=10).collect()}
    assert set(got) == set(ref)
    for d, s in ref.items():
        assert got[d] == pytest.approx(s, rel=1e-6), d


def test_bm25_no_match_empty(spark, docs):
    assert search.bm25_topk(docs, ["zzz"], k=5).count() == 0
    assert search.lexical_topk(docs, ["zzz"], k=5).count() == 0


def test_rrf_fuse_combines_and_ranks(spark):
    from easy_etl_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id bigint, rank int")
    b = spark.createDataFrame([(3, 1), (1, 2), (9, 3)], "doc_id bigint, rank int")
    out = rrf_fuse([a, b], k=60).collect()
    scores = {r.doc_id: (r.rrf_score, r.n_sources) for r in out}
    assert scores[1] == (round(1 / 61 + 1 / 62, 6), 2)
    assert scores[3] == (round(1 / 63 + 1 / 61, 6), 2)
    assert scores[2] == (round(1 / 62, 6), 1)
    assert scores[9] == (round(1 / 63, 6), 1)
    # both-source docs outrank single-source docs here
    assert [r.doc_id for r in out[:2]] == [1, 3]
