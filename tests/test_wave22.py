"""Wave-22 pin: the corpus-build composition census."""

from __future__ import annotations

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table


def test_corpus_build_census_monotone_and_consistent(spark, sf_dir):
    got = sorted(
        QUERIES["corpus_build_report"](spark, sf_dir).collect(),
        key=lambda r: r.stage_ord,
    )
    assert [r.stage for r in got] == [
        "raw",
        "curated",
        "decontaminated",
        "capped",
        "train_split",
    ]
    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()
    assert got[0].n_docs == n_raw
    # every stage only removes data
    for a, b in zip(got, got[1:]):
        assert b.n_docs <= a.n_docs
        assert b.n_tokens <= a.n_tokens
    # the pipeline must neither drop everything nor nothing
    assert 0 < got[-1].n_docs < n_raw
    assert got[-1].n_tokens > 0
    # cross-check stage 2 against the standalone curation query
    curated = QUERIES["curate_corpus"](spark, sf_dir).count()
    assert got[1].n_docs == curated
