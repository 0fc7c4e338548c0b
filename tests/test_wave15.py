"""Wave-15 pins: hard negatives and deterministic MLM masking."""

from __future__ import annotations

import hashlib
import math

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table


def test_hard_negatives_match_python_and_exclude_same_label(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    es = {r.vec_id: [float(x) for x in r.embedding] for r in vecs}
    lab = {r.vec_id: r.label for r in vecs}
    nrm = {v: math.sqrt(sum(x * x for x in e)) for v, e in es.items()}
    expected = {}
    for q in [v for v in es if v < 5]:
        scored = sorted(
            (
                (
                    -round(
                        sum(a * b for a, b in zip(es[q], es[c])) / (nrm[q] * nrm[c]), 6
                    ),
                    c,
                )
                for c in es
                if lab[c] != lab[q]
            ),
        )[:5]
        for rnk, (negcos, c) in enumerate(scored, start=1):
            expected[(q, rnk)] = (c, lab[c], -negcos)
    got = QUERIES["hard_negative_mining"](spark, sf_dir).collect()
    assert len(got) == len(expected)
    for r in got:
        assert expected[(r.query_id, r.rnk)] == (
            r.negative_id,
            r.negative_label,
            r.cosine,
        )
        assert r.negative_label != r.query_label


def test_mlm_masking_matches_python_md5(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()

    def masked(doc_id, pos):
        h = int(hashlib.md5(f"{doc_id}:{pos}".encode()).hexdigest()[:8], 16)
        return h % 5 == 0

    got = {r.doc_id: r for r in QUERIES["mlm_masking"](spark, sf_dir).collect()}
    assert set(got) == {r.doc_id for r in docs}
    any_masked = False
    for r in docs:
        toks = r.text.strip().split(" ")
        flags = [masked(r.doc_id, i + 1) for i in range(len(toks))]
        corrupted = " ".join("<X>" if f else t for t, f in zip(toks, flags))
        targets = " ".join(t for t, f in zip(toks, flags) if f)
        g = got[r.doc_id]
        assert g.n_tokens == len(toks)
        assert g.n_masked == sum(flags)
        assert g.corrupted_fp == hashlib.md5(corrupted.encode()).hexdigest()
        assert g.targets_fp == hashlib.md5(targets.encode()).hexdigest()
        any_masked = any_masked or any(flags)
    assert any_masked
