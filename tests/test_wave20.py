"""Wave-20 pin: RAG context assembly vs a Python replay."""

from __future__ import annotations

import hashlib
import math

from easy_etl_spark.queries import QUERIES
from easy_etl_spark.session import load_table

BUDGET = 64


def test_rag_assembly_matches_python_replay(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    docs = {
        r.doc_id: r.text.strip().split(" ")
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    es = {r.vec_id: [float(x) for x in r.embedding] for r in vecs}
    nrm = {v: math.sqrt(sum(x * x for x in e)) for v, e in es.items()}
    got = {r.query_id: r for r in QUERIES["rag_context_assembly"](spark, sf_dir).collect()}
    truncated_somewhere = False
    for q in [v for v in es if v < 5]:
        top = sorted(
            (
                (-round(sum(a * b for a, b in zip(es[q], es[c])) / (nrm[q] * nrm[c]), 6), c)
                for c in es
                if c != q
            )
        )[:3]
        pieces, used, total = [], 0, 0
        for _, c in top:
            t = docs[c]
            take = min(max(BUDGET - total, 0), len(t))
            total += take
            if take > 0:
                used += 1
                pieces.append(" ".join(t[:take]))
            truncated_somewhere = truncated_somewhere or 0 < take < len(t)
        g = got[q]
        assert g.n_docs_used == used
        assert g.n_tokens == total
        assert g.context_fp == hashlib.md5(" ".join(pieces).encode()).hexdigest()
    assert truncated_somewhere, "budget must actually truncate a document"
