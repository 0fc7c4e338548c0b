"""Property-based tests (hypothesis): the reference's semantic quirks
hold for *arbitrary* inputs, not just the fixture rows.

The reference's own tests assert invariants on random 3-row tables
(easy_etl/tests/conftest.py:8-21); this is the same idea pushed
further — each property states the contract the Spark implementation
must share with plain Python semantics.

One Spark job per example is slow, so each property batches all
hypothesis-drawn rows into ONE DataFrame per example set.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from easy_etl_spark.functions.transforms import apply_transform, falsy_default
from easy_etl_spark.operators.links import asof_link
from easy_etl_spark.sources.sinks import dense_ids

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# printable-ish strings incl. empties, tabs/newlines, whitespace edges
_texts = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=32, max_codepoint=126),
        st.sampled_from("\t\n"),
    ),
    max_size=20,
)


@given(vals=st.lists(st.one_of(st.none(), _texts), min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_falsy_default_matches_python_or(spark, vals):
    # reference: `data or default` (easy_etl/__init__.py:147) — falsy
    # (None, '') replaced, everything else kept
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v string")
    out = df.withColumn("v", falsy_default(df, "v", "X"))
    got = {r["i"]: r["v"] for r in out.collect()}
    assert got == {i: (v or "X") for i, v in enumerate(vals)}


@given(
    vals=st.lists(_texts, min_size=1, max_size=20),
    chain=st.lists(
        st.sampled_from(
            ["upper", "lower", "strip", "lstrip", "rstrip", "title", "capitalize", "swapcase"]
        ),
        min_size=1,
        max_size=4,
    ),
)
@settings(**_SETTINGS)
def test_transform_chain_matches_python_method_chain(spark, vals, chain):
    # chained transforms apply in call order, each resolving to the
    # value's own method (easy_etl/__init__.py:170-191); the native
    # Column whitelist must agree with CPython string semantics
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v string")
    out = df
    for m in chain:
        out = apply_transform(out, "v", m, (), {})
    got = {r["i"]: r["v"] for r in out.collect()}
    for i, v in enumerate(vals):
        expect = v
        for m in chain:
            expect = getattr(expect, m)()
        assert got[i] == expect, (v, chain)


@given(
    dim_vals=st.lists(st.integers(-100, 100), min_size=1, max_size=30),
    fact_vals=st.lists(st.integers(-120, 120), min_size=1, max_size=30),
    method=st.sampled_from([">=", ">", "<=", "<"]),
)
@settings(**_SETTINGS)
def test_asof_link_matches_naive_python(spark, dim_vals, fact_vals, method):
    # directional first-match semantics (easy_etl/__init__.py:121-135):
    # smallest child ≥ value (ASC ops) / largest child ≤ value (DESC),
    # min id on duplicate children, NULL when nothing qualifies
    dim_rows = [(v, i + 1) for i, v in enumerate(dim_vals)]
    fact_rows = [(v,) for v in fact_vals]
    dim = spark.createDataFrame(dim_rows, "child long, id long")
    fact = spark.createDataFrame(fact_rows, "f long")
    out = {
        r["f"]: r["cid"]
        for r in asof_link(fact, dim, "f", "child", name="cid", method=method).collect()
    }
    ops = {">=": lambda c, v: c >= v, ">": lambda c, v: c > v,
           "<=": lambda c, v: c <= v, "<": lambda c, v: c < v}
    for v in fact_vals:
        qual = [(c, i) for c, i in dim_rows if ops[method](c, v)]
        if not qual:
            expect = None
        elif method in (">=", ">"):
            best = min(c for c, _ in qual)
            expect = min(i for c, i in qual if c == best)
        else:
            best = max(c for c, _ in qual)
            expect = min(i for c, i in qual if c == best)
        assert out[v] == expect, (v, method)


@given(n=st.integers(1, 200), parts=st.integers(1, 8), offset=st.integers(0, 1000))
@settings(**_SETTINGS)
def test_dense_ids_always_dense_from_offset(spark, n, parts, offset):
    df = spark.range(n).repartition(parts)
    out = dense_ids(df, "id2", offset)
    ids = sorted(r["id2"] for r in out.collect())
    assert ids == list(range(offset + 1, offset + n + 1))


@given(
    n_users=st.integers(1, 5),
    n_events=st.integers(1, 40),
    minutes=st.integers(1, 60),
)
@settings(**_SETTINGS)
def test_interval_pairs_matches_naive_python(spark, n_users, n_events, minutes):
    import datetime as dt
    import random

    from easy_etl_spark.streaming.windows import interval_pairs

    rng = random.Random(n_users * 1000 + n_events)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + dt.timedelta(seconds=rng.randrange(0, 7200)),
            rng.randrange(n_users),
            rng.choice(["click", "purchase", "view"]),
        )
        for i in range(n_events)
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (r["user_id"], r["left_id"], r["right_id"], r["gap_us"])
        for r in interval_pairs(events, "click", "purchase", minutes).collect()
    }
    lim = dt.timedelta(minutes=minutes)
    expect = {
        (u, li, ri, int((rts - lts).total_seconds() * 1_000_000))
        for (li, lts, u, lt) in rows
        if lt == "click"
        for (ri, rts, u2, rt) in rows
        if rt == "purchase" and u2 == u and lts <= rts < lts + lim
    }
    assert got == expect


@given(
    vals=st.lists(_texts, min_size=1, max_size=15),
    old=st.text(alphabet="ab ", min_size=1, max_size=2),
    new=st.text(alphabet="xy", max_size=2),
    width=st.integers(0, 25),
)
@settings(**_SETTINGS)
def test_replace_and_zfill_match_python(spark, vals, old, new, width):
    # str.replace is literal and global; str.zfill never truncates and
    # pads after a leading sign (easy_etl transform contract: the
    # value's own method semantics)
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v string")
    out = apply_transform(df, "v", "replace", (old, new), {})
    out = apply_transform(out, "v", "zfill", (width,), {})
    got = {r["i"]: r["v"] for r in out.collect()}
    for i, v in enumerate(vals):
        assert got[i] == v.replace(old, new).zfill(width), (v, old, new, width)


#: strings biased toward PII-shaped fragments so matches actually occur
_pii_texts = st.lists(
    st.sampled_from(
        ["a@b.io", "x", "10.0.3.7", "555-0042", "@", ".", "-", "1.2", "a.b@c",
         "user_1@ex.co", "999", "1.2.3.4.5", " ", "foo@bar", "12-3456"]
    ),
    min_size=0,
    max_size=8,
).map(" ".join)


@given(vals=st.lists(_pii_texts, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_pii_redaction_matches_python_re(spark, vals):
    # the portable regex subset must behave identically under Java
    # regex (Spark) and Python re — same matches, same replacement
    import re

    from easy_etl_spark.operators.textops import PII_PATTERNS, redact_pii

    def py_redact(s: str) -> str:
        for kind in ("email", "ip", "phone"):
            s = re.sub(PII_PATTERNS[kind], f"[{kind.upper()}]", s)
        return s

    df = spark.createDataFrame([(v,) for v in vals], "t string")
    got = [r.red for r in df.select(redact_pii(F.col("t")).alias("red")).collect()]
    assert got == [py_redact(v) for v in vals]


_token_texts = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=3), min_size=0, max_size=10
).map(" ".join)


@given(vals=st.lists(_token_texts, min_size=1, max_size=25), n=st.integers(2, 4))
@settings(**_SETTINGS)
def test_token_ngrams_match_python(spark, vals, n):
    from easy_etl_spark.operators.textops import token_ngrams

    def py_ngrams(s: str) -> list[str]:
        t = s.strip().split(" ")
        return [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]

    df = spark.createDataFrame([(v,) for v in vals], "t string")
    got = [r.g for r in df.select(token_ngrams(F.col("t"), n).alias("g")).collect()]
    assert got == [py_ngrams(v) for v in vals]


@given(vals=st.lists(_token_texts, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_dup_bigram_fraction_matches_python(spark, vals):
    from easy_etl_spark.operators.textops import dup_bigram_fraction

    def py_frac(s: str) -> float:
        t = s.strip().split(" ")
        bg = [" ".join(t[i : i + 2]) for i in range(len(t) - 1)]
        return 1.0 - len(set(bg)) / len(bg) if bg else 0.0

    df = spark.createDataFrame([(v,) for v in vals], "t string")
    got = [r.f for r in df.select(dup_bigram_fraction(F.col("t")).alias("f")).collect()]
    for g, v in zip(got, vals):
        assert abs(g - py_frac(v)) < 1e-12


def test_knuth_bucket_nonnegative_for_negative_ids(spark):
    from easy_etl_spark.operators.sampling import BUCKETS, knuth_bucket

    df = spark.range(-1000, 0).select(knuth_bucket(F.col("id")).alias("b"))
    row = df.agg(F.min("b").alias("lo"), F.max("b").alias("hi")).first()
    assert 0 <= row.lo and row.hi < BUCKETS


@given(
    st.text(alphabet="abc", min_size=1, max_size=8),
    st.integers(0, 8),
    st.sampled_from(["sub", "ins", "del", "eq"]),
    st.sampled_from("abc"),
)
@settings(max_examples=200, deadline=None)
def test_deletion_blocks_cover_every_single_edit(s, pos, kind, ch):
    """FastSS guarantee behind operators/fuzzy.py: any pair within edit
    distance 1 shares a block from {s} ∪ single-deletions(s). Pure
    Python mirror of fuzzy.deletion_blocks (same construction)."""

    def blocks(x: str) -> set:
        return {x} | {x[:i] + x[i + 1 :] for i in range(len(x))}

    p = min(pos, len(s) - 1)
    if kind == "sub":
        other = s[:p] + ch + s[p + 1 :]
    elif kind == "ins":
        other = s[: min(pos, len(s))] + ch + s[min(pos, len(s)) :]
    elif kind == "del":
        other = s[:p] + s[p + 1 :]
    else:
        other = s
    if other == "":
        return  # empty strings are out of scope for name matching
    assert blocks(s) & blocks(other), (s, other)


@given(st.lists(st.integers(0, 2**31), min_size=1, max_size=30, unique=True))
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_md5_uniform_matches_python_reference(spark, ids):
    """sampling.md5_uniform must equal hashlib-md5-derived integers —
    the property that makes the DuckDB oracle reproduce keep sets."""
    import hashlib

    from easy_etl_spark.operators.sampling import md5_uniform

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: r.u for r in df.select("doc_id", md5_uniform(F.col("doc_id"), 2000).alias("u")).collect()}
    for i in ids:
        want = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 2000
        assert got[i] == want, i


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1)),
        min_size=1,
        max_size=50,
        unique=True,
    )
)
def test_zorder_key_matches_python_interleave_and_is_injective(spark, pairs):
    """The Column-algebra Morton key must equal the reference Python
    bit-interleave for arbitrary 16-bit inputs, and distinct (a, b)
    pairs must map to distinct keys (injectivity is what makes the
    sort a true 2-D clustering)."""
    from easy_etl_spark.operators.dimensions import zorder_key

    def py_z(a, b):
        out = 0
        for i in range(16):
            out |= ((a >> i) & 1) << (2 * i + 1)
            out |= ((b >> i) & 1) << (2 * i)
        return out

    df = spark.createDataFrame(pairs, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()
    }
    expected = {(a, b): py_z(a, b) for a, b in pairs}
    assert got == expected
    assert len(set(got.values())) == len(pairs)  # injective


_stutter_tokens = st.lists(st.sampled_from(["a", "b", "cc", "d"]), min_size=1, max_size=12)


@given(docs=st.lists(_stutter_tokens, min_size=1, max_size=6))
@settings(**_SETTINGS)
def test_destutter_matches_groupby_and_is_idempotent(spark, docs):
    from itertools import groupby

    from easy_etl_spark.operators.textops import destutter

    frame = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in destutter(frame).collect()}
    for i, toks in enumerate(docs):
        cleaned = [k for k, _ in groupby(toks)]
        assert got[i].n_before == len(toks)
        assert got[i].n_after == len(cleaned)
        assert got[i].cleaned_text == " ".join(cleaned)
    # idempotence: cleaning the cleaned text changes nothing
    again = {
        r.doc_id: r
        for r in destutter(
            spark.createDataFrame(
                [(i, got[i].cleaned_text) for i in got], "doc_id long, text string"
            )
        ).collect()
    }
    for i in got:
        assert again[i].n_before == again[i].n_after == got[i].n_after
        assert again[i].cleaned_fp == got[i].cleaned_fp


_upsert_batches = st.lists(
    st.lists(
        st.tuples(st.sampled_from(["k1", "k2", "k3", "k4"]), st.integers(0, 99)),
        min_size=1,
        max_size=4,
        unique_by=lambda kv: kv[0],
    ),
    min_size=1,
    max_size=3,
)


@given(batches=_upsert_batches)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_upsert_sequences_match_dict_semantics(spark, tmp_path_factory, batches):
    """Any sequence of keyed upserts must behave like dict.update:
    last write wins per key, every key ever written is present, and a
    matched row KEEPS its originally assigned surrogate id."""
    from easy_etl_spark.sources.sinks import ParquetSink

    root = tmp_path_factory.mktemp("upsert")
    sink = ParquetSink(spark, str(root / "t"))
    expected: dict[str, int] = {}
    first_ids: dict[str, int] = {}
    for batch in batches:
        df = spark.createDataFrame([(k, v) for k, v in batch], "k string, v long")
        sink.upsert(df, keys=["k"])
        expected.update(dict(batch))
        for r in sink.read().collect():
            first_ids.setdefault(r["k"], r["id"])
    rows = sink.read().collect()
    assert {r["k"]: r["v"] for r in rows} == expected
    # id stability: the id a key got on first insert never changes
    assert {r["k"]: r["id"] for r in rows} == {k: first_ids[k] for k in expected}
    # ids are unique
    assert len({r["id"] for r in rows}) == len(rows)


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        min_size=1,
        max_size=30,
    ),
    parts=st.integers(1, 6),
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_dec_sum_matches_python_quantized_sum_any_partitioning(spark, vals, parts):
    """functions/exact.dec_sum must equal the Python integer-unit sum
    exactly, regardless of partition count — the foundation every
    float-aggregate oracle in the catalog stands on."""
    import math

    from easy_etl_spark.functions.exact import dec_sum

    df = spark.createDataFrame([(v,) for v in vals], "v double").repartition(parts)
    got = df.agg(dec_sum("v").alias("s")).first()["s"]
    expected = sum(math.floor(v * 100 + 0.5) for v in vals) / 100.0
    assert got == expected


@given(ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=30, unique=True),
       modulus=st.sampled_from([2, 10, 100, 1009]))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_md5_uniform_matches_python_for_any_ids(spark, ids, modulus):
    """The portable md5 bucket — the key under splits, subsets, masks,
    epoch shuffles, and weighted samples — must agree with the Python
    reference for arbitrary ids and moduli."""
    import hashlib

    from easy_etl_spark.operators.sampling import md5_uniform

    df = spark.createDataFrame([(i,) for i in ids], "i long")
    got = {
        r["i"]: r["b"]
        for r in df.select("i", md5_uniform(F.col("i"), modulus).alias("b")).collect()
    }
    for i in ids:
        assert got[i] == int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % modulus
