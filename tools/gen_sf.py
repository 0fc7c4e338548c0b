"""Generate a larger scale-factor rung by deterministic replication of
the driver's sf0.1 tables (TESTDATA.md; /root/testdata is read-only, so
the output lands in the repo's gitignored testdata_sfN/).

Scaling recipe (factor K, default 10 => sf1):

* Relational tables replicate K times with per-copy KEY OFFSETS sized
  to each table's key cardinality, so FK joins stay consistent and key
  spaces stay dense — dims scale with SF exactly like TPC-H dbgen
  (customer 150k/sf, supplier 10k/sf, part 200k/sf).
* region/nation stay fixed (TPC-H dbgen keeps them SF-invariant).
* events: K copies, event_id AND user_id offset (dense 0-based user
  space, stride = max+1), ts shifted by copy*7h. Offsetting user_id is
  what keeps the scale-up honest: copies are new USERS with the same
  per-user event density, so sessionization / funnels / interval
  self-joins (all keyed on user_id) scale linearly in K. Without it,
  copies stack onto the same 1.5k users in an overlapping time range
  — per-user density multiplies and every time-windowed self-join's
  OUTPUT grows ~K² (measured: 97x pairs for K=10), which benchmarks
  the workload's combinatorics, not the engine.
* documents: copy 0 verbatim; copy i>0 applies a per-copy PSEUDORANDOM
  ALPHABET PERMUTATION (letters and digits; case-consistent). A
  character bijection applied per document preserves every within-copy
  Jaccard EXACTLY (shingles map 1:1), while two different copies'
  shingle spaces overlap only on shingles fixed by the relative
  permutation — expected ~1 fixed letter, so cross-copy shingle
  overlap is negligible and no cross-copy pair reaches any realistic
  near-dup threshold (asserted by tests/test_gen_sf.py).
* embeddings: copy i multiplies every vector by a copy-specific
  deterministic Rademacher (+-1) sign pattern. Within a copy all inner
  products are preserved EXACTLY (both sides flip the same signs);
  across copies expected cosine is 0 with std ≈ 1/sqrt(dim) (0.125 at
  dim=64) — so unlike documents (whose shingle spaces are near-
  disjoint), cross-copy near-dup pairs DO exist at thresholds within
  a few sigma of 0: measured at sf2.5 / threshold 0.45 (3.6 sigma),
  116,508 true pairs vs 3,600 within-copy ones. Oracle checks on the
  scaled embeddings must therefore compare against a full all-pairs
  ground truth (numpy blockwise works where DuckDB times out), NOT
  against K x the base-rung result.

COMPOSITION SAFETY (round 10, VERDICT r9 item 3). Rungs are built by
composing scalings (sf0.1 -K=10-> sf1 -K=5-> sf5); through round 9 the
composed copies COLLIDED, capping dedup/ANN rungs at sf2.5:

* caesar shifts form the 26-element group Z26 — composed shifts ADD
  mod 26, so level-1 copy i + level-2 copy j collides with any (i',j')
  of equal total shift, creating cross-copy EXACT duplicates.
* the Rademacher seeds (4242+i) were REUSED at every level, so copy
  (i=1,j=2) carried sign pattern s1*s2 == copy (i=2,j=1) — exact
  duplicate embeddings across composed copies.

The fix: transforms now live in groups too large to collide (S26 has
4e26 elements; {-1,+1}^dim has 2^64 at dim 64) and every copy's seed
is sha256-derived from (src-rung basename, K, copy index), so no two
invocations in a composition chain share a seed. Composed transforms
(perm_j o perm_i, signs_j * signs_i) are then pairwise distinct with
probability 1 - O(copies^2 / |group|) — collision-free in practice,
and asserted per-invocation below plus cross-invocation by
tests/test_gen_sf.py.

Determinism: pure numpy/pyarrow with sha256-fixed seeds — same bytes
on every run. Usage:  python tools/gen_sf.py [K] [src_dir] [dst_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC_DEFAULT = "/root/testdata/sf0.1"
DST_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1")

FIXED = ("region", "nation")

_LOW = "abcdefghijklmnopqrstuvwxyz"
_DIG = "0123456789"


def copy_seed(tag: str, i: int, salt: str) -> int:
    """Globally-unique deterministic seed for copy ``i`` of a scaling
    invocation identified by ``tag`` (the src rung's basename + K).
    sha256 keeps seeds from DIFFERENT composition levels disjoint — the
    round-9 collision was seed reuse across levels."""
    h = hashlib.sha256(f"{salt}|{tag}|{i}".encode()).digest()
    return int.from_bytes(h[:8], "big")


def copy_text_translation(tag: str, i: int) -> dict[int, int] | None:
    """Per-copy alphabet permutation as a str.translate table.
    Copy 0 is verbatim (returns None)."""
    if i == 0:
        return None
    rng = np.random.default_rng(copy_seed(tag, i, "text-perm"))
    lp = "".join(np.array(list(_LOW))[rng.permutation(26)])
    dp = "".join(np.array(list(_DIG))[rng.permutation(10)])
    return str.maketrans(
        _LOW + _LOW.upper() + _DIG, lp + lp.upper() + dp
    )


def copy_sign_pattern(tag: str, i: int, dim: int) -> np.ndarray | None:
    """Per-copy Rademacher sign vector; copy 0 is the identity."""
    if i == 0:
        return None
    rng = np.random.default_rng(copy_seed(tag, i, "emb-signs"))
    return rng.choice(np.array([-1.0, 1.0], dtype=np.float32), size=dim)


def _read(src: str, name: str) -> pa.Table:
    return pq.read_table(os.path.join(src, f"{name}.parquet"))


def _offset(col: pa.ChunkedArray, delta: int) -> pa.ChunkedArray:
    return pc.add(col, pa.scalar(delta, type=col.type))


def scale(src: str, dst: str, k: int) -> None:
    tag = f"{os.path.basename(os.path.normpath(src))}|k={k}"
    os.makedirs(dst, exist_ok=True)

    # per-invocation distinctness guard: K text permutations and K sign
    # patterns must be pairwise distinct (identity included)
    perms = [copy_text_translation(tag, i) for i in range(k)]
    sigs = {repr(sorted(p.items())) if p else "id" for p in perms}
    assert len(sigs) == k, f"text permutation collision within {tag}"

    for name in FIXED:
        pq.write_table(_read(src, name), os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: copied (SF-invariant)")

    cust = _read(src, "customer")
    supp = _read(src, "supplier")
    part = _read(src, "part")
    orders = _read(src, "orders")
    line = _read(src, "lineitem")
    # strides are ROW COUNTS: every key space is dense (count ==
    # distinct == max-min+1, verified on the driver data), so count is
    # the exact non-colliding offset for both 0- and 1-based keys
    n_cust, n_supp, n_part = len(cust), len(supp), len(part)
    n_orders = len(orders)

    def repl(tbl: pa.Table, name: str, strides: dict[str, int]) -> None:
        copies = []
        for i in range(k):
            t = tbl
            if i:
                for col, stride in strides.items():
                    idx = t.schema.get_field_index(col)
                    t = t.set_column(idx, col, _offset(t[col], i * stride))
            copies.append(t)
        out = pa.concat_tables(copies)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {len(tbl)} -> {len(out)}")

    repl(cust, "customer", {"c_custkey": n_cust})
    repl(supp, "supplier", {"s_suppkey": n_supp})
    repl(part, "part", {"p_partkey": n_part})
    repl(orders, "orders", {"o_orderkey": n_orders, "o_custkey": n_cust})
    repl(
        line,
        "lineitem",
        {"l_orderkey": n_orders, "l_partkey": n_part, "l_suppkey": n_supp},
    )

    ev = _read(src, "events")
    n_ev = len(ev)
    n_users = pc.max(ev["user_id"]).as_py() + 1  # dense 0-based user space
    copies = []
    for i in range(k):
        t = ev
        if i:
            t = t.set_column(
                t.schema.get_field_index("event_id"),
                "event_id",
                _offset(t["event_id"], i * n_ev),
            )
            t = t.set_column(
                t.schema.get_field_index("user_id"),
                "user_id",
                _offset(t["user_id"], i * n_users),
            )
            shifted = pc.add(
                t["ts"].cast(pa.int64()),
                pa.scalar(i * 7 * 3600 * 1_000_000, type=pa.int64()),
            ).cast(pa.timestamp("us"))
            t = t.set_column(t.schema.get_field_index("ts"), "ts", shifted)
        copies.append(t)
    out = pa.concat_tables(copies)
    pq.write_table(out, os.path.join(dst, "events.parquet"))
    print(f"events: {len(ev)} -> {len(out)}")

    docs = _read(src, "documents")
    n_docs = len(docs)
    copies = []
    texts0 = docs["text"].to_pylist()
    for i in range(k):
        t = docs
        if i:
            t = t.set_column(
                t.schema.get_field_index("doc_id"),
                "doc_id",
                _offset(t["doc_id"], i * n_docs),
            )
            table = perms[i]
            shifted_txt = pa.chunked_array(
                [
                    pa.array(
                        [x.translate(table) if x is not None else None for x in texts0],
                        type=pa.string(),
                    )
                ]
            )
            t = t.set_column(t.schema.get_field_index("text"), "text", shifted_txt)
        copies.append(t)
    out = pa.concat_tables(copies)
    pq.write_table(out, os.path.join(dst, "documents.parquet"))
    print(f"documents: {len(docs)} -> {len(out)}")

    emb = _read(src, "embeddings")
    n_emb = len(emb)
    mat = np.asarray(emb["embedding"].combine_chunks().to_numpy(zero_copy_only=False).tolist(), dtype=np.float32)
    dim = mat.shape[1]
    labels = emb["label"]
    sign_sigs = set()
    copies = []
    for i in range(k):
        vid = emb["vec_id"] if i == 0 else _offset(emb["vec_id"], i * n_emb)
        signs = copy_sign_pattern(tag, i, dim)
        sign_sigs.add(tuple(signs) if signs is not None else "id")
        m = mat if signs is None else mat * signs  # same flip both sides => within-copy sims exact
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), type=pa.float32()), dim
        ).cast(pa.list_(pa.float32()))
        copies.append(
            pa.table({"vec_id": vid, "embedding": arr, "label": labels})
        )
    assert len(sign_sigs) == k, f"sign pattern collision within {tag}"
    out = pa.concat_tables(copies)
    pq.write_table(out, os.path.join(dst, "embeddings.parquet"))
    print(f"embeddings: {len(emb)} -> {len(out)}")


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else SRC_DEFAULT
    dst = sys.argv[3] if len(sys.argv) > 3 else DST_DEFAULT
    scale(src, dst, k)
