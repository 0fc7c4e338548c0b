"""Wave-38 query catalog: data placement, storage layout, and
content-quality profiling — the "storage engine advisor" family a
100 TB lakehouse runs over its own files.

New operator families:
  - shard_rendezvous      rendezvous / highest-random-weight hashing
                          (Thaler & Ravishankar 1998): deterministic
                          doc->shard placement where adding a shard
                          relocates ONLY the stolen ~1/(S+1) fraction
                          (n_moved_elsewhere is provably 0)
  - zonemap_pruning       zone-map (min/max) prunability audit per
                          column: how many of 20 equal value bands
                          each orderkey-range bucket overlaps — the
                          exact skip-rate a lakehouse scan gets from
                          file-level stats, showing clustered vs
                          uncorrelated layout
  - doc_char_entropy      per-document character Shannon entropy in
                          exact micro-nats (integer-quantized ln) —
                          the gibberish/repetition quality signal,
                          banded per language
  - encoding_advisor      columnar encoding size advisor: exact run
                          counts (row-group-local lag), NDV, and
                          plain vs dictionary vs RLE byte estimates
                          per column — the ANALYZE pass a format
                          writer uses to pick encodings

Hash-safety follows the catalog conventions (queries.py docstring):
every value that reaches the output is an exact integer or string;
ln uses the catalog-wide floor(ln(x)*1e6 + 0.5) quantization; md5
hashes use the first-32-bit convention of operators/sketches.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.scale import ensure_min_partitions
from .operators.sketches import _md5_u32
from .queries import register
from .session import load_table

# ----------------------------------------------------------------------
# rendezvous (HRW) shard assignment
# ----------------------------------------------------------------------

N_SHARDS = 16  # current shard count; the audit adds one (-> 17)

_H32 = "(('0x' || substr(md5({s}), 1, 8))::BIGINT)"


def _hrw_oracle() -> str:
    h = _H32.format(s="CAST(s.s AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)")
    return f"""
    WITH d AS (SELECT doc_id, n_chars FROM documents),
    hs AS (
      SELECT d.doc_id, d.n_chars, s.s, {h} AS h
      FROM d CROSS JOIN (SELECT unnest(generate_series(0, {N_SHARDS})) AS s) s
    ),
    s16 AS (
      SELECT doc_id, n_chars, s AS shard_now FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY h DESC, s DESC) AS rn
        FROM hs WHERE s < {N_SHARDS}
      ) WHERE rn = 1
    ),
    s17 AS (
      SELECT doc_id, s AS shard_grown FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY h DESC, s DESC) AS rn
        FROM hs
      ) WHERE rn = 1
    )
    SELECT CAST(a.shard_now AS BIGINT) AS shard,
           count(*) AS n_docs,
           CAST(sum(a.n_chars) AS BIGINT) AS total_chars,
           CAST(sum(CASE WHEN b.shard_grown <> a.shard_now
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
           CAST(sum(CASE WHEN b.shard_grown <> a.shard_now
                          AND b.shard_grown <> {N_SHARDS}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_elsewhere
    FROM s16 a JOIN s17 b USING (doc_id)
    GROUP BY 1
    """


def _hrw_shard(key: Column, n_shards: int) -> Column:
    """argmax over shards of md5(shard:key) — the HRW winner. Struct
    array_max compares (h, s) lexicographically, matching the oracle's
    ORDER BY h DESC, s DESC tie-break."""
    return F.array_max(
        F.array(
            *[
                F.struct(
                    _md5_u32(F.concat(F.lit(f"{s}:"), key.cast("string"))).alias("h"),
                    F.lit(s).alias("s"),
                )
                for s in range(n_shards)
            ]
        )
    ).getField("s")


@register("shard_rendezvous", _hrw_oracle())
def shard_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous / highest-random-weight shard placement audit
    (Thaler & Ravishankar 1998): every document goes to the shard with
    the highest md5(shard:doc_id) weight. Unlike modulo placement,
    growing the fleet from 16 to 17 shards relocates ONLY the docs the
    new shard wins (~1/17 of the corpus): `n_moved_elsewhere` — docs
    that changed shard but NOT to the new one — is structurally zero,
    because adding a candidate can never change the argmax among the
    old candidates. That invariant is published per shard so the
    oracle re-proves it on real data.

    Scale: placement is a per-row map (17 md5s, no shuffle) followed
    by one 16-row aggregation — at 100 TB this IS how you route docs
    to writer tasks/buckets with minimal movement on resize; no
    coordination state beyond the shard count."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    placed = d.select(
        "n_chars",
        _hrw_shard(F.col("doc_id"), N_SHARDS).alias("shard_now"),
        _hrw_shard(F.col("doc_id"), N_SHARDS + 1).alias("shard_grown"),
    )
    moved = F.col("shard_grown") != F.col("shard_now")
    return placed.groupBy(
        F.col("shard_now").cast("bigint").alias("shard")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(moved.cast("int")).cast("bigint").alias("n_moved"),
        F.sum(
            (moved & (F.col("shard_grown") != N_SHARDS)).cast("int")
        )
        .cast("bigint")
        .alias("n_moved_elsewhere"),
    )


# ----------------------------------------------------------------------
# zone-map prunability audit
# ----------------------------------------------------------------------

ZM_BUCKET = 1000  # orderkeys per bucket (row-group stand-in)
ZM_BANDS = 20  # predicate bands across each column's global range


def _zonemap_oracle() -> str:
    cols = {
        "l_orderkey": "l_orderkey",
        "l_partkey": "l_partkey",
        "l_shipdate_days": "(CAST(l_shipdate AS DATE) - DATE '1970-01-01')",
    }
    mm = ",\n             ".join(
        f"min({e}) AS mn_{c}, max({e}) AS mx_{c}" for c, e in cols.items()
    )
    gl = ",\n             ".join(
        f"min(mn_{c}) AS lo_{c}, max(mx_{c}) AS hi_{c}" for c in cols
    )
    w = {c: f"((g.hi_{c} - g.lo_{c}) // {ZM_BANDS} + 1)" for c in cols}
    ov = ",\n             ".join(
        f"sum((b.mx_{c} - g.lo_{c}) // {w[c]}"
        f" - (b.mn_{c} - g.lo_{c}) // {w[c]} + 1) AS ov_{c}"
        for c in cols
    )
    rows = "\n      UNION ALL\n".join(
        f"""      SELECT '{c}' AS column_name, n_buckets,
             CAST({ZM_BANDS} AS BIGINT) AS n_bands,
             CAST(ov_{c} AS BIGINT) AS n_overlaps,
             CAST(10000 - (10000 * ov_{c}) // (n_buckets * {ZM_BANDS}) AS BIGINT)
               AS prunable_bp
      FROM o"""
        for c in cols
    )
    return f"""
    WITH b AS (
      SELECT l_orderkey // {ZM_BUCKET} AS bkt,
             {mm}
      FROM lineitem GROUP BY 1
    ),
    g AS (SELECT {gl} FROM b),
    o AS (
      SELECT count(*) AS n_buckets,
             {ov}
      FROM b CROSS JOIN g
    )
{rows}
    """


@register("zonemap_pruning", _zonemap_oracle())
def zonemap_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map prunability audit: collect per-bucket (orderkey-range,
    the row-group stand-in) min/max stats for three columns, split each
    column's global range into 20 equal bands, and count exactly how
    many bands each bucket's [min, max] zone overlaps — closed form
    band(max) - band(min) + 1, no join. `prunable_bp` is the fraction
    of (bucket, band-predicate) pairs a stats-aware scan skips:
    ~9500 bp for the layout-clustered l_orderkey, ~0 for the
    uncorrelated l_shipdate — the measurement that tells you which
    predicates your file layout can serve and which need re-clustering
    (see zorder_key_lineitem for the fix).

    Scale: ONE map-side-combinable min/max aggregation with one row
    per bucket (exactly a lakehouse stats collection pass), a 1-row
    global reduce, and arithmetic — no per-row state after the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = {
        "l_orderkey": F.col("l_orderkey"),
        "l_partkey": F.col("l_partkey"),
        "l_shipdate_days": F.datediff(
            F.to_date("l_shipdate"), F.lit("1970-01-01").cast("date")
        ).cast("bigint"),
    }
    proj = li.select(
        (F.col("l_orderkey") / ZM_BUCKET).cast("bigint").alias("bkt"),
        *[e.alias(c) for c, e in cols.items()],
    )
    b = proj.groupBy("bkt").agg(
        *[
            f(c).alias(f"{p}_{c}")
            for c in cols
            for p, f in (("mn", F.min), ("mx", F.max))
        ]
    )
    g = b.agg(
        *[F.min(f"mn_{c}").alias(f"lo_{c}") for c in cols],
        *[F.max(f"mx_{c}").alias(f"hi_{c}") for c in cols],
    )
    o = b.crossJoin(F.broadcast(g)).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        *[
            F.sum(
                F.expr(
                    f"(mx_{c} - lo_{c}) DIV ((hi_{c} - lo_{c}) DIV {ZM_BANDS} + 1)"
                    f" - (mn_{c} - lo_{c}) DIV ((hi_{c} - lo_{c}) DIV {ZM_BANDS} + 1)"
                    " + 1"
                )
            ).alias(f"ov_{c}")
            for c in cols
        ],
    )
    stack = ", ".join(f"'{c}', ov_{c}" for c in cols)
    return o.select(
        F.expr(f"stack({len(cols)}, {stack})").alias("column_name", "n_overlaps"),
        "n_buckets",
    ).select(
        "column_name",
        F.col("n_buckets").cast("bigint").alias("n_buckets"),
        F.lit(ZM_BANDS).cast("bigint").alias("n_bands"),
        F.col("n_overlaps").cast("bigint").alias("n_overlaps"),
        F.expr(
            f"CAST(10000 - (10000 * n_overlaps) DIV (n_buckets * {ZM_BANDS})"
            " AS BIGINT)"
        ).alias("prunable_bp"),
    )


# ----------------------------------------------------------------------
# per-document character entropy
# ----------------------------------------------------------------------

ENT_BAND_UNATS = 250_000  # quarter-nat entropy bands


def _entropy_oracle() -> str:
    qln = "CAST(floor(ln(CAST({x} AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
    return f"""
    WITH d AS (
      SELECT doc_id, lang, text, length(text) AS n
      FROM documents WHERE length(text) >= 1
    ),
    pos AS (
      SELECT doc_id, text, unnest(generate_series(1, n)) AS i FROM d
    ),
    ch AS (
      SELECT doc_id, substr(text, CAST(i AS INTEGER), 1) AS ch FROM pos
    ),
    cc AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
    ent AS (
      SELECT cc.doc_id,
             (any_value(d.n) * {qln.format(x="any_value(d.n)")}
              - sum(cc.c * {qln.format(x="cc.c")})) // any_value(d.n)
               AS h_unats,
             any_value(d.lang) AS lang,
             any_value(d.n) AS n
      FROM cc JOIN d USING (doc_id)
      GROUP BY cc.doc_id
    )
    SELECT lang,
           CAST(h_unats // {ENT_BAND_UNATS} AS BIGINT) AS entropy_band,
           count(*) AS n_docs,
           CAST(sum(n) AS BIGINT) AS total_chars
    FROM ent GROUP BY 1, 2
    """


@register("doc_char_entropy", _entropy_oracle())
def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character Shannon entropy in exact micro-nats:
    H = ln(n) - (1/n) sum c_i ln c_i, computed as the integer
    (n*qln(n) - sum c_i*qln(c_i)) DIV n over exact character counts
    with the catalog's floor(ln*1e6+0.5) quantization — the classic
    cheap quality signal (low entropy = stutter/boilerplate, the top
    band = hash-like gibberish), banded per language in quarter-nats.
    Complements text_repetition (n-gram repeats) and unigram_logprob
    (corpus-level LM) with a corpus-free per-doc signal.

    Scale: explode to (doc, char) then two keyed aggregations — the
    shuffle carries one row per distinct (doc, char), bounded by
    alphabet size per doc, far below text bytes; the input is fanned
    out across cores before the explode (scan partitioning sizes by
    pre-explode bytes). Round 11 (guide §4.2-adjacent CPU shape): the
    chars come from ONE split(text, '') per doc — the previous
    sequence-explode called substring(text, i, 1) per position, an
    O(n) codepoint walk per call ⇒ O(n²) per doc. split('') splits on
    codepoints (non-BMP chars stay whole, verified), exactly matching
    length(text) counting."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text", F.length("text").alias("n"))
        .filter(F.col("n") >= 1)
    )

    def qln(x: Column) -> Column:
        return F.floor(F.log(x.cast("double")) * 1000000 + F.lit(0.5)).cast("bigint")

    cc = (
        ensure_min_partitions(d)
        .select(
            "doc_id",
            "lang",
            "n",
            F.explode(F.split("text", "")).alias("ch"),
        )
        .groupBy("doc_id", "lang", "n", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    qn_sql = "CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
    ent = (
        cc.groupBy("doc_id", "lang", "n")
        .agg(F.sum(F.col("c") * qln(F.col("c"))).alias("s"))
        .select(
            "lang",
            "n",
            F.expr(f"CAST((n * {qn_sql} - s) DIV n AS BIGINT)").alias("h_unats"),
        )
    )
    return ent.groupBy(
        "lang",
        F.expr(f"CAST(h_unats DIV {ENT_BAND_UNATS} AS BIGINT)").alias("entropy_band"),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").cast("bigint").alias("total_chars"),
    )


# ----------------------------------------------------------------------
# columnar encoding advisor
# ----------------------------------------------------------------------


def _ceil_log2_sql(x: str, max_bits: int = 25) -> str:
    """Smallest b with 2^b >= x, as an exact comparison chain (float
    log2 is fragile at exact powers on either engine)."""
    cases = " ".join(
        f"WHEN {x} <= {1 << b} THEN {b}" for b in range(max_bits)
    )
    return f"(CASE {cases} ELSE {max_bits} END)"


ENC_COLS = {
    "l_returnflag": "l_returnflag",
    "l_linestatus": "l_linestatus",
    "l_shipdate": "strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')",
    "l_quantity": "CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR)",
}


def _encoding_oracle() -> str:
    lags = ",\n             ".join(
        f"v_{c},\n             "
        f"CASE WHEN lag(v_{c}) OVER w IS NULL OR v_{c} <> lag(v_{c}) OVER w"
        f" THEN 1 ELSE 0 END AS rs_{c}"
        for c in ENC_COLS
    )
    aggs = ",\n             ".join(
        f"sum(rs_{c}) AS runs_{c}, sum(strlen(v_{c})) AS pb_{c},"
        f" count(DISTINCT v_{c}) AS ndv_{c}"
        for c in ENC_COLS
    )
    dbytes = ",\n    ".join(
        f"db_{c} AS (SELECT sum(strlen(v)) AS b FROM"
        f" (SELECT DISTINCT v_{c} AS v FROM t))"
        for c in ENC_COLS
    )
    rows = []
    for c in ENC_COLS:
        bits = _ceil_log2_sql(f"a.ndv_{c}")
        rows.append(
            f"""      SELECT '{c}' AS column_name,
             CAST(a.n_values AS BIGINT) AS n_values,
             CAST(a.ndv_{c} AS BIGINT) AS ndv,
             CAST(a.runs_{c} AS BIGINT) AS n_runs,
             CAST(a.pb_{c} AS BIGINT) AS plain_bytes,
             CAST((a.n_values * {bits} + 7) // 8 + db_{c}.b AS BIGINT)
               AS dict_bytes,
             CAST((a.runs_{c} * ({bits} + 32) + 7) // 8 + db_{c}.b AS BIGINT)
               AS rle_bytes
      FROM a, db_{c}"""
        )
    union = "\n      UNION ALL\n".join(rows)
    sel = ",\n           ".join(f"{e} AS v_{c}" for c, e in ENC_COLS.items())
    return f"""
    WITH t AS (
      SELECT l_orderkey // {ZM_BUCKET} AS bkt, l_orderkey, l_linenumber,
           {sel}
      FROM lineitem
    ),
    r AS (
      SELECT bkt,
             {lags}
      FROM t
      WINDOW w AS (PARTITION BY bkt ORDER BY l_orderkey, l_linenumber,
                  v_l_returnflag, v_l_linestatus, v_l_shipdate, v_l_quantity)
    ),
    a AS (
      SELECT count(*) AS n_values,
             {aggs}
      FROM r
    ),
    {dbytes}
    SELECT u.column_name, u.n_values, u.ndv, u.n_runs, u.plain_bytes,
           u.dict_bytes, u.rle_bytes,
           CASE WHEN u.plain_bytes <= u.dict_bytes
                 AND u.plain_bytes <= u.rle_bytes THEN 'plain'
                WHEN u.dict_bytes <= u.rle_bytes THEN 'dict'
                ELSE 'rle' END AS best
    FROM (
{union}
    ) u
    """


@register("encoding_advisor", _encoding_oracle())
def encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar encoding size advisor — the ANALYZE pass a format
    writer (parquet/ORC) runs to pick per-column encodings: exact run
    counts under the physical sort order (runs are row-group-local,
    per orderkey bucket, exactly like parquet pages), exact NDV, and
    byte estimates for plain (sum of value bytes), dictionary
    (ceil_log2(ndv) bits/value + dictionary chars) and RLE
    (runs * (index_bits + 32-bit length) + dictionary chars). The
    winner lands in `best`: low-cardinality flags -> rle/dict, the
    uncorrelated date -> dict, etc.

    Scale: one bucket-keyed window pass (no global sort — runs are
    defined within row groups, matching how an actual writer encodes
    page-locally) + one map-side-combinable aggregate; the per-column
    distinct-bytes scalars are dictionary-sized, broadcast back."""
    li = load_table(spark, sf_dir, "lineitem")
    spark_exprs = {
        "l_returnflag": F.col("l_returnflag"),
        "l_linestatus": F.col("l_linestatus"),
        "l_shipdate": F.date_format(F.to_date("l_shipdate"), "yyyy-MM-dd"),
        "l_quantity": F.floor("l_quantity").cast("bigint").cast("string"),
    }
    t = li.select(
        (F.col("l_orderkey") / ZM_BUCKET).cast("bigint").alias("bkt"),
        "l_orderkey",
        "l_linenumber",
        *[e.alias(f"v_{c}") for c, e in spark_exprs.items()],
    )
    w = Window.partitionBy("bkt").orderBy(
        "l_orderkey",
        "l_linenumber",
        *[f"v_{c}" for c in ENC_COLS],
    )
    r = t.select(
        *[F.col(f"v_{c}") for c in ENC_COLS],
        *[
            (
                F.lag(f"v_{c}").over(w).isNull()
                | (F.col(f"v_{c}") != F.lag(f"v_{c}").over(w))
            )
            .cast("int")
            .alias(f"rs_{c}")
            for c in ENC_COLS
        ],
    )
    a = r.agg(
        F.count(F.lit(1)).alias("n_values"),
        *[F.sum(f"rs_{c}").alias(f"runs_{c}") for c in ENC_COLS],
        *[F.sum(F.octet_length(f"v_{c}")).alias(f"pb_{c}") for c in ENC_COLS],
    )
    # Round 11 (guide §1.2/§2.3): ndv + dictionary bytes for all four
    # columns come from ONE exploded-pairs distinct pass — the previous
    # shape paid four extra lineitem scans (one distinct+sum per
    # column) AND a 5x Expand on the window output (4-way
    # countDistinct in the main aggregate). count("v")/sum skip nulls,
    # matching countDistinct's non-null semantics.
    cols = list(ENC_COLS)
    pairs = t.select(
        F.posexplode(F.array(*[F.col(f"v_{c}") for c in cols])).alias("i", "v")
    ).distinct()
    dstats = pairs.groupBy("i").agg(
        F.count("v").alias("ndv"), F.sum(F.octet_length("v")).alias("db")
    )
    wide = dstats.agg(
        *[
            F.max(F.when(F.col("i") == idx, F.col("ndv"))).alias(f"ndv_{c}")
            for idx, c in enumerate(cols)
        ],
        *[
            F.max(F.when(F.col("i") == idx, F.col("db"))).alias(f"db_{c}")
            for idx, c in enumerate(cols)
        ],
    )
    a = a.crossJoin(F.broadcast(wide))
    rows = []
    for c in ENC_COLS:
        bits = _ceil_log2_sql(f"ndv_{c}")
        rows.append(
            a.select(
                F.lit(c).alias("column_name"),
                F.col("n_values").cast("bigint").alias("n_values"),
                F.col(f"ndv_{c}").cast("bigint").alias("ndv"),
                F.col(f"runs_{c}").cast("bigint").alias("n_runs"),
                F.col(f"pb_{c}").cast("bigint").alias("plain_bytes"),
                F.expr(
                    f"CAST((n_values * {bits} + 7) DIV 8 + db_{c} AS BIGINT)"
                ).alias("dict_bytes"),
                F.expr(
                    f"CAST((runs_{c} * ({bits} + 32) + 7) DIV 8 + db_{c}"
                    " AS BIGINT)"
                ).alias("rle_bytes"),
            )
        )
    out = rows[0]
    for x in rows[1:]:
        out = out.unionByName(x)
    return out.withColumn(
        "best",
        F.when(
            (F.col("plain_bytes") <= F.col("dict_bytes"))
            & (F.col("plain_bytes") <= F.col("rle_bytes")),
            F.lit("plain"),
        )
        .when(F.col("dict_bytes") <= F.col("rle_bytes"), F.lit("dict"))
        .otherwise(F.lit("rle")),
    )
