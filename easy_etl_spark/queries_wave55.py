"""Wave-55 query catalog: session path mining and behavioral
predictability.

New operator families:
  - top_event_paths       the 20 most common 3-event paths taken
                          INSIDE a session (1800 s gap rule, the
                          events_session convention) — the product-
                          analytics staple "what do users actually do
                          in order", with a deterministic
                          (ts, event_id) total order so path
                          extraction can never tie-flip
  - transition_entropy    conditional entropy H(next | prev) and
                          perplexity of the next-event Markov chain —
                          one number for "how predictable is user
                          behavior", in exact quantized-ln units over
                          the same transition counts as
                          `event_transitions`

Hash-safety: path counts are exact integers over a total event
order; entropy uses the quantized-ln convention (integer micro-nat
units summed exactly, one division + exp at the end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import register
from .session import load_table

# ----------------------------------------------------------------------
# Top 3-event session paths
# ----------------------------------------------------------------------

PATH_TOP = 20
SESSION_GAP_S = 1800


@register(
    "top_event_paths",
    f"""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w))
                     > {SESSION_GAP_S}
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_type, ts, event_id,
             sum(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS sid
      FROM seq
    ),
    tri AS (
      SELECT event_type AS e1,
             lead(event_type, 1) OVER w2 AS e2,
             lead(event_type, 2) OVER w2 AS e3,
             lead(sid, 2) OVER w2 AS sid3, sid
      FROM sess
      WINDOW w2 AS (PARTITION BY user_id, sid ORDER BY ts, event_id)
    ),
    paths AS (
      SELECT e1 || ' -> ' || e2 || ' -> ' || e3 AS path, count(*) AS n
      FROM tri WHERE e3 IS NOT NULL
      GROUP BY 1
    )
    SELECT path, n FROM paths ORDER BY n DESC, path LIMIT {PATH_TOP}
    """,
)
def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 3-event paths within sessions (1800 s inactivity gap):
    sessionize with the gap cumsum, slide a length-3 window inside
    each session (leads partitioned by (user, session), so a path can
    never straddle a session boundary), count, TakeOrdered with the
    (n DESC, path) deterministic tie-break.

    Scale: both windows partition by user (and session) — millions of
    small independent partitions; path counts collapse to ≤|types|³
    rows before the top-k cut."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s_now = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1000000.0))
    s_prev = F.floor(
        F.unix_micros(F.lag("ts").over(w).cast("timestamp")) / F.lit(1000000.0)
    )
    seq = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull() | ((s_now - s_prev) > SESSION_GAP_S), 1
        ).otherwise(0),
    )
    sess = seq.withColumn("sid", F.sum("new_sess").over(w))
    w2 = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    tri = sess.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w2).alias("e2"),
        F.lead("event_type", 2).over(w2).alias("e3"),
    ).where(F.col("e3").isNotNull())
    paths = tri.groupBy(
        F.concat_ws(" -> ", "e1", "e2", "e3").alias("path")
    ).agg(F.count(F.lit(1)).alias("n"))
    return paths.orderBy(F.col("n").desc(), "path").limit(PATH_TOP)


# ----------------------------------------------------------------------
# Conditional entropy / perplexity of the next-event chain
# ----------------------------------------------------------------------


@register(
    "transition_entropy",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM trans),
    rowt AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS nr
             FROM trans GROUP BY 1),
    units AS (
      SELECT CAST(sum(t.n * CAST(floor(ln(t.n * 1.0 / r.nr) * 1000000.0 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS u
      FROM trans t JOIN rowt r USING (prev_type)
    )
    SELECT tot.nt AS n_transitions,
           round(-(CAST(u AS DOUBLE) / 1000000.0) / tot.nt, 6)
             AS cond_entropy_nats,
           round(exp(-(CAST(u AS DOUBLE) / 1000000.0) / tot.nt), 4)
             AS perplexity
    FROM units CROSS JOIN tot
    """,
)
def transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional entropy H(next|prev) = −Σ p(prev,next)·ln p(next|prev)
    of the user event chain, and its perplexity (the effective number
    of next-event choices) — the single predictability number behind
    the `event_transitions` matrix. Quantized-ln integer units make
    the weighted sum exact; only the final normalization and exp are
    floats.

    Scale: the lag window partitions by user; everything after the
    |types|²-row transition count is dims-sized. Round 11 (guide
    §1.2, the event_transitions fix): the plan is LINEAR — row totals
    ride a window SUM over the tiny transition frame and the grand
    total folds into the same final aggregate, so the events scan →
    lag window → count pipeline appears once (the old
    rowt/tot/units branches executed it three times)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wr = Window.partitionBy("prev_type")
    units = trans.withColumn(
        "nr", F.sum("n").over(wr).cast("bigint")
    ).agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum(
            F.col("n")
            * F.floor(
                F.log(F.col("n") * 1.0 / F.col("nr")) * 1000000.0 + F.lit(0.5)
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("u"),
    )
    h = -(F.col("u").cast("double") / 1000000.0) / F.col("nt")
    return units.select(
        F.col("nt").alias("n_transitions"),
        F.round(h, 6).alias("cond_entropy_nats"),
        F.round(F.exp(h), 4).alias("perplexity"),
    )
