"""Wave-26 query catalog: model-performance drift monitoring.

New operator family:
  - weekly_auc_trend   per-week tie-aware AUC of the value-predicts-
                       purchase scorer — the production "is the model
                       degrading" dashboard series (classifier_eval
                       gives the one-shot number; monitoring needs the
                       trend, and the rank windows partition by week,
                       so the global-sort caveat disappears)

Hash-safety follows the catalog conventions (queries.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import register
from .session import load_table


@register(
    "weekly_auc_trend",
    """
    WITH scored AS (
      SELECT CAST(floor(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) / 7)
                  AS BIGINT) AS week_num,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    per_score AS (
      SELECT week_num, s, count(*) AS c, CAST(sum(y) AS BIGINT) AS pos
      FROM scored GROUP BY 1, 2
    ),
    cum AS (
      SELECT week_num, s, c, pos,
             CAST(coalesce(sum(c) OVER (PARTITION BY week_num ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS c_less
      FROM per_score
    ),
    agg AS (
      SELECT week_num,
             CAST(sum(pos) AS BIGINT) AS n_pos,
             CAST(sum(c - pos) AS BIGINT) AS n_neg,
             CAST(sum(pos * (2 * c_less + c + 1)) AS BIGINT) AS r2
      FROM cum GROUP BY week_num
    )
    SELECT week_num, n_pos, n_neg,
           round((CAST(r2 AS DOUBLE) - CAST(n_pos AS DOUBLE) * (n_pos + 1))
                 / (2.0 * n_pos * n_neg), 6) AS auc
    FROM agg WHERE n_pos > 0 AND n_neg > 0
    """,
)
def weekly_auc_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-performance monitoring: the tie-aware Mann-Whitney AUC of
    the value-predicts-purchase scorer, per WEEK — the drift series a
    production scoreboard plots (classifier_eval is the one-shot
    number). Same exact integer rank-sum machinery, but every window
    and aggregate partitions by week_num, so the score-domain ranking
    never needs a global sort.

    Scale: facts collapse to one group per (week, distinct score); the
    cumulative window and the final rollup both ride the week key."""
    e = load_table(spark, sf_dir, "events")
    week = F.floor(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")) / F.lit(7)
    ).cast("bigint")
    scored = e.select(
        week.alias("week_num"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    per_score = scored.groupBy("week_num", "s").agg(
        F.count(F.lit(1)).alias("c"), F.sum("y").alias("pos")
    )
    w = (
        Window.partitionBy("week_num")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per_score.withColumn("c_less", F.coalesce(F.sum("c").over(w), F.lit(0)))
    agg = cum.groupBy("week_num").agg(
        F.sum("pos").alias("n_pos"),
        F.sum(F.col("c") - F.col("pos")).alias("n_neg"),
        F.sum(F.col("pos") * (2 * F.col("c_less") + F.col("c") + 1)).alias("r2"),
    )
    auc = (
        F.col("r2").cast("double")
        - F.col("n_pos").cast("double") * (F.col("n_pos") + 1)
    ) / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg"))
    return agg.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0)).select(
        "week_num", "n_pos", "n_neg", F.round(auc, 6).alias("auc")
    )
