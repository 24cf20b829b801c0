"""Round-13 ML, part 5: one gradient-boosting round — a regression
stump fitted to the classification stump's residuals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.queries.ml_eval_ops import _SCORED_SQL, _scored
from us_stock_data_pipeline_spark.registry import register

# Stage 1 re-derives ml_decision_stump's split (same integer Gini
# argmin), predicts each leaf's mean label in integer milli
# (1000*pos // n, floored identically on both engines), and stage 2
# fits a REGRESSION stump to the milli residuals by exact SSE argmax:
# maximizing s_L^2/n_L + s_R^2/n_R cross-multiplies to the integer
# s_L^2 * n_R + s_R^2 * n_L.
_BOOST_ORACLE = f"""
WITH {_SCORED_SQL},
support AS (
  SELECT score_milli, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(y) AS BIGINT) AS pos
  FROM scored GROUP BY score_milli
),
tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS p FROM support
),
cum AS (
  SELECT score_milli,
         sum(cnt) OVER (ORDER BY score_milli) AS nl,
         sum(pos) OVER (ORDER BY score_milli) AS pl
  FROM support
),
s1 AS (
  SELECT c.score_milli AS thr1, c.nl, c.pl, t.n - c.nl AS nr, t.p - c.pl AS pr
  FROM cum c CROSS JOIN tot t
  WHERE c.nl < t.n
  ORDER BY (c.nl * c.nl - c.pl * c.pl - (c.nl - c.pl) * (c.nl - c.pl)) * (t.n - c.nl)
           + ((t.n - c.nl) * (t.n - c.nl) - (t.p - c.pl) * (t.p - c.pl)
              - ((t.n - c.nl) - (t.p - c.pl)) * ((t.n - c.nl) - (t.p - c.pl))) * c.nl,
           c.score_milli
  LIMIT 1
),
resid AS (
  SELECT sc.score_milli,
         sc.y * 1000
           - CASE WHEN sc.score_milli <= s1.thr1
                  THEN s1.pl * 1000 // s1.nl
                  ELSE s1.pr * 1000 // s1.nr END AS r
  FROM scored sc CROSS JOIN s1
),
rsupport AS (
  SELECT score_milli, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(r) AS BIGINT) AS rs,
         CAST(sum(r * r) AS BIGINT) AS rss
  FROM resid GROUP BY score_milli
),
rtot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n, CAST(sum(rs) AS BIGINT) AS s,
         CAST(sum(rss) AS BIGINT) AS sse0
  FROM rsupport
),
rcum AS (
  SELECT score_milli,
         sum(cnt) OVER (ORDER BY score_milli) AS nl,
         sum(rs) OVER (ORDER BY score_milli) AS sl
  FROM rsupport
),
s2 AS (
  SELECT c.score_milli AS thr2, c.nl AS nl2, c.sl AS sl2,
         t.n - c.nl AS nr2, t.s - c.sl AS sr2, t.n AS n, t.sse0 AS sse0
  FROM rcum c CROSS JOIN rtot t
  WHERE c.nl < t.n
  ORDER BY -(c.sl * c.sl * (t.n - c.nl) + (t.s - c.sl) * (t.s - c.sl) * c.nl),
           c.score_milli
  LIMIT 1
)
SELECT s1.thr1 AS threshold_stage1,
       CAST(s1.pl * 1000 // s1.nl AS BIGINT) AS leaf_left_milli,
       CAST(s1.pr * 1000 // s1.nr AS BIGINT) AS leaf_right_milli,
       s2.thr2 AS threshold_stage2,
       CAST(CASE WHEN s2.nl2 > 0 THEN s2.sl2 // s2.nl2 ELSE 0 END AS BIGINT)
         AS delta_left_milli,
       CAST(CASE WHEN s2.nr2 > 0 THEN s2.sr2 // s2.nr2 ELSE 0 END AS BIGINT)
         AS delta_right_milli,
       floor(CAST(s2.sse0 AS DOUBLE) / s2.n / 1000000 * 1000000 + 0.5) / 1000000
         AS mse_after_stage1,
       floor((CAST(s2.sse0 AS DOUBLE)
              - (CAST(s2.sl2 AS DOUBLE) * s2.sl2 / s2.nl2
                 + CAST(s2.sr2 AS DOUBLE) * s2.sr2 / s2.nr2))
             / s2.n / 1000000 * 1000000 + 0.5) / 1000000 AS mse_after_stage2
FROM s1 CROSS JOIN s2
"""


@register("ml_boosting_round", oracle=_BOOST_ORACLE, tags=("ml", "train"))
def ml_boosting_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One gradient-boosting round, fully in-engine: stage 1 is
    `ml_decision_stump`'s exact-Gini classification stump whose leaves
    predict the integer milli label mean; stage 2 fits a REGRESSION
    stump to the integer residuals by exact SSE search (maximize
    s_L^2 n_R + s_R^2 n_L — the cross-multiplied variance-reduction
    argmax, float-free like stage 1's Gini). The output is the
    two-stage model card plus the train MSE before/after stage 2 —
    the additive-model composition every GBDT library runs, here as
    two value-support window passes over mergeable aggregates.
    Stage-2 MSE uses the closed form SSE - sum s^2/n (no second data
    pass). Plan: doc-level groupBy, two support-compressed global
    windows (bounded by the feature's value support), broadcast
    singletons between stages."""
    scored = _scored(spark, sf_dir)
    support = scored.groupBy("score_milli").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("y").cast("long").alias("pos"),
    )
    tot = support.agg(
        F.sum("cnt").cast("long").alias("n"), F.sum("pos").cast("long").alias("p")
    )
    w = Window.orderBy("score_milli").rowsBetween(Window.unboundedPreceding, 0)
    cum = support.select(
        F.col("score_milli").alias("thr1"),
        F.sum("cnt").over(w).alias("nl"),
        F.sum("pos").over(w).alias("pl"),
    )
    cand = cum.crossJoin(F.broadcast(tot)).filter(F.col("nl") < F.col("n")).select(
        "thr1",
        "nl",
        "pl",
        (F.col("n") - F.col("nl")).alias("nr"),
        (F.col("p") - F.col("pl")).alias("pr"),
    )
    a_l = F.col("nl") * F.col("nl") - F.col("pl") * F.col("pl") - (
        F.col("nl") - F.col("pl")
    ) * (F.col("nl") - F.col("pl"))
    a_r = F.col("nr") * F.col("nr") - F.col("pr") * F.col("pr") - (
        F.col("nr") - F.col("pr")
    ) * (F.col("nr") - F.col("pr"))
    s1 = (
        cand.withColumn("gini_scaled", a_l * F.col("nr") + a_r * F.col("nl"))
        .orderBy("gini_scaled", "thr1")
        .limit(1)
        .select("thr1", "nl", "pl", "nr", "pr")
    )
    resid = scored.crossJoin(F.broadcast(s1)).select(
        "score_milli",
        (
            F.col("y") * 1000
            - F.when(
                F.col("score_milli") <= F.col("thr1"),
                F.expr("pl * 1000 div nl"),
            ).otherwise(F.expr("pr * 1000 div nr"))
        ).alias("r"),
    )
    rsupport = resid.groupBy("score_milli").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("r").cast("long").alias("rs"),
        F.sum(F.col("r") * F.col("r")).cast("long").alias("rss"),
    )
    rtot = rsupport.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("rs").cast("long").alias("s"),
        F.sum("rss").cast("long").alias("sse0"),
    )
    rcum = rsupport.select(
        F.col("score_milli").alias("thr2"),
        F.sum("cnt").over(w.orderBy("score_milli")).alias("nl2"),
        F.sum("rs").over(w.orderBy("score_milli")).alias("sl2"),
    )
    s2 = (
        rcum.crossJoin(F.broadcast(rtot))
        .filter(F.col("nl2") < F.col("n"))
        .withColumn("nr2", F.col("n") - F.col("nl2"))
        .withColumn("sr2", F.col("s") - F.col("sl2"))
        .withColumn(
            "sse_red_scaled",
            -(
                F.col("sl2") * F.col("sl2") * F.col("nr2")
                + F.col("sr2") * F.col("sr2") * F.col("nl2")
            ),
        )
        .orderBy("sse_red_scaled", "thr2")
        .limit(1)
    )
    return s1.crossJoin(F.broadcast(s2)).select(
        F.col("thr1").alias("threshold_stage1"),
        F.expr("CAST(pl * 1000 div nl AS BIGINT)").alias("leaf_left_milli"),
        F.expr("CAST(pr * 1000 div nr AS BIGINT)").alias("leaf_right_milli"),
        F.col("thr2").alias("threshold_stage2"),
        F.expr("CAST(CASE WHEN nl2 > 0 THEN sl2 div nl2 ELSE 0 END AS BIGINT)").alias(
            "delta_left_milli"
        ),
        F.expr("CAST(CASE WHEN nr2 > 0 THEN sr2 div nr2 ELSE 0 END AS BIGINT)").alias(
            "delta_right_milli"
        ),
        (
            F.floor(F.col("sse0").cast("double") / F.col("n") / 1000000 * 1000000 + F.lit(0.5))
            / 1000000
        ).alias("mse_after_stage1"),
        (
            F.floor(
                (
                    F.col("sse0").cast("double")
                    - (
                        F.col("sl2").cast("double") * F.col("sl2") / F.col("nl2")
                        + F.col("sr2").cast("double") * F.col("sr2") / F.col("nr2")
                    )
                )
                / F.col("n")
                / 1000000
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("mse_after_stage2"),
    )
