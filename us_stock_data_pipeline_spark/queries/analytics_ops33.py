"""Round-22 analytics, part 33: Fellegi-Sunter probabilistic record
linkage and inverse-propensity-weighted treatment effects — the
statistics layer of entity resolution and causal measurement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Fellegi-Sunter record-linkage scores
# --------------------------------------------------------------------------

# Fixed m-probabilities (P(field agrees | same entity)) — the standard
# bootstrap before EM refinement. u-probabilities (P(agrees | different
# entities)) are ESTIMATED from the data as the exact birthday
# collision rate sum_v cnt_v*(cnt_v-1) / (N*(N-1)). log-weights are
# 1e-9 quantized so pair scores are exact BIGINT sums.
_FS_M = {"bal": 0.90, "key": 0.85, "seg": 0.95}

_FS_ORACLE = f"""
WITH recs AS (
  SELECT c_custkey AS k, c_nationkey AS nation, c_mktsegment AS seg,
         CAST(round(c_acctbal * 100) AS BIGINT) // 10000 AS bal_b,
         c_custkey % 97 AS key_b
  FROM customer
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM recs),
u_bal AS (
  SELECT CAST(sum(c * (c - 1)) AS BIGINT) AS coll FROM (
    SELECT CAST(count(*) AS BIGINT) AS c FROM recs GROUP BY bal_b)
),
u_key AS (
  SELECT CAST(sum(c * (c - 1)) AS BIGINT) AS coll FROM (
    SELECT CAST(count(*) AS BIGINT) AS c FROM recs GROUP BY key_b)
),
u_seg AS (
  SELECT CAST(sum(c * (c - 1)) AS BIGINT) AS coll FROM (
    SELECT CAST(count(*) AS BIGINT) AS c FROM recs GROUP BY seg)
),
wts AS (
  SELECT
    CAST(floor(ln({_FS_M["bal"]} * (n.n * (n.n-1)) / ub.coll) * 1000000000) AS BIGINT) AS w_bal_a,
    CAST(floor(ln({1 - _FS_M["bal"]} / (1.0 - CAST(ub.coll AS DOUBLE) / (n.n * (n.n-1)))) * 1000000000) AS BIGINT) AS w_bal_d,
    CAST(floor(ln({_FS_M["key"]} * (n.n * (n.n-1)) / uk.coll) * 1000000000) AS BIGINT) AS w_key_a,
    CAST(floor(ln({1 - _FS_M["key"]} / (1.0 - CAST(uk.coll AS DOUBLE) / (n.n * (n.n-1)))) * 1000000000) AS BIGINT) AS w_key_d,
    CAST(floor(ln({_FS_M["seg"]} * (n.n * (n.n-1)) / us.coll) * 1000000000) AS BIGINT) AS w_seg_a,
    CAST(floor(ln({1 - _FS_M["seg"]} / (1.0 - CAST(us.coll AS DOUBLE) / (n.n * (n.n-1)))) * 1000000000) AS BIGINT) AS w_seg_d
  FROM n, u_bal ub, u_key uk, u_seg us
),
pairs AS (
  SELECT (CASE WHEN a.bal_b = b.bal_b THEN w.w_bal_a ELSE w.w_bal_d END)
       + (CASE WHEN a.key_b = b.key_b THEN w.w_key_a ELSE w.w_key_d END)
       + (CASE WHEN a.seg = b.seg THEN w.w_seg_a ELSE w.w_seg_d END) AS score_e9
  FROM recs a JOIN recs b
    ON a.nation = b.nation AND a.seg = b.seg AND a.k < b.k
  CROSS JOIN wts w
)
SELECT CAST(floor(CAST(score_e9 AS DOUBLE) / 1000000000) AS BIGINT) AS score_bucket,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs
GROUP BY score_bucket
ORDER BY score_bucket
"""


@register("dedup_fellegi_sunter", oracle=_FS_ORACLE, tags=("dedup", "stats"))
def dedup_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage: candidate pairs
    (blocked on (nation, segment) so the quadratic term is bounded per
    block) are scored by summing per-field log-likelihood-ratio
    weights — agreement adds ln(m/u), disagreement adds
    ln((1-m)/(1-u)) — where m is the assumed same-entity agreement
    rate and u is ESTIMATED from the data as the exact birthday
    collision rate sum cnt*(cnt-1)/(N*(N-1)). This is the model under
    Splink and every census-linkage system; the EM refinement loop
    starts from exactly these weights. The weights are 1e-9-quantized
    once (a 1-row broadcast), so each pair's score is an exact BIGINT
    sum and the output histogram is engine-stable. Plan: one tiny
    aggregate per field for u, a blocked self-join whose fan-out the
    block key bounds, zero shuffles after scoring (the histogram
    reduces map-side)."""
    recs = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("seg"),
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT) div 10000").alias("bal_b"),
        (F.col("c_custkey") % 97).alias("key_b"),
    )
    n_df = recs.agg(F.count("*").cast("long").alias("n"))

    def u_coll(col: str, name: str) -> DataFrame:
        return (
            recs.groupBy(col)
            .agg(F.count("*").cast("long").alias("c"))
            .agg(F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias(name))
        )

    wts = (
        n_df.crossJoin(u_coll("bal_b", "coll_bal"))
        .crossJoin(u_coll("key_b", "coll_key"))
        .crossJoin(u_coll("seg", "coll_seg"))
    )
    wcols = []
    for f, coll in (("bal", "coll_bal"), ("key", "coll_key"), ("seg", "coll_seg")):
        m = _FS_M[f]
        wcols.append(
            F.floor(F.log(F.lit(m) * (F.col("n") * (F.col("n") - 1)) / F.col(coll))
                    * 1_000_000_000)
            .cast("long")
            .alias(f"w_{f}_a")
        )
        wcols.append(
            F.floor(
                F.log(
                    F.lit(1 - m)
                    / (F.lit(1.0) - F.col(coll).cast("double")
                       / (F.col("n") * (F.col("n") - 1)))
                )
                * 1_000_000_000
            )
            .cast("long")
            .alias(f"w_{f}_d")
        )
    wts = wts.select(*wcols)
    a, b = recs.alias("a"), recs.alias("b")
    score = (
        F.when(F.col("a.bal_b") == F.col("b.bal_b"), F.col("w_bal_a")).otherwise(
            F.col("w_bal_d")
        )
        + F.when(F.col("a.key_b") == F.col("b.key_b"), F.col("w_key_a")).otherwise(
            F.col("w_key_d")
        )
        + F.when(F.col("a.seg") == F.col("b.seg"), F.col("w_seg_a")).otherwise(
            F.col("w_seg_d")
        )
    )
    pairs = (
        a.join(
            b,
            (F.col("a.nation") == F.col("b.nation"))
            & (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.k") < F.col("b.k")),
        )
        .crossJoin(F.broadcast(wts))
        .select(score.alias("score_e9"))
    )
    return (
        pairs.groupBy(
            F.floor(F.col("score_e9").cast("double") / 1_000_000_000)
            .cast("long")
            .alias("score_bucket")
        )
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .orderBy("score_bucket")
    )


# --------------------------------------------------------------------------
# Inverse-propensity-weighted average treatment effect
# --------------------------------------------------------------------------

_IPW_ORACLE = """
WITH outcomes AS (
  SELECT c.c_custkey, c.c_mktsegment AS seg,
         c.c_custkey % 2 AS treated,
         CAST(coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0) AS BIGINT)
           AS y_cents
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2, 3
),
strata AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS n_s,
         CAST(sum(treated) AS BIGINT) AS t_s
  FROM outcomes GROUP BY seg
),
terms AS (
  SELECT o.seg, s.n_s, s.t_s,
         CASE WHEN o.treated = 1 THEN o.y_cents * s.n_s // s.t_s ELSE 0 END AS w_t,
         CASE WHEN o.treated = 0 THEN o.y_cents * s.n_s // (s.n_s - s.t_s) ELSE 0 END AS w_c
  FROM outcomes o JOIN strata s ON s.seg = o.seg
)
SELECT seg, n_s AS n_customers, t_s AS n_treated,
       CAST(sum(w_t) // n_s AS BIGINT) AS mean_treated_cents,
       CAST(sum(w_c) // n_s AS BIGINT) AS mean_control_cents,
       CAST(sum(w_t) // n_s - sum(w_c) // n_s AS BIGINT) AS ate_cents
FROM terms
GROUP BY seg, n_s, t_s
ORDER BY seg
"""


@register("causal_ipw_ate", oracle=_IPW_ORACLE, tags=("stats", "causal"))
def causal_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect — the
    workhorse causal estimator when treatment is not randomized: each
    treated outcome is up-weighted by 1/p(stratum), each control by
    1/(1-p), removing stratum-composition confounding. With the
    propensity estimated per stratum as t_s/n_s, the weighted term is
    the EXACT integer y * n_s div t_s — no float propensity ever
    materializes, so the per-stratum ATE is reduction-order-proof
    BIGINT arithmetic end to end (the house discipline for any
    estimator whose textbook form divides doubles). Treatment is a
    deterministic custkey parity (a stand-in assignment column);
    outcome is lifetime order value. Plan: one fact-side aggregate to
    customer grain, one tiny strata aggregate broadcast back, one
    final rollup — three shuffles total, all on keys that exist
    anyway at 100 TB."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    outcomes = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy(
            "c_custkey",
            F.col("c_mktsegment").alias("seg"),
            (F.col("c_custkey") % 2).alias("treated"),
        )
        .agg(
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")), F.lit(0)
            )
            .cast("long")
            .alias("y_cents")
        )
    )
    strata = outcomes.groupBy("seg").agg(
        F.count("*").cast("long").alias("n_s"),
        F.sum("treated").cast("long").alias("t_s"),
    )
    terms = outcomes.join(F.broadcast(strata), "seg").select(
        "seg",
        "n_s",
        "t_s",
        F.expr(
            "CASE WHEN treated = 1 THEN y_cents * n_s div t_s ELSE 0 END"
        ).alias("w_t"),
        F.expr(
            "CASE WHEN treated = 0 THEN y_cents * n_s div (n_s - t_s) ELSE 0 END"
        ).alias("w_c"),
    )
    return (
        terms.groupBy("seg", "n_s", "t_s")
        .agg(
            F.expr("CAST(sum(w_t) div n_s AS BIGINT)").alias("mean_treated_cents"),
            F.expr("CAST(sum(w_c) div n_s AS BIGINT)").alias("mean_control_cents"),
            F.expr(
                "CAST(sum(w_t) div n_s - sum(w_c) div n_s AS BIGINT)"
            ).alias("ate_cents"),
        )
        .select(
            "seg",
            F.col("n_s").alias("n_customers"),
            F.col("t_s").alias("n_treated"),
            "mean_treated_cents",
            "mean_control_cents",
            "ate_cents",
        )
        .orderBy("seg")
    )
