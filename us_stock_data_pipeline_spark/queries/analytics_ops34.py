"""Round-24 analytics, part 34: exact Shapley-value channel attribution
and split-conformal prediction intervals — both exact-arithmetic
versions of estimators usually left to float libraries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Exact Shapley channel attribution
# --------------------------------------------------------------------------

# channels (non-conversion event types) -> bit positions, alphabetical
_SHAP_CHANNELS = (("click", 1), ("error", 2), ("signup", 4), ("view", 8))
_SHAP_N = 4  # |channels|; n! = 24

# |S|! * (n-1-|S|)! for n=4: 0->6, 1->2, 2->2, 3->6
_SHAP_WEIGHT_CASE = "CASE bit_count(s) WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END"

_SHAP_ORACLE = f"""
WITH user_masks AS (
  SELECT user_id,
         CAST(coalesce(sum(DISTINCT CASE event_type
           WHEN 'click' THEN 1 WHEN 'error' THEN 2
           WHEN 'signup' THEN 4 WHEN 'view' THEN 8 END), 0) AS BIGINT) AS mask,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
mask_conv AS (
  SELECT mask, CAST(sum(converted) AS BIGINT) AS conv
  FROM user_masks GROUP BY mask
),
coalitions AS (SELECT unnest(generate_series(0, 15)) AS s),
v AS (  -- characteristic function: conversions fully explained by S
  SELECT c.s, CAST(coalesce(sum(m.conv), 0) AS BIGINT) AS v
  FROM coalitions c LEFT JOIN mask_conv m ON (m.mask & c.s) = m.mask
  GROUP BY c.s
),
marginals AS (
  SELECT ch.name,
         (CASE bit_count(vs.s) WHEN 0 THEN 6 WHEN 1 THEN 2
               WHEN 2 THEN 2 ELSE 6 END)
           * (vi.v - vs.v) AS weighted_marginal
  FROM (VALUES ('click', 1), ('error', 2), ('signup', 4), ('view', 8))
       AS ch(name, bit)
  JOIN v vs ON (vs.s & ch.bit) = 0
  JOIN v vi ON vi.s = (vs.s | ch.bit)
)
SELECT name AS channel,
       CAST(sum(weighted_marginal) AS BIGINT) AS shapley_num,
       CAST(sum(weighted_marginal) * 1000000 // 24 AS BIGINT) AS shapley_e6
FROM marginals
GROUP BY name
ORDER BY name
"""


@register("events_shapley_attribution", oracle=_SHAP_ORACLE, tags=("analytics", "stats"))
def events_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value attribution over marketing channels — the
    game-theoretic credit split (the only one satisfying efficiency/
    symmetry/dummy axioms) that last-touch and U-shape heuristics
    approximate. With 4 channels the coalition lattice is 16 nodes, so
    the exact enumeration is feasible at ANY data scale: the only
    data-sized pass is the per-user touch-mask aggregate; everything
    after operates on <= 16 coalition rows. Characteristic function
    v(S) = conversions of users whose entire touch set lies inside S
    (the "explained conversions" convention); Shapley numerators stay
    integer via the |S|!(n-1-|S|)! weights and divide by n!=24 only at
    the final 1e-6 quantization. Plan: one groupBy(user), one 16-row
    subset-sum join (the zeta transform), one 4x8 marginal join —
    broadcast everything after the first aggregate."""
    ev = load_table(spark, sf_dir, "events")
    bit_expr = (
        "CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2"
        " WHEN 'signup' THEN 4 WHEN 'view' THEN 8 END"
    )
    user_masks = ev.groupBy("user_id").agg(
        F.coalesce(F.sum_distinct(F.expr(bit_expr)), F.lit(0))
        .cast("long")
        .alias("mask"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    mask_conv = user_masks.groupBy("mask").agg(
        F.sum("converted").cast("long").alias("conv")
    )
    coalitions = spark.range(16).select(F.col("id").cast("long").alias("s"))
    v = (
        coalitions.join(
            F.broadcast(mask_conv),
            (F.col("mask").bitwiseAND(F.col("s")) == F.col("mask")),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("conv"), F.lit(0)).cast("long").alias("v"))
    )
    channels = spark.createDataFrame(
        list(_SHAP_CHANNELS), "name string, bit long"
    )
    vs = v.select(F.col("s"), F.col("v").alias("v_s"))
    vi = v.select(F.col("s").alias("si"), F.col("v").alias("v_si"))
    marginals = (
        channels.join(F.broadcast(vs), F.col("s").bitwiseAND(F.col("bit")) == 0)
        .join(
            F.broadcast(vi),
            F.col("si") == F.col("s").bitwiseOR(F.col("bit")),
        )
        .select(
            "name",
            (
                F.expr(_SHAP_WEIGHT_CASE) * (F.col("v_si") - F.col("v_s"))
            ).alias("weighted_marginal"),
        )
    )
    return (
        marginals.groupBy(F.col("name").alias("channel"))
        .agg(
            F.sum("weighted_marginal").cast("long").alias("shapley_num"),
            F.expr("CAST(sum(weighted_marginal) * 1000000 div 24 AS BIGINT)").alias(
                "shapley_e6"
            ),
        )
        .orderBy("channel")
    )


# --------------------------------------------------------------------------
# Split-conformal prediction intervals
# --------------------------------------------------------------------------

_CONF_ALPHA_NUM = 9  # coverage target 0.9 = 9/10 kept exact as a ratio
_CONF_ALPHA_DEN = 10

_CONFORMAL_ORACLE = f"""
WITH split AS (
  SELECT o_orderkey, o_orderpriority AS prio,
         CAST(round(o_totalprice * 100) AS BIGINT) AS y,
         o_orderkey % 5 AS fold
  FROM orders
),
model AS (  -- train folds 0-2: mean price per priority, exact floor
  SELECT prio, CAST(sum(y) // count(*) AS BIGINT) AS pred
  FROM split WHERE fold <= 2 GROUP BY prio
),
cal AS (
  SELECT abs(s.y - m.pred) AS resid
  FROM split s JOIN model m ON m.prio = s.prio WHERE s.fold = 3
),
q AS (  -- conformal quantile: ceil((n+1)*0.9)-th smallest residual
  SELECT resid AS qhat FROM (
    SELECT resid, row_number() OVER (ORDER BY resid, resid) AS rk,
           count(*) OVER () AS n
    FROM cal
  ) WHERE rk = ({_CONF_ALPHA_NUM} * (n + 1) + {_CONF_ALPHA_DEN - 1}) // {_CONF_ALPHA_DEN}
),
test AS (
  SELECT s.prio, abs(s.y - m.pred) <= q.qhat AS covered
  FROM split s JOIN model m ON m.prio = s.prio CROSS JOIN q
  WHERE s.fold = 4
)
SELECT prio,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(CASE WHEN covered THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
       (SELECT CAST(qhat AS BIGINT) FROM q) AS qhat_cents
FROM test
GROUP BY prio
ORDER BY prio
"""


@register("ml_conformal_prediction", oracle=_CONFORMAL_ORACLE, tags=("ml", "stats"))
def ml_conformal_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction: wrap ANY point model in intervals
    with finite-sample coverage >= 1-alpha, no distributional
    assumptions — the calibration-set residual quantile at rank
    ceil((n+1)(1-alpha)) IS the interval half-width. Model = per-
    priority mean price from the train folds (deliberately simple;
    conformal wraps anything), folds are a deterministic orderkey mod
    split, the quantile is an EXACT order statistic (rank computed in
    integer arithmetic, 9(n+1)+9 div 10 — no percentile
    interpolation to diverge between engines), and the test-fold
    coverage audit reports per-priority hit counts against the global
    qhat. Plan: one pass for the model aggregate, one sorted rank to
    extract a single calibration row (broadcast), one test-fold
    scan."""
    split = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("prio"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
        (F.col("o_orderkey") % 5).alias("fold"),
    )
    model = (
        split.filter(F.col("fold") <= 2)
        .groupBy("prio")
        .agg(F.expr("CAST(sum(y) div count(*) AS BIGINT)").alias("pred"))
    )
    cal = (
        split.filter(F.col("fold") == 3)
        .join(F.broadcast(model), "prio")
        .select(F.abs(F.col("y") - F.col("pred")).alias("resid"))
    )
    from pyspark.sql import Window

    ranked = cal.select(
        "resid",
        F.row_number().over(Window.orderBy("resid")).alias("rk"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    q = ranked.filter(
        F.col("rk")
        == F.expr(
            f"({_CONF_ALPHA_NUM} * (n + 1) + {_CONF_ALPHA_DEN - 1})"
            f" div {_CONF_ALPHA_DEN}"
        )
    ).select(F.col("resid").alias("qhat_cents"))
    test = (
        split.filter(F.col("fold") == 4)
        .join(F.broadcast(model), "prio")
        .crossJoin(F.broadcast(q))
        .select(
            "prio",
            (F.abs(F.col("y") - F.col("pred")) <= F.col("qhat_cents")).alias(
                "covered"
            ),
            "qhat_cents",
        )
    )
    return (
        test.groupBy("prio", "qhat_cents")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(F.when(F.col("covered"), 1).otherwise(0))
            .cast("long")
            .alias("n_covered"),
        )
        .select(
            "prio",
            "n_test",
            "n_covered",
            F.col("qhat_cents").cast("long").alias("qhat_cents"),
        )
        .orderBy("prio")
    )
