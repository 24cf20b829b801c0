"""Round-8 operators, part 4: IRLS logistic step, k-fold target
encoding, weight-of-evidence binning — the feature-engineering /
trainer layer of a tabular ML pipeline, each with exact-integer moment
discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.functions import detmath
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# ml: one IRLS (Newton) step of logistic regression
# --------------------------------------------------------------------------

_IRLS_ORACLE = """
WITH rows_ AS (
  SELECT l_linestatus AS grp,
         CAST(l_quantity AS BIGINT) AS x1,
         CAST(round(l_discount * 100) AS BIGINT) AS x2,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem
),
mom AS (
  SELECT grp,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x1 * x1) AS BIGINT) AS sxx,
         CAST(sum(x1 * x2) AS BIGINT) AS sxy,
         CAST(sum(x2 * x2) AS BIGINT) AS syy,
         CAST(sum(x1 * (2 * y - 1)) AS BIGINT) AS g1x2,
         CAST(sum(x2 * (2 * y - 1)) AS BIGINT) AS g2x2
  FROM rows_ GROUP BY grp
),
step AS (
  SELECT grp, n,
         CAST(sxx AS DOUBLE) AS a, CAST(sxy AS DOUBLE) AS b,
         CAST(syy AS DOUBLE) AS d,
         CAST(g1x2 AS DOUBLE) / 2.0 AS g1,
         CAST(g2x2 AS DOUBLE) / 2.0 AS g2
  FROM mom
)
SELECT grp, n,
       CAST(floor(4.0 * (d * g1 - b * g2) / (a * d - b * b) * 1e9 + 0.5) AS BIGINT) AS beta1_e9,
       CAST(floor(4.0 * (a * g2 - b * g1) / (a * d - b * b) * 1e9 + 0.5) AS BIGINT) AS beta2_e9
FROM step
WHERE a * d > b * b
ORDER BY grp
"""


@register("ml_logistic_irls_step", oracle=_IRLS_ORACLE, tags=("ml", "trainer"))
def ml_logistic_irls_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One IRLS (Newton-Raphson) step of LOGISTIC regression from the
    zero vector — the distributed-trainer primitive that
    `ml_ridge_normal_equations` is for linear models: at beta=0 every
    p_i = 1/2, so the working weights are the constant 1/4 and the
    Newton step collapses to the closed form 4*(X'X)^-1 X'(y - 1/2) —
    one Gram-matrix aggregation and a 2x2 inverse, no iteration state.
    (Full training = this step repeated with reweighted moments; every
    subsequent step is the same one-shuffle Gram shape, which is how
    Spark MLlib's LogisticRegression actually distributes.) Predicting
    returns from quantity and discount per line status: all moments
    are exact integer sums (the gradient vector X'(y-1/2) is kept
    integer by accumulating 2y-1 and halving in the double tree), the
    solve is one fixed expression. At 100 TB: one map-side-combined
    shuffle carrying 6 numbers per group."""
    li = load_table(spark, sf_dir, "lineitem")
    rows_ = li.select(
        F.col("l_linestatus").alias("grp"),
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    mom = rows_.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("sxx"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("sxy"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("syy"),
        F.sum(F.col("x1") * (2 * F.col("y") - 1)).cast("long").alias("g1x2"),
        F.sum(F.col("x2") * (2 * F.col("y") - 1)).cast("long").alias("g2x2"),
    )
    step = mom.selectExpr(
        "grp",
        "n",
        "CAST(sxx AS DOUBLE) AS a",
        "CAST(sxy AS DOUBLE) AS b",
        "CAST(syy AS DOUBLE) AS d",
        "CAST(g1x2 AS DOUBLE) / 2.0 AS g1",
        "CAST(g2x2 AS DOUBLE) / 2.0 AS g2",
    )
    return (
        step.filter("a * d > b * b")
        .selectExpr(
            "grp",
            "n",
            "CAST(floor(4.0 * (d * g1 - b * g2) / (a * d - b * b) * 1e9 + 0.5) AS BIGINT) AS beta1_e9",
            "CAST(floor(4.0 * (a * g2 - b * g1) / (a * d - b * b) * 1e9 + 0.5) AS BIGINT) AS beta2_e9",
        )
        .orderBy("grp")
    )


# --------------------------------------------------------------------------
# ml: leakage-safe k-fold target encoding
# --------------------------------------------------------------------------

_TENC_ORACLE = """
WITH rows_ AS (
  SELECT l_partkey % 50 AS cat, l_orderkey % 5 AS fold,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem
),
cat_tot AS (
  SELECT cat, CAST(count(*) AS BIGINT) AS n_cat, CAST(sum(y) AS BIGINT) AS s_cat
  FROM rows_ GROUP BY cat
),
cat_fold AS (
  SELECT cat, fold, CAST(count(*) AS BIGINT) AS n_cf, CAST(sum(y) AS BIGINT) AS s_cf
  FROM rows_ GROUP BY cat, fold
),
gtot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_g, CAST(sum(y) AS BIGINT) AS s_g FROM rows_
),
enc AS (
  SELECT r.cat, r.fold, r.y,
         CASE WHEN t.n_cat - f.n_cf > 0
              THEN (t.s_cat - f.s_cf) * 1000000 // (t.n_cat - f.n_cf)
              ELSE g.s_g * 1000000 // g.n_g END AS enc_e6,
         CASE WHEN t.n_cat - f.n_cf > 0 THEN 0 ELSE 1 END AS used_prior
  FROM rows_ r
  JOIN cat_tot t ON r.cat = t.cat
  JOIN cat_fold f ON r.cat = f.cat AND r.fold = f.fold
  CROSS JOIN gtot g
)
SELECT CAST(fold AS BIGINT) AS fold,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(enc_e6) // count(*) AS BIGINT) AS mean_enc_e6,
       CAST(sum(CASE WHEN y = 1 THEN enc_e6 ELSE 0 END)
            // greatest(sum(y), 1) AS BIGINT) AS mean_enc_pos_e6,
       CAST(sum(used_prior) AS BIGINT) AS n_prior_fallback
FROM enc
GROUP BY fold
ORDER BY fold
"""


@register("ml_target_encoding_kfold", oracle=_TENC_ORACLE, tags=("ml", "feature"))
def ml_target_encoding_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE k-fold target encoding — the highest-leverage (and
    most dangerous) categorical feature in tabular ML: each row's
    category is replaced by the target mean of that category computed
    WITHOUT the row's own fold, enc = (sum_cat - sum_fold)/(n_cat -
    n_fold), so a row never sees its own label (naive full-data target
    means leak and overfit catastrophically on rare categories).
    Categories living entirely inside one fold fall back to the global
    prior (counted in n_prior_fallback). The subtract-own-fold identity
    is what makes this SCALE: two grouped aggregates (category,
    category x fold) + one broadcast-sized join back — never a per-fold
    re-aggregation of the table, which is the naive k-pass
    implementation. The positive-row mean per fold (mean_enc_pos) is
    the separation diagnostic: encoded values on positives must sit
    above the overall mean or the feature carries nothing. All
    encodings are exact integer floor-divides."""
    li = load_table(spark, sf_dir, "lineitem")
    rows_ = li.select(
        (F.col("l_partkey") % 50).alias("cat"),
        (F.col("l_orderkey") % 5).alias("fold"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    cat_tot = rows_.groupBy("cat").agg(
        F.count(F.lit(1)).cast("long").alias("n_cat"),
        F.sum("y").cast("long").alias("s_cat"),
    )
    cat_fold = rows_.groupBy("cat", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n_cf"),
        F.sum("y").cast("long").alias("s_cf"),
    )
    g = rows_.agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("y").cast("long").alias("s_g"),
    )
    enc = (
        rows_.join(F.broadcast(cat_tot), "cat")
        .join(F.broadcast(cat_fold), ["cat", "fold"])
        .crossJoin(F.broadcast(g))
        .selectExpr(
            "fold",
            "y",
            "CASE WHEN n_cat - n_cf > 0"
            " THEN (s_cat - s_cf) * 1000000 div (n_cat - n_cf)"
            " ELSE s_g * 1000000 div n_g END AS enc_e6",
            "CASE WHEN n_cat - n_cf > 0 THEN 0 ELSE 1 END AS used_prior",
        )
    )
    return (
        enc.groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.expr("CAST(sum(enc_e6) div count(*) AS BIGINT)").alias("mean_enc_e6"),
            F.expr(
                "CAST(sum(CASE WHEN y = 1 THEN enc_e6 ELSE 0 END)"
                " div greatest(sum(y), 1) AS BIGINT)"
            ).alias("mean_enc_pos_e6"),
            F.sum("used_prior").cast("long").alias("n_prior_fallback"),
        )
        .withColumn("fold", F.col("fold").cast("long"))
        .orderBy("fold")
    )


# --------------------------------------------------------------------------
# ml: weight-of-evidence binning + information value
# --------------------------------------------------------------------------

_WOE_ORACLE = """
WITH rows_ AS (
  SELECT least(CAST(l_quantity AS BIGINT) // 10, 4) AS bin,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS bad
  FROM lineitem
),
bins AS (
  SELECT bin,
         CAST(sum(1 - bad) AS BIGINT) AS n_good,
         CAST(sum(bad) AS BIGINT) AS n_bad
  FROM rows_ GROUP BY bin
),
tot AS (
  SELECT CAST(sum(n_good) AS BIGINT) AS g_tot, CAST(sum(n_bad) AS BIGINT) AS b_tot
  FROM bins
)
SELECT CAST(b.bin AS BIGINT) AS bin, b.n_good, b.n_bad,
       CAST(floor(ln((CAST(b.n_good AS DOUBLE) / CAST(t.g_tot AS DOUBLE))
                     / (CAST(b.n_bad AS DOUBLE) / CAST(t.b_tot AS DOUBLE))) * 1e6 + 0.5)
         AS BIGINT) AS woe_e6,
       CAST(floor((CAST(b.n_good AS DOUBLE) / CAST(t.g_tot AS DOUBLE)
                   - CAST(b.n_bad AS DOUBLE) / CAST(t.b_tot AS DOUBLE))
                  * ln((CAST(b.n_good AS DOUBLE) / CAST(t.g_tot AS DOUBLE))
                       / (CAST(b.n_bad AS DOUBLE) / CAST(t.b_tot AS DOUBLE))) * 1e9 + 0.5)
         AS BIGINT) AS iv_term_e9
FROM bins b CROSS JOIN tot t
WHERE b.n_good > 0 AND b.n_bad > 0
ORDER BY bin
"""


@register("ml_woe_binning_iv", oracle=_WOE_ORACLE, tags=("ml", "feature", "stats"))
def ml_woe_binning_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence binning + information value — the credit-
    scorecard feature transform (`ml_gini_ks_scorecard` EVALUATES a
    score; WoE BUILDS the feature): quantity bins of width 10, WoE =
    ln((good%)/(bad%)) per bin, IV term = (good% - bad%)*WoE, summing
    to the feature's total predictive power (rule of thumb: IV < 0.02
    useless, > 0.5 suspicious). Counts are exact integers; each WoE/IV
    value is one shared double tree over the bin's exact counts and
    the (scalar) totals. Plan: one groupBy over 5 bins, a scalar
    cross-join for totals — entirely map-side at any scale, the
    canonical 'tiny aggregate over huge input' shape."""
    li = load_table(spark, sf_dir, "lineitem")
    rows_ = li.select(
        F.least(F.col("l_quantity").cast("long") / F.lit(10), F.lit(4))
        .cast("long")
        .alias("bin"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("bad"),
    )
    bins = rows_.groupBy("bin").agg(
        F.sum(1 - F.col("bad")).cast("long").alias("n_good"),
        F.sum("bad").cast("long").alias("n_bad"),
    )
    tot = bins.agg(
        F.sum("n_good").cast("long").alias("g_tot"),
        F.sum("n_bad").cast("long").alias("b_tot"),
    )
    return (
        bins.crossJoin(F.broadcast(tot))
        .filter("n_good > 0 AND n_bad > 0")
        .selectExpr(
            "CAST(bin AS BIGINT) AS bin",
            "n_good",
            "n_bad",
            "CAST(floor(ln((CAST(n_good AS DOUBLE) / CAST(g_tot AS DOUBLE))"
            " / (CAST(n_bad AS DOUBLE) / CAST(b_tot AS DOUBLE))) * 1e6 + 0.5)"
            " AS BIGINT) AS woe_e6",
            "CAST(floor((CAST(n_good AS DOUBLE) / CAST(g_tot AS DOUBLE)"
            " - CAST(n_bad AS DOUBLE) / CAST(b_tot AS DOUBLE))"
            " * ln((CAST(n_good AS DOUBLE) / CAST(g_tot AS DOUBLE))"
            " / (CAST(n_bad AS DOUBLE) / CAST(b_tot AS DOUBLE))) * 1e9 + 0.5)"
            " AS BIGINT) AS iv_term_e9",
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# bars: Cornish-Fisher adjusted VaR (skew/kurtosis-aware tail risk)
# --------------------------------------------------------------------------

# z = 1.645 (95%); one shared tree over exact integer return moments.
# The log return uses the libm-free det_ln kernel (ln(c) - ln(lag_c) of
# BIGINT cents): bit-identical doubles in both engines, so the 1e-8
# quantization can never straddle a boundary differently
# (transcendental audit r9).
_CF_RET_STAGES = detmath.det_ln_ratio_stages("c", "lag_c", "lr")
_CF_RET_EXPR = "CAST(floor(lr * 1e8 + 0.5) AS BIGINT)"

_CF_ORACLE = f"""
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol, {_CF_RET_EXPR} AS r
  FROM {detmath.stages_to_select(_CF_RET_STAGES,
    "(SELECT * FROM (SELECT symbol, c, lag(c) OVER (PARTITION BY symbol ORDER BY day) AS lag_c FROM closes) WHERE lag_c IS NOT NULL AND lag_c > 0 AND c > 0)")}
),
mom AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(r) AS BIGINT) AS s1,
         CAST(sum(CAST(floor((r / 1e8) * (r / 1e8) * 1e13 + 0.5) AS BIGINT)) AS BIGINT) AS s2,
         CAST(sum(CAST(floor((r / 1e8) * (r / 1e8) * (r / 1e8) * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS s3,
         CAST(sum(CAST(floor((r / 1e8) * (r / 1e8) * (r / 1e8) * (r / 1e8) * 1e11 + 0.5) AS BIGINT)) AS BIGINT) AS s4
  FROM rets GROUP BY symbol
),
std AS (
  SELECT symbol, n,
         CAST(s1 AS DOUBLE) / 1e8 / CAST(n AS DOUBLE) AS mu,
         sqrt(greatest(CAST(s2 AS DOUBLE) / 1e13 / CAST(n AS DOUBLE)
              - (CAST(s1 AS DOUBLE) / 1e8 / CAST(n AS DOUBLE))
                * (CAST(s1 AS DOUBLE) / 1e8 / CAST(n AS DOUBLE)), 1e-18)) AS sd,
         CAST(s3 AS DOUBLE) / 1e12 / CAST(n AS DOUBLE) AS m3_raw,
         CAST(s4 AS DOUBLE) / 1e11 / CAST(n AS DOUBLE) AS m4_raw
  FROM mom WHERE n > 3
),
sk AS (
  SELECT symbol, n, mu, sd,
         (m3_raw - 3.0 * mu * sd * sd - mu * mu * mu) / (sd * sd * sd) AS skew,
         (m4_raw - 4.0 * mu * m3_raw + 6.0 * mu * mu * (sd * sd + mu * mu)
          - 3.0 * mu * mu * mu * mu) / (sd * sd * sd * sd) - 3.0 AS exkurt
  FROM std WHERE sd > 0
)
SELECT symbol, n AS n_days,
       CAST(floor(sd * 1e8 + 0.5) AS BIGINT) AS sd_e8,
       CAST(floor(skew * 1e6 + 0.5) AS BIGINT) AS skew_e6,
       CAST(floor(exkurt * 1e6 + 0.5) AS BIGINT) AS exkurt_e6,
       CAST(floor((mu - (1.645 + (1.645 * 1.645 - 1.0) * skew / 6.0
                         + (1.645 * 1.645 * 1.645 - 3.0 * 1.645) * exkurt / 24.0
                         - (2.0 * 1.645 * 1.645 * 1.645 - 5.0 * 1.645) * skew * skew / 36.0)
                        * sd) * 1e8 + 0.5) AS BIGINT) AS var95_cf_e8,
       CAST(floor((mu - 1.645 * sd) * 1e8 + 0.5) AS BIGINT) AS var95_normal_e8
FROM sk
ORDER BY symbol
"""


@register("bars_cornish_fisher_var", oracle=_CF_ORACLE, tags=("bars", "finance", "stats"))
def bars_cornish_fisher_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cornish-Fisher adjusted Value-at-Risk — the tail-risk estimate
    that respects the return distribution's ACTUAL shape where
    `bars_var_expected_shortfall` (historical) needs a long window and
    `bars_riskmetrics_ewma_var` assumes normality: expand the 95%
    normal quantile with the skewness/excess-kurtosis correction
    z_cf = z + (z^2-1)S/6 + (z^3-3z)K/24 - (2z^3-5z)S^2/36, reported
    against the plain-normal VaR so the shape premium is visible.
    Float discipline: log returns quantize to 1e-8 per row, each raw
    power (r^2, r^3, r^4) quantizes per row to an integer at a scale
    (1e13/1e12/1e11) sized so the largest fixture |ln return| (~8.4)
    keeps the per-row value and a few-thousand-row sum inside int64, and the central-moment algebra + CF expansion is one
    shared tree. Plan: daily rollup, lag window, one moment aggregate
    per symbol — the Gram shape again."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w = W.partitionBy("symbol").orderBy("day")
    rets = detmath.apply_stages(
        closes.withColumn("lag_c", F.lag("c").over(w)).filter(
            "lag_c IS NOT NULL AND lag_c > 0 AND c > 0"
        ),
        _CF_RET_STAGES,
    ).selectExpr("symbol", f"{_CF_RET_EXPR} AS r")
    mom = rets.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r").cast("long").alias("s1"),
        F.expr("sum(CAST(floor((r / 1e8) * (r / 1e8) * 1e13 + 0.5) AS BIGINT))")
        .cast("long")
        .alias("s2"),
        F.expr("sum(CAST(floor((r / 1e8) * (r / 1e8) * (r / 1e8) * 1e12 + 0.5) AS BIGINT))")
        .cast("long")
        .alias("s3"),
        F.expr(
            "sum(CAST(floor((r / 1e8) * (r / 1e8) * (r / 1e8) * (r / 1e8) * 1e11 + 0.5) AS BIGINT))"
        )
        .cast("long")
        .alias("s4"),
    )
    std = mom.filter("n > 3").selectExpr(
        "symbol",
        "n",
        "CAST(s1 AS DOUBLE) / 1e8 / CAST(n AS DOUBLE) AS mu",
        "sqrt(greatest(CAST(s2 AS DOUBLE) / 1e13 / CAST(n AS DOUBLE)"
        " - (CAST(s1 AS DOUBLE) / 1e8 / CAST(n AS DOUBLE))"
        "   * (CAST(s1 AS DOUBLE) / 1e8 / CAST(n AS DOUBLE)), 1e-18)) AS sd",
        "CAST(s3 AS DOUBLE) / 1e12 / CAST(n AS DOUBLE) AS m3_raw",
        "CAST(s4 AS DOUBLE) / 1e11 / CAST(n AS DOUBLE) AS m4_raw",
    )
    sk = std.filter("sd > 0").selectExpr(
        "symbol",
        "n",
        "mu",
        "sd",
        "(m3_raw - 3.0 * mu * sd * sd - mu * mu * mu) / (sd * sd * sd) AS skew",
        "(m4_raw - 4.0 * mu * m3_raw + 6.0 * mu * mu * (sd * sd + mu * mu)"
        " - 3.0 * mu * mu * mu * mu) / (sd * sd * sd * sd) - 3.0 AS exkurt",
    )
    return sk.selectExpr(
        "symbol",
        "n AS n_days",
        "CAST(floor(sd * 1e8 + 0.5) AS BIGINT) AS sd_e8",
        "CAST(floor(skew * 1e6 + 0.5) AS BIGINT) AS skew_e6",
        "CAST(floor(exkurt * 1e6 + 0.5) AS BIGINT) AS exkurt_e6",
        "CAST(floor((mu - (1.645 + (1.645 * 1.645 - 1.0) * skew / 6.0"
        " + (1.645 * 1.645 * 1.645 - 3.0 * 1.645) * exkurt / 24.0"
        " - (2.0 * 1.645 * 1.645 * 1.645 - 5.0 * 1.645) * skew * skew / 36.0)"
        " * sd) * 1e8 + 0.5) AS BIGINT) AS var95_cf_e8",
        "CAST(floor((mu - 1.645 * sd) * 1e8 + 0.5) AS BIGINT) AS var95_normal_e8",
    ).orderBy("symbol")


# --------------------------------------------------------------------------
# graph: two-hop neighborhood size (friend-of-friend reach)
# --------------------------------------------------------------------------

_TWOHOP_ORACLE = """
WITH pair_cnt AS MATERIALIZED (
  SELECT c.c_nationkey AS a, s.s_nationkey AS b, CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
  GROUP BY 1, 2
),
strong AS MATERIALIZED (
  SELECT a, b FROM (
    SELECT a, b, row_number() OVER (PARTITION BY a ORDER BY cnt DESC, b) AS rk
    FROM pair_cnt
  ) WHERE rk <= 3
),
edges AS MATERIALIZED (
  SELECT a, b FROM strong UNION SELECT b, a FROM strong
),
twohop AS (
  SELECT DISTINCT e1.a AS src, e2.b AS dst
  FROM edges e1 JOIN edges e2 ON e1.b = e2.a
  WHERE e2.b <> e1.a
),
reach AS (
  SELECT t.src, t.dst
  FROM twohop t
  LEFT JOIN edges d ON t.src = d.a AND t.dst = d.b
  WHERE d.a IS NULL
),
deg AS (SELECT a AS src, CAST(count(*) AS BIGINT) AS degree FROM edges GROUP BY a)
SELECT n.n_name AS nation,
       d.degree,
       CAST(coalesce(r.n2, 0) AS BIGINT) AS two_hop_only
FROM deg d
LEFT JOIN (SELECT src, CAST(count(*) AS BIGINT) AS n2 FROM reach GROUP BY src) r
  ON d.src = r.src
JOIN nation n ON d.src = n.n_nationkey
ORDER BY nation
"""


@register("graph_two_hop_neighborhood", oracle=_TWOHOP_ORACLE, tags=("graph",))
def graph_two_hop_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop (friend-of-friend) neighborhood size on the STRONG-trade
    nation graph — the reach primitive behind contact expansion and
    recommendation candidate pools that no existing graph op computes
    (BFS gives seed reachability, Adamic-Adar scores given pairs; this
    counts DISTINCT 2-hop-ONLY neighbors per node, direct neighbors and
    self excluded). The raw trade graph is near-complete (every nation
    trades with every nation somewhere in TPC-H), so the graph is first
    SPARSIFIED to each nation's top-3 partners by line count
    (deterministic tiebreak on partner key) — both the realistic
    formulation ("strong ties") and what makes the 2-hop set
    non-degenerate. Plan: one fact-join groupBy for pair counts, a
    top-k window, one mid-vertex self-join + anti-join against direct
    edges. Per-node cost is bounded by the top-k cap — the same hub
    discipline the dedup blocks use; on a power-law graph the cap IS
    the scale guarantee. All exact integer counts."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    from pyspark.sql import Window as W

    pair_cnt = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("a"), F.col("s_nationkey").alias("b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    rk = W.partitionBy("a").orderBy(F.desc("cnt"), "b")
    strong = (
        pair_cnt.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= 3)
        .select("a", "b")
    )
    edges = (
        strong.union(strong.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .transform(registry.track_persist)
    )
    e1 = edges.select(F.col("a").alias("src"), F.col("b").alias("mid"))
    e2 = edges.select(F.col("a").alias("mid"), F.col("b").alias("dst"))
    twohop = (
        e1.join(e2, "mid")
        .filter(F.col("dst") != F.col("src"))
        .select("src", "dst")
        .distinct()
    )
    direct = edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    reach = twohop.join(direct, ["src", "dst"], "left_anti")
    n2 = reach.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("two_hop_only"))
    deg = edges.groupBy(F.col("a").alias("src")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    return (
        deg.join(n2, "src", "left")
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("src"), F.col("n_name").alias("nation"))),
            "src",
        )
        .select(
            "nation",
            "degree",
            F.coalesce(F.col("two_hop_only"), F.lit(0)).cast("long").alias("two_hop_only"),
        )
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# dedup: C4-style exact line-level dedup across the corpus
# --------------------------------------------------------------------------

_LINE_W = 8

_LINE_DEDUP_ORACLE = f"""
WITH w AS (
  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
),
lines_ AS (
  SELECT doc_id, source, i.g AS pos,
         md5(array_to_string(list_slice(ws, i.g * {_LINE_W} + 1, i.g * {_LINE_W} + {_LINE_W}), ' ')) AS h
  FROM w, LATERAL (SELECT unnest(range(0, len(ws) // {_LINE_W})) AS g) i
),
ranked AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rk
  FROM lines_
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(count(DISTINCT h) AS BIGINT) AS n_unique,
       CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
         AS removed_ppm
FROM ranked
GROUP BY source
ORDER BY source
"""


@register("dedup_exact_lines", oracle=_LINE_DEDUP_ORACLE, tags=("llm", "dedup", "text"))
def dedup_exact_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style EXACT LINE-level deduplication — the other axis of
    exact dedup (`dedup_exact` drops whole documents;
    `dedup_exact_substring` finds shared character spans; C4/Dolma's
    most impactful rule removes REPEATED LINES across the whole corpus
    — boilerplate headers, navigation text, license blocks). Lines here
    are the fixture's analogue: non-overlapping {W}-token chunks. Each
    line keeps only its FIRST occurrence in deterministic corpus order
    (doc_id, position) — the canonical-survivor rule — and every later
    copy is counted removed, reported per source as a ppm rate (exact
    integer floor-div). Plan: one split per doc, one chunk explode, one
    shuffle on the 128-bit line hash (the text itself never shuffles —
    md5 map-side), one window rank, one rollup. Linear end to end; the
    hash shuffle is the same shape as dedup_exact at any corpus
    size.""".replace("{W}", str(_LINE_W))
    from pyspark.sql import Window as W

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", F.split("text", " ").alias("ws"))
        # docs shorter than one chunk: size(ws) div W - 1 = -1 and
        # sequence(0, -1) is DESCENDING [0, -1] in Spark, emitting two
        # spurious hashes where the oracle's range() emits none
        # (advisor r8 medium). Guard exactly as text_mattr does.
        .filter(F.size("ws") >= _LINE_W)
    )
    lines_ = docs.select(
        "doc_id",
        "source",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(ws) div {_LINE_W} - 1),"
                f" i -> md5(array_join(slice(ws, i * {_LINE_W} + 1, {_LINE_W}), ' ')))"
            )
        ).alias("pos", "h"),
    )
    rk = W.partitionBy("h").orderBy("doc_id", "pos")
    ranked = lines_.withColumn("rk", F.row_number().over(rk))
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.when(F.col("rk") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
            F.countDistinct("h").cast("long").alias("n_unique"),
            F.expr(
                "CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) * 1000000"
                " div count(*) AS BIGINT)"
            ).alias("removed_ppm"),
        )
        .orderBy("source")
    )
