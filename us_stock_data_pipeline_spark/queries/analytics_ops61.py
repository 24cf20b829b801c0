"""Round-62 analytics, part 61: power-law tail MLE and the DeLong
AUC confidence interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Power-law tail exponent (continuous MLE, fixed xmin)
# --------------------------------------------------------------------------

_PL_XMIN_CENTS = 5_000

_PL_ORACLE = f"""
WITH tail AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(floor(ln(CAST(round(value * 100) AS BIGINT)
                       / {_PL_XMIN_CENTS}.0) * 1000000000 + 0.5) AS BIGINT)
           AS lnx_e9
  FROM events
  WHERE CAST(round(value * 100) AS BIGINT) >= {_PL_XMIN_CENTS}
),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(lnx_e9) AS HUGEINT) AS slnx_e9,
         CAST(sum(cents) AS HUGEINT) AS scents
  FROM tail
)
SELECT n AS n_tail, CAST({_PL_XMIN_CENTS} AS BIGINT) AS xmin_cents,
       CAST(floor((1.0 + CAST(n AS DOUBLE) * 1000000000 / CAST(slnx_e9 AS DOUBLE))
                  * 1000000 + 0.5) AS BIGINT) AS alpha_e6,
       CAST(scents // n - {_PL_XMIN_CENTS} AS BIGINT) AS mean_excess_cents
FROM sums
WHERE slnx_e9 > 0
"""


@register("stats_power_law_mle", oracle=_PL_ORACLE, tags=("stats",))
def stats_power_law_mle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous power-law tail exponent by the Clauset-Shalizi-
    Newman MLE, alpha = 1 + n / sum(ln(x/xmin)) over values >= xmin —
    the heavy-tail diagnostic behind `events_pareto_gini` (Gini says
    HOW concentrated; alpha says WHICH distribution family, and
    alpha <= 2 means the mean itself is unstable — a red flag for any
    average-based KPI on this column). Determinism: each row's
    ln(x/xmin) quantizes to integer e9 BEFORE the distributed sum
    (the established per-term discipline), so alpha is one double
    expression from two exact integers; the mean excess is an
    integer floor-divide on positive values. Plan: one filtered scan
    + one map-side-combined aggregate — nothing keyed, nothing
    shuffled but the 1-row reduce."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    tail = ev.select(cents.alias("cents")).filter(F.col("cents") >= _PL_XMIN_CENTS)
    lnx_e9 = F.floor(
        F.log(F.col("cents") / F.lit(float(_PL_XMIN_CENTS))) * 1_000_000_000 + F.lit(0.5)
    ).cast("long")
    sums = tail.select("cents", lnx_e9.alias("lnx_e9")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("lnx_e9").cast("decimal(38,0)").alias("slnx_e9"),
        F.sum("cents").cast("decimal(38,0)").alias("scents"),
    )
    alpha = 1.0 + F.col("n").cast("double") * 1_000_000_000 / F.col("slnx_e9").cast("double")
    return sums.filter(F.col("slnx_e9") > 0).select(
        F.col("n").alias("n_tail"),
        F.lit(_PL_XMIN_CENTS).cast("long").alias("xmin_cents"),
        F.floor(alpha * 1_000_000 + F.lit(0.5)).cast("long").alias("alpha_e6"),
        (F.floor(F.col("scents") / F.col("n")) - _PL_XMIN_CENTS)
        .cast("long")
        .alias("mean_excess_cents"),
    )


# --------------------------------------------------------------------------
# DeLong variance + 95% CI for AUC-ROC
# --------------------------------------------------------------------------

_STOPWORDS = ("the", "of", "and", "to", "in", "is", "that", "for")
_SW_LIST_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)
_Z975 = 1.959964  # Phi^-1(0.975), fixed constant on both sides

_DELONG_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
),
scored AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN w IN ({_SW_LIST_SQL}) THEN 1 ELSE 0 END) * 1000
              // count(*) AS BIGINT) AS s,
         CASE WHEN max(lang) = 'en' THEN 1 ELSE 0 END AS y
  FROM tok GROUP BY doc_id
),
per_s AS (
  SELECT s, CAST(sum(y) AS BIGINT) AS pos_at, CAST(sum(1 - y) AS BIGINT) AS neg_at
  FROM scored GROUP BY s
),
cum AS (
  SELECT s, pos_at, neg_at,
         CAST(coalesce(sum(neg_at) OVER (ORDER BY s
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS neg_below,
         CAST(coalesce(sum(pos_at) OVER (ORDER BY s
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS pos_below
  FROM per_s
),
tot AS (
  SELECT CAST(sum(pos_at) AS BIGINT) AS n_pos, CAST(sum(neg_at) AS BIGINT) AS n_neg
  FROM per_s
),
-- v10 numerator per positive at s: 2*neg_below + neg_at (den 2*n_neg)
-- v01 numerator per negative at s: 2*pos_above + pos_at (den 2*n_pos)
moments AS (
  SELECT CAST(sum(pos_at * (2 * neg_below + neg_at)) AS HUGEINT) AS s10,
         CAST(sum(pos_at * (2 * neg_below + neg_at) * (2 * neg_below + neg_at))
           AS HUGEINT) AS s10_2,
         CAST(sum(neg_at * (2 * (t.n_pos - pos_below - pos_at) + pos_at))
           AS HUGEINT) AS s01,
         CAST(sum(neg_at * (2 * (t.n_pos - pos_below - pos_at) + pos_at)
                         * (2 * (t.n_pos - pos_below - pos_at) + pos_at))
           AS HUGEINT) AS s01_2
  FROM cum CROSS JOIN tot t
),
fit AS (
  SELECT t.n_pos, t.n_neg,
         CAST(m.s10 AS DOUBLE) / (2.0 * t.n_neg) / t.n_pos AS auc,
         -- sample variances of the placement values (den 2*n_neg / 2*n_pos)
         (CAST(m.s10_2 AS DOUBLE) - CAST(m.s10 AS DOUBLE) * m.s10 / t.n_pos)
           / (t.n_pos - 1) / (2.0 * t.n_neg) / (2.0 * t.n_neg) AS var10,
         (CAST(m.s01_2 AS DOUBLE) - CAST(m.s01 AS DOUBLE) * m.s01 / t.n_neg)
           / (t.n_neg - 1) / (2.0 * t.n_pos) / (2.0 * t.n_pos) AS var01
  FROM moments m CROSS JOIN tot t
)
SELECT n_pos, n_neg,
       CAST(floor(auc * 1000000 + 0.5) AS BIGINT) AS auc_e6,
       CAST(floor(sqrt(var10 / n_pos + var01 / n_neg) * 1000000 + 0.5) AS BIGINT)
         AS se_e6,
       CAST(floor((auc - {_Z975} * sqrt(var10 / n_pos + var01 / n_neg))
                  * 1000000 + 0.5) AS BIGINT) AS ci_lo_e6,
       CAST(floor((auc + {_Z975} * sqrt(var10 / n_pos + var01 / n_neg))
                  * 1000000 + 0.5) AS BIGINT) AS ci_hi_e6
FROM fit
"""


@register("ml_auc_delong_ci", oracle=_DELONG_ORACLE, tags=("ml", "stats"))
def ml_auc_delong_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeLong variance and 95% CI for the AUC of the stopword-rate
    classifier — the inference layer `ml_auc_roc` lacks: a point AUC
    of 0.8 means nothing without its standard error when comparing
    model candidates. DeLong's estimator is the variance of the
    per-positive and per-negative PLACEMENT values; every placement
    numerator here is an exact integer (2*neg_below + neg_at over
    denominator 2*n_neg, midrank tie handling), so both variance
    moments are exact integer sums and the CI is one fixed double
    expression. Plan: score aggregate, one cumulative window over
    the ~1000 distinct scores, two broadcast-sized moment
    aggregates — the per-doc data is touched once."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w"))
    scored = tok.groupBy("doc_id").agg(
        F.expr(
            f"CAST(sum(CASE WHEN w IN ({_SW_LIST_SQL}) THEN 1 ELSE 0 END) * 1000"
            " div count(*) AS BIGINT)"
        ).alias("s"),
        F.when(F.max("lang") == "en", 1).otherwise(0).alias("y"),
    )
    per_s = scored.groupBy("s").agg(
        F.sum("y").cast("long").alias("pos_at"),
        F.sum(1 - F.col("y")).cast("long").alias("neg_at"),
    )
    w_prev = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    cum = per_s.select(
        "s",
        "pos_at",
        "neg_at",
        F.coalesce(F.sum("neg_at").over(w_prev), F.lit(0)).cast("long").alias("neg_below"),
        F.coalesce(F.sum("pos_at").over(w_prev), F.lit(0)).cast("long").alias("pos_below"),
    )
    tot = per_s.agg(
        F.sum("pos_at").cast("long").alias("n_pos"),
        F.sum("neg_at").cast("long").alias("n_neg"),
    )
    dec = "decimal(38,0)"
    v10 = 2 * F.col("neg_below") + F.col("neg_at")
    pos_above = F.col("n_pos") - F.col("pos_below") - F.col("pos_at")
    v01 = 2 * pos_above + F.col("pos_at")
    moments = cum.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.col("pos_at") * v10).cast(dec).alias("s10"),
        F.sum(F.col("pos_at") * v10 * v10).cast(dec).alias("s10_2"),
        F.sum(F.col("neg_at") * v01).cast(dec).alias("s01"),
        F.sum(F.col("neg_at") * v01 * v01).cast(dec).alias("s01_2"),
        F.first(F.col("n_pos")).alias("n_pos"),
        F.first(F.col("n_neg")).alias("n_neg"),
    )
    auc = F.col("s10").cast("double") / (2.0 * F.col("n_neg")) / F.col("n_pos")
    var10 = (
        (F.col("s10_2").cast("double") - F.col("s10").cast("double") * F.col("s10") / F.col("n_pos"))
        / (F.col("n_pos") - 1)
        / (2.0 * F.col("n_neg"))
        / (2.0 * F.col("n_neg"))
    )
    var01 = (
        (F.col("s01_2").cast("double") - F.col("s01").cast("double") * F.col("s01") / F.col("n_neg"))
        / (F.col("n_neg") - 1)
        / (2.0 * F.col("n_pos"))
        / (2.0 * F.col("n_pos"))
    )
    se = F.sqrt(var10 / F.col("n_pos") + var01 / F.col("n_neg"))
    return moments.select(
        "n_pos",
        "n_neg",
        F.floor(auc * 1_000_000 + F.lit(0.5)).cast("long").alias("auc_e6"),
        F.floor(se * 1_000_000 + F.lit(0.5)).cast("long").alias("se_e6"),
        F.floor((auc - _Z975 * se) * 1_000_000 + F.lit(0.5)).cast("long").alias("ci_lo_e6"),
        F.floor((auc + _Z975 * se) * 1_000_000 + F.lit(0.5)).cast("long").alias("ci_hi_e6"),
    )
