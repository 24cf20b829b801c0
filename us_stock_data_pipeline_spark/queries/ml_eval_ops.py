"""Round-6 ML-evaluation operators: AUC-ROC, confusion matrix with
P/R/F1, and calibration (reliability) bins — the metrics layer every
model-driven data pipeline needs next to its classifiers
(`pipeline_quality_classifier` produces scores; these grade them).

Ground truth and scores are self-contained and deterministic: the
binary label is lang == 'en', the score is each document's stopword
rate — a real (if crude) English-ness classifier computed in-query,
exact as integer milli-rates. All rank accumulation uses the 2x-scaled
integer midranks of `stats_mannwhitney_u` (AUC is the same rank-sum),
so every metric is exact until its final division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

_STOPWORDS = ("the", "of", "and", "to", "in", "is", "that", "for")
_SW_LIST_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)

# Shared CTE: per-doc integer milli-rate score + binary label.
_SCORED_SQL = f"""
tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
),
scored AS (
  SELECT doc_id, max(lang) AS lang,
         CAST(sum(CASE WHEN w IN ({_SW_LIST_SQL}) THEN 1 ELSE 0 END) * 1000
              // count(*) AS BIGINT) AS score_milli,
         CASE WHEN max(lang) = 'en' THEN 1 ELSE 0 END AS y
  FROM tok GROUP BY doc_id
)
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w"))
    return tok.groupBy("doc_id").agg(
        F.max("lang").alias("lang"),
        F.expr(
            f"CAST(sum(CASE WHEN w IN ({_SW_LIST_SQL}) THEN 1 ELSE 0 END) * 1000"
            " div count(*) AS BIGINT)"
        ).alias("score_milli"),
        F.when(F.max("lang") == "en", 1).otherwise(0).alias("y"),
    )


# --------------------------------------------------------------------------
# AUC-ROC (rank-sum / Mann-Whitney formulation, exact midranks)
# --------------------------------------------------------------------------

_AUC_ORACLE = f"""
WITH {_SCORED_SQL},
ranked AS (
  SELECT y,
         2 * rank() OVER (ORDER BY score_milli)
           + count(*) OVER (PARTITION BY score_milli) - 1 AS rank2
  FROM scored
),
sums AS (
  SELECT CAST(sum(CASE WHEN y = 1 THEN rank2 ELSE 0 END) AS BIGINT) AS r1x2,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(sum(1 - y) AS BIGINT) AS n_neg
  FROM ranked
)
SELECT n_pos, n_neg,
       floor((r1x2 - n_pos * (n_pos + 1)) / 2.0
             / (CAST(n_pos AS DOUBLE) * n_neg) * 1000000 + 0.5) / 1000000 AS auc
FROM sums
"""


@register("ml_auc_roc", oracle=_AUC_ORACLE, tags=("ml", "eval"))
def ml_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC-ROC of the stopword-rate English classifier via the
    rank-sum identity AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos*n_neg)
    — the Mann-Whitney U statistic normalized, so the whole metric
    inherits `stats_mannwhitney_u`'s exact 2x-integer midranks (ties
    get the midrank, which IS the trapezoidal tie handling of a proper
    ROC). No curve materialization, no threshold sweep: one global
    rank over per-doc scores (pre-aggregated to the score's value
    support at 100 TB, same compression as the KS test), one
    conditional sum."""
    scored = _scored(spark, sf_dir)
    rank2 = (
        F.lit(2) * F.rank().over(Window.orderBy("score_milli"))
        + F.count(F.lit(1)).over(Window.partitionBy("score_milli"))
        - 1
    )
    sums = scored.select("y", rank2.alias("rank2")).agg(
        F.sum(F.when(F.col("y") == 1, F.col("rank2")).otherwise(F.lit(0)))
        .cast("long")
        .alias("r1x2"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(F.lit(1) - F.col("y")).cast("long").alias("n_neg"),
    )
    auc = (
        (F.col("r1x2") - F.col("n_pos") * (F.col("n_pos") + 1)) / 2.0
        / (F.col("n_pos").cast("double") * F.col("n_neg"))
    )
    return sums.select(
        "n_pos",
        "n_neg",
        (F.floor(auc * 1000000 + F.lit(0.5)) / 1000000).alias("auc"),
    )


# --------------------------------------------------------------------------
# Confusion matrix + precision / recall / F1
# --------------------------------------------------------------------------

_CONF_THRESHOLD = 60  # score_milli >= 60 (~neg p90) -> predict English

_CONF_ORACLE = f"""
WITH {_SCORED_SQL},
conf AS (
  SELECT
    CAST(sum(CASE WHEN score_milli >= {_CONF_THRESHOLD} AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(sum(CASE WHEN score_milli >= {_CONF_THRESHOLD} AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(sum(CASE WHEN score_milli < {_CONF_THRESHOLD} AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
    CAST(sum(CASE WHEN score_milli < {_CONF_THRESHOLD} AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM scored
)
SELECT tp, fp, fn, tn,
       floor(CAST(tp AS DOUBLE) / (tp + fp) * 10000 + 0.5) / 10000 AS precision_,
       floor(CAST(tp AS DOUBLE) / (tp + fn) * 10000 + 0.5) / 10000 AS recall_,
       floor(2.0 * tp / (2.0 * tp + fp + fn) * 10000 + 0.5) / 10000 AS f1
FROM conf
"""


@register("ml_confusion_matrix", oracle=_CONF_ORACLE, tags=("ml", "eval"))
def ml_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded confusion matrix with precision/recall/F1 for the
    stopword-rate classifier — the operating-point companion to
    `ml_auc_roc`'s threshold-free ranking view. One single-pass
    conditional aggregate (four FILTER-style sums, map-side
    combinable — the `agg_conditional_filter` shape), ratios as final
    single divisions of exact counts. The F1 uses the 2TP identity so
    zero-division only occurs when the classifier predicts nothing
    positive AND there are no positives."""
    scored = _scored(spark, sf_dir)
    pred = F.col("score_milli") >= _CONF_THRESHOLD
    pos = F.col("y") == 1
    conf = scored.agg(
        F.sum(F.when(pred & pos, 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(pred & ~pos, 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when(~pred & pos, 1).otherwise(0)).cast("long").alias("fn"),
        F.sum(F.when(~pred & ~pos, 1).otherwise(0)).cast("long").alias("tn"),
    )
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return conf.select(
        "tp",
        "fp",
        "fn",
        "tn",
        r4(F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))).alias("precision_"),
        r4(F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))).alias("recall_"),
        r4(2.0 * F.col("tp") / (2.0 * F.col("tp") + F.col("fp") + F.col("fn"))).alias("f1"),
    )


# --------------------------------------------------------------------------
# Calibration (reliability) bins
# --------------------------------------------------------------------------

_CAL_BINS = 10
_CAL_MAX_MILLI = 160  # observed stopword rates live under 0.16


_CAL_ORACLE = f"""
WITH {_SCORED_SQL},
binned AS (
  SELECT CASE WHEN score_milli * {_CAL_BINS} // {_CAL_MAX_MILLI} > {_CAL_BINS - 1}
              THEN {_CAL_BINS - 1}
              ELSE score_milli * {_CAL_BINS} // {_CAL_MAX_MILLI} END AS bin,
         score_milli, y
  FROM scored
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       floor(CAST(sum(score_milli) AS DOUBLE) / count(*) / 1000 * 10000 + 0.5) / 10000
         AS mean_score,
       floor(CAST(sum(y) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS obs_rate
FROM binned
GROUP BY bin
ORDER BY bin
"""


@register("ml_calibration_bins", oracle=_CAL_ORACLE, tags=("ml", "eval"))
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins: bucket the classifier score into 10
    equal-width bins and compare mean predicted score against the
    observed positive rate per bin — the calibration readout that
    decides whether scores can be thresholded as probabilities or need
    Platt/isotonic recalibration first. Scores are exact integer
    milli-rates, so binning is integer division, per-bin sums are
    exact, and both reported ratios are final single divisions. One
    groupBy on a 10-value key — trivially scale-free."""
    scored = _scored(spark, sf_dir)
    raw_bin = F.expr(f"score_milli * {_CAL_BINS} div {_CAL_MAX_MILLI}")
    binned = scored.select(
        F.when(raw_bin > _CAL_BINS - 1, F.lit(_CAL_BINS - 1)).otherwise(raw_bin).alias("bin"),
        "score_milli",
        "y",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            (
                F.floor(
                    F.sum("score_milli").cast("double")
                    / F.count(F.lit(1))
                    / 1000
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("mean_score"),
            (
                F.floor(F.sum("y").cast("double") / F.count(F.lit(1)) * 10000 + F.lit(0.5))
                / 10000
            ).alias("obs_rate"),
        )
        .select(F.col("bin").cast("long").alias("bin"), "n_docs", "mean_score", "obs_rate")
        .orderBy("bin")
    )
