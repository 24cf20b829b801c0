"""Round-26b/27 analytics, part 37: 2-state HMM regime detection — the
forward algorithm as an exact integer recursion (applyInPandas kernel,
recursive-CTE oracle), plus k-fold cross-validation and a
feature-hashing collision audit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# HMM regime detection (integer forward pass)
# --------------------------------------------------------------------------

# All parameters in 1e-6 fixed point. States: 0 = bull, 1 = bear.
_HMM_A = ((800_000, 200_000), (300_000, 700_000))  # transition rows sum 1e6
_HMM_B_UP = (700_000, 400_000)  # P(up | state)
_HMM_B_DOWN = (300_000, 600_000)
_SCALE = 1_000_000

# oracle-only SQL fragment; every constant is cast to BIGINT because
# DuckDB types bare literals INT32 and the fixed-point products overflow
_HMM_STEP = f"""
      (CASE WHEN o.o = 1 THEN CAST({_HMM_B_UP[0]} AS BIGINT) ELSE CAST({_HMM_B_DOWN[0]} AS BIGINT) END
        * ((w.a1 * CAST({_HMM_A[0][0]} AS BIGINT) + ({_SCALE} - w.a1) * CAST({_HMM_A[1][0]} AS BIGINT)) // {_SCALE}))
      * {_SCALE} //
      ((CASE WHEN o.o = 1 THEN CAST({_HMM_B_UP[0]} AS BIGINT) ELSE CAST({_HMM_B_DOWN[0]} AS BIGINT) END
        * ((w.a1 * CAST({_HMM_A[0][0]} AS BIGINT) + ({_SCALE} - w.a1) * CAST({_HMM_A[1][0]} AS BIGINT)) // {_SCALE}))
       + (CASE WHEN o.o = 1 THEN CAST({_HMM_B_UP[1]} AS BIGINT) ELSE CAST({_HMM_B_DOWN[1]} AS BIGINT) END
        * ((w.a1 * CAST({_HMM_A[0][1]} AS BIGINT) + ({_SCALE} - w.a1) * CAST({_HMM_A[1][1]} AS BIGINT)) // {_SCALE})))
"""

_HMM_FIRST = _HMM_STEP.replace("w.a1", "CAST(500000 AS BIGINT)").replace("o.o", "obs.o")

_HMM_ORACLE = f"""
WITH RECURSIVE closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
obs0 AS (
  SELECT symbol, day,
         CASE WHEN close_cents > lag(close_cents) OVER w THEN 1 ELSE 0 END AS o,
         row_number() OVER w AS rn0
  FROM closes
  WINDOW w AS (PARTITION BY symbol ORDER BY day)
),
obs AS (
  SELECT symbol, day, o, rn0 - 1 AS rn FROM obs0 WHERE rn0 > 1
),
walk(symbol, rn, day, o, a1) AS (
  SELECT symbol, rn, day, o, CAST({_HMM_FIRST} AS BIGINT)
  FROM obs WHERE rn = 1
  UNION ALL
  SELECT o.symbol, o.rn, o.day, o.o, CAST({_HMM_STEP} AS BIGINT)
  FROM walk w JOIN obs o ON o.symbol = w.symbol AND o.rn = w.rn + 1
)
SELECT symbol, day, CAST(o AS BIGINT) AS obs_up, a1 AS p_bull_e6,
       CASE WHEN a1 > 500000 THEN 'bull' ELSE 'bear' END AS regime
FROM walk
ORDER BY symbol, day
"""


@register("bars_hmm_regime", oracle=_HMM_ORACLE, tags=("stock", "udf", "recursive"))
def bars_hmm_regime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-state HMM regime filter (bull/bear) — the forward algorithm
    over daily up/down observations, the canonical market-regime
    detector. Like EMA, the recursion a_t = f(a_{t-1}, obs_t) is
    inexpressible in window frames, so it runs as an applyInPandas
    kernel per symbol — but unlike EMA the ENTIRE recursion is kept
    in 1e-6 FIXED-POINT INTEGERS (predict with the transition matrix,
    weight by the emission, renormalize as w1*1e6 div (w1+w2), bear
    mass defined as the exact complement 1e6 - a1), so the Python
    kernel and the oracle's recursive CTE compute bit-identical
    BIGINTs — no float drift over 150 steps, which a double-valued
    forward pass could not guarantee across engines. Plan: one daily
    rollup, one lag for observations, one symbol-keyed shuffle into
    the kernel; per-symbol history is one Arrow batch by
    construction."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents")
    )
    w = Window.partitionBy("symbol").orderBy("day")
    obs = (
        closes.select(
            "symbol",
            "day",
            F.when(
                F.col("close_cents") > F.lag("close_cents").over(w), 1
            )
            .otherwise(0)
            .alias("o"),
            F.row_number().over(w).alias("rn0"),
        )
        .filter(F.col("rn0") > 1)
        .select("symbol", "day", "o")
    )

    a_mat, b_up, b_down, scale = _HMM_A, _HMM_B_UP, _HMM_B_DOWN, _SCALE

    def forward(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        a1 = 500_000
        out = []
        for o in pdf["o"]:
            b0 = b_up[0] if o == 1 else b_down[0]
            b1 = b_up[1] if o == 1 else b_down[1]
            pred1 = (a1 * a_mat[0][0] + (scale - a1) * a_mat[1][0]) // scale
            pred2 = (a1 * a_mat[0][1] + (scale - a1) * a_mat[1][1]) // scale
            w1, w2 = b0 * pred1, b1 * pred2
            a1 = w1 * scale // (w1 + w2)
            out.append(a1)
        pdf["p_bull_e6"] = out
        return pdf[["symbol", "day", "o", "p_bull_e6"]]

    walked = obs.groupBy("symbol").applyInPandas(
        forward, "symbol string, day date, o int, p_bull_e6 long"
    )
    return walked.select(
        "symbol",
        "day",
        F.col("o").cast("long").alias("obs_up"),
        "p_bull_e6",
        F.when(F.col("p_bull_e6") > 500_000, "bull").otherwise("bear").alias("regime"),
    ).orderBy("symbol", "day")


# --------------------------------------------------------------------------
# k-fold cross-validation of a grouped-mean model
# --------------------------------------------------------------------------

_KFOLD_K = 5

_KFOLD_ORACLE = f"""
WITH data AS (
  SELECT o_orderpriority AS prio,
         CAST(round(o_totalprice * 100) AS BIGINT) AS y,
         o_orderkey % {_KFOLD_K} AS fold
  FROM orders
),
folds AS (SELECT unnest(generate_series(0, {_KFOLD_K - 1})) AS f),
models AS (  -- per held-out fold: mean trained on the OTHER folds
  SELECT f.f, d.prio, CAST(sum(d.y) // count(*) AS BIGINT) AS pred
  FROM folds f JOIN data d ON d.fold <> f.f
  GROUP BY f.f, d.prio
),
scored AS (
  SELECT d.fold AS f, abs(d.y - m.pred) AS err
  FROM data d JOIN models m ON m.f = d.fold AND m.prio = d.prio
)
SELECT CAST(f AS BIGINT) AS fold,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(err) // count(*) AS BIGINT) AS mae_cents
FROM scored
GROUP BY f
ORDER BY f
"""


@register("ml_kfold_cv", oracle=_KFOLD_ORACLE, tags=("ml", "eval"))
def ml_kfold_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-fold cross-validation without k passes: joining the data to a
    fold table on fold <> f trains all {_KFOLD_K} leave-one-fold-out
    models in ONE aggregate (each row contributes to the k-1 models
    that exclude its fold — the same complementary-join trick as
    leave-one-out target encoding, generalized to folds), then each
    row is scored by exactly the model that never saw it. Mean
    absolute error per fold is exact integer cents. The fold spread
    is the variance estimate a single train/test split hides. Plan:
    one fan-out join (k rows per input row, k={_KFOLD_K} — bounded),
    one model aggregate, one scoring join, one rollup."""
    data = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
        (F.col("o_orderkey") % _KFOLD_K).alias("fold"),
    )
    folds = spark.range(_KFOLD_K).select(F.col("id").alias("f"))
    models = (
        data.join(F.broadcast(folds), F.col("fold") != F.col("f"))
        .groupBy("f", "prio")
        .agg(F.expr("CAST(sum(y) div count(*) AS BIGINT)").alias("pred"))
    )
    scored = data.join(
        F.broadcast(models),
        (F.col("f") == F.col("fold")) & (models.prio == data.prio),
    ).select(F.col("fold"), F.abs(F.col("y") - F.col("pred")).alias("err"))
    return (
        scored.groupBy(F.col("fold").cast("long").alias("fold"))
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.expr("CAST(sum(err) div count(*) AS BIGINT)").alias("mae_cents"),
        )
        .orderBy("fold")
    )


# --------------------------------------------------------------------------
# Feature-hashing collision audit
# --------------------------------------------------------------------------

_FH_BITS = (8, 12, 16)

_FH_ORACLE = f"""
WITH feats AS (
  SELECT DISTINCT w FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents
  )
),
ladder AS (SELECT unnest(ARRAY{list(_FH_BITS)}) AS bits),
hashed AS (
  SELECT l.bits,
         CAST(('0x' || substring(md5(f.w), 1, 12)) AS BIGINT)
           % (1 << l.bits) AS bucket
  FROM feats f JOIN ladder l ON true
),
buckets AS (
  SELECT bits, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM hashed GROUP BY bits, bucket
)
SELECT bits,
       CAST(sum(cnt) AS BIGINT) AS n_features,
       CAST(count(*) AS BIGINT) AS n_buckets_used,
       CAST(sum(cnt) - count(*) AS BIGINT) AS n_collided_features,
       CAST(max(cnt) AS BIGINT) AS worst_bucket
FROM buckets
GROUP BY bits
ORDER BY bits
"""


@register("feature_hashing_collisions", oracle=_FH_ORACLE, tags=("ml", "llm"))
def feature_hashing_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing (hashing-trick) collision audit: hash the
    vocabulary into 2^bits buckets across the ladder {_FH_BITS} and
    report how many features share a bucket — the accuracy-vs-width
    tradeoff every hashed feature pipeline must size before training
    (collisions alias gradients; the audit says how many bits buy
    collision-freedom for THIS vocabulary). The hash is the md5-prefix
    integer both engines share; collisions are exact counts. Plan:
    one distinct-vocabulary aggregate, a 3-rung ladder fan-out, one
    bucket count — all tiny after the vocab distinct."""
    docs = load_table(spark, sf_dir, "documents")
    feats = (
        docs.select(F.explode(F.split("text", " ")).alias("w")).distinct()
    )
    ladder = F.array(*[F.lit(b) for b in _FH_BITS])
    hashed = feats.select(
        "w", F.explode(ladder).alias("bits")
    ).select(
        "bits",
        (
            F.conv(F.substring(F.md5("w"), 1, 12), 16, 10).cast("long")
            % F.expr("CAST(shiftleft(1, bits) AS BIGINT)")
        ).alias("bucket"),
    )
    buckets = hashed.groupBy("bits", "bucket").agg(
        F.count("*").cast("long").alias("cnt")
    )
    return (
        buckets.groupBy(F.col("bits").cast("long").alias("bits"))
        .agg(
            F.sum("cnt").cast("long").alias("n_features"),
            F.count("*").cast("long").alias("n_buckets_used"),
            (F.sum("cnt") - F.count("*")).cast("long").alias("n_collided_features"),
            F.max("cnt").cast("long").alias("worst_bucket"),
        )
        .orderBy("bits")
    )
