"""Round-16 ML, part 6: isotonic regression calibration via the exact
minimax formula — PAV without the sequential pooling loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.queries.ml_eval_ops import _SCORED_SQL, _scored
from us_stock_data_pipeline_spark.registry import register

# Isotonic fit over B ordered bins: fitted(k) = max_{i<=k} min_{j>=k}
# mean(y[i..j]) — the minimax characterization of the PAV solution.
# PAV itself is a sequential stack algorithm; the minimax form is a
# B^3 enumeration over bin prefix sums, trivially parallel and
# exactly SQL-expressible when B is fixed (15 here: 10-milli-wide score bins matched to the feature's 0-150 range). Interval means
# are quantized to integer micro-rates for deterministic min/max
# selection (tie-break on the interval endpoint).
_ISO_ORACLE = f"""
WITH {_SCORED_SQL},
bins AS (
  SELECT least(score_milli // 10, 14) AS b,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS pos
  FROM scored GROUP BY 1
),
pref AS (
  SELECT b, n, pos,
         sum(n) OVER (ORDER BY b) AS cn,
         sum(pos) OVER (ORDER BY b) AS cp
  FROM bins
),
intervals AS (
  SELECT i.b AS i, j.b AS j,
         (j.cp - i.cp + i.pos) * 1000000 // (j.cn - i.cn + i.n) AS rate_ppm
  FROM pref i JOIN pref j ON j.b >= i.b
),
inner_min AS (
  SELECT v.i, k.b AS k,
         min(v.rate_ppm) AS min_rate
  FROM intervals v JOIN pref k ON v.i <= k.b AND k.b <= v.j
  GROUP BY v.i, k.b
),
fit AS (
  SELECT k, CAST(max(min_rate) AS BIGINT) AS fitted_ppm
  FROM inner_min GROUP BY k
)
SELECT p.b AS bin, p.n, p.pos,
       CAST(p.pos * 1000000 // p.n AS BIGINT) AS raw_ppm,
       f.fitted_ppm
FROM pref p JOIN fit f ON f.k = p.b
ORDER BY p.b
"""


@register("ml_isotonic_calibration", oracle=_ISO_ORACLE, tags=("ml", "eval", "train"))
def ml_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic regression calibration of the stopword-rate
    classifier: fit the best NON-DECREASING step function to the
    per-bin positive rates — the calibration map served next to a
    model when Platt scaling's sigmoid is too rigid. The classic PAV
    algorithm is a sequential pooling stack; this uses the exact
    minimax identity fitted(k) = max_{i<=k} min_{j>=k} mean(y[i..j]),
    which over B=15 bins is a B^3 enumeration of interval rates from
    prefix sums — embarrassingly parallel, and the correct
    distributed formulation whenever the calibration grid is fixed
    (at 100 TB the grid stays 10-100 bins; only the bin sums scan
    data). Interval rates are floor-quantized integer ppm, so min,
    max, and the monotonicity guarantee are exact on both engines.
    Plan: doc-level groupBy, one 15-row prefix window, two bounded
    self-joins over the 15-bin table."""
    scored = _scored(spark, sf_dir)
    bins = scored.groupBy(
        F.least(F.expr("score_milli div 10"), F.lit(14)).alias("b")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    pref = bins.select(
        "b",
        "n",
        "pos",
        F.sum("n").over(w).alias("cn"),
        F.sum("pos").over(w).alias("cp"),
    )
    i = pref.select(
        F.col("b").alias("i"), F.col("n").alias("ni"), F.col("pos").alias("pi"),
        F.col("cn").alias("cni"), F.col("cp").alias("cpi"),
    )
    j = pref.select(
        F.col("b").alias("j"), F.col("cn").alias("cnj"), F.col("cp").alias("cpj")
    )
    intervals = i.join(F.broadcast(j), F.col("j") >= F.col("i")).select(
        "i",
        "j",
        F.expr("(cpj - cpi + pi) * 1000000 div (cnj - cni + ni)").alias("rate_ppm"),
    )
    k = pref.select(F.col("b").alias("k"))
    inner_min = (
        intervals.join(
            F.broadcast(k), (F.col("i") <= F.col("k")) & (F.col("k") <= F.col("j"))
        )
        .groupBy("i", "k")
        .agg(F.min("rate_ppm").alias("min_rate"))
    )
    fit = inner_min.groupBy("k").agg(
        F.max("min_rate").cast("long").alias("fitted_ppm")
    )
    return (
        pref.join(F.broadcast(fit), pref.b == fit.k)
        .select(
            F.col("b").alias("bin"),
            "n",
            "pos",
            F.expr("CAST(pos * 1000000 div n AS BIGINT)").alias("raw_ppm"),
            "fitted_ppm",
        )
        .orderBy("bin")
    )
