"""Round-5 analytics additions, part 2: higher statistical moments from
raw power sums, Pareto/Gini concentration, Zipf rank-frequency fit, and
hour-of-week seasonality with a chi-square uniformity statistic.

House contract: Spark-first plans, identically-aliased DuckDB oracles,
floats rounded identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Skewness / kurtosis from raw power sums
# --------------------------------------------------------------------------

# Deliberately NOT the built-in skewness()/kurtosis(): Spark uses
# population moments, DuckDB bias-corrected sample moments — same name,
# different estimator. Expanding from raw power sums E[x^k] makes the
# arithmetic identical on both engines AND demonstrates the mergeable
# shape: four sums and a count are the complete distributed state.
_MOMENTS_ORACLE = """
WITH p AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         avg(value) AS e1,
         avg(value * value) AS e2,
         avg(value * value * value) AS e3,
         avg(value * value * value * value) AS e4
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       round(e1, 4) AS mean,
       round(e2 - e1 * e1, 4) AS m2,
       round((e3 - 3 * e1 * e2 + 2 * e1 * e1 * e1)
             / pow(e2 - e1 * e1, 1.5), 4) AS skewness_pop,
       round((e4 - 4 * e1 * e3 + 6 * e1 * e1 * e2 - 3 * e1 * e1 * e1 * e1)
             / pow(e2 - e1 * e1, 2) - 3, 4) AS kurtosis_excess
FROM p
ORDER BY event_type
"""


@register("agg_higher_moments", oracle=_MOMENTS_ORACLE, tags=("agg", "stats"))
def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis per group, computed from raw power
    sums E[x^k] instead of the built-ins — because Spark's skewness()
    is the population estimator and DuckDB's is bias-corrected, the
    same function name returns different numbers; the power-sum
    expansion pins one definition on both engines. Scale shape: the
    complete distributed state is (n, sum x, sum x^2, sum x^3, sum x^4)
    — five mergeable accumulators in one map-side-combined groupBy, the
    same single-pass profile `etl_profile_table` uses. At 100 TB that
    is one scan and a KB-sized shuffle regardless of group count."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    p = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(v).alias("e1"),
        F.avg(v * v).alias("e2"),
        F.avg(v * v * v).alias("e3"),
        F.avg(v * v * v * v).alias("e4"),
    )
    e1, e2, e3, e4 = F.col("e1"), F.col("e2"), F.col("e3"), F.col("e4")
    m2 = e2 - e1 * e1
    m3 = e3 - 3 * e1 * e2 + 2 * e1 * e1 * e1
    m4 = e4 - 4 * e1 * e3 + 6 * e1 * e1 * e2 - 3 * e1 * e1 * e1 * e1
    return p.select(
        "event_type",
        "n",
        F.round(e1, 4).alias("mean"),
        F.round(m2, 4).alias("m2"),
        F.round(m3 / F.pow(m2, 1.5), 4).alias("skewness_pop"),
        F.round(m4 / F.pow(m2, 2) - 3, 4).alias("kurtosis_excess"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Pareto concentration + Gini
# --------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH uc AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY user_id
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS nu, CAST(sum(c) AS BIGINT) AS te FROM uc
),
ranked AS (
  SELECT c,
         row_number() OVER (ORDER BY c DESC, user_id) AS rn,
         sum(c) OVER (ORDER BY c DESC, user_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM uc
)
SELECT
  t.nu AS n_users, t.te AS n_events,
  CAST(min(CASE WHEN r.cum >= 0.5 * t.te THEN r.rn END) AS BIGINT) AS users_for_50pct,
  CAST(min(CASE WHEN r.cum >= 0.8 * t.te THEN r.rn END) AS BIGINT) AS users_for_80pct,
  CAST(min(CASE WHEN r.cum >= 0.9 * t.te THEN r.rn END) AS BIGINT) AS users_for_90pct,
  round((t.nu + 1.0) / t.nu - 2.0 * sum(r.rn * r.c) / (t.nu * t.te), 4) AS gini
FROM ranked r CROSS JOIN tot t
GROUP BY t.nu, t.te
"""


@register("events_pareto_gini", oracle=_PARETO_ORACLE, tags=("analytics", "stats"))
def events_pareto_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity concentration: how few users produce 50/80/90% of all
    events, plus the Gini coefficient from the rank-weighted identity
    over DESCENDING ranks: G = (n+1)/n - 2*sum(r*c)/(n*T) (the
    ascending form 2*sum(i*c)/(n*T) - (n+1)/n rewritten via
    i = n+1-r — identical arithmetic on both engines, no geometric
    integration). The cumulative window runs over the AGGREGATED
    per-user count table, not the corpus — |users| rows after the one
    corpus-sized groupBy. The global orderBy window is single-partition
    in Spark, fine while per-user state fits one node (hundreds of
    millions of longs); past that the same prefix-sum decomposes into
    range-partitioned partial sums + broadcast offsets — the plan
    change is localized to this final stage, the corpus stage is
    untouched."""
    ev = load_table(spark, sf_dir, "events")
    uc = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    tot = uc.agg(
        F.count(F.lit(1)).alias("nu"), F.sum("c").cast("long").alias("te")
    )
    w_ord = W.orderBy(F.desc("c"), "user_id")
    ranked = uc.select(
        "c",
        F.row_number().over(w_ord).alias("rn"),
        F.sum("c").over(w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("cum"),
    )
    joined = ranked.crossJoin(F.broadcast(tot))
    return joined.groupBy("nu", "te").agg(
        F.min(F.when(F.col("cum") >= 0.5 * F.col("te"), F.col("rn")))
        .cast("long")
        .alias("users_for_50pct"),
        F.min(F.when(F.col("cum") >= 0.8 * F.col("te"), F.col("rn")))
        .cast("long")
        .alias("users_for_80pct"),
        F.min(F.when(F.col("cum") >= 0.9 * F.col("te"), F.col("rn")))
        .cast("long")
        .alias("users_for_90pct"),
        F.round(
            (F.col("nu") + 1.0) / F.col("nu")
            - 2.0 * F.sum(F.col("rn") * F.col("c")) / (F.col("nu") * F.col("te")),
            4,
        ).alias("gini"),
    ).select(
        F.col("nu").alias("n_users"),
        F.col("te").alias("n_events"),
        "users_for_50pct",
        "users_for_80pct",
        "users_for_90pct",
        "gini",
    )


# --------------------------------------------------------------------------
# Zipf rank-frequency slope
# --------------------------------------------------------------------------

_ZIPF_ORACLE = """
WITH tf AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY w
),
ranked AS (
  SELECT freq, row_number() OVER (ORDER BY freq DESC, w) AS rnk FROM tf
)
SELECT
  CAST(count(*) AS BIGINT) AS n_terms,
  round(regr_slope(ln(freq), ln(rnk)), 4) AS zipf_slope,
  round(regr_intercept(ln(freq), ln(rnk)), 4) AS zipf_intercept,
  round(regr_r2(ln(freq), ln(rnk)), 4) AS fit_r2
FROM ranked
"""


@register("text_zipf_slope", oracle=_ZIPF_ORACLE, tags=("llm", "text", "stats"))
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: regress ln(freq) on
    ln(rank) — natural text sits near slope -1, and a corpus whose
    slope drifts far from it (too flat: boilerplate/templating; too
    steep: vocabulary collapse) fails the distributional health check.
    Pipeline: term-frequency groupBy (corpus-sized, map-side combined),
    rank window over the VOCABULARY table, then the regr_* battery —
    whose complete state is six mergeable sums, same as
    `agg_regression`. The vocabulary follows Heaps' law (sublinear in
    corpus size), so the post-TF stages shrink relative to the scan as
    data grows."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = tf.select(
        "freq", F.row_number().over(W.orderBy(F.desc("freq"), "w")).alias("rnk")
    )
    lf, lr = F.log("freq"), F.log("rnk")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope(lf, lr), 4).alias("zipf_slope"),
        F.round(F.regr_intercept(lf, lr), 4).alias("zipf_intercept"),
        F.round(F.regr_r2(lf, lr), 4).alias("fit_r2"),
    )


# --------------------------------------------------------------------------
# Hour-of-week seasonality + chi-square
# --------------------------------------------------------------------------

# dow/hour from pure integer epoch arithmetic so both engines agree
# exactly (1970-01-01 was a Thursday; +4 days makes Sunday = 0).
_SEASONALITY_ORACLE = """
WITH cells AS (
  SELECT ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
         (epoch_us(ts) // 3600000000) % 24 AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS te, CAST(count(*) AS BIGINT) AS nc FROM cells)
SELECT c.dow, c.hour, c.n,
       round(t.te * 1.0 / t.nc, 4) AS expected,
       round(pow(c.n - t.te * 1.0 / t.nc, 2) / (t.te * 1.0 / t.nc), 4)
         AS chi2_cell
FROM cells c CROSS JOIN tot t
ORDER BY c.dow, c.hour
"""


@register("events_seasonality_chisq", oracle=_SEASONALITY_ORACLE, tags=("analytics", "stats"))
def events_seasonality_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week activity matrix with per-cell chi-square
    contributions against the uniform-traffic null — the seasonality
    profile that feeds anomaly baselines and capacity planning. The
    day-of-week/hour keys come from integer epoch arithmetic (not
    calendar functions) because dayofweek() numbering differs across
    engines; `(days + 4) % 7` is unambiguous. One corpus-sized groupBy
    to <= 168 cells; the expected-count scalar broadcasts back as a
    1-row crossJoin. Map-side key derivation, single shuffle of
    aggregate state."""
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.select(
            F.expr("((unix_micros(ts) div 86400000000) + 4) % 7").alias("dow"),
            F.expr("(unix_micros(ts) div 3600000000) % 24").alias("hour"),
        )
        .groupBy("dow", "hour")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cells.agg(
        F.sum("n").cast("long").alias("te"), F.count(F.lit(1)).alias("nc")
    )
    exp = F.col("te") * 1.0 / F.col("nc")
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "hour",
            "n",
            F.round(exp, 4).alias("expected"),
            F.round(F.pow(F.col("n") - exp, 2) / exp, 4).alias("chi2_cell"),
        )
        .orderBy("dow", "hour")
    )
