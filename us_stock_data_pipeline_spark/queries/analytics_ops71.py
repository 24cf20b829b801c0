"""Round-77 analytics, part 71: Nelson-Aalen cumulative hazard and the
two-group log-rank survival test — completing the survival family next
to `survival_kaplan_meier`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard
# --------------------------------------------------------------------------

_NA_CENSOR_DAYS = 60

_NA_ORACLE = f"""
WITH dur AS (
  SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > {_NA_CENSOR_DAYS}
              THEN {_NA_CENSOR_DAYS}
              ELSE date_diff('day', o.o_orderdate, l.l_shipdate) END AS t,
         CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > {_NA_CENSOR_DAYS}
              THEN 0 ELSE 1 END AS ev
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate >= o.o_orderdate
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dur),
per_t AS (
  SELECT t, CAST(sum(ev) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS leaving
  FROM dur GROUP BY t
),
at_risk AS (
  SELECT t, d,
         tot.n - coalesce(sum(leaving) OVER (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
  FROM per_t, tot
),
steps AS (
  -- per-step hazard increment d/n quantized to exact integer micro
  -- units BEFORE the cumulative sum (positive operands, so DuckDB //
  -- and Spark div agree)
  SELECT t, d, n_risk, d * 1000000 // n_risk AS hq
  FROM at_risk WHERE d > 0
)
SELECT CAST(t AS BIGINT) AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
       d AS d_events,
       CAST(sum(hq) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_hazard_micro
FROM steps
ORDER BY t_days
"""


@register("survival_nelson_aalen", oracle=_NA_ORACLE, tags=("analytics", "survival"))
def survival_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard for order-to-ship time: H(t) =
    sum_{t_i <= t} d_i / n_i, the additive dual of Kaplan-Meier's
    product (`survival_kaplan_meier` shares the duration model and
    censoring). NA is preferred when the HAZARD shape is the readout
    (bathtub curves, burn-in detection) and is the building block of
    the log-rank test's expected counts. Exactness: each step's d/n
    quantizes to integer micro-units with positive-only integer
    division (DuckDB `//` == Spark `div` here), then an exact integer
    cumsum — no float accumulation at all, one step further than KM's
    log-space trick. Plan: one fact-fact join, one groupBy to the
    day-granularity support (<= 61 rows regardless of corpus size),
    windows over that tiny table — at 100 TB the only heavy edge is
    the first join's order-key shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    raw_days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    dur = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.when(raw_days > _NA_CENSOR_DAYS, F.lit(_NA_CENSOR_DAYS))
            .otherwise(raw_days)
            .alias("t"),
            F.when(raw_days > _NA_CENSOR_DAYS, F.lit(0)).otherwise(F.lit(1)).alias("ev"),
        )
    )
    tot = dur.agg(F.count(F.lit(1)).cast("long").alias("n"))
    per_t = dur.groupBy("t").agg(
        F.sum("ev").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("leaving"),
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    at_risk = per_t.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        (F.col("n") - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0))).alias("n_risk"),
    )
    steps = at_risk.filter(F.col("d") > 0).select(
        "t", "d", "n_risk", F.expr("d * 1000000 div n_risk").alias("hq")
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return steps.select(
        F.col("t").cast("long").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").alias("d_events"),
        F.sum("hq").over(w_cum).cast("long").alias("cum_hazard_micro"),
    ).orderBy("t_days")


# --------------------------------------------------------------------------
# Log-rank test: urgent-priority vs standard-priority ship times
# --------------------------------------------------------------------------

_LR_ORACLE = f"""
WITH dur AS (
  SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS g,
         CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > {_NA_CENSOR_DAYS}
              THEN {_NA_CENSOR_DAYS}
              ELSE date_diff('day', o.o_orderdate, l.l_shipdate) END AS t,
         CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > {_NA_CENSOR_DAYS}
              THEN 0 ELSE 1 END AS ev
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate >= o.o_orderdate
),
tot AS (
  SELECT CAST(sum(g) AS BIGINT) AS n1_tot,
         CAST(count(*) - sum(g) AS BIGINT) AS n2_tot
  FROM dur
),
per_t AS (
  SELECT t,
         CAST(sum(ev * g) AS BIGINT) AS d1,
         CAST(sum(ev * (1 - g)) AS BIGINT) AS d2,
         CAST(sum(g) AS BIGINT) AS leave1,
         CAST(count(*) - sum(g) AS BIGINT) AS leave2
  FROM dur GROUP BY t
),
at_risk AS (
  SELECT t, d1, d2,
         tot.n1_tot - coalesce(sum(leave1) OVER (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
         tot.n2_tot - coalesce(sum(leave2) OVER (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n2
  FROM per_t, tot
),
steps AS (
  -- expected group-1 events and hypergeometric variance per event time,
  -- quantized micro; E1 uses exact integer division (positive operands),
  -- V computes in DOUBLE with a pinned left-to-right association so both
  -- engines produce bit-identical IEEE results before the quantize
  SELECT (d1 + d2) * n1 * 1000000 // (n1 + n2) AS e1_micro,
         CAST(floor(CAST(d1 + d2 AS DOUBLE) * n1 / (n1 + n2) * n2 / (n1 + n2)
                    * (n1 + n2 - d1 - d2) / (n1 + n2 - 1) * 1000000 + 0.5)
           AS BIGINT) AS v_micro,
         d1
  FROM at_risk
  WHERE d1 + d2 > 0 AND n1 + n2 > 1
),
sums AS (
  SELECT CAST(sum(d1) AS BIGINT) AS o1,
         CAST(sum(e1_micro) AS BIGINT) AS e1_micro,
         CAST(sum(v_micro) AS BIGINT) AS v_micro
  FROM steps
)
SELECT tot.n1_tot, tot.n2_tot, sums.o1, sums.e1_micro, sums.v_micro,
       CAST(floor(CAST(sums.o1 * 1000000 - sums.e1_micro AS DOUBLE)
                  * (sums.o1 * 1000000 - sums.e1_micro)
                  / 1000000 / sums.v_micro * 1000 + 0.5) AS BIGINT)
         AS chi2_milli
FROM sums, tot
"""


@register("survival_logrank_test", oracle=_LR_ORACLE, tags=("analytics", "survival", "stats"))
def survival_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test: do urgent/high-priority orders ship on a
    different time-to-event curve than standard-priority ones? At each
    distinct event time the observed group-1 deaths d1 are compared to
    the hypergeometric expectation d*n1/n with variance
    d*(n1/n)*(n2/n)*(n-d)/(n-1); chi2 = (O1-E1)^2/V ~ chi2(1). This is
    THE standard two-sample comparison for censored durations — a
    t-test on means is biased the moment censoring exists
    (`stats_welch_ttest` can't be used here). Exactness: E1 quantizes
    via positive-only integer division; V's rational has a BIGINT-
    overflowing numerator (n^4 terms), so it computes in DOUBLE with a
    pinned left-to-right association — identical IEEE ops in both
    engines — then quantizes to integer micro before the sums. Plan:
    the same single fact-fact shuffle as Kaplan-Meier, both groups'
    at-risk counts from one pass (no per-group rescan), windows over
    the <= 61-row support."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    raw_days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    dur = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int").alias("g"),
            F.when(raw_days > _NA_CENSOR_DAYS, F.lit(_NA_CENSOR_DAYS))
            .otherwise(raw_days)
            .alias("t"),
            F.when(raw_days > _NA_CENSOR_DAYS, F.lit(0)).otherwise(F.lit(1)).alias("ev"),
        )
    )
    tot = dur.agg(
        F.sum("g").cast("long").alias("n1_tot"),
        (F.count(F.lit(1)) - F.sum("g")).cast("long").alias("n2_tot"),
    )
    per_t = dur.groupBy("t").agg(
        F.sum(F.col("ev") * F.col("g")).cast("long").alias("d1"),
        F.sum(F.col("ev") * (1 - F.col("g"))).cast("long").alias("d2"),
        F.sum("g").cast("long").alias("leave1"),
        (F.count(F.lit(1)) - F.sum("g")).cast("long").alias("leave2"),
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    at_risk = per_t.crossJoin(F.broadcast(tot)).select(
        "d1",
        "d2",
        (F.col("n1_tot") - F.coalesce(F.sum("leave1").over(w_prev), F.lit(0))).alias("n1"),
        (F.col("n2_tot") - F.coalesce(F.sum("leave2").over(w_prev), F.lit(0))).alias("n2"),
        "t",
    )
    n = F.col("n1") + F.col("n2")
    d = F.col("d1") + F.col("d2")
    steps = at_risk.filter((d > 0) & (n > 1)).select(
        F.expr("(d1 + d2) * n1 * 1000000 div (n1 + n2)").alias("e1_micro"),
        F.floor(
            d.cast("double") * F.col("n1") / n * F.col("n2") / n * (n - d) / (n - 1)
            * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("v_micro"),
        "d1",
    )
    sums = steps.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum("e1_micro").cast("long").alias("e1_micro"),
        F.sum("v_micro").cast("long").alias("v_micro"),
    )
    diff = F.col("o1") * 1000000 - F.col("e1_micro")
    return sums.crossJoin(F.broadcast(tot)).select(
        "n1_tot",
        "n2_tot",
        "o1",
        "e1_micro",
        "v_micro",
        F.floor(
            diff.cast("double") * diff / 1000000 / F.col("v_micro") * 1000 + F.lit(0.5)
        )
        .cast("long")
        .alias("chi2_milli"),
    )
