"""Round-93 analytics, part 87: Omega ratio and the Cochran-Armitage
trend test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Omega ratio of daily returns (threshold = 0)
# --------------------------------------------------------------------------

_OMEGA_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol,
         CAST(floor((c - lag(c) OVER w) * 10000.0 / lag(c) OVER w + 0.5)
           AS BIGINT) AS r
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(c) OVER w IS NOT NULL
)
SELECT symbol, CAST(count(*) AS BIGINT) AS n_returns,
       CAST(sum(CASE WHEN r > 0 THEN r ELSE 0 END) AS BIGINT) AS gain_qbp,
       CAST(sum(CASE WHEN r < 0 THEN -r ELSE 0 END) AS BIGINT) AS loss_qbp,
       CAST(sum(CASE WHEN r > 0 THEN r ELSE 0 END) * 1000
            // sum(CASE WHEN r < 0 THEN -r ELSE 0 END) AS BIGINT) AS omega_milli
FROM rets
GROUP BY symbol
ORDER BY symbol
"""


@register("bars_omega_ratio", oracle=_OMEGA_ORACLE, tags=("stock", "risk"))
def bars_omega_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Omega ratio at threshold 0: the probability-weighted sum of
    gains over the sum of losses — the WHOLE-distribution risk-return
    measure (Sharpe, in `bars_sharpe_sortino`, compresses everything
    into two moments and is blind to skew/kurtosis; Omega integrates
    the full return CDF above and below the threshold, so a fat left
    tail shows up directly). Exactness: returns are integer quarter-bp,
    both partial sums are exact BIGINT, and the ratio quantizes to
    milli with positive-only integer division. Plan: one groupBy over
    the daily rollup with conditional sums — fully map-side
    combinable, symbol-cardinality output."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w = Window.partitionBy("symbol").orderBy("day")
    prev = F.lag("c").over(w)
    rets = (
        closes.select("symbol", prev.alias("p"), "c")
        .filter(F.col("p").isNotNull())
        .select(
            "symbol",
            F.floor((F.col("c") - F.col("p")) * 10000.0 / F.col("p") + F.lit(0.5))
            .cast("long")
            .alias("r"),
        )
    )
    gain = F.sum(F.when(F.col("r") > 0, F.col("r")).otherwise(0)).cast("long")
    loss = F.sum(F.when(F.col("r") < 0, -F.col("r")).otherwise(0)).cast("long")
    return (
        rets.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_returns"),
            gain.alias("gain_qbp"),
            loss.alias("loss_qbp"),
        )
        .select(
            "symbol",
            "n_returns",
            "gain_qbp",
            "loss_qbp",
            F.expr("gain_qbp * 1000 div loss_qbp").alias("omega_milli"),
        )
        .orderBy("symbol")
    )


# --------------------------------------------------------------------------
# Cochran-Armitage trend test: return rate across ordered priority levels
# --------------------------------------------------------------------------

_CA_ORACLE = """
WITH graded AS (
  -- ordered dose levels from order priority (1-URGENT .. 5-LOW);
  -- binary outcome: the line was returned
  SELECT CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS lvl,
         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ev
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
per AS (
  SELECT lvl, CAST(count(*) AS BIGINT) AS n, CAST(sum(ev) AS BIGINT) AS e
  FROM graded GROUP BY lvl
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(e) AS BIGINT) AS ee,
         CAST(sum(lvl * n) AS BIGINT) AS swn, CAST(sum(lvl * e) AS BIGINT) AS swe,
         CAST(sum(lvl * lvl * n) AS BIGINT) AS swwn
  FROM per
)
SELECT nn AS n_rows, ee AS n_events,
       -- T = sum w(e - n*p) scaled by nn: t_num = nn*swe - ee*swn (exact)
       CAST(nn * swe - ee * swn AS BIGINT) AS t_num_scaled,
       -- Var(T)*nn^3 = ee*(nn-ee)*(nn*swwn - swn^2), exact up to DOUBLE
       CAST(floor(CAST(nn * swe - ee * swn AS DOUBLE)
                  / sqrt(CAST(ee AS DOUBLE) * (nn - ee) / nn
                         * (CAST(nn AS DOUBLE) * swwn - CAST(swn AS DOUBLE) * swn)
                         / nn)
                  * 1000 + 0.5) AS BIGINT) AS z_milli
FROM tot
"""


@register("stats_cochran_armitage_trend", oracle=_CA_ORACLE, tags=("stats",))
def stats_cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage test for a monotone TREND in return rates
    across the five ordered priority levels: T = sum_i w_i (e_i -
    n_i p) with w = the level score, z = T / sqrt(p(1-p)(sum n w^2 -
    (sum n w)^2 / N)) — the right test when categories are ORDERED
    (the plain chi-square of `events_seasonality_chisq` throws the
    ordering away and loses power against dose-response alternatives).
    Exactness: the five per-level (n, e) cells and all weighted sums
    are exact BIGINT; T's numerator cross-scales by N to stay integer
    (nn*swe - ee*swn), and the variance assembles in pinned DOUBLE for
    one quantized z. Plan: one fact-fact join, one 5-row groupBy, one
    scalar reduce."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    graded = o.join(li, li.l_orderkey == o.o_orderkey).select(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("lvl"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ev"),
    )
    per = graded.groupBy("lvl").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("ev").cast("long").alias("e")
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("e").cast("long").alias("ee"),
        F.sum(F.col("lvl") * F.col("n")).cast("long").alias("swn"),
        F.sum(F.col("lvl") * F.col("e")).cast("long").alias("swe"),
        F.sum(F.col("lvl") * F.col("lvl") * F.col("n")).cast("long").alias("swwn"),
    )
    t_num = (F.col("nn") * F.col("swe") - F.col("ee") * F.col("swn")).cast("long")
    var = (
        F.col("ee").cast("double")
        * (F.col("nn") - F.col("ee"))
        / F.col("nn")
        * (F.col("nn").cast("double") * F.col("swwn") - F.col("swn").cast("double") * F.col("swn"))
        / F.col("nn")
    )
    return tot.select(
        F.col("nn").alias("n_rows"),
        F.col("ee").alias("n_events"),
        t_num.alias("t_num_scaled"),
        F.floor(t_num.cast("double") / F.sqrt(var) * 1000 + F.lit(0.5))
        .cast("long")
        .alias("z_milli"),
    )
