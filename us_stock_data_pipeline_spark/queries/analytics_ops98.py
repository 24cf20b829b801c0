"""Round-106 analytics, part 98: Jain's fairness index and up/down
market-capture ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Jain's fairness index of order allocation across suppliers per nation
# --------------------------------------------------------------------------

_JAIN_ORACLE = """
WITH alloc AS (
  SELECT s.s_nationkey, l.l_suppkey,
         CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY s.s_nationkey, l.l_suppkey
),
sums AS (
  SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_suppliers,
         CAST(sum(a.n_lines) AS BIGINT) AS sx,
         CAST(sum(a.n_lines * a.n_lines) AS BIGINT) AS sxx
  FROM alloc a JOIN nation n ON n.n_nationkey = a.s_nationkey
  GROUP BY n.n_name
)
SELECT nation, n_suppliers, sx AS total_lines,
       -- J = (sum x)^2 / (n * sum x^2) in (1/n, 1], micro-quantized via
       -- one double division from exact BIGINT sums
       CAST(floor(CAST(sx AS DOUBLE) * sx / n_suppliers / sxx * 1000000 + 0.5)
         AS BIGINT) AS jain_micro
FROM sums
ORDER BY nation
"""


@register("supplier_jain_fairness", oracle=_JAIN_ORACLE, tags=("analytics", "allocation"))
def supplier_jain_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jain's fairness index of line-item allocation across each
    nation's suppliers: J = (sum x)^2 / (n sum x^2), the bounded
    (1/n..1] fairness score from resource-allocation theory — J = 1
    means perfectly even routing, J = 1/n means one supplier carries
    everything. It answers a different question than concentration
    indices (`agg_herfindahl_index` is 1/(n J) up to scaling — HHI
    weights the TOP, Jain penalizes overall unevenness and is
    population-size comparable, which is why schedulers quote it).
    Exactness: per-supplier line counts and both power sums are exact
    BIGINT; one double division quantizes micro. Plan: one fact
    groupBy with a broadcast dim hop, then a per-nation reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    alloc = (
        li.join(F.broadcast(s.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_lines"))
    )
    sums = (
        alloc.join(F.broadcast(n.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("n_lines").cast("long").alias("sx"),
            F.sum(F.col("n_lines") * F.col("n_lines")).cast("long").alias("sxx"),
        )
    )
    return sums.select(
        "nation",
        "n_suppliers",
        F.col("sx").alias("total_lines"),
        F.floor(
            F.col("sx").cast("double") * F.col("sx") / F.col("n_suppliers") / F.col("sxx")
            * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("jain_micro"),
    ).orderBy("nation")


# --------------------------------------------------------------------------
# Up/down capture ratios vs the equal-weight market
# --------------------------------------------------------------------------

_CAPTURE_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol, day,
         CAST(floor((c - lag(c) OVER w) * 10000.0 / lag(c) OVER w + 0.5)
           AS BIGINT) AS r
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(c) OVER w IS NOT NULL
),
mkt AS (
  -- equal-weight market return scaled by the symbol count (exact int)
  SELECT day, CAST(sum(r) AS BIGINT) AS mr_k, CAST(count(*) AS BIGINT) AS k
  FROM rets GROUP BY day
),
joined AS (
  SELECT r.symbol, r.r, m.mr_k, m.k,
         CASE WHEN m.mr_k > 0 THEN 1 WHEN m.mr_k < 0 THEN -1 ELSE 0 END AS side
  FROM rets r JOIN mkt m ON m.day = r.day
)
SELECT symbol,
       CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up_days,
       CAST(sum(CASE WHEN side = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down_days,
       -- capture = (sum own r on up days) / (sum mkt r on up days), where
       -- mkt r carries at k-scale on both sides so the ratio is exact:
       -- sum(r*k) / sum(mr_k), milli-quantized with truncating division
       CAST(CAST(sum(CASE WHEN side = 1 THEN r * k ELSE 0 END) AS BIGINT) * 1000
            // sum(CASE WHEN side = 1 THEN mr_k ELSE 0 END) AS BIGINT)
         AS up_capture_milli,
       CAST(CAST(sum(CASE WHEN side = -1 THEN r * k ELSE 0 END) AS BIGINT) * 1000
            // sum(CASE WHEN side = -1 THEN mr_k ELSE 0 END) AS BIGINT)
         AS down_capture_milli
FROM joined
GROUP BY symbol
ORDER BY symbol
"""


@register("bars_updown_capture", oracle=_CAPTURE_ORACLE, tags=("stock", "risk"))
def bars_updown_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Up/down capture ratios vs the equal-weight market: the ratio of
    a symbol's cumulative return to the market's, computed separately
    over market-up and market-down days — the fund-analytics readout
    for ASYMMETRIC sensitivity (a 1.2 up / 0.8 down profile is what
    every allocator wants; CAPM beta in `bars_capm_beta` forces one
    symmetric number onto both regimes). Exactness: the own-return
    side scales by the symbol count k so both numerator and
    denominator are exact integer sums at the same scale, and one
    truncating division (negative-capable on the down side: Spark div
    == DuckDB //) quantizes to milli. Plan: returns once, a per-day
    market aggregate, one join back, one grouped conditional sum."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w = Window.partitionBy("symbol").orderBy("day")
    prev = F.lag("c").over(w)
    rets = (
        closes.select("symbol", "day", prev.alias("p"), "c")
        .filter(F.col("p").isNotNull())
        .select(
            "symbol",
            "day",
            F.floor((F.col("c") - F.col("p")) * 10000.0 / F.col("p") + F.lit(0.5))
            .cast("long")
            .alias("r"),
        )
    )
    mkt = rets.groupBy("day").agg(
        F.sum("r").cast("long").alias("mr_k"), F.count(F.lit(1)).cast("long").alias("k")
    )
    joined = rets.join(mkt, "day").select(
        "symbol",
        "r",
        "mr_k",
        "k",
        F.when(F.col("mr_k") > 0, 1).when(F.col("mr_k") < 0, -1).otherwise(0).alias("side"),
    )
    up_num = F.sum(F.when(F.col("side") == 1, F.col("r") * F.col("k")).otherwise(0)).cast("long")
    up_den = F.sum(F.when(F.col("side") == 1, F.col("mr_k")).otherwise(0)).cast("long")
    dn_num = F.sum(F.when(F.col("side") == -1, F.col("r") * F.col("k")).otherwise(0)).cast("long")
    dn_den = F.sum(F.when(F.col("side") == -1, F.col("mr_k")).otherwise(0)).cast("long")
    return (
        joined.groupBy("symbol")
        .agg(
            F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).cast("long").alias("n_up_days"),
            F.sum(F.when(F.col("side") == -1, 1).otherwise(0)).cast("long").alias("n_down_days"),
            up_num.alias("un"),
            up_den.alias("ud"),
            dn_num.alias("dn"),
            dn_den.alias("dd"),
        )
        .select(
            "symbol",
            "n_up_days",
            "n_down_days",
            F.expr("un * 1000 div ud").cast("long").alias("up_capture_milli"),
            F.expr("dn * 1000 div dd").cast("long").alias("down_capture_milli"),
        )
        .orderBy("symbol")
    )
