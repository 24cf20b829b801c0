"""Round-113 analytics, part 103: BCG growth-share quadrants and the
turning-point randomness test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# BCG growth-share matrix per brand
# --------------------------------------------------------------------------

_BCG_ORACLE = """
WITH yr AS (SELECT max(year(o_orderdate)) AS y1 FROM orders),
rev AS (
  SELECT p.p_brand AS brand,
         CAST(sum(CASE WHEN year(o.o_orderdate) = (SELECT y1 FROM yr)
                       THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS rev1,
         CAST(sum(CASE WHEN year(o.o_orderdate) = (SELECT y1 FROM yr) - 1
                       THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS rev0
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand
),
tot AS (SELECT CAST(sum(rev1) AS BIGINT) AS t1 FROM rev)
SELECT brand, rev1 AS rev_latest_cents, rev0 AS rev_prior_cents,
       -- growth in bp vs prior year; share of latest-year total in bp
       CAST((rev1 - rev0) * 10000 // rev0 AS BIGINT) AS growth_bp,
       CAST(rev1 * 10000 // (SELECT t1 FROM tot) AS BIGINT) AS share_bp,
       CASE WHEN (rev1 - rev0) * 10000 // rev0 >= 0
             AND rev1 * 10000 // (SELECT t1 FROM tot) >= 400 THEN 'star'
            WHEN (rev1 - rev0) * 10000 // rev0 >= 0 THEN 'question_mark'
            WHEN rev1 * 10000 // (SELECT t1 FROM tot) >= 400 THEN 'cash_cow'
            ELSE 'dog' END AS quadrant
FROM rev
WHERE rev0 > 0
ORDER BY brand
"""


@register("orders_bcg_growth_share", oracle=_BCG_ORACLE, tags=("analytics", "portfolio"))
def orders_bcg_growth_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BCG growth-share matrix per brand: latest-year revenue growth
    (vs prior year) on one axis, share of the latest-year total on
    the other, naming the four classic quadrants — star (growing +
    large share), cash cow (stagnant + large), question mark (growing
    + small), dog (neither) — the portfolio-strategy rollup that
    composes the YoY machinery (`orders_yoy_growth`) with the
    concentration machinery (`orders_abc_classification`) into the
    decision chart itself. Thresholds pin to growth >= 0 and share >=
    4% in exact integer bp (truncating division, negative-capable
    growth pairs Spark div with DuckDB //). Plan: one three-table
    join with conditional-sum year pivoting (single fact pass), one
    broadcast scalar for the share denominator."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    y1 = o.agg(F.max(F.year("o_orderdate")).alias("y1"))
    rev = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(p.select("p_partkey", "p_brand")), F.col("p_partkey") == li.l_partkey)
        .crossJoin(F.broadcast(y1))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(
                F.when(
                    F.year("o_orderdate") == F.col("y1"),
                    F.round(F.col("l_extendedprice") * 100).cast("long"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("rev1"),
            F.sum(
                F.when(
                    F.year("o_orderdate") == F.col("y1") - 1,
                    F.round(F.col("l_extendedprice") * 100).cast("long"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("rev0"),
        )
        .filter(F.col("rev0") > 0)
    )
    registry.track_persist(rev)
    tot = rev.agg(F.sum("rev1").cast("long").alias("t1"))
    growth = F.expr("(rev1 - rev0) * 10000 div rev0")
    share = F.expr("rev1 * 10000 div t1")
    return (
        rev.crossJoin(F.broadcast(tot))
        .select(
            "brand",
            F.col("rev1").alias("rev_latest_cents"),
            F.col("rev0").alias("rev_prior_cents"),
            growth.cast("long").alias("growth_bp"),
            share.cast("long").alias("share_bp"),
            F.when((growth >= 0) & (share >= 400), "star")
            .when(growth >= 0, "question_mark")
            .when(share >= 400, "cash_cow")
            .otherwise("dog")
            .alias("quadrant"),
        )
        .orderBy("brand")
    )


# --------------------------------------------------------------------------
# Turning-point test of return randomness
# --------------------------------------------------------------------------

_TP_ORACLE = """
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
trip AS (
  SELECT symbol, r,
         lag(r) OVER (PARTITION BY symbol ORDER BY day) AS rp,
         lead(r) OVER (PARTITION BY symbol ORDER BY day) AS rn
  FROM rets
),
flags AS (
  SELECT symbol,
         CASE WHEN (r > rp AND r > rn) OR (r < rp AND r < rn) THEN 1 ELSE 0 END
           AS is_tp
  FROM trip WHERE rp IS NOT NULL AND rn IS NOT NULL
)
SELECT symbol,
       CAST(count(*) + 2 AS BIGINT) AS n_obs,
       CAST(sum(is_tp) AS BIGINT) AS n_turning_points,
       -- E[T] = 2(n-2)/3, Var[T] = (16n - 29)/90; z milli-quantized
       CAST(floor((CAST(sum(is_tp) AS DOUBLE)
                   - 2.0 * count(*) / 3)
                  / sqrt((16.0 * (count(*) + 2) - 29) / 90) * 1000 + 0.5)
         AS BIGINT) AS z_milli
FROM flags
GROUP BY symbol
ORDER BY symbol
"""


@register("stats_turning_point_test", oracle=_TP_ORACLE, tags=("stats", "timeseries"))
def stats_turning_point_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point test of return-series randomness: count local
    peaks and troughs (strictly higher or lower than both neighbors);
    under IID the expected count is 2(n-2)/3 with variance
    (16n-29)/90, and the z-score flags series that are too SMOOTH
    (trending/autocorrelated: fewer turning points) or too JAGGED
    (mean-reverting/oscillating: more) — the alternation-sensitive
    complement to `stats_runs_test` (which sees only signs) and
    `stats_ljung_box` (which needs a lag choice). Exactness: turning
    points are exact integer comparisons off one lag+lead window;
    strict inequalities mean tied neighbors are not turning points
    (pinned convention); one pinned double assembles z. Plan: one
    (symbol, day) sort carries both the lag and the lead."""
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
    trip = rets.select(
        "symbol",
        "r",
        F.lag("r").over(w).alias("rp"),
        F.lead("r").over(w).alias("rn"),
    ).filter(F.col("rp").isNotNull() & F.col("rn").isNotNull())
    is_tp = F.when(
        ((F.col("r") > F.col("rp")) & (F.col("r") > F.col("rn")))
        | ((F.col("r") < F.col("rp")) & (F.col("r") < F.col("rn"))),
        1,
    ).otherwise(0)
    flags = trip.select("symbol", is_tp.alias("is_tp"))
    inner = F.count(F.lit(1))
    z = (
        F.sum("is_tp").cast("double") - 2.0 * inner / 3
    ) / F.sqrt((16.0 * (inner + 2) - 29) / 90)
    return (
        flags.groupBy("symbol")
        .agg(
            (inner + 2).cast("long").alias("n_obs"),
            F.sum("is_tp").cast("long").alias("n_turning_points"),
            F.floor(z * 1000 + F.lit(0.5)).cast("long").alias("z_milli"),
        )
        .orderBy("symbol")
    )
