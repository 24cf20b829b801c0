"""Round-54 analytics, part 53: Hurst exponent (rescaled-range) and
the Brown-Forsythe variance-homogeneity test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Hurst exponent by rescaled-range (R/S) analysis
# --------------------------------------------------------------------------

_HURST_BLOCKS = (4, 8, 12)

_HURST_ORACLE = f"""
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol, row_number() OVER w AS i,
         CAST(floor((close_cents - lag(close_cents) OVER w) * 10000.0
                    / lag(close_cents) OVER w + 0.5) AS BIGINT) AS x
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(close_cents) OVER w IS NOT NULL
),
sized AS (
  -- i is assigned BEFORE the QUALIFY drop (DuckDB window semantics), so
  -- the first retained return has i = 2; block on (i - 2).
  SELECT r.symbol, m.m, ((r.i - 2) // m.m) AS blk, r.i, r.x
  FROM rets r JOIN (SELECT unnest(ARRAY{list(_HURST_BLOCKS)}) AS m) m ON true
),
blocks AS (  -- only full blocks participate
  SELECT symbol, m, blk, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(x) AS HUGEINT) AS s
  FROM sized GROUP BY 1, 2, 3 HAVING count(*) = m
),
dev AS (  -- d = m*x - S: mean-centered scaled by m, exact integers
  SELECT z.symbol, z.m, z.blk, z.i,
         z.m * z.x - b.s AS d
  FROM sized z JOIN blocks b USING (symbol, m, blk)
),
cum AS (
  SELECT symbol, m, blk, d,
         CAST(sum(d) OVER (PARTITION BY symbol, m, blk ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS c
  FROM dev
),
rs AS (  -- R = (max-min)/m of cumdev, S = sqrt(sum d^2 / m)/m; quantize per block
  SELECT symbol, m, blk,
         CAST(floor(
           (CAST(max(c) - min(c) AS DOUBLE) / m)
           / (sqrt(CAST(sum(d * d) AS DOUBLE) / m) / m)
           * 1000000 + 0.5) AS BIGINT) AS rs_e6
  FROM cum GROUP BY 1, 2, 3
  HAVING sum(d * d) > 0 AND max(c) > min(c)
),
avg_rs AS (
  SELECT symbol, m, CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(sum(rs_e6) AS BIGINT) AS rs_sum_e6
  FROM rs GROUP BY 1, 2
),
pts AS (
  SELECT symbol, ln(CAST(m AS DOUBLE)) AS lx,
         ln(CAST(rs_sum_e6 AS DOUBLE) / n_blocks / 1000000.0) AS ly
  FROM avg_rs
),
fit AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS k,
         sum(lx) AS sx, sum(ly) AS sy, sum(lx * lx) AS sxx, sum(lx * ly) AS sxy
  FROM pts GROUP BY symbol HAVING count(*) = {len(_HURST_BLOCKS)}
)
SELECT symbol,
       CAST(floor((k * sxy - sx * sy) / (k * sxx - sx * sx) * 1000000 + 0.5)
         AS BIGINT) AS hurst_e6
FROM fit
ORDER BY symbol
"""


@register("timeseries_hurst_exponent", oracle=_HURST_ORACLE, tags=("timeseries", "stats"))
def timeseries_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by classic rescaled-range analysis — the
    long-memory diagnostic (H>0.5 trending, H<0.5 mean-reverting,
    H=0.5 random walk) that decides whether `bars_momentum_backtest`
    or `bars_pairs_spread` is even worth running on a series. Per
    block of m in {_HURST_BLOCKS} days: deviations are mean-centered
    WITHOUT a float mean (d = m*x - S, exact ints), the cumulative
    deviation's range R and stddev S come from exact integer
    aggregates, and each block's R/S quantizes to integer e6 BEFORE
    the cross-block average so the distributed sum is order-free.
    The H estimate is the closed-form OLS slope over the three
    (ln m, ln avg R/S) points. Plan: returns window, a broadcast
    block-size fan-out (3x), per-block window + aggregate keyed by
    (symbol, m, blk) — each stage linear in days, shuffle keys grow
    with the tape so the plan rides a big cluster unchanged.

    The ln of the sum-of-doubles OLS inputs is per-symbol over
    exactly 3 rows; sums are assembled in a single partition per
    symbol both engines-side (HAVING count = 3 pins the support)."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents")
    )
    w = Window.partitionBy("symbol").orderBy("day")
    prev = F.lag("close_cents").over(w)
    rets = (
        closes.select(
            "symbol",
            F.row_number().over(w).alias("i"),
            prev.alias("prev_c"),
            F.col("close_cents").alias("c"),
        )
        .filter(F.col("prev_c").isNotNull())
        .select(
            "symbol",
            "i",  # assigned before the lag-drop filter: first retained row has i = 2
            F.floor((F.col("c") - F.col("prev_c")) * 10000.0 / F.col("prev_c") + F.lit(0.5))
            .cast("long")
            .alias("x"),
        )
    )
    ms = spark.createDataFrame([(m,) for m in _HURST_BLOCKS], "m long")
    sized = rets.crossJoin(F.broadcast(ms)).select(
        "symbol", "m", F.floor((F.col("i") - 2) / F.col("m")).cast("long").alias("blk"), "i", "x"
    )
    blocks = (
        sized.groupBy("symbol", "m", "blk")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("x").cast("decimal(38,0)").alias("s"))
        .filter(F.col("cnt") == F.col("m"))
        .drop("cnt")
    )
    dev = sized.join(blocks, ["symbol", "m", "blk"]).select(
        "symbol", "m", "blk", "i", (F.col("m") * F.col("x") - F.col("s")).alias("d")
    )
    w_cum = (
        Window.partitionBy("symbol", "m", "blk")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dev.select(
        "symbol", "m", "blk", "d", F.sum("d").over(w_cum).cast("decimal(38,0)").alias("c")
    )
    r_over_s = (
        (F.max("c") - F.min("c")).cast("double") / F.col("m")
    ) / (F.sqrt(F.sum(F.col("d") * F.col("d")).cast("double") / F.col("m")) / F.col("m"))
    rs = (
        cum.groupBy("symbol", "m", "blk")
        .agg(
            F.floor(r_over_s * 1_000_000 + F.lit(0.5)).cast("long").alias("rs_e6"),
            F.sum(F.col("d") * F.col("d")).alias("ssd"),
            F.max("c").alias("cmax"),
            F.min("c").alias("cmin"),
        )
        .filter((F.col("ssd") > 0) & (F.col("cmax") > F.col("cmin")))
    )
    avg_rs = rs.groupBy("symbol", "m").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum("rs_e6").cast("long").alias("rs_sum_e6"),
    )
    pts = avg_rs.select(
        "symbol",
        F.log(F.col("m").cast("double")).alias("lx"),
        F.log(F.col("rs_sum_e6").cast("double") / F.col("n_blocks") / 1_000_000.0).alias("ly"),
    )
    fit = (
        pts.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum("lx").alias("sx"),
            F.sum("ly").alias("sy"),
            F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
            F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        )
        .filter(F.col("k") == len(_HURST_BLOCKS))
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return fit.select(
        "symbol", F.floor(slope * 1_000_000 + F.lit(0.5)).cast("long").alias("hurst_e6")
    ).orderBy("symbol")


# --------------------------------------------------------------------------
# Brown-Forsythe test (variance homogeneity across symbols)
# --------------------------------------------------------------------------

_BF_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol,
         CAST(floor((close_cents - lag(close_cents) OVER w) * 10000.0
                    / lag(close_cents) OVER w + 0.5) AS BIGINT) AS x
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(close_cents) OVER w IS NOT NULL
),
med AS (  -- med2 = 2 * median as an exact integer (avg of the two middles)
  SELECT symbol,
         CAST(max(CASE WHEN rn = lo THEN x END)
              + max(CASE WHEN rn = hi THEN x END) AS BIGINT) AS med2
  FROM (
    SELECT symbol, x, row_number() OVER (PARTITION BY symbol ORDER BY x) AS rn,
           (count(*) OVER (PARTITION BY symbol) + 1) // 2 AS lo,
           (count(*) OVER (PARTITION BY symbol) + 2) // 2 AS hi
    FROM rets
  )
  GROUP BY symbol
),
z AS (  -- z = |2x - med2| : twice the median-centered absolute deviation, exact
  SELECT r.symbol, abs(2 * r.x - m.med2) AS z
  FROM rets r JOIN med m ON m.symbol = r.symbol
),
grp AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(z) AS HUGEINT) AS sz, CAST(sum(z * z) AS HUGEINT) AS szz
  FROM z GROUP BY symbol
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(sz) AS HUGEINT) AS sz_all
  FROM grp
),
terms AS (  -- per-group between/within terms, quantized to ints before summing
  SELECT g.symbol,
         CAST(floor(g.n * (CAST(g.sz AS DOUBLE) / g.n - CAST(t.sz_all AS DOUBLE) / t.nn)
                    * (CAST(g.sz AS DOUBLE) / g.n - CAST(t.sz_all AS DOUBLE) / t.nn)
                    * 1000 + 0.5) AS BIGINT) AS between_e3,
         CAST(floor((CAST(g.szz AS DOUBLE) - CAST(g.sz AS DOUBLE) * g.sz / g.n) * 1000 + 0.5)
           AS BIGINT) AS within_e3
  FROM grp g CROSS JOIN tot t
)
SELECT t.k AS n_groups, t.nn AS n_obs,
       CAST(floor(
         (CAST(t.nn - t.k AS DOUBLE) / (t.k - 1))
         * (CAST(sum(between_e3) AS DOUBLE) / CAST(sum(within_e3) AS DOUBLE))
         * 10000 + 0.5) AS BIGINT) AS bf_stat_e4
FROM terms CROSS JOIN tot t
GROUP BY t.k, t.nn
"""


@register("stats_brown_forsythe", oracle=_BF_ORACLE, tags=("stats",))
def stats_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test: are daily-return variances equal across
    symbols? The robust Levene variant centers on the MEDIAN, making
    it the variance-homogeneity gate to run before pooling symbols
    into one vol model (`stats_anova_oneway` compares MEANS and
    assumes this test passes). Exactness: the median is carried as
    2*median (avg of the two middle order statistics — an exact
    integer), so z = |2x - med2| is exact, and the group sums
    (n, Sz, Szz) are exact integers; the per-group between/within
    terms quantize to integer e3 BEFORE the cross-group sum, keeping
    the distributed aggregation order-free. F is assembled once at
    the end and quantized at 1e-4. Plan: returns window, a rank
    window for the median, then two tiny aggregates — group count is
    the symbol universe, so everything after the first groupBy is
    broadcast-sized at any data scale."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents")
    )
    w = Window.partitionBy("symbol").orderBy("day")
    prev = F.lag("close_cents").over(w)
    rets = (
        closes.select("symbol", prev.alias("prev_c"), F.col("close_cents").alias("c"))
        .filter(F.col("prev_c").isNotNull())
        .select(
            "symbol",
            F.floor((F.col("c") - F.col("prev_c")) * 10000.0 / F.col("prev_c") + F.lit(0.5))
            .cast("long")
            .alias("x"),
        )
    )
    w_rank = Window.partitionBy("symbol").orderBy("x")
    w_all = Window.partitionBy("symbol")
    ranked = rets.select(
        "symbol",
        "x",
        F.row_number().over(w_rank).alias("rn"),
        F.floor((F.count(F.lit(1)).over(w_all) + 1) / 2).alias("lo"),
        F.floor((F.count(F.lit(1)).over(w_all) + 2) / 2).alias("hi"),
    )
    med = ranked.groupBy("symbol").agg(
        (
            F.max(F.when(F.col("rn") == F.col("lo"), F.col("x")))
            + F.max(F.when(F.col("rn") == F.col("hi"), F.col("x")))
        )
        .cast("long")
        .alias("med2")
    )
    z = rets.join(F.broadcast(med), "symbol").select(
        "symbol", F.abs(2 * F.col("x") - F.col("med2")).alias("z")
    )
    grp = z.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("z").cast("decimal(38,0)").alias("sz"),
        F.sum(F.col("z") * F.col("z")).cast("decimal(38,0)").alias("szz"),
    )
    tot = grp.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("sz").cast("decimal(38,0)").alias("sz_all"),
    )
    gt = grp.crossJoin(F.broadcast(tot))
    zbar_g = F.col("sz").cast("double") / F.col("n")
    zbar = F.col("sz_all").cast("double") / F.col("nn")
    terms = gt.select(
        "k",
        "nn",
        F.floor(F.col("n") * (zbar_g - zbar) * (zbar_g - zbar) * 1000 + F.lit(0.5))
        .cast("long")
        .alias("between_e3"),
        F.floor(
            (F.col("szz").cast("double") - F.col("sz").cast("double") * F.col("sz") / F.col("n"))
            * 1000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("within_e3"),
    )
    f_stat = (
        (F.col("nn") - F.col("k")).cast("double")
        / (F.col("k") - 1)
        * (F.sum("between_e3").cast("double") / F.sum("within_e3").cast("double"))
    )
    return (
        terms.groupBy("k", "nn")
        .agg(F.floor(f_stat * 10_000 + F.lit(0.5)).cast("long").alias("bf_stat_e4"))
        .select(
            F.col("k").alias("n_groups"),
            F.col("nn").alias("n_obs"),
            "bf_stat_e4",
        )
    )
