"""Round-94 analytics, part 88: Wilcoxon signed-rank test vs the
market and the TRIN (Arms index) breadth gauge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Wilcoxon signed-rank: does each symbol beat the equal-weight market?
# --------------------------------------------------------------------------

_WSR_ORACLE = """
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
  SELECT day, CAST(sum(r) AS BIGINT) AS mr, CAST(count(*) AS BIGINT) AS k
  FROM rets GROUP BY day
),
-- paired difference scaled by k (exact int, rank- and sign-preserving)
diffs AS (
  SELECT r.symbol, r.r * m.k - m.mr AS d
  FROM rets r JOIN mkt m ON m.day = r.day
  WHERE r.r * m.k - m.mr <> 0
),
-- midranks of |d| carried DOUBLED: 2*rank = 2*row_number averaged over
-- ties = (first_rn + last_rn) of the tie group, exact integers
ranked AS (
  SELECT symbol, d, abs(d) AS ad,
         row_number() OVER (PARTITION BY symbol ORDER BY abs(d), d) AS rn
  FROM diffs
),
mid AS (
  SELECT symbol, d, ad, min(rn) OVER g + max(rn) OVER g AS rank2
  FROM ranked
  WINDOW g AS (PARTITION BY symbol, ad)
),
sums AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN d > 0 THEN rank2 ELSE 0 END) AS BIGINT) AS wplus2,
         -- tie correction: sum over tie groups of (t^3 - t), via the
         -- per-row identity sum(t^2 - 1) over members of each group
         CAST(sum(tcnt * tcnt - 1) AS BIGINT) AS tie_cubic
  FROM (SELECT symbol, d, rank2, count(*) OVER (PARTITION BY symbol, ad) AS tcnt
        FROM mid)
  GROUP BY symbol
)
SELECT symbol, n AS n_pairs, wplus2,
       -- z = (W+ - n(n+1)/4) / sqrt(n(n+1)(2n+1)/24 - tie_cubic/48), with
       -- W+ carried at 2x so the numerator doubles
       CAST(floor((CAST(wplus2 AS DOUBLE) - CAST(n AS DOUBLE) * (n + 1) / 2)
                  / (2 * sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24
                              - CAST(tie_cubic AS DOUBLE) / 48))
                  * 1000 + 0.5) AS BIGINT) AS z_milli
FROM sums
ORDER BY symbol
"""


@register("stats_wilcoxon_signed_rank", oracle=_WSR_ORACLE, tags=("stats", "stock"))
def stats_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test per symbol against the equal-weight
    market: rank the |paired differences|, sum the ranks of positive
    days, and compare to the null mean n(n+1)/4 — the PAIRED
    nonparametric test (`stats_mannwhitney_u` handles independent
    groups; pairing by day removes the common market factor first, a
    far sharper question). Exactness: differences scale by the symbol
    count instead of dividing (rank- and sign-preserving exact ints);
    midranks carry DOUBLED via the min+max row-number identity over
    tie groups; zero differences drop per the standard definition; the
    tie-corrected variance term sums (t^2-1) per member — all exact
    BIGINT until one final z assembly. Plan: returns once, a per-day
    market aggregate (symbol-count-sized), two windows over the
    paired table, one grouped reduce."""
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
        F.sum("r").cast("long").alias("mr"), F.count(F.lit(1)).cast("long").alias("k")
    )
    diffs = (
        rets.join(mkt, "day")
        .select("symbol", (F.col("r") * F.col("k") - F.col("mr")).alias("d"))
        .filter(F.col("d") != 0)
    )
    w_rank = Window.partitionBy("symbol").orderBy(F.abs("d"), "d")
    ranked = diffs.select("symbol", "d", F.abs("d").alias("ad"), F.row_number().over(w_rank).alias("rn"))
    w_tie = Window.partitionBy("symbol", "ad")
    mid = ranked.select(
        "symbol",
        "d",
        (F.min("rn").over(w_tie) + F.max("rn").over(w_tie)).alias("rank2"),
        F.count(F.lit(1)).over(w_tie).alias("tcnt"),
    )
    sums = mid.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("d") > 0, F.col("rank2")).otherwise(0)).cast("long").alias("wplus2"),
        F.sum(F.col("tcnt") * F.col("tcnt") - 1).cast("long").alias("tie_cubic"),
    )
    nD = F.col("n").cast("double")
    z = (F.col("wplus2").cast("double") - nD * (F.col("n") + 1) / 2) / (
        2
        * F.sqrt(
            nD * (F.col("n") + 1) * (2 * F.col("n") + 1) / 24
            - F.col("tie_cubic").cast("double") / 48
        )
    )
    return sums.select(
        "symbol",
        F.col("n").alias("n_pairs"),
        "wplus2",
        F.floor(z * 1000 + F.lit(0.5)).cast("long").alias("z_milli"),
    ).orderBy("symbol")


# --------------------------------------------------------------------------
# TRIN (Arms index): breadth vs volume-breadth per day
# --------------------------------------------------------------------------

_TRIN_ORACLE = """
WITH bars AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c,
         CAST(count(*) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
signed AS (
  SELECT symbol, day, v,
         CASE WHEN c > lag(c) OVER w THEN 1
              WHEN c < lag(c) OVER w THEN -1 ELSE 0 END AS dir
  FROM bars WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(c) OVER w IS NOT NULL
),
daily AS (
  SELECT day,
         CAST(sum(CASE WHEN dir = 1 THEN 1 ELSE 0 END) AS BIGINT) AS adv,
         CAST(sum(CASE WHEN dir = -1 THEN 1 ELSE 0 END) AS BIGINT) AS decl,
         CAST(sum(CASE WHEN dir = 1 THEN v ELSE 0 END) AS BIGINT) AS adv_vol,
         CAST(sum(CASE WHEN dir = -1 THEN v ELSE 0 END) AS BIGINT) AS decl_vol
  FROM signed GROUP BY day
)
SELECT day, adv, decl, adv_vol, decl_vol,
       CAST(CASE WHEN decl = 0 OR adv_vol = 0 THEN -1
                 ELSE adv * decl_vol * 1000 // (decl * adv_vol) END AS BIGINT)
         AS trin_milli
FROM daily
ORDER BY day
"""


@register("bars_trin_arms_index", oracle=_TRIN_ORACLE, tags=("stock", "breadth"))
def bars_trin_arms_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRIN (Arms index) per day: (advancers/decliners) divided by
    (advancing volume/declining volume) — the market-breadth gauge
    that flags when a rally is carried by few heavy names (TRIN > 1:
    more volume per decliner, distribution under the surface;
    `bars_equal_weight_index` tracks breadth in LEVELS, TRIN reads its
    volume confirmation). Rewritten multiplication-only: adv x
    decl_vol / (decl x adv_vol), quantized to milli with positive
    integer division; zero-denominator days emit the -1 sentinel.
    Unchanged symbols count in neither side, per the convention.
    Plan: daily rollup with one lag window, then a per-day aggregate
    over the symbol panel — two calendar-bounded shuffles."""
    ev = load_table(spark, sf_dir, "events")
    bars = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    w = Window.partitionBy("symbol").orderBy("day")
    prev = F.lag("c").over(w)
    signed = (
        bars.select(
            "symbol",
            "day",
            "v",
            F.when(F.col("c") > prev, 1).when(F.col("c") < prev, -1).otherwise(0).alias("dir"),
            prev.alias("p"),
        )
        .filter(F.col("p").isNotNull())
    )
    daily = signed.groupBy("day").agg(
        F.sum(F.when(F.col("dir") == 1, 1).otherwise(0)).cast("long").alias("adv"),
        F.sum(F.when(F.col("dir") == -1, 1).otherwise(0)).cast("long").alias("decl"),
        F.sum(F.when(F.col("dir") == 1, F.col("v")).otherwise(0)).cast("long").alias("adv_vol"),
        F.sum(F.when(F.col("dir") == -1, F.col("v")).otherwise(0)).cast("long").alias("decl_vol"),
    )
    return daily.select(
        "day",
        "adv",
        "decl",
        "adv_vol",
        "decl_vol",
        F.when((F.col("decl") == 0) | (F.col("adv_vol") == 0), F.lit(-1))
        .otherwise(F.expr("adv * decl_vol * 1000 div (decl * adv_vol)"))
        .cast("long")
        .alias("trin_milli"),
    ).orderBy("day")
