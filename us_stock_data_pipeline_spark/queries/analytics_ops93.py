"""Round-101 analytics, part 93: Friedman repeated-measures rank test
and Cohen's d / Hedges' g effect sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Friedman test: do symbols rank consistently within days?
# --------------------------------------------------------------------------

_FRIEDMAN_ORACLE = """
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
-- only complete blocks (every symbol present) enter the test
full_days AS (
  SELECT day FROM rets GROUP BY day
  HAVING count(*) = (SELECT count(DISTINCT symbol) FROM rets)
),
blocked AS (SELECT r.* FROM rets r JOIN full_days f ON f.day = r.day),
-- midranks within each day carried DOUBLED (min+max row_number of the
-- tie group), the exact-integer convention the rank tests here share
ranked AS (
  SELECT symbol, day, r,
         row_number() OVER (PARTITION BY day ORDER BY r, symbol) AS rn
  FROM blocked
),
mid AS (
  SELECT symbol, day,
         min(rn) OVER (PARTITION BY day, r) + max(rn) OVER (PARTITION BY day, r)
           AS rank2
  FROM ranked
),
dims AS (
  SELECT CAST(count(DISTINCT day) AS BIGINT) AS n,
         CAST(count(DISTINCT symbol) AS BIGINT) AS k
  FROM mid
),
per_sym AS (
  SELECT symbol, CAST(sum(rank2) AS BIGINT) AS r2 FROM mid GROUP BY symbol
),
a4 AS (SELECT CAST(sum(rank2 * rank2) AS BIGINT) AS a4 FROM mid),
-- chi2_F = (k-1) * sum_j (R2_j - n(k+1))^2 / (A4 - n*k*(k+1)^2)
num AS (
  SELECT CAST(sum((p.r2 - d.n * (d.k + 1)) * (p.r2 - d.n * (d.k + 1))) AS BIGINT)
           AS ss
  FROM per_sym p CROSS JOIN dims d
)
SELECT d.n AS n_blocks, d.k AS k_treatments,
       CAST(floor((d.k - 1) * CAST(num.ss AS DOUBLE)
                  / (a4.a4 - d.n * d.k * (d.k + 1) * (d.k + 1)) * 1000 + 0.5)
         AS BIGINT) AS friedman_chi2_milli
FROM dims d, num, a4
"""


@register("stats_friedman_test", oracle=_FRIEDMAN_ORACLE, tags=("stats", "stock"))
def stats_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman repeated-measures rank test: rank the symbols' returns
    WITHIN each day (blocks), then test whether the rank sums differ
    across symbols — the nonparametric repeated-measures ANOVA, the
    right tool when the same k subjects are measured across n
    conditions (`stats_kruskal_wallis` assumes independent groups and
    is wrong for a panel where every day is a common shock; blocking
    removes it, exactly like `stats_wilcoxon_signed_rank` does for
    k=2). Tie-robust: midranks carry DOUBLED via the min+max
    row-number identity, the tie-corrected denominator uses the exact
    sum of squared ranks, and only complete blocks enter. Everything
    is exact BIGINT until one final milli-quantized division. Plan:
    one day-keyed ranking window over the calendar-bounded panel, a
    per-symbol sum, three broadcast scalars."""
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
    n_sym = rets.select(F.countDistinct("symbol").alias("k"))
    full_days = (
        rets.groupBy("day")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n_sym))
        .filter(F.col("cnt") == F.col("k"))
        .select("day")
    )
    blocked = rets.join(F.broadcast(full_days), "day")
    w_rank = Window.partitionBy("day").orderBy("r", "symbol")
    ranked = blocked.select(
        "symbol", "day", "r", F.row_number().over(w_rank).alias("rn")
    )
    w_tie = Window.partitionBy("day", "r")
    mid = ranked.select(
        "symbol",
        "day",
        (F.min("rn").over(w_tie) + F.max("rn").over(w_tie)).alias("rank2"),
    )
    dims = mid.agg(
        F.countDistinct("day").cast("long").alias("n"),
        F.countDistinct("symbol").cast("long").alias("k"),
    )
    per_sym = mid.groupBy("symbol").agg(F.sum("rank2").cast("long").alias("r2"))
    a4 = mid.agg(F.sum(F.col("rank2") * F.col("rank2")).cast("long").alias("a4"))
    num = (
        per_sym.crossJoin(F.broadcast(dims))
        .select(
            ((F.col("r2") - F.col("n") * (F.col("k") + 1))
             * (F.col("r2") - F.col("n") * (F.col("k") + 1))).alias("sq")
        )
        .agg(F.sum("sq").cast("long").alias("ss"))
    )
    return (
        dims.crossJoin(F.broadcast(num))
        .crossJoin(F.broadcast(a4))
        .select(
            F.col("n").alias("n_blocks"),
            F.col("k").alias("k_treatments"),
            F.floor(
                (F.col("k") - 1)
                * F.col("ss").cast("double")
                / (F.col("a4") - F.col("n") * F.col("k") * (F.col("k") + 1) * (F.col("k") + 1))
                * 1000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("friedman_chi2_milli"),
        )
    )


# --------------------------------------------------------------------------
# Cohen's d and Hedges' g: urgent vs standard order sizes
# --------------------------------------------------------------------------

_COHEN_ORACLE = """
WITH pts AS (
  -- whole dollars (exact cents div 100): d is unit-invariant, and the
  -- squared power sums stay inside int64 at sf0.1 and beyond
  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS g,
         CAST(round(o_totalprice * 100) AS BIGINT) // 100 AS v
  FROM orders
),
sums AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s,
         CAST(sum(v * v) AS BIGINT) AS ss
  FROM pts GROUP BY g
),
wide AS (
  SELECT max(CASE WHEN g = 1 THEN n END) AS n1, max(CASE WHEN g = 1 THEN s END) AS s1,
         max(CASE WHEN g = 1 THEN ss END) AS ss1,
         max(CASE WHEN g = 0 THEN n END) AS n2, max(CASE WHEN g = 0 THEN s END) AS s2,
         max(CASE WHEN g = 0 THEN ss END) AS ss2
  FROM sums
),
eff AS (
  SELECT n1, n2,
         (CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
         / sqrt(((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                 + (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))
                / (n1 + n2 - 2)) AS d
  FROM wide
)
SELECT CAST(n1 AS BIGINT) AS n_urgent, CAST(n2 AS BIGINT) AS n_standard,
       CAST(floor(d * 1000000 + 0.5) AS BIGINT) AS cohens_d_micro,
       CAST(floor(d * (1 - 3.0 / (4 * (n1 + n2) - 9)) * 1000000 + 0.5) AS BIGINT)
         AS hedges_g_micro
FROM eff
"""


@register("stats_cohens_d_effect", oracle=_COHEN_ORACLE, tags=("stats",))
def stats_cohens_d_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d and Hedges' g for urgent-vs-standard order sizes:
    the standardized mean difference (pooled-SD units) that
    significance tests deliberately don't report — `stats_welch_ttest`
    says whether the gap is real, d says whether it is BIG (at a
    million rows, t rejects for differences nobody cares about), and
    Hedges' g applies the small-sample bias correction
    (1 - 3/(4N - 9)). Exactness: per-group power sums are exact
    BIGINT; the pooled SD and both effect sizes assemble in pinned
    DOUBLE and quantize micro. Plan: one map-side-combinable two-group
    aggregate over the orders scan, then scalar arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    pts = o.select(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int").alias("g"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100").alias("v"),
    )
    sums = pts.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("ss"),
    )
    wide = sums.agg(
        F.max(F.when(F.col("g") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("g") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("g") == 1, F.col("ss"))).alias("ss1"),
        F.max(F.when(F.col("g") == 0, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("g") == 0, F.col("s"))).alias("s2"),
        F.max(F.when(F.col("g") == 0, F.col("ss"))).alias("ss2"),
    )
    d = (
        F.col("s1").cast("double") / F.col("n1") - F.col("s2").cast("double") / F.col("n2")
    ) / F.sqrt(
        (
            (F.col("ss1").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("n1"))
            + (F.col("ss2").cast("double") - F.col("s2").cast("double") * F.col("s2") / F.col("n2"))
        )
        / (F.col("n1") + F.col("n2") - 2)
    )
    return wide.select(
        F.col("n1").cast("long").alias("n_urgent"),
        F.col("n2").cast("long").alias("n_standard"),
        F.floor(d * 1000000 + F.lit(0.5)).cast("long").alias("cohens_d_micro"),
        F.floor(
            d * (1 - 3.0 / (4 * (F.col("n1") + F.col("n2")) - 9)) * 1000000 + F.lit(0.5)
        )
        .cast("long")
        .alias("hedges_g_micro"),
    )
