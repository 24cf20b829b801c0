"""Round-6 analytics additions, part 6: Kolmogorov-Smirnov two-sample
test (fully exact), fuzzy transaction-duplicate detection with
neighboring-bin blocking, and Holt linear-trend smoothing (recursive).

House contract: Spark-first plans, identically-aliased DuckDB oracles,
cross-row accumulation in exact integers only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register


def _round4(col):
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


# --------------------------------------------------------------------------
# Kolmogorov-Smirnov two-sample statistic (exact integer CDF comparison)
# --------------------------------------------------------------------------

_KS_ORACLE = """
WITH per_value AS (
  SELECT value,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS a1,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS a2
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY value
),
cum AS (
  SELECT value,
         sum(a1) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS c1,
         sum(a2) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS c2
  FROM per_value
),
tot AS (
  SELECT CAST(sum(a1) AS BIGINT) AS n1, CAST(sum(a2) AS BIGINT) AS n2 FROM per_value
),
ranked AS (
  SELECT value, c1, c2, tot.n1, tot.n2,
         abs(c1 * tot.n2 - c2 * tot.n1) AS d2,
         row_number() OVER (ORDER BY abs(c1 * tot.n2 - c2 * tot.n1) DESC, value) AS rn
  FROM cum, tot
)
SELECT n1, n2,
       floor(CAST(d2 AS DOUBLE) / (n1 * n2) * 10000 + 0.5) / 10000 AS d_stat,
       value AS at_value
FROM ranked WHERE rn = 1
"""


@register("stats_ks_two_sample", oracle=_KS_ORACLE, tags=("stats", "test"))
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between 'click' and
    'view' value distributions, computed EXACTLY: D = max|F1 - F2| is
    evaluated as max|c1*n2 - c2*n1| over the merged support — an
    integer comparison, so the supremum's location and value are
    engine-exact and only the final /(n1*n2) normalization is a
    double. Completes the two-sample trio (Welch t for means, MWU for
    ranks, KS for the whole CDF). Plan: one groupBy to per-value
    counts (the support is the compression — ties collapse before any
    window), one ordered cumsum window, one ranking window over the
    SAME global order, both executing in a single sort pass; at
    100 TB the support table is value-cardinality-sized, and the
    pre-aggregation is what keeps the global window feasible."""
    ev = load_table(spark, sf_dir, "events")
    per_value = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy("value")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("a1"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("long")
            .alias("a2"),
        )
    )
    w_cum = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per_value.select(
        "value",
        F.sum("a1").over(w_cum).alias("c1"),
        F.sum("a2").over(w_cum).alias("c2"),
    )
    tot = per_value.agg(
        F.sum("a1").cast("long").alias("n1"), F.sum("a2").cast("long").alias("n2")
    )
    d2 = F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
    ranked = (
        cum.crossJoin(F.broadcast(tot))
        .withColumn("d2", d2)
        .withColumn(
            "rn", F.row_number().over(Window.orderBy(F.col("d2").desc(), F.col("value")))
        )
        .filter(F.col("rn") == 1)
    )
    return ranked.select(
        "n1",
        "n2",
        _round4(F.col("d2").cast("double") / (F.col("n1") * F.col("n2"))).alias("d_stat"),
        F.col("value").alias("at_value"),
    )


# --------------------------------------------------------------------------
# Fuzzy transaction-duplicate detection (entity-resolution blocking)
# --------------------------------------------------------------------------

_FUZZ_PLANT_MOD = 500
_FUZZ_PLANT_OFFSET = 3_000_000_000
_FUZZ_CENTS_TOL = 100  # <= $1 apart
_FUZZ_DAYS_TOL = 7

_FUZZY_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey AS okey, o_custkey AS cust,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(o_orderdate AS DATE) AS od
  FROM orders
),
planted AS (
  -- double-submitted invoices: +2 days, +3 cents, new order id
  SELECT okey + {_FUZZ_PLANT_OFFSET} AS okey, cust, cents + 3 AS cents,
         od + 2 AS od
  FROM base WHERE okey % {_FUZZ_PLANT_MOD} = 0
),
corpus AS (
  SELECT * FROM base UNION ALL SELECT * FROM planted
),
probe AS (
  SELECT okey, cust, cents, od, cents // 100 + b.off AS bin,
         date_diff('day', DATE '1970-01-01', od) // 14 + f.foff AS fbin
  FROM corpus,
       (SELECT unnest([-1, 0, 1]) AS off) b,
       (SELECT unnest([-1, 0, 1]) AS foff) f
),
build AS (
  SELECT okey, cust, cents, od, cents // 100 AS bin,
         date_diff('day', DATE '1970-01-01', od) // 14 AS fbin
  FROM corpus
),
pairs AS (
  SELECT a.cust, a.okey AS okey_a, b.okey AS okey_b,
         abs(a.cents - b.cents) AS cents_diff,
         abs(date_diff('day', a.od, b.od)) AS days_apart
  FROM probe a JOIN build b ON a.cust = b.cust AND a.bin = b.bin
                            AND a.fbin = b.fbin
                            AND a.okey < b.okey
  WHERE abs(a.cents - b.cents) <= {_FUZZ_CENTS_TOL}
    AND abs(date_diff('day', a.od, b.od)) <= {_FUZZ_DAYS_TOL}
)
SELECT cust, okey_a, okey_b,
       CAST(cents_diff AS BIGINT) AS cents_diff,
       CAST(days_apart AS BIGINT) AS days_apart
FROM pairs
ORDER BY cust, okey_a, okey_b
"""


@register("dedup_fuzzy_transactions", oracle=_FUZZY_ORACLE, tags=("dedup", "join", "blocking"))
def dedup_fuzzy_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy duplicate-transaction detection — the finance-side twin of
    text near-dedup: two orders from the same customer within $1 and 7
    days are double-submission suspects. Planted duplicates (every
    500th order re-emitted +2 days/+3 cents) give the detector a known
    recall target, oracle-checked. The non-equi tolerance predicates
    become an EQUI-join by two-dimensional blocking: a dollar bucket
    (cents div 100, tolerance $1) AND a fortnight bucket (epoch-day
    div 14, tolerance 7 days). The probe side emits the {{-1, 0, +1}}
    neighbors on BOTH axes (explode factor 9) so no qualifying pair
    can straddle out of reach, and because each tolerance is <= its
    bucket grain a pair matches on exactly ONE (bin, fbin) combo — no
    dedup pass needed. Plan: one shuffle on (cust, bin, fbin); block
    size is bounded by per-(cust, dollar, fortnight) density, so a
    customer who accumulates similar-priced orders over years no
    longer yields a quadratic block (the round-5 SCALE_CURVE found
    15x wall at 10x data with the price-only key; the date axis caps
    the block at a fortnight of history)."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("cust"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderdate").cast("date").alias("od"),
    )
    planted = base.filter(F.col("okey") % _FUZZ_PLANT_MOD == 0).select(
        (F.col("okey") + _FUZZ_PLANT_OFFSET).alias("okey"),
        "cust",
        (F.col("cents") + 3).alias("cents"),
        F.date_add("od", 2).alias("od"),
    )
    corpus = base.unionByName(planted)
    epoch_day = F.datediff(F.col("od"), F.lit("1970-01-01").cast("date"))
    probe = (
        corpus.select(
            "okey",
            "cust",
            "cents",
            "od",
            F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("off"),
        )
        .select(
            "okey",
            "cust",
            "cents",
            "od",
            (F.expr("cents div 100") + F.col("off")).alias("bin"),
            F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("foff"),
        )
        .select(
            "okey",
            "cust",
            "cents",
            "od",
            "bin",
            (epoch_day.cast("long") / 14).cast("long").alias("fbin0"),
            "foff",
        )
        .select(
            "okey", "cust", "cents", "od", "bin",
            (F.col("fbin0") + F.col("foff")).alias("fbin"),
        )
    )
    build = corpus.select(
        "okey",
        "cust",
        "cents",
        "od",
        F.expr("cents div 100").alias("bin"),
        (epoch_day.cast("long") / 14).cast("long").alias("fbin"),
    )
    a, b = probe.alias("a"), build.alias("b")
    return (
        a.join(
            b,
            (F.col("a.cust") == F.col("b.cust"))
            & (F.col("a.bin") == F.col("b.bin"))
            & (F.col("a.fbin") == F.col("b.fbin"))
            & (F.col("a.okey") < F.col("b.okey")),
        )
        .filter(
            (F.abs(F.col("a.cents") - F.col("b.cents")) <= _FUZZ_CENTS_TOL)
            & (F.abs(F.datediff(F.col("a.od"), F.col("b.od"))) <= _FUZZ_DAYS_TOL)
        )
        .select(
            F.col("a.cust").alias("cust"),
            F.col("a.okey").alias("okey_a"),
            F.col("b.okey").alias("okey_b"),
            F.abs(F.col("a.cents") - F.col("b.cents")).cast("long").alias("cents_diff"),
            F.abs(F.datediff(F.col("a.od"), F.col("b.od"))).cast("long").alias("days_apart"),
        )
        .orderBy("cust", "okey_a", "okey_b")
    )


# --------------------------------------------------------------------------
# Holt linear-trend exponential smoothing (recursive kernel)
# --------------------------------------------------------------------------

_HOLT_ALPHA = 0.5  # dyadic: multiplication is exact in binary
_HOLT_BETA = 0.25

_HOLT_ORACLE = f"""
WITH RECURSIVE bars0 AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2
),
bars AS (
  SELECT symbol, day, close,
         row_number() OVER (PARTITION BY symbol ORDER BY day) AS rn
  FROM bars0
),
holt(symbol, day, close, rn, lvl, trend) AS (
  SELECT symbol, day, close, rn, close, CAST(0 AS DOUBLE) FROM bars WHERE rn = 1
  UNION ALL
  SELECT b.symbol, b.day, b.close, b.rn,
         {_HOLT_ALPHA} * b.close + {1 - _HOLT_ALPHA} * (h.lvl + h.trend),
         {_HOLT_BETA} * (({_HOLT_ALPHA} * b.close + {1 - _HOLT_ALPHA} * (h.lvl + h.trend)) - h.lvl)
           + {1 - _HOLT_BETA} * h.trend
  FROM bars b JOIN holt h ON b.symbol = h.symbol AND b.rn = h.rn + 1
)
SELECT symbol, day, round(close, 4) AS close,
       round(lvl, 4) AS level, round(trend, 4) AS trend,
       round(lvl + trend, 4) AS forecast_next
FROM holt
ORDER BY symbol, day
"""


@register("timeseries_holt_linear", oracle=_HOLT_ORACLE, tags=("timeseries", "udf", "recursive"))
def timeseries_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend double exponential smoothing over daily
    closes — level AND trend recursions, the next rung past `bars_ema`
    on the ladder of operators Spark's window frames genuinely cannot
    express (each state depends on the previous row's TWO outputs).
    Same architecture: one shuffle on the series key, applyInPandas
    kernel per series, the recursion written as explicit arithmetic
    bit-identical to the oracle's recursive CTE — with dyadic
    smoothing constants (alpha=.5, beta=.25) whose products are exact
    in binary, removing even theoretical drift between engines. The
    one-step forecast (level + trend) rides out as a column; a
    production forecaster extends the same kernel, not the plan."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.max_by("value", "event_id").alias("close"))

    def holt_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        lvls = [0.0] * len(pdf)
        trends = [0.0] * len(pdf)
        lvl = trend = None
        for i, x in enumerate(pdf["close"]):
            if lvl is None:
                lvl, trend = x, 0.0
            else:
                new_lvl = _HOLT_ALPHA * x + (1 - _HOLT_ALPHA) * (lvl + trend)
                trend = _HOLT_BETA * (new_lvl - lvl) + (1 - _HOLT_BETA) * trend
                lvl = new_lvl
            lvls[i], trends[i] = lvl, trend
        pdf["lvl"], pdf["trend"] = lvls, trends
        return pdf[["symbol", "day", "close", "lvl", "trend"]]

    out_schema = "symbol string, day date, close double, lvl double, trend double"
    return (
        daily.groupBy("symbol")
        .applyInPandas(holt_kernel, out_schema)
        .select(
            "symbol",
            "day",
            F.round("close", 4).alias("close"),
            F.round("lvl", 4).alias("level"),
            F.round("trend", 4).alias("trend"),
            F.round(F.col("lvl") + F.col("trend"), 4).alias("forecast_next"),
        )
        .orderBy("symbol", "day")
    )
