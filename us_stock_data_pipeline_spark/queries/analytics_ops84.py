"""Round-90 analytics, part 84: Granger causality (1-lag F-test) and
the Qini uplift curve by score decile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Granger causality: does x's lagged return help predict y's return?
# --------------------------------------------------------------------------

_GRANGER_ORACLE = """
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
paired AS (
  SELECT a.symbol AS sy, b.symbol AS sx, a.day, a.r AS y, b.r AS x
  FROM rets a JOIN rets b ON b.day = a.day AND b.symbol <> a.symbol
),
rows_ AS (
  SELECT sy, sx, y,
         lag(y) OVER w AS y1, lag(x) OVER w AS x1
  FROM paired WINDOW w AS (PARTITION BY sy, sx ORDER BY day)
  QUALIFY lag(y) OVER w IS NOT NULL
),
sums AS (
  SELECT sy, sx, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS s_y, CAST(sum(y1) AS BIGINT) AS s_1,
         CAST(sum(x1) AS BIGINT) AS s_2,
         CAST(sum(y1 * y1) AS BIGINT) AS s_11, CAST(sum(x1 * x1) AS BIGINT) AS s_22,
         CAST(sum(y1 * x1) AS BIGINT) AS s_12,
         CAST(sum(y * y) AS BIGINT) AS s_yy,
         CAST(sum(y * y1) AS BIGINT) AS s_1y, CAST(sum(y * x1) AS BIGINT) AS s_2y
  FROM rows_ GROUP BY sy, sx
),
-- centered moments in DOUBLE (pinned) from exact BIGINT power sums
cent AS (
  SELECT sy, sx, n,
         CAST(s_yy AS DOUBLE) - CAST(s_y AS DOUBLE) * s_y / n AS cyy,
         CAST(s_11 AS DOUBLE) - CAST(s_1 AS DOUBLE) * s_1 / n AS c11,
         CAST(s_22 AS DOUBLE) - CAST(s_2 AS DOUBLE) * s_2 / n AS c22,
         CAST(s_12 AS DOUBLE) - CAST(s_1 AS DOUBLE) * s_2 / n AS c12,
         CAST(s_1y AS DOUBLE) - CAST(s_1 AS DOUBLE) * s_y / n AS c1y,
         CAST(s_2y AS DOUBLE) - CAST(s_2 AS DOUBLE) * s_y / n AS c2y
  FROM sums
),
fits AS (
  SELECT sy, sx, n,
         cyy - c1y * c1y / c11 AS sse_restricted,
         -- 2-regressor OLS by the 2x2 closed form
         cyy - ((c1y * c22 - c2y * c12) * c1y + (c2y * c11 - c1y * c12) * c2y)
               / (c11 * c22 - c12 * c12) AS sse_full
  FROM cent
)
SELECT sy AS symbol_y, sx AS symbol_x, n AS n_obs,
       CAST(floor(sse_restricted + 0.5) AS BIGINT) AS sse_restricted,
       CAST(floor(sse_full + 0.5) AS BIGINT) AS sse_full,
       CAST(floor((sse_restricted - sse_full) / (sse_full / (n - 3)) * 1000 + 0.5)
         AS BIGINT) AS granger_f_milli
FROM fits
ORDER BY symbol_y, symbol_x
"""


@register("timeseries_granger_causality", oracle=_GRANGER_ORACLE, tags=("timeseries", "stats", "causal"))
def timeseries_granger_causality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger causality at lag 1 for every directed symbol pair: does
    adding x's lagged return to y's own lag shrink the prediction SSE?
    F = (SSE_restricted - SSE_full) / (SSE_full / (n-3)) — the
    standard lead-lag PREDICTIVE test, stronger than the raw lagged
    correlation of `timeseries_cross_correlation` because it partials
    out y's own autocorrelation first. The 2-regressor OLS solves the
    2x2 normal equations in closed form from ten exact BIGINT power
    sums; all float assembly is pinned-association DOUBLE quantized
    once. Plan: one same-day self-join of the per-symbol return table
    (calendar-bounded), one lag window per directed pair, one grouped
    aggregate — the fact tape is touched once."""
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
    b = rets.select(
        F.col("symbol").alias("sx"), F.col("day").alias("day_b"), F.col("r").alias("x")
    )
    paired = rets.join(
        b, (F.col("day_b") == F.col("day")) & (F.col("sx") != F.col("symbol"))
    ).select(F.col("symbol").alias("sy"), "sx", "day", F.col("r").alias("y"), "x")
    w_p = Window.partitionBy("sy", "sx").orderBy("day")
    rows_ = (
        paired.select(
            "sy",
            "sx",
            "y",
            F.lag("y").over(w_p).alias("y1"),
            F.lag("x").over(w_p).alias("x1"),
        )
        .filter(F.col("y1").isNotNull())
    )
    sums = rows_.groupBy("sy", "sx").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s_y"),
        F.sum("y1").cast("long").alias("s_1"),
        F.sum("x1").cast("long").alias("s_2"),
        F.sum(F.col("y1") * F.col("y1")).cast("long").alias("s_11"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("s_22"),
        F.sum(F.col("y1") * F.col("x1")).cast("long").alias("s_12"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("s_yy"),
        F.sum(F.col("y") * F.col("y1")).cast("long").alias("s_1y"),
        F.sum(F.col("y") * F.col("x1")).cast("long").alias("s_2y"),
    )
    n = F.col("n")

    def c(ab: str, a: str, bb: str) -> F.Column:
        return F.col(ab).cast("double") - F.col(a).cast("double") * F.col(bb) / n

    cent = sums.select(
        "sy",
        "sx",
        "n",
        c("s_yy", "s_y", "s_y").alias("cyy"),
        c("s_11", "s_1", "s_1").alias("c11"),
        c("s_22", "s_2", "s_2").alias("c22"),
        c("s_12", "s_1", "s_2").alias("c12"),
        c("s_1y", "s_1", "s_y").alias("c1y"),
        c("s_2y", "s_2", "s_y").alias("c2y"),
    )
    sse_r = F.col("cyy") - F.col("c1y") * F.col("c1y") / F.col("c11")
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    sse_f = F.col("cyy") - (
        (F.col("c1y") * F.col("c22") - F.col("c2y") * F.col("c12")) * F.col("c1y")
        + (F.col("c2y") * F.col("c11") - F.col("c1y") * F.col("c12")) * F.col("c2y")
    ) / det
    fits = cent.select("sy", "sx", "n", sse_r.alias("sse_r"), sse_f.alias("sse_f"))
    return fits.select(
        F.col("sy").alias("symbol_y"),
        F.col("sx").alias("symbol_x"),
        F.col("n").alias("n_obs"),
        F.floor(F.col("sse_r") + F.lit(0.5)).cast("long").alias("sse_restricted"),
        F.floor(F.col("sse_f") + F.lit(0.5)).cast("long").alias("sse_full"),
        F.floor(
            (F.col("sse_r") - F.col("sse_f")) / (F.col("sse_f") / (F.col("n") - 3)) * 1000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("granger_f_milli"),
    ).orderBy("symbol_y", "symbol_x")


# --------------------------------------------------------------------------
# Qini uplift curve by score decile
# --------------------------------------------------------------------------

_QINI_ORACLE = """
WITH pts AS (
  -- treatment: user-id parity (synthetic assignment, documented);
  -- outcome: purchase event; score: event value (ranking signal)
  SELECT CAST(user_id % 2 AS BIGINT) AS t,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv,
         CAST(round(value * 100) AS BIGINT) AS score,
         event_id
  FROM events
),
ranked AS (
  SELECT t, conv,
         ntile(10) OVER (ORDER BY score DESC, event_id) AS decile
  FROM pts
),
per AS (
  SELECT decile,
         CAST(sum(t) AS BIGINT) AS nt,
         CAST(count(*) - sum(t) AS BIGINT) AS nc,
         CAST(sum(t * conv) AS BIGINT) AS ct,
         CAST(sum((1 - t) * conv) AS BIGINT) AS cc
  FROM ranked GROUP BY decile
),
cum AS (
  SELECT decile,
         sum(nt) OVER o AS nt_cum, sum(nc) OVER o AS nc_cum,
         sum(ct) OVER o AS ct_cum, sum(cc) OVER o AS cc_cum
  FROM per WINDOW o AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(nt_cum AS BIGINT) AS nt_cum, CAST(nc_cum AS BIGINT) AS nc_cum,
       CAST(ct_cum AS BIGINT) AS conv_t_cum, CAST(cc_cum AS BIGINT) AS conv_c_cum,
       -- Qini(k) = ct_cum - cc_cum * nt_cum/nc_cum, micro-quantized
       CAST(floor((CAST(ct_cum AS DOUBLE)
                   - CAST(cc_cum AS DOUBLE) * nt_cum / nc_cum) * 1000000 + 0.5)
         AS BIGINT) AS qini_micro
FROM cum
ORDER BY decile
"""


@register("ml_qini_uplift_curve", oracle=_QINI_ORACLE, tags=("ml", "causal", "eval"))
def ml_qini_uplift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini uplift curve by score decile: rank the population by a
    targeting score, then at each cumulative decile compare treated
    conversions against control conversions scaled to the treated
    exposure — Qini(k) = CT_k - CC_k x NT_k/NC_k — the standard
    evaluation for UPLIFT models, which `ml_lift_deciles` cannot
    provide because plain lift ignores the counterfactual control arm
    (a model that targets sure-things scores high on lift and zero on
    Qini). Treatment is user-id parity — synthetic assignment,
    documented, exercising the full curve arithmetic. Exactness: all
    counts are exact integers off one pass; the exposure scaling is
    the only division, pinned DOUBLE quantized micro. Plan: one ntile
    window (global sort — the rank-metric caveat `ml_auc_roc` shares),
    one grouped count, one 10-row cumulative window."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        (F.col("user_id") % 2).cast("long").alias("t"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
        F.round(F.col("value") * 100).cast("long").alias("score"),
        "event_id",
    )
    w_rank = Window.orderBy(F.col("score").desc(), "event_id")
    ranked = pts.select("t", "conv", F.ntile(10).over(w_rank).alias("decile"))
    per = ranked.groupBy("decile").agg(
        F.sum("t").cast("long").alias("nt"),
        (F.count(F.lit(1)) - F.sum("t")).cast("long").alias("nc"),
        F.sum(F.col("t") * F.col("conv")).cast("long").alias("ct"),
        F.sum((1 - F.col("t")) * F.col("conv")).cast("long").alias("cc"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per.select(
        "decile",
        F.sum("nt").over(w_cum).alias("nt_cum"),
        F.sum("nc").over(w_cum).alias("nc_cum"),
        F.sum("ct").over(w_cum).alias("ct_cum"),
        F.sum("cc").over(w_cum).alias("cc_cum"),
    )
    return cum.select(
        F.col("decile").cast("long").alias("decile"),
        F.col("nt_cum").cast("long").alias("nt_cum"),
        F.col("nc_cum").cast("long").alias("nc_cum"),
        F.col("ct_cum").cast("long").alias("conv_t_cum"),
        F.col("cc_cum").cast("long").alias("conv_c_cum"),
        F.floor(
            (
                F.col("ct_cum").cast("double")
                - F.col("cc_cum").cast("double") * F.col("nt_cum") / F.col("nc_cum")
            )
            * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("qini_micro"),
    ).orderBy("decile")
