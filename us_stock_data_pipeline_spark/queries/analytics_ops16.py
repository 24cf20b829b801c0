"""Round-7 analytics additions, part 16: multi-window error-budget
burn rates and explicit percentile conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Multi-window error-budget burn rate (SRE paging policy)
# --------------------------------------------------------------------------

# SLO: 95% non-error -> budget 1/20 of events. Page when the short
# window burns > 6x budget AND the long window > 3x (both directions of
# the classic multiwindow policy: fast-burn catch + flap suppression).
_BURN_SHORT_US = 6 * 3_600_000_000
_BURN_LONG_US = 24 * 3_600_000_000

_BURN_ORACLE = f"""
WITH base AS (
  SELECT epoch_us(ts) // {_BURN_SHORT_US} AS w_short,
         epoch_us(ts) // {_BURN_LONG_US} AS w_long,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
  FROM events
),
short_w AS (
  SELECT w_short, min(w_long) AS w_long,
         CAST(count(*) AS BIGINT) AS n_short,
         CAST(sum(is_err) AS BIGINT) AS err_short
  FROM base GROUP BY w_short
),
long_w AS (
  SELECT w_long, CAST(count(*) AS BIGINT) AS n_long,
         CAST(sum(is_err) AS BIGINT) AS err_long
  FROM base GROUP BY w_long
)
SELECT make_timestamp(s.w_short * {_BURN_SHORT_US}) AS window_start,
       s.n_short, s.err_short, l.n_long, l.err_long,
       floor(CAST(s.err_short AS DOUBLE) / s.n_short * 20 * 10000 + 0.5) / 10000
         AS burn_short,
       floor(CAST(l.err_long AS DOUBLE) / l.n_long * 20 * 10000 + 0.5) / 10000
         AS burn_long,
       (s.err_short * 20 > 6 * s.n_short AND l.err_long * 20 > 3 * l.n_long)
         AS page
FROM short_w s JOIN long_w l ON l.w_long = s.w_long
ORDER BY window_start
"""


@register("events_error_budget_burn", oracle=_BURN_ORACLE, tags=("analytics", "alerting"))
def events_error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window error-budget burn rate — the SRE paging policy:
    burn = error_rate / budget (SLO 95% -> budget 1/20), and a page
    fires only when the 6h window burns >6x AND the covering 24h
    window >3x, so a fast spike pages quickly while a brief blip
    can't (`stream_error_rate_alert` is single-window; real paging
    policies are multi-window exactly to kill the flapping that
    `events_alert_debounce` then suppresses). Both burn tests are
    exact integer cross-multiplications (err*20 > k*n). Two window
    aggregations over aligned integer time buckets (the 24h bucket is
    derivable from the 6h bucket, so the join is on a tiny
    window-count table), all map-side combinable."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.expr(f"unix_micros(ts) div {_BURN_SHORT_US}").alias("w_short"),
        F.expr(f"unix_micros(ts) div {_BURN_LONG_US}").alias("w_long"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("is_err"),
    )
    short_w = base.groupBy("w_short").agg(
        F.min("w_long").alias("w_long"),
        F.count(F.lit(1)).cast("long").alias("n_short"),
        F.sum("is_err").cast("long").alias("err_short"),
    )
    long_w = base.groupBy("w_long").agg(
        F.count(F.lit(1)).cast("long").alias("n_long"),
        F.sum("is_err").cast("long").alias("err_long"),
    )

    def r4(c):
        return F.floor(c * 10000 + F.lit(0.5)) / 10000

    return (
        short_w.join(long_w, "w_long")
        .select(
            F.timestamp_micros(F.col("w_short") * _BURN_SHORT_US).alias(
                "window_start"
            ),
            "n_short",
            "err_short",
            "n_long",
            "err_long",
            r4(F.col("err_short").cast("double") / F.col("n_short") * 20).alias(
                "burn_short"
            ),
            r4(F.col("err_long").cast("double") / F.col("n_long") * 20).alias(
                "burn_long"
            ),
            (
                (F.col("err_short") * 20 > 6 * F.col("n_short"))
                & (F.col("err_long") * 20 > 3 * F.col("n_long"))
            ).alias("page"),
        )
        .orderBy("window_start")
    )


# --------------------------------------------------------------------------
# Percentile conventions: DISC vs CONT, spelled out rank-exactly
# --------------------------------------------------------------------------

_PCTL_PS = (50, 90)

_PCTL_ORACLE = """
WITH ranked AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       CAST(max(CASE WHEN rn * 2 <= n THEN cents END) AS BIGINT) AS p50_disc,
       floor((max(CASE WHEN rn = CAST(floor((n - 1) * 0.5) AS BIGINT) + 1
                       THEN cents END)
                * (1 - ((max(n) - 1) * 0.5 - floor((max(n) - 1) * 0.5)))
              + coalesce(max(CASE WHEN rn = CAST(floor((n - 1) * 0.5) AS BIGINT) + 2
                             THEN cents END), 0)
                * ((max(n) - 1) * 0.5 - floor((max(n) - 1) * 0.5)))
             * 100 + 0.5) / 100 AS p50_cont,
       CAST(max(CASE WHEN rn * 10 <= n * 9 THEN cents END) AS BIGINT) AS p90_disc,
       floor((max(CASE WHEN rn = CAST(floor((n - 1) * 0.9) AS BIGINT) + 1
                       THEN cents END)
                * (1 - ((max(n) - 1) * 0.9 - floor((max(n) - 1) * 0.9)))
              + coalesce(max(CASE WHEN rn = CAST(floor((n - 1) * 0.9) AS BIGINT) + 2
                             THEN cents END), 0)
                * ((max(n) - 1) * 0.9 - floor((max(n) - 1) * 0.9)))
             * 100 + 0.5) / 100 AS p90_cont
FROM ranked
GROUP BY event_type
ORDER BY event_type
"""


@register("agg_percentile_disc_cont", oracle=_PCTL_ORACLE, tags=("agg", "stats"))
def agg_percentile_disc_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_DISC vs PERCENTILE_CONT, spelled out rank-exactly:
    DISC picks the largest value in the lowest ceil(p*n) ranks (an
    integer cross-multiplied test — no float), CONT linearly
    interpolates at h = (n-1)p between ranks floor(h)+1 and
    floor(h)+2. Engines' BUILT-IN percentile functions differ in tie
    and interpolation conventions — which is exactly why this
    operator derives both from row_number arithmetic instead, making
    the convention explicit and portable (`agg_percentiles` uses the
    built-ins; this is the convention-pinned twin an auditor can read
    off the query). One rank window, one conditional-aggregate pass —
    same single shuffle as any per-group percentile."""
    ev = load_table(spark, sf_dir, "events")
    wp = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.row_number().over(wp.orderBy("value", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )

    def disc(p_num: int, p_den: int, name: str):
        return (
            F.max(
                F.when(F.col("rn") * p_den <= F.col("n") * p_num, F.col("cents"))
            )
            .cast("long")
            .alias(name)
        )

    def cont(p: float, name: str):
        # rank tests run on per-row n INSIDE the aggregates; the
        # interpolation weights reference the group-constant n through
        # max() so they are legal aggregate expressions
        row_lo = F.floor((F.col("n") - 1) * p).cast("long")
        h = (F.max("n") - 1) * p
        frac = h - F.floor(h)
        v_lo = F.max(F.when(F.col("rn") == row_lo + 1, F.col("cents")))
        v_hi = F.coalesce(
            F.max(F.when(F.col("rn") == row_lo + 2, F.col("cents"))),
            F.lit(0),
        )
        return (
            F.floor((v_lo * (1 - frac) + v_hi * frac) * 100 + F.lit(0.5)) / 100
        ).alias(name)

    return (
        ranked.groupBy("event_type")
        .agg(
            disc(1, 2, "p50_disc"),
            cont(0.5, "p50_cont"),
            disc(9, 10, "p90_disc"),
            cont(0.9, "p90_cont"),
        )
        .orderBy("event_type")
    )
