"""Round-100 analytics, part 92: Holt-Winters additive seasonal
smoothing (triple coupled recursion, exact integer state) and
peak-to-average load ratio.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Holt-Winters additive (m=7, alpha=1/5, beta=1/10, gamma=3/10)
# --------------------------------------------------------------------------

_HW_M = 7

# seasonal state carries as 7 explicit columns rotated by phase; all
# updates are integer with truncating division (Spark div == DuckDB //
# for the negative-capable level/trend/seasonal deltas)
_HW_SEAS_COLS = ", ".join(f"s{i}" for i in range(_HW_M))


def _hw_step_sql() -> str:
    """The recursive step's update expressions (shared shape)."""
    upd = []
    for i in range(_HW_M):
        upd.append(
            f"CASE WHEN (s.t - 1) % {_HW_M} = {i} "
            f"THEN (3 * (s.y - s.lnew) + 7 * s.s{i}) // 10 ELSE s.s{i} END"
        )
    return ", ".join(upd)


_HW_ORACLE = f"""
WITH RECURSIVE closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT symbol, day, y,
         row_number() OVER (PARTITION BY symbol ORDER BY day) AS t
  FROM closes
),
init AS (
  -- level seeds as the mean of the first season; seasonals as the
  -- deviations from it; trend seeds at zero
  SELECT symbol,
         CAST(sum(CASE WHEN t <= {_HW_M} THEN y ELSE 0 END) // {_HW_M} AS BIGINT) AS l0,
         {", ".join(f"CAST(max(CASE WHEN t = {i + 1} THEN y END) - sum(CASE WHEN t <= {_HW_M} THEN y ELSE 0 END) // {_HW_M} AS BIGINT) AS s{i}" for i in range(_HW_M))}
  FROM idx GROUP BY symbol
),
hw(symbol, t, l, b, {_HW_SEAS_COLS}, fitted, resid) AS (
  SELECT symbol, {_HW_M}, l0, 0, {_HW_SEAS_COLS},
         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
  FROM init
  UNION ALL
  SELECT s.symbol, s.t, s.lnew,
         ((s.lnew - s.l) + 9 * s.b) // 10,
         {_hw_step_sql()},
         s.fitted, s.y - s.fitted
  FROM (
    SELECT h.symbol, b.t, b.y, h.l, h.b, {", ".join(f"h.s{i}" for i in range(_HW_M))},
           h.l + h.b + CASE (b.t - 1) % {_HW_M}
             {" ".join(f"WHEN {i} THEN h.s{i}" for i in range(_HW_M))} END AS fitted,
           ((b.y - CASE (b.t - 1) % {_HW_M}
             {" ".join(f"WHEN {i} THEN h.s{i}" for i in range(_HW_M))} END)
            + 4 * (h.l + h.b)) // 5 AS lnew
    FROM hw h JOIN idx b ON b.symbol = h.symbol AND b.t = h.t + 1
  ) s
)
SELECT hw.symbol, i.day,
       CAST(hw.l AS BIGINT) AS level_c, CAST(hw.b AS BIGINT) AS trend_c,
       CAST(hw.fitted AS BIGINT) AS fitted_c, CAST(hw.resid AS BIGINT) AS resid_c
FROM hw JOIN idx i ON i.symbol = hw.symbol AND i.t = hw.t
WHERE hw.t > {_HW_M}
ORDER BY hw.symbol, i.day
"""


@register(
    "timeseries_holt_winters_additive",
    oracle=_HW_ORACLE,
    tags=("timeseries", "udf", "recursive", "forecast"),
)
def timeseries_holt_winters_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive seasonal smoothing (period {_HW_M},
    alpha=1/5, beta=1/10, gamma=3/10): level, trend, AND a rotating
    {_HW_M}-slot seasonal state update together each step — the
    triple coupled recursion behind every seasonal exponential
    forecaster (`timeseries_holt_linear` has no seasonal state;
    `forecast_eval_seasonal_naive` has no smoothing). THREE mutually
    recursive state variables are far beyond window frames, so the
    engine runs an applyInPandas kernel; the oracle carries the
    seasonal ring as seven explicit recursive-CTE columns rotated by
    phase arithmetic. Exactness: the smoothing fractions are exact
    rationals wired as integer multiply-then-truncating-divide (Spark
    `div` == DuckDB `//` on the negative-capable deltas), so all
    three states stay exact BIGINT forever. Emits one-step-ahead
    fitted values and residuals from the first post-warmup bar. One
    symbol shuffle; O(m) state per series."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("y"))

    def trunc_div(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    def hw_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        ys = [int(v) for v in pdf["y"]]
        m = _HW_M
        if len(ys) <= m:
            return pd.DataFrame(
                columns=["symbol", "day", "level_c", "trend_c", "fitted_c", "resid_c"]
            )
        l = sum(ys[:m]) // m
        b = 0
        s = [ys[i] - l for i in range(m)]
        out = []
        for t in range(m + 1, len(ys) + 1):
            y = ys[t - 1]
            p = (t - 1) % m
            fitted = l + b + s[p]
            lnew = trunc_div((y - s[p]) + 4 * (l + b), 5)
            bnew = trunc_div((lnew - l) + 9 * b, 10)
            s[p] = trunc_div(3 * (y - lnew) + 7 * s[p], 10)
            l, b = lnew, bnew
            out.append((pdf["day"].iloc[t - 1], l, b, fitted, y - fitted))
        res = pd.DataFrame(out, columns=["day", "level_c", "trend_c", "fitted_c", "resid_c"])
        res.insert(0, "symbol", pdf["symbol"].iloc[0])
        return res

    out_schema = (
        "symbol string, day date, level_c long, trend_c long, fitted_c long, resid_c long"
    )
    return (
        closes.groupBy("symbol")
        .applyInPandas(hw_kernel, out_schema)
        .orderBy("symbol", "day")
    )


# --------------------------------------------------------------------------
# Peak-to-average load ratio per event type
# --------------------------------------------------------------------------

_PAR_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_hours,
       CAST(sum(n) AS BIGINT) AS total_events,
       CAST(max(n) AS BIGINT) AS peak_hour_events,
       -- PAR = peak / mean over ACTIVE hours, milli-quantized
       CAST(max(n) * count(*) * 1000 // sum(n) AS BIGINT) AS par_milli
FROM hourly
GROUP BY event_type
ORDER BY event_type
"""


@register("events_peak_to_average", oracle=_PAR_ORACLE, tags=("events", "capacity"))
def events_peak_to_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-to-average ratio of hourly event volume per type: the
    load factor capacity planning quotes — provisioning for the mean
    melts at the peak, and PAR says exactly how much headroom the
    worst hour demands (`events_concurrency_peak` finds the peak
    ITSELF; PAR normalizes it to the sustained rate, and
    `events_error_budget_burn` consumes the same shape for SLOs).
    Exactness: PAR = peak x active-hours / total rewrites
    multiplication-first so one positive integer division quantizes to
    milli — no float ever. Plan: one (type, hour) rollup — map-side
    combinable, calendar-bounded — then a per-type aggregate."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return (
        hourly.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.sum("n").cast("long").alias("total_events"),
            F.max("n").cast("long").alias("peak_hour_events"),
            F.expr("max(n) * count(*) * 1000 div sum(n)").cast("long").alias("par_milli"),
        )
        .orderBy("event_type")
    )
