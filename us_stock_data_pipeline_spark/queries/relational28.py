"""Round-26 relational, part 28: newsvendor stocking level (critical
fractile) and run-length encoding of event sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Newsvendor critical-fractile stocking level
# --------------------------------------------------------------------------

_NV_FRACTILE_NUM = 4  # critical ratio cu/(cu+co) = 4/5 = 0.8, kept rational
_NV_FRACTILE_DEN = 5

_NEWSVENDOR_ORACLE = f"""
WITH demand AS (
  SELECT p.p_brand AS brand, l.l_shipdate AS day,
         CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT brand, qty,
         row_number() OVER (PARTITION BY brand ORDER BY qty, day) AS rk,
         count(*) OVER (PARTITION BY brand) AS n
  FROM demand
),
level AS (
  SELECT brand, n, qty AS stock_level
  FROM ranked
  WHERE rk = ({_NV_FRACTILE_NUM} * n + {_NV_FRACTILE_DEN - 1}) // {_NV_FRACTILE_DEN}
)
SELECT l.brand, CAST(l.n AS BIGINT) AS n_days,
       CAST(l.stock_level AS BIGINT) AS stock_level,
       CAST(count(*) FILTER (WHERE d.qty <= l.stock_level) AS BIGINT)
         AS n_days_covered
FROM level l JOIN demand d ON d.brand = l.brand
GROUP BY l.brand, l.n, l.stock_level
ORDER BY l.brand
"""


@register("orders_newsvendor_level", oracle=_NEWSVENDOR_ORACLE, tags=("analytics", "inventory"))
def orders_newsvendor_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking level: with underage cost cu and overage co,
    the profit-maximizing stock is the demand quantile at the critical
    ratio cu/(cu+co) — here {_NV_FRACTILE_NUM}/{_NV_FRACTILE_DEN}, so
    the level is the EXACT ceil(0.8n)-th order statistic of daily
    brand demand (integer rank arithmetic, no percentile
    interpolation — the same discipline as ml_conformal_prediction's
    quantile, because both are finite-sample order statistics, not
    moments). The audit column counts how many historical days that
    level would have covered — the realized service level. Together
    with EOQ (how much to order) this completes the classic
    inventory pair (how much to STOCK under uncertainty). Plan: one
    demand rollup, one ranked window, a broadcast join back for the
    coverage audit."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    demand = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("l_shipdate").alias("day"))
        .agg(F.sum(F.round("l_quantity").cast("long")).cast("long").alias("qty"))
    )
    w = Window.partitionBy("brand").orderBy("qty", "day")
    ranked = demand.select(
        "brand",
        "qty",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy("brand")).alias("n"),
    )
    level = ranked.filter(
        F.col("rk")
        == F.expr(
            f"({_NV_FRACTILE_NUM} * n + {_NV_FRACTILE_DEN - 1}) div {_NV_FRACTILE_DEN}"
        )
    ).select("brand", "n", F.col("qty").alias("stock_level"))
    return (
        demand.join(F.broadcast(level), "brand")
        .groupBy("brand", "n", "stock_level")
        .agg(
            F.count(F.when(F.col("qty") <= F.col("stock_level"), 1))
            .cast("long")
            .alias("n_days_covered")
        )
        .select(
            "brand",
            F.col("n").cast("long").alias("n_days"),
            F.col("stock_level").cast("long").alias("stock_level"),
            "n_days_covered",
        )
        .orderBy("brand")
    )


# --------------------------------------------------------------------------
# Run-length encoding of event sequences
# --------------------------------------------------------------------------

_RLE_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, event_type,
         CASE WHEN event_type = lag(event_type) OVER w THEN 0 ELSE 1 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
),
runs AS (
  SELECT user_id, event_type,
         sum(brk) OVER (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM seq
),
run_lens AS (
  SELECT user_id, run_id, max(event_type) AS event_type,
         CAST(count(*) AS BIGINT) AS run_len
  FROM runs GROUP BY user_id, run_id
)
SELECT event_type, run_len,
       CAST(count(*) AS BIGINT) AS n_runs
FROM run_lens
GROUP BY event_type, run_len
ORDER BY event_type, run_len
"""


@register("events_run_length_encoding", oracle=_RLE_ORACLE, tags=("analytics", "window"))
def events_run_length_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding of per-user event streams: consecutive
    repeats of the same event type collapse into (type, length) runs
    via the standard break-flag + running-sum island construction, and
    the output is the run-length distribution per event type — the
    compression profile that tells a session-replay store how much RLE
    buys, and a behavioral signal in its own right (long click runs =
    rage clicks; `events_double_submission` detects the pathological
    case, this measures the whole distribution). Single (user,
    event_id) sort shared by both window passes, then two hash
    aggregates — the gaps-and-islands shuffle inventory."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.when(
            F.col("event_type") == F.lag("event_type").over(w), 0
        )
        .otherwise(1)
        .alias("brk"),
    )
    runs = seq.withColumn(
        "run_id",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    run_lens = runs.groupBy("user_id", "run_id").agg(
        F.max("event_type").alias("event_type"),
        F.count("*").cast("long").alias("run_len"),
    )
    return (
        run_lens.groupBy("event_type", "run_len")
        .agg(F.count("*").cast("long").alias("n_runs"))
        .orderBy("event_type", "run_len")
    )
