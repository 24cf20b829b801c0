"""Round-115 analytics, part 105: HDR log2-bucket latency histogram
and the resettable high-watermark window pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# HDR-style log2 latency histogram with bucketed percentile bounds
# --------------------------------------------------------------------------

_HDR_ORACLE = """
WITH gaps AS (
  -- inter-event gap in MICROSECONDS per user (the latency-shaped metric)
  SELECT CAST(date_diff('microsecond', lag(ts) OVER w, ts) AS BIGINT) AS us
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  QUALIFY lag(ts) OVER w IS NOT NULL
),
bucketed AS (
  -- log2 bucket = highest set bit = length of the minimal binary
  -- rendering minus one (bin() is zero-stripped in BOTH engines)
  SELECT CASE WHEN us <= 1 THEN 0 ELSE length(bin(us)) - 1 END AS b
  FROM gaps
),
hist AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM bucketed GROUP BY b),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM hist),
cum AS (
  SELECT b, n,
         sum(n) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS c, tot.t
  FROM hist, tot
)
SELECT CAST(max(t) AS BIGINT) AS n_gaps,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(min(CASE WHEN c * 2 >= t THEN b END) AS BIGINT) AS p50_bucket,
       CAST(min(CASE WHEN c * 20 >= 19 * t THEN b END) AS BIGINT) AS p95_bucket,
       CAST(min(CASE WHEN c * 100 >= 99 * t THEN b END) AS BIGINT) AS p99_bucket,
       CAST(max(b) AS BIGINT) AS max_bucket
FROM cum
"""


@register("agg_hdr_log2_histogram", oracle=_HDR_ORACLE, tags=("agg", "latency"))
def agg_hdr_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR-style log2-bucketed latency histogram over inter-event gaps
    (microseconds): bucket = floor(log2 x), giving constant RELATIVE
    error per bucket across nine orders of magnitude — the fixed-width
    histogram (`agg_histogram`) wastes all its bins on the bulk and
    loses the tail, which for latency is the whole point. Percentile
    readouts are bucket indices located by exact cumulative-count
    crossings (c*2 >= t etc. — pure integer, no interpolation), the
    mergeable-by-addition property that makes HDR histograms THE
    production latency sketch. The bucket index computes bit-wise
    (highest set bit via the binary rendering) so both engines run
    exact integer paths. Plan: one user-keyed lag, a ~40-bucket
    groupBy, a scalar reduce."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select((F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("us"))
        .filter(F.col("us").isNotNull())
    )
    # highest set bit = length of the minimal binary rendering minus one
    b = F.when(F.col("us") <= 1, F.lit(0)).otherwise(F.length(F.bin("us")) - 1)
    hist = gaps.select(b.alias("b")).groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = hist.agg(F.sum("n").cast("long").alias("t"))
    w_cum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.crossJoin(F.broadcast(tot)).select(
        "b", "n", "t", F.sum("n").over(w_cum).alias("c")
    )
    return cum.agg(
        F.max("t").cast("long").alias("n_gaps"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.min(F.when(F.col("c") * 2 >= F.col("t"), F.col("b"))).cast("long").alias("p50_bucket"),
        F.min(F.when(F.col("c") * 20 >= 19 * F.col("t"), F.col("b")))
        .cast("long")
        .alias("p95_bucket"),
        F.min(F.when(F.col("c") * 100 >= 99 * F.col("t"), F.col("b")))
        .cast("long")
        .alias("p99_bucket"),
        F.max("b").cast("long").alias("max_bucket"),
    )


# --------------------------------------------------------------------------
# Resettable high-watermark: running max since the last purchase
# --------------------------------------------------------------------------

_HWM_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS epoch
  FROM events
),
hwm AS (
  SELECT user_id, event_id, event_type, cents, epoch,
         max(cents) OVER (PARTITION BY user_id, epoch ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS high_watermark
  FROM ordered
)
SELECT CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN cents = high_watermark THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new_highs,
       CAST(max(epoch) AS BIGINT) AS max_epochs_per_user,
       CAST(sum(high_watermark - cents) AS BIGINT) AS total_drawdown_cents
FROM hwm
"""


@register("window_resettable_watermark", oracle=_HWM_ORACLE, tags=("window", "pattern"))
def window_resettable_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resettable high-watermark: the running max of event value per
    user that RESETS at every purchase — the 'max since last
    checkpoint' window shape (billing high-marks between invoices,
    drawdown since last rebalance) that plain cumulative frames can't
    express because the frame start is DATA-DEPENDENT. The standard
    rewrite makes it expressible: a cumulative count of the reset
    events defines an epoch id, and the watermark is a plain
    running max PARTITIONED BY (key, epoch) — both windows sharing
    one sort with the same (ts, event_id) tiebreak (the two-window
    ordering rule). Output summarizes: how many events set a new
    high, the max reset count, and the integer drawdown mass. One
    user-keyed shuffle."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ordered = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .over(w)
        .alias("epoch"),
    )
    w_hwm = Window.partitionBy("user_id", "epoch").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hwm = ordered.select(
        "cents", "epoch", F.max("cents").over(w_hwm).alias("high_watermark")
    )
    return hwm.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("cents") == F.col("high_watermark"), 1).otherwise(0))
        .cast("long")
        .alias("n_new_highs"),
        F.max("epoch").cast("long").alias("max_epochs_per_user"),
        F.sum(F.col("high_watermark") - F.col("cents")).cast("long").alias("total_drawdown_cents"),
    )
