"""Round-11 timeseries, part 24: STL-lite seasonal decomposition and
LTTB-style downsampling — both in exact integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# STL-lite: trend (7-day centered MA) / weekday seasonal / remainder
# --------------------------------------------------------------------------

# Everything stays integer by scaling through x7: detrended7 =
# 7*close - sum7(close); the seasonal component is the per-(symbol,
# weekday) MEDIAN of detrended7 (percentile_disc on ints — robust, and
# a value the data contains, so both engines agree exactly).
_STL_ORACLE = """
WITH daily AS (
  SELECT event_type AS symbol,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
trended AS (
  SELECT symbol, day, c,
         sum(c) OVER w AS sum7, count(*) OVER w AS n7,
         CAST((day - DATE '1992-01-01' + 2) % 7 + 1 AS BIGINT) AS dow
  FROM daily
  WINDOW w AS (PARTITION BY symbol ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (
  SELECT symbol, dow, 7 * c - sum7 AS d7
  FROM trended WHERE n7 = 7
),
seas AS (
  SELECT symbol, dow,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(quantile_disc(d7, 0.5) AS BIGINT) AS seasonal7
  FROM det GROUP BY symbol, dow
)
SELECT d.symbol, d.dow, s.n_days,
       floor(CAST(s.seasonal7 AS DOUBLE) / 7 * 100 + 0.5) / 100 AS seasonal_cents,
       CAST(sum(abs(d.d7 - s.seasonal7)) // (7 * s.n_days) AS BIGINT)
         AS mean_abs_remainder_cents
FROM det d JOIN seas s ON s.symbol = d.symbol AND s.dow = d.dow
GROUP BY d.symbol, d.dow, s.n_days, s.seasonal7
ORDER BY d.symbol, d.dow
"""


@register("timeseries_stl_lite", oracle=_STL_ORACLE, tags=("timeseries", "stats"))
def timeseries_stl_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite seasonal decomposition: trend = 7-day centered moving
    sum (full windows only), detrended = 7*close - trend_sum (scaling
    by 7 keeps everything integer — no fractional moving average
    anywhere), weekday seasonal = per-(symbol, ISO weekday) MEDIAN of
    the detrended series (robust, exact via percentile_disc on ints),
    remainder = what's left. This answers `timeseries_weekday_index`'s
    question (is Monday systematically different?) AFTER removing
    trend, which the raw weekday index conflates. Only the two display
    columns divide back down to cents. Plan: daily rollup, one
    centered window on the (symbol, day) shuffle, a bounded
    (symbol x 7) seasonal table joined back broadcast."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w = Window.partitionBy("symbol").orderBy("day").rowsBetween(-3, 3)
    trended = daily.select(
        "symbol",
        "day",
        "c",
        F.sum("c").over(w).alias("sum7"),
        F.count(F.lit(1)).over(w).alias("n7"),
        # ISO weekday from pure date arithmetic (1992-01-01 was a
        # Wednesday = ISO 3) — engine-neutral, no dow-field convention
        F.expr(
            "CAST((datediff(day, DATE '1992-01-01') + 2) % 7 + 1 AS BIGINT)"
        ).alias("dow"),
    )
    det = trended.filter(F.col("n7") == 7).select(
        "symbol", "dow", (7 * F.col("c") - F.col("sum7")).alias("d7")
    )
    seas = det.groupBy(
        F.col("symbol").alias("ssymbol"), F.col("dow").alias("sdow")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY d7) AS BIGINT)").alias(
            "seasonal7"
        ),
    )
    joined = det.join(
        F.broadcast(seas),
        (det.symbol == seas.ssymbol) & (det.dow == seas.sdow),
    )
    return (
        joined.groupBy("symbol", "dow", "n_days", "seasonal7")
        .agg(
            F.expr(
                "CAST(sum(abs(d7 - seasonal7)) div (7 * n_days) AS BIGINT)"
            ).alias("mean_abs_remainder_cents")
        )
        .select(
            "symbol",
            "dow",
            "n_days",
            (F.floor(F.col("seasonal7").cast("double") / 7 * 100 + F.lit(0.5)) / 100).alias(
                "seasonal_cents"
            ),
            "mean_abs_remainder_cents",
        )
        .orderBy("symbol", "dow")
    )


# --------------------------------------------------------------------------
# LTTB-style downsampling (bucket-average variant, exact integers)
# --------------------------------------------------------------------------

_LTTB_K = 7  # days per bucket

# Distributed LTTB variant: the triangle's left anchor is the PREVIOUS
# BUCKET'S AVERAGE rather than the previously-selected point (true
# LTTB is sequential; the avg-anchor variant is the standard parallel
# formulation). Cross-multiplying by both neighbor counts clears every
# fraction: A = |(Sxp - np*x)(Syn - nn*y) - (Syp - np*y)(Sxn - nn*x)|
# is a pure BIGINT, so the per-bucket argmax is exact.
_LTTB_ORACLE = f"""
WITH daily AS (
  SELECT event_type AS symbol,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
pts AS (
  SELECT symbol, day, y,
         CAST(day - DATE '1992-01-01' AS BIGINT) AS x,
         row_number() OVER (PARTITION BY symbol ORDER BY day) AS rn,
         count(*) OVER (PARTITION BY symbol) AS n
  FROM daily
),
mid AS (
  SELECT symbol, day, x, y, n,
         (rn - 2) // {_LTTB_K} AS bucket
  FROM pts WHERE rn > 1 AND rn < n
),
bsum AS (
  SELECT symbol, bucket,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(count(*) AS BIGINT) AS cnt
  FROM mid GROUP BY symbol, bucket
),
scored AS (
  SELECT m.symbol, m.bucket, m.day, m.y,
         abs((p.sx - p.cnt * m.x) * (nx.sy - nx.cnt * m.y)
             - (p.sy - p.cnt * m.y) * (nx.sx - nx.cnt * m.x)) AS area2
  FROM mid m
  JOIN bsum p ON p.symbol = m.symbol AND p.bucket = m.bucket - 1
  JOIN bsum nx ON nx.symbol = m.symbol AND nx.bucket = m.bucket + 1
),
pick AS (
  SELECT symbol, bucket, day, y,
         row_number() OVER (PARTITION BY symbol, bucket
                            ORDER BY area2 DESC, day) AS pr
  FROM scored
),
keep AS (
  SELECT symbol, day, y FROM pick WHERE pr = 1
  UNION ALL
  SELECT symbol, day, y FROM pts WHERE rn = 1 OR rn = n
)
SELECT symbol, day, y AS close_cents
FROM keep
ORDER BY symbol, day
"""


@register("timeseries_lttb_downsample", oracle=_LTTB_ORACLE, tags=("timeseries", "layout"))
def timeseries_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB downsampling (bucket-average anchor variant): keep both
    endpoints plus, per {_LTTB_K}-day bucket, the point forming the
    largest triangle with the neighboring buckets' centroids — the
    shape-preserving chart downsampler (vs `timeseries_m4_downsample`,
    which preserves pixel-column extremes). True LTTB anchors on the
    previously SELECTED point and is inherently sequential; the
    average-anchor variant is the standard distributed formulation,
    and cross-multiplying the triangle area by both neighbor counts
    makes the score a pure BIGINT — the per-bucket argmax (ties to
    the earliest day) is exact on both engines. Plan: daily rollup,
    one rank window, a bounded per-bucket centroid table self-joined
    at +-1 bucket (broadcast-sized), one top-1-per-bucket window."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("y"))
    w = Window.partitionBy("symbol").orderBy("day")
    pts = daily.select(
        "symbol",
        "day",
        "y",
        F.datediff("day", F.lit("1992-01-01")).cast("long").alias("x"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("symbol")).alias("n"),
    )
    mid = pts.filter((F.col("rn") > 1) & (F.col("rn") < F.col("n"))).withColumn(
        "bucket", F.expr(f"(rn - 2) div {_LTTB_K}")
    )
    bsum = mid.groupBy(F.col("symbol").alias("bs"), F.col("bucket").alias("bb")).agg(
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    prev = bsum.select(
        F.col("bs").alias("ps"), F.col("bb").alias("pb"),
        F.col("sx").alias("psx"), F.col("sy").alias("psy"), F.col("cnt").alias("pcnt"),
    )
    nxt = bsum.select(
        F.col("bs").alias("ns"), F.col("bb").alias("nb"),
        F.col("sx").alias("nsx"), F.col("sy").alias("nsy"), F.col("cnt").alias("ncnt"),
    )
    scored = (
        mid.join(
            F.broadcast(prev),
            (mid.symbol == F.col("ps")) & (mid.bucket - 1 == F.col("pb")),
        )
        .join(
            F.broadcast(nxt),
            (mid.symbol == F.col("ns")) & (mid.bucket + 1 == F.col("nb")),
        )
        .select(
            "symbol",
            "bucket",
            "day",
            "y",
            F.abs(
                (F.col("psx") - F.col("pcnt") * F.col("x"))
                * (F.col("nsy") - F.col("ncnt") * F.col("y"))
                - (F.col("psy") - F.col("pcnt") * F.col("y"))
                * (F.col("nsx") - F.col("ncnt") * F.col("x"))
            ).alias("area2"),
        )
    )
    wb = Window.partitionBy("symbol", "bucket").orderBy(
        F.col("area2").desc(), F.col("day")
    )
    picked = (
        scored.withColumn("pr", F.row_number().over(wb))
        .filter(F.col("pr") == 1)
        .select("symbol", "day", "y")
    )
    ends = pts.filter((F.col("rn") == 1) | (F.col("rn") == F.col("n"))).select(
        "symbol", "day", "y"
    )
    return (
        picked.unionAll(ends)
        .select("symbol", "day", F.col("y").alias("close_cents"))
        .orderBy("symbol", "day")
    )
