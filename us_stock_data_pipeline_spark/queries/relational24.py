"""Round-9 relational/ETL additions, part 24: zone-map file-skipping
simulation and ingest-volume drift monitoring.

The reference lands parquet partitioned only by symbol
(symbols(historical)/ingest_massive.py:155); at 100 TB the next
physical-layout lever is file-level min/max statistics (zone maps /
parquet row-group stats), and the next operational lever is noticing
when a day's ingest volume silently halves. Both are pure
aggregation pipelines here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Zone-map (min/max) file-skipping effectiveness simulation
# --------------------------------------------------------------------------

_ZONE_FILE_ROWS = 1000  # lineitem rows per simulated file (orderkey-clustered)

# Probes are shipdate ranges expressed as day offsets from 1992-01-01,
# the same epoch both engines compute with exact date arithmetic.
_ZONE_PROBES = [
    (1, "1994-01-01", "1994-03-31"),
    (2, "1994-04-01", "1994-06-30"),
    (3, "1994-07-01", "1994-09-30"),
    (4, "1994-10-01", "1994-12-31"),
    (5, "1994-01-01", "1994-12-31"),
    (6, "2005-01-01", "2005-12-31"),
]

_ZONE_PROBES_SQL = ", ".join(
    f"({pid}, DATE '{lo}' - DATE '1992-01-01', DATE '{hi}' - DATE '1992-01-01')"
    for pid, lo, hi in _ZONE_PROBES
)

_ZONE_ORACLE = f"""
WITH files AS (
  SELECT l_orderkey // {_ZONE_FILE_ROWS} AS file_id,
         CAST(min(CAST(l_shipdate AS DATE) - DATE '1992-01-01') AS BIGINT) AS min_d,
         CAST(max(CAST(l_shipdate AS DATE) - DATE '1992-01-01') AS BIGINT) AS max_d,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY 1
),
probes(probe_id, lo, hi) AS (VALUES {_ZONE_PROBES_SQL})
SELECT CAST(p.probe_id AS BIGINT) AS probe_id,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN f.max_d < p.lo OR f.min_d > p.hi THEN 1 ELSE 0 END)
            AS BIGINT) AS n_skipped,
       CAST(sum(CASE WHEN f.max_d < p.lo OR f.min_d > p.hi THEN 0 ELSE f.n_rows END)
            AS BIGINT) AS rows_scanned,
       CAST(sum(CASE WHEN f.max_d < p.lo OR f.min_d > p.hi THEN 1 ELSE 0 END) * 1000
            // count(*) AS BIGINT) AS skip_permille
FROM files f CROSS JOIN probes p
GROUP BY p.probe_id
ORDER BY p.probe_id
"""


@register("layout_zonemap_skipping", oracle=_ZONE_ORACLE, tags=("layout", "etl"))
def layout_zonemap_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map file-skipping simulator: cluster lineitem into
    orderkey-contiguous 'files', collect each file's min/max shipdate
    (exactly what parquet row-group statistics store), then replay
    six shipdate range probes against the stats alone and count the
    files a stats-pruning reader would never open. Because orderkey
    order is only loosely correlated with shipdate, the skip rate is
    poor — which is precisely the measurement that motivates
    re-clustering (`layout_zorder_clustering` / `layout_partition_planner`
    are the fixes; this query is the before/after meter). Dates are
    exact day offsets from a fixed epoch on both engines. Plan: one
    groupBy builds the stats table (bounded: rows/file_rows entries),
    then a broadcast cross join against six probe rows — the probe
    evaluation never touches the fact table again, mirroring how a
    real reader prunes from footer stats without I/O."""
    li = load_table(spark, sf_dir, "lineitem")
    files = li.groupBy(
        F.expr(f"l_orderkey div {_ZONE_FILE_ROWS}").alias("file_id")
    ).agg(
        F.min(F.datediff(F.to_date("l_shipdate"), F.lit("1992-01-01")))
        .cast("long")
        .alias("min_d"),
        F.max(F.datediff(F.to_date("l_shipdate"), F.lit("1992-01-01")))
        .cast("long")
        .alias("max_d"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    probes = spark.createDataFrame(
        [(pid, lo, hi) for pid, lo, hi in _ZONE_PROBES],
        "probe_id long, lo_s string, hi_s string",
    ).select(
        "probe_id",
        F.datediff(F.to_date("lo_s"), F.lit("1992-01-01")).cast("long").alias("lo"),
        F.datediff(F.to_date("hi_s"), F.lit("1992-01-01")).cast("long").alias("hi"),
    )
    skipped = F.when((F.col("max_d") < F.col("lo")) | (F.col("min_d") > F.col("hi")), 1).otherwise(0)
    return (
        files.crossJoin(F.broadcast(probes))
        .groupBy("probe_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(skipped).cast("long").alias("n_skipped"),
            F.sum(F.when(skipped == 1, 0).otherwise(F.col("n_rows")))
            .cast("long")
            .alias("rows_scanned"),
            F.expr(
                "CAST(sum(CASE WHEN max_d < lo OR min_d > hi THEN 1 ELSE 0 END) * 1000"
                " div count(*) AS BIGINT)"
            ).alias("skip_permille"),
        )
        .orderBy("probe_id")
    )


# --------------------------------------------------------------------------
# Day-over-day ingest-volume drift monitor
# --------------------------------------------------------------------------

_DRIFT_ALERT_PM = 300  # alert when |day-over-day change| >= 30%

_DRIFT_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, day, n,
         lag(n) OVER (PARTITION BY event_type ORDER BY day) AS prev
  FROM daily
),
delta AS (
  SELECT event_type, day, n, prev,
         CASE WHEN n >= prev THEN (n - prev) * 1000 // prev
              ELSE -((prev - n) * 1000 // prev) END AS d_pm
  FROM lagged WHERE prev IS NOT NULL AND prev > 0
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(CASE WHEN abs(d_pm) >= {_DRIFT_ALERT_PM} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_alerts,
       CAST(max(d_pm) AS BIGINT) AS max_spike_pm,
       CAST(min(d_pm) AS BIGINT) AS max_drop_pm,
       min(CASE WHEN abs(d_pm) >= {_DRIFT_ALERT_PM} THEN day END) AS first_alert_day
FROM delta
GROUP BY event_type
ORDER BY event_type
"""


@register("etl_row_drift_monitor", oracle=_DRIFT_ORACLE, tags=("etl", "window"))
def etl_row_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-volume drift monitor: day-over-day row-count change per
    event type in exact permille (split into a positive spike branch
    and a negated positive drop branch so the integer division only
    ever sees non-negative operands — both engines truncate toward
    zero, but staying on the positive axis removes the question),
    alerting when a day moves >= 30% vs the prior day. This is the
    pipeline-health twin of `etl_freshness_sla` (is data late?) —
    here: did TODAY's volume silently collapse or double, the
    classic symptom of an upstream partial outage or a duplicate
    re-send the reference's append-only 1m pipeline
    (ingest_1m_session.py, mode('append'), no dedup) would never
    notice. Plan: calendar-bounded daily rollup, one lag window on
    the same (type, day) shuffle, tiny final groupBy."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.withColumn("prev", F.lag("n").over(w)).filter(
        F.col("prev").isNotNull() & (F.col("prev") > 0)
    )
    delta = lagged.withColumn(
        "d_pm",
        F.when(
            F.col("n") >= F.col("prev"),
            F.expr("(n - prev) * 1000 div prev"),
        ).otherwise(-F.expr("(prev - n) * 1000 div prev")),
    )
    alert = F.abs(F.col("d_pm")) >= _DRIFT_ALERT_PM
    return (
        delta.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum(F.when(alert, 1).otherwise(0)).cast("long").alias("n_alerts"),
            F.max("d_pm").cast("long").alias("max_spike_pm"),
            F.min("d_pm").cast("long").alias("max_drop_pm"),
            F.min(F.when(alert, F.col("day"))).alias("first_alert_day"),
        )
        .orderBy("event_type")
    )
