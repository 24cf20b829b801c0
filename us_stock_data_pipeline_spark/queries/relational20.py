"""Round-7 relational additions, part 20: physical input-file skew,
alert debouncing, format-string battery, and whale concentration
drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Physical input-file skew audit
# --------------------------------------------------------------------------

# The staged layout partitions lineitem by l_returnflag with one file
# per value, so rows-per-FILE equals rows-per-VALUE and the audit is
# SQL-verifiable without filesystem access on the oracle side.
_FILESKEW_ORACLE = """
WITH per_file AS (
  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY l_returnflag
)
SELECT CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(n_rows) AS BIGINT) AS total_rows,
       CAST(min(n_rows) AS BIGINT) AS min_rows,
       CAST(max(n_rows) AS BIGINT) AS max_rows,
       floor(CAST(max(n_rows) AS DOUBLE) / (CAST(sum(n_rows) AS DOUBLE) / count(*))
             * 10000 + 0.5) / 10000 AS skew_ratio
FROM per_file
"""


@register("etl_input_file_skew", oracle=_FILESKEW_ORACLE, tags=("etl", "layout"))
def etl_input_file_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical input-file skew audit: stage lineitem partitioned by
    return flag (repartition by the key first, so each partition
    value lands in exactly ONE file), then scan the staged layout and
    count rows per underlying file via input_file_name() — the
    min/max/skew-ratio report a table-maintenance job reads before
    deciding to compact (`layout_partition_planner` plans the FIX;
    this measures the problem). At 100 TB file-size skew IS task-time
    skew: the max/avg row ratio here is a direct straggler predictor
    for every scan of the table. The audit itself is a map-side
    groupBy on free scan metadata; the oracle verifies it through
    the value<->file bijection the staging guarantees."""
    import hashlib
    import os

    li = load_table(spark, sf_dir, "lineitem")
    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    path = f"/tmp/us_sdps_layout/{key}/lineitem_by_flag"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            li.select("l_orderkey", "l_returnflag")
            .repartition("l_returnflag")
            .write.mode("overwrite")
            .partitionBy("l_returnflag")
            .parquet(path)
        )
    staged = spark.read.parquet(path)
    per_file = staged.groupBy(F.input_file_name().alias("filename")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    return per_file.agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("n_rows").cast("long").alias("total_rows"),
        F.min("n_rows").cast("long").alias("min_rows"),
        F.max("n_rows").cast("long").alias("max_rows"),
        (
            F.floor(
                F.max("n_rows").cast("double")
                / (F.sum("n_rows").cast("double") / F.count(F.lit(1)))
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("skew_ratio"),
    )


# --------------------------------------------------------------------------
# Alert debouncing (cooldown-collapsed threshold crossings)
# --------------------------------------------------------------------------

_DEBOUNCE_COOLDOWN_US = 3_600_000_000  # 1 hour
_DEBOUNCE_THRESHOLD = 180.0  # alert when value exceeds this

_DEBOUNCE_ORACLE = f"""
WITH crossings AS (
  SELECT event_type, event_id, epoch_us(ts) AS t_us
  FROM events WHERE value > {_DEBOUNCE_THRESHOLD}
),
flagged AS (
  SELECT event_type, t_us,
         CASE WHEN t_us - lag(t_us) OVER (PARTITION BY event_type
                ORDER BY t_us, event_id) > {_DEBOUNCE_COOLDOWN_US}
              OR lag(t_us) OVER (PARTITION BY event_type
                ORDER BY t_us, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_episode
  FROM crossings
),
episodes AS (
  SELECT event_type, t_us,
         sum(new_episode) OVER (PARTITION BY event_type ORDER BY t_us
                                ROWS UNBOUNDED PRECEDING) AS episode_id
  FROM flagged
)
SELECT event_type,
       CAST(count(DISTINCT episode_id) AS BIGINT) AS n_episodes,
       CAST(count(*) AS BIGINT) AS n_crossings,
       floor(CAST(count(*) AS DOUBLE) / count(DISTINCT episode_id) * 10000 + 0.5)
         / 10000 AS crossings_per_episode
FROM episodes
GROUP BY event_type
ORDER BY event_type
"""


@register("events_alert_debounce", oracle=_DEBOUNCE_ORACLE, tags=("analytics", "alerting"))
def events_alert_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert debouncing: collapse runs of threshold crossings into
    EPISODES — a new episode only when the previous crossing is more
    than the 1-hour cooldown behind — and report the suppression
    ratio (raw crossings per delivered page). This is the
    gaps-and-islands pattern applied to the alerting problem
    `stream_error_rate_alert` creates: without debouncing a flapping
    metric pages every window. Gap comparisons are exact integer
    micros; the lag flag, the episode cumsum, and the final groupBy
    share a single event_type-keyed sort. The pre-filter pushes the
    threshold to the scan, so only crossings ever shuffle."""
    ev = load_table(spark, sf_dir, "events")
    crossings = ev.filter(F.col("value") > _DEBOUNCE_THRESHOLD).select(
        "event_type", "event_id", F.unix_micros("ts").alias("t_us")
    )
    w = Window.partitionBy("event_type").orderBy("t_us", "event_id")
    prev = F.lag("t_us").over(w)
    flagged = crossings.select(
        "event_type",
        "t_us",
        F.when(
            prev.isNull() | (F.col("t_us") - prev > _DEBOUNCE_COOLDOWN_US), 1
        )
        .otherwise(0)
        .alias("new_episode"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("t_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    episodes = flagged.select(
        "event_type", F.sum("new_episode").over(w_cum).alias("episode_id")
    )
    return (
        episodes.groupBy("event_type")
        .agg(
            F.countDistinct("episode_id").cast("long").alias("n_episodes"),
            F.count(F.lit(1)).cast("long").alias("n_crossings"),
            (
                F.floor(
                    F.count(F.lit(1)).cast("double")
                    / F.countDistinct("episode_id")
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("crossings_per_episode"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Format-string battery (printf-style rendering parity)
# --------------------------------------------------------------------------

_FORMAT_ORACLE = """
SELECT n_name,
       printf('%03d', n_nationkey) AS padded_key,
       printf('nation=%s|region=%d', n_name, n_regionkey) AS kv_render,
       lpad(n_name, 20, '.') AS lpadded,
       rpad(CAST(n_nationkey AS VARCHAR), 6, '0') AS rpadded,
       CAST(length(printf('%s-%d', n_name, n_nationkey)) AS BIGINT) AS render_len
FROM nation
ORDER BY n_name
"""


@register("scalar_format_battery", oracle=_FORMAT_ORACLE, tags=("scalar", "string"))
def scalar_format_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting battery: zero-padded keys, multi-arg
    key=value renders, lpad/rpad — the string-rendering surface every
    export/report stage leans on (`scalar_string`/`scalar_string2`
    cover parsing and transformation; this covers RENDERING).
    Spark's format_string and DuckDB's printf share C semantics for
    %s/%d and width flags, which the oracle pins — a format mismatch
    here is a data-export diff in production. Pure map-side
    projection over a dim table."""
    nat = load_table(spark, sf_dir, "nation")
    return nat.select(
        "n_name",
        F.format_string("%03d", "n_nationkey").alias("padded_key"),
        F.format_string("nation=%s|region=%d", "n_name", "n_regionkey").alias(
            "kv_render"
        ),
        F.lpad("n_name", 20, ".").alias("lpadded"),
        F.rpad(F.col("n_nationkey").cast("string"), 6, "0").alias("rpadded"),
        F.length(F.format_string("%s-%d", "n_name", "n_nationkey"))
        .cast("long")
        .alias("render_len"),
    ).orderBy("n_name")


# --------------------------------------------------------------------------
# Whale concentration drift (top-decile customer share per year)
# --------------------------------------------------------------------------

_WHALE_ORACLE = """
WITH per_cy AS (
  SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
),
ranked AS (
  SELECT yr, cents,
         row_number() OVER (PARTITION BY yr ORDER BY cents DESC, o_custkey) AS rn,
         count(*) OVER (PARTITION BY yr) AS n
  FROM per_cy
)
SELECT yr,
       CAST(max(n) AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN rn * 10 <= n THEN cents ELSE 0 END) AS BIGINT)
         AS top_decile_cents,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       floor(CAST(sum(CASE WHEN rn * 10 <= n THEN cents ELSE 0 END) AS DOUBLE)
             / sum(cents) * 10000 + 0.5) / 10000 AS top_decile_share
FROM ranked
GROUP BY yr
ORDER BY yr
"""


@register("orders_whale_concentration", oracle=_WHALE_ORACLE, tags=("analytics", "concentration"))
def orders_whale_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whale-concentration drift: the revenue share of each year's
    top-decile customers, tracked year over year — the
    concentration-TREND view that `events_pareto_gini` (static Gini)
    and `agg_herfindahl_index` (static HHI) don't give: is the
    business getting MORE dependent on its whales over time? The
    decile membership test is exact integer cross-multiplication
    (rn*10 <= n), rank ties break on custkey, and all money is exact
    cents. One fact groupBy to (customer, year), one year-partitioned
    rank window, one year rollup — two shuffles, both on natural
    keys, everything after the first agg customer-cardinality."""
    od = load_table(spark, sf_dir, "orders")
    per_cy = od.groupBy(
        "o_custkey", F.year("o_orderdate").cast("long").alias("yr")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    wp = Window.partitionBy("yr")
    ranked = per_cy.select(
        "yr",
        "cents",
        F.row_number()
        .over(wp.orderBy(F.col("cents").desc(), "o_custkey"))
        .alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    top = F.sum(F.when(F.col("rn") * 10 <= F.col("n"), F.col("cents")).otherwise(0))
    return (
        ranked.groupBy("yr")
        .agg(
            F.max("n").cast("long").alias("n_customers"),
            top.cast("long").alias("top_decile_cents"),
            F.sum("cents").cast("long").alias("total_cents"),
            (
                F.floor(top.cast("double") / F.sum("cents") * 10000 + F.lit(0.5))
                / 10000
            ).alias("top_decile_share"),
        )
        .orderBy("yr")
    )
