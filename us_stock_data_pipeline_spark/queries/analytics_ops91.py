"""Round-99 analytics, part 91: drawdown duration (time underwater)
and an IPv4/CIDR arithmetic battery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Drawdown duration: longest and current time underwater per symbol
# --------------------------------------------------------------------------

_DDD_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
peaks AS (
  SELECT symbol, day, c,
         max(c) OVER (PARTITION BY symbol ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS peak,
         row_number() OVER (PARTITION BY symbol ORDER BY day) AS rn
  FROM closes
),
flagged AS (
  SELECT symbol, day, rn, CASE WHEN c < peak THEN 1 ELSE 0 END AS under
  FROM peaks
),
-- gaps-and-islands over the underwater flag: island id = rn minus the
-- running count of underwater days (constant within a run)
islands AS (
  SELECT symbol, rn, under,
         rn - sum(under) OVER (PARTITION BY symbol ORDER BY rn
                               ROWS UNBOUNDED PRECEDING) AS grp
  FROM flagged
),
runs AS (
  SELECT symbol, grp, CAST(count(*) AS BIGINT) AS run_len,
         CAST(max(rn) AS BIGINT) AS run_end
  FROM islands WHERE under = 1 GROUP BY symbol, grp
),
tot AS (SELECT symbol, CAST(max(rn) AS BIGINT) AS n_days FROM islands GROUP BY symbol)
SELECT t.symbol, t.n_days,
       CAST(coalesce(max(r.run_len), 0) AS BIGINT) AS max_underwater_days,
       CAST(coalesce(max(CASE WHEN r.run_end = t.n_days THEN r.run_len END), 0)
         AS BIGINT) AS current_underwater_days,
       CAST(coalesce(sum(r.run_len), 0) AS BIGINT) AS total_underwater_days
FROM tot t LEFT JOIN runs r ON r.symbol = t.symbol
GROUP BY t.symbol, t.n_days
ORDER BY t.symbol
"""


@register("bars_drawdown_duration", oracle=_DDD_ORACLE, tags=("stock", "risk", "window"))
def bars_drawdown_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drawdown DURATION per symbol: the longest, current, and total
    runs of days spent below the running peak — the time dimension of
    risk that `bars_max_drawdown` (depth) and `bars_ulcer_index` (RMS
    depth) ignore: two strategies with the same -20% max drawdown are
    different animals if one spent 3 days there and the other 3 years.
    Underwater runs resolve with the gaps-and-islands identity (rn -
    running count of flags is constant within a run — the
    `etl_sessionization_gaps` machinery applied to a derived flag);
    'current' is the run whose end touches the last bar. All integer
    day counts off one (symbol, day) sort shared by the running peak,
    the flag, and the island id."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w = Window.partitionBy("symbol").orderBy("day")
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = closes.select(
        "symbol",
        F.row_number().over(w).alias("rn"),
        F.when(F.col("c") < F.max("c").over(w_cum), 1).otherwise(0).alias("under"),
    )
    islands = flagged.select(
        "symbol",
        "rn",
        "under",
        (F.col("rn") - F.sum("under").over(
            Window.partitionBy("symbol").orderBy("rn").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )).alias("grp"),
    )
    runs = (
        islands.filter(F.col("under") == 1)
        .groupBy("symbol", "grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("run_len"),
            F.max("rn").cast("long").alias("run_end"),
        )
    )
    tot = islands.groupBy("symbol").agg(F.max("rn").cast("long").alias("n_days"))
    return (
        tot.join(runs, "symbol", "left")
        .groupBy("symbol", "n_days")
        .agg(
            F.coalesce(F.max("run_len"), F.lit(0)).cast("long").alias("max_underwater_days"),
            F.coalesce(
                F.max(F.when(F.col("run_end") == F.col("n_days"), F.col("run_len"))),
                F.lit(0),
            )
            .cast("long")
            .alias("current_underwater_days"),
            F.coalesce(F.sum("run_len"), F.lit(0)).cast("long").alias("total_underwater_days"),
        )
        .orderBy("symbol")
    )


# --------------------------------------------------------------------------
# IPv4 / CIDR arithmetic battery
# --------------------------------------------------------------------------

_CIDR_ORACLE = """
WITH ips AS (
  -- deterministic synthetic IPs from user ids: 10.x.y.z private space
  SELECT user_id,
         10 * 16777216
         + (user_id % 200) * 65536
         + ((user_id * 7) % 250) * 256
         + ((user_id * 13) % 250) AS ip_int
  FROM (SELECT DISTINCT user_id FROM events)
),
parsed AS (
  SELECT user_id, ip_int,
         CAST(ip_int // 16777216 AS BIGINT) AS o1,
         CAST((ip_int // 65536) % 256 AS BIGINT) AS o2,
         CAST((ip_int // 256) % 256 AS BIGINT) AS o3,
         CAST(ip_int % 256 AS BIGINT) AS o4
  FROM ips
),
rendered AS (
  SELECT user_id, ip_int,
         o1 || '.' || o2 || '.' || o3 || '.' || o4 AS dotted,
         -- /20 network id and broadcast (mask arithmetic via div/mod)
         ip_int // 4096 * 4096 AS net20,
         ip_int // 4096 * 4096 + 4095 AS bcast20,
         CASE WHEN ip_int // 65536 % 256 < 100 THEN 1 ELSE 0 END AS in_low_block
  FROM parsed
)
SELECT CAST(count(*) AS BIGINT) AS n_ips,
       CAST(count(DISTINCT net20) AS BIGINT) AS n_nets20,
       CAST(sum(in_low_block) AS BIGINT) AS n_in_low_block,
       CAST(sum(CAST(bcast20 - ip_int AS BIGINT)) AS BIGINT) AS slack_sum,
       min(dotted) AS min_dotted, max(dotted) AS max_dotted
FROM rendered
"""


@register("scalar_ipv4_cidr", oracle=_CIDR_ORACLE, tags=("scalar", "network"))
def scalar_ipv4_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4/CIDR arithmetic battery: synthetic-but-deterministic
    addresses derive from user ids, then the op pins octet extraction,
    dotted-quad rendering, /20 network-id and broadcast computation,
    and CIDR block membership — all as pure integer div/mod arithmetic
    (neither engine has an inet type, and this is how you do network
    math in plain SQL: mask = div by 2^(32-prefix) then scale back).
    The aggregate checks count, distinct /20 networks, block
    membership, the broadcast-slack sum, and the lexicographic dotted
    extremes (string rendering exercised, not just ints). All exact
    integers and strings; one distinct + one aggregate over the user
    dimension."""
    ev = load_table(spark, sf_dir, "events")
    ips = ev.select("user_id").distinct().select(
        "user_id",
        (
            F.lit(10 * 16777216)
            + (F.col("user_id") % 200) * 65536
            + ((F.col("user_id") * 7) % 250) * 256
            + ((F.col("user_id") * 13) % 250)
        ).cast("long").alias("ip_int"),
    )
    o1 = F.expr("ip_int div 16777216")
    o2 = F.expr("(ip_int div 65536) % 256")
    o3 = F.expr("(ip_int div 256) % 256")
    o4 = F.col("ip_int") % 256
    rendered = ips.select(
        "ip_int",
        F.concat_ws(".", o1.cast("string"), o2.cast("string"), o3.cast("string"), o4.cast("string")).alias(
            "dotted"
        ),
        F.expr("ip_int div 4096 * 4096").alias("net20"),
        (F.expr("ip_int div 4096 * 4096") + 4095).alias("bcast20"),
        F.when(F.expr("ip_int div 65536 % 256") < 100, 1).otherwise(0).alias("in_low_block"),
    )
    return rendered.agg(
        F.count(F.lit(1)).cast("long").alias("n_ips"),
        F.countDistinct("net20").cast("long").alias("n_nets20"),
        F.sum("in_low_block").cast("long").alias("n_in_low_block"),
        F.sum((F.col("bcast20") - F.col("ip_int")).cast("long")).cast("long").alias("slack_sum"),
        F.min("dotted").alias("min_dotted"),
        F.max("dotted").alias("max_dotted"),
    )
