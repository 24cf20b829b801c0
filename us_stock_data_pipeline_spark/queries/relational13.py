"""Round-6 relational additions, part 13: nearest as-of join (either
direction), time-bounded funnel, and business-day arithmetic — the
remaining practical variants of the as-of / funnel / calendar families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register


def _round4(col):
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


# --------------------------------------------------------------------------
# Nearest as-of join (backward + forward, tie to backward)
# --------------------------------------------------------------------------

_NEAREST_ORACLE = """
WITH clicks AS (
  SELECT user_id, ts, 0 AS side FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, 1 AS side, event_id FROM events WHERE event_type = 'purchase'
),
merged AS (
  SELECT user_id, ts, side, event_id,
         max(CASE WHEN side = 0 THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, side
           ROWS UNBOUNDED PRECEDING) AS prev_click,
         min(CASE WHEN side = 0 THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, side
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_click
  FROM (SELECT user_id, ts, side, NULL::BIGINT AS event_id FROM clicks
        UNION ALL SELECT user_id, ts, side, event_id FROM purchases) u
),
picked AS (
  SELECT user_id, event_id, ts,
         CASE
           WHEN prev_click IS NULL AND next_click IS NULL THEN NULL
           WHEN next_click IS NULL THEN prev_click
           WHEN prev_click IS NULL THEN next_click
           WHEN epoch_us(ts) - epoch_us(prev_click)
                <= epoch_us(next_click) - epoch_us(ts) THEN prev_click
           ELSE next_click
         END AS nearest_click
  FROM merged WHERE side = 1
)
SELECT user_id, event_id, ts, nearest_click,
       CAST(abs(epoch_us(ts) - epoch_us(nearest_click)) AS BIGINT) AS gap_us,
       CASE WHEN nearest_click <= ts THEN 'backward' ELSE 'forward' END AS direction
FROM picked
WHERE nearest_click IS NOT NULL
ORDER BY user_id, event_id
"""


@register("join_asof_nearest", oracle=_NEAREST_ORACLE, tags=("join", "asof"))
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: each purchase matches its CLOSEST click in
    either time direction, ties resolved backward — completing the
    as-of family (backward `join_asof`, forward `join_asof_forward`,
    tolerance `join_asof_tolerance`; pandas' merge_asof
    direction='nearest'). Same engine shape as its siblings: union the
    streams, ONE shuffle on the key, then a running max and a reversed
    running min over the SAME (user_id, ts) sort — Spark plans both
    frames in one Window exec pass, so nearest costs exactly what
    backward alone costs. Gap comparison is exact integer
    microseconds."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(0).alias("side"), F.lit(None).cast("long").alias("event_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id"
    )
    base = Window.partitionBy("user_id").orderBy("ts", "side")
    w_back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    click_ts = F.when(F.col("side") == 0, F.col("ts"))
    merged = clicks.unionByName(purchases).select(
        "user_id",
        "ts",
        "side",
        "event_id",
        F.max(click_ts).over(w_back).alias("prev_click"),
        F.min(click_ts).over(w_fwd).alias("next_click"),
    )
    back_gap = F.unix_micros("ts") - F.unix_micros("prev_click")
    fwd_gap = F.unix_micros("next_click") - F.unix_micros("ts")
    nearest = (
        F.when(F.col("prev_click").isNull() & F.col("next_click").isNull(), F.lit(None))
        .when(F.col("next_click").isNull(), F.col("prev_click"))
        .when(F.col("prev_click").isNull(), F.col("next_click"))
        .when(back_gap <= fwd_gap, F.col("prev_click"))
        .otherwise(F.col("next_click"))
    )
    picked = (
        merged.filter(F.col("side") == 1)
        .select("user_id", "event_id", "ts", nearest.alias("nearest_click"))
        .filter(F.col("nearest_click").isNotNull())
    )
    return picked.select(
        "user_id",
        "event_id",
        "ts",
        "nearest_click",
        F.abs(F.unix_micros("ts") - F.unix_micros("nearest_click"))
        .cast("long")
        .alias("gap_us"),
        F.when(F.col("nearest_click") <= F.col("ts"), F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    ).orderBy("user_id", "event_id")


# --------------------------------------------------------------------------
# Time-bounded funnel (each step within 24h of the previous)
# --------------------------------------------------------------------------

_FUNNEL_WINDOW_US = 24 * 3600 * 1000 * 1000

_TB_FUNNEL_ORACLE = f"""
WITH v AS (
  SELECT user_id, min(epoch_us(ts)) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click'
    AND epoch_us(e.ts) > v.t_view
    AND epoch_us(e.ts) <= v.t_view + {_FUNNEL_WINDOW_US}
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t_buy
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase'
    AND epoch_us(e.ts) > c.t_click
    AND epoch_us(e.ts) <= c.t_click + {_FUNNEL_WINDOW_US}
  GROUP BY e.user_id
)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
  (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_click_24h,
  (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_buy_24h,
  floor((SELECT count(*) FROM c) * 10000.0 / (SELECT count(*) FROM v) + 0.5) / 10000
    AS view_to_click,
  floor((SELECT count(*) FROM p) * 10000.0 / (SELECT count(*) FROM c) + 0.5) / 10000
    AS click_to_buy
"""


@register("events_funnel_time_bounded", oracle=_TB_FUNNEL_ORACLE, tags=("analytics", "funnel"))
def events_funnel_time_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded funnel: view -> click -> purchase where each step
    must land within 24 HOURS of the previous step's first occurrence —
    the constraint that separates a real conversion journey from
    coincidental ordering (`events_funnel` is the unbounded sibling).
    Expressed as a chain of per-user conditional mins, each stage a
    groupBy + join back on user_id — every shuffle lands on the SAME
    key, so Spark reuses the partitioning end to end (one exchange,
    three narrow stages over it). Timestamps are exact integer
    microseconds; the bound arithmetic can't drift."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.unix_micros("ts") > F.col("t_view"))
            & (F.unix_micros("ts") <= F.col("t_view") + _FUNNEL_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.unix_micros("ts") > F.col("t_click"))
            & (F.unix_micros("ts") <= F.col("t_click") + _FUNNEL_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("t_buy"))
    )
    nv = v.agg(F.count(F.lit(1)).cast("long").alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).cast("long").alias("n_click_24h"))
    np_ = p.agg(F.count(F.lit(1)).cast("long").alias("n_buy_24h"))
    return (
        nv.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            "n_view",
            "n_click_24h",
            "n_buy_24h",
            (
                F.floor(F.col("n_click_24h") * 10000.0 / F.col("n_view") + F.lit(0.5))
                / 10000
            ).alias("view_to_click"),
            (
                F.floor(F.col("n_buy_24h") * 10000.0 / F.col("n_click_24h") + F.lit(0.5))
                / 10000
            ).alias("click_to_buy"),
        )
    )


# --------------------------------------------------------------------------
# Business-day arithmetic (weekday-aware lead times)
# --------------------------------------------------------------------------

# dow 0=Monday..6=Sunday via epoch-day arithmetic from a known Monday
# (1970-01-05) — identical integer formula on both engines, immune to the
# engines' different DAYOFWEEK numbering conventions.

_BDAYS_ORACLE = """
WITH ship AS (
  SELECT l.l_orderkey, min(l.l_shipdate) AS first_ship
  FROM lineitem l GROUP BY l.l_orderkey
),
spans AS (
  SELECT o.o_orderpriority,
         date_diff('day', o.o_orderdate, s.first_ship) AS days,
         date_diff('day', DATE '1970-01-05', CAST(o.o_orderdate AS DATE)) % 7 AS dow1
  FROM orders o JOIN ship s ON o.o_orderkey = s.l_orderkey
  WHERE s.first_ship >= o.o_orderdate
),
bd AS (
  SELECT o_orderpriority,
         (days // 7) * 5
         + (days % 7)
         - (CASE WHEN ((5 - dow1 - 1) % 7 + 7) % 7 < days % 7 THEN 1 ELSE 0 END)
         - (CASE WHEN ((6 - dow1 - 1) % 7 + 7) % 7 < days % 7 THEN 1 ELSE 0 END)
           AS bdays
  FROM spans
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       floor(avg(bdays) * 10000 + 0.5) / 10000 AS avg_bdays,
       CAST(max(bdays) AS BIGINT) AS max_bdays
FROM bd
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("scalar_business_days", oracle=_BDAYS_ORACLE, tags=("scalar", "datetime"))
def scalar_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day (weekday) lead time from order to first ship, in
    CLOSED FORM: full weeks contribute 5 days each and the remainder
    subtracts Saturday/Sunday hits via modular position checks — no
    calendar table, no explode, pure integer codegen arithmetic (the
    day-of-week derives from epoch-day distance to a known Monday,
    sidestepping Spark's Sunday=1 vs DuckDB's isodow numbering). This
    is the calendar operator every SLA dashboard reimplements, here as
    a reusable exact expression; holiday support composes by
    broadcast-joining a holiday dim and subtracting hits, same plan.
    One fact groupBy (first ship per order) + one fact-fact join on
    the order key."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    ship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("first_ship"))
    spans = (
        o.join(ship, o.o_orderkey == ship.l_orderkey)
        .filter(F.col("first_ship") >= F.col("o_orderdate"))
        .select(
            "o_orderpriority",
            F.datediff(F.col("first_ship"), F.col("o_orderdate")).alias("days"),
            (
                F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-05").cast("date"))
                % 7
            ).alias("dow1"),
        )
    )
    rem = F.col("days") % 7
    sat_hit = F.when(((F.lit(5) - F.col("dow1") - 1) % 7 + 7) % 7 < rem, 1).otherwise(0)
    sun_hit = F.when(((F.lit(6) - F.col("dow1") - 1) % 7 + 7) % 7 < rem, 1).otherwise(0)
    bd = spans.select(
        "o_orderpriority",
        (F.expr("days div 7") * 5 + rem - sat_hit - sun_hit).alias("bdays"),
    )
    return (
        bd.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            _round4(F.avg("bdays")).alias("avg_bdays"),
            F.max("bdays").cast("long").alias("max_bdays"),
        )
        .orderBy("o_orderpriority")
    )
