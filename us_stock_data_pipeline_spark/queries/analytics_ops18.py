"""Round-7 analytics additions, part 18: price-volume-mix bridge,
multi-criteria supplier scorecard, and growth accounting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Price-volume-mix (PVM) bridge between two years
# --------------------------------------------------------------------------

_PVM_Y1, _PVM_Y2 = 1998, 1999

_PVM_ORACLE = f"""
WITH yearly AS (
  SELECT p.p_type, year(o.o_orderdate) AS yr,
         CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS cents,
         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE year(o.o_orderdate) IN ({_PVM_Y1}, {_PVM_Y2})
  GROUP BY 1, 2
),
paired AS (
  SELECT a.p_type,
         a.cents AS c1, a.qty AS q1, b.cents AS c2, b.qty AS q2
  FROM yearly a JOIN yearly b
    ON b.p_type = a.p_type AND a.yr = {_PVM_Y1} AND b.yr = {_PVM_Y2}
  WHERE a.qty > 0 AND b.qty > 0
)
SELECT p_type,
       CAST(c2 - c1 AS BIGINT) AS delta_cents,
       CAST(floor((CAST(c2 AS DOUBLE) / q2 - CAST(c1 AS DOUBLE) / q1) * q2 + 0.5)
         AS BIGINT) AS price_effect_cents,
       CAST(floor(CAST(c1 AS DOUBLE) / q1 * (q2 - q1) + 0.5) AS BIGINT)
         AS volume_effect_cents
FROM paired
ORDER BY p_type
"""


@register("lineitem_pvm_bridge", oracle=_PVM_ORACLE, tags=("analytics", "finance"))
def lineitem_pvm_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix bridge: decompose each product type's
    year-over-year revenue change into a PRICE effect ((p2-p1)*q2)
    and a VOLUME effect (p1*(q2-q1)) — the CFO-review decomposition
    that answers "did we sell more, or just at different prices"
    (`lineitem_revenue_waterfall` bridges by DEDUCTION step; this
    bridges by CAUSE, and the two effects reconstruct the delta
    exactly by algebra). Inputs are exact integer cents/quantities
    from one fact groupBy; average prices divide once per
    (type, year) and the effects round at the end. One fact pass,
    one self-join on the tiny (type, year) aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    yearly = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(F.year("o_orderdate").isin(_PVM_Y1, _PVM_Y2))
        .groupBy("p_type", F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            )
            .cast("long")
            .alias("cents"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
        )
    )
    a = yearly.filter(F.col("yr") == _PVM_Y1).select(
        "p_type", F.col("cents").alias("c1"), F.col("qty").alias("q1")
    )
    b = yearly.filter(F.col("yr") == _PVM_Y2).select(
        "p_type", F.col("cents").alias("c2"), F.col("qty").alias("q2")
    )
    paired = a.join(b, "p_type").filter((F.col("q1") > 0) & (F.col("q2") > 0))
    p1 = F.col("c1").cast("double") / F.col("q1")
    p2 = F.col("c2").cast("double") / F.col("q2")
    return paired.select(
        "p_type",
        (F.col("c2") - F.col("c1")).cast("long").alias("delta_cents"),
        F.floor((p2 - p1) * F.col("q2") + F.lit(0.5)).alias("price_effect_cents"),
        F.floor(p1 * (F.col("q2") - F.col("q1")) + F.lit(0.5)).alias(
            "volume_effect_cents"
        ),
    ).orderBy("p_type")


# --------------------------------------------------------------------------
# Multi-criteria weighted supplier scorecard
# --------------------------------------------------------------------------

_SCORE_ORACLE = """
WITH metrics AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
              AS BIGINT) AS cents,
         CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
         max(l_shipdate) AS last_ship
  FROM lineitem GROUP BY l_suppkey
),
ranked AS (
  SELECT l_suppkey, cents, n_parts,
         row_number() OVER (ORDER BY cents DESC, l_suppkey) AS r_rev,
         row_number() OVER (ORDER BY n_parts DESC, l_suppkey) AS r_breadth,
         row_number() OVER (ORDER BY last_ship DESC, l_suppkey) AS r_recency
  FROM metrics
)
SELECT r.l_suppkey AS s_suppkey, s.s_name, r.cents, r.n_parts,
       CAST(2 * r.r_rev + r.r_breadth + r.r_recency AS BIGINT) AS weighted_rank,
       CAST(r.r_rev AS BIGINT) AS r_rev,
       CAST(r.r_breadth AS BIGINT) AS r_breadth,
       CAST(r.r_recency AS BIGINT) AS r_recency
FROM ranked r JOIN supplier s ON s.s_suppkey = r.l_suppkey
ORDER BY weighted_rank, s_suppkey
"""


@register("supplier_weighted_scorecard", oracle=_SCORE_ORACLE, tags=("analytics", "ranking"))
def supplier_weighted_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-criteria supplier scorecard: rank every supplier on
    revenue (weight 2), catalog breadth, and shipment recency, then
    combine the RANKS (a Borda count) rather than the raw metrics —
    the procurement-review standard because rank combination needs no
    unit normalization and is immune to one metric's outliers
    (`q15_top_supplier` maximizes ONE metric; real vendor reviews
    weigh several). Each rank is a deterministic row_number with a
    key tiebreak over the supplier-cardinality metrics table; the
    three windows are all global orders over that TINY table, not the
    fact table — the one fact pass is the metrics groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    metrics = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                "long"
            )
        )
        .cast("long")
        .alias("cents"),
        F.countDistinct("l_partkey").cast("long").alias("n_parts"),
        F.max("l_shipdate").alias("last_ship"),
    )
    ranked = metrics.select(
        "l_suppkey",
        "cents",
        "n_parts",
        F.row_number()
        .over(Window.orderBy(F.col("cents").desc(), "l_suppkey"))
        .alias("r_rev"),
        F.row_number()
        .over(Window.orderBy(F.col("n_parts").desc(), "l_suppkey"))
        .alias("r_breadth"),
        F.row_number()
        .over(Window.orderBy(F.col("last_ship").desc(), "l_suppkey"))
        .alias("r_recency"),
    )
    return (
        ranked.join(F.broadcast(supp), ranked.l_suppkey == supp.s_suppkey)
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            "cents",
            "n_parts",
            (2 * F.col("r_rev") + F.col("r_breadth") + F.col("r_recency"))
            .cast("long")
            .alias("weighted_rank"),
            F.col("r_rev").cast("long").alias("r_rev"),
            F.col("r_breadth").cast("long").alias("r_breadth"),
            F.col("r_recency").cast("long").alias("r_recency"),
        )
        .orderBy("weighted_rank", "s_suppkey")
    )


# --------------------------------------------------------------------------
# Growth accounting (new / retained / resurrected per day)
# --------------------------------------------------------------------------

_RESURRECT_GAP_DAYS = 7

_GROWTH_ORACLE = f"""
WITH active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
labeled AS (
  SELECT user_id, d,
         lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
  FROM active
),
classed AS (
  SELECT d,
         CASE WHEN prev_d IS NULL THEN 'new'
              WHEN date_diff('day', prev_d, d) > {_RESURRECT_GAP_DAYS}
                THEN 'resurrected'
              ELSE 'retained' END AS status
  FROM labeled
)
SELECT d,
       CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_retained,
       CAST(sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_resurrected,
       CAST(count(*) AS BIGINT) AS n_active
FROM classed
GROUP BY d
ORDER BY d
"""


@register("events_growth_accounting", oracle=_GROWTH_ORACLE, tags=("analytics", "retention"))
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: every active user-day classified as NEW
    (first appearance), RETAINED (active within the last
    {_RESURRECT_GAP_DAYS} days), or RESURRECTED (returning after a
    longer gap) — the standard decomposition of "active users went
    up" into acquisition vs engagement vs win-back, which
    `events_retention` (cohort curves) and `events_rolling_dau_wau`
    (volume) don't separate. Classification is one lag over the
    DISTINCT user-day table (far smaller than events) with exact
    integer day gaps; the daily rollup re-keys by date. Two shuffles
    — user for the lag, day for the report — both on natural keys."""
    ev = load_table(spark, sf_dir, "events")
    active = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    labeled = active.select("d", F.lag("d").over(w).alias("prev_d"))
    status = (
        F.when(F.col("prev_d").isNull(), "new")
        .when(F.datediff("d", "prev_d") > _RESURRECT_GAP_DAYS, "resurrected")
        .otherwise("retained")
    )
    classed = labeled.select("d", status.alias("status"))
    return (
        classed.groupBy("d")
        .agg(
            F.sum(F.when(F.col("status") == "new", 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
            F.sum(F.when(F.col("status") == "retained", 1).otherwise(0))
            .cast("long")
            .alias("n_retained"),
            F.sum(F.when(F.col("status") == "resurrected", 1).otherwise(0))
            .cast("long")
            .alias("n_resurrected"),
            F.count(F.lit(1)).cast("long").alias("n_active"),
        )
        .orderBy("d")
    )
