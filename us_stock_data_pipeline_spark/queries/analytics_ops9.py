"""Round-6 analytics additions, part 9: link prediction by Jaccard
common-neighbors and bitmap activity aggregation — graph-mining and
bitmap-engine patterns over the existing fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Link prediction: Jaccard over the supplier-part bipartite graph
# --------------------------------------------------------------------------

_LINK_TOPN = 20
_LINK_HOT_CAP = 40  # drop parts with more suppliers than this (~p99)

_LINK_ORACLE = f"""
WITH edges0 AS (
  SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
),
hot AS (
  SELECT p FROM edges0 GROUP BY p HAVING count(*) > {_LINK_HOT_CAP}
),
audit AS (
  SELECT CAST(count(*) AS BIGINT) AS n_hot FROM hot
),
edges AS (
  SELECT * FROM edges0 WHERE p NOT IN (SELECT p FROM hot)
),
deg AS (
  SELECT s, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY s
),
common AS (
  SELECT a.s AS s1, b.s AS s2, CAST(count(*) AS BIGINT) AS c
  FROM edges a JOIN edges b ON a.p = b.p AND a.s < b.s
  GROUP BY a.s, b.s
),
scored AS (
  SELECT c.s1, c.s2, c.c AS n_common,
         da.d AS deg1, db.d AS deg2,
         floor(CAST(c.c AS DOUBLE) / (da.d + db.d - c.c) * 1000000 + 0.5) / 1000000
           AS jaccard
  FROM common c
  JOIN deg da ON da.s = c.s1
  JOIN deg db ON db.s = c.s2
)
SELECT s1, s2, n_common, deg1, deg2, jaccard,
       (SELECT n_hot FROM audit) AS n_hot_parts_dropped
FROM scored
ORDER BY jaccard DESC, s1, s2
LIMIT {_LINK_TOPN}
"""


@register("graph_link_prediction_jaccard", oracle=_LINK_ORACLE, tags=("graph", "similarity"))
def graph_link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the supplier-part bipartite graph: score
    supplier pairs by the Jaccard of their part neighborhoods — the
    common-neighbors heuristic behind 'suppliers like yours' and
    co-purchase recommenders (`orders_market_basket` scores ITEM
    pairs by baskets; this scores NODE pairs by shared neighbors,
    and `graph_triangle_count` is its closed-triangle cousin). The
    pair enumeration is an inverted index on the part key (since r14
    an in-row C(k,2) expansion of each part's sorted supplier set) —
    candidates exist ONLY for pairs sharing >= 1 part, never all
    supplier pairs — followed by two broadcast-sized degree joins;
    Jaccard = c/(d1+d2-c) from exact ints with one terminal division.
    The 100 TB hot-part hazard (a part sold by thousands of suppliers
    contributes C(k,2) pairs from ONE key) is guarded by the standard
    frequent-neighbor cutoff: parts with more than {_LINK_HOT_CAP}
    suppliers are dropped from the edge set BEFORE degree and pair
    enumeration (so Jaccard denominators stay consistent with the
    pairs actually enumerated), and the number of dropped parts rides
    out as an `n_hot_parts_dropped` audit column — the same skew
    `skew_heavy_hitters` exists to diagnose. This bounds the
    per-key pair fan-out at C(cap, 2) regardless of data skew."""
    li = load_table(spark, sf_dir, "lineitem")
    # r14 (guide §2.4): ONE part-keyed collect_set rollup replaces the
    # old distinct + hot-degree aggregate + anti-join + pair self-join
    # chain — the sorted supplier set per part IS the distinct edge
    # list, its size is the hot-cap/audit test, degrees come from one
    # explode of the kept sets, and the C(k,2) candidate pairs expand
    # IN-ROW (bounded by the same C(cap,2) invariant). Plan: 2 edge
    # exchanges + 2 joins -> 1 exchange + explode. In-session
    # interleaved A/B at sf0.1: 3.00s -> 1.94s best-of-3, identical
    # output; hash-match sf0.01 + sf0.1.
    plist = registry.track_persist(
        li.groupBy(F.col("l_partkey").alias("p"))
        .agg(F.sort_array(F.collect_set("l_suppkey")).alias("ss"))
        .withColumn("dp", F.size("ss"))
    )
    audit = plist.filter(F.col("dp") > _LINK_HOT_CAP).agg(
        F.count(F.lit(1)).cast("long").alias("n_hot_parts_dropped")
    )
    kept = plist.filter(F.col("dp") <= _LINK_HOT_CAP)
    deg = (
        kept.select(F.explode("ss").alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    common = (
        kept.filter(F.col("dp") >= 2)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ss"),
                        lambda x, i: F.transform(
                            F.slice(F.col("ss"), i + 2, F.size(F.col("ss"))),
                            lambda y: F.struct(x.alias("s1"), y.alias("s2")),
                        ),
                    )
                )
            ).alias("e")
        )
        .groupBy(F.col("e.s1").alias("s1"), F.col("e.s2").alias("s2"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    da = deg.select(F.col("s").alias("s1"), F.col("d").alias("deg1"))
    db = deg.select(F.col("s").alias("s2"), F.col("d").alias("deg2"))
    scored = (
        common.join(F.broadcast(da), "s1")
        .join(F.broadcast(db), "s2")
        .select(
            "s1",
            "s2",
            "n_common",
            "deg1",
            "deg2",
            (
                F.floor(
                    F.col("n_common").cast("double")
                    / (F.col("deg1") + F.col("deg2") - F.col("n_common"))
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("jaccard"),
        )
    )
    return (
        scored.orderBy(F.col("jaccard").desc(), "s1", "s2")
        .limit(_LINK_TOPN)
        .crossJoin(F.broadcast(audit))
    )


# --------------------------------------------------------------------------
# Bitmap activity aggregation (roaring-bitmap-style retention state)
# --------------------------------------------------------------------------

_BITMAP_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) AS d
  FROM events
),
masks AS (
  -- one 64-bit activity bitmap per user: bit d set = active on day d
  SELECT user_id, CAST(sum(CAST(1 AS BIGINT) << d) AS BIGINT) AS mask
  FROM days GROUP BY user_id
)
SELECT CAST(bit_count(mask) AS BIGINT) AS active_days,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(min(mask) AS BIGINT) AS min_mask
FROM masks
GROUP BY bit_count(mask)
ORDER BY active_days
"""


@register("events_activity_bitmap", oracle=_BITMAP_ORACLE, tags=("analytics", "bitmap"))
def events_activity_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-encoded activity state: each user's month compresses to
    ONE 64-bit integer (bit d = active on day d), then the whole
    engagement distribution is a bit_count groupBy — the
    roaring-bitmap pattern retention engines (ClickHouse groupBitmap,
    Druid) use to make N-day-window questions integer ops instead of
    joins. The mask build is one distinct + one sum of power-of-two
    terms (exact: 30 distinct days < 2^63, each term distinct so the
    sum IS the bitwise OR); downstream, any segment overlap question
    becomes mask & mask. Two shuffles total (user distinct, histogram
    groupBy) — and at a year's width the mask widens to an array of
    longs with the identical algebra per word."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.datediff(
            F.date_trunc("day", F.col("ts")).cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("d"),
    ).distinct()
    masks = days.groupBy("user_id").agg(
        F.sum(F.expr("CAST(1 AS BIGINT) << d")).cast("long").alias("mask")
    )
    return (
        masks.groupBy(F.bit_count("mask").cast("long").alias("active_days"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.min("mask").cast("long").alias("min_mask"),
        )
        .orderBy("active_days")
    )
