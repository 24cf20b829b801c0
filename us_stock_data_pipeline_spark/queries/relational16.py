"""Round-7 relational additions, part 16: declarative DQ rule
scorecard, sort-based 1-D nearest-neighbor gaps, multi-aggregate
pivot, and in-flight observe() metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Declarative data-quality rule scorecard
# --------------------------------------------------------------------------

_DQ_ORACLE = """
WITH joined AS (
  SELECT l.*, o.o_orderkey AS fk_hit
  FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
),
wide AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
              AS BIGINT) AS v_qty,
         CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END)
              AS BIGINT) AS v_disc,
         CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS v_ship,
         CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS v_price,
         CAST(sum(CASE WHEN fk_hit IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_fk
  FROM joined
)
,
stacked AS (
  SELECT 'qty_in_1_50' AS rule_id, v_qty AS n_violations, n FROM wide
  UNION ALL SELECT 'discount_in_0_10pct', v_disc, n FROM wide
  UNION ALL SELECT 'shipdate_not_null', v_ship, n FROM wide
  UNION ALL SELECT 'price_positive', v_price, n FROM wide
  UNION ALL SELECT 'orderkey_fk_valid', v_fk, n FROM wide
)
SELECT rule_id, n_violations, n AS n_rows,
       floor((1.0 - CAST(n_violations AS DOUBLE) / n) * 10000 + 0.5) / 10000
         AS pass_rate
FROM stacked
ORDER BY rule_id
"""


@register("etl_dq_rule_scorecard", oracle=_DQ_ORACLE, tags=("etl", "quality"))
def etl_dq_rule_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality rule engine: five rules (range, domain,
    not-null, positivity, referential integrity) evaluated in ONE pass
    over the fact table as conditional sums, then unpivoted into the
    rule/violations/pass-rate scorecard a DQ dashboard ingests — the
    Great-Expectations-style contract check expressed as a single
    wide aggregate instead of five scans (`etl_quarantine_validation`
    routes the failing ROWS; this scores the rules). The FK rule rides
    a left join that stays a hash join on the natural key; everything
    else is map-side CASE arithmetic. Adding a rule is adding one
    column — the scan count stays 1 however many rules accrue.
    Unpivot via stack() on a 1-row aggregate is constant-size work."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("fk_hit")
    )
    joined = li.join(od, li.l_orderkey == od.fk_hit, "left")

    def viol(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    wide = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        viol((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias("v_qty"),
        viol((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).alias("v_disc"),
        viol(F.col("l_shipdate").isNull()).alias("v_ship"),
        viol(F.col("l_extendedprice") <= 0).alias("v_price"),
        viol(F.col("fk_hit").isNull()).alias("v_fk"),
    )
    stacked = wide.select(
        "n",
        F.expr(
            "stack(5,"
            " 'qty_in_1_50', v_qty,"
            " 'discount_in_0_10pct', v_disc,"
            " 'shipdate_not_null', v_ship,"
            " 'price_positive', v_price,"
            " 'orderkey_fk_valid', v_fk) AS (rule_id, n_violations)"
        ),
    )
    return stacked.select(
        "rule_id",
        "n_violations",
        F.col("n").alias("n_rows"),
        (
            F.floor(
                (F.lit(1.0) - F.col("n_violations").cast("double") / F.col("n"))
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("pass_rate"),
    ).orderBy("rule_id")


# --------------------------------------------------------------------------
# 1-D nearest-neighbor gap profile (sort-based, no join)
# --------------------------------------------------------------------------

_GAP_ORACLE = """
WITH priced AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderkey
  FROM orders
),
gaps AS (
  SELECT o_orderpriority,
         cents - lag(cents) OVER (PARTITION BY o_orderpriority
                                  ORDER BY cents, o_orderkey) AS gap
  FROM priced
)
SELECT o_orderpriority,
       CAST(count(gap) AS BIGINT) AS n_gaps,
       CAST(min(gap) AS BIGINT) AS min_gap_cents,
       CAST(max(gap) AS BIGINT) AS max_gap_cents,
       floor(avg(CAST(gap AS DOUBLE)) * 100 + 0.5) / 100 AS avg_gap_cents
FROM gaps
WHERE gap IS NOT NULL
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("join_nearest_numeric_1d", oracle=_GAP_ORACLE, tags=("relational", "join"))
def join_nearest_numeric_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D nearest-neighbor gap profile: for every order, the distance
    to the next-closest order value within its priority class, found
    by SORTING and differencing consecutive rows — the degenerate-
    but-important case of similarity join where one dimension makes
    the O(n^2) candidate join collapse into a window lag (the same
    reason `join_asof` beats a theta join: order + adjacency). The
    gap histogram (min/max/avg per class) is the fuzzy-matching
    tolerance calibrator: pick epsilon below the typical gap and a
    banded join stays selective. One shuffle on the class key, exact
    integer cents throughout."""
    od = load_table(spark, sf_dir, "orders")
    priced = od.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    gaps = priced.select(
        "o_orderpriority", (F.col("cents") - F.lag("cents").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    return (
        gaps.groupBy("o_orderpriority")
        .agg(
            F.count("gap").cast("long").alias("n_gaps"),
            F.min("gap").cast("long").alias("min_gap_cents"),
            F.max("gap").cast("long").alias("max_gap_cents"),
            (
                F.floor(F.avg(F.col("gap").cast("double")) * 100 + F.lit(0.5)) / 100
            ).alias("avg_gap_cents"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Pivot with multiple simultaneous aggregates
# --------------------------------------------------------------------------

_PIVOT_MULTI_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(round(l_extendedprice * 100)
                AS BIGINT) ELSE 0 END) AS BIGINT) AS f_cents,
       CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_rows,
       CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(round(l_extendedprice * 100)
                AS BIGINT) ELSE 0 END) AS BIGINT) AS o_cents,
       CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("pivot_multi_agg", oracle=_PIVOT_MULTI_ORACLE, tags=("relational", "reshape"))
def pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with MULTIPLE simultaneous aggregates per cell: line
    status pivots to columns carrying both exact revenue cents and row
    counts (`pivot_counts` pivots one measure; real finance crosstabs
    need several). Spark's groupBy().pivot(values).agg(a, b) compiles
    to ONE hash aggregate whose working columns are the
    values x measures cross product — the listed pivot values keep
    the schema static so no discovery pass runs, and partial
    aggregation still combines map-side. The oracle spells the same
    thing as conditional sums, pinning the semantics pivot sugar
    expands to."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.coalesce(F.sum(cents), F.lit(0)).cast("long").alias("cents"),
            F.count(F.lit(1)).cast("long").alias("rows"),
        )
    )
    return piv.select(
        "l_returnflag",
        F.coalesce(F.col("F_cents"), F.lit(0)).cast("long").alias("f_cents"),
        F.coalesce(F.col("F_rows"), F.lit(0)).cast("long").alias("f_rows"),
        F.coalesce(F.col("O_cents"), F.lit(0)).cast("long").alias("o_cents"),
        F.coalesce(F.col("O_rows"), F.lit(0)).cast("long").alias("o_rows"),
    ).orderBy("l_returnflag")


# --------------------------------------------------------------------------
# In-flight observe() metrics
# --------------------------------------------------------------------------

_OBSERVE_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nonpositive,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents
FROM orders
WHERE o_orderstatus <> 'X'
"""


@register("etl_observe_inflight_metrics", oracle=_OBSERVE_ORACLE, tags=("etl", "observability"))
def etl_observe_inflight_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-flight pipeline metrics via Spark's Observation/observe()
    API: the filter stage is instrumented with named aggregate
    metrics (row count, non-positive amounts, exact cent total and
    max — observe() forbids distinct aggregates) that accumulate
    DURING the pass — zero
    extra scans, zero extra shuffles — exactly how production jobs
    attach DQ counters to a write without paying a second job
    (`etl_dq_rule_scorecard` is the standalone audit; this shows the
    piggy-backed form). The observed values come back as a 1-row
    DataFrame. On a cluster the metrics merge from every task like
    any partial aggregate; the driver holds only the final 4
    numbers."""
    od = load_table(spark, sf_dir, "orders")
    obs = Observation("dq")
    instrumented = od.filter(F.col("o_orderstatus") != "X").observe(
        obs,
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("n_nonpositive"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("total_cents"),
        F.max(F.round(F.col("o_totalprice") * 100).cast("long")).alias("max_cents"),
    )
    instrumented.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["n_nonpositive"]),
                int(m["total_cents"]),
                int(m["max_cents"]),
            )
        ],
        "n_rows long, n_nonpositive long, total_cents long, max_cents long",
    )
