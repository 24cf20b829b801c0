"""Round-5 analytics additions, part 3: market-basket association
rules, RFM customer segmentation, session path analysis, and
inter-arrival distribution fitting.

House contract: Spark-first plans, identically-aliased DuckDB oracles,
floats rounded identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Market-basket association rules
# --------------------------------------------------------------------------

_BASKET_ORACLE = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n_orders AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM lineitem
),
part_supp AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS supp FROM items GROUP BY 1
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS pair_supp
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey AND b.l_partkey > a.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 3
),
scored AS (
  SELECT p.part_a, p.part_b, p.pair_supp,
         round(p.pair_supp * 1.0 / sa.supp, 4) AS conf_a_to_b,
         round(p.pair_supp * 1.0 * n.n / (sa.supp * sb.supp), 4) AS lift
  FROM pairs p
  JOIN part_supp sa ON sa.l_partkey = p.part_a
  JOIN part_supp sb ON sb.l_partkey = p.part_b
  CROSS JOIN n_orders n
)
SELECT part_a, part_b, pair_supp, conf_a_to_b, lift
FROM scored
ORDER BY lift DESC, part_a, part_b
LIMIT 50
"""


@register("orders_market_basket", oracle=_BASKET_ORACLE, tags=("analytics", "association"))
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules: part pairs co-purchased in the
    same order, scored by support / confidence / lift. The pair
    generation is a SELF-JOIN CO-PARTITIONED ON THE BASKET KEY — both
    sides shuffle once on l_orderkey and pairs explode only WITHIN a
    basket (sum of k_i^2 work, never |items|^2), which is what keeps
    frequent-itemset counting tractable at 100 TB: basket sizes are
    bounded (~4 parts here, tens in retail), so the blowup factor is a
    constant, not data-sized. Support pruning (HAVING >= 3) happens on
    aggregated state; the per-part support and order-count tables that
    score the rules are broadcast-sized. Top-50 by lift compiles to
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = items.agg(F.countDistinct("l_orderkey").alias("n"))
    part_supp = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("supp"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("b.l_partkey") > F.col("a.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("pair_supp"))
        .filter(F.col("pair_supp") >= 3)
    )
    sa = part_supp.select(F.col("l_partkey").alias("part_a"), F.col("supp").alias("supp_a"))
    sb = part_supp.select(F.col("l_partkey").alias("part_b"), F.col("supp").alias("supp_b"))
    return (
        pairs.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "pair_supp",
            F.round(F.col("pair_supp") * 1.0 / F.col("supp_a"), 4).alias("conf_a_to_b"),
            F.round(
                F.col("pair_supp") * 1.0 * F.col("n") / (F.col("supp_a") * F.col("supp_b")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(50)
    )


# --------------------------------------------------------------------------
# RFM customer segmentation
# --------------------------------------------------------------------------

_RFM_ORACLE = """
WITH rfm AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         CAST(count(*) AS BIGINT) AS frequency,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
scored AS (
  SELECT o_custkey, cents,
         ntile(5) OVER (ORDER BY last_order, o_custkey) AS r_score,
         ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
         ntile(5) OVER (ORDER BY cents, o_custkey) AS m_score
  FROM rfm
)
SELECT CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(count(*) AS BIGINT) AS n_customers,
       (sum(cents) // count(*)) / 100.0 AS avg_monetary
FROM scored
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


@register("customer_rfm_segments", oracle=_RFM_ORACLE, tags=("analytics", "segmentation"))
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quintile scores for Recency / Frequency /
    Monetary per customer (5 = most recent / frequent / valuable), then
    the segment-cell census. Monetary is ROUNDED BEFORE ranking so the
    ntile order is identical on both engines (an unrounded double sum
    differs in the last ulp and could flip a quintile boundary). The
    corpus-sized stage is one orders groupBy; the three ntile windows
    run over the per-customer table (|customers| rows), and — as with
    `events_pareto_gini` — past single-node customer counts the exact
    ntile swaps for percentile-boundary bucketing computed from
    approx quantiles, a localized plan change."""
    o = load_table(spark, sf_dir, "orders")
    # Monetary is carried as EXACT integer cents end-to-end: a double sum
    # of ~$2.5M order totals lands on half-cent rounding boundaries under
    # different summation orders, flipping both the m_score ntile and the
    # cell average between engines. round(x*100) per ROW is exact (order
    # totals have 2 decimals), and integer sums are order-invariant.
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
    )
    scored = rfm.select(
        "cents",
        F.ntile(5).over(W.orderBy("last_order", "o_custkey")).cast("long").alias("r_score"),
        F.ntile(5).over(W.orderBy("frequency", "o_custkey")).cast("long").alias("f_score"),
        F.ntile(5).over(W.orderBy("cents", "o_custkey")).cast("long").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            # floor-divide in integer cents THEN scale: an exact-half
            # average (x.5 cents) round()s differently in Spark (decimal
            # HALF_UP) vs DuckDB (binary-double nearest) — integer
            # arithmetic has no boundary to disagree on
            (F.expr("sum(cents) div count(1)") / 100.0).alias("avg_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# --------------------------------------------------------------------------
# Session path analysis
# --------------------------------------------------------------------------

_PATH_ORACLE = """
WITH seq AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         list(event_type ORDER BY ts, event_id) AS path0
  FROM events GROUP BY 1, 2
),
paths AS (
  SELECT array_to_string(list_slice(path0, 1, 5), '>') AS path FROM seq
),
counted AS (
  SELECT path, CAST(count(*) AS BIGINT) AS n FROM paths GROUP BY 1
),
ranked AS (
  SELECT path, n, row_number() OVER (ORDER BY n DESC, path) AS rnk FROM counted
)
SELECT CAST(rnk AS BIGINT) AS rnk, path, n
FROM ranked WHERE rnk <= 20
ORDER BY rnk
"""


@register("events_path_analysis", oracle=_PATH_ORACLE, tags=("analytics", "sequence"))
def events_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey paths: each (user, day) session's first five
    event types as an ordered '>'-joined path, counted and ranked —
    sequence mining's bread-and-butter readout. Ordered collection is
    expressed as collect_list of (ts, event_id, type) structs +
    array_sort — struct ordering is lexicographic by field position,
    so the sort key and tie-break ride INSIDE the aggregate, needing
    no pre-shuffle sort; truncation to 5 steps caps per-session state
    (a runaway bot session can't blow up the row). One shuffle on the
    session key, one on the path string for the count, and top-20 via
    TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("sorted0")
    )
    path = F.concat_ws(
        ">", F.slice(F.transform("sorted0", lambda s: s["event_type"]), 1, 5)
    )
    counted = seq.select(path.alias("path")).groupBy("path").agg(
        F.count(F.lit(1)).alias("n")
    )
    rnk = F.row_number().over(W.orderBy(F.desc("n"), "path")).cast("long")
    return (
        counted.withColumn("rnk", rnk)
        .filter(F.col("rnk") <= 20)
        .select("rnk", "path", "n")
        .orderBy("rnk")
    )


# --------------------------------------------------------------------------
# Inter-arrival distribution fit
# --------------------------------------------------------------------------

_INTERARRIVAL_ORACLE = """
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY event_type ORDER BY ts, event_id) AS g
  FROM events
)
SELECT event_type,
       CAST(count(g) AS BIGINT) AS n_gaps,
       round(avg(g) / 1e6, 4) AS mean_s,
       round(quantile_cont(g, 0.5) / 1e6, 4) AS median_s,
       round(quantile_cont(g, 0.9) / 1e6, 4) AS p90_s,
       round(quantile_cont(g, 0.5) / avg(g), 4) AS median_over_mean
FROM gaps
WHERE g IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


@register("events_interarrival_fit", oracle=_INTERARRIVAL_ORACLE, tags=("analytics", "stats"))
def events_interarrival_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time profile per stream: mean / median / p90 gap
    and the median/mean ratio — for a Poisson process that ratio is
    ln 2 ~ 0.693, so drift away from it flags burstiness (ratio lower)
    or regular scheduling (ratio near 1). Gaps come from one lag()
    window; the window partition key IS the subsequent groupBy key, so
    the single event_type shuffle serves both (the SCD2 exchange-reuse
    contract). Integer microsecond gaps keep the lag arithmetic exact;
    only the final summaries are floats, rounded identically on both
    engines (Spark percentile == DuckDB quantile_cont)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type", (us - F.lag(us).over(w)).alias("g")
    ).filter(F.col("g").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("g").alias("n_gaps"),
            F.round(F.avg("g") / 1e6, 4).alias("mean_s"),
            F.round(F.expr("percentile(g, 0.5)") / 1e6, 4).alias("median_s"),
            F.round(F.expr("percentile(g, 0.9)") / 1e6, 4).alias("p90_s"),
            F.round(F.expr("percentile(g, 0.5)") / F.avg("g"), 4).alias(
                "median_over_mean"
            ),
        )
        .orderBy("event_type")
    )
