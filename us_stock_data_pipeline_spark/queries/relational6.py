"""Relational surface, part 6: the rest of the TPC-H-adaptable suite.

With Q1/Q3/Q5/Q10 already registered (relational.py / relational3.py),
this module adds every remaining TPC-H query expressible over the
fixture's column subset (FIXTURES.md): Q4, Q6, Q7, Q8, Q12, Q13, Q14,
Q15, Q16, Q17, Q18, Q19, Q22 — adapted where the fixture lacks a column
(no partsupp table, no l_shipmode/l_commitdate/l_receiptdate, no
p_container/c_phone; adaptations are noted per query — Q12 derives a
deterministic shipmode, mirrored in its oracle). Q2/Q9/Q11/Q20/Q21 need
partsupp or commit/receipt dates and are therefore out of fixture scope.

Together these exercise the reporting shapes a warehouse actually runs:
EXISTS/NOT-EXISTS decorrelation, scalar and correlated subqueries,
CASE-ratio aggregates, two-level aggregation, HAVING pushes, disjunctive
predicate pushdown — each docstring carries the 100 TB plan rationale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS semi-join)
# --------------------------------------------------------------------------

Q4_ORACLE = """
SELECT
  o_orderpriority,
  CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("q4_order_priority", oracle=Q4_ORACLE, tags=("join", "subquery", "agg"))
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority check (TPC-H Q4 shape, adapted: the fixture has no
    l_commitdate/l_receiptdate, so "late" = shipped >60 days after order
    date). The EXISTS decorrelates to a LEFT SEMI join on l_orderkey with
    the date comparison as a residual — each order row survives at most
    once no matter how many late lines it has, and the semi join shuffles
    only the key + two date columns. Catalyst plans exactly that from the
    declarative form; no distinct-after-inner-join workaround needed."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q6 — forecasting revenue change (pure scan + filter + global agg)
# --------------------------------------------------------------------------

Q6_ORACLE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=Q6_ORACLE, tags=("scan", "filter", "agg"), bench=True)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue-change (TPC-H Q6): the purest scan-bound query in
    the suite — conjunctive range predicates and one global sum, no join,
    no grouping. Every predicate pushes to the parquet scan (row-group
    stats prune on l_shipdate), the projection reads 4 of 11 columns, and
    the aggregate is a two-stage partial/final with O(1) state. At 100 TB
    this runs at storage bandwidth; it is the canonical pushdown
    litmus test, which is why it's in the bench headline set."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# --------------------------------------------------------------------------

Q7_ORACLE = """
SELECT
  supp_nation,
  cust_nation,
  l_year,
  round(sum(volume), 2) AS revenue
FROM (
  SELECT
    n1.n_name AS supp_nation,
    n2.n_name AS cust_nation,
    CAST(year(l_shipdate) AS BIGINT) AS l_year,
    l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_9')
      OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_7'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", oracle=Q7_ORACLE, tags=("join", "agg"))
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume (TPC-H Q7): revenue shipped between two
    nations in either direction, by year. The nation table joins twice
    under different roles (supplier side / customer side) — both
    broadcast, so the disjunctive nation-pair predicate is evaluated as a
    residual on the broadcast joins and prunes the fact rows before the
    big lineitem<->orders shuffle output reaches the aggregate. Group
    state is O(2 nations x 2 years)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_9")
    ) | ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_7"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q8 — national market share (CASE-ratio aggregate)
# --------------------------------------------------------------------------

Q8_ORACLE = """
SELECT
  o_year,
  round(sum(CASE WHEN supp_nation = 'NATION_9' THEN volume ELSE 0 END)
        / sum(volume), 6) AS mkt_share
FROM (
  SELECT
    CAST(year(o_orderdate) AS BIGINT) AS o_year,
    l_extendedprice * (1 - l_discount) AS volume,
    n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@register("q8_market_share", oracle=Q8_ORACLE, tags=("join", "agg"))
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape, adapted: p_type is a single
    word in the fixture, so the part filter is equality on 'PROMO'): one
    nation's share of PROMO-part revenue sold into ASIA, per year. The
    share is a CASE-guarded sum over the same aggregate pass as the
    denominator — one shuffle computes both, instead of two queries
    joined. part/supplier/nation/region all broadcast; only
    lineitem<->orders<->customer shuffle."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_regionkey")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    volume = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_regionkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .select(F.year("o_orderdate").cast("long").alias("o_year"), volume, "supp_nation")
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_9", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution (two-level aggregate)
# --------------------------------------------------------------------------

Q13_ORACLE = """
SELECT
  c_count,
  CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_customer_distribution", oracle=Q13_ORACLE, tags=("join", "agg"))
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13): histogram of "how
    many customers placed k orders", keeping zero-order customers via the
    left outer join (count(o_orderkey) skips the null-extended rows — the
    outer-join-then-count-non-null idiom). Two cascaded aggregates: the
    first shuffles by custkey, the second by the tiny c_count domain; the
    second shuffle moves O(customers) pre-shrunk rows, not facts."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------------
# Q14 — promotion revenue ratio
# --------------------------------------------------------------------------

Q14_ORACLE = """
SELECT
  round(100.00 * sum(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END)
        / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


@register("q14_promo_revenue", oracle=Q14_ORACLE, tags=("join", "agg"))
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue percentage (TPC-H Q14): share of one month's
    revenue from PROMO parts. The month filter prunes the lineitem scan;
    part broadcasts (it only contributes the p_type flag); numerator and
    denominator come out of one O(1)-state global aggregate — the
    standard shape for any "percent of revenue from X" metric at scale."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


# --------------------------------------------------------------------------
# Q15 — top supplier by quarterly revenue (scalar-max subquery)
# --------------------------------------------------------------------------

Q15_ORACLE = """
WITH revenue AS (
  SELECT
    l_suppkey AS supplier_no,
    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@register("q15_top_supplier", oracle=Q15_ORACLE, tags=("join", "subquery", "agg"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15): the supplier(s) achieving the maximum
    quarterly revenue. The revenue CTE is computed once and reused for
    both the scalar max and the equality filter (Spark: a cached-plan
    reuse; the aggregate output is O(suppliers), so the "self-join against
    own max" costs nothing at any scale). Revenue is rounded BEFORE the
    max comparison on both engines so the tie surface is identical."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(revenue, supp.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q16 — supplier count by part attributes (NOT IN + count distinct)
# --------------------------------------------------------------------------

Q16_ORACLE = """
SELECT
  p_brand,
  p_type,
  p_size,
  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'ECONOMY'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%3%'
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("q16_parts_supplier_cnt", oracle=Q16_ORACLE, tags=("join", "subquery", "agg"))
def q16_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship (TPC-H Q16 shape, adapted: the fixture
    has no partsupp, so supplier counts come from lineitem's observed
    (part, supplier) pairs; the complaint filter is a name LIKE). NOT IN
    over a non-null key column decorrelates to LEFT ANTI join (broadcast —
    the excluded list is tiny); count(DISTINCT) shuffles (group keys +
    suppkey) once, then de-dups in-partition before the final count."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "ECONOMY")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    li = load_table(spark, sf_dir, "lineitem")
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%3%"))
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(excluded), li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated average subquery)
# --------------------------------------------------------------------------

Q17_ORACLE = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity)
    FROM lineitem l2
    WHERE l2.l_partkey = part.p_partkey
  )
"""


@register("q17_small_qty_revenue", oracle=Q17_ORACLE, tags=("join", "subquery", "agg"))
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17, adapted: correlation on
    p_partkey only — the fixture has no p_container). The correlated avg
    decorrelates to a per-partkey aggregate joined back to the facts; the
    threshold side aggregates the FULL lineitem (not just Brand#23), as
    the oracle's correlated subquery does. The per-part aggregate is
    O(parts) and broadcast; the brand filter prunes the probe side before
    the join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(per_part_avg), li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING over fact aggregate)
# --------------------------------------------------------------------------

Q18_ORACLE = """
SELECT
  c_name,
  c_custkey,
  o_orderkey,
  o_orderdate,
  round(o_totalprice, 2) AS o_totalprice,
  sum_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(l_quantity) > 300
) big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


@register("q18_large_volume_customer", oracle=Q18_ORACLE, tags=("join", "agg", "topk"))
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18): orders whose total quantity
    exceeds 300 units, with their customers, top-100 by price. Aggregating
    lineitem FIRST shrinks the fact table to O(orders passing HAVING)
    before any join — the surviving set is small enough to broadcast
    against orders, inverting the usual fact<->dim direction. sum_qty sums
    integer-valued doubles, so it is exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive multi-band predicate)
# --------------------------------------------------------------------------

Q19_ORACLE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 35)
"""


@register("q19_disjunctive_revenue", oracle=Q19_ORACLE, tags=("join", "filter", "agg"))
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue (TPC-H Q19 shape, adapted to brand/size/quantity
    bands — the fixture has no container/shipmode). The three OR'd
    conjunct bands straddle the join: Catalyst pushes the derivable
    disjunction (brand IN ... on part, quantity range union on lineitem)
    below the join and keeps the full predicate as a post-join residual —
    the filter-pull/push dance that makes disjunctive star filters
    scan-bound instead of join-bound."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    band = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 35)
    )
    return joined.filter(band).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


# --------------------------------------------------------------------------
# Q22 — global sales opportunity (anti join + scalar avg subquery)
# --------------------------------------------------------------------------

Q22_ORACLE = """
SELECT
  cntrycode,
  CAST(count(*) AS BIGINT) AS numcust,
  round(sum(c_acctbal), 2) AS totacctbal
FROM (
  SELECT c_custkey % 10 AS cntrycode, c_acctbal
  FROM customer
  WHERE c_custkey % 10 IN (1, 3, 5, 7)
    AND c_acctbal > (
      SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0
    )
    AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
) custsale
GROUP BY cntrycode
ORDER BY cntrycode
"""


@register("q22_global_sales_opportunity", oracle=Q22_ORACLE, tags=("join", "subquery", "agg"))
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity (TPC-H Q22 shape, adapted: the fixture has
    no c_phone, so the country code is custkey % 10, and since nearly
    every fixture customer has SOME order, dormancy = no URGENT order).
    Three classic
    rewrites in one query: the scalar avg subquery broadcasts as a 1-row
    cross join, NOT EXISTS decorrelates to LEFT ANTI on o_custkey, and the
    residual modulo filter evaluates at the scan. The anti join is the
    only shuffle over data proportional to orders; everything after is
    O(qualifying customers)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.filter((F.col("c_custkey") % 10).isin(1, 3, 5, 7))
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select((F.col("c_custkey") % 10).alias("cntrycode"), "c_acctbal")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# --------------------------------------------------------------------------
# Q12 — shipping modes and order priority (derived shipmode)
# --------------------------------------------------------------------------

# The fixture has no l_shipmode; derive one deterministically from the line
# identity with pure integer arithmetic (NOT an engine hash function —
# Spark's hash() and DuckDB's hash() disagree, plain * and % do not).
# Multipliers are primes sized so the product stays far below 2^63 on both
# engines (no silent-wrap vs HUGEINT-promotion divergence).
_SHIPMODES = ("REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB")
_SHIPMODE_IDX = "((l_orderkey % 1000003) * 7919 + l_linenumber * 104729) % 7"

Q12_ORACLE = f"""
WITH li AS (
  SELECT l_orderkey,
         list_extract({list(_SHIPMODES)!r}, CAST({_SHIPMODE_IDX} AS INTEGER) + 1)
           AS l_shipmode
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT
  l_shipmode,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
    AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
    AS low_line_count
FROM orders JOIN li ON o_orderkey = l_orderkey
WHERE l_shipmode IN ('MAIL', 'SHIP')
GROUP BY l_shipmode
ORDER BY l_shipmode
"""


@register("q12_shipping_modes", oracle=Q12_ORACLE, tags=("join", "agg"))
def q12_shipping_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping modes vs order priority (TPC-H Q12 shape, adapted: the
    fixture has no l_shipmode/l_commitdate/l_receiptdate, so shipmode is
    a deterministic 7-way integer bucketing of the line identity —
    mirrored exactly in the oracle — and the receipt-year filter becomes
    a ship-year filter). The plan is the canonical conditional-sum join:
    the shipmode IN filter and the date range both evaluate at the
    lineitem scan (pushed predicates on l_shipdate; the derived column
    filter right above it), so only ~2/7 of one year's lines shuffle to
    the orders join, and the CASE-sums are two-stage partial aggregates.
    At 100 TB the join shuffles on l_orderkey; orders' two used columns
    shuffle with it — nothing wider survives column pruning."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            F.element_at(
                F.array(*[F.lit(m) for m in _SHIPMODES]),
                (F.expr(_SHIPMODE_IDX).cast("int") + 1),
            ).alias("l_shipmode"),
        )
        .filter(F.col("l_shipmode").isin("MAIL", "SHIP"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_shipmode")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
        .orderBy("l_shipmode")
    )
