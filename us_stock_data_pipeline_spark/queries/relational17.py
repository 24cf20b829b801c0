"""Round-7 relational additions, part 17: adapted variants of the
partsupp-dependent TPC-H queries (Q2, Q9, Q11, Q20, Q21). The fixture
has no partsupp table (TESTDATA.md), so each keeps the REFERENCE
QUERY'S JOIN/SUBQUERY STRUCTURE but sources cost/stock facts from
lineitem history — the adaptation is data, not shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Q2 (adapted) — minimum-cost supplier per part within a region
# --------------------------------------------------------------------------

_Q2_ORACLE = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT)) AS unit_cents
  FROM lineitem WHERE l_quantity > 0
  GROUP BY l_partkey, l_suppkey
),
regional AS (
  SELECT c.l_partkey, c.l_suppkey, c.unit_cents, s.s_name, s.s_acctbal, n.n_name
  FROM cost c
  JOIN supplier s ON s.s_suppkey = c.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
),
best AS (
  SELECT l_partkey, min(unit_cents) AS best_cents FROM regional GROUP BY l_partkey
)
SELECT p.p_partkey, p.p_name, g.s_name, g.n_name, g.unit_cents,
       floor(g.s_acctbal * 100 + 0.5) / 100 AS s_acctbal
FROM regional g
JOIN best b ON b.l_partkey = g.l_partkey AND g.unit_cents = b.best_cents
JOIN part p ON p.p_partkey = g.l_partkey
WHERE p.p_type = 'ECONOMY'
ORDER BY g.s_acctbal DESC, g.n_name, g.s_name, p.p_partkey
LIMIT 20
"""


@register("q2_min_cost_supplier", oracle=_Q2_ORACLE, tags=("join", "subquery", "tpch"))
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 shape, adapted: supply cost =
    the supplier's best observed unit price from lineitem history,
    since the fixture has no partsupp). Keeps Q2's signature
    structure — a correlated min-cost subquery per part, resolved as
    aggregate-then-rejoin rather than a per-row subquery — plus the
    region-restricted dim chain and the acctbal-ordered top 20.
    Dims broadcast; the only fact-scale shuffles are the (part, supp)
    cost groupBy and the per-part min. Unit prices are exact integer
    cents so the min-equality join can't tie-break differently across
    engines."""
    li = load_table(spark, sf_dir, "lineitem")
    cost = (
        li.filter(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100).cast(
                    "long"
                )
            ).alias("unit_cents")
        )
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    regional = (
        cost.join(F.broadcast(supp), cost.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("l_partkey", "l_suppkey", "unit_cents", "s_name", "s_acctbal", "n_name")
    )
    best = regional.groupBy(F.col("l_partkey").alias("best_partkey")).agg(
        F.min("unit_cents").alias("best_cents")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    return (
        regional.join(
            best,
            (F.col("l_partkey") == F.col("best_partkey"))
            & (F.col("unit_cents") == F.col("best_cents")),
        )
        .join(part, F.col("l_partkey") == part.p_partkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            "unit_cents",
            (F.floor(F.col("s_acctbal") * 100 + F.lit(0.5)) / 100).alias("s_acctbal"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q9 (adapted) — product-line profit by nation and year
# --------------------------------------------------------------------------

_Q9_ORACLE = """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                - CAST(round(l.l_extendedprice * 0.6 * 100) AS BIGINT))
            AS BIGINT) AS profit_cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_name LIKE '%widget%'
GROUP BY n.n_name, year(o.o_orderdate)
ORDER BY nation, o_year DESC
"""


@register("q9_product_profit", oracle=_Q9_ORACLE, tags=("join", "agg", "tpch"), bench=True)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9 shape, adapted: unit cost = 60%
    of extended price in lieu of ps_supplycost). Preserves Q9's
    5-table star join with the LIKE filter on part name, the
    nation x order-year rollup, and the profit expression as a
    difference of money terms — each term rounded to exact cents
    BEFORE subtraction so both engines net identically. The part
    filter broadcasts and prunes the fact scan early; orders joins on
    the natural key; the final group is nations x years small. At
    100 TB the only heavy exchange is the orderkey join — the same
    shape Q5/Q7/Q8 already pin as sort-merge-able."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "long"
    )
    cost = F.round(F.col("l_extendedprice") * 0.6 * 100).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(rev - cost).cast("long").alias("profit_cents"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# Q11 (adapted) — important stock: value share above global threshold
# --------------------------------------------------------------------------

_Q11_MULT = 2  # flag parts above MULT x the mean per-part value share

_Q11_ORACLE = f"""
WITH val AS (
  SELECT l.l_partkey,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
                  CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS value_cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
  GROUP BY l.l_partkey
),
tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS t,
               CAST(count(*) AS BIGINT) AS n_parts FROM val)
SELECT v.l_partkey AS p_partkey, v.value_cents
FROM val v, tot
WHERE v.value_cents * tot.n_parts > {_Q11_MULT} * tot.t
ORDER BY v.value_cents DESC, p_partkey
"""


@register("q11_important_stock", oracle=_Q11_ORACLE, tags=("join", "subquery", "tpch"))
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock identification (TPC-H Q11 shape, adapted:
    inventory value = shipped price x quantity from lineitem in lieu
    of ps_supplycost x ps_availqty). Keeps Q11's defining feature —
    a HAVING against a scalar subquery over the SAME aggregate
    (parts whose value exceeds {_Q11_MULT}x the MEAN per-part share;
    scoped to EUROPE because the synthetic fixture spreads its few
    suppliers too thin for a single-nation cut, and mean-relative
    rather than TPC-H's fixed fraction so the head stays non-empty
    at every scale factor) — expressed as aggregate-once + broadcast
    the 1-row total, never computing the value table twice. Value is
    exact integer cents x integer quantity and the threshold test is
    pure integer cross-multiplication — no float boundary at all.
    One fact groupBy after broadcast dim hops; the filtered output
    is the skew-head, tiny by construction."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    val = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * F.col("l_quantity").cast("long")
            )
            .cast("long")
            .alias("value_cents")
        )
    )
    tot = val.agg(
        F.sum("value_cents").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("n_parts"),
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(
            F.col("value_cents").cast("decimal(38,0)") * F.col("n_parts")
            > _Q11_MULT * F.col("t").cast("decimal(38,0)")
        )
        .select(F.col("l_partkey").alias("p_partkey"), "value_cents")
        .orderBy(F.col("value_cents").desc(), "p_partkey")
    )


# --------------------------------------------------------------------------
# Q20 (adapted) — suppliers with excess shipments of a part class
# --------------------------------------------------------------------------

_Q20_ORACLE = """
WITH shipped AS (
  SELECT l_suppkey, l_partkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey
),
green AS (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%'),
heavy AS (
  SELECT DISTINCT s.l_suppkey
  FROM shipped s
  JOIN green g ON g.p_partkey = s.l_partkey
  WHERE s.qty > 30
)
SELECT sup.s_name, n.n_name
FROM supplier sup
JOIN nation n ON n.n_nationkey = sup.s_nationkey
WHERE sup.s_suppkey IN (SELECT l_suppkey FROM heavy)
ORDER BY sup.s_name
"""


@register("q20_excess_shippers", oracle=_Q20_ORACLE, tags=("join", "subquery", "tpch"))
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential excess-stock suppliers (TPC-H Q20 shape, adapted:
    "availqty > half of shipped" becomes "1997 shipped quantity above
    a fixed threshold" — the fixture has no availqty). Preserves
    Q20's nested semi-join chain: a part-name filter feeding a
    supplier-level EXISTS, resolved as broadcast semi-joins (the
    green part list is dim-sized; the heavy-supplier list is
    supplier-sized) so the fact table is scanned once with the date
    filter pushed to parquet. Quantities sum as exact integers."""
    li = load_table(spark, sf_dir, "lineitem")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"))
    )
    green = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("blue%"))
        .select("p_partkey")
    )
    heavy = (
        shipped.join(F.broadcast(green), shipped.l_partkey == green.p_partkey)
        .filter(F.col("qty") > 30)
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(heavy), supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# Q21 (adapted) — sole late shipper on multi-supplier orders
# --------------------------------------------------------------------------

_Q21_ORACLE = """
WITH last_ship AS (
  SELECT l_orderkey,
         max(l_shipdate) AS max_ship,
         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
  FROM lineitem GROUP BY l_orderkey
),
blamed AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l
  JOIN last_ship ls ON ls.l_orderkey = l.l_orderkey
  WHERE ls.n_supps > 1
    AND l.l_shipdate = ls.max_ship
    AND NOT EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l.l_orderkey
        AND l2.l_suppkey <> l.l_suppkey
        AND l2.l_shipdate = ls.max_ship
    )
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM blamed b
JOIN supplier s ON s.s_suppkey = b.l_suppkey
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
"""


@register("q21_sole_late_shipper", oracle=_Q21_ORACLE, tags=("join", "subquery", "tpch"))
def q21_sole_late_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape, adapted:
    "exceeded commit date" becomes "shipped the order's latest line",
    since the fixture has no commit/receipt dates). Preserves Q21's
    famous EXISTS / NOT EXISTS double-correlation: the supplier must
    be ON the order's critical path (ships at max shipdate — the
    EXISTS) and be ALONE there (no other supplier ships that date —
    the NOT EXISTS). Both correlations resolve against one per-order
    aggregate: max shipdate, supplier count, and the count of
    distinct suppliers AT the max — no second scan, no anti-join
    against the raw fact. Lineitem shuffles once on l_orderkey;
    everything after is order-cardinality."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("max_ship"),
        F.countDistinct("l_suppkey").cast("long").alias("n_supps"),
    )
    at_max = (
        li.join(per_order, "l_orderkey")
        .filter(F.col("l_shipdate") == F.col("max_ship"))
        .groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_at_max"))
    )
    blamed = (
        li.join(per_order, "l_orderkey")
        .filter((F.col("n_supps") > 1) & (F.col("l_shipdate") == F.col("max_ship")))
        .join(
            at_max.filter(F.col("n_at_max") == 1).select("l_orderkey"),
            "l_orderkey",
            "left_semi",
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        blamed.join(F.broadcast(supp), blamed.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
