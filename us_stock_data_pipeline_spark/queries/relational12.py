"""Round-6 relational additions: physical-layout planning operators
(z-order clustering keys, range-partition boundary planning) and an
interval-overlap join.

These target the 100 TB table-LAYOUT problem directly: at cluster
scale, how data is laid out (clustering keys, partition boundaries,
file sizing) decides scan cost before any query runs. Both planners
are expressed as ordinary exact-integer DataFrame plans so the layout
decision itself is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Z-order clustering key (bit-interleaved multi-dim layout)
# --------------------------------------------------------------------------

_ZBITS = 4  # 16 bins per dimension -> 8-bit z-value, 256 cells


def _z_expr(pb: str, db: str, shift_fn) -> str:
    """Bit-interleave expression text: price bits on odd positions, day
    bits on even. ``shift_fn(col, i)`` renders a right-shift-by-i in the
    target dialect; built once so both engines evaluate the same tree."""
    terms = []
    for i in range(_ZBITS):
        terms.append(f"(({shift_fn(pb, i)} & 1) * {1 << (2 * i + 1)})")
        terms.append(f"(({shift_fn(db, i)} & 1) * {1 << (2 * i)})")
    return " + ".join(terms)


_Z_SPARK = _z_expr("pb", "db", lambda c, i: f"shiftright({c}, {i})")
_Z_DUCK = _z_expr("pb", "db", lambda c, i: f"({c} >> {i})")

_ZORDER_ORACLE = f"""
WITH o AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(date_diff('day', DATE '1990-01-01', o_orderdate) AS BIGINT) AS dayno
  FROM orders
),
bounds AS (
  SELECT min(cents) AS min_c, max(cents) AS max_c,
         min(dayno) AS min_d, max(dayno) AS max_d
  FROM o
),
binned AS (
  SELECT ((o.cents - b.min_c) * {1 << _ZBITS}) // (b.max_c - b.min_c + 1) AS pb,
         ((o.dayno - b.min_d) * {1 << _ZBITS}) // (b.max_d - b.min_d + 1) AS db,
         o.cents, o.dayno
  FROM o, bounds b
),
zkeyed AS (
  SELECT {_Z_DUCK} AS z, cents, dayno, pb, db FROM binned
)
SELECT z,
       CAST(count(*) AS BIGINT) AS n_orders,
       min(cents) AS min_cents, max(cents) AS max_cents,
       min(dayno) AS min_dayno, max(dayno) AS max_dayno
FROM zkeyed
GROUP BY z
ORDER BY z
"""


@register("layout_zorder_clustering", oracle=_ZORDER_ORACLE, tags=("layout", "scan"))
def layout_zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering keys over (price, order-date): bin
    each dimension to 4 bits from exact global bounds, bit-interleave
    into one sort key, and report per-cell extents — the multi-dim
    layout trick behind Delta OPTIMIZE ZORDER BY and every data-skipping
    index: sorting by z makes files tight in BOTH dimensions at once,
    so min/max file stats prune 2-D predicates that a 1-D sort key
    can't. The per-cell min/max output IS the skipping-stats table the
    writer would persist. Plan: one global min/max agg broadcast to a
    map-side binning + interleave (pure integer bit arithmetic in
    whole-stage codegen), one groupBy on the 8-bit key — at 100 TB the
    same two jobs, with the groupBy replaced by a repartitionByRange on
    z ahead of the file writer."""
    o = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.datediff(F.col("o_orderdate"), F.lit("1990-01-01").cast("date"))
        .cast("long")
        .alias("dayno"),
    )
    bounds = o.agg(
        F.min("cents").alias("min_c"),
        F.max("cents").alias("max_c"),
        F.min("dayno").alias("min_d"),
        F.max("dayno").alias("max_d"),
    )
    nbins = 1 << _ZBITS
    binned = o.crossJoin(F.broadcast(bounds)).select(
        F.expr(f"((cents - min_c) * {nbins}) div (max_c - min_c + 1)").alias("pb"),
        F.expr(f"((dayno - min_d) * {nbins}) div (max_d - min_d + 1)").alias("db"),
        "cents",
        "dayno",
    )
    return (
        binned.select(F.expr(_Z_SPARK).alias("z"), "cents", "dayno")
        .groupBy("z")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.min("dayno").alias("min_dayno"),
            F.max("dayno").alias("max_dayno"),
        )
        .orderBy("z")
    )


# --------------------------------------------------------------------------
# Range-partition boundary planner (RangePartitioner's job, made explicit)
# --------------------------------------------------------------------------

_N_PARTS = 8
_SAMPLE_MOD = 101

_PLANNER_ORACLE = f"""
WITH sampled AS (
  SELECT l_shipdate, l_orderkey, l_linenumber
  FROM lineitem
  WHERE l_orderkey % {_SAMPLE_MOD} = 0
),
tiled AS (
  SELECT l_shipdate,
         ntile({_N_PARTS}) OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber) AS pid
  FROM sampled
)
SELECT CAST(pid AS BIGINT) AS pid,
       CAST(count(*) AS BIGINT) AS n_sample_keys,
       CAST(count(*) * {_SAMPLE_MOD} AS BIGINT) AS est_rows,
       CAST(min(l_shipdate) AS DATE) AS lo,
       CAST(max(l_shipdate) AS DATE) AS hi
FROM tiled
GROUP BY pid
ORDER BY pid
"""


@register("layout_partition_planner", oracle=_PLANNER_ORACLE, tags=("layout", "partitioning"))
def layout_partition_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partition boundary planner: deterministic 1-in-101 key
    sample, ntile into 8 equal-depth ranges, report each range's
    boundaries and estimated row load — exactly what Spark's
    RangePartitioner computes internally (reservoir sample ->
    rangeBounds) before every sort/repartitionByRange, surfaced as a
    first-class queryable plan so a writer can pre-pick file split
    points or diagnose boundary skew. Equal-DEPTH (quantile) ranges,
    not equal-width: a hot month gets split across partitions instead
    of overloading one. Scale: the global ntile sort runs on the
    SAMPLE (data/101, and the modulus rises with scale — the planner's
    own knob), never the full table; the full-data pass that would
    follow (repartitionByRange with these bounds) shuffles once with
    map-side range routing."""
    li = load_table(spark, sf_dir, "lineitem")
    sampled = li.filter(F.col("l_orderkey") % _SAMPLE_MOD == 0).select(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    tiled = sampled.select(
        "l_shipdate",
        F.ntile(_N_PARTS)
        .over(Window.orderBy("l_shipdate", "l_orderkey", "l_linenumber"))
        .alias("pid"),
    )
    return (
        tiled.groupBy("pid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sample_keys"),
            (F.count(F.lit(1)) * _SAMPLE_MOD).cast("long").alias("est_rows"),
            F.min("l_shipdate").cast("date").alias("lo"),
            F.max("l_shipdate").cast("date").alias("hi"),
        )
        .select(F.col("pid").cast("long").alias("pid"), "n_sample_keys", "est_rows", "lo", "hi")
        .orderBy("pid")
    )


# --------------------------------------------------------------------------
# Interval-overlap join via month binning
# --------------------------------------------------------------------------

_OVERLAP_ORACLE = """
WITH iv AS (
  -- the fixture's lineitem has no l_receiptdate; transit time derives
  -- deterministically from the keys (same convention as the derived
  -- shipmode in q12), receipt = ship + 0..44 days
  SELECT l_suppkey,
         CAST(date_trunc('month', l_shipdate) AS DATE) AS m_lo,
         CAST(date_trunc('month',
              CAST(l_shipdate AS DATE)
              + CAST((l_orderkey * 7 + l_linenumber * 3) % 45 AS INT)) AS DATE) AS m_hi
  FROM lineitem
),
exploded AS (
  SELECT l_suppkey, CAST(gs.m AS DATE) AS month
  FROM iv, LATERAL (
    SELECT unnest(generate_series(CAST(iv.m_lo AS TIMESTAMP),
                                  CAST(iv.m_hi AS TIMESTAMP),
                                  INTERVAL 1 MONTH)) AS m
  ) gs
)
SELECT month,
       CAST(count(*) AS BIGINT) AS n_open_shipments,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
FROM exploded
GROUP BY month
ORDER BY month
"""


@register("join_interval_overlap", oracle=_OVERLAP_ORACLE, tags=("join", "range", "interval"))
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: how many ship->receipt windows were open
    in each calendar month (and from how many suppliers)? The interval
    x interval overlap predicate is non-equi, but binning each interval
    to the months it SPANS turns it into an explode + equi-groupBy —
    the `join_range_banded` playbook applied to intervals. The explode
    factor is bounded by interval length / bin width (derived transit
    <= 44 days -> <= 2 month-bins per row), so the plan
    is one map-side sequence explode and one shuffle on the month key,
    never a cartesian against a calendar table; at 100 TB the bin
    width is the tuning knob that trades explode factor against
    per-bin candidate count, exactly as in the banded range join."""
    li = load_table(spark, sf_dir, "lineitem")
    receipt = F.date_add(
        F.col("l_shipdate").cast("date"),
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber") * 3) % 45).cast("int"),
    )
    iv = li.select(
        "l_suppkey",
        F.date_trunc("month", "l_shipdate").cast("date").alias("m_lo"),
        F.date_trunc("month", receipt).cast("date").alias("m_hi"),
    )
    exploded = iv.select(
        "l_suppkey",
        F.explode(
            F.sequence(F.col("m_lo"), F.col("m_hi"), F.expr("INTERVAL 1 MONTH"))
        ).alias("month"),
    )
    return (
        exploded.groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_open_shipments"),
            F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
        )
        .orderBy("month")
    )
