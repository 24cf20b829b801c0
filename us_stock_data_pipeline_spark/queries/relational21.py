"""Round-7 relational additions, part 21: deletion manifests,
multi-distinct aggregates, NOT IN null semantics, and 4-4-5 fiscal
calendars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Right-to-erasure deletion manifest
# --------------------------------------------------------------------------

_DELETE_MOD = 97  # user_id % MOD == 0 stands in for the request list

_DELETION_ORACLE = f"""
WITH targets AS (
  SELECT DISTINCT user_id FROM events WHERE user_id % {_DELETE_MOD} = 0
),
part_tot AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS part_rows
  FROM events GROUP BY 1, 2
),
hits AS (
  SELECT e.event_type, CAST(date_trunc('day', e.ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_delete,
         CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
  FROM events e JOIN targets t ON t.user_id = e.user_id
  GROUP BY 1, 2
)
SELECT h.event_type, h.day, h.n_delete, h.n_users, p.part_rows,
       floor(CAST(h.n_delete AS DOUBLE) / p.part_rows * 10000 + 0.5) / 10000
         AS delete_share
FROM hits h JOIN part_tot p ON p.event_type = h.event_type AND p.day = h.day
ORDER BY h.event_type, h.day
"""


@register("etl_deletion_manifest", oracle=_DELETION_ORACLE, tags=("etl", "compliance"))
def etl_deletion_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure deletion manifest: given a subject-request
    list (deterministic stand-in: every {_DELETE_MOD}th user), report
    per (source, day) partition how many rows and distinct subjects a
    targeted delete would touch and what share of the partition that
    is — the artifact a compliance pipeline turns into rewrite jobs,
    and the cost estimate that decides rewrite-vs-tombstone per
    partition (`pii_redact` masks in place; this plans REMOVAL). The
    request list joins as a broadcast semi-side; partition totals come
    from the same scan shape; shares are terminal divisions over
    exact counts. Partition-grain output keeps the manifest
    calendar-bounded at any data size."""
    ev = load_table(spark, sf_dir, "events")
    targets = (
        ev.filter(F.col("user_id") % _DELETE_MOD == 0).select("user_id").distinct()
    )
    day = F.date_trunc("day", "ts").cast("date").alias("day")
    part_tot = ev.groupBy("event_type", day).agg(
        F.count(F.lit(1)).cast("long").alias("part_rows")
    )
    hits = (
        ev.join(F.broadcast(targets), "user_id")
        .groupBy("event_type", day)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_delete"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )
    return (
        hits.join(part_tot, ["event_type", "day"])
        .select(
            "event_type",
            "day",
            "n_delete",
            "n_users",
            "part_rows",
            (
                F.floor(
                    F.col("n_delete").cast("double") / F.col("part_rows") * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("delete_share"),
        )
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------------------------
# Multiple exact COUNT(DISTINCT) in one aggregate
# --------------------------------------------------------------------------

_MULTI_DISTINCT_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       CAST(count(DISTINCT (user_id, event_type)) AS BIGINT) AS n_user_type_pairs
FROM events
"""


@register("agg_multi_distinct_expand", oracle=_MULTI_DISTINCT_ORACLE, tags=("agg", "relational"), bench=True)
def agg_multi_distinct_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple exact COUNT(DISTINCT) over DIFFERENT keys in one
    statement — the cardinality panel every dataset intake prints.
    Catalyst compiles this with the Expand operator: the input is
    replicated once per distinct-aggregate group and each replica
    carries one key (nulls elsewhere), so four distincts cost one
    pass over a 4x-expanded stream plus one shuffle — not four jobs.
    That expansion factor is exactly why, at 100 TB, panels like this
    flip to approx_count_distinct (`agg_approx_distinct`) or a
    mergeable sketch (`agg_hll_sketch`) — this operator pins the
    EXACT semantics those approximate paths are judged against. The
    composite pair count rides the same expand with a struct key."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
        F.countDistinct(F.col("ts").cast("date")).cast("long").alias("n_days"),
        F.countDistinct(F.struct("user_id", "event_type"))
        .cast("long")
        .alias("n_user_type_pairs"),
    )


# --------------------------------------------------------------------------
# NOT IN vs NOT EXISTS null semantics
# --------------------------------------------------------------------------

_NULL_SEM_ORACLE = """
WITH probe AS (
  -- a key list that CONTAINS a NULL: customers, with one key nulled out
  SELECT nullif(c_custkey, 7) AS k FROM customer
)
SELECT
  CAST((SELECT count(*) FROM orders WHERE o_custkey IN (SELECT k FROM probe))
       AS BIGINT) AS n_in,
  CAST((SELECT count(*) FROM orders o WHERE EXISTS (
          SELECT 1 FROM probe p WHERE p.k = o.o_custkey))
       AS BIGINT) AS n_exists,
  CAST((SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT k FROM probe))
       AS BIGINT) AS n_not_in,
  CAST((SELECT count(*) FROM orders o WHERE NOT EXISTS (
          SELECT 1 FROM probe p WHERE p.k = o.o_custkey))
       AS BIGINT) AS n_not_exists
"""


@register("subquery_null_semantics", oracle=_NULL_SEM_ORACLE, tags=("subquery", "semantics"))
def subquery_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null trap, pinned: against a key list containing a
    NULL, `IN` and `EXISTS` agree, but `NOT IN` returns ZERO rows
    (x <> NULL is UNKNOWN, so no row ever passes) while `NOT EXISTS`
    returns the true complement — the single most common silent-wrong
    -answer bug in migrated SQL, and the reason anti-joins should be
    written as NOT EXISTS. Both engines implement the standard: the
    oracle and the Spark plan (null-aware anti join) must agree on
    all four counts. Each predicate is one broadcast-size probe
    against orders; the op exists to keep an engine upgrade from ever
    changing these semantics unnoticed."""
    od = load_table(spark, sf_dir, "orders")
    probe = load_table(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_custkey"), F.lit(7)).alias("k")
    )
    probe.createOrReplaceTempView("_null_sem_probe")
    od.createOrReplaceTempView("_null_sem_orders")
    return spark.sql(
        """
        SELECT
          CAST((SELECT count(*) FROM _null_sem_orders
                WHERE o_custkey IN (SELECT k FROM _null_sem_probe)) AS BIGINT)
            AS n_in,
          CAST((SELECT count(*) FROM _null_sem_orders o WHERE EXISTS (
                  SELECT 1 FROM _null_sem_probe p WHERE p.k = o.o_custkey))
               AS BIGINT) AS n_exists,
          CAST((SELECT count(*) FROM _null_sem_orders
                WHERE o_custkey NOT IN (SELECT k FROM _null_sem_probe)) AS BIGINT)
            AS n_not_in,
          CAST((SELECT count(*) FROM _null_sem_orders o WHERE NOT EXISTS (
                  SELECT 1 FROM _null_sem_probe p WHERE p.k = o.o_custkey))
               AS BIGINT) AS n_not_exists
        """
    )


# --------------------------------------------------------------------------
# 4-4-5 fiscal calendar rollup
# --------------------------------------------------------------------------

_FISCAL_ORACLE = """
WITH mapped AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS fy,
         least((dayofyear(o_orderdate) - 1) // 7 // 13, 3) + 1 AS fq,
         CASE WHEN least((dayofyear(o_orderdate) - 1) // 7, 51) % 13 < 4 THEN 1
              WHEN least((dayofyear(o_orderdate) - 1) // 7, 51) % 13 < 8 THEN 2
              ELSE 3 END AS fp,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT fy, CAST(fq AS BIGINT) AS fq, CAST(fp AS BIGINT) AS fp,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS cents
FROM mapped
GROUP BY fy, fq, fp
ORDER BY fy, fq, fp
"""


@register("orders_fiscal_calendar_445", oracle=_FISCAL_ORACLE, tags=("analytics", "calendar"))
def orders_fiscal_calendar_445(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-4-5 fiscal calendar rollup: map order dates onto the retail
    fiscal grid — 13-week quarters split into 4-, 4-, and 5-week
    periods (week = day-of-year/7 from Jan 1, week 52 folded into the
    last period) — and roll revenue to (year, quarter, period). The
    4-4-5 calendar is how retail compares periods with equal weekday
    mixes, and the mapping is PURE INTEGER ARITHMETIC on day-of-year,
    so both engines bucket identically with no calendar table to
    maintain or join (`scalar_business_days` handles day math; this
    handles the reporting GRID). Map-side mapping, one rollup."""
    od = load_table(spark, sf_dir, "orders")
    week = F.expr("least((dayofyear(o_orderdate) - 1) div 7, 51)")
    wq = F.expr("least((dayofyear(o_orderdate) - 1) div 7 div 13, 3)")
    mapped = od.select(
        F.year("o_orderdate").cast("long").alias("fy"),
        (wq + 1).cast("long").alias("fq"),
        F.when(week % 13 < 4, 1).when(week % 13 < 8, 2).otherwise(3)
        .cast("long")
        .alias("fp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return (
        mapped.groupBy("fy", "fq", "fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .orderBy("fy", "fq", "fp")
    )
