"""Round-12: Adaptive Query Execution demonstrations — runtime
sort-merge-to-broadcast conversion and automatic skew-join splitting.

Both queries materialize through ``localCheckpoint`` on an ISOLATED
``spark.newSession()`` carrying the demonstration confs: SQLConf is
per-session, so the lowered thresholds never exist in the shared
session at any instant — neither leaked afterward nor visible to a
query planning concurrently on another thread (bench.py's thread pool;
advisor-r6 find). The returned DataFrame reads the checkpoint blocks,
which are session-independent. The executable plan assertions live in
tests/test_round12_plans.py, which rebuilds the raw joins via the
exposed _build_* helpers under the same bracket.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register
from us_stock_data_pipeline_spark.session import ensure_session_confs


@contextmanager
def _conf_bracket(spark: SparkSession, confs: dict[str, str]):
    """Yield an ISOLATED SparkSession (same SparkContext, own SQLConf)
    with `confs` applied. newSession() gives per-session planning state,
    so a concurrently-running query on the shared session can never see
    the lowered thresholds — set/restore on the shared conf had a race
    window for the bracket's whole duration (advisor r6 find). The
    isolated session is discarded on exit; nothing to restore."""
    iso = spark.newSession()
    ensure_session_confs(iso)
    for k, v in confs.items():
        iso.conf.set(k, v)
    yield iso


# --------------------------------------------------------------------------
# AQE: runtime SMJ -> broadcast conversion
# --------------------------------------------------------------------------

# The dim filter's selectivity (md5 prefix) is unknowable at plan time;
# with the STATIC broadcast threshold disabled the planner must pick a
# shuffle join, and AQE's runtime stats (a few hundred rows) convert it
# to broadcast after the dim side's shuffle materializes.
_AQE_BCAST_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # the adaptive threshold DEFAULTS to the static one, so with static
    # at -1 it must be set explicitly or AQE can't convert either
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "10MB",
}

_AQE_BCAST_ORACLE = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE substr(md5(CAST(o.o_orderkey AS VARCHAR)), 1, 2) = 'ff'
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


def _build_runtime_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) == "ff"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("revenue_cents"),
        )
        .orderBy("o_orderpriority")
    )


@register("join_aqe_runtime_broadcast", oracle=_AQE_BCAST_ORACLE, tags=("join", "aqe"))
def join_aqe_runtime_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE runtime join-strategy switch: the orders side is filtered by
    an md5-prefix predicate whose selectivity (~0.4%) no size-only
    estimator can see, and the static broadcast threshold is disabled
    inside the bracket — so the initial plan is a shuffle join, and
    AQE's materialized runtime statistics convert it to a broadcast
    join mid-query (asserted: initial plan SortMergeJoin, final plan
    BroadcastHashJoin, tests/test_round12_plans.py). This is THE
    mechanism that saves a 100 TB fact shuffle when a dim filter turns
    out selective at runtime: without AQE the plan picked at compile
    time is final, and the conservative choice shuffles everything.
    Results are the plain join the oracle computes; the bracket runs
    the demonstration on an isolated newSession() (per-session SQLConf)
    so the conf can't leak into — or race against — the shared session."""
    with _conf_bracket(spark, _AQE_BCAST_CONFS) as iso:
        return _build_runtime_broadcast_join(iso, sf_dir).localCheckpoint(eager=True)


# --------------------------------------------------------------------------
# AQE: automatic skew-join splitting
# --------------------------------------------------------------------------

# 80% of events collapse onto skew_key 0; the thresholds are lowered so
# the toy fixture's hot partition crosses AQE's skew bar exactly as a
# hot key crosses the default 256 MB bar at production scale.
_AQE_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # compressed shuffle bytes at the smallest fixture run ~KBs; the
    # thresholds sit just under the hot partition's size the way the
    # 256MB default sits under a production hot key
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512b",
    # the downstream per-key aggregate reuses the join's partitioning,
    # so splitting the skewed partition forces an extra shuffle — AQE
    # declines unless told the trade is worth it (it is: replaying the
    # hot partition serially costs more than one extra exchange)
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}

_AQE_SKEW_ORACLE = """
WITH keyed AS (
  SELECT CASE WHEN user_id % 10 < 8 THEN 0 ELSE user_id % 97 END AS skew_key,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
dim AS (
  SELECT g AS d_key, g + 1 AS weight
  FROM (SELECT unnest(generate_series(0, 96)) AS g)
)
SELECT k.skew_key,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(k.cents) * max(d.weight) AS BIGINT) AS weighted_cents
FROM keyed k JOIN dim d ON d.d_key = k.skew_key
GROUP BY k.skew_key
ORDER BY k.skew_key
"""


def _build_skew_join(spark: SparkSession, sf_dir: str):
    ev = load_table(spark, sf_dir, "events")
    # AQE splits a skewed partition at MAP-OUTPUT granularity: a hot
    # reduce partition fed by one mapper cannot be split at all. The
    # single-file fixture reads as one map task, so fan the scan out to
    # 16 tasks first — at 100 TB the scan IS thousands of tasks and
    # this exchange doesn't exist.
    keyed = ev.repartition(16).select(
        F.expr("CASE WHEN user_id % 10 < 8 THEN 0 ELSE user_id % 97 END").alias(
            "skew_key"
        ),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    # independent dim (plain range, NOT derived by aggregating the fact
    # on the join key): OptimizeSkewedJoin pattern-matches
    # SMJ(sort(shuffle), sort(shuffle)) — an aggregate between sort and
    # shuffle on either side defeats the match, which is itself worth
    # knowing when a skew split mysteriously doesn't fire
    dim = spark.range(0, 97, 1, 4).select(
        F.col("id").alias("d_key"), (F.col("id") + 1).alias("weight")
    )
    return (
        keyed.join(dim, F.col("skew_key") == F.col("d_key"))
        .groupBy("skew_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (F.sum("cents") * F.max("weight")).cast("long").alias("weighted_cents"),
        )
        .orderBy("skew_key")
    )


@register("join_aqe_skew_handled", oracle=_AQE_SKEW_ORACLE, tags=("join", "aqe", "skew"))
def join_aqe_skew_handled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE automatic skew-join splitting: a synthetic key collapses 80%
    of events onto one value, the static+adaptive broadcast paths are
    disabled so the join MUST shuffle on the skewed key, and the skew
    thresholds are lowered so the fixture's hot partition crosses the
    bar the way a hot key crosses 256 MB in production. AQE then
    splits the oversized partition into subpartitions and replicates
    the matching dim rows (`skew=true` on the join node — asserted in
    tests/test_round12_plans.py) — the automatic counterpart of
    `join_salted_skew`'s manual salting, with zero query rewrite. The
    bracket runs on an isolated newSession() so the lowered thresholds
    never exist in the shared session's SQLConf, even mid-flight."""
    with _conf_bracket(spark, _AQE_SKEW_CONFS) as iso:
        return _build_skew_join(iso, sf_dir).localCheckpoint(eager=True)
