"""Round-15 analytics, part 28: k-hop BFS reachability over the
supplier-part graph and EOQ inventory planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# k-hop BFS reachability (bipartite supplier-part graph)
# --------------------------------------------------------------------------

_BFS_HOT_CAP = 40  # drop parts with more suppliers (same cap as link prediction)
_BFS_MAX_HOP = 4
_BFS_SEED = 1  # start supplier

_BFS_ORACLE = f"""
WITH RECURSIVE edges0 AS (
  SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
),
hot AS (
  SELECT p FROM edges0 GROUP BY p HAVING count(*) > {_BFS_HOT_CAP}
),
edges AS (
  SELECT * FROM edges0 WHERE p NOT IN (SELECT p FROM hot)
),
-- nodes encoded on one axis: suppliers as +s, parts as -(p+1)
-- (the +1 keeps part key 0 off the supplier axis)
-- recursive UNION (not UNION ALL): the per-iteration distinct keeps
-- the walk at O(nodes x hops) rows instead of O(paths)
walk(node, hop) AS (
  SELECT CAST({_BFS_SEED} AS BIGINT), 0
  UNION
  SELECT nxt.node, w.hop + 1
  FROM walk w
  JOIN (
    SELECT s AS frm, -(p + 1) AS node FROM edges
    UNION ALL
    SELECT -(p + 1) AS frm, s AS node FROM edges
  ) nxt ON nxt.frm = w.node
  WHERE w.hop < {_BFS_MAX_HOP}
),
dist AS (
  SELECT node, CAST(min(hop) AS BIGINT) AS hop FROM walk GROUP BY node
)
SELECT hop,
       CASE WHEN min(node) >= 0 AND max(node) >= 0 THEN 'supplier'
            WHEN min(node) < 0 AND max(node) < 0 THEN 'part'
            ELSE 'mixed' END AS node_type,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM dist
GROUP BY hop
ORDER BY hop
"""


@register("graph_bfs_reachability", oracle=_BFS_ORACLE, tags=("graph", "iterative"))
def graph_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-hop BFS from one supplier over the bipartite supplier-part
    trade graph: hop 1 = parts they ship, hop 2 = competing
    suppliers of those parts, hop 3 = those competitors' other
    parts... — the supply-chain blast-radius question ("if supplier
    1 fails, how far does the disruption web reach in k steps"),
    and the breadth-first complement of `dedup_cluster_connected`'s
    pointer doubling (full closure) and `graph_pagerank_trade`'s
    stationary weights. Spark side runs k frontier-expand /
    anti-join-visited iterations — each iteration is one keyed join
    against the (hot-capped) edge list, frontier-sized, with the
    visited set growing monotonically; the hot-part cap bounds any
    single expansion exactly as in `graph_link_prediction_jaccard`.
    Nodes ride one signed BIGINT axis (suppliers +s, parts -(p+1), the +1 keeping part key 0 off the supplier axis) so
    visited-set ops are single-column. The oracle replays the same
    walk as a recursive CTE with min-hop dedup."""
    li = load_table(spark, sf_dir, "lineitem")
    edges0 = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    hot = (
        edges0.groupBy("p").count().filter(F.col("count") > _BFS_HOT_CAP).select("p")
    )
    edges = edges0.join(F.broadcast(hot), "p", "left_anti")
    fwd = edges.select(F.col("s").alias("frm"), (-(F.col("p") + 1)).alias("node"))
    rev = edges.select((-(F.col("p") + 1)).alias("frm"), F.col("s").alias("node"))
    # adj is consumed once per hop — persist or every iteration re-runs
    # the scan + distinct + hot-cap anti-join (multi-consumer rule).
    adj = registry.track_persist(fwd.unionAll(rev))
    # iterative BFS: frontier/visited as (node, hop)
    visited = spark.createDataFrame([(_BFS_SEED, 0)], "node long, hop int")
    frontier = visited
    for hop in range(1, _BFS_MAX_HOP + 1):
        nxt = (
            adj.join(
                F.broadcast(frontier.select(F.col("node").alias("frm"))), "frm"
            )
            .select("node")
            .distinct()
            .join(F.broadcast(visited.select("node")), "node", "left_anti")
            .withColumn("hop", F.lit(hop))
        )
        nxt = nxt.localCheckpoint(eager=True)  # cut the growing lineage
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return (
        visited.groupBy(F.col("hop").cast("long").alias("hop"))
        .agg(
            F.when(
                (F.min("node") >= 0) & (F.max("node") >= 0), "supplier"
            )
            .when((F.min("node") < 0) & (F.max("node") < 0), "part")
            .otherwise("mixed")
            .alias("node_type"),
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
        )
        .select("hop", "node_type", "n_nodes")
        .orderBy("hop")
    )


# --------------------------------------------------------------------------
# Economic order quantity (EOQ) planning per brand
# --------------------------------------------------------------------------

_EOQ_ORDER_COST_CENTS = 10_000  # $100 per order

_EOQ_ORACLE = f"""
WITH demand AS (
  SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d
  FROM lineitem GROUP BY l_partkey
),
parts AS (
  SELECT p.p_brand, d.d,
         CAST(round(p.p_retailprice * 100) AS BIGINT) // 5 AS h_cents
  FROM demand d JOIN part p ON p.p_partkey = d.l_partkey
  WHERE CAST(round(p.p_retailprice * 100) AS BIGINT) // 5 > 0
),
eoq AS (
  SELECT p_brand, d,
         CAST(floor(sqrt(2.0 * d * {_EOQ_ORDER_COST_CENTS} / h_cents) * 1000)
              AS BIGINT) AS eoq_milli
  FROM parts
)
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(d) AS BIGINT) AS total_demand,
       CAST(quantile_disc(eoq_milli, 0.5) AS BIGINT) AS median_eoq_milli,
       CAST(sum(CASE WHEN d * 1000 > eoq_milli THEN 1 ELSE 0 END) AS BIGINT)
         AS n_multi_order_parts
FROM eoq
GROUP BY p_brand
ORDER BY p_brand
"""


@register("orders_economic_order_quantity", oracle=_EOQ_ORACLE, tags=("analytics", "finance"))
def orders_economic_order_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EOQ planning per brand: Wilson's sqrt(2DS/H) with annual
    demand D from exact quantity sums, ordering cost S fixed, and
    holding cost H as 20% of retail price in cents — the inventory
    policy table a replenishment team reads next to
    `supply_chain_bullwhip`'s variance diagnosis. Each part's EOQ is
    quantized to integer milli-units immediately (one identical
    sqrt expression per part, no float aggregation), so the brand
    rollup — median EOQ via percentile_disc, multi-order-part count
    via an integer cross-comparison — is exact. Plan: one fact
    groupBy, broadcast part dim, one brand rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    demand = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("d")
    )
    parts = (
        demand.join(F.broadcast(part), demand.l_partkey == part.p_partkey)
        .select(
            "p_brand",
            "d",
            F.expr("CAST(round(p_retailprice * 100) AS BIGINT) div 5").alias("h_cents"),
        )
        .filter(F.col("h_cents") > 0)
    )
    eoq = parts.select(
        "p_brand",
        "d",
        F.floor(
            F.sqrt(2.0 * F.col("d") * _EOQ_ORDER_COST_CENTS / F.col("h_cents")) * 1000
        )
        .cast("long")
        .alias("eoq_milli"),
    )
    return (
        eoq.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("d").cast("long").alias("total_demand"),
            F.expr(
                "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY eoq_milli) AS BIGINT)"
            ).alias("median_eoq_milli"),
            F.sum(F.when(F.col("d") * 1000 > F.col("eoq_milli"), 1).otherwise(0))
            .cast("long")
            .alias("n_multi_order_parts"),
        )
        .orderBy("p_brand")
    )
