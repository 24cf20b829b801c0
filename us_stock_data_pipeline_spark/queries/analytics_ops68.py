"""Round-69 analytics, part 68: label propagation on the co-purchase
graph and segment growth-contribution decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Label propagation (2 synchronous rounds, majority vote, min tie-break)
# --------------------------------------------------------------------------

_LP_SEED_MOD = 5  # suppliers with suppkey % 5 == 0 start labeled

_LP_PROP_SQL = """
  SELECT n.dst AS s, l.lbl,
         CAST(count(*) AS BIGINT) AS votes
  FROM nbrs n JOIN {prev} l ON l.s = n.src
  WHERE l.lbl IS NOT NULL
  GROUP BY n.dst, l.lbl
"""

_LP_ORACLE = f"""
WITH edges0 AS (
  SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
),
nbrs AS (
  SELECT s1 AS src, s2 AS dst FROM edges0
  UNION ALL
  SELECT s2 AS src, s1 AS dst FROM edges0
),
verts AS (SELECT DISTINCT src AS s FROM nbrs),
l0 AS (
  SELECT v.s,
         CASE WHEN v.s % {_LP_SEED_MOD} = 0 THEN sp.s_nationkey END AS lbl
  FROM verts v JOIN supplier sp ON sp.s_suppkey = v.s
),
v1 AS ({_LP_PROP_SQL.format(prev='l0')}),
w1 AS (  -- argmax by (votes DESC, lbl ASC) as a window, not a correlated
         -- subquery (the correlated form cost ~27 s at sf0.1 in DuckDB)
  SELECT s, lbl FROM (
    SELECT s, lbl, row_number() OVER (PARTITION BY s ORDER BY votes DESC, lbl) AS rn
    FROM v1) WHERE rn = 1
),
l1 AS (
  SELECT v.s, coalesce(l0.lbl, w1.lbl) AS lbl
  FROM verts v JOIN l0 ON l0.s = v.s LEFT JOIN w1 ON w1.s = v.s
),
v2 AS ({_LP_PROP_SQL.format(prev='l1')}),
w2 AS (
  SELECT s, lbl FROM (
    SELECT s, lbl, row_number() OVER (PARTITION BY s ORDER BY votes DESC, lbl) AS rn
    FROM v2) WHERE rn = 1
),
l2 AS (
  SELECT v.s, coalesce(l1.lbl, w2.lbl) AS lbl
  FROM verts v JOIN l1 ON l1.s = v.s LEFT JOIN w2 ON w2.s = v.s
)
SELECT CAST(lbl AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_suppliers
FROM l2
WHERE lbl IS NOT NULL
GROUP BY lbl
ORDER BY label
"""


@register("graph_label_propagation", oracle=_LP_ORACLE, tags=("graph",))
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation on the supplier co-purchase
    graph: 1-in-{_LP_SEED_MOD} suppliers start with their nation as a
    seed label, and two synchronous rounds spread labels by neighbor
    majority vote with a deterministic min-label tie-break — the
    cheap community/classification spreader behind entity-resolution
    blocking and weak supervision (`dedup_cluster_connected` is its
    degenerate everyone-agrees case; `graph_pagerank_trade` iterates
    SCORES where this iterates DISCRETE labels). Seeded vertices are
    immutable (coalesce keeps them), so the fixed iteration count is
    deterministic; votes are exact counts and the argmax uses
    (max votes, min label). Plan per round: one edge-keyed join +
    vote aggregate — the GraphX/Pregel shape expressed as two
    relational rounds; at 100 TB the same loop runs with the
    labels table bucketed on the vertex key."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s1"))
    b = li.select(F.col("l_orderkey").alias("okb"), F.col("l_suppkey").alias("s2"))
    # the order-key self-join is the only data-sized stage; unpersisted
    # it re-executes once per consumer (verts + each round's votes +
    # the label chain — the executed plan inlined it 4x)
    edges0 = registry.track_persist(
        a.join(b, (F.col("okb") == F.col("ok")) & (F.col("s1") < F.col("s2")))
        .select("s1", "s2")
        .distinct()
    )
    nbrs = edges0.select(F.col("s1").alias("src"), F.col("s2").alias("dst")).unionAll(
        edges0.select(F.col("s2").alias("src"), F.col("s1").alias("dst"))
    )
    verts = nbrs.select(F.col("src").alias("s")).distinct()
    labels = verts.join(
        F.broadcast(sup.select(F.col("s_suppkey").alias("s"), F.col("s_nationkey").alias("nat"))),
        "s",
    ).select(
        "s", F.when(F.col("s") % _LP_SEED_MOD == 0, F.col("nat")).alias("lbl")
    )
    for _ in range(2):
        votes = (
            nbrs.join(
                labels.filter(F.col("lbl").isNotNull()).select(
                    F.col("s").alias("src"), "lbl"
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("s"), "lbl")
            .agg(F.count(F.lit(1)).cast("long").alias("votes"))
        )
        # argmax by (max votes, min label): struct-min over (-votes, lbl)
        winner = (
            votes.select("s", "lbl", (-F.col("votes")).alias("nv"))
            .groupBy("s")
            .agg(F.min(F.struct(F.col("nv"), F.col("lbl"))).alias("x"))
            .select("s", F.col("x.lbl").alias("win_lbl"))
        )
        # persist each round's labels (vertex-sized): round r+1 reads
        # them twice (vote side + coalesce side), and without the cache
        # the label lineage doubles per round
        labels = registry.track_persist(
            labels.join(winner, "s", "left").select(
                "s", F.coalesce(F.col("lbl"), F.col("win_lbl")).alias("lbl")
            )
        )
    return (
        labels.filter(F.col("lbl").isNotNull())
        .groupBy(F.col("lbl").cast("long").alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_suppliers"))
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# Growth-contribution decomposition by customer nation
# --------------------------------------------------------------------------

_GC_Y1, _GC_Y2 = 1997, 1998

_GC_ORACLE = f"""
WITH rev AS (
  SELECT c.c_nationkey AS nation, year(o.o_orderdate) AS yr,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE year(o.o_orderdate) IN ({_GC_Y1}, {_GC_Y2})
  GROUP BY 1, 2
),
wide AS (
  SELECT nation,
         CAST(coalesce(sum(CASE WHEN yr = {_GC_Y1} THEN cents END), 0) AS BIGINT) AS r1,
         CAST(coalesce(sum(CASE WHEN yr = {_GC_Y2} THEN cents END), 0) AS BIGINT) AS r2
  FROM rev GROUP BY nation
),
tot AS (SELECT CAST(sum(r1) AS BIGINT) AS t1, CAST(sum(r2) AS BIGINT) AS t2 FROM wide)
SELECT w.nation, w.r1 AS rev_y1_cents, w.r2 AS rev_y2_cents,
       CAST(w.r2 - w.r1 AS BIGINT) AS delta_cents,
       CAST(floor((CAST(w.r2 AS DOUBLE) - w.r1) / t.t1 * 1000000 + 0.5) AS BIGINT)
         AS growth_contrib_e6,
       CAST(floor((CAST(t.t2 AS DOUBLE) - t.t1) / t.t1 * 1000000 + 0.5) AS BIGINT)
         AS total_growth_e6
FROM wide w CROSS JOIN tot t
ORDER BY w.nation
"""


@register("orders_growth_contribution", oracle=_GC_ORACLE, tags=("analytics", "finance"))
def orders_growth_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth DECOMPOSED into per-nation
    contributions: each nation's (r2 - r1)/total_r1, which sum to the
    headline growth rate exactly — the board-deck bridge that answers
    "which market drove the +X%" (`lineitem_pvm_bridge` decomposes by
    CAUSE — price vs volume; this decomposes by SEGMENT, and the two
    views compose). All revenue is exact integer cents; each
    contribution is one double division quantized at e6, and
    `total_growth_e6` is carried on every row so the sum check needs
    no second query. Plan: one fact join + (nation, year) aggregate,
    a conditional pivot, a broadcast total."""
    od = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    rev = (
        od.join(F.broadcast(cust), od.o_custkey == cust.c_custkey)
        .filter(F.year("o_orderdate").isin(_GC_Y1, _GC_Y2))
        .groupBy(F.col("c_nationkey").alias("nation"), F.year("o_orderdate").alias("yr"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("cents"))
    )
    wide = rev.groupBy("nation").agg(
        F.coalesce(F.sum(F.when(F.col("yr") == _GC_Y1, F.col("cents"))), F.lit(0))
        .cast("long")
        .alias("r1"),
        F.coalesce(F.sum(F.when(F.col("yr") == _GC_Y2, F.col("cents"))), F.lit(0))
        .cast("long")
        .alias("r2"),
    )
    tot = wide.agg(
        F.sum("r1").cast("long").alias("t1"), F.sum("r2").cast("long").alias("t2")
    )
    return (
        wide.crossJoin(F.broadcast(tot))
        .select(
            "nation",
            F.col("r1").alias("rev_y1_cents"),
            F.col("r2").alias("rev_y2_cents"),
            (F.col("r2") - F.col("r1")).cast("long").alias("delta_cents"),
            F.floor(
                (F.col("r2").cast("double") - F.col("r1")) / F.col("t1") * 1_000_000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("growth_contrib_e6"),
            F.floor(
                (F.col("t2").cast("double") - F.col("t1")) / F.col("t1") * 1_000_000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("total_growth_e6"),
        )
        .orderBy("nation")
    )
