"""Round-5 relational additions, part 9: nested-struct manipulation,
full covariance matrix in long form, M4 time-series downsampling, and
graph triangle counting / transitivity.

House contract: Spark-first plans, identically-aliased DuckDB oracles,
floats rounded identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Nested-struct build / access / update
# --------------------------------------------------------------------------

_STRUCT_ORACLE = """
WITH built AS (
  SELECT c_custkey,
         {'name': c_name,
          'geo': {'nationkey': c_nationkey},
          'bal_cents': CAST(round(c_acctbal * 100) AS BIGINT)} AS profile
  FROM customer
),
updated AS (
  SELECT c_custkey,
         {'name': profile.name,
          'geo': profile.geo,
          'bal_cents': profile.bal_cents * 110 // 100} AS profile
  FROM built
)
SELECT c_custkey,
       profile.name AS p_name,
       CAST(profile.geo.nationkey AS BIGINT) AS p_nationkey,
       profile.bal_cents / 100.0 AS p_bal_uplifted
FROM updated
ORDER BY c_custkey
"""


@register("scalar_struct_ops", oracle=_STRUCT_ORACLE, tags=("scalar", "struct"))
def scalar_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-struct column surface: build a two-level struct, update a
    leaf IN PLACE with ``withField`` (Catalyst rewrites only the touched
    leaf — the other fields are moved, not recomputed), then project
    dotted paths back out. Structs are the schema tool for 100 TB
    tables: parquet stores each leaf as its own column chunk, so
    reading ``profile.geo.nationkey`` scans ONE leaf column of the
    nest (schema pruning shows only the needed leaves in ReadSchema) —
    nesting adds organization, not IO. All expression work, no shuffle
    besides the output ordering."""
    c = load_table(spark, sf_dir, "customer")
    # Balance travels as integer cents inside the struct: a 10% uplift
    # of a rounded double lands on half-cent boundaries where Spark and
    # DuckDB round() disagree (see customer_rfm_segments); cents*110
    # div 100 is boundary-free.
    built = c.select(
        "c_custkey",
        F.struct(
            F.col("c_name").alias("name"),
            F.struct(F.col("c_nationkey").alias("nationkey")).alias("geo"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
        ).alias("profile"),
    )
    updated = built.withColumn(
        "profile",
        F.col("profile").withField(
            "bal_cents", F.expr("profile.bal_cents * 110 div 100")
        ),
    )
    return updated.select(
        "c_custkey",
        F.col("profile.name").alias("p_name"),
        F.col("profile.geo.nationkey").cast("long").alias("p_nationkey"),
        (F.col("profile.bal_cents") / 100.0).alias("p_bal_uplifted"),
    ).orderBy("c_custkey")


# --------------------------------------------------------------------------
# Full covariance matrix (long form)
# --------------------------------------------------------------------------

_COVMAT_ORACLE = """
WITH pairs AS (
  SELECT u.var_a, u.var_b, u.val_a, u.val_b
  FROM lineitem,
       LATERAL (SELECT
         unnest(['disc','disc','disc','disc','price','price','price',
                 'qty','qty','tax']) AS var_a,
         unnest(['disc','price','qty','tax','price','qty','tax',
                 'qty','tax','tax']) AS var_b,
         unnest([l_discount, l_discount, l_discount, l_discount,
                 l_extendedprice, l_extendedprice, l_extendedprice,
                 l_quantity, l_quantity, l_tax]) AS val_a,
         unnest([l_discount, l_extendedprice, l_quantity, l_tax,
                 l_extendedprice, l_quantity, l_tax,
                 l_quantity, l_tax, l_tax]) AS val_b) u
)
SELECT var_a, var_b,
       round(covar_pop(val_a, val_b), 6) AS cov,
       round(corr(val_a, val_b), 6) AS corr
FROM pairs
GROUP BY var_a, var_b
ORDER BY var_a, var_b
"""


@register("agg_covariance_matrix", oracle=_COVMAT_ORACLE, tags=("agg", "stats"))
def agg_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full covariance/correlation matrix over the numeric lineitem
    columns, in long (var_a, var_b) form — the feature-correlation
    audit run before any model training. Shape: every row explodes
    into its k(k+1)/2 = 10 upper-triangle pairs IN-ROW (array of
    structs, map-side, NO join — a melt + self-join needs a unique row
    key, which this fixture's (orderkey, linenumber) is not, and a
    join it can skip anyway), then one groupBy per pair label whose
    state is the co-moment sketch. At 100 TB with k features the
    in-row blowup is k^2/2 — fine for small k; past ~100 features
    you'd flip to the Gramian block-matrix formulation, a different
    operator."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = [
        ("disc", "l_discount"),
        ("price", "l_extendedprice"),
        ("qty", "l_quantity"),
        ("tax", "l_tax"),
    ]
    pair_structs = [
        F.struct(
            F.lit(na).alias("var_a"),
            F.lit(nb).alias("var_b"),
            F.col(ca).alias("val_a"),
            F.col(cb).alias("val_b"),
        )
        for i, (na, ca) in enumerate(cols)
        for (nb, cb) in cols[i:]
    ]
    pairs = li.select(F.explode(F.array(*pair_structs)).alias("p")).select(
        F.col("p.var_a").alias("var_a"),
        F.col("p.var_b").alias("var_b"),
        F.col("p.val_a").alias("val_a"),
        F.col("p.val_b").alias("val_b"),
    )
    return (
        pairs.groupBy("var_a", "var_b")
        .agg(
            F.round(F.covar_pop("val_a", "val_b"), 6).alias("cov"),
            F.round(F.corr("val_a", "val_b"), 6).alias("corr"),
        )
        .orderBy("var_a", "var_b")
    )


# --------------------------------------------------------------------------
# M4 time-series downsampling
# --------------------------------------------------------------------------

_M4_ORACLE = """
WITH binned AS (
  SELECT event_type,
         (epoch_us(ts) // 21600000000) AS bin,
         ts, event_id, value,
         row_number() OVER (PARTITION BY event_type, (epoch_us(ts) // 21600000000)
                            ORDER BY ts, event_id) AS rn_first,
         row_number() OVER (PARTITION BY event_type, (epoch_us(ts) // 21600000000)
                            ORDER BY ts DESC, event_id DESC) AS rn_last
  FROM events
)
SELECT event_type, CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_points,
       round(min(value), 4) AS v_min,
       round(max(value), 4) AS v_max,
       round(max(CASE WHEN rn_first = 1 THEN value END), 4) AS v_first,
       round(max(CASE WHEN rn_last = 1 THEN value END), 4) AS v_last
FROM binned
GROUP BY event_type, bin
ORDER BY event_type, bin
"""


@register("timeseries_m4_downsample", oracle=_M4_ORACLE, tags=("timeseries", "window"))
def timeseries_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling (min/max/first/last per time bin) — the
    error-free visual aggregation used by time-series front-ends: those
    four points per pixel-column reproduce the exact rendered line at a
    bounded output size. The first/last election uses two row_number
    windows over the SAME (series, bin) partitioning the groupBy then
    aggregates on, so one shuffle serves windows and rollup (the
    repo's exchange-reuse contract); min/max ride the same aggregate.
    Output is 4 values per (series, bin) regardless of input density —
    at 100 TB the reduction ratio IS the operator's point."""
    ev = load_table(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        F.expr("unix_micros(ts) div 21600000000").alias("bin"),
        "ts",
        "event_id",
        "value",
    )
    w = W.partitionBy("event_type", "bin")
    rn_first = F.row_number().over(w.orderBy("ts", "event_id"))
    rn_last = F.row_number().over(w.orderBy(F.desc("ts"), F.desc("event_id")))
    flagged = binned.select(
        "event_type",
        "bin",
        "value",
        rn_first.alias("rn_first"),
        rn_last.alias("rn_last"),
    )
    return (
        flagged.groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.min("value"), 4).alias("v_min"),
            F.round(F.max("value"), 4).alias("v_max"),
            F.round(F.max(F.when(F.col("rn_first") == 1, F.col("value"))), 4).alias(
                "v_first"
            ),
            F.round(F.max(F.when(F.col("rn_last") == 1, F.col("value"))), 4).alias(
                "v_last"
            ),
        )
        .orderBy("event_type", "bin")
    )


# --------------------------------------------------------------------------
# Triangle count / transitivity over the trade graph
# --------------------------------------------------------------------------

_TRIANGLE_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT
         least(cn.n_name, sn.n_name) AS u,
         greatest(cn.n_name, sn.n_name) AS v
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  WHERE cn.n_name != sn.n_name
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs)
  GROUP BY node
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM pairs e1
  JOIN pairs e2 ON e2.u = e1.v
  JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
  (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
  t.n_triangles,
  round(3.0 * t.n_triangles
        / (SELECT sum(d * (d - 1) / 2) FROM deg), 4) AS transitivity
FROM tri t
"""


@register("graph_triangle_count", oracle=_TRIANGLE_ORACLE, tags=("graph",))
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + global transitivity over the undirected
    nation trade graph — the third graph primitive (after pointer-
    doubling components and PageRank). Edges are canonically oriented
    (least, greatest) so each undirected edge exists once and every
    triangle u<v<w is found exactly once by the two-hop join e1(u,v) x
    e2(v,w) closed by e3(u,w). As with PageRank, the fact-table joins
    SHRINK the problem first; the triangle join then runs on the
    aggregated edge list — broadcast-sized here, and at real graph
    scale the same query runs with the standard degree-ordered
    orientation (orient edges low-degree -> high-degree) which bounds
    the two-hop fan-out by sqrt(|E|). Transitivity = 3*triangles /
    open-triads, triads from the degree table."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    flows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(
                n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cn"))
            ),
            F.col("c_nationkey") == F.col("ck"),
        )
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .join(
            F.broadcast(
                n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("sn"))
            ),
            F.col("s_nationkey") == F.col("sk"),
        )
        .filter(F.col("cn") != F.col("sn"))
        .select(
            F.least("cn", "sn").alias("u"), F.greatest("cn", "sn").alias("v")
        )
        .distinct()
    )
    pairs = registry.track_persist(flows)
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1 = pairs.alias("e1")
    e2 = pairs.alias("e2")
    e3 = pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    counts = pairs.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("triads"),
        )
    )
    return (
        tri.crossJoin(F.broadcast(counts))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            F.round(3.0 * F.col("n_triangles") / F.col("triads"), 4).alias(
                "transitivity"
            ),
        )
    )
