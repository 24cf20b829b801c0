"""Round-112 analytics, part 102: edge triangle support (bridge
screen) and the Theil U decomposition of forecast MSE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Edge triangle support: embedded edges vs bridge-like edges
# --------------------------------------------------------------------------

_ETS_DEG_CAP = 40

_ETS_ORACLE = f"""
WITH edges0 AS (
  SELECT DISTINCT least(a.l_suppkey, b.l_suppkey) AS u,
                  greatest(a.l_suppkey, b.l_suppkey) AS v
  FROM lineitem a JOIN lineitem b
    ON b.l_orderkey = a.l_orderkey AND b.l_suppkey > a.l_suppkey
),
-- bridge screening only makes sense on the sparse periphery: hub
-- suppliers are never bridges, and including them makes the dense
-- co-purchase graph's triangle enumeration Theta(n^3) (46s at sf0.1
-- before this cap). Keep edges whose BOTH endpoints have degree <=
-- the cap — the graph_link_prediction_jaccard hot-key guard.
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT u AS node FROM edges0 UNION ALL SELECT v FROM edges0
  ) GROUP BY node
),
keep AS (SELECT node FROM deg WHERE d <= {_ETS_DEG_CAP}),
edges AS (
  SELECT e.u, e.v FROM edges0 e
  JOIN keep k1 ON k1.node = e.u
  JOIN keep k2 ON k2.node = e.v
),
-- enumerate each triangle ONCE on the canonically ordered edge list
-- (u < v < w), then credit all three of its edges: O(oriented wedges),
-- the same plan family as graph_triangle_count — the naive symmetric
-- common-neighbor join measured 294s at sf0.1 before this rewrite
tris AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.v
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
),
roles AS (
  SELECT a AS u, b AS v FROM tris
  UNION ALL SELECT b, c FROM tris
  UNION ALL SELECT a, c FROM tris
),
support AS (
  SELECT u, v, CAST(count(*) AS BIGINT) AS tri FROM roles GROUP BY u, v
)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(CASE WHEN s.tri IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bridge_like,
       CAST(coalesce(sum(s.tri), 0) AS BIGINT) AS support_sum,
       CAST(coalesce(max(s.tri), 0) AS BIGINT) AS max_support
FROM edges e LEFT JOIN support s ON s.u = e.u AND s.v = e.v
"""


@register("graph_edge_triangle_support", oracle=_ETS_ORACLE, tags=("graph",))
def graph_edge_triangle_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge triangle support over the supplier co-purchase graph: for
    every edge, the number of triangles it participates in (= common
    neighbors of its endpoints). Zero-support edges are BRIDGE-LIKE —
    the ties whose removal disconnects communities — while
    high-support edges are embedded, the edge-level signal community
    detectors and k-truss decompositions build on (`graph_triangle_
    count` totals triangles per graph; the truss ladder needs them PER
    EDGE). Triangles enumerate ONCE on the canonically ordered edge
    list (u < v < w, the `graph_triangle_count` orientation — the
    wedge fan-out is bounded by oriented out-degree, which min-degree
    orientation keeps small on skewed graphs) and each triangle
    credits its three edges; the naive symmetric common-neighbor join
    measured 294s at sf0.1 before this rewrite, and the degree cap
    (<= 40) keeps the dense fixture's hub core out of the
    enumeration. Output is the summary
    (edge count, bridge-like count, total/max support) so the result
    is cardinality-stable at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select("l_orderkey", F.col("l_suppkey").alias("sa"))
    b = li.select(F.col("l_orderkey").alias("ok_b"), F.col("l_suppkey").alias("sb"))
    edges0 = (
        a.join(b, (F.col("ok_b") == F.col("l_orderkey")) & (F.col("sb") > F.col("sa")))
        .select(F.col("sa").alias("u"), F.col("sb").alias("v"))
        .distinct()
    )
    registry.track_persist(edges0)
    deg = (
        edges0.select(F.col("u").alias("node"))
        .unionAll(edges0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    keep = deg.filter(F.col("d") <= _ETS_DEG_CAP).select("node")
    edges = (
        edges0.join(F.broadcast(keep.withColumnRenamed("node", "u")), "u")
        .join(F.broadcast(keep.withColumnRenamed("node", "v")), "v")
        .select("u", "v")
    )
    registry.track_persist(edges)
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    e3 = edges.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    tris = (
        e1.join(e2, F.col("b2") == F.col("b"))
        .join(e3, (F.col("a3") == F.col("a")) & (F.col("c3") == F.col("c")))
        .select("a", "b", "c")
    )
    roles = (
        tris.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(tris.select(F.col("b").alias("u"), F.col("c").alias("v")))
        .unionAll(tris.select(F.col("a").alias("u"), F.col("c").alias("v")))
    )
    support = roles.groupBy("u", "v").agg(F.count(F.lit(1)).cast("long").alias("tri"))
    return (
        edges.join(support, ["u", "v"], "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.sum(F.when(F.col("tri").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_bridge_like"),
            F.coalesce(F.sum("tri"), F.lit(0)).cast("long").alias("support_sum"),
            F.coalesce(F.max("tri"), F.lit(0)).cast("long").alias("max_support"),
        )
    )


# --------------------------------------------------------------------------
# Theil U decomposition: bias / variance / covariance shares of MSE
# --------------------------------------------------------------------------

_THEIL_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
-- forecast = 7-day seasonal naive (same weekday last week)
pairs AS (
  SELECT symbol, c AS actual,
         lag(c, 7) OVER (PARTITION BY symbol ORDER BY day) AS fcst
  FROM closes
  QUALIFY lag(c, 7) OVER (PARTITION BY symbol ORDER BY day) IS NOT NULL
),
sums AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(actual) AS BIGINT) AS sa, CAST(sum(fcst) AS BIGINT) AS sf,
         CAST(sum(actual * actual) AS BIGINT) AS saa,
         CAST(sum(fcst * fcst) AS BIGINT) AS sff,
         CAST(sum(actual * fcst) AS BIGINT) AS saf,
         CAST(sum((actual - fcst) * (actual - fcst)) AS BIGINT) AS sse
  FROM pairs GROUP BY symbol
),
-- UM = (mean_f - mean_a)^2 / MSE; US = (sd_f - sd_a)^2 / MSE;
-- UC = 2(1-r) sd_f sd_a / MSE. Population sds; pinned doubles.
parts AS (
  SELECT symbol, n, sse,
         (CAST(sf AS DOUBLE) / n - CAST(sa AS DOUBLE) / n) AS mdiff,
         sqrt((CAST(sff AS DOUBLE) - CAST(sf AS DOUBLE) * sf / n) / n) AS sd_f,
         sqrt((CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / n) / n) AS sd_a,
         (CAST(saf AS DOUBLE) - CAST(sa AS DOUBLE) * sf / n) / n AS cov_af
  FROM sums
)
SELECT symbol, n AS n_obs, CAST(sse AS BIGINT) AS sse_cents2,
       CAST(floor(mdiff * mdiff / (CAST(sse AS DOUBLE) / n) * 1000000 + 0.5)
         AS BIGINT) AS bias_share_micro,
       CAST(floor((sd_f - sd_a) * (sd_f - sd_a) / (CAST(sse AS DOUBLE) / n)
                  * 1000000 + 0.5) AS BIGINT) AS variance_share_micro,
       CAST(floor(2 * (sd_f * sd_a - cov_af) / (CAST(sse AS DOUBLE) / n)
                  * 1000000 + 0.5) AS BIGINT) AS covariance_share_micro
FROM parts
ORDER BY symbol
"""


@register("forecast_theil_mse_decomposition", oracle=_THEIL_ORACLE, tags=("forecast", "stats"))
def forecast_theil_mse_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U decomposition of seasonal-naive forecast MSE into
    bias, variance, and covariance shares (UM + US + UC = 1): UM
    says the forecast is systematically OFF-LEVEL (fixable with an
    intercept), US says it's mis-scaled (fixable with a slope), and
    UC is the irreducible noise — the diagnosis layer on top of the
    error MAGNITUDE metrics (`forecast_eval_seasonal_naive` reports
    MAPE; `forecast_theil_u2` reports skill; neither says WHAT to
    fix). Exactness: all seven power sums are exact BIGINT off one
    lag; the three shares assemble once in pinned DOUBLE and quantize
    micro (they sum to ~1e6 up to rounding — an executable identity).
    Plan: one lag window, one grouped reduce."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w = Window.partitionBy("symbol").orderBy("day")
    pairs = (
        closes.select(
            "symbol", F.col("c").alias("actual"), F.lag("c", 7).over(w).alias("fcst")
        )
        .filter(F.col("fcst").isNotNull())
    )
    sums = pairs.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("actual").cast("long").alias("sa"),
        F.sum("fcst").cast("long").alias("sf"),
        F.sum(F.col("actual") * F.col("actual")).cast("long").alias("saa"),
        F.sum(F.col("fcst") * F.col("fcst")).cast("long").alias("sff"),
        F.sum(F.col("actual") * F.col("fcst")).cast("long").alias("saf"),
        F.sum((F.col("actual") - F.col("fcst")) * (F.col("actual") - F.col("fcst")))
        .cast("long")
        .alias("sse"),
    )
    n = F.col("n")
    mdiff = F.col("sf").cast("double") / n - F.col("sa").cast("double") / n
    sd_f = F.sqrt((F.col("sff").cast("double") - F.col("sf").cast("double") * F.col("sf") / n) / n)
    sd_a = F.sqrt((F.col("saa").cast("double") - F.col("sa").cast("double") * F.col("sa") / n) / n)
    cov_af = (F.col("saf").cast("double") - F.col("sa").cast("double") * F.col("sf") / n) / n
    mse = F.col("sse").cast("double") / n
    q = lambda col: F.floor(col * 1000000 + F.lit(0.5)).cast("long")  # noqa: E731
    return sums.select(
        "symbol",
        F.col("n").alias("n_obs"),
        F.col("sse").alias("sse_cents2"),
        q(mdiff * mdiff / mse).alias("bias_share_micro"),
        q((sd_f - sd_a) * (sd_f - sd_a) / mse).alias("variance_share_micro"),
        q(2 * (sd_f * sd_a - cov_af) / mse).alias("covariance_share_micro"),
    ).orderBy("symbol")
