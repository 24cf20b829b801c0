"""Round-103 analytics, part 95: Durbin-Watson residual
autocorrelation and the graph rich-club coefficient.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Durbin-Watson on the residuals of each symbol's linear price trend
# --------------------------------------------------------------------------

_DW_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT symbol, day, c,
         row_number() OVER (PARTITION BY symbol ORDER BY day) AS i
  FROM closes
),
sums AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(i) AS BIGINT) AS sx, CAST(sum(c) AS BIGINT) AS sy,
         CAST(sum(i * i) AS BIGINT) AS sxx, CAST(sum(i * c) AS BIGINT) AS sxy
  FROM idx GROUP BY symbol
),
fit AS (
  -- OLS slope/intercept in pinned DOUBLE from exact sums
  SELECT symbol, n,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b,
         (CAST(sy AS DOUBLE)
          - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
            / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * sx) / n AS a
  FROM sums
),
resid AS (
  -- per-row residual quantized to exact integer milli-cents BEFORE any
  -- cross-row arithmetic, so lags and sums are order-free integers
  SELECT i.symbol, i.i,
         CAST(floor((i.c - (f.a + f.b * i.i)) * 1000 + 0.5) AS BIGINT) AS e
  FROM idx i JOIN fit f ON f.symbol = i.symbol
),
lagged AS (
  SELECT symbol, e,
         lag(e) OVER (PARTITION BY symbol ORDER BY i) AS ep
  FROM resid
)
SELECT symbol, CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(CASE WHEN ep IS NOT NULL THEN (e - ep) * (e - ep) ELSE 0 END)
         AS BIGINT) AS num_sq,
       CAST(sum(e * e) AS BIGINT) AS den_sq,
       CAST(floor(CAST(sum(CASE WHEN ep IS NOT NULL THEN (e - ep) * (e - ep)
                                ELSE 0 END) AS DOUBLE)
                  / sum(e * e) * 1000 + 0.5) AS BIGINT) AS dw_milli
FROM lagged
GROUP BY symbol
ORDER BY symbol
"""


@register("stats_durbin_watson", oracle=_DW_ORACLE, tags=("stats", "timeseries"))
def stats_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic on each symbol's detrended price:
    DW = sum (e_t - e_{t-1})^2 / sum e_t^2 over the OLS-trend
    residuals — the canonical check that a regression's errors are
    NOT autocorrelated (DW ~ 2 means clean; near 0 means the trend
    line is fighting a random walk, which for prices it always is —
    the op demonstrates WHY `agg_regression`-style fits on levels are
    misleading and returns-based ops exist). Exactness: the fit comes
    from exact power sums; each residual quantizes to integer
    milli-cents BEFORE the lag/difference arithmetic, so numerator
    and denominator are exact BIGINT sums and one final division
    quantizes DW to milli. Plan: two passes over the daily rollup —
    one aggregate for the fit (broadcast back), one lag window."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w = Window.partitionBy("symbol").orderBy("day")
    idx = closes.select("symbol", "day", "c", F.row_number().over(w).alias("i"))
    sums = idx.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("i").cast("long").alias("sx"),
        F.sum("c").cast("long").alias("sy"),
        F.sum(F.col("i") * F.col("i")).cast("long").alias("sxx"),
        F.sum(F.col("i") * F.col("c")).cast("long").alias("sxy"),
    )
    nD = F.col("n").cast("double")
    b = (nD * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        nD * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    a = (F.col("sy").cast("double") - b * F.col("sx")) / F.col("n")
    fit = sums.select("symbol", b.alias("b"), a.alias("a"))
    resid = idx.join(F.broadcast(fit), "symbol").select(
        "symbol",
        "i",
        F.floor((F.col("c") - (F.col("a") + F.col("b") * F.col("i"))) * 1000 + F.lit(0.5))
        .cast("long")
        .alias("e"),
    )
    lagged = resid.select(
        "symbol", "e", F.lag("e").over(Window.partitionBy("symbol").orderBy("i")).alias("ep")
    )
    num = F.sum(
        F.when(F.col("ep").isNotNull(), (F.col("e") - F.col("ep")) * (F.col("e") - F.col("ep"))).otherwise(0)
    ).cast("long")
    den = F.sum(F.col("e") * F.col("e")).cast("long")
    return (
        lagged.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            num.alias("num_sq"),
            den.alias("den_sq"),
        )
        .select(
            "symbol",
            "n_days",
            "num_sq",
            "den_sq",
            F.floor(F.col("num_sq").cast("double") / F.col("den_sq") * 1000 + F.lit(0.5))
            .cast("long")
            .alias("dw_milli"),
        )
        .orderBy("symbol")
    )


# --------------------------------------------------------------------------
# Rich-club coefficient of the supplier co-purchase graph
# --------------------------------------------------------------------------

_RC_DEGREE_KS = (2, 4, 8)

_RICHCLUB_ORACLE = f"""
WITH edges0 AS (
  -- undirected supplier pairs that co-supply an order (canonical a < b)
  SELECT DISTINCT least(a.l_suppkey, b.l_suppkey) AS a,
                  greatest(a.l_suppkey, b.l_suppkey) AS b
  FROM lineitem a JOIN lineitem b
    ON b.l_orderkey = a.l_orderkey AND b.l_suppkey > a.l_suppkey
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS node FROM edges0 UNION ALL SELECT b FROM edges0
  ) GROUP BY node
),
ks AS (SELECT unnest([{", ".join(str(k) for k in _RC_DEGREE_KS)}]) AS k),
club AS (
  SELECT ks.k, deg.node FROM ks JOIN deg ON deg.d > ks.k
),
club_n AS (SELECT k, CAST(count(*) AS BIGINT) AS n_k FROM club GROUP BY k),
club_e AS (
  SELECT c1.k, CAST(count(*) AS BIGINT) AS e_k
  FROM edges0 e
  JOIN club c1 ON c1.node = e.a
  JOIN club c2 ON c2.node = e.b AND c2.k = c1.k
  GROUP BY c1.k
)
SELECT n.k AS degree_k, n.n_k AS club_size,
       CAST(coalesce(e.e_k, 0) AS BIGINT) AS club_edges,
       -- phi(k) = 2 E_k / (N_k (N_k - 1)), micro-quantized
       CAST(CASE WHEN n.n_k > 1
                 THEN 2 * coalesce(e.e_k, 0) * 1000000 // (n.n_k * (n.n_k - 1))
                 ELSE -1 END AS BIGINT) AS phi_micro
FROM club_n n LEFT JOIN club_e e ON e.k = n.k
ORDER BY degree_k
"""


@register("graph_rich_club", oracle=_RICHCLUB_ORACLE, tags=("graph",))
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient of the supplier co-purchase graph:
    phi(k) = 2 E_k / (N_k (N_k - 1)), the edge density among nodes of
    degree > k — rising phi(k) means the hubs form a tight club that
    routes everything through itself, the topology question degree
    distributions (`graph_degree_distribution`) and assortativity
    (`graph_assortativity`, the correlation view of the same
    phenomenon) summarize differently. Exactness: distinct canonical
    edges, exact degree counts, and phi quantizes micro via positive
    integer division; empty clubs emit -1. Plan: one order-keyed
    self-join builds edges (fan-out bounded by lines-per-order),
    degrees from one union-aggregate, then club membership joins
    against the dimension-sized degree table — facts touched once."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select("l_orderkey", F.col("l_suppkey").alias("sa"))
    b = li.select(F.col("l_orderkey").alias("ok_b"), F.col("l_suppkey").alias("sb"))
    edges = (
        a.join(b, (F.col("ok_b") == F.col("l_orderkey")) & (F.col("sb") > F.col("sa")))
        .select(F.col("sa").alias("a"), F.col("sb").alias("b"))
        .distinct()
    )
    registry.track_persist(edges)
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    ks = spark.createDataFrame([(k,) for k in _RC_DEGREE_KS], "k long")
    club = ks.join(deg, deg.d > ks.k).select("k", "node")
    club_n = club.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n_k"))
    c1 = club.select(F.col("k"), F.col("node").alias("a"))
    c2 = club.select(F.col("k").alias("k2"), F.col("node").alias("b"))
    # r14 (guide §3.1): the club tables are node-sized (suppliers with
    # degree > k) while `edges` is fact-sized — broadcast the clubs so
    # the membership joins probe the cached edge set in place instead of
    # shuffling it twice (plan: 2 SortMergeJoin -> 2 BroadcastHashJoin;
    # in-session A/B 4.16s -> 3.79s best-of-3, identical output).
    club_e = (
        edges.join(F.broadcast(c1), "a")
        .join(F.broadcast(c2), (F.col("k2") == F.col("k")) & (c2.b == edges.b))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("e_k"))
    )
    return (
        club_n.join(club_e, "k", "left")
        .select(
            F.col("k").alias("degree_k"),
            F.col("n_k").alias("club_size"),
            F.coalesce(F.col("e_k"), F.lit(0)).cast("long").alias("club_edges"),
            F.when(
                F.col("n_k") > 1,
                F.expr("2 * coalesce(e_k, 0) * 1000000 div (n_k * (n_k - 1))"),
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("phi_micro"),
        )
        .orderBy("degree_k")
    )
