"""Round-78 analytics, part 72: HITS hubs/authorities over the
customer-part purchase bipartite graph, and the Aroon trend indicator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# HITS (Kleinberg) hubs & authorities — 2 exact normalized iterations
# --------------------------------------------------------------------------

_HITS_TOPK = 15

_HITS_ORACLE = f"""
WITH edges AS (
  SELECT o.o_custkey AS c, l.l_partkey AS p, CAST(count(*) AS BIGINT) AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
-- h0 = 1 for every customer; each half-step renormalizes to parts-per-
-- million of the max so all state stays in exact BIGINT without overflow
a1 AS (SELECT p, CAST(sum(w) AS BIGINT) AS s FROM edges GROUP BY p),
a1n AS (SELECT p, s * 1000000 // (SELECT max(s) FROM a1) AS a FROM a1),
h1 AS (
  SELECT e.c, CAST(sum(e.w * a1n.a) AS BIGINT) AS s
  FROM edges e JOIN a1n ON a1n.p = e.p GROUP BY e.c
),
h1n AS (SELECT c, s * 1000000 // (SELECT max(s) FROM h1) AS h FROM h1),
a2 AS (
  SELECT e.p, CAST(sum(e.w * h1n.h) AS BIGINT) AS s
  FROM edges e JOIN h1n ON h1n.c = e.c GROUP BY e.p
),
a2n AS (SELECT p, s * 1000000 // (SELECT max(s) FROM a2) AS a FROM a2),
h2 AS (
  SELECT e.c, CAST(sum(e.w * a2n.a) AS BIGINT) AS s
  FROM edges e JOIN a2n ON a2n.p = e.p GROUP BY e.c
),
h2n AS (SELECT c, s * 1000000 // (SELECT max(s) FROM h2) AS h FROM h2),
tops AS (
  SELECT 'authority' AS role, CAST(p AS BIGINT) AS node_key, a AS score_ppm,
         row_number() OVER (ORDER BY a DESC, p) AS rnk
  FROM a2n
  UNION ALL
  SELECT 'hub' AS role, CAST(c AS BIGINT) AS node_key, h AS score_ppm,
         row_number() OVER (ORDER BY h DESC, c) AS rnk
  FROM h2n
)
SELECT role, node_key, CAST(score_ppm AS BIGINT) AS score_ppm,
       CAST(rnk AS BIGINT) AS rnk
FROM tops WHERE rnk <= {_HITS_TOPK}
ORDER BY role, rnk
"""


@register("graph_hits_hubs_authorities", oracle=_HITS_ORACLE, tags=("graph", "iterative"))
def graph_hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg's HITS on the customer->part purchase bipartite graph:
    authorities are parts bought by strong hubs, hubs are customers who
    buy authoritative parts (a = A^T h, h = A a) — the mutual-
    reinforcement dual of `graph_pagerank_trade`'s random walk, and the
    classic query-document scoring shape for bipartite data. Two full
    iterations; every half-step renormalizes to ppm-of-max with
    positive-only integer division, so ALL state is exact BIGINT and
    never overflows (raw 4-hop products would exceed int64 at sf0.1
    already). Same shrink-then-iterate schedule as PageRank: one
    fact-fact shuffle builds the weighted edge list, then every
    iteration is a keyed aggregate over (cust, part, w) — the facts are
    never re-touched, and at 100 TB the edge table (bounded by
    |customers x parts| support, not tape length) is the only state."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    registry.track_persist(edges)
    def norm(df: DataFrame, key: str, out: str) -> DataFrame:
        mx = df.agg(F.max("s").alias("mx"))
        return df.crossJoin(F.broadcast(mx)).select(
            key, F.expr("s * 1000000 div mx").alias(out)
        )

    # Persist every half-step aggregate (node-sized frames): norm()'s
    # max-broadcast is a SECOND consumer of its input, so an unpersisted
    # chain re-executes each prior half-step once per consumer and the
    # re-runs compound down the chain (a1's edge aggregate executed 4x
    # in the executed plan; each re-run is a full join over the edge
    # table). The cache fill costs nothing extra — the mx job itself
    # populates it.
    a1 = registry.track_persist(
        edges.groupBy("p").agg(F.sum("w").cast("long").alias("s"))
    )
    a1n = norm(a1, "p", "a")
    h1 = registry.track_persist(
        edges.join(a1n, "p")
        .groupBy("c")
        .agg(F.sum(F.col("w") * F.col("a")).cast("long").alias("s"))
    )
    h1n = norm(h1, "c", "h")
    a2 = registry.track_persist(
        edges.join(h1n, "c")
        .groupBy("p")
        .agg(F.sum(F.col("w") * F.col("h")).cast("long").alias("s"))
    )
    # a2n feeds BOTH the final authority ranking and the h2 half-step
    a2n = registry.track_persist(norm(a2, "p", "a"))
    h2 = registry.track_persist(
        edges.join(a2n, "p")
        .groupBy("c")
        .agg(F.sum(F.col("w") * F.col("a")).cast("long").alias("s"))
    )
    h2n = norm(h2, "c", "h")
    w_a = Window.orderBy(F.col("a").desc(), "p")
    w_h = Window.orderBy(F.col("h").desc(), "c")
    tops = a2n.select(
        F.lit("authority").alias("role"),
        F.col("p").cast("long").alias("node_key"),
        F.col("a").cast("long").alias("score_ppm"),
        F.row_number().over(w_a).cast("long").alias("rnk"),
    ).unionAll(
        h2n.select(
            F.lit("hub").alias("role"),
            F.col("c").cast("long").alias("node_key"),
            F.col("h").cast("long").alias("score_ppm"),
            F.row_number().over(w_h).cast("long").alias("rnk"),
        )
    )
    return tops.filter(F.col("rnk") <= _HITS_TOPK).orderBy("role", "rnk")


# --------------------------------------------------------------------------
# Aroon indicator (up/down, period 14) over daily bars
# --------------------------------------------------------------------------

_AROON_N = 14

_AROON_ORACLE = f"""
WITH bars AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(max(value) * 100) AS BIGINT) AS high_cents,
         CAST(round(min(value) * 100) AS BIGINT) AS low_cents
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT symbol, day, high_cents, low_cents,
         row_number() OVER (PARTITION BY symbol ORDER BY day) AS rn
  FROM bars
),
enc AS (
  -- pack (price, recency) into one BIGINT so a plain max() finds the
  -- extreme with most-recent tie-break: rn < 1e6 always; the low side
  -- biases by 1e10 cents to stay POSITIVE (a negative packed value
  -- would flip the sign of the % 1e6 recency extraction)
  SELECT symbol, day, rn,
         max(high_cents * 1000000 + rn) OVER w AS hi_enc,
         max((10000000000 - low_cents) * 1000000 + rn) OVER w AS lo_enc
  FROM idx
  WINDOW w AS (PARTITION BY symbol ORDER BY rn
               ROWS BETWEEN {_AROON_N} PRECEDING AND CURRENT ROW)
)
SELECT symbol, day,
       CAST(rn - (hi_enc % 1000000) AS BIGINT) AS days_since_high,
       CAST(rn - (lo_enc % 1000000) AS BIGINT) AS days_since_low,
       CAST(({_AROON_N} - (rn - hi_enc % 1000000)) * 10000 // {_AROON_N} AS BIGINT)
         AS aroon_up_bp,
       CAST(({_AROON_N} - (rn - lo_enc % 1000000)) * 10000 // {_AROON_N} AS BIGINT)
         AS aroon_down_bp
FROM enc
WHERE rn > {_AROON_N}
ORDER BY symbol, day
"""


@register("bars_aroon", oracle=_AROON_ORACLE, tags=("stock", "window"))
def bars_aroon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aroon up/down (period {_AROON_N}): 100 x (N - bars since the
    N-bar high/low) / N — the trend-age indicator (a fresh high drives
    Aroon-up to 100; a stale one decays it), complementing level-based
    oscillators like `bars_stochastic_oscillator` which can sit at 100
    forever in a flat pin. The argmax-within-frame has no direct SQL
    aggregate, so (price, recency) packs into ONE BIGINT — high_cents *
    1e6 + rn — and a plain max() over the frame recovers both the
    extreme and its most-recent index exactly (lows bias-invert the price
    first); output is integer basis points via positive-only integer
    division. One (symbol, day) sort carries the row_number and both
    packed frames — a single shuffle after the daily rollup, and the
    frame is O(N) per row at any scale."""
    ev = load_table(spark, sf_dir, "events")
    bars = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max("value") * 100).cast("long").alias("high_cents"),
        F.round(F.min("value") * 100).cast("long").alias("low_cents"),
    )
    w_rn = Window.partitionBy("symbol").orderBy("day")
    idx = bars.select(
        "symbol", "day", "high_cents", "low_cents", F.row_number().over(w_rn).alias("rn")
    )
    w_frame = (
        Window.partitionBy("symbol").orderBy("rn").rowsBetween(-_AROON_N, 0)
    )
    enc = idx.select(
        "symbol",
        "day",
        "rn",
        F.max(F.col("high_cents") * 1000000 + F.col("rn")).over(w_frame).alias("hi_enc"),
        F.max((F.lit(10_000_000_000) - F.col("low_cents")) * 1000000 + F.col("rn"))
        .over(w_frame)
        .alias("lo_enc"),
    )
    ds_high = F.col("rn") - F.col("hi_enc") % 1000000
    ds_low = F.col("rn") - F.col("lo_enc") % 1000000
    return (
        enc.filter(F.col("rn") > _AROON_N)
        .select(
            "symbol",
            "day",
            ds_high.cast("long").alias("days_since_high"),
            ds_low.cast("long").alias("days_since_low"),
            F.expr(f"({_AROON_N} - (rn - hi_enc % 1000000)) * 10000 div {_AROON_N}")
            .cast("long")
            .alias("aroon_up_bp"),
            F.expr(f"({_AROON_N} - (rn - lo_enc % 1000000)) * 10000 div {_AROON_N}")
            .cast("long")
            .alias("aroon_down_bp"),
        )
        .orderBy("symbol", "day")
    )
