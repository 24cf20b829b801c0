"""Round-52 analytics, part 51: Ljung-Box portmanteau test on daily
returns and Adamic-Adar link prediction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.functions import detmath
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Ljung-Box Q test for serial correlation in daily returns
# --------------------------------------------------------------------------

_LB_MAXLAG = 5

_LB_ORACLE = f"""
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol, day,
         CAST(floor((close_cents - lag(close_cents) OVER w) * 10000.0
                    / lag(close_cents) OVER w + 0.5) AS BIGINT) AS ret_bp
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(close_cents) OVER w IS NOT NULL
),
tot AS (
  SELECT symbol, CAST(count(*) AS HUGEINT) AS n, CAST(sum(ret_bp) AS HUGEINT) AS s
  FROM rets GROUP BY symbol
),
dev AS (
  SELECT r.symbol, row_number() OVER (PARTITION BY r.symbol ORDER BY r.day) AS i,
         t.n * r.ret_bp - t.s AS d, t.n AS n
  FROM rets r JOIN tot t ON t.symbol = r.symbol
),
lagged AS (
  SELECT a.symbol, lag.lag_k AS lag, CAST(sum(a.d * b.d) AS HUGEINT) AS num
  FROM dev a
  JOIN (SELECT unnest(generate_series(1, {_LB_MAXLAG})) AS lag_k) lag ON true
  JOIN dev b ON b.symbol = a.symbol AND b.i = a.i - lag.lag_k
  GROUP BY 1, 2
),
den AS (
  SELECT symbol, CAST(sum(d * d) AS HUGEINT) AS den, any_value(n) AS n
  FROM dev GROUP BY symbol
),
rho AS (
  SELECT l.symbol, l.lag,
         CAST(l.num AS DOUBLE) / CAST(d.den AS DOUBLE) AS r,
         CAST(d.n AS DOUBLE) AS n
  FROM lagged l JOIN den d ON d.symbol = l.symbol
)
SELECT symbol, CAST(lag AS BIGINT) AS lag,
       CAST(floor(r * 1000000 + 0.5) AS BIGINT) AS rho_e6,
       CAST(floor(sum(n * (n + 2.0) * r * r / (n - lag)) OVER (
              PARTITION BY symbol ORDER BY lag
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000 + 0.5)
         AS BIGINT) AS q_e4
FROM rho
ORDER BY symbol, lag
"""


@register("stats_ljung_box", oracle=_LB_ORACLE, tags=("stats", "timeseries"))
def stats_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on daily simple returns, lags 1..5 —
    the "are these returns white noise?" gate run before fitting any
    ARMA/vol model (`timeseries_acf` reports the raw correlogram of
    REVENUE; this tests RETURNS and accumulates the chi-square Q
    statistic that makes the correlogram a decision). Determinism: the
    series is mean-centered without a float mean (d_t = n*x_t - S,
    exact DECIMAL(38,0)/HUGEINT), each rho_k is one double division,
    and Q's running sum is a window in ascending-lag order, so both
    engines add the same five terms in the same sequence. Plan:
    daily rollup, one per-symbol window for returns, a dense-index
    lag equi-join (5 lags x days — linear, never quadratic), two tiny
    per-symbol aggregates, one ordered window for Q."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents")
    )
    w = Window.partitionBy("symbol").orderBy("day")
    prev = F.lag("close_cents").over(w)
    rets = (
        closes.select("symbol", "day", prev.alias("prev_c"), F.col("close_cents").alias("c"))
        .filter(F.col("prev_c").isNotNull())
        .select(
            "symbol",
            "day",
            F.floor((F.col("c") - F.col("prev_c")) * 10000.0 / F.col("prev_c") + F.lit(0.5))
            .cast("long")
            .alias("ret_bp"),
        )
    )
    tot = rets.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("ret_bp").cast("decimal(38,0)").alias("s"),
    )
    dev = rets.join(F.broadcast(tot), "symbol").select(
        "symbol",
        F.row_number().over(w).alias("i"),
        (F.col("n") * F.col("ret_bp") - F.col("s")).alias("d"),
        "n",
    )
    lags = spark.range(1, _LB_MAXLAG + 1).select(F.col("id").alias("lag"))
    a = dev.alias("a")
    b = dev.select(
        F.col("symbol").alias("symbol_b"), F.col("i").alias("ib"), F.col("d").alias("db")
    )
    lagged = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("symbol_b") == F.col("symbol"))
            & (F.col("ib") == F.col("i") - F.col("lag")),
        )
        .groupBy("symbol", "lag")
        .agg(F.sum(F.col("d") * F.col("db")).cast("decimal(38,0)").alias("num"))
    )
    den = dev.groupBy("symbol").agg(
        F.sum(F.col("d") * F.col("d")).cast("decimal(38,0)").alias("den"),
        F.first("n").cast("double").alias("nd"),
    )
    rho = lagged.join(F.broadcast(den), "symbol").select(
        "symbol",
        "lag",
        (F.col("num").cast("double") / F.col("den").cast("double")).alias("r"),
        F.col("nd").alias("n"),
    )
    w_q = (
        Window.partitionBy("symbol")
        .orderBy("lag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    term = F.col("n") * (F.col("n") + 2.0) * F.col("r") * F.col("r") / (F.col("n") - F.col("lag"))
    return rho.select(
        "symbol",
        F.col("lag").cast("long").alias("lag"),
        F.floor(F.col("r") * 1_000_000 + F.lit(0.5)).cast("long").alias("rho_e6"),
        F.floor(F.sum(term).over(w_q) * 10_000 + F.lit(0.5)).cast("long").alias("q_e4"),
    ).orderBy("symbol", "lag")


# --------------------------------------------------------------------------
# Adamic-Adar link prediction (log-damped common neighbors)
# --------------------------------------------------------------------------

_AA_TOPN = 20
_AA_HOT_CAP = 40  # same p99 hot-part cap as graph_link_prediction_jaccard

_AA_STAGES = detmath.det_ln_int_stages("dp", "aa_ln")

_AA_ORACLE = f"""
WITH edges0 AS (
  SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
),
hot AS (
  SELECT p FROM edges0 GROUP BY p HAVING count(*) > {_AA_HOT_CAP}
),
audit AS (
  SELECT CAST(count(*) AS BIGINT) AS n_hot FROM hot
),
edges AS (
  SELECT * FROM edges0 WHERE p NOT IN (SELECT p FROM hot)
),
pdeg AS (
  -- part-side degree; ln(1) = 0 would blow up the weight, and a part
  -- with a single supplier can never be a COMMON neighbor anyway.
  SELECT p, CAST(count(*) AS BIGINT) AS dp FROM edges GROUP BY p HAVING count(*) >= 2
),
weights AS (
  -- 1/ln(dp) via the libm-free det_ln kernel: bit-identical doubles in
  -- both engines (transcendental audit r9)
  SELECT p, CAST(floor(1000000000.0 / aa_ln + 0.5) AS BIGINT) AS w_e9
  FROM {detmath.stages_to_select(_AA_STAGES, "pdeg")}
),
pairs AS (
  SELECT a.s AS s1, b.s AS s2, CAST(count(*) AS BIGINT) AS n_common,
         CAST(sum(w.w_e9) AS BIGINT) AS aa_e9
  FROM edges a JOIN edges b ON a.p = b.p AND a.s < b.s
  JOIN weights w ON w.p = a.p
  GROUP BY a.s, b.s
)
SELECT s1, s2, n_common, aa_e9,
       (SELECT n_hot FROM audit) AS n_hot_parts_dropped
FROM pairs
ORDER BY aa_e9 DESC, s1, s2
LIMIT {_AA_TOPN}
"""


@register("graph_adamic_adar", oracle=_AA_ORACLE, tags=("graph", "similarity"))
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the supplier-part bipartite
    graph: score supplier pairs by sum(1/ln(deg(p))) over common
    parts — the log-damped refinement of common-neighbor counting
    where a rare shared part says far more than a commodity one
    (`graph_link_prediction_jaccard` normalizes by union size; AA
    weights EACH witness by its informativeness). Determinism: each
    part's weight quantizes to an integer e9 BEFORE the pair sum, so
    the distributed aggregation adds exact integers in any order.
    Scale: the same {_AA_HOT_CAP}-supplier hot-part cap as the
    Jaccard twin (audited in `n_hot_parts_dropped`) bounds the
    per-part pair fan-out at C(cap,2) regardless of skew; since r14
    the distinct edge set, the degree, the cap and the weight all
    read off ONE part-keyed collect_set rollup and pairs expand
    in-row from the sorted set — no join. Cites the candidate-generation
    shape of reference ingest (`1m-seesion-pipeline/utils.py` builds
    per-key sessions the same inverted way)."""
    li = load_table(spark, sf_dir, "lineitem")
    # r14 (guide §2.4): ONE part-keyed aggregate replaces the old
    # distinct + hot-degree aggregate + anti-join + pair self-join +
    # weights broadcast chain. collect_set(s) per part IS the distinct
    # edge set, its size IS the part degree (so the hot cap, the dp>=2
    # weight filter, the audit and the 1/ln(dp) weight all read off the
    # same row), and the C(dp,2) supplier pairs expand IN-ROW from the
    # sorted set — bounded by the same C(cap,2) invariant as before, no
    # join anywhere. Plan: 2 exchanges + 2 joins -> 1 exchange; the only
    # shuffles left are the part rollup and the (s1,s2) rollup.
    # In-session interleaved A/B at sf0.1: 3.30s -> 2.13s best-of-3
    # (every rep better), output identical; hash-match 3 SFs.
    plist = registry.track_persist(
        li.groupBy(F.col("l_partkey").alias("p"))
        .agg(F.sort_array(F.collect_set("l_suppkey")).alias("ss"))
        .withColumn("dp", F.size("ss").cast("long"))
    )
    audit = plist.filter(F.col("dp") > _AA_HOT_CAP).agg(
        F.count(F.lit(1)).cast("long").alias("n_hot_parts_dropped")
    )
    kept = plist.filter((F.col("dp") <= _AA_HOT_CAP) & (F.col("dp") >= 2))
    weighted = detmath.apply_stages(kept, _AA_STAGES).selectExpr(
        "ss", "CAST(floor(1000000000.0 / aa_ln + 0.5) AS BIGINT) AS w_e9"
    )
    pairs_raw = weighted.select(
        "w_e9",
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ss"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ss"), i + 2, F.size(F.col("ss"))),
                        lambda y: F.struct(x.alias("s1"), y.alias("s2")),
                    ),
                )
            )
        ).alias("e"),
    )
    pairs = (
        pairs_raw.select(
            F.col("e.s1").alias("s1"), F.col("e.s2").alias("s2"), "w_e9"
        )
        .groupBy("s1", "s2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum("w_e9").cast("long").alias("aa_e9"),
        )
    )
    return (
        pairs.crossJoin(F.broadcast(audit))
        .select("s1", "s2", "n_common", "aa_e9", "n_hot_parts_dropped")
        .orderBy(F.desc("aa_e9"), "s1", "s2")
        .limit(_AA_TOPN)
    )
