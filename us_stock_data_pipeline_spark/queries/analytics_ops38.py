"""Round-28 analytics, part 38: Cochran-Mantel-Haenszel pooled odds
ratio, minimum-variance pair portfolios, and off-policy bandit replay
evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Cochran-Mantel-Haenszel pooled odds ratio
# --------------------------------------------------------------------------

_CMH_ORACLE = """
WITH custs AS (
  SELECT c.c_custkey, c.c_mktsegment AS stratum,
         c.c_custkey % 2 AS exposed,
         max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS outcome
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2, 3
),
tables AS (
  SELECT stratum,
         CAST(count(*) FILTER (WHERE exposed = 1 AND outcome = 1) AS BIGINT) AS a,
         CAST(count(*) FILTER (WHERE exposed = 1 AND outcome = 0) AS BIGINT) AS b,
         CAST(count(*) FILTER (WHERE exposed = 0 AND outcome = 1) AS BIGINT) AS c,
         CAST(count(*) FILTER (WHERE exposed = 0 AND outcome = 0) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS n
  FROM custs GROUP BY stratum
),
pooled AS (
  SELECT CAST(sum(a * d * 1000000 // n) AS BIGINT) AS num_q,
         CAST(sum(b * c * 1000000 // n) AS BIGINT) AS den_q
  FROM tables
)
SELECT t.stratum, t.a, t.b, t.c, t.d,
       CAST(t.a * t.d * 1000000 // (t.b * t.c) AS BIGINT) AS stratum_or_e6,
       (SELECT CAST(num_q * 1000000 // den_q AS BIGINT) FROM pooled) AS cmh_or_e6
FROM tables t
ORDER BY t.stratum
"""


@register("stats_cmh_odds_ratio", oracle=_CMH_ORACLE, tags=("stats", "causal"))
def stats_cmh_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel pooled odds ratio — the stratified
    2x2 estimator that answers the Simpson's-paradox audit
    (`events_simpson_check` DETECTS segment reversal; CMH produces the
    confounder-adjusted effect): pool per-stratum cross-products
    a*d/n and b*c/n rather than collapsing the tables. Each stratum
    term is MICRO-QUANTIZED to a 1e-6 integer before pooling (the
    order-independence discipline), and both the per-stratum and
    pooled odds ratios are exact integer divisions. Exposure is the
    deterministic custkey parity, outcome is "ever placed an urgent
    order", strata are market segments. Plan: one customer-grain
    aggregate, one 5-row stratum table — everything after the first
    groupBy is constant-size at any scale."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    custs = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy(
            "c_custkey",
            F.col("c_mktsegment").alias("stratum"),
            (F.col("c_custkey") % 2).alias("exposed"),
        )
        .agg(
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("outcome")
        )
    )
    tables = custs.groupBy("stratum").agg(
        F.count(F.when((F.col("exposed") == 1) & (F.col("outcome") == 1), 1))
        .cast("long")
        .alias("a"),
        F.count(F.when((F.col("exposed") == 1) & (F.col("outcome") == 0), 1))
        .cast("long")
        .alias("b"),
        F.count(F.when((F.col("exposed") == 0) & (F.col("outcome") == 1), 1))
        .cast("long")
        .alias("c"),
        F.count(F.when((F.col("exposed") == 0) & (F.col("outcome") == 0), 1))
        .cast("long")
        .alias("d"),
        F.count("*").cast("long").alias("n"),
    )
    pooled = tables.agg(
        F.sum(F.expr("a * d * 1000000 div n")).cast("long").alias("num_q"),
        F.sum(F.expr("b * c * 1000000 div n")).cast("long").alias("den_q"),
    ).select(F.expr("CAST(num_q * 1000000 div den_q AS BIGINT)").alias("cmh_or_e6"))
    return (
        tables.crossJoin(F.broadcast(pooled))
        .select(
            "stratum",
            "a",
            "b",
            "c",
            "d",
            F.expr("CAST(a * d * 1000000 div (b * c) AS BIGINT)").alias(
                "stratum_or_e6"
            ),
            "cmh_or_e6",
        )
        .orderBy("stratum")
    )


# --------------------------------------------------------------------------
# Minimum-variance two-asset portfolios
# --------------------------------------------------------------------------

_RET_SCALE = 1_000_000

_MINVAR_ORACLE = f"""
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol, day,
         CAST(floor(ln(CAST(close_cents AS DOUBLE)
                       / CAST(lag(close_cents) OVER w AS DOUBLE))
                    * {_RET_SCALE} + 0.5) AS BIGINT) AS r
  FROM closes
  WINDOW w AS (PARTITION BY symbol ORDER BY day)
),
pairs AS (
  SELECT a.symbol AS sym1, b.symbol AS sym2, a.r AS r1, b.r AS r2
  FROM rets a JOIN rets b ON a.day = b.day AND a.symbol < b.symbol
  WHERE a.r IS NOT NULL AND b.r IS NOT NULL
),
sums AS (
  SELECT sym1, sym2, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(r1) AS BIGINT) AS s1, CAST(sum(r2) AS BIGINT) AS s2,
         CAST(sum(r1 * r1) AS BIGINT) AS s11,
         CAST(sum(r2 * r2) AS BIGINT) AS s22,
         CAST(sum(r1 * r2) AS BIGINT) AS s12
  FROM pairs GROUP BY sym1, sym2
)
SELECT sym1, sym2, n AS n_days,
       CAST(floor(
         ((CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2)
          - (CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2))
         / ((CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1)
            + (CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2)
            - 2 * (CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2))
         * 1000000 + 0.5) AS BIGINT) AS w1_e6
FROM sums
ORDER BY sym1, sym2
"""


@register("portfolio_min_variance_pairs", oracle=_MINVAR_ORACLE, tags=("stock", "stats"))
def portfolio_min_variance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-variance two-asset allocation for every symbol pair:
    w1 = (var2 - cov) / (var1 + var2 - 2cov) — the closed-form
    Markowitz corner every pairs-desk and risk-parity ladder starts
    from (n-asset weights need a matrix inverse; every 2-asset
    sub-problem is exact). Log returns are 1e-6 BIGINTs; variance and
    covariance numerators are assembled from integer power sums with
    per-factor double casts (n*S11 grazes the BIGINT ceiling at
    bigger tapes), and the weight quantizes once at 1e-6. Negative
    w1 (shorting) is a legitimate output when cov > var2. Plan: the
    day-aligned self-join of the per-symbol return series is keyed
    on day — tiny after the daily rollup — then one power-sum
    aggregate per pair."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents")
    )
    w = Window.partitionBy("symbol").orderBy("day")
    rets = closes.select(
        "symbol",
        "day",
        F.floor(
            F.log(F.col("close_cents").cast("double") / F.lag("close_cents").over(w).cast("double"))
            * _RET_SCALE
            + F.lit(0.5)
        )
        .cast("long")
        .alias("r"),
    ).filter(F.col("r").isNotNull())
    a = rets.select(F.col("symbol").alias("sym1"), "day", F.col("r").alias("r1"))
    b = rets.select(F.col("symbol").alias("sym2"), "day", F.col("r").alias("r2"))
    pairs = a.join(b, "day").filter(F.col("sym1") < F.col("sym2"))
    sums = pairs.groupBy("sym1", "sym2").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("r1").cast("long").alias("s1"),
        F.sum("r2").cast("long").alias("s2"),
        F.sum(F.col("r1") * F.col("r1")).cast("long").alias("s11"),
        F.sum(F.col("r2") * F.col("r2")).cast("long").alias("s22"),
        F.sum(F.col("r1") * F.col("r2")).cast("long").alias("s12"),
    )
    nd = F.col("n").cast("double")
    var1 = nd * F.col("s11") - F.col("s1").cast("double") * F.col("s1")
    var2 = nd * F.col("s22") - F.col("s2").cast("double") * F.col("s2")
    cov = nd * F.col("s12") - F.col("s1").cast("double") * F.col("s2")
    w1 = F.floor((var2 - cov) / (var1 + var2 - 2 * cov) * 1_000_000 + F.lit(0.5)).cast(
        "long"
    )
    return sums.select(
        "sym1", "sym2", F.col("n").alias("n_days"), w1.alias("w1_e6")
    ).orderBy("sym1", "sym2")


# --------------------------------------------------------------------------
# Off-policy bandit evaluation (replay method)
# --------------------------------------------------------------------------

_REPLAY_ORACLE = """
WITH logged AS (
  SELECT event_id, event_type AS action,
         CAST(date_part('hour', ts) AS BIGINT) AS hour,
         CAST(round(value * 100) AS BIGINT) AS reward_cents,
         event_id % 2 AS fold
  FROM events
),
policy AS (  -- argmax logged frequency per hour on the training fold
  SELECT hour,
         (min({'neg_cnt': neg_cnt, 'action': action})).action AS pi_action FROM (
    SELECT hour, action, -count(*) AS neg_cnt
    FROM logged WHERE fold = 0 GROUP BY hour, action
  ) GROUP BY hour
),
replayed AS (
  SELECT l.hour, p.pi_action,
         CASE WHEN l.action = p.pi_action THEN 1 ELSE 0 END AS matched,
         l.reward_cents
  FROM logged l JOIN policy p ON p.hour = l.hour
  WHERE l.fold = 1
)
SELECT hour, pi_action,
       CAST(count(*) AS BIGINT) AS n_logged,
       CAST(sum(matched) AS BIGINT) AS n_matched,
       CAST(coalesce(sum(reward_cents) FILTER (WHERE matched = 1), 0)
            // greatest(sum(matched), 1) AS BIGINT) AS est_reward_cents
FROM replayed
GROUP BY hour, pi_action
ORDER BY hour
"""


@register("bandit_replay_eval", oracle=_REPLAY_ORACLE, tags=("ml", "eval"))
def bandit_replay_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy bandit evaluation by REPLAY (Li et al. 2011): to
    estimate how a new policy would perform from logged data alone,
    keep exactly the logged rounds where the policy would have chosen
    what the logger chose, and average their observed rewards — an
    unbiased estimate when logging was uniform. The policy under test
    is argmax logged frequency per hour, trained on fold 0 (min of a
    (-count, action) struct — the exact argmax-with-tiebreak idiom);
    replay runs on fold 1, so the policy never sees its own
    evaluation data. Matched counts and mean rewards are exact
    integers. This is THE evaluation protocol for recommendation
    bandits where online A/B is too slow. Plan: one training-fold
    aggregate broadcast as the policy, one scan of the eval fold."""
    logged = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("event_type").alias("action"),
        F.hour("ts").cast("long").alias("hour"),
        F.round(F.col("value") * 100).cast("long").alias("reward_cents"),
        (F.col("event_id") % 2).alias("fold"),
    )
    policy = (
        logged.filter(F.col("fold") == 0)
        .groupBy("hour", "action")
        .agg((-F.count("*")).alias("neg_cnt"))
        .groupBy("hour")
        .agg(F.min(F.struct("neg_cnt", "action")).alias("best"))
        .select("hour", F.col("best.action").alias("pi_action"))
    )
    replayed = (
        logged.filter(F.col("fold") == 1)
        .join(F.broadcast(policy), "hour")
        .select(
            "hour",
            "pi_action",
            F.when(F.col("action") == F.col("pi_action"), 1).otherwise(0).alias(
                "matched"
            ),
            "reward_cents",
        )
    )
    return (
        replayed.groupBy("hour", "pi_action")
        .agg(
            F.count("*").cast("long").alias("n_logged"),
            F.sum("matched").cast("long").alias("n_matched"),
            F.expr(
                "CAST(coalesce(sum(CASE WHEN matched = 1 THEN reward_cents END), 0)"
                " div greatest(sum(matched), 1) AS BIGINT)"
            ).alias("est_reward_cents"),
        )
        .orderBy("hour")
    )
