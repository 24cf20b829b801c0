"""Round-8 analytics additions, part 20: Kendall tau-b rank
correlation, the Kruskal-Wallis H test, and the supply-chain bullwhip
ratio — completing the nonparametric-stats shelf next to
`stats_spearman_corr`, `stats_mannwhitney_u`, and `stats_ks_two_sample`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Kendall tau-b (exact concordant/discordant pair counts)
# --------------------------------------------------------------------------

_KENDALL_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
         CASE WHEN (a.cents - b.cents) * (a.n_events - b.n_events) > 0 THEN 1 ELSE 0 END AS conc,
         CASE WHEN (a.cents - b.cents) * (a.n_events - b.n_events) < 0 THEN 1 ELSE 0 END AS disc,
         CASE WHEN a.cents = b.cents THEN 1 ELSE 0 END AS tie_x,
         CASE WHEN a.n_events = b.n_events THEN 1 ELSE 0 END AS tie_y
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type AND a.d < b.d
),
sums AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n0,
         CAST(sum(conc) AS BIGINT) AS c,
         CAST(sum(disc) AS BIGINT) AS d,
         CAST(sum(tie_x) AS BIGINT) AS n1,
         CAST(sum(tie_y) AS BIGINT) AS n2
  FROM pairs GROUP BY event_type
)
SELECT event_type, n0 AS n_pairs, c AS concordant, d AS discordant,
       floor((CAST(c AS DOUBLE) - d)
             / sqrt((CAST(n0 AS DOUBLE) - n1) * (CAST(n0 AS DOUBLE) - n2))
             * 10000 + 0.5) / 10000 AS tau_b
FROM sums
ORDER BY event_type
"""


@register("stats_kendall_tau", oracle=_KENDALL_ORACLE, tags=("stats", "analytics"))
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between a type's daily revenue and its daily
    event count — the pair-agreement rank correlation that, unlike
    `stats_spearman_corr`'s d^2 formula, has a direct probabilistic
    reading (P(concordant) - P(discordant)) and handles ties by
    construction. Concordant/discordant/tie counts are EXACT integer
    sums over the day-pair self-join (the series is first rolled up
    to per-day grain, so the quadratic term is days^2 per key —
    bounded by the calendar, the same contract as
    `timeseries_theil_sen`'s pair slopes); tau-b divides by the
    tie-corrected sqrt once at the end. Plan: one fact groupBy, one
    keyed self-join on event_type with d1 < d2, one exact groupBy."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    a, b = daily.alias("a"), daily.alias("b")
    prod = (F.col("a.cents") - F.col("b.cents")) * (
        F.col("a.n_events") - F.col("b.n_events")
    )
    pairs = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type")) & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.when(prod > 0, 1).otherwise(0).alias("conc"),
        F.when(prod < 0, 1).otherwise(0).alias("disc"),
        F.when(F.col("a.cents") == F.col("b.cents"), 1).otherwise(0).alias("tie_x"),
        F.when(F.col("a.n_events") == F.col("b.n_events"), 1).otherwise(0).alias("tie_y"),
    )
    sums = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum("conc").cast("long").alias("c"),
        F.sum("disc").cast("long").alias("d"),
        F.sum("tie_x").cast("long").alias("n1"),
        F.sum("tie_y").cast("long").alias("n2"),
    )
    tau = (F.col("c").cast("double") - F.col("d")) / F.sqrt(
        (F.col("n0").cast("double") - F.col("n1"))
        * (F.col("n0").cast("double") - F.col("n2"))
    )
    return sums.select(
        "event_type",
        F.col("n0").alias("n_pairs"),
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        (F.floor(tau * 10000 + F.lit(0.5)) / 10000).alias("tau_b"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Kruskal-Wallis H test (tie-corrected, exact 2x midranks)
# --------------------------------------------------------------------------

_KW_ORACLE = """
WITH obs AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
),
vals AS (
  SELECT cents, CAST(count(*) AS BIGINT) AS c FROM obs GROUP BY cents
),
mr AS (
  -- 2x midrank of each distinct value: 2*(rank before) + count + 1
  SELECT cents, c,
         2 * (sum(c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS mr2
  FROM vals
),
grp AS (
  SELECT o.event_type,
         CAST(count(*) AS BIGINT) AS n_j,
         CAST(sum(m.mr2) AS BIGINT) AS r2_j
  FROM obs o JOIN mr m ON m.cents = o.cents
  GROUP BY o.event_type
),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(c * c * c - c) AS BIGINT) AS tie_sum
  FROM vals
),
h AS (
  SELECT CAST(count(*) AS BIGINT) AS n_groups,
         12.0 / (max(t.n) * (CAST(max(t.n) AS DOUBLE) + 1))
           * sum((CAST(g.r2_j AS DOUBLE) / 2) * (CAST(g.r2_j AS DOUBLE) / 2) / g.n_j)
           - 3.0 * (max(t.n) + 1) AS h_raw,
         1.0 - CAST(max(t.tie_sum) AS DOUBLE)
             / (CAST(max(t.n) AS DOUBLE) * max(t.n) * max(t.n) - max(t.n)) AS tie_c,
         CAST(max(t.n) AS BIGINT) AS n_total
  FROM grp g CROSS JOIN tot t
)
SELECT n_groups, n_total, n_groups - 1 AS df,
       floor(h_raw / tie_c * 10000 + 0.5) / 10000 AS h_statistic,
       floor(tie_c * 1000000 + 0.5) / 1000000 AS tie_correction
FROM h
"""


@register("stats_kruskal_wallis", oracle=_KW_ORACLE, tags=("stats", "analytics"))
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H: does the value distribution differ across
    event types — the k-group extension of `stats_mannwhitney_u`,
    the nonparametric ANOVA every experimentation platform reaches
    for when normality is off the table. Ranks never materialize
    per-row: observations compress to their VALUE SUPPORT (distinct
    integer cents + counts, the same compression as
    `stats_ks_two_sample`), 2x-scaled midranks come from one
    cumulative sum over that support, and each group's rank sum is
    an exact BIGINT dot product of per-(group, value) counts with
    midranks. The H statistic and its tie correction are one double
    expression from exact ints. Plan: two groupBys on the value
    support, one window over the (bounded) distinct-value set, one
    broadcast join back — no global per-row sort at any scale."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    vals = obs.groupBy("cents").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wv = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    mr = vals.select(
        "cents",
        "c",
        (2 * (F.sum("c").over(wv) - F.col("c")) + F.col("c") + 1).alias("mr2"),
    )
    grp = (
        obs.join(F.broadcast(mr), "cents")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_j"),
            F.sum("mr2").cast("long").alias("r2_j"),
        )
    )
    tot = vals.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("tie_sum"),
    )
    h = grp.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        (
            12.0
            / (F.max("n") * (F.max("n").cast("double") + 1))
            * F.sum(
                (F.col("r2_j").cast("double") / 2)
                * (F.col("r2_j").cast("double") / 2)
                / F.col("n_j")
            )
            - 3.0 * (F.max("n") + 1)
        ).alias("h_raw"),
        (
            F.lit(1.0)
            - F.max("tie_sum").cast("double")
            / (F.max("n").cast("double") * F.max("n") * F.max("n") - F.max("n"))
        ).alias("tie_c"),
        F.max("n").cast("long").alias("n_total"),
    )
    return h.select(
        "n_groups",
        "n_total",
        (F.col("n_groups") - 1).alias("df"),
        (F.floor(F.col("h_raw") / F.col("tie_c") * 10000 + F.lit(0.5)) / 10000).alias(
            "h_statistic"
        ),
        (F.floor(F.col("tie_c") * 1000000 + F.lit(0.5)) / 1000000).alias(
            "tie_correction"
        ),
    )


# --------------------------------------------------------------------------
# Supply-chain bullwhip ratio (variance amplification up the chain)
# --------------------------------------------------------------------------

_BULLWHIP_ORACLE = """
WITH demand AS (
  SELECT p.p_type, date_trunc('month', o.o_orderdate) AS mon,
         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
supply AS (
  SELECT p.p_type, date_trunc('month', l.l_shipdate) AS mon,
         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
dstat AS (
  SELECT p_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(qty) AS BIGINT) AS s1, CAST(sum(qty * qty) AS BIGINT) AS s2
  FROM demand GROUP BY p_type
),
sstat AS (
  SELECT p_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(qty) AS BIGINT) AS s1, CAST(sum(qty * qty) AS BIGINT) AS s2
  FROM supply GROUP BY p_type
)
SELECT d.p_type,
       d.n AS n_months_demand, s.n AS n_months_supply,
       floor((CAST(d.n AS DOUBLE) * d.s2 - CAST(d.s1 AS DOUBLE) * d.s1)
             / (CAST(d.n AS DOUBLE) * (d.n - 1)) * 100 + 0.5) / 100 AS var_demand,
       floor((CAST(s.n AS DOUBLE) * s.s2 - CAST(s.s1 AS DOUBLE) * s.s1)
             / (CAST(s.n AS DOUBLE) * (s.n - 1)) * 100 + 0.5) / 100 AS var_supply,
       floor(((CAST(s.n AS DOUBLE) * s.s2 - CAST(s.s1 AS DOUBLE) * s.s1)
              / (CAST(s.n AS DOUBLE) * (s.n - 1)))
             / ((CAST(d.n AS DOUBLE) * d.s2 - CAST(d.s1 AS DOUBLE) * d.s1)
                / (CAST(d.n AS DOUBLE) * (d.n - 1)))
             * 10000 + 0.5) / 10000 AS bullwhip_ratio
FROM dstat d JOIN sstat s ON s.p_type = d.p_type
ORDER BY d.p_type
"""


@register("supply_chain_bullwhip", oracle=_BULLWHIP_ORACLE, tags=("analytics", "supply"))
def supply_chain_bullwhip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bullwhip ratio per product type: the variance of the monthly
    SHIPPED quantity series over the variance of the monthly ORDERED
    (demand) quantity series — the Lee/Padmanabhan/Whang measure of
    demand-signal amplification up a supply chain (ratio > 1 means
    the chain amplifies noise; procurement teams watch it next to
    `orders_fulfillment_leadtime`). Both monthly series aggregate
    exact integer quantities; each variance comes from the
    (n*s2 - s1^2)/(n(n-1)) identity on exact BIGINT power sums —
    accumulation order cannot move the result — and the ratio
    divides once. Plan: two fact passes (order-date grain needs the
    orders join, ship-date grain does not), part dim broadcast, tiny
    per-type stat join."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    demand = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type", F.date_trunc("month", "o_orderdate").alias("mon"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"))
    )
    supply = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type", F.date_trunc("month", "l_shipdate").alias("mon"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"))
    )

    def _stat(df):
        return df.groupBy("p_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("qty").cast("long").alias("s1"),
            F.sum(F.col("qty") * F.col("qty")).cast("long").alias("s2"),
        )

    def _var(n, s1, s2):
        return (n.cast("double") * s2 - s1.cast("double") * s1) / (
            n.cast("double") * (n - 1)
        )

    d = _stat(demand).alias("d")
    s = _stat(supply).alias("s")
    var_d = _var(F.col("d.n"), F.col("d.s1"), F.col("d.s2"))
    var_s = _var(F.col("s.n"), F.col("s.s1"), F.col("s.s2"))
    return (
        d.join(s, F.col("s.p_type") == F.col("d.p_type"))
        .select(
            F.col("d.p_type").alias("p_type"),
            F.col("d.n").alias("n_months_demand"),
            F.col("s.n").alias("n_months_supply"),
            (F.floor(var_d * 100 + F.lit(0.5)) / 100).alias("var_demand"),
            (F.floor(var_s * 100 + F.lit(0.5)) / 100).alias("var_supply"),
            (F.floor(var_s / var_d * 10000 + F.lit(0.5)) / 10000).alias(
                "bullwhip_ratio"
            ),
        )
        .orderBy("p_type")
    )
