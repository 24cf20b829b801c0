"""Round-9 additions, part 21: privacy / multiple-testing / normality
statistics — k-anonymity auditing, Jarque-Bera normality tests, and
Benjamini-Hochberg FDR control over a panel of per-brand hypotheses.

The reference pipeline (symbols(historical)/ingest_massive.py,
1m-seesion-pipeline/ingest_1m_session.py) lands raw market data and
stops; a production curation stack must also answer "can we release
this table?" (k-anonymity), "is this metric normal enough for the
z-tests we run on it?" (Jarque-Bera), and "which of these 25
simultaneous per-brand alerts survive multiple-testing correction?"
(BH-FDR). All three are single-scan exact-integer aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# k-anonymity / l-diversity release audit
# --------------------------------------------------------------------------

# Quasi-identifier: (nation, market segment, $1000 balance bucket).
# Shift cents by +100000 before the integer division so the bucket id
# stays on the positive axis (customer balances go to -999.99).
_KANON_ORACLE = """
WITH cust AS (
  SELECT c_custkey, c_nationkey AS nat, c_mktsegment AS seg,
         (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000 AS bal_bucket
  FROM customer
),
classes AS (
  SELECT nat, seg, bal_bucket, CAST(count(*) AS BIGINT) AS k
  FROM cust GROUP BY nat, seg, bal_bucket
),
sens AS (
  SELECT c.nat, c.seg, c.bal_bucket,
         CAST(count(DISTINCT o.o_orderpriority) AS BIGINT) AS l
  FROM cust c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.nat, c.seg, c.bal_bucket
)
SELECT k.k AS class_size,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(k.k) AS BIGINT) AS n_customers,
       CAST(min(coalesce(s.l, 0)) AS BIGINT) AS min_l_diversity,
       CAST(max(coalesce(s.l, 0)) AS BIGINT) AS max_l_diversity
FROM classes k
LEFT JOIN sens s ON s.nat = k.nat AND s.seg = k.seg AND s.bal_bucket = k.bal_bucket
GROUP BY k.k
ORDER BY k.k
"""


@register("compliance_k_anonymity", oracle=_KANON_ORACLE, tags=("compliance", "agg"))
def compliance_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity release audit: group the customer
    table by a quasi-identifier triple (nation, segment, $1000
    balance bucket), measure each equivalence class's size k and its
    sensitive-attribute diversity l (distinct order priorities seen
    across the class's orders), then report the k-distribution — the
    table a privacy review reads before approving a data release
    ("how many customers sit in classes of size 1?"). The balance
    bucket is a shifted integer division on exact cents so both
    engines bin identically, including negative balances. Plan: one
    groupBy on the QI for k, one join+groupBy for l (the orders join
    shuffles on custkey — the fact side's natural key), then a tiny
    class-level join and rollup; class count is bounded by the QI
    cardinality (25 nations x 5 segments x ~11 buckets), so
    everything after the first aggregations is broadcast-sized at
    any corpus scale."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.expr(
            "(CAST(round(c_acctbal * 100) AS BIGINT) + 100000) div 100000"
        ).alias("bal_bucket"),
    )
    classes = cust.groupBy("nat", "seg", "bal_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    orders = load_table(spark, sf_dir, "orders")
    sens = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("nat", "seg", "bal_bucket")
        .agg(F.countDistinct("o_orderpriority").cast("long").alias("l"))
    )
    joined = classes.join(F.broadcast(sens), ["nat", "seg", "bal_bucket"], "left")
    return (
        joined.groupBy(F.col("k").alias("class_size"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum("k").cast("long").alias("n_customers"),
            F.min(F.coalesce(F.col("l"), F.lit(0))).cast("long").alias("min_l_diversity"),
            F.max(F.coalesce(F.col("l"), F.lit(0))).cast("long").alias("max_l_diversity"),
        )
        .orderBy("class_size")
    )


# --------------------------------------------------------------------------
# Jarque-Bera normality test per group
# --------------------------------------------------------------------------

# Same raw-power-sum discipline as agg_higher_moments (both engines'
# built-in skewness/kurtosis disagree on estimator); JB adds the test
# statistic and the chi2(2) decision at alpha=0.05 (critical 5.991).
_JB_ORACLE = """
WITH p AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         avg(value) AS e1,
         avg(value * value) AS e2,
         avg(value * value * value) AS e3,
         avg(value * value * value * value) AS e4
  FROM events GROUP BY event_type
),
m AS (
  SELECT event_type, n,
         e2 - e1 * e1 AS m2,
         e3 - 3 * e1 * e2 + 2 * e1 * e1 * e1 AS m3,
         e4 - 4 * e1 * e3 + 6 * e1 * e1 * e2 - 3 * e1 * e1 * e1 * e1 AS m4
  FROM p
),
g AS (
  SELECT event_type, n,
         m3 / pow(m2, 1.5) AS skew,
         m4 / (m2 * m2) - 3 AS kurt_x
  FROM m
)
SELECT event_type, n,
       round(skew, 4) AS skewness,
       round(kurt_x, 4) AS kurtosis_excess,
       round(n / 6.0 * (skew * skew + kurt_x * kurt_x / 4), 2) AS jb_stat,
       CAST(CASE WHEN n / 6.0 * (skew * skew + kurt_x * kurt_x / 4) > 5.991
                 THEN 1 ELSE 0 END AS BIGINT) AS reject_normality
FROM g
ORDER BY event_type
"""


@register("stats_jarque_bera", oracle=_JB_ORACLE, tags=("stats", "agg"))
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test per event type: JB = n/6 * (S^2 +
    K^2/4) from population skewness S and excess kurtosis K, rejected
    against the chi-square(2) 5% critical value 5.991 — the screen a
    quant runs before trusting any z-score-based anomaly rule
    (`anomaly_rolling_zscore`) on a series. Moments come from the
    same raw power sums as `agg_higher_moments` (four mergeable
    avg accumulators; Spark's and DuckDB's skewness() built-ins use
    different estimators, the expansion pins one formula on both
    engines), quantized with round() before hashing so parallel
    summation order can't flip last-ulp bits. Plan: one scan, one
    map-side-combined groupBy; distributed state is five numbers per
    group regardless of row count."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    p = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(v).alias("e1"),
        F.avg(v * v).alias("e2"),
        F.avg(v * v * v).alias("e3"),
        F.avg(v * v * v * v).alias("e4"),
    )
    e1, e2, e3, e4 = F.col("e1"), F.col("e2"), F.col("e3"), F.col("e4")
    m2 = e2 - e1 * e1
    m3 = e3 - 3 * e1 * e2 + 2 * e1 * e1 * e1
    m4 = e4 - 4 * e1 * e3 + 6 * e1 * e1 * e2 - 3 * e1 * e1 * e1 * e1
    skew = m3 / F.pow(m2, F.lit(1.5))
    kurt_x = m4 / (m2 * m2) - 3
    jb = F.col("n") / 6.0 * (skew * skew + kurt_x * kurt_x / 4)
    return p.select(
        "event_type",
        "n",
        F.round(skew, 4).alias("skewness"),
        F.round(kurt_x, 4).alias("kurtosis_excess"),
        F.round(jb, 2).alias("jb_stat"),
        F.when(jb > 5.991, 1).otherwise(0).cast("long").alias("reject_normality"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Benjamini-Hochberg FDR over a panel of per-brand return-rate tests
# --------------------------------------------------------------------------

# One-sample two-sided proportion z per brand vs the global return
# rate; p-values via the Abramowitz-Stegun 26.2.17 normal-CDF
# polynomial (neither engine ships erf, so both evaluate the SAME
# approximation expression — cross-engine equality is by construction).
# BH step runs on floor-quantized integer p-values so the threshold
# comparison p_(i) <= (i/m)*alpha is an exact integer predicate:
# p_int * m <= i * 50_000_000  (alpha = 0.05, p scaled by 1e9).
_BH_ALPHA_E9 = 50_000_000

_BH_ORACLE = f"""
WITH br AS (
  SELECT p.p_brand,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(r) AS BIGINT) AS rr FROM br
),
z AS (
  SELECT b.p_brand, b.n, b.r,
         abs((CAST(b.r AS DOUBLE) / b.n - CAST(t.rr AS DOUBLE) / t.nn)
             / sqrt(CAST(t.rr AS DOUBLE) / t.nn * (1 - CAST(t.rr AS DOUBLE) / t.nn) / b.n))
           AS az
  FROM br b CROSS JOIN tot t
),
pv AS (
  SELECT p_brand, n, r,
         CAST(floor(
           2 * (exp(-az * az / 2) / sqrt(2 * pi())
                * (0.319381530 * (1 / (1 + 0.2316419 * az))
                   - 0.356563782 * pow(1 / (1 + 0.2316419 * az), 2)
                   + 1.781477937 * pow(1 / (1 + 0.2316419 * az), 3)
                   - 1.821255978 * pow(1 / (1 + 0.2316419 * az), 4)
                   + 1.330274429 * pow(1 / (1 + 0.2316419 * az), 5)))
           * 1000000000) AS BIGINT) AS p_e9
  FROM z
),
ranked AS (
  SELECT p_brand, n, r, p_e9,
         row_number() OVER (ORDER BY p_e9, p_brand) AS i,
         count(*) OVER () AS m
  FROM pv
),
cut AS (
  SELECT max(CASE WHEN p_e9 * m <= i * {_BH_ALPHA_E9} THEN i ELSE 0 END) OVER () AS k
  FROM ranked LIMIT 1
)
SELECT r.p_brand, r.n AS n_lines, r.r AS n_returns,
       CAST(r.p_e9 // 1000 AS DOUBLE) / 1000000 AS p_value,
       r.i AS p_rank,
       CAST(CASE WHEN r.i <= c.k THEN 1 ELSE 0 END AS BIGINT) AS rejected
FROM ranked r CROSS JOIN cut c
ORDER BY r.i
"""


@register("stats_benjamini_hochberg", oracle=_BH_ORACLE, tags=("stats", "window"))
def stats_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over 25 simultaneous hypotheses:
    each part brand's return rate is z-tested against the global rate,
    p-values sorted ascending, and the BH step-up rule keeps the
    largest k with p_(k) <= (k/m)*alpha — the correction any
    dashboard firing dozens of per-segment alerts needs before paging
    someone (1-2 of 25 brands WILL clear alpha=0.05 by chance).
    Neither engine ships erf(), so both evaluate the identical
    Abramowitz-Stegun normal-CDF polynomial, and the BH threshold
    compare runs on floor-quantized 1e-9-scaled integer p-values —
    an exact integer predicate immune to last-ulp divergence. The
    global windows (row_number, count, max) run over m = brand-count
    rows, bounded by construction after the heavy groupBy; the fact
    scan itself is one map-side-combined aggregation with a broadcast
    part dim."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    br = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("r"),
        )
    )
    tot = br.agg(
        F.sum("n").cast("long").alias("nn"), F.sum("r").cast("long").alias("rr")
    )
    z = br.crossJoin(F.broadcast(tot)).select(
        "p_brand",
        "n",
        "r",
        F.abs(
            (F.col("r").cast("double") / F.col("n") - F.col("rr").cast("double") / F.col("nn"))
            / F.sqrt(
                F.col("rr").cast("double")
                / F.col("nn")
                * (1 - F.col("rr").cast("double") / F.col("nn"))
                / F.col("n")
            )
        ).alias("az"),
    )
    t = 1 / (1 + 0.2316419 * F.col("az"))
    phi = F.exp(-F.col("az") * F.col("az") / 2) / F.sqrt(F.lit(2) * F.lit(3.141592653589793))
    poly = (
        0.319381530 * t
        - 0.356563782 * F.pow(t, 2)
        + 1.781477937 * F.pow(t, 3)
        - 1.821255978 * F.pow(t, 4)
        + 1.330274429 * F.pow(t, 5)
    )
    pv = z.select(
        "p_brand",
        "n",
        "r",
        F.floor(2 * phi * poly * 1000000000).cast("long").alias("p_e9"),
    )
    w_all = Window.partitionBy(F.lit(1))
    ranked = pv.select(
        "p_brand",
        "n",
        "r",
        "p_e9",
        F.row_number().over(w_all.orderBy("p_e9", "p_brand")).alias("i"),
        F.count(F.lit(1)).over(w_all).alias("m"),
    )
    cut = ranked.select(
        F.max(
            F.when(F.col("p_e9") * F.col("m") <= F.col("i") * _BH_ALPHA_E9, F.col("i")).otherwise(0)
        )
        .over(w_all)
        .alias("k")
    ).limit(1)
    return (
        ranked.crossJoin(F.broadcast(cut))
        .select(
            "p_brand",
            F.col("n").alias("n_lines"),
            F.col("r").alias("n_returns"),
            (F.expr("CAST(p_e9 div 1000 AS DOUBLE)") / 1000000).alias("p_value"),
            F.col("i").alias("p_rank"),
            F.when(F.col("i") <= F.col("k"), 1).otherwise(0).cast("long").alias("rejected"),
        )
        .orderBy("p_rank")
    )
