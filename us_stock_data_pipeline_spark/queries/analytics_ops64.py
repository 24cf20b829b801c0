"""Round-65 analytics, part 64: Theil inequality decomposition and an
Arrow-grouped-UDF OLS trend with an exact SQL twin.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Theil T index, decomposed within/between nations
# --------------------------------------------------------------------------

_THEIL_ORACLE = """
WITH cust AS (
  SELECT c.c_custkey, c.c_nationkey AS nation,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2 HAVING sum(round(o.o_totalprice * 100)) > 0
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS HUGEINT) AS s FROM cust
),
terms AS (  -- per-customer (x/mu) ln(x/mu) = (x n / S) ln(x n / S), e9 ints
  SELECT CAST(floor(
           (CAST(c.x AS DOUBLE) * t.n / CAST(t.s AS DOUBLE))
           * ln(CAST(c.x AS DOUBLE) * t.n / CAST(t.s AS DOUBLE))
           * 1000000000 + 0.5) AS BIGINT) AS term_e9
  FROM cust c CROSS JOIN tot t
),
grp AS (
  SELECT nation, CAST(count(*) AS BIGINT) AS ng, CAST(sum(x) AS HUGEINT) AS sg
  FROM cust GROUP BY nation
),
btw AS (  -- per-group (S_g/S) ln( (S_g/N_g) / (S/N) ), e9 ints
  SELECT CAST(floor(
           (CAST(g.sg AS DOUBLE) / CAST(t.s AS DOUBLE))
           * ln((CAST(g.sg AS DOUBLE) / g.ng) / (CAST(t.s AS DOUBLE) / t.n))
           * 1000000000 + 0.5) AS BIGINT) AS term_e9
  FROM grp g CROSS JOIN tot t
)
SELECT t.n AS n_customers,
       CAST((SELECT count(*) FROM grp) AS BIGINT) AS n_groups,
       CAST((SELECT sum(term_e9) FROM terms) // t.n AS BIGINT) AS theil_total_e9,
       CAST((SELECT sum(term_e9) FROM btw) AS BIGINT) AS theil_between_e9,
       CAST((SELECT sum(term_e9) FROM terms) // t.n
            - (SELECT sum(term_e9) FROM btw) AS BIGINT) AS theil_within_e9
FROM tot t
"""


@register("agg_theil_decomposition", oracle=_THEIL_ORACLE, tags=("agg", "stats"))
def agg_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of customer revenue, DECOMPOSED into
    between-nation and within-nation components — the property Gini
    lacks (`events_pareto_gini`, `agg_herfindahl_index` measure total
    concentration; Theil answers "is the inequality BETWEEN markets
    or INSIDE them", which changes the go-to-market response).
    Per-customer and per-group entropy terms quantize to integer e9
    before their distributed sums; the within term is the exact
    integer difference total - between (the decomposition identity).
    Mean revenue enters as x*n/S — no float mean is materialized.
    Plan: one fact join + customer aggregate, one nation rollup,
    broadcast totals; per-customer terms are one map-side-combined
    sum over the aggregate output."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy("c_custkey", F.col("c_nationkey").alias("nation"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("x"))
        .filter(F.col("x") > 0)
    )
    tot = cust.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s"),
    )
    ratio = F.col("x").cast("double") * F.col("n") / F.col("s").cast("double")
    term = F.floor(ratio * F.log(ratio) * 1_000_000_000 + F.lit(0.5)).cast("long")
    terms_sum = (
        cust.crossJoin(F.broadcast(tot)).select(term.alias("t")).agg(F.sum("t").alias("tt"))
    )
    grp = cust.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("x").cast("decimal(38,0)").alias("sg"),
    )
    share = F.col("sg").cast("double") / F.col("s").cast("double")
    mu_ratio = (F.col("sg").cast("double") / F.col("ng")) / (
        F.col("s").cast("double") / F.col("n")
    )
    bterm = F.floor(share * F.log(mu_ratio) * 1_000_000_000 + F.lit(0.5)).cast("long")
    btw_agg = (
        grp.crossJoin(F.broadcast(tot))
        .select(bterm.alias("bt"))
        .agg(F.sum("bt").alias("bb"), F.count(F.lit(1)).cast("long").alias("n_groups"))
    )
    return (
        tot.crossJoin(F.broadcast(terms_sum))
        .crossJoin(F.broadcast(btw_agg))
        .select(
            F.col("n").alias("n_customers"),
            "n_groups",
            F.floor(F.col("tt") / F.col("n")).cast("long").alias("theil_total_e9"),
            F.col("bb").cast("long").alias("theil_between_e9"),
            (F.floor(F.col("tt") / F.col("n")) - F.col("bb"))
            .cast("long")
            .alias("theil_within_e9"),
        )
    )


# --------------------------------------------------------------------------
# Arrow-grouped-UDF OLS trend with an exact closed-form SQL twin
# --------------------------------------------------------------------------

_OLS_SCHEMA = "symbol string, n_days long, slope_e6 long, r2_e6 long"

_UDF_OLS_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT symbol, row_number() OVER (PARTITION BY symbol ORDER BY day) AS i, y
  FROM closes
),
sums AS (
  SELECT symbol, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(i) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(i * i) AS HUGEINT) AS sxx, CAST(sum(i * y) AS HUGEINT) AS sxy,
         CAST(sum(y * y) AS HUGEINT) AS syy
  FROM idx GROUP BY symbol
)
SELECT symbol, CAST(n AS BIGINT) AS n_days,
       CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
         AS slope_e6,
       CAST(floor(
         CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
         / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
         * 1000000 + 0.5) AS BIGINT) AS r2_e6
FROM sums
WHERE n * sxx > sx * sx AND n * syy > sy * sy
ORDER BY symbol
"""


@register("udf_grouped_ols_trend", oracle=_UDF_OLS_ORACLE, tags=("udf", "ml"))
def udf_grouped_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol OLS price trend computed in an Arrow-grouped pandas
    UDF (`applyInPandas`) whose output is bit-identical to the
    closed-form SQL oracle: inside the UDF the regression moments are
    accumulated as PYTHON INTEGERS (arbitrary precision — the same
    exact values the oracle's HUGEINT sums produce) and the
    slope/R^2 quantize through the identical double expression. This
    is the repo's template for when per-group logic genuinely needs
    Python: keep the group payload integer-exact, do the one float
    step last, and the UDF stays oracle-checkable instead of
    "approximately right" (`udf_zscore_by_group` showed the Arrow
    path; this shows the DETERMINISM discipline on it). Plan: one
    shuffle on symbol into applyInPandas; group payloads are
    day-grain small."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("y"))
    w = Window.partitionBy("symbol").orderBy("day")
    idx = closes.select("symbol", F.row_number().over(w).alias("i"), "y")

    def ols(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = [int(v) for v in pdf["i"]]
        ys = [int(v) for v in pdf["y"]]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        syy = sum(y * y for y in ys)
        den = n * sxx - sx * sx
        deny = n * syy - sy * sy
        if den <= 0 or deny <= 0:
            return pd.DataFrame(
                columns=["symbol", "n_days", "slope_e6", "r2_e6"]
            ).astype({"n_days": "int64", "slope_e6": "int64", "r2_e6": "int64"})
        num = n * sxy - sx * sy
        slope_e6 = math.floor(float(num) / float(den) * 1_000_000 + 0.5)
        r2_e6 = math.floor(
            float(num) * float(num) / (float(den) * float(deny)) * 1_000_000 + 0.5
        )
        return pd.DataFrame(
            {
                "symbol": [pdf["symbol"].iloc[0]],
                "n_days": [n],
                "slope_e6": [slope_e6],
                "r2_e6": [r2_e6],
            }
        )

    return idx.groupBy("symbol").applyInPandas(ols, _OLS_SCHEMA).orderBy("symbol")
