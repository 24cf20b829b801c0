"""Round-43 ML eval, part 8: the population stability index (PSI)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Population stability index (PSI)
# --------------------------------------------------------------------------

_PSI_BINS = 10

_PSI_ORACLE = f"""
WITH halves AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS y,
         CASE WHEN o_orderdate < DATE '1998-01-01' THEN 0 ELSE 1 END AS half
  FROM orders
),
edges AS (  -- decile edges from the BASELINE half only
  SELECT y AS edge FROM (
    SELECT y, row_number() OVER (ORDER BY y) AS rn,
           count(*) OVER () AS n
    FROM halves WHERE half = 0
  ) t JOIN (SELECT unnest(generate_series(1, {_PSI_BINS - 1})) AS rk) r
    ON t.rn = (r.rk * t.n + {_PSI_BINS - 1}) // {_PSI_BINS}
),
binned AS (
  SELECT h.half,
         (SELECT CAST(count(*) AS BIGINT) FROM edges e WHERE h.y > e.edge) AS bin
  FROM halves h
),
expanded AS (
  SELECT half, bin, CAST(count(*) AS BIGINT) AS cnt
  FROM binned GROUP BY half, bin
),
tots AS (
  SELECT half, CAST(sum(cnt) AS BIGINT) AS n_half FROM expanded GROUP BY half
),
rates AS (
  SELECT e.bin,
         CAST(max(CASE WHEN e.half = 0 THEN e.cnt * 1000000 // t.n_half END) AS BIGINT)
           AS p_base_e6,
         CAST(max(CASE WHEN e.half = 1 THEN e.cnt * 1000000 // t.n_half END) AS BIGINT)
           AS p_new_e6
  FROM expanded e JOIN tots t ON t.half = e.half
  GROUP BY e.bin
)
SELECT bin, p_base_e6, p_new_e6,
       CAST(floor((p_new_e6 - p_base_e6) / 1e6
                  * ln(CAST(p_new_e6 AS DOUBLE) / p_base_e6) * 1000000 + 0.5)
         AS BIGINT) AS psi_term_e6
FROM rates
ORDER BY bin
"""


@register("ml_population_stability_index", oracle=_PSI_ORACLE, tags=("ml", "eval"))
def ml_population_stability_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index — the model-risk-management standard
    for input drift (PSI > 0.25 = retrain): bin the BASELINE period
    into deciles by its own exact order-statistic edges, score the new
    period against those frozen edges, and sum (p_new - p_base) *
    ln(p_new / p_base) per bin. The edges are exact ranks from the
    baseline half (the same ceil-rank arithmetic as the conformal
    quantile); bin assignment counts edges strictly below each value
    — deterministic on ties; the log term is one identical double
    expression micro-quantized per bin. Complements
    corpus_js_divergence (symmetric, bounded) with the asymmetric
    baseline-anchored metric credit risk actually uses. Plan: one
    ranked pass over the baseline half for 9 edges (broadcast), one
    binned aggregate per half, a 10-row join."""
    halves = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
        F.when(F.col("o_orderdate") < F.lit("1998-01-01").cast("date"), 0)
        .otherwise(1)
        .alias("half"),
    )
    from pyspark.sql import Window

    base = halves.filter(F.col("half") == 0)
    ranked = base.select(
        "y",
        F.row_number().over(Window.orderBy("y")).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    ranks = spark.range(1, _PSI_BINS).select(F.col("id").alias("rk"))
    edges = ranked.join(
        F.broadcast(ranks),
        F.col("rn")
        == F.expr(f"(rk * n + {_PSI_BINS - 1}) div {_PSI_BINS}"),
    ).select(F.col("y").alias("edge"))
    binned = (
        halves.crossJoin(F.broadcast(edges.agg(F.collect_list("edge").alias("es"))))
        .select(
            "half",
            F.expr("CAST(size(filter(es, e -> y > e)) AS BIGINT)").alias("bin"),
        )
        .groupBy("half", "bin")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    n_half = binned.groupBy("half").agg(F.sum("cnt").alias("n_half"))
    rates = (
        binned.join(n_half, "half")
        .groupBy("bin")
        .agg(
            F.max(
                F.when(F.col("half") == 0, F.expr("cnt * 1000000 div n_half"))
            )
            .cast("long")
            .alias("p_base_e6"),
            F.max(
                F.when(F.col("half") == 1, F.expr("cnt * 1000000 div n_half"))
            )
            .cast("long")
            .alias("p_new_e6"),
        )
    )
    return rates.select(
        "bin",
        "p_base_e6",
        "p_new_e6",
        F.floor(
            (F.col("p_new_e6") - F.col("p_base_e6"))
            / 1e6
            * F.log(F.col("p_new_e6").cast("double") / F.col("p_base_e6"))
            * 1_000_000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("psi_term_e6"),
    ).orderBy("bin")
