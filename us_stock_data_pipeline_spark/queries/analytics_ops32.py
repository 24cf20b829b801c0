"""Round-21 analytics, part 32: corporate-action split adjustment —
the backward price-adjustment every charting and backtest stack applies
before comparing prices across a split boundary.

The reference pipeline ingests raw Polygon bars and never adjusts them
(its bars are split-adjusted upstream by the vendor); this operator is
the in-house version a platform needs the moment it stores raw prices:
multiply every close BEFORE a split by the product of the split ratios
that come after it, exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# Deterministic synthetic corporate-action table, derivable by both
# engines from the symbol universe itself (the fixture ships no splits
# table): even-length symbols split 2:1 on 2024-02-15, and every
# symbol splits 3:2 on 2024-04-01 — both dates inside the fixture's
# Jan-May window at every scale factor.
_SPLIT_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
splits AS (
  SELECT symbol, DATE '2024-02-15' AS split_date, 2 AS num, 1 AS den
  FROM (SELECT DISTINCT event_type AS symbol FROM events)
  WHERE length(symbol) % 2 = 0
  UNION ALL
  SELECT symbol, DATE '2024-04-01' AS split_date, 3 AS num, 2 AS den
  FROM (SELECT DISTINCT event_type AS symbol FROM events)
),
factored AS (
  SELECT c.symbol, c.day, c.close_cents,
         CAST(coalesce(count(*) FILTER (WHERE s.num = 2 AND s.den = 1), 0)
           AS BIGINT) AS n_two_for_one,
         CAST(coalesce(count(*) FILTER (WHERE s.num = 3 AND s.den = 2), 0)
           AS BIGINT) AS n_three_for_two
  FROM closes c
  LEFT JOIN splits s ON s.symbol = c.symbol AND s.split_date > c.day
  GROUP BY c.symbol, c.day, c.close_cents
)
SELECT symbol, day, close_cents,
       n_two_for_one + n_three_for_two AS n_splits_after,
       CAST(close_cents * 1000 * CAST(pow(2, n_three_for_two) AS BIGINT)
            // (CAST(pow(2, n_two_for_one) AS BIGINT)
                * CAST(pow(3, n_three_for_two) AS BIGINT))
         AS BIGINT) AS adj_close_milli
FROM factored
ORDER BY symbol, day
"""


@register("etl_split_adjustment", oracle=_SPLIT_ORACLE, tags=("stock", "etl"))
def etl_split_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward split adjustment: a close BEFORE a k:m split is divided
    by the cumulative ratio of every split AFTER it (so a pre-split
    $100 close under a later 2:1 reads as $50, continuous with the
    post-split tape). Exactness trick: with ratio types enumerable
    (2:1 and 3:2 here), the cumulative factor is 2^a * 3^b / 2^b for
    per-day counts (a, b) of each later-split type — the adjusted
    price is one BIGINT expression, no floating cumulative product
    and no per-row recursion (pow of small counts is exact in a
    double, cast back to BIGINT; a general ratio set would carry
    num/den products the same way). The action table derives
    deterministically from the symbol universe since the fixture has
    none. Plan: daily rollup, one broadcast range join against the
    O(symbols x actions) split table, one count aggregate — the
    fact table never moves twice, which is what makes backward
    adjustment re-runnable nightly over a 100 TB bar store."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents")
    )
    symbols = ev.select(F.col("event_type").alias("symbol")).distinct()
    splits = symbols.filter(F.length("symbol") % 2 == 0).select(
        "symbol",
        F.lit("2024-02-15").cast("date").alias("split_date"),
        F.lit(2).alias("num"),
        F.lit(1).alias("den"),
    ).unionAll(
        symbols.select(
            "symbol",
            F.lit("2024-04-01").cast("date").alias("split_date"),
            F.lit(3).alias("num"),
            F.lit(2).alias("den"),
        )
    )
    factored = (
        closes.join(
            F.broadcast(splits),
            (closes.symbol == splits.symbol) & (splits.split_date > closes.day),
            "left",
        )
        .groupBy(closes.symbol.alias("symbol"), "day", "close_cents")
        .agg(
            F.coalesce(
                F.count(F.when((F.col("num") == 2) & (F.col("den") == 1), 1)), F.lit(0)
            )
            .cast("long")
            .alias("n_two_for_one"),
            F.coalesce(
                F.count(F.when((F.col("num") == 3) & (F.col("den") == 2), 1)), F.lit(0)
            )
            .cast("long")
            .alias("n_three_for_two"),
        )
    )
    return factored.select(
        "symbol",
        "day",
        "close_cents",
        (F.col("n_two_for_one") + F.col("n_three_for_two")).alias("n_splits_after"),
        F.expr(
            "CAST(close_cents * 1000 * CAST(pow(2, n_three_for_two) AS BIGINT)"
            " div (CAST(pow(2, n_two_for_one) AS BIGINT)"
            "      * CAST(pow(3, n_three_for_two) AS BIGINT)) AS BIGINT)"
        ).alias("adj_close_milli"),
    ).orderBy("symbol", "day")
