"""Round-108 LLM ops, part 35: dedup-ladder waterfall and the paired
sign test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Dedup ladder waterfall: exact -> normalized -> length+first-word block
# --------------------------------------------------------------------------

_LADDER_ORACLE = """
WITH base AS (
  SELECT doc_id, text,
         md5(text) AS k_exact,
         md5(lower(trim(text))) AS k_norm,
         md5(CAST(n_chars // 20 AS VARCHAR) || '|' || split_part(text, ' ', 1)
             || '|' || split_part(text, ' ', 2)) AS k_block
  FROM documents
),
-- rung 1: exact duplicates (keep min doc_id per key)
r1_kept AS (
  SELECT doc_id, k_norm, k_block,
         row_number() OVER (PARTITION BY k_exact ORDER BY doc_id) AS rn
  FROM base
),
s1 AS (SELECT doc_id, k_norm, k_block FROM r1_kept WHERE rn = 1),
-- rung 2: normalized duplicates among rung-1 survivors
r2_kept AS (
  SELECT doc_id, k_block,
         row_number() OVER (PARTITION BY k_norm ORDER BY doc_id) AS rn
  FROM s1
),
s2 AS (SELECT doc_id, k_block FROM r2_kept WHERE rn = 1),
-- rung 3: coarse blocking-key collapse among rung-2 survivors
r3_kept AS (
  SELECT doc_id, row_number() OVER (PARTITION BY k_block ORDER BY doc_id) AS rn
  FROM s2
),
s3 AS (SELECT doc_id FROM r3_kept WHERE rn = 1),
counts AS (
  SELECT (SELECT count(*) FROM base) AS n0,
         (SELECT count(*) FROM s1) AS n1,
         (SELECT count(*) FROM s2) AS n2,
         (SELECT count(*) FROM s3) AS n3
)
SELECT '1_exact' AS rung, CAST(n0 - n1 AS BIGINT) AS docs_removed,
       CAST(n1 AS BIGINT) AS docs_remaining,
       CAST((n0 - n1) * 1000000 // n0 AS BIGINT) AS removal_rate_micro
FROM counts
UNION ALL
SELECT '2_normalized', CAST(n1 - n2 AS BIGINT), CAST(n2 AS BIGINT),
       CAST((n1 - n2) * 1000000 // n1 AS BIGINT) FROM counts
UNION ALL
SELECT '3_blocked', CAST(n2 - n3 AS BIGINT), CAST(n3 AS BIGINT),
       CAST((n2 - n3) * 1000000 // n2 AS BIGINT) FROM counts
ORDER BY rung
"""


@register("dedup_ladder_waterfall", oracle=_LADDER_ORACLE, tags=("dedup", "llm", "pipeline"))
def dedup_ladder_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-ladder waterfall: run the three standard rungs in
    sequence — exact hash, normalized (casefold+trim) hash, then a
    coarse blocking-key collapse — each over the PREVIOUS rung's
    survivors, and report how many documents each rung removes. This
    is the pipeline-level view the per-rung operators (`dedup_exact`,
    `dedup_normalized_exact`, `dedup_survivor_pick`) can't give:
    production curation always runs the cheap rung first, and the
    waterfall quantifies each rung's MARGINAL yield so you know
    whether the expensive rungs still pay (the
    `pipeline_curation_yield` shape, specialized to the dedup
    ladder). Survivor policy pinned to min doc_id per key at every
    rung. Plan: three sequential ranking windows, each on a hash key
    — three shuffles over a monotonically shrinking table, never a
    pairwise join."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.md5("text").alias("k_exact"),
        F.md5(F.lower(F.trim("text"))).alias("k_norm"),
        F.md5(
            F.concat_ws(
                "|",
                F.expr("CAST(n_chars div 20 AS STRING)"),
                F.split_part(F.col("text"), F.lit(" "), F.lit(1)),
                F.split_part(F.col("text"), F.lit(" "), F.lit(2)),
            )
        ).alias("k_block"),
    )

    def survivors(df: DataFrame, key: str) -> DataFrame:
        w = Window.partitionBy(key).orderBy("doc_id")
        return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")

    s1 = survivors(base, "k_exact").select("doc_id", "k_norm", "k_block")
    s2 = survivors(s1, "k_norm").select("doc_id", "k_block")
    s3 = survivors(s2, "k_block").select("doc_id")
    # all four counts stay IN the plan (single-row aggregates, cross-
    # joined) — no driver-side .count() actions
    c0 = base.agg(F.count(F.lit(1)).cast("long").alias("n0"))
    c1 = s1.agg(F.count(F.lit(1)).cast("long").alias("n1"))
    c2 = s2.agg(F.count(F.lit(1)).cast("long").alias("n2"))
    c3 = s3.agg(F.count(F.lit(1)).cast("long").alias("n3"))
    counts = (
        c0.crossJoin(F.broadcast(c1)).crossJoin(F.broadcast(c2)).crossJoin(F.broadcast(c3))
    )
    rung = F.explode(
        F.array(
            F.struct(
                F.lit("1_exact").alias("rung"),
                (F.col("n0") - F.col("n1")).alias("removed"),
                F.col("n1").alias("remaining"),
                F.col("n0").alias("prev"),
            ),
            F.struct(
                F.lit("2_normalized").alias("rung"),
                (F.col("n1") - F.col("n2")).alias("removed"),
                F.col("n2").alias("remaining"),
                F.col("n1").alias("prev"),
            ),
            F.struct(
                F.lit("3_blocked").alias("rung"),
                (F.col("n2") - F.col("n3")).alias("removed"),
                F.col("n3").alias("remaining"),
                F.col("n2").alias("prev"),
            ),
        )
    )
    return (
        counts.select(rung.alias("r"))
        .select(
            F.col("r.rung").alias("rung"),
            F.col("r.removed").cast("long").alias("docs_removed"),
            F.col("r.remaining").cast("long").alias("docs_remaining"),
            F.expr("r.removed * 1000000 div r.prev").cast("long").alias("removal_rate_micro"),
        )
        .orderBy("rung")
    )


# --------------------------------------------------------------------------
# Sign test: symbol vs market (paired, direction-only)
# --------------------------------------------------------------------------

_SIGN_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol, day,
         CAST(floor((c - lag(c) OVER w) * 10000.0 / lag(c) OVER w + 0.5)
           AS BIGINT) AS r
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(c) OVER w IS NOT NULL
),
mkt AS (
  SELECT day, CAST(sum(r) AS BIGINT) AS mr_k, CAST(count(*) AS BIGINT) AS k
  FROM rets GROUP BY day
),
signs AS (
  SELECT r.symbol,
         CASE WHEN r.r * m.k > m.mr_k THEN 1
              WHEN r.r * m.k < m.mr_k THEN -1 ELSE 0 END AS sgn
  FROM rets r JOIN mkt m ON m.day = r.day
)
SELECT symbol,
       CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_wins,
       CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_losses,
       CAST(sum(CASE WHEN sgn = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ties,
       -- continuity-corrected z = (|W - n/2| - 1/2) / sqrt(n/4) signed by
       -- the direction, over non-tied days
       CAST(floor(
         CASE WHEN sum(abs(sgn)) = 0 THEN 0.0
              ELSE (abs(CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                        - CAST(sum(abs(sgn)) AS DOUBLE) / 2) - 0.5)
                   / sqrt(CAST(sum(abs(sgn)) AS DOUBLE) / 4)
                   * CASE WHEN 2 * sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
                               >= sum(abs(sgn)) THEN 1 ELSE -1 END
         END * 1000 + 0.5) AS BIGINT) AS sign_z_milli
FROM signs
GROUP BY symbol
ORDER BY symbol
"""


@register("stats_sign_test", oracle=_SIGN_ORACLE, tags=("stats", "stock"))
def stats_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign test per symbol vs the equal-weight market: count
    the days the symbol beat the market, drop ties, and test the win
    count against Binomial(n, 1/2) with the continuity-corrected
    normal z — the MOST assumption-free paired test (the Wilcoxon
    signed-rank in `stats_wilcoxon_signed_rank` also assumes symmetric
    differences; the sign test only needs direction, so one crazy
    outlier day changes nothing at all). Exactness: the comparison
    cross-scales by the symbol count (r*k vs sum r) so wins/losses/
    ties are exact integer classifications; the z assembles once in
    pinned DOUBLE. Plan: returns once, a per-day market aggregate,
    one grouped conditional count."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w = Window.partitionBy("symbol").orderBy("day")
    prev = F.lag("c").over(w)
    rets = (
        closes.select("symbol", "day", prev.alias("p"), "c")
        .filter(F.col("p").isNotNull())
        .select(
            "symbol",
            "day",
            F.floor((F.col("c") - F.col("p")) * 10000.0 / F.col("p") + F.lit(0.5))
            .cast("long")
            .alias("r"),
        )
    )
    mkt = rets.groupBy("day").agg(
        F.sum("r").cast("long").alias("mr_k"), F.count(F.lit(1)).cast("long").alias("k")
    )
    signs = rets.join(mkt, "day").select(
        "symbol",
        F.when(F.col("r") * F.col("k") > F.col("mr_k"), 1)
        .when(F.col("r") * F.col("k") < F.col("mr_k"), -1)
        .otherwise(0)
        .alias("sgn"),
    )
    wins = F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0)).cast("long")
    losses = F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0)).cast("long")
    ties = F.sum(F.when(F.col("sgn") == 0, 1).otherwise(0)).cast("long")
    nt = F.sum(F.abs("sgn")).cast("long")
    z = F.when(nt == 0, F.lit(0.0)).otherwise(
        (F.abs(wins.cast("double") - nt.cast("double") / 2) - 0.5)
        / F.sqrt(nt.cast("double") / 4)
        * F.when(2 * wins >= nt, 1).otherwise(-1)
    )
    return (
        signs.groupBy("symbol")
        .agg(
            wins.alias("n_wins"),
            losses.alias("n_losses"),
            ties.alias("n_ties"),
            F.floor(z * 1000 + F.lit(0.5)).cast("long").alias("sign_z_milli"),
        )
        .orderBy("symbol")
    )
