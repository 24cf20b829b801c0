"""Round-102 analytics, part 94: volatility cones across horizons and
a ranking-policy semantics pin (rank / dense_rank / row_number).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Volatility cones: rolling realized vol percentiles per horizon
# --------------------------------------------------------------------------

_CONE_HORIZONS = (5, 10, 20)

_CONE_ORACLE = f"""
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol, day, row_number() OVER w AS rn,
         CAST(floor((c - lag(c) OVER w) * 10000.0 / lag(c) OVER w + 0.5)
           AS BIGINT) AS r
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(c) OVER w IS NOT NULL
),
-- per-horizon rolling realized variance from exact power sums; vol
-- quantizes to integer qbp per window BEFORE the percentile ranking
vols AS (
  {" UNION ALL ".join(f'''
  SELECT symbol, {h} AS horizon,
         CAST(floor(sqrt((CAST(sum(r * r) OVER f{h} AS DOUBLE)
                          - CAST(sum(r) OVER f{h} AS DOUBLE)
                            * sum(r) OVER f{h} / {h}) / {h}) + 0.5)
           AS BIGINT) AS vol_qbp,
         rn
  FROM rets
  WINDOW f{h} AS (PARTITION BY symbol ORDER BY day
                  ROWS BETWEEN {h - 1} PRECEDING AND CURRENT ROW)
  QUALIFY rn >= {h + 1}''' for h in _CONE_HORIZONS)}
),
ranked AS (
  SELECT symbol, horizon, vol_qbp,
         row_number() OVER (PARTITION BY symbol, horizon
                            ORDER BY vol_qbp, rn) AS vr,
         count(*) OVER (PARTITION BY symbol, horizon) AS n
  FROM vols
)
SELECT symbol, CAST(horizon AS BIGINT) AS horizon, CAST(max(n) AS BIGINT) AS n_windows,
       CAST(max(CASE WHEN vr = (n + 9) // 10 THEN vol_qbp END) AS BIGINT) AS p10_qbp,
       CAST(max(CASE WHEN vr = (n + 1) // 2 THEN vol_qbp END) AS BIGINT) AS p50_qbp,
       CAST(max(CASE WHEN vr = (9 * n + 9) // 10 THEN vol_qbp END) AS BIGINT) AS p90_qbp,
       CAST(min(vol_qbp) AS BIGINT) AS min_qbp, CAST(max(vol_qbp) AS BIGINT) AS max_qbp
FROM ranked
GROUP BY symbol, horizon
ORDER BY symbol, horizon
"""


@register("bars_volatility_cones", oracle=_CONE_ORACLE, tags=("stock", "risk", "window"))
def bars_volatility_cones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volatility cones: for each horizon (5/10/20 days), the
    distribution of ROLLING realized vol — min, p10, median, p90, max
    per symbol — the trader's chart for judging whether today's vol is
    cheap or rich relative to its own history at that horizon (a
    single-window vol like `bars_volatility` has no reference
    distribution; the cone IS the reference). Each window's population
    vol comes from exact rolling power sums and quantizes to integer
    qbp BEFORE the percentile ranking, so the percentile picks (exact
    type-1 order statistics with a deterministic rn tie-break) are
    pure integer selections. Plan: one (symbol, day) sort carries all
    three horizon frames; the percentile stage ranks the tiny
    windows-per-symbol support, never the tape."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w = Window.partitionBy("symbol").orderBy("day")
    prev = F.lag("c").over(w)
    rets = (
        closes.select("symbol", "day", F.row_number().over(w).alias("rn"), prev.alias("p"), "c")
        .filter(F.col("p").isNotNull())
        .select(
            "symbol",
            "day",
            "rn",
            F.floor((F.col("c") - F.col("p")) * 10000.0 / F.col("p") + F.lit(0.5))
            .cast("long")
            .alias("r"),
        )
    )
    parts = []
    for h in _CONE_HORIZONS:
        f = Window.partitionBy("symbol").orderBy("day").rowsBetween(-(h - 1), 0)
        vol = F.floor(
            F.sqrt(
                (
                    F.sum(F.col("r") * F.col("r")).over(f).cast("double")
                    - F.sum("r").over(f).cast("double") * F.sum("r").over(f) / h
                )
                / h
            )
            + F.lit(0.5)
        ).cast("long")
        parts.append(
            rets.select(
                "symbol", F.lit(h).alias("horizon"), vol.alias("vol_qbp"), "rn"
            ).filter(F.col("rn") >= h + 1 - 1)  # rn counts closes; first return rn=2
        )
    # NOTE: rets rn starts at 2 (the first close is dropped); a horizon-h
    # window is full when rn >= h + 1
    vols = parts[0]
    for p in parts[1:]:
        vols = vols.unionAll(p)
    vols = vols.filter(F.col("rn") >= F.col("horizon") + 1)
    w_rank = Window.partitionBy("symbol", "horizon").orderBy("vol_qbp", "rn")
    w_n = Window.partitionBy("symbol", "horizon")
    ranked = vols.select(
        "symbol",
        "horizon",
        "vol_qbp",
        F.row_number().over(w_rank).alias("vr"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    pick = lambda r: F.max(F.when(F.col("vr") == r, F.col("vol_qbp")))  # noqa: E731
    return (
        ranked.groupBy("symbol", "horizon")
        .agg(
            F.max("n").cast("long").alias("n_windows"),
            pick(F.expr("(n + 9) div 10")).cast("long").alias("p10_qbp"),
            pick(F.expr("(n + 1) div 2")).cast("long").alias("p50_qbp"),
            pick(F.expr("(9 * n + 9) div 10")).cast("long").alias("p90_qbp"),
            F.min("vol_qbp").cast("long").alias("min_qbp"),
            F.max("vol_qbp").cast("long").alias("max_qbp"),
        )
        .select(
            "symbol",
            F.col("horizon").cast("long").alias("horizon"),
            "n_windows",
            "p10_qbp",
            "p50_qbp",
            "p90_qbp",
            "min_qbp",
            "max_qbp",
        )
        .orderBy("symbol", "horizon")
    )


# --------------------------------------------------------------------------
# Ranking-policy pin: rank vs dense_rank vs row_number on ties
# --------------------------------------------------------------------------

_RANKPIN_ORACLE = """
WITH scored AS (
  SELECT c_mktsegment AS segment, c_custkey,
         CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS score_band
  FROM customer
),
ranked AS (
  SELECT segment, c_custkey, score_band,
         rank() OVER w AS rnk,
         dense_rank() OVER w AS drnk,
         row_number() OVER (PARTITION BY segment
                            ORDER BY score_band DESC, c_custkey) AS rn
  FROM scored
  WINDOW w AS (PARTITION BY segment ORDER BY score_band DESC)
)
SELECT segment,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(max(rnk) AS BIGINT) AS max_rank,
       CAST(max(drnk) AS BIGINT) AS max_dense_rank,
       CAST(max(rn) AS BIGINT) AS max_row_number,
       CAST(sum(CASE WHEN rnk <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS top10_by_rank,
       CAST(sum(CASE WHEN drnk <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS top10_by_dense,
       CAST(sum(CASE WHEN rn <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS top10_by_rownum
FROM ranked
GROUP BY segment
ORDER BY segment
"""


@register("window_rank_policy_pin", oracle=_RANKPIN_ORACLE, tags=("window", "semantics"))
def window_rank_policy_pin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-policy semantics pin: the SAME banded leaderboard
    ranked three ways — rank() (gaps after ties), dense_rank() (no
    gaps), row_number() (arbitrary-but-pinned tie order) — and what
    'top 10' means under each. The trio diverges exactly when ties
    exist (score bands force them), and the divergence is the classic
    leaderboard bug: top-10-by-rank can return 40 rows, by-dense-rank
    hundreds, by-row-number exactly 10 (`window_rank_topn` uses one
    policy; this pins all three against each other so the contract is
    executable). Invariants checked by the counts: max_row_number =
    n_rows always; max_dense_rank = distinct bands; max_rank <=
    n_rows with equality iff no ties. One shuffle, three windows on
    the same sort."""
    c = load_table(spark, sf_dir, "customer")
    scored = c.select(
        F.col("c_mktsegment").alias("segment"),
        "c_custkey",
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT) div 100000").alias("score_band"),
    )
    w = Window.partitionBy("segment").orderBy(F.col("score_band").desc())
    w_rn = Window.partitionBy("segment").orderBy(F.col("score_band").desc(), "c_custkey")
    ranked = scored.select(
        "segment",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w_rn).alias("rn"),
    )
    return (
        ranked.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.max("rnk").cast("long").alias("max_rank"),
            F.max("drnk").cast("long").alias("max_dense_rank"),
            F.max("rn").cast("long").alias("max_row_number"),
            F.sum(F.when(F.col("rnk") <= 10, 1).otherwise(0)).cast("long").alias("top10_by_rank"),
            F.sum(F.when(F.col("drnk") <= 10, 1).otherwise(0)).cast("long").alias("top10_by_dense"),
            F.sum(F.when(F.col("rn") <= 10, 1).otherwise(0)).cast("long").alias("top10_by_rownum"),
        )
        .orderBy("segment")
    )
