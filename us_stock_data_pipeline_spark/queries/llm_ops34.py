"""Round-107 LLM ops, part 34: canary-string contamination scan and
optimal two-forecast blend weight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Canary-string scan: planted-marker detection per source
# --------------------------------------------------------------------------

# fixture-vocabulary "canaries": in production these are planted GUIDs;
# here common corpus words stand in so the machinery exercises non-trivially
_CANARIES = ("spark shuffle", "join small", "value table")

_CANARY_ORACLE = f"""
WITH hits AS (
  SELECT source, doc_id,
         {" + ".join(f"CASE WHEN text LIKE '%{c}%' THEN 1 ELSE 0 END" for c in _CANARIES)}
           AS n_hit_kinds
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_hit_kinds > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_with_canary,
       CAST(sum(n_hit_kinds) AS BIGINT) AS canary_kind_hits,
       CAST(sum(CASE WHEN n_hit_kinds > 0 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS hit_rate_micro
FROM hits
GROUP BY source
ORDER BY source
"""


@register("corpus_canary_scan", oracle=_CANARY_ORACLE, tags=("llm", "compliance"))
def corpus_canary_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canary-string contamination scan: count documents per source
    containing any of a fixed set of planted marker strings — the
    standard memorization/leakage probe (plant GUID canaries in
    held-out sets; if a trained model regurgitates one, or a training
    shard SCANS positive, the isolation broke). Differs from
    `text_contamination_check` (n-gram overlap against a benchmark —
    fuzzy) and `text_lexicon_hit_rate` (scoring): canaries are exact
    substring markers, and the per-source HIT RATE is the isolation
    audit. Multi-pattern matching compiles to a chain of LIKE
    predicates — JVM substring search in the scan stage, map-side,
    no explode. One groupBy on source."""
    d = load_table(spark, sf_dir, "documents")
    n_hits = None
    for c in _CANARIES:
        term = F.when(F.col("text").contains(c), 1).otherwise(0)
        n_hits = term if n_hits is None else n_hits + term
    hits = d.select("source", n_hits.alias("n_hit_kinds"))
    return (
        hits.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("n_hit_kinds") > 0, 1).otherwise(0))
            .cast("long")
            .alias("docs_with_canary"),
            F.sum("n_hit_kinds").cast("long").alias("canary_kind_hits"),
            F.expr(
                "sum(CASE WHEN n_hit_kinds > 0 THEN 1 ELSE 0 END) * 1000000 div count(*)"
            )
            .cast("long")
            .alias("hit_rate_micro"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Optimal two-forecast blend weight (closed-form forecast combination)
# --------------------------------------------------------------------------

_BLEND_ORACLE = """
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
-- forecast 1: yesterday's own return (momentum); forecast 2: yesterday's
-- market mean (carried k-scaled, so EVERYTHING scales by k exactly)
rows_ AS (
  SELECT r.symbol,
         r.r * m.k AS y,
         lag(r.r * m.k) OVER (PARTITION BY r.symbol ORDER BY r.day) AS p1,
         lag(m.mr_k) OVER (PARTITION BY r.symbol ORDER BY r.day) AS p2
  FROM rets r JOIN mkt m ON m.day = r.day
  QUALIFY lag(r.r) OVER (PARTITION BY r.symbol ORDER BY r.day) IS NOT NULL
),
-- w* = cov(y - p2, p1 - p2) / var(p1 - p2), from exact power sums of
-- u = y - p2 and v = p1 - p2
uv AS (
  SELECT symbol, y - p2 AS u, p1 - p2 AS v FROM rows_
),
sums AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(u) AS BIGINT) AS su, CAST(sum(v) AS BIGINT) AS sv,
         CAST(sum(u * v) AS BIGINT) AS suv, CAST(sum(v * v) AS BIGINT) AS svv
  FROM uv GROUP BY symbol
)
SELECT symbol, n AS n_obs,
       CAST(floor((CAST(n AS DOUBLE) * suv - CAST(su AS DOUBLE) * sv)
                  / (CAST(n AS DOUBLE) * svv - CAST(sv AS DOUBLE) * sv)
                  * 1000000 + 0.5) AS BIGINT) AS blend_w_micro
FROM sums
ORDER BY symbol
"""


@register("ml_forecast_blend_weight", oracle=_BLEND_ORACLE, tags=("ml", "forecast"))
def ml_forecast_blend_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal two-forecast combination weight per symbol: blend
    yesterday's own return (momentum forecast) with yesterday's
    market mean (market forecast) as w p1 + (1-w) p2, solving w* =
    Cov(y - p2, p1 - p2) / Var(p1 - p2) in closed form — the
    Bates-Granger forecast-combination result that underlies every
    ensemble-weighting scheme (`ml_boosting_round` reweights by
    residuals iteratively; the 2-model case needs no iteration at
    all). Exactness: returns carry k-scaled so both forecasts are
    exact integers at the same scale; the four power sums of (u, v)
    are exact BIGINT; one pinned double ratio quantizes micro. w
    outside [0,1] is meaningful (negative = short the momentum
    forecast). Plan: returns once, one market aggregate, one lag
    window, one grouped reduce."""
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
    w_sym = Window.partitionBy("symbol").orderBy("day")
    rows_ = (
        rets.join(mkt, "day")
        .select(
            "symbol",
            "day",
            (F.col("r") * F.col("k")).alias("y"),
            F.lag(F.col("r") * F.col("k")).over(w_sym).alias("p1"),
            F.lag("mr_k").over(w_sym).alias("p2"),
        )
        .filter(F.col("p1").isNotNull())
    )
    uv = rows_.select(
        "symbol", (F.col("y") - F.col("p2")).alias("u"), (F.col("p1") - F.col("p2")).alias("v")
    )
    sums = uv.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("u").cast("long").alias("su"),
        F.sum("v").cast("long").alias("sv"),
        F.sum(F.col("u") * F.col("v")).cast("long").alias("suv"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("svv"),
    )
    nD = F.col("n").cast("double")
    wstar = (nD * F.col("suv") - F.col("su").cast("double") * F.col("sv")) / (
        nD * F.col("svv") - F.col("sv").cast("double") * F.col("sv")
    )
    return sums.select(
        "symbol",
        F.col("n").alias("n_obs"),
        F.floor(wstar * 1000000 + F.lit(0.5)).cast("long").alias("blend_w_micro"),
    ).orderBy("symbol")
