"""Round-56 analytics, part 55: interarrival burstiness / Fano
dispersion and cost-sensitive threshold selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Burstiness coefficient + Fano factor per event type
# --------------------------------------------------------------------------

_BURST_ORACLE = """
WITH ticks AS (
  SELECT event_type AS etype, epoch_us(ts) // 1000 AS t_ms, event_id
  FROM events
),
gaps AS (
  SELECT etype,
         t_ms - lag(t_ms) OVER (PARTITION BY etype ORDER BY t_ms, event_id) AS dt
  FROM ticks
  QUALIFY lag(t_ms) OVER (PARTITION BY etype ORDER BY t_ms, event_id) IS NOT NULL
),
gap_sums AS (
  SELECT etype, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(dt) AS HUGEINT) AS s, CAST(sum(dt * dt) AS HUGEINT) AS ss
  FROM gaps GROUP BY etype
),
hourly AS (
  SELECT event_type AS etype, epoch_us(ts) // 3600000000 AS hb,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
hour_sums AS (
  SELECT etype, CAST(count(*) AS HUGEINT) AS nh,
         CAST(sum(c) AS HUGEINT) AS sc, CAST(sum(c * c) AS HUGEINT) AS scc
  FROM hourly GROUP BY etype
)
SELECT g.etype, CAST(g.n AS BIGINT) AS n_gaps,
       CAST(g.s // g.n AS BIGINT) AS mean_gap_ms,
       CAST(floor(
         (sqrt((CAST(g.n AS DOUBLE) * CAST(g.ss AS DOUBLE)
                - CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)) / CAST(g.n AS DOUBLE)
               / CAST(g.n AS DOUBLE))
          - CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE))
         / (sqrt((CAST(g.n AS DOUBLE) * CAST(g.ss AS DOUBLE)
                  - CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)) / CAST(g.n AS DOUBLE)
                 / CAST(g.n AS DOUBLE))
            + CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE))
         * 1000000 + 0.5) AS BIGINT) AS burstiness_e6,
       CAST(floor(
         (CAST(h.nh AS DOUBLE) * CAST(h.scc AS DOUBLE)
          - CAST(h.sc AS DOUBLE) * CAST(h.sc AS DOUBLE))
         / (CAST(h.nh AS DOUBLE) * CAST(h.sc AS DOUBLE))
         * 10000 + 0.5) AS BIGINT) AS fano_e4
FROM gap_sums g JOIN hour_sums h ON h.etype = g.etype
ORDER BY g.etype
"""


@register("events_burstiness", oracle=_BURST_ORACLE, tags=("events", "stats"))
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interarrival burstiness per event type: the Goh-Barabási
    coefficient B = (sigma - mu)/(sigma + mu) of millisecond gaps
    (B -> -1 periodic, 0 Poisson, -> +1 bursty) plus the Fano factor
    (variance/mean) of hourly counts — together the standard pair for
    "is this stream Poisson or clumped", which decides watermark slack
    and autoscaling headroom for the streaming ingest path
    (`events_interarrival_fit` fits the exponential; these two
    MEASURE the deviation from it). Determinism: gaps are exact
    integer milliseconds off one tape-ordered lag window; all moments
    (n, S, SS) are exact HUGEINT/decimal sums, so sigma and mu are
    fixed double expressions; mean gap is an integer floor-divide.
    Fano's hourly counts are exact via an epoch-hour floor-divide
    bucket (observed buckets only — a silent-hour scaffold would need
    a calendar join; the synthetic tape has no silent hours). Plan:
    one per-type window + two map-side-combined aggregates, join at
    type grain (broadcast-sized)."""
    ev = load_table(spark, sf_dir, "events")
    t_ms = (F.unix_micros("ts") / F.lit(1000)).cast("long")
    w = Window.partitionBy("etype").orderBy("t_ms", "event_id")
    ticks = ev.select(
        F.col("event_type").alias("etype"), t_ms.alias("t_ms"), "event_id"
    )
    gaps = (
        ticks.select("etype", (F.col("t_ms") - F.lag("t_ms").over(w)).alias("dt"))
        .filter(F.col("dt").isNotNull())
    )
    dec = "decimal(38,0)"
    gap_sums = gaps.groupBy("etype").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("dt").cast(dec).alias("s"),
        F.sum(F.col("dt") * F.col("dt")).cast(dec).alias("ss"),
    )
    hb = F.floor(F.unix_micros("ts") / F.lit(3_600_000_000)).cast("long")
    hourly = ev.groupBy(F.col("event_type").alias("etype"), hb.alias("hb")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    hour_sums = hourly.groupBy("etype").agg(
        F.count(F.lit(1)).cast(dec).alias("nh"),
        F.sum("c").cast(dec).alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast(dec).alias("scc"),
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    ssd = F.col("ss").cast("double")
    sigma = F.sqrt((nd * ssd - sd * sd) / nd / nd)
    mu = sd / nd
    nhd = F.col("nh").cast("double")
    scd = F.col("sc").cast("double")
    sccd = F.col("scc").cast("double")
    fano = (nhd * sccd - scd * scd) / (nhd * scd)
    return (
        gap_sums.join(hour_sums, "etype")
        .select(
            "etype",
            F.col("n").cast("long").alias("n_gaps"),
            F.floor(F.col("s") / F.col("n")).cast("long").alias("mean_gap_ms"),
            F.floor((sigma - mu) / (sigma + mu) * 1_000_000 + F.lit(0.5))
            .cast("long")
            .alias("burstiness_e6"),
            F.floor(fano * 10_000 + F.lit(0.5)).cast("long").alias("fano_e4"),
        )
        .orderBy("etype")
    )


# --------------------------------------------------------------------------
# Cost-sensitive decision threshold (expected-cost sweep)
# --------------------------------------------------------------------------

_FN_COST = 5  # missing a positive costs 5x a false alarm

_STOPWORDS = ("the", "of", "and", "to", "in", "is", "that", "for")
_SW_LIST_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)

_COST_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
),
scored AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN w IN ({_SW_LIST_SQL}) THEN 1 ELSE 0 END) * 1000
              // count(*) AS BIGINT) AS score_milli,
         CASE WHEN max(lang) = 'en' THEN 1 ELSE 0 END AS y
  FROM tok GROUP BY doc_id
),
tot AS (
  SELECT CAST(sum(y) AS BIGINT) AS n_pos, CAST(sum(1 - y) AS BIGINT) AS n_neg
  FROM scored
),
per_t AS (  -- at threshold t: predict positive iff score >= t
  SELECT score_milli AS t,
         CAST(sum(y) AS BIGINT) AS pos_here, CAST(sum(1 - y) AS BIGINT) AS neg_here
  FROM scored GROUP BY score_milli
),
cum AS (
  SELECT t,
         CAST(sum(pos_here) OVER (ORDER BY t DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
         CAST(sum(neg_here) OVER (ORDER BY t DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp
  FROM per_t
),
costed AS (
  SELECT c.t, c.tp, c.fp,
         CAST(t2.n_pos - c.tp AS BIGINT) AS fn,
         CAST({_FN_COST} * (t2.n_pos - c.tp) + c.fp AS BIGINT) AS cost
  FROM cum c CROSS JOIN tot t2
),
best AS (
  SELECT min(t) AS bt FROM costed
  WHERE cost = (SELECT min(cost) FROM costed)
)
SELECT t AS threshold_milli, tp, fp, fn, cost,
       CASE WHEN t = (SELECT bt FROM best) THEN 1 ELSE 0 END AS is_best
FROM costed
ORDER BY t
"""


@register("ml_cost_threshold_sweep", oracle=_COST_ORACLE, tags=("ml",))
def ml_cost_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-sensitive decision-threshold sweep over the stopword-rate
    English classifier (the same deterministic scored set as
    `ml_auc_roc`): for every observed score threshold, predict
    positive iff score >= t, tally TP/FP/FN by a descending
    cumulative window (one pass — no per-threshold rescan), and
    price each operating point at cost = {_FN_COST}*FN + FP. The
    `is_best` flag marks the minimum-cost threshold (ties broken to
    the smallest t), which is what actually ships to production when
    classes are imbalanced and errors asymmetric — AUC says HOW WELL
    the scores rank; this says WHERE to cut. All counts exact
    integers; cost is exact. Plan: tokenize-aggregate to the scored
    set, a tiny per-threshold aggregate, one ordered window over
    ~1000 threshold rows, broadcast total."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w"))
    scored = tok.groupBy("doc_id").agg(
        F.expr(
            f"CAST(sum(CASE WHEN w IN ({_SW_LIST_SQL}) THEN 1 ELSE 0 END) * 1000"
            " div count(*) AS BIGINT)"
        ).alias("score_milli"),
        F.when(F.max("lang") == "en", 1).otherwise(0).alias("y"),
    )
    tot = scored.agg(
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("long").alias("n_neg"),
    )
    per_t = scored.groupBy(F.col("score_milli").alias("t")).agg(
        F.sum("y").cast("long").alias("pos_here"),
        F.sum(1 - F.col("y")).cast("long").alias("neg_here"),
    )
    w_cum = Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per_t.select(
        "t",
        F.sum("pos_here").over(w_cum).cast("long").alias("tp"),
        F.sum("neg_here").over(w_cum).cast("long").alias("fp"),
    )
    joined = cum.crossJoin(F.broadcast(tot))
    cost = F.lit(_FN_COST) * (F.col("n_pos") - F.col("tp")) + F.col("fp")
    costed = joined.select(
        F.col("t"),
        "tp",
        "fp",
        (F.col("n_pos") - F.col("tp")).cast("long").alias("fn"),
        cost.cast("long").alias("cost"),
    )
    min_cost = costed.agg(F.min("cost").alias("mc"))
    best = (
        costed.join(F.broadcast(min_cost), F.col("cost") == F.col("mc"))
        .agg(F.min("t").alias("bt"))
    )
    return (
        costed.crossJoin(F.broadcast(best))
        .select(
            F.col("t").alias("threshold_milli"),
            "tp",
            "fp",
            "fn",
            "cost",
            F.when(F.col("t") == F.col("bt"), 1).otherwise(0).alias("is_best"),
        )
        .orderBy("threshold_milli")
    )
