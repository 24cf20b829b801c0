"""Round-5 final additions: as-of join with tolerance, and first-seen
n-gram novelty scoring.

House contract: Spark-first plans, identically-aliased DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# As-of join with tolerance
# --------------------------------------------------------------------------


@register(
    "join_asof_tolerance",
    oracle="""
SELECT
  p.event_id,
  p.user_id,
  p.ts,
  (SELECT max(c.ts) FROM events c
    WHERE c.user_id = p.user_id AND c.event_type = 'click'
      AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
  ) AS last_click_1h
FROM events p
WHERE p.event_type = 'purchase'
ORDER BY p.event_id
""",
    tags=("join", "asof"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH TOLERANCE (pandas merge_asof's `tolerance=`):
    the latest click at most 1 hour before each purchase, else NULL —
    a stale quote must not match a trade from last week. Same
    union + conditional-running-max single window as `join_asof`; the
    tolerance is applied as a post-window nullifier (match older than
    the horizon -> NULL) rather than a frame bound, because a RANGE
    frame would need the running max INSIDE the frame — the nullifier
    keeps the one-pass, one-shuffle shape and the exact `<=` boundary
    semantics of the untolerated twin. Completes the as-of family:
    backward, forward, tolerance."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(0).alias("side"), F.lit(None).cast("long").alias("event_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "last_click_ts", F.max(F.when(F.col("side") == 0, F.col("ts"))).over(w)
    )
    within = F.col("last_click_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    return (
        merged.filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(within, F.col("last_click_ts")).alias("last_click_1h"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# First-seen n-gram novelty
# --------------------------------------------------------------------------

_NOVELTY_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tg AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(ws, i.g, i.g + 2), ' ') AS g
  FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS g) i
),
firsts AS (SELECT g, min(doc_id) AS first_doc FROM tg GROUP BY g)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(*) FILTER (WHERE f.first_doc = t.doc_id) AS BIGINT)
         AS n_novel,
       round(count(*) FILTER (WHERE f.first_doc = t.doc_id) * 1.0
             / count(*), 4) AS novelty
FROM tg t JOIN firsts f ON f.g = t.g
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


@register("text_ngram_novelty", oracle=_NOVELTY_ORACLE, tags=("llm", "dedup", "text"))
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-seen n-gram novelty: for each document (in doc_id = arrival
    order), the fraction of its trigrams whose FIRST corpus occurrence
    is this document — the marginal-contribution metric an incremental
    crawl uses to decide whether a new batch adds information or
    re-treads the corpus (novelty ~0 = skip ingestion; complements
    pairwise containment, which can't see transitive repetition across
    many earlier docs). Shape: distinct (doc, gram) stream, a
    min(doc_id)-per-gram aggregate (Heaps'-law sized), and an
    inverted-index equi-join back on the gram key — the exact
    candidate-generation join the dedup family standardizes on; no
    pairwise comparisons anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    trigrams = F.when(
        F.size(ws) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - 2),
                lambda i: F.concat_ws(" ", F.slice(ws, i, F.lit(3))),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    tg = docs.select("doc_id", F.explode(trigrams).alias("g"))
    # first_doc as a window-min over the gram partition instead of a
    # min-aggregate + equi-join back: ONE pass over the exploded gram
    # stream (the unpersisted join shape re-ran the explode for each
    # side) and no join — measured 3.5s -> 1.9s at sf0.1 (guide §2.4).
    return (
        tg.withColumn("first_doc", F.min("doc_id").over(W.partitionBy("g")))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1)).alias(
                "n_novel"
            ),
            F.round(
                F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1)) * 1.0
                / F.count(F.lit(1)),
                4,
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )
