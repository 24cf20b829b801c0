"""Round-7 analytics additions, part 17: double-submission detection,
out-of-order arrival ratio, dedup savings projection, and embedding
shard planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Double-submission detection (same payer, same amount, short window)
# --------------------------------------------------------------------------

_DOUBLE_BAND_CENTS = 1000  # $10 amount band
_DOUBLE_WINDOW_US = 24 * 3_600_000_000  # 24 hours

_DOUBLE_ORACLE = f"""
WITH keyed AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) // {_DOUBLE_BAND_CENTS} AS band,
         epoch_us(ts) AS t, event_id
  FROM events
),
flagged AS (
  SELECT user_id, band, t,
         lag(t) OVER (PARTITION BY user_id, band ORDER BY t, event_id) AS prev_t
  FROM keyed
)
SELECT user_id, CAST(band AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_suspect,
       CAST(min(t - prev_t) // 1000000 AS BIGINT) AS min_gap_sec
FROM flagged
WHERE prev_t IS NOT NULL AND t - prev_t <= {_DOUBLE_WINDOW_US}
GROUP BY user_id, band
ORDER BY user_id, band
"""


@register("events_double_submission", oracle=_DOUBLE_ORACLE, tags=("analytics", "fraud"))
def events_double_submission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-submission detection: events from the SAME user in the
    SAME $10 amount band within 24 hours — the payments-integrity
    screen that catches retry storms and double-clicks before they
    become refunds (`dedup_fuzzy_transactions` searches near-amount
    pairs across payers; this is the per-payer fast path every
    settlement batch runs). The lag window partitions on the
    composite (user, amount band) key, so candidate comparison is
    strictly within plausible duplicate groups — no pair blowup —
    and the gap test is exact integer micros. One shuffle on the
    composite key serves the lag and the rollup."""
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        "user_id",
        F.expr(f"CAST(round(value * 100) AS BIGINT) div {_DOUBLE_BAND_CENTS}").alias(
            "band"
        ),
        F.unix_micros("ts").alias("t"),
        "event_id",
    )
    w = Window.partitionBy("user_id", "band").orderBy("t", "event_id")
    flagged = keyed.select(
        "user_id", "band", "t", F.lag("t").over(w).alias("prev_t")
    )
    return (
        flagged.filter(
            F.col("prev_t").isNotNull()
            & (F.col("t") - F.col("prev_t") <= _DOUBLE_WINDOW_US)
        )
        .groupBy("user_id", F.col("band").cast("long").alias("band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suspect"),
            F.expr("min(t - prev_t) div 1000000").cast("long").alias("min_gap_sec"),
        )
        .orderBy("user_id", "band")
    )


# --------------------------------------------------------------------------
# Out-of-order arrival ratio (event-time vs arrival-order)
# --------------------------------------------------------------------------

_OOO_ORACLE = """
WITH arr AS (
  SELECT event_type, event_id, epoch_us(ts) AS t_us,
         max(epoch_us(ts)) OVER (PARTITION BY event_type
           ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS high_water
  FROM events
),
scored AS (
  SELECT event_type,
         CASE WHEN high_water IS NOT NULL AND t_us < high_water THEN 1 ELSE 0 END
           AS late,
         CASE WHEN high_water IS NOT NULL AND t_us < high_water
              THEN high_water - t_us ELSE 0 END AS lateness_us
  FROM arr
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(late) AS BIGINT) AS n_late,
       floor(CAST(sum(late) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000
         AS late_ratio,
       CAST(max(lateness_us) // 1000000 AS BIGINT) AS max_lateness_sec
FROM scored
GROUP BY event_type
ORDER BY event_type
"""


@register("events_out_of_order_ratio", oracle=_OOO_ORACLE, tags=("streaming", "quality"))
def events_out_of_order_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order arrival ratio: treating event_id as arrival order,
    how often does an event's timestamp fall BEHIND the running
    event-time high-water mark, and by how much at worst — the
    measurement that SIZES a streaming watermark
    (`stream_watermarked_append` asserts a delay; this derives the
    delay the data actually needs, which is how the number gets
    picked in production). The high-water mark is a running max
    window over strictly preceding arrivals; lateness is exact
    integer micros; one shuffle on the source key serves window and
    rollup both."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arr = ev.select(
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        F.max(F.unix_micros("ts")).over(w).alias("high_water"),
    )
    late = F.when(
        F.col("high_water").isNotNull() & (F.col("t_us") < F.col("high_water")), 1
    ).otherwise(0)
    lateness = F.when(
        F.col("high_water").isNotNull() & (F.col("t_us") < F.col("high_water")),
        F.col("high_water") - F.col("t_us"),
    ).otherwise(0)
    return (
        arr.select("event_type", late.alias("late"), lateness.alias("lateness_us"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("late").cast("long").alias("n_late"),
            (
                F.floor(
                    F.sum("late").cast("double") / F.count(F.lit(1)) * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("late_ratio"),
            F.expr("max(lateness_us) div 1000000").cast("long").alias(
                "max_lateness_sec"
            ),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Dedup savings projection (what would survivor-pick dedup save?)
# --------------------------------------------------------------------------

_SAVINGS_ORACLE = """
WITH fp AS (
  SELECT doc_id, source, n_chars,
         lang || '|' || string_split(text, ' ')[1] || '|'
              || CAST(n_chars // 50 AS VARCHAR) AS fingerprint
  FROM documents
),
ranked AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY fingerprint
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM fp
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(sum(n_chars) AS BIGINT) AS chars_total,
       CAST(sum(CASE WHEN rn > 1 THEN n_chars ELSE 0 END) AS BIGINT)
         AS chars_saved,
       floor(CAST(sum(CASE WHEN rn > 1 THEN n_chars ELSE 0 END) AS DOUBLE)
             / sum(n_chars) * 10000 + 0.5) / 10000 AS savings_ratio
FROM ranked
GROUP BY source
ORDER BY source
"""


@register("corpus_dedup_savings", oracle=_SAVINGS_ORACLE, tags=("llm", "dedup", "planning"))
def corpus_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup savings projection: apply `dedup_survivor_pick`'s
    blocking-key + keep-the-longest policy WITHOUT materializing the
    deduped corpus, and report per source how many documents and
    characters the dedup would drop — the cost/benefit number that
    decides whether the full MinHash pass is worth scheduling for a
    source (pipeline planning consumes THIS; the dedup ops consume
    the decision). Same single fingerprint-partitioned rank window as
    the survivor pick; the savings rollup re-keys to source. Exact
    integer character accounting, one terminal ratio."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    fp = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.concat_ws(
            "|",
            "lang",
            F.element_at(toks, 1),
            F.expr("CAST(n_chars div 50 AS STRING)"),
        ).alias("fingerprint"),
    )
    ranked = fp.select(
        "source",
        "n_chars",
        F.row_number()
        .over(
            Window.partitionBy("fingerprint").orderBy(
                F.col("n_chars").desc(), "doc_id"
            )
        )
        .alias("rn"),
    )
    dropped = F.when(F.col("rn") > 1, 1).otherwise(0)
    saved = F.when(F.col("rn") > 1, F.col("n_chars")).otherwise(0)
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(dropped).cast("long").alias("n_dropped"),
            F.sum("n_chars").cast("long").alias("chars_total"),
            F.sum(saved).cast("long").alias("chars_saved"),
            (
                F.floor(
                    F.sum(saved).cast("double") / F.sum("n_chars") * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("savings_ratio"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Embedding index shard plan (bucket-striped balanced assignment)
# --------------------------------------------------------------------------

_SHARD_N = 8
_SHARD_BITS = 8  # reuse the bucket space of embedding_bucket_balance

_SHARD_ORACLE = f"""
WITH bits AS (
  SELECT vec_id, b.b AS b,
         CASE WHEN list_sum(list_transform(generate_series(1, 64),
                d -> CAST(round(CAST(embedding[d] AS DOUBLE) * 10000) AS BIGINT)
                     * (CASE WHEN ((b.b * 1000003 + d * 7919) * 2654435761)
                               % 2097152 // 1048576 = 0
                             THEN 1 ELSE -1 END))) >= 0
              THEN CAST(power(2, b.b) AS BIGINT) ELSE 0 END AS bit
  FROM embeddings, (SELECT unnest(generate_series(0, {_SHARD_BITS - 1})) AS b) b
),
buckets AS (
  SELECT vec_id, CAST(sum(bit) AS BIGINT) AS bucket FROM bits GROUP BY vec_id
),
sizes AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS sz FROM buckets GROUP BY bucket
),
striped AS (
  SELECT bucket, sz,
         (row_number() OVER (ORDER BY sz DESC, bucket) - 1) % {_SHARD_N} AS shard
  FROM sizes
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(sz) AS BIGINT) AS n_vecs
FROM striped
GROUP BY shard
ORDER BY shard
"""


@register("embedding_shard_plan", oracle=_SHARD_ORACLE, tags=("llm", "embedding", "planning"))
def embedding_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding index shard plan: assign LSH buckets to {_SHARD_N}
    index shards by STRIPING the size-sorted bucket list (largest
    buckets deal out round-robin) — the load-balancing pass between
    `embedding_bucket_balance` (which MEASURES imbalance) and serving
    (where shard skew is query-latency skew). Striping is the
    rank-arithmetic approximation of greedy LPT that needs no
    sequential state: one row_number over the BUCKET table (256 rows
    max, however large the corpus) and a modulo. Bucket hashing is
    the same exact-integer hyperplane scheme; the plan's shard loads
    come out within one max-bucket of each other."""
    emb = load_table(spark, sf_dir, "embeddings")
    bits = emb.select(
        "vec_id",
        "embedding",
        F.explode(F.sequence(F.lit(0), F.lit(_SHARD_BITS - 1))).alias("b"),
    )
    dot = F.expr(
        "aggregate(sequence(1, 64), 0L, (acc, d) -> acc"
        " + CAST(round(CAST(embedding[d - 1] AS DOUBLE) * 10000) AS LONG)"
        " * (CASE WHEN ((b * 1000003 + d * 7919) * 2654435761)"
        " % 2097152 div 1048576 = 0 THEN 1 ELSE -1 END))"
    )
    per_bit = bits.select(
        "vec_id",
        F.when(dot >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)"))
        .otherwise(F.lit(0).cast("long"))
        .alias("bit"),
    )
    buckets = per_bit.groupBy("vec_id").agg(F.sum("bit").cast("long").alias("bucket"))
    sizes = buckets.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    striped = sizes.select(
        "bucket",
        "sz",
        (
            (
                F.row_number().over(Window.orderBy(F.col("sz").desc(), "bucket")) - 1
            )
            % _SHARD_N
        ).alias("shard"),
    )
    return (
        striped.groupBy(F.col("shard").cast("long").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum("sz").cast("long").alias("n_vecs"),
        )
        .orderBy("shard")
    )
