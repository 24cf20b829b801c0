"""Round-11 LLM/multimodal additions, part 22: average-hash near-dup
bucketing over binary payloads and Luhn checksum compliance screening.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Average-hash (aHash) near-dup bucketing on payload bytes
# --------------------------------------------------------------------------

_AHASH_BLOCKS = 16
_AHASH_BLOCK_LEN = 16  # first 256 bytes, 16 blocks of 16
_AHASH_PAIR_LIMIT = 200

_AHASH_ORACLE = f"""
WITH padded AS (
  SELECT doc_id, substr(text || repeat(' ', {_AHASH_BLOCKS * _AHASH_BLOCK_LEN}),
                        1, {_AHASH_BLOCKS * _AHASH_BLOCK_LEN}) AS s
  FROM documents
),
bytes AS (
  SELECT p.doc_id, t.pos,
         (t.pos - 1) // {_AHASH_BLOCK_LEN} AS blk,
         ascii(substr(p.s, t.pos, 1)) AS code
  FROM padded p
  CROSS JOIN (SELECT unnest(generate_series(1, {_AHASH_BLOCKS * _AHASH_BLOCK_LEN})) AS pos) t
),
blocks AS (
  SELECT doc_id, blk, CAST(sum(code) AS BIGINT) AS bsum
  FROM bytes GROUP BY doc_id, blk
),
hashes AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN bsum * {_AHASH_BLOCKS} > total THEN power_of_two ELSE 0 END)
              AS BIGINT) AS ahash
  FROM (
    SELECT doc_id, blk, bsum,
           sum(bsum) OVER (PARTITION BY doc_id) AS total,
           CAST(2 AS BIGINT) ** blk AS power_of_two
    FROM blocks
  )
  GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.ahash
FROM hashes a JOIN hashes b ON a.ahash = b.ahash AND a.doc_id < b.doc_id
ORDER BY a.doc_id, b.doc_id
LIMIT {_AHASH_PAIR_LIMIT}
"""


@register("multimodal_ahash_neardup", oracle=_AHASH_ORACLE, tags=("llm", "multimodal", "dedup"))
def multimodal_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average-hash (aHash) near-dup bucketing on opaque payload
    bytes: pad/truncate each payload to 256 bytes, split into
    {_AHASH_BLOCKS} blocks, set bit b when block b's byte-sum exceeds
    the payload average — the byte-level analogue of the perceptual
    aHash used for image near-dup (shrink, threshold against the
    mean, compare 64-bit signatures), here on the utf-8 payload
    standing in for media bytes exactly as `multimodal_binary_meta`
    does. The threshold compare is pure integers (bsum * blocks >
    total), candidates are an equi-join on the signature — the same
    bucket-then-verify ladder as `dedup_simhash`, with the signature
    computed from BYTES, not tokens, so it works on any modality.
    Plan: one projection + bounded 256-position explode per doc,
    two groupBys, and a hash-key self-join that shuffles 8-byte
    signatures, never payloads."""
    docs = load_table(spark, sf_dir, "documents")
    total_len = _AHASH_BLOCKS * _AHASH_BLOCK_LEN
    padded = docs.select(
        "doc_id",
        F.substring(F.concat(F.col("text"), F.lit(" " * total_len)), 1, total_len).alias("s"),
    )
    positions = F.explode(F.sequence(F.lit(1), F.lit(total_len))).alias("pos")
    bytes_df = padded.select("doc_id", "s", positions).select(
        "doc_id",
        F.expr(f"(pos - 1) div {_AHASH_BLOCK_LEN}").alias("blk"),
        F.ascii(F.expr("substr(s, pos, 1)")).alias("code"),
    )
    blocks = bytes_df.groupBy("doc_id", "blk").agg(
        F.sum("code").cast("long").alias("bsum")
    )
    from pyspark.sql import Window

    w_doc = Window.partitionBy("doc_id")
    hashes = (
        blocks.withColumn("total", F.sum("bsum").over(w_doc))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("bsum") * _AHASH_BLOCKS > F.col("total"),
                    # shiftleft's python API wants a literal bit count;
                    # the column form goes through expr
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(blk AS INT))"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("ahash")
        )
    )
    a = hashes.select(F.col("doc_id").alias("doc_a"), F.col("ahash"))
    b = hashes.select(F.col("doc_id").alias("doc_b"), F.col("ahash").alias("bhash"))
    return (
        a.join(b, (F.col("ahash") == F.col("bhash")) & (F.col("doc_a") < F.col("doc_b")))
        .select("doc_a", "doc_b", "ahash")
        .orderBy("doc_a", "doc_b")
        .limit(_AHASH_PAIR_LIMIT)
    )


# --------------------------------------------------------------------------
# Luhn checksum validation (synthetic card-like identifiers)
# --------------------------------------------------------------------------

_LUHN_ORACLE = """
WITH cards AS (
  SELECT o_orderkey, o_orderpriority,
         lpad(CAST(o_orderkey AS VARCHAR), 16, '4') AS card
  FROM orders
),
digits AS (
  SELECT c.o_orderkey, c.o_orderpriority,
         ascii(substr(c.card, 17 - t.i, 1)) - 48 AS d,
         t.i
  FROM cards c
  CROSS JOIN (SELECT unnest(generate_series(1, 16)) AS i) t
),
checksums AS (
  SELECT o_orderkey, max(o_orderpriority) AS o_orderpriority,
         CAST(sum(CASE WHEN i % 2 = 0
                       THEN CASE WHEN 2 * d > 9 THEN 2 * d - 9 ELSE 2 * d END
                       ELSE d END) AS BIGINT) AS luhn_sum
  FROM digits GROUP BY o_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_ids,
       CAST(sum(CASE WHEN luhn_sum % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
       CAST(sum(CASE WHEN luhn_sum % 10 = 0 THEN 1 ELSE 0 END) * 1000 // count(*)
            AS BIGINT) AS valid_permille
FROM checksums
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("compliance_luhn_checksum", oracle=_LUHN_ORACLE, tags=("compliance", "text"))
def compliance_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn checksum validation: treat each order key as a synthetic
    16-digit card-like identifier and run the Luhn mod-10 algorithm
    (double every second digit from the right, subtract 9 on
    overflow, sum divisible by 10) — the verification step a PII
    scanner runs AFTER `pii_redact`'s regex match to separate real
    card numbers from random 16-digit strings (regex alone
    false-positives on order ids, phone+timestamp collisions, etc.;
    Luhn cuts those ~10x). Pure integer digit arithmetic over an
    exploded 16-position sequence; the per-priority validity rate is
    the kind of scan summary a compliance dashboard tracks. Plan:
    one scan, a bounded 16x explode, two map-side-combined
    groupBys — no joins, no Python."""
    orders = load_table(spark, sf_dir, "orders")
    cards = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.lpad(F.col("o_orderkey").cast("string"), 16, "4").alias("card"),
    )
    digits = cards.select(
        "o_orderkey",
        "o_orderpriority",
        F.explode(F.sequence(F.lit(1), F.lit(16))).alias("i"),
        "card",
    ).select(
        "o_orderkey",
        "o_orderpriority",
        "i",
        (F.ascii(F.expr("substr(card, 17 - i, 1)")) - 48).alias("d"),
    )
    checksums = digits.groupBy("o_orderkey").agg(
        F.max("o_orderpriority").alias("o_orderpriority"),
        F.sum(
            F.when(
                F.col("i") % 2 == 0,
                F.when(2 * F.col("d") > 9, 2 * F.col("d") - 9).otherwise(2 * F.col("d")),
            ).otherwise(F.col("d"))
        )
        .cast("long")
        .alias("luhn_sum"),
    )
    valid = F.when(F.col("luhn_sum") % 10 == 0, 1).otherwise(0)
    return (
        checksums.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ids"),
            F.sum(valid).cast("long").alias("n_valid"),
            F.expr(
                "CAST(sum(CASE WHEN luhn_sum % 10 = 0 THEN 1 ELSE 0 END) * 1000"
                " div count(*) AS BIGINT)"
            ).alias("valid_permille"),
        )
        .orderBy("o_orderpriority")
    )
