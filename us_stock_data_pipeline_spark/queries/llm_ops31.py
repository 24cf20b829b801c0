"""Round-45 LLM ops, part 31: normalized-exact dedup and the last-digit
uniformity audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Normalized-exact dedup (the rung between exact and MinHash)
# --------------------------------------------------------------------------

_NORM_ORACLE = """
WITH normed AS (
  SELECT doc_id, source,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS norm_hash
  FROM documents
),
groups AS (
  SELECT norm_hash,
         CAST(count(*) AS BIGINT) AS n_copies,
         CAST(min(doc_id) AS BIGINT) AS survivor_id
  FROM normed GROUP BY norm_hash
)
SELECT n.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n.doc_id = g.survivor_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_survivors,
       CAST(sum(CASE WHEN g.n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_in_dup_groups
FROM normed n JOIN groups g ON g.norm_hash = n.norm_hash
GROUP BY n.source
ORDER BY n.source
"""


@register("dedup_normalized_exact", oracle=_NORM_ORACLE, tags=("llm", "dedup"))
def dedup_normalized_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-exact dedup — the rung of the crawl-dedup ladder
    between byte-exact hashing and MinHash: casefold, collapse
    whitespace runs, trim, THEN hash, so trivially-reformatted copies
    (the most common near-dup class in web data by far) collapse
    without paying the shingle pipeline. Survivors elect by min
    doc_id (the dedup_survivor_pick convention); per-source counts
    report both the survivor yield and how many docs sat in any
    duplicate group. Normalization is regexp_replace + lower + trim —
    identical semantics in both engines — and everything downstream
    is a hash groupBy. At 100 TB the shuffle carries 16-byte hashes,
    never text, exactly like dedup_exact one rung below."""
    normed = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(
            F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
        ).alias("norm_hash"),
    )
    w = Window.partitionBy("norm_hash")
    flagged = normed.select(
        "doc_id",
        "source",
        F.min("doc_id").over(w).alias("survivor_id"),
        F.count(F.lit(1)).over(w).alias("n_copies"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("doc_id") == F.col("survivor_id"), 1).otherwise(0))
            .cast("long")
            .alias("n_survivors"),
            F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_in_dup_groups"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Last-digit uniformity audit (fraud screen, Benford's complement)
# --------------------------------------------------------------------------

_LAST_DIGIT_ORACLE = """
WITH digits AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) % 10 AS digit
  FROM orders
),
counts AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY digit
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM counts)
SELECT c.digit, c.n,
       -- chi-square contribution (observed - expected)^2/expected with
       -- expected = total/10, in exact rational form scaled by 1e6:
       -- (10*n - total)^2 * 1e6 / (10 * total * 10)
       CAST((10 * c.n - t.total) * (10 * c.n - t.total) * 1000
            // (100 * t.total) AS BIGINT) AS chisq_term_e3
FROM counts c CROSS JOIN tot t
ORDER BY c.digit
"""


@register("audit_last_digit_uniformity", oracle=_LAST_DIGIT_ORACLE, tags=("stats", "compliance"))
def audit_last_digit_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-digit uniformity — Benford's forensic complement: FIRST
    digits of natural amounts follow Benford's law
    (`agg_benford_digits`), but LAST digits should be uniform; a
    spike at 0/5 means rounding or fabrication. The chi-square
    contribution per digit is kept as an exact integer rational —
    (10n - N)^2 / (100N) scaled by 1e3 with BIGINT floor division (1e6
    would overflow on a degenerate distribution at 10x this panel), no
    doubles anywhere — so the audit is hash-exact by construction
    (sum the terms and compare to the chi-square(9) critical value
    downstream). One digit extraction, one 10-row aggregate."""
    digits = load_table(spark, sf_dir, "orders").select(
        (F.round(F.col("o_totalprice") * 100).cast("long") % 10).alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count("*").cast("long").alias("n"))
    tot = counts.agg(F.sum("n").cast("long").alias("total"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("digit").cast("long").alias("digit"),
            "n",
            F.expr(
                "CAST((10 * n - total) * (10 * n - total) * 1000"
                " div (100 * total) AS BIGINT)"
            ).alias("chisq_term_e3"),
        )
        .orderBy("digit")
    )
