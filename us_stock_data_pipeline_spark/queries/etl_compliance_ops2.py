"""Round-22 compliance, part 2: k-anonymity audit and differentially-
private counts with seeded Laplace noise — the privacy-side operators a
data platform runs before releasing aggregates or granting analysts
access to quasi-identifiable rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers
# --------------------------------------------------------------------------

_K_LADDER = (2, 5, 10)

_KANON_ORACLE = f"""
WITH classes AS (
  SELECT c_nationkey AS nation, c_mktsegment AS seg,
         CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS bal_kb,
         CAST(count(*) AS BIGINT) AS cnt
  FROM customer
  GROUP BY 1, 2, 3
),
ladder AS (SELECT unnest(ARRAY{list(_K_LADDER)}) AS k)
SELECT l.k,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(count(*) FILTER (WHERE c.cnt < l.k) AS BIGINT) AS n_violating_classes,
       CAST(coalesce(sum(c.cnt) FILTER (WHERE c.cnt < l.k), 0) AS BIGINT)
         AS n_rows_at_risk,
       CAST(sum(c.cnt) AS BIGINT) AS n_rows_total
FROM classes c CROSS JOIN ladder l
GROUP BY l.k
ORDER BY l.k
"""


@register("privacy_k_anonymity", oracle=_KANON_ORACLE, tags=("etl", "compliance"))
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: group rows by their quasi-identifier tuple
    (nation, segment, $1000 balance bucket — the columns an attacker
    could cross-reference) and count equivalence classes smaller than
    k; every row in such a class is re-identifiable at confidence
    1/class-size. Reported across the k ladder {_K_LADDER} so the
    release board sees the suppression cost of each threshold — the
    audit every k-anonymization (generalize / suppress) loop starts
    from, and the structural complement of `pii_redact` (which
    handles direct identifiers; this handles combinations).
    Plan: ONE groupBy at QI grain, then a ladder cross-join over the
    tiny class table — the 100 TB cost is the one aggregate, and the
    QI class table is orders of magnitude smaller than the input."""
    classes = (
        load_table(spark, sf_dir, "customer")
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("seg"),
            F.expr("CAST(round(c_acctbal * 100) AS BIGINT) div 100000").alias("bal_kb"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    ladder = F.array(*[F.lit(k) for k in _K_LADDER])
    return (
        classes.crossJoin(F.broadcast(classes.sparkSession.range(1).select(
            F.explode(ladder).alias("k"))))
        .groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_classes"),
            F.count(F.when(F.col("cnt") < F.col("k"), 1))
            .cast("long")
            .alias("n_violating_classes"),
            F.coalesce(F.sum(F.when(F.col("cnt") < F.col("k"), F.col("cnt"))), F.lit(0))
            .cast("long")
            .alias("n_rows_at_risk"),
            F.sum("cnt").cast("long").alias("n_rows_total"),
        )
        .orderBy("k")
    )


# --------------------------------------------------------------------------
# Differentially-private counts (seeded Laplace mechanism)
# --------------------------------------------------------------------------

_DP_EPS = 1.0
_U_BITS = 48  # md5-prefix uniform resolution

_DP_ORACLE = f"""
WITH counts AS (
  SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS true_count
  FROM customer GROUP BY 1
),
noised AS (
  SELECT seg, true_count,
         (CAST(('0x' || substring(md5(seg), 1, 12)) AS BIGINT) + 0.5)
           / {2 ** _U_BITS} AS u
  FROM counts
)
SELECT seg, true_count,
       CAST(floor((CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
                  * ln(1.0 - 2.0 * abs(u - 0.5)) / {_DP_EPS}
                  * 1000000 + 0.5) AS BIGINT) AS noise_e6,
       true_count * 1000000
         + CAST(floor((CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
                      * ln(1.0 - 2.0 * abs(u - 0.5)) / {_DP_EPS}
                      * 1000000 + 0.5) AS BIGINT) AS dp_count_e6
FROM noised
ORDER BY seg
"""


@register("privacy_dp_counts", oracle=_DP_ORACLE, tags=("etl", "compliance"))
def privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release counts via the Laplace mechanism
    (sensitivity 1, epsilon {_DP_EPS}): noise = -sign(U-1/2) *
    ln(1 - 2|U-1/2|) / eps is the exact inverse-CDF draw, with U a
    SEEDED md5-prefix uniform per group — deterministic noise is what
    makes the release REPRODUCIBLE (re-running the pipeline cannot
    leak a fresh noise sample, the classic averaging attack) and what
    lets the oracle verify it bit-for-bit. true_count is emitted here
    for auditability of the mechanism; a production release drops it
    and logs the epsilon spend to the privacy-budget ledger.
    Plan: one aggregate, noise is a scalar expression per group row —
    the mechanism costs nothing beyond the count itself at any
    scale."""
    counts = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count("*").cast("long").alias("true_count"))
    )
    u = (
        F.conv(F.substring(F.md5("seg"), 1, 12), 16, 10).cast("long") + F.lit(0.5)
    ) / F.lit(float(2 ** _U_BITS))
    noise = F.floor(
        F.when(u < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.log(F.lit(1.0) - 2.0 * F.abs(u - 0.5))
        / _DP_EPS
        * 1_000_000
        + F.lit(0.5)
    ).cast("long")
    return counts.select(
        "seg",
        "true_count",
        noise.alias("noise_e6"),
        (F.col("true_count") * 1_000_000 + noise).alias("dp_count_e6"),
    ).orderBy("seg")
