"""Round-48 relational, part 33: the count_if/every/any aggregate
battery and a sampled pairwise-cosine histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# count_if / every / any aggregate battery
# --------------------------------------------------------------------------

_CIF_ORACLE = """
SELECT o_orderpriority,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
       CASE WHEN bool_and(o_totalprice > 0) THEN 1 ELSE 0 END AS all_positive,
       CASE WHEN bool_or(CAST(round(o_totalprice * 100) AS BIGINT) > 20000000)
            THEN 1 ELSE 0 END AS any_whale,
       CASE WHEN bool_and(o_orderdate >= DATE '1995-01-01') THEN 1 ELSE 0 END
         AS all_in_range
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("agg_count_if_every_any", oracle=_CIF_ORACLE, tags=("agg", "sql"))
def agg_count_if_every_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The conditional/boolean aggregate battery Spark spells
    count_if / every / any — pinned against their portable lowerings
    (FILTER-counts and bool_and/bool_or): count_if(p) is the
    readable spelling of the FILTER clause, every(p) asserts an
    invariant over the whole group (the assertion-style data-quality
    primitive — `agg_bool` covers bool_and/bool_or on a different
    shape; this pins the ANSI-ish aliases and the count_if form),
    and any(p) is the existence probe. All lower to the same partial-
    aggregable machinery as any count, so the battery adds nothing to
    the shuffle. Booleans are surfaced as 0/1 ints for a type-stable
    cross-engine hash."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_cif")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished,
               CASE WHEN every(o_totalprice > 0) THEN 1 ELSE 0 END AS all_positive,
               CASE WHEN any(CAST(round(o_totalprice * 100) AS BIGINT) > 20000000)
                    THEN 1 ELSE 0 END AS any_whale,
               CASE WHEN every(o_orderdate >= DATE '1995-01-01') THEN 1 ELSE 0 END
                 AS all_in_range
        FROM orders_cif
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


# --------------------------------------------------------------------------
# Sampled pairwise-cosine histogram (embedding-space collapse screen)
# --------------------------------------------------------------------------

_PAIR_MOD = 17  # both endpoints hash-sampled: ~ (N/17)^2 pairs

_PAIRHIST_ORACLE = f"""
WITH sampled AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % {_PAIR_MOD} = 0
),
pairs AS (
  SELECT CAST(floor(list_cosine_similarity(
               list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
               list_transform(b.embedding, x -> CAST(x AS DOUBLE)))
             * 10 + 0.5) AS BIGINT) AS cos_decile
  FROM sampled a JOIN sampled b ON b.vec_id > a.vec_id
)
SELECT cos_decile, CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs
GROUP BY cos_decile
ORDER BY cos_decile
"""


@register("embedding_pairwise_cosine_histogram", oracle=_PAIRHIST_ORACLE, tags=("llm", "embedding"))
def embedding_pairwise_cosine_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled pairwise-cosine histogram — the embedding-space
    COLLAPSE screen: a healthy space puts random-pair cosines in a
    band near zero; mass piling up near 1.0 means representations
    have collapsed (anisotropy) and every cosine-based op downstream
    (dedup thresholds, ANN recall, SemDeDup cells) silently degrades.
    Both pair endpoints are hash-sampled (mod {_PAIR_MOD}), so the
    quadratic term is (N/{_PAIR_MOD})^2 — the standard subsample
    estimate of a pair statistic — and cosines bucket at 0.1 grain
    (the knn 1e-4 contract is overkill for a histogram; coarse
    buckets also absorb any last-ulp engine wiggle). Plan: one
    filtered scan, a sampled self-join whose both sides broadcast,
    one 20-row aggregate."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % _PAIR_MOD == 0
    )
    a = emb.select(F.col("vec_id").alias("ida"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("idb"), F.col("embedding").alias("eb"))
    dot = "aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)"
    na = "aggregate(transform(ea, x -> CAST(x AS DOUBLE) * x), 0D, (acc, v) -> acc + v)"
    nb = "aggregate(transform(eb, x -> CAST(x AS DOUBLE) * x), 0D, (acc, v) -> acc + v)"
    pairs = a.join(F.broadcast(b), F.col("idb") > F.col("ida")).select(
        F.floor(
            F.expr(f"({dot}) / (sqrt({na}) * sqrt({nb}))") * 10 + F.lit(0.5)
        )
        .cast("long")
        .alias("cos_decile")
    )
    return (
        pairs.groupBy("cos_decile")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .orderBy("cos_decile")
    )
