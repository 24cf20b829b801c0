"""Round-8 operators, part 3: versioned-table schema evolution,
soft-dedup downweighting, runtime bloom-filter join pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# ETL: schema evolution on the versioned table (add-column merge)
# --------------------------------------------------------------------------

_SCHEMA_EVO_ORACLE = """
WITH final AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 3 = 0 THEN round(round(value, 4) * 2, 4)
              ELSE round(value, 4) END AS px,
         CASE WHEN event_id % 3 = 0 THEN 'V' || CAST(user_id % 4 AS VARCHAR)
              ELSE NULL END AS venue
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(venue) AS BIGINT) AS n_with_venue,
       CAST(count(DISTINCT venue) AS BIGINT) AS n_venues,
       round(sum(px), 2) AS sum_px
FROM final
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "etl_versioned_schema_evolution",
    oracle=_SCHEMA_EVO_ORACLE,
    tags=("etl", "sink", "merge"),
)
def etl_versioned_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADD-COLUMN schema evolution on the versioned table: the first
    commit has no `venue` column; a second merge restates every 3rd
    event WITH a new venue column. Old version dirs never get
    rewritten — the reader (and the merge's own partition rewrite)
    unions by name with missing columns as NULL, which is exactly
    Delta/Iceberg add-column semantics: metadata-only evolution, zero
    data movement for history. At 100 TB adding a column to a table
    this way costs one manifest commit, not an exabyte rewrite. The
    oracle recomputes the final state closed-form from the raw fixture
    (venue = 'V'||user_id%4 on restated rows, NULL elsewhere)."""
    import tempfile as _tf

    from us_stock_data_pipeline_spark.etl.versioned import (
        read_versioned,
        versioned_merge_upsert,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", F.round("value", 4).alias("px")
    )
    root = _tf.mkdtemp(prefix="us_sdps_versioned_evo_")
    versioned_merge_upsert(
        spark,
        ev.select("event_id", "event_type", "px"),
        root,
        key_cols=("event_id",),
        partition_cols=("event_type",),
    )
    evolved = ev.filter(F.col("event_id") % 3 == 0).select(
        "event_id",
        "event_type",
        F.round(F.col("px") * 2, 4).alias("px"),
        F.concat(F.lit("V"), (F.col("user_id") % 4).cast("string")).alias("venue"),
    )
    versioned_merge_upsert(
        spark, evolved, root, key_cols=("event_id",), partition_cols=("event_type",)
    )
    head = read_versioned(spark, root)
    return (
        head.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count("venue").cast("long").alias("n_with_venue"),
            F.countDistinct("venue").cast("long").alias("n_venues"),
            F.round(F.sum("px"), 2).alias("sum_px"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# corpus: soft dedup (downweight duplicates instead of dropping)
# --------------------------------------------------------------------------

_SOFT_DEDUP_ORACLE = """
WITH h AS (
  SELECT doc_id, source, md5(text) AS fp FROM documents
),
cl AS (
  SELECT fp, CAST(count(*) AS BIGINT) AS csize FROM h GROUP BY fp
),
weighted AS (
  SELECT h.doc_id, h.source, cl.csize,
         1000000 // cl.csize AS w_e6
  FROM h JOIN cl ON h.fp = cl.fp
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT CASE WHEN csize > 1 THEN doc_id END) AS BIGINT)
         AS n_in_dup_clusters,
       CAST(sum(w_e6) AS BIGINT) AS sum_weight_e6,
       CAST(max(csize) AS BIGINT) AS max_cluster
FROM weighted
GROUP BY source
ORDER BY source
"""


@register("corpus_soft_dedup_weights", oracle=_SOFT_DEDUP_ORACLE, tags=("llm", "dedup", "corpus"), bench=True)
def corpus_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT deduplication (RefinedWeb / Dolma-style): instead of
    dropping duplicates (`dedup_exact`), DOWNWEIGHT them — every doc in
    an exact-hash cluster of size k gets sampling weight 1/k, so the
    cluster contributes one document's worth of probability mass to the
    training mixture while keeping all surface variants available. The
    per-source sum of weights is then the source's DEDUPLICATED size —
    the number the mixture sampler should budget against, computed
    without deleting anything. Weights are exact integer ratios
    (1e6 // k). Plan: one md5 projection, one groupBy on fingerprint
    for cluster sizes, one shuffle-join back on fingerprint (both sides
    hash-partitioned on fp — no broadcast of a corpus-sized side), one
    rollup per source; every step linear and map-side combinable."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5("text").alias("fp")
    )
    cl = docs.groupBy("fp").agg(F.count(F.lit(1)).cast("long").alias("csize"))
    weighted = docs.join(cl, "fp").select(
        "doc_id",
        "source",
        "csize",
        F.expr("1000000 div csize").alias("w_e6"),
    )
    return (
        weighted.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct(
                F.when(F.col("csize") > 1, F.col("doc_id"))
            )
            .cast("long")
            .alias("n_in_dup_clusters"),
            F.sum("w_e6").cast("long").alias("sum_weight_e6"),
            F.max("csize").cast("long").alias("max_cluster"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# join: runtime bloom-filter pruned fact scan
# --------------------------------------------------------------------------

_BLOOM_ORACLE = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
  AND o.o_orderdate >= TIMESTAMP '2000-01-01'
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@register("join_runtime_bloom_filter", oracle=_BLOOM_ORACLE, tags=("join", "scale", "aqe"))
def join_runtime_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime BLOOM-FILTER join pruning (Spark 3.3+'s
    `spark.sql.optimizer.runtime.bloomFilter.enabled`, on by default in
    4.x): a selective dimension-side predicate (urgent orders in the
    final fixture years) lets Catalyst inject a bloom filter built from the filtered
    orders keys INTO the lineitem scan, so the fact side drops
    non-qualifying rows before the join exchange — at 100 TB this is
    the difference between shuffling the whole fact table and shuffling
    the ~single-digit-% that can possibly match (the row-level
    complement of `join_dynamic_partition_pruning`, which prunes whole
    partitions). The query itself is a plain declarative join+agg —
    the injection is the OPTIMIZER's job, asserted in
    tests/test_round8_ops_plans.py; correctness is identical with the
    filter on or off, which is exactly what makes it safe to rely on.
    Revenue is summed in exact integer cents."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# scalar: VARIANT semi-structured type (Spark 4)
# --------------------------------------------------------------------------

_VARIANT_ORACLE = """
WITH v AS (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(k) AS BIGINT) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k
FROM v
GROUP BY event_type
ORDER BY event_type
"""


@register("scalar_variant_json", oracle=_VARIANT_ORACLE, tags=("scalar", "json", "spark4"))
def scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's VARIANT type — the engine-native semi-structured
    column (SPARK-45891, same idea as Snowflake VARIANT / Databricks'
    shredded JSON): `parse_json` converts the props payload ONCE into a
    binary-encoded variant, then `try_variant_get` extracts typed paths
    without re-parsing text per access — versus `get_json_object`,
    which re-tokenizes the string for every path (the more paths a
    query touches, the wider the gap; at 100 TB of event payloads,
    parse-once-access-many is the difference between one and N string
    scans per row). Extraction failures yield NULL (try_ semantics),
    mirroring the oracle's CAST(json_extract(...)). Plan: one
    projection, one groupBy — the variant machinery is entirely
    expression-level, fully codegen'd."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.selectExpr(
        "event_type",
        "try_variant_get(parse_json(props), '$.k', 'bigint') AS k",
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count("k").cast("long").alias("n_with_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
        .orderBy("event_type")
    )
