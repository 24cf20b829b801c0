"""Round-7 relational additions, part 18: token-budget runway
forecasting, exact-duplicate embedding detection, bag-semantics set
operations, and GROUPING()-labeled rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Corpus token-budget runway forecast
# --------------------------------------------------------------------------

_RUNWAY_STEP_TOKENS = 100_000  # tokens consumed per training step (all sources)

_RUNWAY_ORACLE = f"""
WITH tok AS (
  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
meta AS (SELECT CAST(count(*) AS BIGINT) AS n_sources FROM tok),
runway AS (
  SELECT t.source, t.n_tokens,
         t.n_tokens // ({_RUNWAY_STEP_TOKENS} // m.n_sources) AS steps_runway
  FROM tok t, meta m
)
SELECT source, n_tokens, CAST(steps_runway AS BIGINT) AS steps_runway,
       (steps_runway = (SELECT min(steps_runway) FROM runway)) AS exhausts_first
FROM runway
ORDER BY source
"""


@register("corpus_token_budget_forecast", oracle=_RUNWAY_ORACLE, tags=("llm", "planning"))
def corpus_token_budget_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-runway forecast: given each source's token inventory and a
    uniform target mixture drawing {_RUNWAY_STEP_TOKENS} tokens per
    step, how many steps until each source exhausts (starts repeating
    epochs) and which runs dry first — the planning number behind
    every mixture decision (`corpus_mixture_sample` enforces the
    weights; this predicts when they become unsustainable). Token
    counts are one explode-free size(split) sum per source; runway is
    integer floor division; the bottleneck flag compares against a
    broadcast min. Map-side everywhere, source-cardinality output."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens")
    )
    meta = tok.agg(F.count(F.lit(1)).cast("long").alias("n_sources"))
    runway = tok.crossJoin(F.broadcast(meta)).select(
        "source",
        "n_tokens",
        F.expr(f"n_tokens div ({_RUNWAY_STEP_TOKENS} div n_sources)")
        .cast("long")
        .alias("steps_runway"),
    )
    min_rw = runway.agg(F.min("steps_runway").alias("m"))
    return (
        runway.crossJoin(F.broadcast(min_rw))
        .select(
            "source",
            "n_tokens",
            "steps_runway",
            (F.col("steps_runway") == F.col("m")).alias("exhausts_first"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Exact-duplicate embedding detection (content hash of quantized vector)
# --------------------------------------------------------------------------

_VECDUP_ORACLE = """
WITH keyed AS (
  SELECT vec_id,
         sha256(array_to_string(list_transform(embedding,
           v -> CAST(CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT) AS VARCHAR)),
           ',')) AS vec_hash
  FROM embeddings
),
groups AS (
  SELECT vec_hash, CAST(count(*) AS BIGINT) AS sz FROM keyed GROUP BY vec_hash
)
SELECT CAST(sum(sz) AS BIGINT) AS n_vecs,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
       CAST(sum(CASE WHEN sz > 1 THEN sz - 1 ELSE 0 END) AS BIGINT) AS n_redundant,
       CAST(max(sz) AS BIGINT) AS max_group
FROM groups
"""


@register("embedding_exact_duplicates", oracle=_VECDUP_ORACLE, tags=("llm", "embedding", "dedup"))
def embedding_exact_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate embedding detection: hash each vector's
    QUANTIZED components (4-decimal fixed point, so float noise below
    representation precision can't split a group) and count identical
    vectors — duplicated embeddings are the classic symptom of an
    upstream join fan-out or a stuck encoder, and at 100 TB this
    1-row audit is the cheap pre-check that decides whether
    `dedup_embedding_cosine`'s near-dup pass is even needed. The hash
    is computed map-side JVM (transform + concat + sha2); one groupBy
    on the 64-hex key, one global rollup. The redundant-row count is
    exactly the rows a dedup would delete."""
    emb = load_table(spark, sf_dir, "embeddings")
    keyed = emb.select(
        "vec_id",
        F.sha2(
            F.concat_ws(
                ",",
                F.transform(
                    "embedding",
                    lambda v: F.round(v.cast("double") * 10000)
                    .cast("long")
                    .cast("string"),
                ),
            ),
            256,
        ).alias("vec_hash"),
    )
    groups = keyed.groupBy("vec_hash").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    return groups.agg(
        F.sum("sz").cast("long").alias("n_vecs"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.when(F.col("sz") > 1, 1).otherwise(0)).cast("long").alias(
            "n_dup_groups"
        ),
        F.sum(F.when(F.col("sz") > 1, F.col("sz") - 1).otherwise(0))
        .cast("long")
        .alias("n_redundant"),
        F.max("sz").cast("long").alias("max_group"),
    )


# --------------------------------------------------------------------------
# Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL)
# --------------------------------------------------------------------------

_BAG_ORACLE = """
SELECT 'except_all' AS op, CAST(count(*) AS BIGINT) AS n_rows FROM (
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
  EXCEPT ALL
  SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F'
)
UNION ALL
SELECT 'intersect_all', CAST(count(*) AS BIGINT) FROM (
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
  INTERSECT ALL
  SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F'
)
UNION ALL
SELECT 'union_all', CAST(count(*) AS BIGINT) FROM (
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
  UNION ALL
  SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F'
)
ORDER BY op
"""


@register("set_ops_bag_semantics", oracle=_BAG_ORACLE, tags=("relational", "setops"))
def set_ops_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations: INTERSECT ALL keeps
    min(multiplicity) copies and EXCEPT ALL subtracts multiplicities —
    the duplicate-respecting variants (`set_intersect`/`set_except`
    cover DISTINCT semantics) that reconciliation jobs need when "how
    many TIMES does this key appear on each side" is the question.
    Spark's intersectAll/exceptAll compile to a count-comparing
    aggregate, not a dedup + join, so multiplicity handling stays in
    one shuffle; the three counts are emitted as one 3-row union of
    1-row aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    b = li.filter(F.col("l_linestatus") == "F").select("l_partkey")

    def counted(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n_rows")).select(
            F.lit(label).alias("op"), "n_rows"
        )

    return (
        counted(a.exceptAll(b), "except_all")
        .unionByName(counted(a.intersectAll(b), "intersect_all"))
        .unionByName(counted(a.unionAll(b), "union_all"))
        .orderBy("op")
    )


# --------------------------------------------------------------------------
# GROUPING()-labeled rollup
# --------------------------------------------------------------------------

_GID_ORACLE = """
SELECT CASE WHEN GROUPING(n.n_name) = 1 THEN 'ALL_NATIONS' ELSE n.n_name END
         AS nation,
       CASE WHEN GROUPING(o.o_orderpriority) = 1 THEN 'ALL_PRIORITIES'
            ELSE o.o_orderpriority END AS priority,
       CAST(GROUPING(n.n_name) * 2 + GROUPING(o.o_orderpriority) AS BIGINT)
         AS grouping_id,
       CASE GROUPING(n.n_name) * 2 + GROUPING(o.o_orderpriority)
         WHEN 0 THEN 'detail' WHEN 1 THEN 'nation_subtotal'
         ELSE 'grand_total' END AS scope,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY ROLLUP (n.n_name, o.o_orderpriority)
ORDER BY grouping_id, nation, priority
"""


@register("agg_grouping_id_labels", oracle=_GID_ORACLE, tags=("relational", "agg"))
def agg_grouping_id_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING()-derived labels: subtotal rows carry
    explicit 'ALL_NATIONS'/'ALL_PRIORITIES' placeholders and a scope
    tag instead of ambiguous NULLs — the report-ready form
    (`agg_rollup` emits the raw NULL-keyed lattice; a real nation
    named NULL would be indistinguishable there, which is exactly
    what GROUPING() exists to disambiguate). The grouping-id is
    rebuilt from the two GROUPING() bits explicitly so both engines
    agree on bit order. One rollup aggregate over the
    broadcast-joined dims; rollup adds lattice rows, not passes."""
    od = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    joined = od.join(F.broadcast(cust), od.o_custkey == cust.c_custkey).join(
        F.broadcast(nat), cust.c_nationkey == nat.n_nationkey
    )
    gid = (F.grouping("n_name") * 2 + F.grouping("o_orderpriority")).cast("long")
    return (
        joined.rollup("n_name", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
            gid.alias("grouping_id"),
        )
        .select(
            F.when(F.col("grouping_id").bitwiseAND(2) > 0, "ALL_NATIONS")
            .otherwise(F.col("n_name"))
            .alias("nation"),
            F.when(F.col("grouping_id").bitwiseAND(1) > 0, "ALL_PRIORITIES")
            .otherwise(F.col("o_orderpriority"))
            .alias("priority"),
            "grouping_id",
            F.when(F.col("grouping_id") == 0, "detail")
            .when(F.col("grouping_id") == 1, "nation_subtotal")
            .otherwise("grand_total")
            .alias("scope"),
            "n_orders",
            "cents",
        )
        .orderBy("grouping_id", "nation", "priority")
    )
