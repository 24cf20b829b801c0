"""Relational surface, part 5: skew-mitigating salted join and null-safe
join — the two join variants docs/SCALE.md §2 prescribes but the earlier
batches only described.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

_SALT_K = 8

_SALTED_ORACLE = """
WITH user_stats AS (
  SELECT user_id, count(*) AS n_events_user, floor(avg(value) * 100 + 0.5) / 100 AS avg_value_user
  FROM events GROUP BY user_id
)
SELECT
  e.event_id,
  e.user_id,
  u.n_events_user,
  u.avg_value_user
FROM events e
JOIN user_stats u ON e.user_id = u.user_id
WHERE e.event_type = 'purchase'
ORDER BY e.event_id
"""


@register("join_salted_skew", oracle=_SALTED_ORACLE, tags=("join", "skew"))
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join — the hand-rolled skew mitigation: the big (probe) side
    gets a deterministic salt in [0, k); the small (build) side is
    exploded k ways; the join key becomes (user_id, salt). A pathological
    hot key that would land one reducer with 30% of the data now spreads
    across k reducers, at the cost of k-replicating the build side —
    which is why the build side here is a pre-aggregated stats table, not
    a fact. Results are provably identical to the plain join (the oracle
    IS the plain join). At 100 TB this is the fallback when AQE's
    skew-split can't help (e.g. a skewed BUILD side, or stateful
    streaming joins where AQE doesn't apply); salt only the keys known
    hot — blanket salting doubles shuffle volume for nothing."""
    ev = load_table(spark, sf_dir, "events")
    user_stats = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events_user"),
        # floor(x*100+0.5)/100, not round(x, 2): means of the 2dp fixture
        # values are exact decimals that land ON round boundaries, where
        # Spark (HALF_UP on the decimal repr) and DuckDB (binary-value)
        # disagree. The floor formulation computes bit-identically in
        # double arithmetic on both engines (values are positive).
        (F.floor(F.avg("value") * 100 + 0.5) / 100).alias("avg_value_user"),
    )
    big = ev.filter(F.col("event_type") == "purchase").withColumn(
        "salt", F.pmod(F.col("event_id"), F.lit(_SALT_K)).cast("int")
    )
    small = user_stats.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT_K - 1)).cast("array<int>"))
    )
    return (
        big.join(small, ["user_id", "salt"])
        .select("event_id", "user_id", "n_events_user", "avg_value_user")
        .orderBy("event_id")
    )


_NULL_SAFE_ORACLE = """
WITH e AS (
  SELECT event_id, nullif(user_id % 5, 0) AS bucket, value FROM events
  WHERE event_type = 'signup'
),
d AS (
  SELECT nullif(b, 0) AS bucket, concat('tier-', b) AS tier
  FROM (SELECT unnest(range(0, 5)) AS b)
)
SELECT
  e.event_id,
  e.bucket,
  d.tier,
  round(e.value, 4) AS value
FROM e JOIN d ON e.bucket IS NOT DISTINCT FROM d.bucket
ORDER BY e.event_id
"""


@register("join_null_safe", oracle=_NULL_SAFE_ORACLE, tags=("join", "null"))
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys match
    NULL keys — the semantics dimension-lookup pipelines need when
    "unknown" is itself a dimension member (here: bucket 0 nulled into an
    'unknown' tier). A plain `=` silently drops every NULL-keyed row;
    eqNullSafe keeps them AND still hash-partitions (NULLs co-locate on
    one key — if nulls are the skew, fold them to a sentinel first, or
    see join_salted_skew)."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type") == "signup").select(
        "event_id",
        F.nullif(F.col("user_id") % 5, F.lit(0)).alias("bucket"),
        "value",
    )
    d = (
        spark.range(0, 5)
        .select(
            F.nullif(F.col("id"), F.lit(0)).alias("bucket"),
            F.concat(F.lit("tier-"), F.col("id")).alias("tier"),
        )
    )
    return (
        e.join(F.broadcast(d), e.bucket.eqNullSafe(d.bucket))
        .select("event_id", e.bucket.alias("bucket"), "tier", F.round("value", 4).alias("value"))
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# String aggregation
# --------------------------------------------------------------------------


@register(
    "agg_string_concat",
    oracle="""
SELECT
  n_name,
  string_agg(c_name, ',' ORDER BY c_name) AS customers,
  count(*)                                AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > 9000
GROUP BY n_name
ORDER BY n_name
""",
    tags=("agg", "string"),
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (SQL string_agg): Spark composes it from
    array_join(array_sort(collect_list(...))) — explicit ordering makes
    the result deterministic under parallel merge, which string_agg
    without ORDER BY is NOT (first thing to check when a downstream diff
    flaps). Bounded groups only, same rule as any collect."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("customers"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Window value functions
# --------------------------------------------------------------------------


@register(
    "window_value_functions",
    oracle="""
SELECT
  o_custkey,
  o_orderkey,
  round(first_value(o_totalprice) OVER w, 2)   AS first_price,
  round(last_value(o_totalprice) OVER wfull, 2) AS last_price,
  round(nth_value(o_totalprice, 2) OVER wfull, 2) AS second_price
FROM orders
WINDOW
  w     AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
  wfull AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey, o_orderkey
""",
    tags=("window",),
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window value functions (first_value / last_value / nth_value): each
    customer's first, latest, and second order price in one windowed
    pass. The classic trap is frame defaults: last_value over the default
    frame (UNBOUNDED PRECEDING..CURRENT ROW) returns the CURRENT row —
    the full-frame window here is the correct spelling, identical in both
    engines. One shuffle on o_custkey serves all three."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(wfull), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(wfull), 2).alias("second_price"),
    ).orderBy("o_custkey", "o_orderkey")


# --------------------------------------------------------------------------
# Regex scalar battery
# --------------------------------------------------------------------------


@register(
    "scalar_regex",
    oracle="""
SELECT
  doc_id,
  regexp_extract(text, '([a-z]{5,})', 1)                       AS first_long_word,
  CAST(len(regexp_extract_all(text, '[a-z]{5,}')) AS BIGINT)   AS n_long_words,
  regexp_replace(substr(text, 1, 40), '[aeiou]', '*', 'g')     AS devoweled_head,
  split_part(text, ' ', 2)                                     AS second_word,
  regexp_matches(text, '^[a-z]')                               AS starts_lower
FROM documents
ORDER BY doc_id
""",
    tags=("scalar", "regex"),
)
def scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex battery: extract / extract-all / global replace / split_part
    / boolean match — the text-wrangling workhorses. All JVM-side codegen
    (no Python); regex dialects agree on this class-and-quantifier subset
    (each engine's extended syntax differs, so operators stick to the
    common core)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]{5,})", 1).alias("first_long_word"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]{5,}"), 0)).cast("long").alias("n_long_words"),
        F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "*").alias("devoweled_head"),
        F.split_part("text", F.lit(" "), F.lit(2)).alias("second_word"),
        F.col("text").rlike("^[a-z]").alias("starts_lower"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Boolean aggregates
# --------------------------------------------------------------------------


@register(
    "agg_bool",
    oracle="""
SELECT
  o_orderpriority,
  bool_and(o_totalprice > 1000)   AS all_over_1k,
  bool_or(o_totalprice > 400000)  AS any_over_400k,
  CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_finished,
  count(*) AS n
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("agg", "bool"),
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (bool_and / bool_or = SQL EVERY / ANY): data-
    quality invariants as one aggregate pass — "do ALL rows in this group
    satisfy X, does ANY violate Y". Partial-aggregatable single bits per
    group; the standard shape for constraint monitoring over a 100 TB
    table."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )
