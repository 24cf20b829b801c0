"""Round-6 analytics additions, part 11: ABC inventory classification
and embedding-norm quality audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# ABC (Pareto) classification of parts by revenue
# --------------------------------------------------------------------------

_ABC_ORACLE = """
WITH rev AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT CAST(sum(cents) AS HUGEINT) AS t FROM rev),
ranked AS (
  SELECT l_partkey, cents,
         sum(cents) OVER (ORDER BY cents DESC, l_partkey
                          ROWS UNBOUNDED PRECEDING) AS cum_cents
  FROM rev
),
classed AS (
  -- class boundaries on EXACT integers: cum*100 vs t*80 / t*95 avoids
  -- any float share computation
  SELECT l_partkey, cents,
         CASE WHEN cum_cents * 100 <= tot.t * 80 THEN 'A'
              WHEN cum_cents * 100 <= tot.t * 95 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM ranked, tot
)
SELECT abc_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(cents) AS BIGINT) AS class_cents,
       floor(CAST(sum(cents) AS DOUBLE) / max(tot.t) * 10000 + 0.5) / 10000
         AS revenue_share
FROM classed, tot
GROUP BY abc_class
ORDER BY abc_class
"""


@register("orders_abc_classification", oracle=_ABC_ORACLE, tags=("analytics", "pareto"))
def orders_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification: parts ranked by net revenue, class
    A = the prefix covering 80% of revenue, B = to 95%, C = the tail —
    the inventory-management standard (`events_pareto_gini` measures
    concentration; this OPERATIONALIZES it into segments). The class
    boundary test runs on exact integers (cum*100 <= total*80), so
    membership can't flip on a float share rounding. Plan: one fact
    groupBy to per-part revenue, one global ordered cumsum over the
    PART-cardinality table (not the fact table; at 100 TB parts are
    millions of rows — a single-sort window that a range-partitioned
    two-pass sum replaces if parts themselves outgrow a task), then a
    3-row rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                "long"
            )
        )
        .cast("long")
        .alias("cents")
    )
    tot = rev.agg(F.sum("cents").cast("decimal(38,0)").alias("t"))
    w = Window.orderBy(F.col("cents").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = rev.select("l_partkey", "cents", F.sum("cents").over(w).alias("cum_cents"))
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        "l_partkey",
        "cents",
        "t",
        F.when(
            F.col("cum_cents").cast("decimal(38,0)") * 100 <= F.col("t") * 80, "A"
        )
        .when(F.col("cum_cents").cast("decimal(38,0)") * 100 <= F.col("t") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("cents").cast("long").alias("class_cents"),
            (
                F.floor(
                    F.sum("cents").cast("double") / F.max("t").cast("double") * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


# --------------------------------------------------------------------------
# Embedding-norm quality audit
# --------------------------------------------------------------------------

_NORM_OUT_K = 3  # flag beyond median +- 3*MAD

_NORM_ORACLE = f"""
WITH q AS (
  SELECT vec_id, label,
         CAST(list_sum(list_transform(embedding,
              v -> CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT)
                   * CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT))) AS BIGINT) AS n2
  FROM embeddings
),
med AS (
  -- lower median, spelled out as a rank so both engines share the exact
  -- tie convention: max of the smallest ceil(n/2) values
  SELECT max(n2) AS m FROM (
    SELECT n2, row_number() OVER (ORDER BY n2, vec_id) AS rn,
           count(*) OVER () AS n
    FROM q) t
  WHERE rn * 2 <= n + 1
),
absdev AS (
  SELECT max(ad) AS mad FROM (
    SELECT abs(q.n2 - med.m) AS ad,
           row_number() OVER (ORDER BY abs(q.n2 - med.m), q.vec_id) AS rn,
           count(*) OVER () AS n
    FROM q, med) t
  WHERE rn * 2 <= n + 1
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CASE WHEN abs(q.n2 - med.m) > {_NORM_OUT_K} * ad.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       floor(sqrt(CAST(min(q.n2) AS DOUBLE)) / 10000 * 10000 + 0.5) / 10000 AS min_norm,
       floor(sqrt(CAST(max(q.n2) AS DOUBLE)) / 10000 * 10000 + 0.5) / 10000 AS max_norm
FROM q, med, absdev ad
GROUP BY label
ORDER BY label
"""


@register("embedding_norm_audit", oracle=_NORM_ORACLE, tags=("llm", "embedding", "quality"))
def embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-norm quality audit: per-label vector counts, norm
    range, and robust outliers (beyond median ± 3·MAD of the SQUARED
    norm) — the first sanity gate an embedding pipeline runs after an
    encoder deploy, since collapsed or exploding norms are the classic
    symptom of a bad checkpoint or truncated batch
    (`embedding_quantize_int8` audits precision; this audits the
    distribution itself). Squared norms are exact int64 from quantized
    components; the median/MAD are LOWER medians spelled out as a rank
    window (max of the smallest ceil(n/2) values) because the engines'
    percentile_disc/quantile_disc tie conventions aren't guaranteed to
    agree — rank arithmetic is. The outlier rule is then a pure
    integer comparison. One pass for norms, two tiny broadcast
    scalars, one groupBy."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = F.transform(
        "embedding", lambda v: F.round(v.cast("double") * 10000).cast("long")
    )
    q = emb.select(
        "vec_id",
        "label",
        F.aggregate(
            F.zip_with(qv, qv, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("n2"),
    )
    def lower_median(df: DataFrame, col: str, out: str) -> DataFrame:
        ranked = df.select(
            F.col(col),
            F.row_number().over(Window.orderBy(F.col(col), "vec_id")).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
        return ranked.filter(F.col("rn") * 2 <= F.col("n") + 1).agg(
            F.max(col).alias(out)
        )

    med = lower_median(q, "n2", "m")
    absdev = lower_median(
        q.crossJoin(F.broadcast(med)).select(
            "vec_id", F.abs(F.col("n2") - F.col("m")).alias("ad")
        ),
        "ad",
        "mad",
    )
    joined = q.crossJoin(F.broadcast(med)).crossJoin(F.broadcast(absdev))
    return (
        joined.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum(
                F.when(
                    F.abs(F.col("n2") - F.col("m")) > _NORM_OUT_K * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            (
                F.floor(F.sqrt(F.min("n2").cast("double")) / 10000 * 10000 + F.lit(0.5))
                / 10000
            ).alias("min_norm"),
            (
                F.floor(F.sqrt(F.max("n2").cast("double")) / 10000 * 10000 + F.lit(0.5))
                / 10000
            ).alias("max_norm"),
        )
        .select(
            F.col("label").cast("long").alias("label"),
            "n_vecs",
            "n_outliers",
            "min_norm",
            "max_norm",
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# Audience overlap matrix (event-type co-occurrence)
# --------------------------------------------------------------------------

_OVERLAP_AUD_ORACLE = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
),
sizes AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY event_type
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_both,
       max(sa.n) AS n_a, max(sb.n) AS n_b,
       floor(CAST(count(*) AS DOUBLE) / max(sa.n) * 10000 + 0.5) / 10000
         AS share_of_a
FROM ut a
JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
JOIN sizes sa ON sa.event_type = a.event_type
JOIN sizes sb ON sb.event_type = b.event_type
GROUP BY a.event_type, b.event_type
ORDER BY type_a, type_b
"""


@register("events_audience_overlap", oracle=_OVERLAP_AUD_ORACLE, tags=("analytics", "audience"))
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap matrix: for every pair of event types, how many
    users do BOTH, and what share of type A's audience that is — the
    segment-overlap readout behind campaign planning and feature
    adoption dashboards (the batch twin of what `events_activity_bitmap`
    answers with mask ANDs once bitmaps are materialized). The
    user-type self-join is bounded: each user contributes at most
    C(types,2) pairs after the distinct, so output is types^2-sized
    and the join shuffles once on user_id. Counts exact; the share is
    one terminal division."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a, b = ut.alias("a"), ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"), F.col("b.event_type").alias("type_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            (
                F.floor(F.col("n_both").cast("double") / F.col("n_a") * 10000 + F.lit(0.5))
                / 10000
            ).alias("share_of_a"),
        )
        .orderBy("type_a", "type_b")
    )
