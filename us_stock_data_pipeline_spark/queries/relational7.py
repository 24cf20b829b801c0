"""Relational surface, part 7: hash/encoding scalars, lateral explode
with ordinality, time-series gap-filling over a generated calendar,
median/any_value aggregates, and CDC-style latest-row-per-key dedup.

These close the remaining scalar/reshape gaps in SURVEY.md §2B: every
operator here is a pure DataFrame declaration (no Python in the row
path), so Catalyst keeps whole-stage codegen across the battery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.functions import detmath
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Hash / encoding battery
# --------------------------------------------------------------------------


@register(
    "scalar_hash_encode",
    oracle="""
SELECT
  doc_id,
  md5(text)                                            AS h_md5,
  sha256(text)                                         AS h_sha256,
  base64(substr(text, 1, 12)::BLOB)                    AS b64_head,
  lower(hex(substr(text, 1, 6)))                       AS hex_head,
  CAST(('0x' || substr(md5(text), 1, 4))::UBIGINT % 100 AS BIGINT) AS hash_bucket
FROM documents
ORDER BY doc_id
""",
    tags=("scalar", "hash"),
)
def scalar_hash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash + binary-encoding battery: md5 / sha256 content hashes,
    base64 / hex encodings, and a hex-prefix -> integer bucket (the
    primitive under deterministic sharding and A/B salting). All JVM
    builtins evaluated inside one codegen stage; content hashes are the
    backbone of exact dedup and cache keys at corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        F.base64(F.substring("text", 1, 12).cast("binary")).alias("b64_head"),
        F.lower(F.hex(F.substring("text", 1, 6))).alias("hex_head"),
        (F.conv(F.substring(F.md5("text"), 1, 4), 16, 10).cast("long") % 100).alias(
            "hash_bucket"
        ),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Lateral explode with ordinality (posexplode)
# --------------------------------------------------------------------------


@register(
    "lateral_posexplode",
    oracle="""
SELECT
  doc_id,
  CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos,
  unnest(toks)                                     AS token
FROM (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents
  WHERE doc_id < 40
)
ORDER BY doc_id, pos
""",
    tags=("reshape", "lateral"),
)
def lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral array explosion WITH ordinality: one row per token carrying
    its 0-based position — the tokenizer output shape every downstream
    text op consumes (shingling, n-grams, positional features). Explode is
    a narrow transform: rows multiply inside the stage with no shuffle,
    and the generator output stays in codegen. Kept to a doc_id slice so
    the corpus-size row blowup stays proportional in the fixture."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    return (
        docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "token")
        .orderBy("doc_id", "pos")
    )


# --------------------------------------------------------------------------
# Time-series gap filling over a generated calendar
# --------------------------------------------------------------------------


@register(
    "timeseries_gap_fill",
    oracle="""
WITH days AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-30 00:00:00',
                                INTERVAL 1 DAY)) AS day
),
daily AS (
  SELECT
    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
    CAST(count(*) AS BIGINT)                 AS n_events,
    round(sum(value), 2)                     AS total_value
  FROM events
  WHERE event_type = 'purchase'
  GROUP BY 1
)
SELECT
  days.day,
  coalesce(daily.n_events, 0)      AS n_events,
  coalesce(daily.total_value, 0.0) AS total_value
FROM days LEFT JOIN daily ON days.day = daily.day
ORDER BY days.day
""",
    tags=("timeseries", "join"),
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-filling: generate the full day scaffold with
    sequence()+explode, left-join the real per-day aggregate onto it, and
    zero-fill the holes — so downstream window math (moving averages,
    deltas) never silently skips empty days. The scaffold is O(days) and
    broadcast; the fact side is pre-aggregated before the join, so the
    join moves O(days) rows regardless of event volume."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = (
        events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("timestamp"),
                F.lit("2024-01-30").cast("timestamp"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    return (
        days.join(daily, "day", "left_outer")
        .select(
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Median / any_value aggregates
# --------------------------------------------------------------------------


@register(
    "agg_median_any",
    oracle="""
SELECT
  l_returnflag,
  round(median(l_quantity), 4)      AS med_qty,
  round(median(l_extendedprice), 4) AS med_price,
  any_value(upper(l_returnflag))    AS flag_upper,
  count(*)                          AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("agg",),
)
def agg_median_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median and any_value aggregates. median is the exact interpolated
    50th percentile — unlike the moment sketches it needs the group's
    values materialized, so at 100 TB the per-group sort is the cost and
    approx_percentile is the scale fallback (agg_percentiles covers the
    approx path). any_value is the "pick one, don't care which" projector;
    it is applied to a group-constant expression here so both engines'
    arbitrary choice is the same value."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.median("l_quantity"), 4).alias("med_qty"),
            F.round(F.median("l_extendedprice"), 4).alias("med_price"),
            F.any_value(F.upper("l_returnflag")).alias("flag_upper"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# CDC-style latest-row-per-key snapshot
# --------------------------------------------------------------------------


@register(
    "dedup_latest_snapshot",
    oracle="""
SELECT user_id, event_id AS last_event_id, ts AS last_ts, event_type AS last_type
FROM (
  SELECT *,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id
""",
    tags=("dedup", "window", "cdc"),
)
def dedup_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-key snapshot (the CDC/SCD "current state" compaction:
    many change events per key -> one current row). row_number over
    (ts DESC, event_id DESC) makes the winner total-order deterministic
    even on timestamp ties. One shuffle on the key; AQE handles skewed
    hot keys, and at 100 TB this is the standard log->snapshot compaction
    run. The windowed-rank formulation lets Spark's WindowGroupLimit push
    the rn=1 limit into the sort instead of ranking every row."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Batch MERGE / upsert (full-outer coalesce formulation)
# --------------------------------------------------------------------------


@register(
    "etl_merge_upsert",
    oracle="""
WITH target AS (
  SELECT event_id, event_type, round(value, 2) AS value
  FROM events
  WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
),
source AS (
  SELECT event_id, event_type, round(value * 2, 2) AS value
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
)
SELECT
  coalesce(s.event_id, t.event_id)     AS event_id,
  coalesce(s.event_type, t.event_type) AS event_type,
  coalesce(s.value, t.value)           AS value,
  CASE WHEN s.event_id IS NOT NULL AND t.event_id IS NOT NULL THEN 'updated'
       WHEN s.event_id IS NOT NULL THEN 'inserted'
       ELSE 'kept' END                 AS action
FROM target t
FULL OUTER JOIN source s ON t.event_id = s.event_id
ORDER BY event_id
""",
    tags=("etl", "merge"),
)
def etl_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE (upsert) semantics as a full-outer join + coalesce:
    matched keys take the source row ('updated'), unmatched source rows
    insert, unmatched target rows survive — the exact fix for the
    reference's append-only duplication flaw (re-running its 1m pipeline
    appends duplicate bars; `ingest_1m_session.py:273-293` has no
    MERGE/dedup). On a Delta/Iceberg table this compiles to MERGE INTO;
    the join formulation here is storage-agnostic and shuffles each side
    once on the key — at 100 TB you'd partition/z-order the target by the
    key so the merge join prunes to touched files only."""
    events = load_table(spark, sf_dir, "events")
    target = events.filter(F.col("ts") < F.lit("2024-01-20").cast("timestamp")).select(
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("t_type"),
        F.round("value", 2).alias("t_value"),
    )
    source = events.filter(F.col("ts") >= F.lit("2024-01-15").cast("timestamp")).select(
        F.col("event_id").alias("s_id"),
        F.col("event_type").alias("s_type"),
        F.round(F.col("value") * 2, 2).alias("s_value"),
    )
    return (
        target.join(source, target.t_id == source.s_id, "full_outer")
        .select(
            F.coalesce("s_id", "t_id").alias("event_id"),
            F.coalesce("s_type", "t_type").alias("event_type"),
            F.coalesce("s_value", "t_value").alias("value"),
            F.when(F.col("s_id").isNotNull() & F.col("t_id").isNotNull(), "updated")
            .when(F.col("s_id").isNotNull(), "inserted")
            .otherwise("kept")
            .alias("action"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# HLL sketch aggregation (mergeable approximate distinct)
# --------------------------------------------------------------------------


@register(
    "agg_hll_sketch",
    oracle="""
SELECT
  event_type,
  count(DISTINCT user_id) AS exact_users,
  TRUE                    AS within_tol
FROM events
GROUP BY event_type
UNION ALL
SELECT 'ALL', count(DISTINCT user_id), TRUE FROM events
ORDER BY event_type
""",
    tags=("agg", "sketch"),
)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog sketch aggregation (Apache DataSketches via Spark's
    hll_sketch_agg): per-event-type distinct-user estimates PLUS the
    merged all-types estimate from unioning the per-group sketches —
    demonstrating the property that matters at 100 TB: sketches are
    mergeable partial aggregates, so distinct counts roll up across
    partitions/days/tables without re-scanning raw data.

    Sketch estimates are engine-specific, so the compared columns are
    the exact distinct counts (DuckDB recomputes both grains) plus a
    boolean asserting each estimate — including the one produced by
    MERGING the per-group sketches — is within 10% of exact. The oracle
    therefore verifies both the estimate contract and merge-consistency;
    default lgConfigK=12 has ~1.6% rsd, so 10% is deterministic."""
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    exact_all = events.agg(F.count_distinct("user_id").alias("exact_users"))
    merged = (
        per_type.agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"))
        .crossJoin(exact_all)
        .select(F.lit("ALL").alias("event_type"), "est_users", "exact_users")
    )
    return (
        per_type.select(
            "event_type",
            F.hll_sketch_estimate("sk").alias("est_users"),
            "exact_users",
        )
        .unionByName(merged)
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("est_users") - F.col("exact_users"))
                <= 0.10 * F.col("exact_users")
            ).alias("within_tol"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Linear-regression aggregates
# --------------------------------------------------------------------------


@register(
    "agg_regression",
    oracle="""
SELECT
  l_returnflag,
  round(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
  round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)  AS n_pairs,
  round(regr_avgx(l_extendedprice, l_quantity), 4)      AS avg_qty,
  round(regr_avgy(l_extendedprice, l_quantity), 4)      AS avg_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("agg", "stats"),
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (price ~ quantity per return flag):
    slope / intercept / R^2 / count / means in ONE pass. Like the moment
    sketches these reduce to co-moment partial aggregates (sums and
    cross-products), so the shuffle carries O(groups) state — the
    fit-a-trend-per-key primitive for feature pipelines, without a
    per-group solver round trip."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
            F.regr_count("l_extendedprice", "l_quantity").alias("n_pairs"),
            F.round(F.regr_avgx("l_extendedprice", "l_quantity"), 4).alias("avg_qty"),
            F.round(F.regr_avgy("l_extendedprice", "l_quantity"), 4).alias("avg_price"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Trigonometric / transcendental scalar battery
# --------------------------------------------------------------------------


# every transcendental runs on the libm-free detmath kernels so both
# engines quantize bit-identical doubles (transcendental audit r9);
# radians/degrees are explicit multiplications by pi/180 literals.
_TRIG_STAGES = (
    [("tg_rad", "CAST(p_size AS DOUBLE) * 7.0 * 0.017453292519943295")]
    + detmath.det_sin_stages("tg_rad", "tg_s")
    + detmath.det_cos_stages("tg_rad", "tg_c")
    + detmath.det_atan2_stages("CAST(p_size AS DOUBLE)", "p_retailprice", "tg_b")
    + detmath.det_atan_stages("CAST(p_size AS DOUBLE) / 10.0", "tg_at")
    + [("tg_ex", "CAST(p_size AS DOUBLE) / 25.0")]
    + detmath.det_exp_stages("tg_ex", "tg_e")
    + detmath.det_cbrt_pos_stages("p_retailprice", "tg_cr")
)
_TRIG_COLS = (
    "round(tg_s, 6) AS s",
    "round(tg_c, 6) AS c",
    "round(tg_b, 6) AS bearing",
    "round(tg_at * 57.29577951308232, 4) AS deg",
    "round(tg_e, 6) AS e",
    "round(tg_cr, 6) AS cr",
)


@register(
    "scalar_trig",
    oracle=f"""
SELECT p_partkey, {", ".join(_TRIG_COLS)}
FROM {detmath.stages_to_select(_TRIG_STAGES, "part")}
ORDER BY p_partkey
""",
    tags=("scalar", "math"),
)
def scalar_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric / transcendental scalars (sin/cos/atan2, degree-radian
    conversion, exp, cbrt) — the geo-distance and cyclic-feature-encoding
    toolbox (hour-of-day/day-of-week sin-cos embeddings for training
    features). In production the builtins (F.sin/F.cos/F.atan2/F.exp/
    F.cbrt) are the idiomatic path; here the values come from the
    detmath kernels because HASHED outputs must be bit-identical across
    engines and libm versions — IEEE arithmetic is, libm trig is not
    (transcendental audit r9)."""
    part = load_table(spark, sf_dir, "part")
    return (
        detmath.apply_stages(part, _TRIG_STAGES)
        .selectExpr("p_partkey", *_TRIG_COLS)
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# Product aggregate (log-space formulation)
# --------------------------------------------------------------------------


@register(
    "agg_product_logspace",
    oracle="""
SELECT
  l_orderkey,
  round(product(1 - l_discount), 4)       AS retained_frac,
  CAST(count(*) AS BIGINT)                AS n_lines
FROM lineitem
WHERE l_orderkey < 200
GROUP BY l_orderkey
ORDER BY l_orderkey
""",
    tags=("agg", "math"),
)
def agg_product_logspace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product aggregate — compound retained fraction after stacking each
    line's discount. Spark has no product() aggregate; the standard
    rewrite is exp(sum(ln(x))), which IS partial-aggregatable (sums
    distribute) and numerically stable for positive factors — the same
    log-space trick used for compounding returns over long bar histories.
    Bounded keyspace slice keeps the fixture result small; the plan is
    identical at any scale."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.round(F.exp(F.sum(F.log(1 - F.col("l_discount")))), 4).alias("retained_frac"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_orderkey")
    )
