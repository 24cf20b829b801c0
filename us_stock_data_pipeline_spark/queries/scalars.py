"""Scalar function surface: string / datetime / math / array / JSON /
conditional batteries, each over the table whose domain fits.

All of these stay inside whole-stage codegen (pure `pyspark.sql.functions`
column expressions — no Python in the row path), so they cost the same per
row at sf0.001 and at 100 TB. Integer-producing builtins are cast to long
on the Spark side to match DuckDB's BIGINT outputs exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.functions import detmath
from us_stock_data_pipeline_spark.registry import register


@register(
    "scalar_string",
    oracle="""
SELECT
  doc_id,
  upper(lang)                          AS lang_u,
  CAST(length(text) AS BIGINT)         AS text_len,
  substring(text, 1, 20)               AS prefix,
  split_part(text, ' ', 1)             AS first_word,
  concat_ws(':', lang, source)         AS tag,
  replace(substring(text, 1, 30), ' ', '_') AS snake30,
  CAST(length(text) - length(replace(text, 'a', '')) AS BIGINT) AS n_a
FROM documents
ORDER BY doc_id
""",
    tags=("scalar",),
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String battery on documents.text (lower/upper/substring/split/
    concat_ws/length/replace — SURVEY §2B scalar:string)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper("lang").alias("lang_u"),
        F.length("text").cast("long").alias("text_len"),
        F.substring("text", 1, 20).alias("prefix"),
        F.substring_index("text", " ", 1).alias("first_word"),
        F.concat_ws(":", "lang", "source").alias("tag"),
        F.replace(F.substring("text", 1, 30), F.lit(" "), F.lit("_")).alias("snake30"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("a"), F.lit("")))).cast("long").alias("n_a"),
    ).orderBy("doc_id")


@register(
    "scalar_datetime",
    oracle="""
SELECT
  event_id,
  CAST(year(ts) AS BIGINT)    AS y,
  CAST(month(ts) AS BIGINT)   AS mo,
  CAST(day(ts) AS BIGINT)     AS d,
  CAST(hour(ts) AS BIGINT)    AS h,
  CAST(minute(ts) AS BIGINT)  AS mi,
  date_trunc('hour', CAST(ts AS TIMESTAMP))   AS ts_hour,
  CAST(ts AS TIMESTAMP) + INTERVAL 90 MINUTE  AS ts_plus90m,
  CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT) AS days_since_jan1,
  epoch_ms(ts)                AS t_millis
FROM events
ORDER BY event_id
""",
    tags=("scalar",),
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime battery on events.ts (year/month/day/hour/minute,
    date_trunc, interval arithmetic, datediff, epoch millis — parity
    ancestors P2/P4/P5: the reference's epoch-millis cast and hhmm clock
    encoding, `ingest_massive.py:127`, `1m-seesion-pipeline/utils.py:3-5`)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("mo"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.minute("ts").cast("long").alias("mi"),
        F.date_trunc("hour", "ts").alias("ts_hour"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTE")).alias("ts_plus90m"),
        F.datediff(F.col("ts"), F.lit("2024-01-01").cast("timestamp")).cast("long").alias(
            "days_since_jan1"
        ),
        F.unix_millis("ts").alias("t_millis"),
    ).orderBy("event_id")


# ln/log10 via the libm-free det_ln on exact integer cents (ln(price) =
# ln(cents) - ln(100), log10 = ln/ln(10), both with double literals);
# pow(q, 2) is explicit multiplication — no libm in any hashed column
# (transcendental audit r9).
_SM_STAGES = [
    ("sm_cents", "CAST(round(l_extendedprice * 100) AS BIGINT)")
] + detmath.det_ln_int_stages("sm_cents", "sm_lnc")
_SM_LN_COLS = (
    "round(sm_lnc - 4.605170185988092, 6) AS ln_price,\n"
    "  round((sm_lnc - 4.605170185988092) / 2.302585092994046, 6) AS log10_price,"
)


@register(
    "scalar_math",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge,
  round(abs(l_discount - 0.05), 4)   AS abs_disc_delta,
  {SM_LN_COLS}
  round(sqrt(l_quantity), 6)         AS sqrt_qty,
  round(l_quantity * l_quantity, 2)  AS qty_sq,
  CAST(ceil(l_extendedprice / 1000) AS BIGINT)  AS price_kbucket,
  CAST(floor(l_quantity) AS BIGINT)             AS qty_floor,
  CAST(l_linenumber % 3 AS BIGINT)              AS ln_mod3
FROM {SM_STAGED}
WHERE l_orderkey <= 1000
ORDER BY l_orderkey, l_linenumber
""".replace("{SM_LN_COLS}", _SM_LN_COLS).replace(
        "{SM_STAGED}", detmath.stages_to_select(_SM_STAGES, "lineitem")
    ),
    tags=("scalar",),
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery on lineitem price arithmetic (round/abs/ln/log10/sqrt/
    pow/ceil/floor/mod)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        detmath.apply_stages(li.filter(F.col("l_orderkey") <= 1000), _SM_STAGES)
        .selectExpr(
            "l_orderkey",
            "l_linenumber",
            # round at 6, not 2: the product of 2dp fixture values is an
            # EXACT 6-decimal number, so rounding at 2 lands precisely on
            # .xx5 boundaries where Spark (decimal-repr HALF_UP) and
            # DuckDB (binary-value) round opposite ways (first hit:
            # 43395.75*0.94 = 40792.005 at sf0.1). At 6 decimals the
            # 7th digit is always 0 — no boundary exists on either side.
            "round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge",
            "round(abs(l_discount - 0.05), 4) AS abs_disc_delta",
            "round(sm_lnc - 4.605170185988092, 6) AS ln_price",
            "round((sm_lnc - 4.605170185988092) / 2.302585092994046, 6) AS log10_price",
            "round(sqrt(l_quantity), 6) AS sqrt_qty",
            "round(l_quantity * l_quantity, 2) AS qty_sq",
            "CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_kbucket",
            "CAST(floor(l_quantity) AS BIGINT) AS qty_floor",
            "CAST(l_linenumber % 3 AS BIGINT) AS ln_mod3",
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "scalar_array",
    oracle="""
SELECT
  vec_id,
  CAST(len(embedding) AS BIGINT) AS dim,
  round(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS first_val,
  round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4)
    AS l2_norm,
  round(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))), 4) AS sum_first8,
  round(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4)      AS max_val
FROM embeddings
ORDER BY vec_id
""",
    tags=("scalar", "array"),
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array battery on embeddings.embedding: size, element_at, slice, and
    higher-order functions (transform/aggregate/array_max). HOFs run in
    the JVM inside codegen — this is the scale path for vector math,
    no Python involved (SURVEY §2B scalar:array)."""
    emb = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        # + 0.0 folds IEEE -0.0 to +0.0 (same fix as head_sorted below)
        (F.round(F.element_at("embedding", 1).cast("double"), 4) + F.lit(0.0)).alias(
            "first_val"
        ),
        F.round(
            F.sqrt(F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x * x)), 4
        ).alias("l2_norm"),
        F.round(
            F.aggregate(F.slice(as_double, 1, 8), F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("sum_first8"),
        F.round(F.array_max(as_double), 4).alias("max_val"),
    ).orderBy("vec_id")


@register(
    "scalar_json",
    oracle="""
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
  CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS k_doubled,
  (json_extract_string(props, '$.k') IS NOT NULL) AS has_k
FROM events
ORDER BY event_id
""",
    tags=("scalar", "json"),
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON battery on events.props: path extraction via get_json_object
    plus schema-full parsing via from_json (SURVEY §2B scalar:map/json)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k LONG")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        (parsed.getField("k") * 2).alias("k_doubled"),
        F.get_json_object("props", "$.k").isNotNull().alias("has_k"),
    ).orderBy("event_id")


@register(
    "scalar_string2",
    oracle="""
SELECT
  doc_id,
  upper(substring(lang, 1, 1)) || substring(lang, 2) AS lang_cap,
  lpad(lang, 5, '_')                    AS lang_pad,
  reverse(source)                       AS source_rev,
  repeat(lang, 2)                       AS lang2,
  CAST(levenshtein(lang, source) AS BIGINT)        AS lev_lang_source,
  CAST(strpos(text, 'data') AS BIGINT)  AS data_pos,
  translate(lang, 'aeiou', 'AEIOU')     AS lang_vowelcaps,
  printf('%s/%s#%d', lang, source, doc_id) AS doc_key
FROM documents
ORDER BY doc_id
""",
    tags=("scalar",),
)
def scalar_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String battery #2: initcap-style casing, padding, reverse, repeat,
    levenshtein (the edit-distance primitive behind fuzzy key matching),
    instr, translate, printf formatting."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.initcap("lang").alias("lang_cap"),
        F.lpad("lang", 5, "_").alias("lang_pad"),
        F.reverse("source").alias("source_rev"),
        F.repeat("lang", 2).alias("lang2"),
        F.levenshtein("lang", "source").cast("long").alias("lev_lang_source"),
        F.instr("text", "data").cast("long").alias("data_pos"),
        F.translate("lang", "aeiou", "AEIOU").alias("lang_vowelcaps"),
        F.format_string("%s/%s#%d", "lang", "source", "doc_id").alias("doc_key"),
    ).orderBy("doc_id")


@register(
    "scalar_datetime2",
    oracle="""
SELECT
  event_id,
  CAST(quarter(ts) AS BIGINT)     AS q,
  CAST(weekofyear(ts) AS BIGINT)  AS iso_week,
  CAST(dayofyear(ts) AS BIGINT)   AS doy,
  CAST(last_day(CAST(ts AS DATE)) AS TIMESTAMP) AS month_end,
  CAST(ts AS TIMESTAMP) + INTERVAL 1 MONTH      AS plus_month,
  CAST(CAST(ts AS DATE) AS TIMESTAMP)           AS day_floor,
  strftime(ts, '%Y-%m-%d %H:%M')  AS formatted
FROM events
ORDER BY event_id
""",
    tags=("scalar",),
)
def scalar_datetime2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime battery #2: quarter / ISO week / day-of-year / last_day /
    calendar-aware month arithmetic / date floor / format. Format strings
    are dialect-specific (Java pattern vs strftime) so each side uses its
    own; outputs are identical strings."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.quarter("ts").cast("long").alias("q"),
        F.weekofyear("ts").cast("long").alias("iso_week"),
        F.dayofyear("ts").cast("long").alias("doy"),
        F.last_day("ts").cast("timestamp").alias("month_end"),
        (F.col("ts") + F.expr("INTERVAL 1 MONTH")).alias("plus_month"),
        F.date_trunc("day", "ts").alias("day_floor"),
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("formatted"),
    ).orderBy("event_id")


@register(
    "scalar_cast_try",
    oracle="""
SELECT
  doc_id,
  TRY_CAST(substring(text, 1, 3) AS BIGINT)      AS bad_cast,
  TRY_CAST(CAST(n_chars AS VARCHAR) AS BIGINT)   AS roundtrip,
  CAST(round(n_chars * 1.5, 0) AS BIGINT)        AS scaled,
  CAST(n_chars AS DOUBLE) / 100                  AS hundredths,
  CAST(n_chars % 2 = 0 AS BOOLEAN)               AS even
FROM documents
ORDER BY doc_id
""",
    tags=("scalar", "cast"),
)
def scalar_cast_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast battery with try_cast null-on-failure semantics — the
    engine-level replacement for the reference's driver-side int()/float()
    coercion loops (parity U1/U2: `polygon_client.py:100-120`,
    `ingest_1m_session.py:224-234`): same null-preserving behavior,
    columnar, inside codegen."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr("try_cast(substring(text, 1, 3) AS LONG)").alias("bad_cast"),
        F.col("n_chars").cast("string").cast("long").alias("roundtrip"),
        F.round(F.col("n_chars") * 1.5, 0).cast("long").alias("scaled"),
        (F.col("n_chars").cast("double") / 100).alias("hundredths"),
        (F.col("n_chars") % 2 == 0).alias("even"),
    ).orderBy("doc_id")


@register(
    "scalar_array2",
    oracle="""
SELECT
  vec_id,
  round(CAST(list_sort(list_transform(embedding, x -> CAST(x AS DOUBLE)))[1] AS DOUBLE), 4)
    AS smallest,
  round(CAST(list_sort(list_transform(embedding, x -> CAST(x AS DOUBLE)))[64] AS DOUBLE), 4)
    AS largest,
  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive,
  round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) / 64, 4) + 0.0 AS mean_val,
  array_to_string(
    list_sort(list_transform(embedding[1:4], x -> round(CAST(x AS DOUBLE), 2) + 0.0)), ','
  ) AS head_sorted
FROM embeddings
ORDER BY vec_id
""",
    tags=("scalar", "array"),
)
def scalar_array2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array battery #2: array_sort, filter HOF, element stats, sliced
    sort — still all JVM-side. The sorted head slice is serialized to a
    CSV string on both sides so the driver canonicalizer never hashes a
    raw array cell."""
    emb = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    srt = F.array_sort(as_double)
    return emb.select(
        "vec_id",
        F.round(F.element_at(srt, 1), 4).alias("smallest"),
        F.round(F.element_at(srt, 64), 4).alias("largest"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_positive"),
        (
            F.round(F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x) / 64, 4)
            + F.lit(0.0)
        ).alias("mean_val"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.transform(
                        F.slice("embedding", 1, 4),
                        lambda x: F.round(x.cast("double"), 2) + F.lit(0.0),
                    )
                ),
                lambda x: x.cast("string"),
            ),
        ).alias("head_sorted"),
    ).orderBy("vec_id")


@register(
    "map_ops",
    oracle="""
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT)     AS k,
  CAST(json_extract_string(props, '$.k') AS BIGINT) + 1 AS k_plus,
  'k' AS first_key
FROM events
ORDER BY event_id
""",
    tags=("scalar", "map"),
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse JSON into a typed map, then map_keys /
    element_at / map arithmetic via transform_values. The oracle verifies
    the VALUES through plain JSON SQL (map construction is Spark-side;
    DuckDB's MAP is a different dialect — semantics, not syntax, are
    what's checked)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,long>")
    m_plus = F.transform_values(m, lambda _, v: v + 1)
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k"),
        F.element_at(m_plus, "k").alias("k_plus"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
    ).orderBy("event_id")


@register(
    "conditional_null",
    oracle="""
SELECT
  c_custkey,
  CASE
    WHEN c_acctbal < 0 THEN 'negative'
    WHEN c_acctbal < 3000 THEN 'low'
    WHEN c_acctbal < 7000 THEN 'mid'
    ELSE 'high'
  END AS balance_bucket,
  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_or_other,
  (c_acctbal < 0) AS is_negative,
  round(greatest(c_acctbal, 0.0), 2) AS acctbal_clamped
FROM customer
ORDER BY c_custkey
""",
    tags=("scalar", "conditional"),
)
def conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / null-handling battery (when/otherwise, nullif,
    coalesce, greatest) — parity ancestor U1: the reference's normalizers
    exist to preserve nulls through type coercion
    (`polygon_client.py:100-120`); in-engine that is when/coalesce logic."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
        .alias("balance_bucket"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment_or_other"
        ),
        (F.col("c_acctbal") < 0).alias("is_negative"),
        F.round(F.greatest("c_acctbal", F.lit(0.0)), 2).alias("acctbal_clamped"),
    ).orderBy("c_custkey")
