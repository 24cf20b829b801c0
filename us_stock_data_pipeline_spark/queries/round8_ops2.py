"""Round-8 operators, part 2: l-diversity privacy audit, MATTR lexical
diversity, URL parsing batteries, BMP decode, Chatterjee's xi.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# privacy: l-diversity (completes the k-anonymity / t-closeness trio)
# --------------------------------------------------------------------------

_LDIV_ORACLE = """
WITH qi AS (
  SELECT event_type,
         datediff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) % 7 AS dow,
         user_id % 10 AS sensitive
  FROM events
),
grp AS (
  SELECT event_type, dow,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT sensitive) AS BIGINT) AS l_distinct
  FROM qi GROUP BY event_type, dow
)
SELECT event_type, CAST(dow AS BIGINT) AS dow, n_rows, l_distinct,
       CASE WHEN l_distinct >= 3 THEN 1 ELSE 0 END AS meets_l3
FROM grp
ORDER BY event_type, dow
"""


@register("privacy_l_diversity", oracle=_LDIV_ORACLE, tags=("privacy", "compliance"))
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-DIVERSITY audit — the missing third of the anonymization trio
    (`privacy_k_anonymity` bounds group SIZE, `privacy_t_closeness_emd`
    bounds distribution DISTANCE; l-diversity bounds the count of
    DISTINCT sensitive values per quasi-identifier group, the defense
    against homogeneity attacks where a k-anonymous group leaks because
    every member shares one sensitive value). QI = (event_type,
    day-of-week via epoch-day arithmetic — portable across engines'
    dow conventions), sensitive = a 10-bucket user attribute. One
    groupBy with a count-distinct per group; at 100 TB this is a single
    shuffle on the QI key, partially aggregated map-side."""
    ev = load_table(spark, sf_dir, "events")
    qi = ev.select(
        "event_type",
        (
            F.datediff(F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01").cast("date")) % 7
        ).alias("dow"),
        (F.col("user_id") % 10).alias("sensitive"),
    )
    return (
        qi.groupBy("event_type", "dow")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("sensitive").cast("long").alias("l_distinct"),
        )
        .select(
            "event_type",
            F.col("dow").cast("long").alias("dow"),
            "n_rows",
            "l_distinct",
            F.when(F.col("l_distinct") >= 3, 1).otherwise(0).cast("int").alias("meets_l3"),
        )
        .orderBy("event_type", "dow")
    )


# --------------------------------------------------------------------------
# text: MATTR (moving-average type-token ratio)
# --------------------------------------------------------------------------

_MATTR_W = 20

_MATTR_ORACLE = f"""
WITH w AS (
  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
),
wins AS (
  SELECT doc_id, lang,
         (len(list_distinct(list_slice(ws, i.g, i.g + {_MATTR_W - 1}))) * 1000000)
           // {_MATTR_W} AS ttr_e6
  FROM w, LATERAL (SELECT unnest(range(1, len(ws) - {_MATTR_W - 2})) AS g) i
  WHERE len(ws) >= {_MATTR_W}
),
per_doc AS (
  SELECT doc_id, lang,
         CAST(floor(CAST(sum(ttr_e6) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS mattr_e6
  FROM wins GROUP BY doc_id, lang
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(floor(CAST(sum(mattr_e6) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS mean_mattr_e6,
       CAST(min(mattr_e6) AS BIGINT) AS min_mattr_e6,
       CAST(max(mattr_e6) AS BIGINT) AS max_mattr_e6
FROM per_doc
GROUP BY lang
ORDER BY lang
"""


@register("text_mattr_lexical_diversity", oracle=_MATTR_ORACLE, tags=("llm", "text"), bench=True)
def text_mattr_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATTR (moving-average type-token ratio, Covington & McFall
    2010) — the length-robust lexical-diversity score corpus-quality
    filters use where raw TTR would punish long documents (TTR decays
    with length by Heaps' law; `text_yules_k` and `text_hapax_legomena`
    measure the same axis globally, MATTR measures it locally): slide a
    {W}-token window over each document, take distinct/W per window,
    average per document. Window TTRs are exact integer ratios
    (distinct*1e6 // W) so the per-doc and per-lang means never sum
    raw doubles. Plan: ONE split per document (the array is
    materialized before the lambda — the `transform(sequence)`
    re-split hazard from llm_ops.py does not apply to a bound array
    column), per-window distinct via slice+array_distinct inside a
    single projection, two grouped means; everything stays JVM-side,
    no UDF. Work is O(tokens x W) map-side — embarrassingly parallel
    at any corpus size.""".replace("{W}", str(_MATTR_W))
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("ws")
    )
    wins = (
        docs.filter(F.size("ws") >= _MATTR_W)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(ws) - {_MATTR_W - 1}),"
                    f" i -> (size(array_distinct(slice(ws, i, {_MATTR_W}))) * 1000000)"
                    f" div {_MATTR_W})"
                )
            ).alias("ttr_e6"),
        )
    )
    per_doc = wins.groupBy("doc_id", "lang").agg(
        F.expr(
            "CAST(floor(CAST(sum(ttr_e6) AS DOUBLE) / count(*) + 0.5) AS BIGINT)"
        ).alias("mattr_e6")
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr(
                "CAST(floor(CAST(sum(mattr_e6) AS DOUBLE) / count(*) + 0.5) AS BIGINT)"
            ).alias("mean_mattr_e6"),
            F.min("mattr_e6").cast("long").alias("min_mattr_e6"),
            F.max("mattr_e6").cast("long").alias("max_mattr_e6"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# scalar: URL parsing battery (parse_url vs regexp oracle)
# --------------------------------------------------------------------------

_URL_ORACLE = """
WITH u AS (
  SELECT 'https://www.' || event_type || '.example.com/u/' || user_id
         || '/p?q=' || event_id || '&ref=' || (user_id % 5) AS url
  FROM events
),
parsed AS (
  SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
         regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
         regexp_extract(url, '\\?(.*)$', 1) AS query,
         CAST(regexp_extract(url, 'ref=([0-9]+)', 1) AS BIGINT) AS ref
  FROM u
)
SELECT host,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT path) AS BIGINT) AS n_paths,
       CAST(sum(ref) AS BIGINT) AS sum_ref,
       CAST(max(length(query)) AS BIGINT) AS max_query_len
FROM parsed
GROUP BY host
ORDER BY host
"""


@register("scalar_url_parse", oracle=_URL_ORACLE, tags=("scalar", "text"))
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition battery on Spark's native `parse_url`
    (HOST / PATH / QUERY plus keyed query-parameter extraction) — the
    workhorse of web-corpus curation (dedup_url_canonical normalizes;
    this EXTRACTS structure: host for per-site quotas, path for
    document identity, query params for tracking-junk detection). URLs
    are synthesized deterministically from event columns so the oracle
    can re-parse the identical strings with regexps. parse_url compiles
    to a JVM intrinsic (no Python UDF); the rollup is one groupBy on
    host. At 100 TB host extraction feeds the per-domain quota sampler
    map-side, no extra shuffle."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.select(
        F.concat(
            F.lit("https://www."),
            F.col("event_type"),
            F.lit(".example.com/u/"),
            F.col("user_id"),
            F.lit("/p?q="),
            F.col("event_id"),
            F.lit("&ref="),
            F.col("user_id") % 5,
        ).alias("url")
    )
    parsed = u.select(
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref")).cast("long").alias("ref"),
    )
    return (
        parsed.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("path").cast("long").alias("n_paths"),
            F.sum("ref").cast("long").alias("sum_ref"),
            F.max(F.length("query")).cast("long").alias("max_query_len"),
        )
        .orderBy("host")
    )


# --------------------------------------------------------------------------
# multimodal: REAL 24-bit BMP decode (4th live codec)
# --------------------------------------------------------------------------

_BMP_W = 7
_BMP_H = 5

_BMP_ORACLE = f"""
WITH ids AS (
  SELECT doc_id, source FROM documents WHERE doc_id % 9 = 0
),
grid AS (
  SELECT x.x, y.y
  FROM (SELECT unnest(generate_series(0, {_BMP_W - 1})) AS x) x
  CROSS JOIN (SELECT unnest(generate_series(0, {_BMP_H - 1})) AS y) y
),
pixels AS (
  SELECT i.doc_id, i.source,
         (i.doc_id * 7 + g.x * 13 + g.y * 17) % 256 AS r,
         (i.doc_id * 11 + g.x * 3 + g.y * 5) % 256 AS gch,
         (i.doc_id * 13 + g.x * 19 + g.y * 23) % 256 AS b
  FROM ids i CROSS JOIN grid g
)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_images,
       CAST(sum(r) AS BIGINT) AS sum_r,
       CAST(sum(gch) AS BIGINT) AS sum_g,
       CAST(sum(b) AS BIGINT) AS sum_b,
       CAST(0 AS BIGINT) AS n_bad_dimensions
FROM pixels
GROUP BY source
ORDER BY source
"""


@register("multimodal_bmp_decode", oracle=_BMP_ORACLE, tags=("llm", "multimodal", "udf"))
def multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END REAL **BMP** decode — fourth live codec (after PPM,
    PNG, PCM-WAV), chosen because its on-disk quirks are the OPPOSITE
    of PPM's: rows bottom-up, pixels BGR, rows padded to 4 bytes (width
    7 -> 3 pad bytes every row, so the padding path always runs). Every
    9th document gets the same affine-mod-256 test card encoded by
    functions/multimodal.py's ``encode_bmp24`` and decoded by
    ``decode_bmp24`` (struct headers + numpy flip/swap — no external
    codec). The oracle enumerates the generator in SQL, so the decoded
    channel sums prove the row-flip and BGR swap happened (a decoder
    that forgot either would swap/garble channel sums and hash-fail).
    Same plan as the codec twins: scan -> Arrow encode -> Arrow decode
    -> rollup, payloads never at the driver."""
    import pandas as pd

    from us_stock_data_pipeline_spark.functions.multimodal import (
        bmp_decode_batch,
        encode_bmp24,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 9 == 0)
        .select("doc_id", "source")
    )

    def encode_batch(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "source": pdf["source"],
                    "payload": [
                        encode_bmp24(int(d), _BMP_W, _BMP_H) for d in pdf["doc_id"]
                    ],
                }
            )

    def decode_with_source(batches):
        for pdf in batches:
            src = pdf[["doc_id", "source"]]
            stats = next(bmp_decode_batch(iter([pdf[["doc_id", "payload"]]])))
            yield src.merge(stats, on="doc_id")

    blobs = docs.mapInPandas(
        encode_batch, "doc_id long, source string, payload binary"
    )
    decoded = blobs.mapInPandas(
        decode_with_source,
        "doc_id long, source string, width long, height long,"
        " sum_r long, sum_g long, sum_b long",
    )
    return (
        decoded.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_images"),
            F.sum("sum_r").cast("long").alias("sum_r"),
            F.sum("sum_g").cast("long").alias("sum_g"),
            F.sum("sum_b").cast("long").alias("sum_b"),
            F.sum(
                F.when(
                    (F.col("width") != _BMP_W) | (F.col("height") != _BMP_H), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_bad_dimensions"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# stats: Chatterjee's xi rank correlation
# --------------------------------------------------------------------------

_XI_ORACLE = """
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT symbol, day, c AS x, lead(c) OVER w AS y
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lead(c) OVER w IS NOT NULL
),
ranked AS (
  SELECT symbol, x, day,
         CAST(count(*) OVER (PARTITION BY symbol ORDER BY y, day
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS r
  FROM pairs
),
adj AS (
  SELECT symbol, r,
         lag(r) OVER (PARTITION BY symbol ORDER BY x, day) AS rp
  FROM ranked
),
s AS (
  SELECT symbol,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(abs(r - rp)) AS BIGINT) AS sum_adj
  FROM adj WHERE rp IS NOT NULL
  GROUP BY symbol
)
SELECT symbol, n + 1 AS n_pairs,
       CAST(floor((1.0 - 3.0 * CAST(sum_adj AS DOUBLE)
                   / (CAST(n + 1 AS DOUBLE) * CAST(n + 1 AS DOUBLE) - 1.0)) * 1e6 + 0.5)
         AS BIGINT) AS xi_e6
FROM s
ORDER BY symbol
"""


@register("stats_chatterjee_xi", oracle=_XI_ORACLE, tags=("stats", "timeseries"))
def stats_chatterjee_xi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chatterjee's xi (2020) — the modern rank-correlation that
    detects ARBITRARY functional dependence, not just monotone trends
    (Spearman/Kendall, both implemented, score a parabola ~0; xi scores
    it high): sort pairs by x, rank the y values, and measure how
    wildly adjacent y-ranks jump — xi = 1 - 3*sum|r_{i+1}-r_i|/(n^2-1).
    Applied per symbol to (close_t, close_{t+1}) as a nonlinear
    predictability probe. Ties in both x and y are broken by the
    deterministic day column, so both engines rank identically; ranks
    and adjacent-jump sums are exact integers, the final xi is one
    quantized double tree. Plan: daily rollup + three windows over the
    SAME symbol partition (one shuffle) + one aggregate — rank-based
    statistics without ever leaving the JVM."""
    closes = _daily_closes_xi(spark, sf_dir)
    from pyspark.sql import Window as W

    w = W.partitionBy("symbol").orderBy("day")
    pairs = (
        closes.withColumn("y", F.lead("c").over(w))
        .filter("y IS NOT NULL")
        .select("symbol", "day", F.col("c").alias("x"), "y")
    )
    wy = W.partitionBy("symbol").orderBy("y", "day").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    ranked = pairs.withColumn("r", F.count(F.lit(1)).over(wy).cast("long"))
    wx = W.partitionBy("symbol").orderBy("x", "day")
    adj = ranked.withColumn("rp", F.lag("r").over(wx))
    s = (
        adj.filter("rp IS NOT NULL")
        .groupBy("symbol")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.abs(F.col("r") - F.col("rp"))).cast("long").alias("sum_adj"),
        )
    )
    return s.selectExpr(
        "symbol",
        "n + 1 AS n_pairs",
        "CAST(floor((1.0 - 3.0 * CAST(sum_adj AS DOUBLE)"
        " / (CAST(n + 1 AS DOUBLE) * CAST(n + 1 AS DOUBLE) - 1.0)) * 1e6 + 0.5)"
        " AS BIGINT) AS xi_e6",
    ).orderBy("symbol")


def _daily_closes_xi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
