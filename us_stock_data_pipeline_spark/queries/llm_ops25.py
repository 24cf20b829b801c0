"""Round-19 LLM ops, part 25: MOSS-style winnowing fingerprints and
KV-cache prefix-sharing analysis.

Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03) is the span-level
fingerprint scheme MOSS uses for plagiarism detection — guaranteed to
select at least one fingerprint per w consecutive k-grams, so any
shared substring of length >= k + w - 1 is always detected. Prefix
sharing is the serving-side twin: how many prompt prefixes collide,
i.e. how much KV-cache an inference server with prefix caching reuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Winnowing fingerprints
# --------------------------------------------------------------------------

_WIN_K = 8  # char k-gram length
_WIN_W = 4  # window of consecutive k-grams; detects matches >= k+w-1 chars
_POS_MOD = 65536  # position packing base (documents are << 64k chars)

# 40-bit k-gram hash both engines compute identically: the first 10 hex
# chars of md5, read as an integer (the same trick the MinHash pipeline
# documents at llm_ops.py:exploded_shingle_hashes). The selector key
# packs (hash, position) into ONE BIGINT — hash * 65536 + (65535 - pos)
# — so a plain integer min() implements "smallest hash, RIGHTMOST
# position on ties", the standard winnowing tie rule, without a struct
# comparator (which DuckDB's window min could not hash-match); 40 bits
# (not 48) keeps hash * 65536 + pos inside signed-BIGINT range.
_WINNOW_ORACLE = f"""
WITH grams AS (
  SELECT d.doc_id, t.p,
         CAST(('0x' || substring(md5(substr(d.text, t.p, {_WIN_K})), 1, 10)) AS BIGINT)
           AS h
  FROM documents d,
       LATERAL unnest(generate_series(1, length(d.text) - {_WIN_K - 1})) AS t(p)
),
keyed AS (
  SELECT doc_id, p,
         h * {_POS_MOD} + ({_POS_MOD - 1} - p) AS key,
         max(p) OVER (PARTITION BY doc_id) AS max_p
  FROM grams
),
selected AS (
  SELECT doc_id,
         min(key) OVER (PARTITION BY doc_id ORDER BY p
                        ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING) AS sel
  FROM keyed
  QUALIFY p <= max_p - {_WIN_W - 1}
),
fps AS (
  SELECT DISTINCT doc_id, sel // {_POS_MOD} AS h
  FROM selected
),
shared AS (
  SELECT h, count(DISTINCT doc_id) AS n_docs FROM fps GROUP BY h
)
SELECT f.doc_id,
       CAST(count(*) AS BIGINT) AS n_fingerprints,
       CAST(sum(f.h) AS BIGINT) AS fp_checksum,
       CAST(count(*) FILTER (WHERE s.n_docs > 1) AS BIGINT) AS n_shared_fp
FROM fps f JOIN shared s ON f.h = s.h
GROUP BY f.doc_id
ORDER BY f.doc_id
"""


@register("doc_winnowing_fingerprint", oracle=_WINNOW_ORACLE, tags=("llm", "dedup"), bench=True)
def doc_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm): hash every
    char {_WIN_K}-gram, slide a window of {_WIN_W} consecutive hashes,
    and keep each window's minimum — rightmost on ties — which
    GUARANTEES any copied span of >= {_WIN_K + _WIN_W - 1} chars shares
    a fingerprint between the two documents (the coverage property
    rolling-hash sampling mod p cannot give). The k-gram hash is the
    md5-prefix integer both engines compute identically; (hash, pos)
    packs into one BIGINT so the per-window argmin is a plain integer
    min over a ROWS frame — no struct comparator, no self-join. The
    k-grams are built inside an array transform so exploded rows carry
    {_WIN_K}-char grams, never the whole document. Per doc: fingerprint
    count, an exact checksum of the distinct 40-bit hashes, and how
    many fingerprints also occur in another document (the span-level
    dup signal). At 100 TB the plan is explode -> one doc-keyed window
    -> distinct -> one hash-keyed count join: all shuffles are on
    doc_id or the 40-bit hash, both uniform keys."""
    # the fixture lands as ONE parquet split, so the ~300x explode +
    # per-gram md5 below would run on a single core; spreading the doc
    # rows first parallelizes the fan-out (at 100 TB the scan has
    # thousands of splits and this exchange is a no-op by comparison)
    # an explicit width, because AQE would coalesce a 3 MB exchange
    # back to one partition — the width here must reflect the WORK
    # (1.4M md5 calls) not the bytes
    n_parts = max(8, spark.sparkContext.defaultParallelism // 2)
    docs = load_table(spark, sf_dir, "documents").repartition(n_parts, "doc_id")
    grams = docs.select(
        "doc_id",
        # the last window START is p = len-k+1-(w-1); deriving the gate
        # from length() directly removes what was a second
        # (partition-only max) window pass over the exploded grams
        (F.length("text") - (_WIN_K - 1) - (_WIN_W - 1)).alias("last_start"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, length(text) - {_WIN_K - 1}),"
                f" i -> substring(text, i, {_WIN_K}))"
            )
        ).alias("pos0", "gram"),
    ).select(
        "doc_id",
        "last_start",
        (F.col("pos0") + 1).alias("p"),
        F.conv(F.substring(F.md5("gram"), 1, 10), 16, 10).cast("long").alias("h"),
    )
    keyed = grams.select(
        "doc_id",
        "p",
        "last_start",
        (F.col("h") * _POS_MOD + (F.lit(_POS_MOD - 1) - F.col("p"))).alias("key"),
    )
    w_sel = Window.partitionBy("doc_id").orderBy("p").rowsBetween(0, _WIN_W - 1)
    fps = (
        keyed.withColumn("sel", F.min("key").over(w_sel))
        .filter(F.col("p") <= F.col("last_start"))
        .select("doc_id", F.expr(f"sel div {_POS_MOD}").alias("h"))
        .distinct()
    )
    # cross-doc sharing via ONE window over the hash key instead of a
    # groupBy + self-join: fps is consumed once, so nothing recomputes
    # and nothing needs caching
    w_h = Window.partitionBy("h")
    flagged = fps.withColumn("h_docs", F.count(F.lit(1)).over(w_h))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_fingerprints"),
            F.sum("h").cast("long").alias("fp_checksum"),
            F.count(F.when(F.col("h_docs") > 1, 1)).cast("long").alias("n_shared_fp"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# KV-cache prefix sharing
# --------------------------------------------------------------------------

_PREFIX_LENS = (8, 16, 32, 64)
_CHARS_PER_TOKEN = 4  # the standard rough chars->tokens divisor

_PREFIX_ORACLE = f"""
WITH lens AS (
  SELECT unnest(ARRAY{list(_PREFIX_LENS)}) AS plen
),
bucketed AS (
  SELECT l.plen, substr(d.text, 1, l.plen) AS prefix
  FROM documents d JOIN lens l ON length(d.text) >= l.plen
),
buckets AS (
  SELECT plen, prefix, CAST(count(*) AS BIGINT) AS cnt
  FROM bucketed GROUP BY 1, 2
)
SELECT plen AS prefix_chars,
       CAST(sum(cnt) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_unique_prefixes,
       CAST(count(*) FILTER (WHERE cnt > 1) AS BIGINT) AS n_shared_prefixes,
       CAST(sum(CASE WHEN cnt > 1 THEN (cnt - 1) * plen ELSE 0 END) AS BIGINT)
         AS saved_chars,
       CAST(sum(CASE WHEN cnt > 1 THEN (cnt - 1) * plen ELSE 0 END)
            // {_CHARS_PER_TOKEN} AS BIGINT) AS saved_tokens_est
FROM buckets
GROUP BY plen
ORDER BY plen
"""


@register("corpus_prefix_sharing", oracle=_PREFIX_ORACLE, tags=("llm", "serving"))
def corpus_prefix_sharing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KV-cache prefix-sharing audit: at each candidate prefix length,
    how many documents share an identical prefix — exactly the reuse an
    inference server with prefix caching (vLLM-style) gets, since a
    shared prefix's attention KV blocks are computed once and reused by
    every sibling. Docs fan out over the prefix-length ladder
    {_PREFIX_LENS} (an explode, so ONE shuffle groups all ladder rungs
    by (len, prefix) together), then per rung: distinct prefixes,
    shared buckets, and the exact saved-chars integral
    sum((count-1) * len) with a chars/{_CHARS_PER_TOKEN} token
    estimate. All integers. At 100 TB the group key is (len, 64-char
    prefix) — high cardinality and uniform, and the prefix substring
    (not the document) is all that shuffles; a production variant
    would hash the prefix first to fix the key width, which changes
    nothing in this plan shape."""
    docs = load_table(spark, sf_dir, "documents")
    lens = F.array(*[F.lit(p) for p in _PREFIX_LENS])
    bucketed = (
        docs.select("text", F.explode(lens).alias("plen"))
        .filter(F.length("text") >= F.col("plen"))
        .select("plen", F.expr("substring(text, 1, plen)").alias("prefix"))
    )
    buckets = bucketed.groupBy("plen", "prefix").agg(
        F.count("*").cast("long").alias("cnt")
    )
    saved = F.sum(
        F.when(F.col("cnt") > 1, (F.col("cnt") - 1) * F.col("plen")).otherwise(0)
    ).cast("long")
    return (
        buckets.groupBy(F.col("plen").cast("long").alias("prefix_chars"))
        .agg(
            F.sum("cnt").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_unique_prefixes"),
            F.count(F.when(F.col("cnt") > 1, 1)).cast("long").alias("n_shared_prefixes"),
            saved.alias("saved_chars"),
            F.expr(
                f"CAST(sum(CASE WHEN cnt > 1 THEN (cnt - 1) * plen ELSE 0 END)"
                f" div {_CHARS_PER_TOKEN} AS BIGINT)"
            ).alias("saved_tokens_est"),
        )
        .orderBy("prefix_chars")
    )
