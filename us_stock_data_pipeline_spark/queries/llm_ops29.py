"""Round-33 LLM ops, part 29: content-defined chunking dedup and
temperature-scaled corpus mixing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.functions import detmath
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Content-defined chunking (CDC) dedup
# --------------------------------------------------------------------------

_CDC_GRAM = 8  # rolling window the boundary test hashes
_CDC_MASK = 31  # boundary when gram-hash % 32 == 0 -> ~32-char chunks

_CDC_ORACLE = f"""
WITH grams AS (
  SELECT d.doc_id, t.p,
         CASE WHEN CAST(('0x' || substring(md5(substr(d.text, t.p, {_CDC_GRAM})), 1, 10))
                     AS BIGINT) % {_CDC_MASK + 1} = 0
              THEN 1 ELSE 0 END AS boundary
  FROM documents d,
       LATERAL unnest(generate_series(1, length(d.text) - {_CDC_GRAM - 1})) AS t(p)
),
chunked AS (
  SELECT doc_id, p,
         coalesce(sum(boundary) OVER (PARTITION BY doc_id ORDER BY p
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
  FROM grams
),
spans AS (
  SELECT doc_id, chunk_id,
         CAST(min(p) AS BIGINT) AS chunk_start,
         CAST(max(p) + {_CDC_GRAM - 1} - min(p) + 1 AS BIGINT) AS chunk_len
  FROM chunked GROUP BY doc_id, chunk_id
),
hashed AS (
  SELECT s.doc_id, s.chunk_id, s.chunk_len,
         md5(substr(d.text, CAST(s.chunk_start AS INT), CAST(s.chunk_len AS INT)))
           AS chunk_hash
  FROM spans s JOIN documents d ON d.doc_id = s.doc_id
),
shared AS (
  SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs FROM hashed GROUP BY chunk_hash
)
SELECT h.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(h.chunk_len) AS BIGINT) AS total_chunk_chars,
       CAST(count(*) FILTER (WHERE s.n_docs > 1) AS BIGINT) AS n_shared_chunks,
       CAST(coalesce(sum(h.chunk_len) FILTER (WHERE s.n_docs > 1), 0) AS BIGINT)
         AS shared_chars
FROM hashed h JOIN shared s ON s.chunk_hash = h.chunk_hash
GROUP BY h.doc_id
ORDER BY h.doc_id
"""


@register("dedup_content_defined_chunking", oracle=_CDC_ORACLE, tags=("llm", "dedup"))
def dedup_content_defined_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the restic/borg/LBFS dedup scheme):
    chunk boundaries fall where a rolling {_CDC_GRAM}-gram hash hits
    0 mod {_CDC_MASK + 1}, so boundaries are a function of CONTENT,
    not position — an insertion shifts at most the chunk it lands in,
    and every identical span downstream re-aligns and dedups (the
    property fixed-size blocks lack, and the byte-level complement to
    winnowing's fingerprint sampling). Chunk ids are a prefix sum of
    boundary flags, chunk text re-extracted by exact (start, len)
    substring and hashed for the cross-doc duplicate audit: per doc,
    how many of its chunks (and chars) also occur elsewhere — the
    storage-dedup savings estimate. Plan: explode -> one doc-keyed
    window for the chunk prefix sum -> span aggregate -> one join
    back for the text (column-pruned to the text column) -> one
    hash-keyed share count; shuffles are on doc_id and chunk_hash,
    both uniform."""
    n_parts = max(8, spark.sparkContext.defaultParallelism // 2)
    docs = load_table(spark, sf_dir, "documents").repartition(n_parts, "doc_id")
    grams = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, length(text) - {_CDC_GRAM - 1}),"
                f" i -> CASE WHEN CAST(conv(substring(md5(substring(text, i, {_CDC_GRAM})), 1, 10), 16, 10) AS BIGINT)"
                f" % {_CDC_MASK + 1} = 0 THEN 1 ELSE 0 END)"
            )
        ).alias("pos0", "boundary"),
    ).select("doc_id", (F.col("pos0") + 1).alias("p"), "boundary")
    w = Window.partitionBy("doc_id").orderBy("p")
    chunked = grams.withColumn(
        "chunk_id",
        F.coalesce(
            F.sum("boundary").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    spans = chunked.groupBy("doc_id", "chunk_id").agg(
        F.min("p").cast("long").alias("chunk_start"),
        (F.max("p") + (_CDC_GRAM - 1) - F.min("p") + 1).cast("long").alias("chunk_len"),
    )
    hashed = spans.join(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    ).select(
        "doc_id",
        "chunk_id",
        "chunk_len",
        F.md5(
            F.expr("substring(text, CAST(chunk_start AS INT), CAST(chunk_len AS INT))")
        ).alias("chunk_hash"),
    )
    w_h = Window.partitionBy("chunk_hash")
    flagged = hashed.withColumn(
        "h_docs", F.size(F.collect_set("doc_id").over(w_h))
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum("chunk_len").cast("long").alias("total_chunk_chars"),
            F.count(F.when(F.col("h_docs") > 1, 1)).cast("long").alias(
                "n_shared_chunks"
            ),
            F.coalesce(
                F.sum(F.when(F.col("h_docs") > 1, F.col("chunk_len"))), F.lit(0)
            )
            .cast("long")
            .alias("shared_chars"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Temperature-scaled corpus mixing
# --------------------------------------------------------------------------

_MIX_ALPHAS_E2 = (30, 70, 100)  # temperature exponents 0.3, 0.7, 1.0

# n^alpha = det_exp(alpha * det_ln(n)) on the libm-free kernels:
# bit-identical doubles in both engines (transcendental audit r9).
_MIX_STAGES = (
    detmath.det_ln_int_stages("n", "tm_ln")
    + [("tm_x", "CAST(alpha_e2 AS DOUBLE) / 100.0 * tm_ln")]
    + detmath.det_exp_stages("tm_x", "tm_p")
)
_MIX_WQ = "CAST(floor(tm_p * 1000000 + 0.5) AS BIGINT)"

_MIX_ORACLE = f"""
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
),
ladder AS (SELECT unnest(ARRAY{list(_MIX_ALPHAS_E2)}) AS alpha_e2),
powered AS (
  SELECT alpha_e2, lang, n, {_MIX_WQ} AS w_q
  FROM {detmath.stages_to_select(_MIX_STAGES,
    "(SELECT l.alpha_e2, c.lang, c.n FROM counts c CROSS JOIN ladder l)")}
)
SELECT alpha_e2, lang, n AS n_docs,
       CAST(w_q * 1000000 // sum(w_q) OVER (PARTITION BY alpha_e2) AS BIGINT)
         AS mix_share_e6
FROM powered
ORDER BY alpha_e2, lang
"""


@register("corpus_temperature_mixing", oracle=_MIX_ORACLE, tags=("llm", "sampling"))
def corpus_temperature_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights p_i ∝ n_i^alpha — the
    multilingual-mixing knob (mBERT/XLM-R exponent sampling): alpha=1
    reproduces the natural distribution, alpha->0 flattens toward
    uniform, and the standard 0.3/0.7 settings re-weight low-resource
    languages up without drowning high-resource ones. n^alpha is
    computed as exp(alpha * ln n) — one identical double expression
    per engine, quantized to a 1e-6 integer BEFORE the normalizing
    sum (a window over the alpha rung), so the shares are exact
    integer ratios of quantized weights. Output: the mixing table a
    sampler consumes, across the alpha ladder so the flattening
    effect is visible in one result. Plan: one groupBy(lang), a
    3-rung fan-out, one window sum — free at any corpus size."""
    counts = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n"))
    )
    ladder = F.array(*[F.lit(a) for a in _MIX_ALPHAS_E2])
    powered = detmath.apply_stages(
        counts.select("lang", "n", F.explode(ladder).alias("alpha_e2")),
        _MIX_STAGES,
    ).selectExpr("alpha_e2", "lang", "n", f"{_MIX_WQ} AS w_q")
    w_a = Window.partitionBy("alpha_e2")
    return powered.select(
        F.col("alpha_e2").cast("long").alias("alpha_e2"),
        "lang",
        F.col("n").alias("n_docs"),
        F.expr("CAST(w_q * 1000000 div sum(w_q) OVER (PARTITION BY alpha_e2) AS BIGINT)").alias(
            "mix_share_e6"
        ),
    ).orderBy("alpha_e2", "lang")
