"""Round-7 LLM-data additions, part 18: source similarity matrix and
quantization-error sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Source-to-source TF cosine similarity matrix
# --------------------------------------------------------------------------

_SRCSIM_ORACLE = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
tf AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY source, w
),
norms AS (
  SELECT source, CAST(sum(c * c) AS BIGINT) AS n2 FROM tf GROUP BY source
),
dots AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(sum(a.c * b.c) AS BIGINT) AS dot
  FROM tf a JOIN tf b ON a.w = b.w AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT d.src_a, d.src_b, d.dot,
       floor(CAST(d.dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE))
             / sqrt(CAST(nb.n2 AS DOUBLE)) * 10000 + 0.5) / 10000 AS cosine
FROM dots d
JOIN norms na ON na.source = d.src_a
JOIN norms nb ON nb.source = d.src_b
ORDER BY d.src_a, d.src_b
"""


@register("text_source_similarity_matrix", oracle=_SRCSIM_ORACLE, tags=("llm", "text"))
def text_source_similarity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-to-source cosine similarity over term-frequency vectors:
    which ingest sources are near-copies of each other — the
    redundancy map that tells a mixture designer two feeds are the
    same crawl in different clothes (`corpus_js_divergence` compares
    each source to the GLOBAL distribution; this compares sources
    PAIRWISE). The sparse dot products come from one inner join on
    the term key — only co-occurring terms ever pair, so the work is
    sum-of-posting-list-intersections, never |V| x sources^2 — and
    all dots/norms are exact integers with one terminal cosine
    division. Output is sources^2/2 rows: tiny forever."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    norms = tf.groupBy("source").agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("n2")
    )
    a = tf.select(F.col("source").alias("src_a"), "w", F.col("c").alias("ca"))
    b = tf.select(F.col("source").alias("src_b"), "w", F.col("c").alias("cb"))
    dots = (
        a.join(b, "w")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("dot"))
    )
    na = norms.select(F.col("source").alias("src_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("source").alias("src_b"), F.col("n2").alias("nb2"))
    return (
        dots.join(F.broadcast(na), "src_a")
        .join(F.broadcast(nb), "src_b")
        .select(
            "src_a",
            "src_b",
            "dot",
            (
                F.floor(
                    F.col("dot").cast("double")
                    / F.sqrt(F.col("na2").cast("double"))
                    / F.sqrt(F.col("nb2").cast("double"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("cosine"),
        )
        .orderBy("src_a", "src_b")
    )


# --------------------------------------------------------------------------
# Quantization-error sweep (int4 vs int8 reconstruction MSE)
# --------------------------------------------------------------------------

_QSWEEP_BITS = ((4, 7), (8, 127))  # (bits, scale = 2^(bits-1) - 1)

_QSWEEP_ORACLE = f"""
WITH v4 AS (
  SELECT unnest(list_transform(embedding,
           v -> CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT))) AS v
  FROM embeddings
),
errs AS (
  SELECT b.bits, b.scale,
         v4.v * b.scale
           - CAST(round(CAST(v4.v * b.scale AS DOUBLE) / 10000) AS BIGINT) * 10000
           AS err_units
  FROM v4, (VALUES (4, 7), (8, 127)) b(bits, scale)
)
SELECT CAST(bits AS BIGINT) AS bits, CAST(scale AS BIGINT) AS scale,
       CAST(count(*) AS BIGINT) AS n_vals,
       CAST(max(abs(err_units)) AS BIGINT) AS max_err_units,
       floor(CAST(sum(err_units * err_units) AS DOUBLE) / count(*)
             / (100000000.0 * scale * scale) * 100000000 + 0.5) / 100000000
         AS mse
FROM errs
GROUP BY bits, scale
ORDER BY bits
"""


@register("embedding_quantization_sweep", oracle=_QSWEEP_ORACLE, tags=("llm", "embedding"))
def embedding_quantization_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization-error sweep: reconstruction MSE and worst-case
    error of symmetric int4 vs int8 quantization over every embedding
    component — the accuracy-vs-footprint table that decides which
    width an ANN index ships with (`embedding_quantize_int8` audits
    one width end-to-end; this SWEEPS widths). Errors are computed in
    exact integer units of 1/(10^4*scale): err = v4*s - round(v4*s/10^4)*10^4,
    so the squared-error sums are exact int64 on both engines and
    only the final MSE normalization is floating point. Pure
    map-side explode over (components x 2 widths), one 2-row agg."""
    emb = load_table(spark, sf_dir, "embeddings")
    v4 = emb.select(
        F.explode(
            F.transform(
                "embedding", lambda v: F.round(v.cast("double") * 10000).cast("long")
            )
        ).alias("v")
    )
    widths = F.explode(
        F.array(
            *[
                F.struct(F.lit(b).alias("bits"), F.lit(s).alias("scale"))
                for b, s in _QSWEEP_BITS
            ]
        )
    )
    errs = v4.select("v", widths.alias("w")).select(
        F.col("w.bits").alias("bits"),
        F.col("w.scale").alias("scale"),
        (
            F.col("v") * F.col("w.scale")
            - F.round((F.col("v") * F.col("w.scale")).cast("double") / 10000).cast(
                "long"
            )
            * 10000
        ).alias("err_units"),
    )
    return (
        errs.groupBy("bits", "scale")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vals"),
            F.max(F.abs("err_units")).cast("long").alias("max_err_units"),
            (
                F.floor(
                    F.sum(F.col("err_units") * F.col("err_units")).cast("double")
                    / F.count(F.lit(1))
                    / (F.lit(100000000.0) * F.col("scale") * F.col("scale"))
                    * 100000000
                    + F.lit(0.5)
                )
                / 100000000
            ).alias("mse"),
        )
        .select(
            F.col("bits").cast("long").alias("bits"),
            F.col("scale").cast("long").alias("scale"),
            "n_vals",
            "max_err_units",
            "mse",
        )
        .orderBy("bits")
    )
