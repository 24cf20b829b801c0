"""LLM-data-pipeline operators, part 3: the dataset-assembly stage.

After filtering and dedup (llm_ops / llm_ops2), a training-data pipeline
must still (a) split the corpus deterministically into train/val/test,
(b) chunk long documents into model-context-sized windows, and (c) batch
chunks under a token budget. All three are declared as pure DataFrame
ops — content-hash arithmetic, sequence()+explode, window cumsums — so
they scale as ordinary shuffles, with no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Deterministic train/val/test split
# --------------------------------------------------------------------------


@register(
    "split_train_val_test",
    oracle="""
WITH assigned AS (
  SELECT
    lang,
    CASE
      WHEN ('0x' || substr(md5(text), 1, 4))::UBIGINT % 100 < 80 THEN 'train'
      WHEN ('0x' || substr(md5(text), 1, 4))::UBIGINT % 100 < 90 THEN 'val'
      ELSE 'test'
    END AS split
  FROM documents
)
SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs
FROM assigned
GROUP BY lang, split
ORDER BY lang, split
""",
    tags=("llm", "split"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash train/val/test split (80/10/10): the
    split is a pure function of the document text (md5 prefix mod 100), so
    it is reproducible across runs, engines, and re-shards — the property
    that matters for a training corpus: a document can never migrate
    between train and test when the pipeline re-runs on appended data.
    Keying on CONTENT (not doc_id) also keeps exact duplicates in the same
    split, so dedup-survivor choice can't leak test text into train. Zero
    shuffles for assignment; one small shuffle for the audit counts."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5("text"), 1, 4), 16, 10).cast("long") % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    ).alias("split")
    return (
        docs.select("lang", split)
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "split")
    )


# --------------------------------------------------------------------------
# Context-window chunking with overlap
# --------------------------------------------------------------------------

_CHUNK = 64  # tokens per chunk
_STRIDE = 48  # overlap = _CHUNK - _STRIDE = 16 tokens


@register(
    "doc_chunking",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents
),
s AS (
  SELECT doc_id, toks,
         unnest(toks)                   AS _tok,
         generate_subscripts(toks, 1)   AS i
  FROM t
)
SELECT
  doc_id,
  CAST((i - 1) / {_STRIDE} AS BIGINT)                          AS chunk_idx,
  array_to_string(list_slice(toks, i, i + {_CHUNK} - 1), ' ')  AS chunk_text,
  CAST(len(list_slice(toks, i, i + {_CHUNK} - 1)) AS BIGINT)   AS n_tokens
FROM s
WHERE (i - 1) % {_STRIDE} = 0
ORDER BY doc_id, chunk_idx
""",
    tags=("llm", "chunk"),
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking with overlap: split each document's token
    stream into 64-token chunks every 48 tokens (16-token overlap), the
    standard pre-tokenization shape for training-sequence or embedding
    pipelines. Chunk starts come from sequence() and the chunk itself from
    slice() on the one split() array — explode multiplies rows inside the
    stage (no shuffle), and chunk count scales with corpus token count,
    not document count. The final tail chunk is allowed to be short on
    both engines (slice clamps at the array end)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(1), F.size("toks"), F.lit(_STRIDE))).alias("i"),
        )
        .select(
            "doc_id",
            ((F.col("i") - 1) / _STRIDE).cast("long").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(F.col("toks"), F.col("i"), _CHUNK)).alias("chunk_text"),
            F.size(F.slice(F.col("toks"), F.col("i"), _CHUNK)).cast("long").alias("n_tokens"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


# --------------------------------------------------------------------------
# Token-budget packing
# --------------------------------------------------------------------------

_BUDGET = 2048  # tokens per bin


@register(
    "pack_token_budget",
    oracle=f"""
WITH d AS (
  SELECT
    source,
    doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
c AS (
  SELECT *,
         sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
)
SELECT
  source,
  CAST(floor((cum - n_tok) / {_BUDGET}.0) AS BIGINT) AS bin_id,
  CAST(count(*) AS BIGINT)                           AS n_docs,
  CAST(sum(n_tok) AS BIGINT)                         AS bin_tokens
FROM c
GROUP BY source, bin_id
ORDER BY source, bin_id
""",
    tags=("llm", "pack"),
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing: assign documents (in deterministic doc_id
    order per source) to ~2048-token bins by binning each doc's START
    offset in the running token stream — the offset-based relaxation of
    greedy first-fit. Greedy packing with per-bin reset is inherently
    sequential and not window-expressible; offset binning gives the same
    bins except a doc straddling a boundary joins the earlier bin
    (bounded overflow of one doc), which is the standard trade for a
    fully parallel, shuffle-once formulation: one window cumsum per
    source partition, then a group-by. Bin population is auditable
    downstream (bin_tokens vs budget)."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    return (
        d.withColumn("cum", F.sum("n_tok").over(w))
        .select(
            "source",
            F.floor((F.col("cum") - F.col("n_tok")) / float(_BUDGET)).alias("bin_id"),
            "n_tok",
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("bin_tokens"),
        )
        .orderBy("source", "bin_id")
    )
