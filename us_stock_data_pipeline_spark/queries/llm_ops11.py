"""Round-5 LLM-pipeline operators, part 11: SFT loss-mask span
computation and RLHF preference-pair assembly — the post-curation
training-data construction steps.

House contract: Spark-first plans, identically-aliased DuckDB oracles,
floats rounded identically, deterministic in-query planting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# SFT loss-mask spans
# --------------------------------------------------------------------------

_SFT_ORACLE = """
WITH paired AS (
  SELECT doc_id,
         'Q: ' || substr(text, 1, 40) || ' A: ' AS prompt,
         substr(text, 41, 80) AS completion
  FROM documents
),
spans AS (
  SELECT doc_id,
         length(prompt) AS prompt_chars,
         length(completion) AS completion_chars,
         CAST(len(string_split(prompt, ' ')) AS BIGINT) AS prompt_tokens,
         CAST(len(string_split(completion, ' ')) AS BIGINT) AS completion_tokens
  FROM paired
)
SELECT doc_id,
       prompt_chars, completion_chars,
       prompt_tokens AS mask_start_token,
       prompt_tokens + completion_tokens AS mask_end_token,
       round(completion_tokens * 1.0
             / (prompt_tokens + completion_tokens), 4) AS loss_fraction
FROM spans
ORDER BY doc_id
"""


@register("sft_loss_mask_spans", oracle=_SFT_ORACLE, tags=("llm", "assembly", "sft"))
def sft_loss_mask_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT loss-mask span computation: each (prompt, completion) pair
    — derived deterministically from the fixture text — yields the
    token span [mask_start, mask_end) where the training loss applies
    (completion-only loss masks the prompt tokens), plus the loss
    fraction that tells you how much of each packed sequence actually
    trains. This runs AFTER packing decisions need it, so it must be
    cheap: pure string/length arithmetic in JVM codegen, map-side,
    zero shuffle except output ordering — at 100 TB the mask spans are
    computed on the fly during shard writing, never materialized as a
    separate pass. Composes directly with `pack_token_budget` (spans
    offset by each doc's position in the packed sequence) and
    `doc_chunking`."""
    docs = load_table(spark, sf_dir, "documents")
    paired = docs.select(
        "doc_id",
        F.concat(F.lit("Q: "), F.substring("text", 1, 40), F.lit(" A: ")).alias(
            "prompt"
        ),
        F.substring("text", 41, 80).alias("completion"),
    )
    pt = F.size(F.split("prompt", " ")).cast("long")
    ct = F.size(F.split("completion", " ")).cast("long")
    return paired.select(
        "doc_id",
        F.length("prompt").alias("prompt_chars"),
        F.length("completion").alias("completion_chars"),
        pt.alias("mask_start_token"),
        (pt + ct).alias("mask_end_token"),
        F.round(ct * 1.0 / (pt + ct), 4).alias("loss_fraction"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# RLHF preference-pair assembly
# --------------------------------------------------------------------------

_PREF_ORACLE = """
WITH scored AS (
  SELECT doc_id, source,
         round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')), 6) AS quality
  FROM documents
),
ranked AS (
  SELECT doc_id, source, quality,
         row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id)
           AS rn_best,
         row_number() OVER (PARTITION BY source ORDER BY quality ASC, doc_id)
           AS rn_worst
  FROM scored
)
SELECT b.source,
       b.doc_id AS chosen_doc_id,
       w.doc_id AS rejected_doc_id,
       b.quality AS chosen_quality,
       w.quality AS rejected_quality,
       round(b.quality - w.quality, 6) AS margin
FROM (SELECT * FROM ranked WHERE rn_best <= 3) b
JOIN (SELECT * FROM ranked WHERE rn_worst <= 3) w
  ON w.source = b.source AND w.rn_worst = b.rn_best
WHERE b.doc_id != w.doc_id
ORDER BY b.source, b.doc_id
"""


@register("rlhf_preference_pairs", oracle=_PREF_ORACLE, tags=("llm", "assembly", "rlhf"))
def rlhf_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLHF/DPO preference-pair assembly: within each source, pair the
    top-3 documents by quality score (type-token ratio as the stand-in
    reward) against the bottom-3, matched by rank — (chosen, rejected,
    margin) triples ready for a preference-loss trainer. Both rankings
    come from TWO row_number windows over the SAME source partitioning
    (one exchange, two sort orders), the pair join matches rank-to-rank
    within source (equi-join on broadcast-sized per-source top/bottom
    slices — WindowGroupLimit prunes below the shuffle), and the margin
    guards against degenerate pairs where chosen == rejected. At
    100 TB the slices are k rows per source regardless of corpus
    size."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    ws = F.split("text", " ")
    quality = F.round(
        F.size(F.array_distinct(ws)).cast("double") / F.size(ws), 6
    )
    scored = docs.select("doc_id", "source", quality.alias("quality"))
    w_src = W.partitionBy("source")
    ranked = scored.select(
        "doc_id",
        "source",
        "quality",
        F.row_number().over(w_src.orderBy(F.desc("quality"), "doc_id")).alias("rn_best"),
        F.row_number().over(w_src.orderBy(F.asc("quality"), "doc_id")).alias("rn_worst"),
    )
    best = ranked.filter(F.col("rn_best") <= 3).select(
        "source",
        F.col("doc_id").alias("chosen_doc_id"),
        F.col("quality").alias("chosen_quality"),
        F.col("rn_best").alias("rnk"),
    )
    worst = ranked.filter(F.col("rn_worst") <= 3).select(
        "source",
        F.col("doc_id").alias("rejected_doc_id"),
        F.col("quality").alias("rejected_quality"),
        F.col("rn_worst").alias("rnk"),
    )
    return (
        best.join(worst, ["source", "rnk"])
        .filter(F.col("chosen_doc_id") != F.col("rejected_doc_id"))
        .select(
            "source",
            "chosen_doc_id",
            "rejected_doc_id",
            "chosen_quality",
            "rejected_quality",
            F.round(F.col("chosen_quality") - F.col("rejected_quality"), 6).alias(
                "margin"
            ),
        )
        .orderBy("source", "chosen_doc_id")
    )
