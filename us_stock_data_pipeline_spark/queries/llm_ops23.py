"""Round-12 LLM text, part 23: Flesch-style readability scoring."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# Syllable proxy: runs of vowels (incl. y). Crude but deterministic and
# the standard cheap approximation; both engines count regex matches on
# the identical lowercased string.
_FLESCH_ORACLE = """
WITH per_doc AS (
  SELECT source,
         CAST(greatest(len(list_filter(string_split(text, '.'),
                                       s -> trim(s) <> '')), 1) AS BIGINT) AS sentences,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS syllables
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(sentences) AS BIGINT) AS sentences,
       CAST(sum(words) AS BIGINT) AS words,
       CAST(sum(syllables) AS BIGINT) AS syllables,
       floor((206.835
              - 1.015 * (CAST(sum(words) AS DOUBLE) / sum(sentences))
              - 84.6 * (CAST(sum(syllables) AS DOUBLE) / sum(words))) * 100 + 0.5)
         / 100 AS flesch_score
FROM per_doc
GROUP BY source
ORDER BY source
"""


@register("text_readability_flesch", oracle=_FLESCH_ORACLE, tags=("llm", "text"))
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source: 206.835 - 1.015(words/sentence)
    - 84.6(syllables/word), with sentences = non-empty '.'-splits
    (floored at 1) and syllables approximated by vowel-group runs —
    the classic cheap readability screen a curation ladder runs next
    to `text_stats`' length/punctuation ratios (too-hard and too-easy
    text both correlate with low training value). The score is a
    macro aggregate: exact integer counts are summed per source and
    the formula evaluates ONCE per group on those sums — no per-doc
    float averaging to drift between engines. Plan: one scan with
    three counting expressions (split + regexp, all codegen), one
    map-side-combined groupBy; the shuffle carries four counters per
    source."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.greatest(
            F.size(F.filter(F.split("text", "\\."), lambda s: F.trim(s) != "")),
            F.lit(1),
        )
        .cast("long")
        .alias("sentences"),
        F.size(F.split("text", " ")).cast("long").alias("words"),
        F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
        .cast("long")
        .alias("syllables"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("sentences").cast("long").alias("sentences"),
            F.sum("words").cast("long").alias("words"),
            F.sum("syllables").cast("long").alias("syllables"),
        )
        .select(
            "source",
            "n_docs",
            "sentences",
            "words",
            "syllables",
            (
                F.floor(
                    (
                        F.lit(206.835)
                        - 1.015 * (F.col("words").cast("double") / F.col("sentences"))
                        - 84.6 * (F.col("syllables").cast("double") / F.col("words"))
                    )
                    * 100
                    + F.lit(0.5)
                )
                / 100
            ).alias("flesch_score"),
        )
        .orderBy("source")
    )
