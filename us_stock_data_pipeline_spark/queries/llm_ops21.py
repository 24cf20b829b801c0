"""Round-10 LLM-pipeline additions, part 21: the corpus datasheet —
a one-pass per-source summary table combining the curation metrics a
"datasheets for datasets" card actually reports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.queries.ml_eval_ops import _STOPWORDS, _SW_LIST_SQL
from us_stock_data_pipeline_spark.registry import register

_DATASHEET_ORACLE = f"""
WITH per_doc AS (
  SELECT doc_id, source, lang, n_chars, md5(text) AS h,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
         CAST(len(list_filter(string_split(text, ' '),
                              w -> w IN ({_SW_LIST_SQL}))) AS BIGINT) AS sw
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000 // count(*)
            AS BIGINT) AS en_permille,
       CAST(sum(tok) // count(*) AS BIGINT) AS mean_tokens,
       CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50_chars,
       CAST((count(*) - count(DISTINCT h)) * 1000 // count(*) AS BIGINT)
         AS dup_permille,
       CAST(sum(sw) * 1000 // sum(tok) AS BIGINT) AS stopword_permille
FROM per_doc
GROUP BY source
ORDER BY source
"""


@register("corpus_datasheet", oracle=_DATASHEET_ORACLE, tags=("llm", "agg"))
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus datasheet: the per-source summary card a dataset release
    ships — size, language mix, typical document length, exact-dup
    rate, and stopword density (the crude quality prior) — computed
    in ONE pass over the text: every per-doc metric (token count,
    stopword count via an array filter HOF, md5 content hash) comes
    from a single projection, then one groupBy rolls up the card.
    This is the composite twin of `pipeline_source_scorecard` (which
    rolls up dup/quality decisions); here the metrics are the raw
    datasheet facts, all exact integers or permille floor-divisions.
    Scale shape: no joins at all — the dup rate uses
    count(DISTINCT hash) INSIDE the per-source aggregate rather than
    a self-join, so the shuffle carries (source, hash) pairs and
    counters only, never text."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        "lang",
        "n_chars",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).cast("long").alias("tok"),
        F.size(
            F.filter(
                F.split("text", " "),
                lambda w: w.isin(*_STOPWORDS),
            )
        )
        .cast("long")
        .alias("sw"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.expr(
                "CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000"
                " div count(*) AS BIGINT)"
            ).alias("en_permille"),
            F.expr("CAST(sum(tok) div count(*) AS BIGINT)").alias("mean_tokens"),
            F.expr(
                "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS BIGINT)"
            ).alias("p50_chars"),
            F.expr(
                "CAST((count(*) - count(DISTINCT h)) * 1000 div count(*) AS BIGINT)"
            ).alias("dup_permille"),
            F.expr("CAST(sum(sw) * 1000 div sum(tok) AS BIGINT)").alias(
                "stopword_permille"
            ),
        )
        .orderBy("source")
    )
