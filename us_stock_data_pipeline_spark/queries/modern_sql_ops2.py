"""Round-6 modern-SQL surface, part 2: correlated LATERAL subquery
(per-row dependent top-N) — the decorrelation test — and two tokenizer/
corpus text operators that round out the BPE training loop and
boilerplate detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table, register_views
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Correlated LATERAL top-N per key
# --------------------------------------------------------------------------

_LATERAL_SPARK_SQL = """
SELECT n.n_name,
       t.c_name,
       t.bal_cents
FROM nation n,
     LATERAL (
       SELECT c.c_name,
              CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_cents
       FROM customer c
       WHERE c.c_nationkey = n.n_nationkey
       ORDER BY c.c_acctbal DESC, c.c_custkey
       LIMIT 3
     ) t
ORDER BY n.n_name, t.bal_cents DESC, t.c_name
"""

_LATERAL_ORACLE = """
SELECT n.n_name,
       t.c_name,
       t.bal_cents
FROM nation n,
     LATERAL (
       SELECT c.c_name,
              CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_cents
       FROM customer c
       WHERE c.c_nationkey = n.n_nationkey
       ORDER BY c.c_acctbal DESC, c.c_custkey
       LIMIT 3
     ) t
ORDER BY n.n_name, t.bal_cents DESC, t.c_name
"""


@register("sql_lateral_topn", oracle=_LATERAL_ORACLE, tags=("sql", "join", "topk"))
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — top-3 customers by balance PER
    nation, written as the dependent-join SQL users actually type
    (Spark 3.4+ lateral correlation). The interesting part is what the
    optimizer must do with it: a naive execution re-runs the subquery
    per outer row; Catalyst decorrelates to a ranked window / aggregated
    join, so the plan stays one scan of each side regardless of outer
    cardinality — the `window_rank_topn` physical shape reached from
    MUCH more natural SQL. Identical text runs on DuckDB, making this
    simultaneously a dialect-portability check."""
    register_views(spark, sf_dir, ("nation", "customer"))
    return spark.sql(_LATERAL_SPARK_SQL)


# --------------------------------------------------------------------------
# Boilerplate span detection (span-level dedup)
# --------------------------------------------------------------------------

_SPAN_LEN = 30
_SPAN_STRIDE = 15
_SPAN_TOPN = 25

_SPANS_ORACLE = f"""
WITH spans AS (
  SELECT doc_id,
         substr(text, (gs.i - 1) * {_SPAN_STRIDE} + 1, {_SPAN_LEN}) AS span
  FROM documents,
       LATERAL (
         SELECT unnest(range(1, CAST(floor((len(text) - {_SPAN_LEN})
                   / {_SPAN_STRIDE}) AS BIGINT) + 2)) AS i
       ) gs
  WHERE len(text) >= {_SPAN_LEN}
),
counted AS (
  SELECT span,
         CAST(count(*) AS BIGINT) AS n_occurrences,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM spans
  GROUP BY span
)
SELECT span, n_occurrences, n_docs
FROM counted
ORDER BY n_occurrences DESC, span
LIMIT {_SPAN_TOPN}
"""


@register("text_boilerplate_spans", oracle=_SPANS_ORACLE, tags=("llm", "text", "dedup"))
def text_boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level duplicate detection: slide a 30-char window at
    15-char stride over every document and surface the most-repeated
    exact spans with their document reach — the boilerplate/template
    detector that doc-LEVEL dedup (`dedup_exact`, MinHash) cannot see,
    and step 0 of line/span-removal curation (the CCNet/RefinedWeb
    paragraph-dedup shape at a finer grain). Plan: the span explosion
    is a map-side sequence + substring (JVM codegen, ~len/stride rows
    per doc), one groupBy on the span key, TakeOrdered for the top-N —
    no sort of the full span table; at 100 TB the groupBy key would be
    a span HASH with the literal span resolved only for the tiny
    top-N (same trick, one more join)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= _SPAN_LEN
    )
    n_spans = F.floor(
        (F.length("text") - _SPAN_LEN) / F.lit(_SPAN_STRIDE)
    ).cast("long") + 1
    spans = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), n_spans)).alias("i"),
        F.col("text"),
    ).select(
        "doc_id",
        F.substring(
            F.col("text"), (F.col("i") - 1) * _SPAN_STRIDE + 1, _SPAN_LEN
        ).alias("span"),
    )
    return (
        spans.groupBy("span")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), "span")
        .limit(_SPAN_TOPN)
    )


# --------------------------------------------------------------------------
# One full BPE training step (count -> pick merge -> apply -> recount)
# --------------------------------------------------------------------------

_BPE_TOPN = 15

_BPE_STEP_ORACLE = f"""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
pairs0 AS (
  SELECT substr(w, gs.i, 2) AS pair, CAST(count(*) AS BIGINT) AS cnt
  FROM words, LATERAL (SELECT unnest(range(1, len(w))) AS i) gs
  WHERE len(w) >= 2
  GROUP BY substr(w, gs.i, 2)
),
best AS (
  SELECT pair FROM pairs0 ORDER BY cnt DESC, pair LIMIT 1
),
merged AS (
  -- apply the merge: every occurrence of the winning pair fuses into
  -- one symbol (rendered uppercase so the new symbol is distinct)
  SELECT replace(w, best.pair, upper(best.pair)) AS w
  FROM words, best
),
pairs1 AS (
  SELECT substr(w, gs.i, 2) AS pair, CAST(count(*) AS BIGINT) AS cnt
  FROM merged, LATERAL (SELECT unnest(range(1, len(w))) AS i) gs
  WHERE len(w) >= 2
  GROUP BY substr(w, gs.i, 2)
)
SELECT pair, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rnk
FROM pairs1
ORDER BY rnk
LIMIT {_BPE_TOPN}
"""


@register("bpe_merge_step", oracle=_BPE_STEP_ORACLE, tags=("llm", "tokenizer"))
def bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One complete BPE training iteration: count adjacent pairs
    (`bpe_pair_counts` is the standalone counter), pick the argmax
    merge with deterministic tie-break, APPLY it corpus-wide (the
    winning bigram fuses into a new symbol), and emit the next
    iteration's top pair table — the loop body that, iterated V times,
    IS tokenizer training. The merge winner is a 1-row broadcast; the
    apply step is a map-side string replace in JVM codegen (no UDF);
    each recount is the same explode + groupBy. At 100 TB the words
    table would be pre-aggregated to (word, count) once — Zipf
    compression makes every later pass vocabulary-sized, which is how
    production BPE trainers (and this plan) stay corpus-scale-free
    after pass one."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("w"))

    def pair_counts(wdf: DataFrame) -> DataFrame:
        return (
            wdf.filter(F.length("w") >= 2)
            .select(
                F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
                "w",
            )
            .select(F.substring(F.col("w"), F.col("i"), 2).alias("pair"))
            .groupBy("pair")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )

    best = (
        pair_counts(words)
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(1)
        .select("pair")
    )
    merged = words.crossJoin(F.broadcast(best)).select(
        F.replace(F.col("w"), F.col("pair"), F.upper(F.col("pair"))).alias("w")
    )
    return (
        pair_counts(merged)
        .withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.col("cnt").desc(), "pair")).cast("long"),
        )
        .orderBy("rnk")
        .limit(_BPE_TOPN)
    )
