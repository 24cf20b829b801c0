"""Round-7 LLM-data additions, part 16: PMI keyword co-occurrence."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

_PMI_TOP_WORDS = 50
_PMI_MIN_COOC = 5
_PMI_TOP_PAIRS = 20

_PMI_ORACLE = f"""
WITH dw AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
ndocs AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
df AS (SELECT w, CAST(count(*) AS BIGINT) AS nd FROM dw GROUP BY w),
top AS (
  SELECT w, nd FROM df ORDER BY nd DESC, w LIMIT {_PMI_TOP_WORDS}
),
filtered AS (
  SELECT dw.doc_id, dw.w, top.nd FROM dw JOIN top ON top.w = dw.w
),
pairs AS (
  SELECT a.w AS w1, b.w AS w2,
         max(a.nd) AS n1, max(b.nd) AS n2,
         CAST(count(*) AS BIGINT) AS n12
  FROM filtered a JOIN filtered b
    ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY a.w, b.w
)
SELECT w1, w2, n1, n2, n12,
       floor(log2(CAST(n12 AS DOUBLE) * ndocs.n / (CAST(n1 AS DOUBLE) * n2))
             * 10000 + 0.5) / 10000 AS pmi
FROM pairs, ndocs
WHERE n12 >= {_PMI_MIN_COOC}
ORDER BY log2(CAST(n12 AS DOUBLE) * ndocs.n / (CAST(n1 AS DOUBLE) * n2)) DESC, w1, w2
LIMIT {_PMI_TOP_PAIRS}
"""


@register("text_pmi_cooccurrence", oracle=_PMI_ORACLE, tags=("llm", "text"))
def text_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over document-level co-occurrence
    of the corpus's top {_PMI_TOP_WORDS} words: which word pairs appear
    together more than their independent frequencies predict — the
    collocation/keyphrase discovery primitive under every
    phrase-mining pipeline (`text_tfidf` scores words alone; PMI
    scores their ASSOCIATION). The pair join is restricted to the
    broadcast top-K vocabulary FIRST, so each doc contributes at most
    C(K,2) pairs — the blowup is K-bounded, never vocabulary- or
    corpus-bounded. All frequencies are exact integers; pmi is one
    log2 of an integer ratio, computed identically on both engines,
    and the top-pairs cut orders by that same exact expression with a
    word tiebreak."""
    docs = load_table(spark, sf_dir, "documents")
    dw = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w")).distinct()
    ndocs = docs.agg(F.countDistinct("doc_id").cast("long").alias("n"))
    df_tab = dw.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("nd"))
    top = df_tab.orderBy(F.col("nd").desc(), "w").limit(_PMI_TOP_WORDS)
    filtered = dw.join(F.broadcast(top), "w")
    a = filtered.select(F.col("doc_id"), F.col("w").alias("w1"), F.col("nd").alias("nd1"))
    b = filtered.select(F.col("doc_id"), F.col("w").alias("w2"), F.col("nd").alias("nd2"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(
            F.max("nd1").alias("n1"),
            F.max("nd2").alias("n2"),
            F.count(F.lit(1)).cast("long").alias("n12"),
        )
        .filter(F.col("n12") >= _PMI_MIN_COOC)
    )
    pmi_exact = F.log2(
        F.col("n12").cast("double") * F.col("n") / (F.col("n1").cast("double") * F.col("n2"))
    )
    return (
        pairs.crossJoin(F.broadcast(ndocs))
        .select(
            "w1",
            "w2",
            "n1",
            "n2",
            "n12",
            (F.floor(pmi_exact * 10000 + F.lit(0.5)) / 10000).alias("pmi"),
            pmi_exact.alias("_ord"),
        )
        .orderBy(F.col("_ord").desc(), "w1", "w2")
        .limit(_PMI_TOP_PAIRS)
        .drop("_ord")
    )
