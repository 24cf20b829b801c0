"""Round-7 LLM-data additions, part 16: PMI keyword co-occurrence."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.functions import detmath
from us_stock_data_pipeline_spark.registry import register

_PMI_TOP_WORDS = 50
_PMI_MIN_COOC = 5
_PMI_TOP_PAIRS = 20

# pmi = log2(n12 * n / (n1 * n2)) with every count an exact BIGINT: the
# ratio log runs on the libm-free det_ln kernel (bit-identical doubles in
# both engines — transcendental audit r9 discipline) divided by LN2.
_PMI_STAGES = detmath.det_ln_ratio_stages("n12 * n", "n1 * n2", "pmi_lr")
_PMI_EXACT = f"(pmi_lr / {detmath.LN2})"

_PMI_ORACLE = f"""
WITH dw AS (
  -- per-doc distinct words, map-side in the Spark plan (array_distinct
  -- before the explode) — identical set to DISTINCT (doc_id, w)
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
),
scored AS (
  SELECT w1, w2, n1, n2, n12, {_PMI_EXACT} AS pmi_x
  FROM {detmath.stages_to_select(_PMI_STAGES,
    f"(SELECT p.*, ndocs.n FROM pairs p, ndocs WHERE p.n12 >= {_PMI_MIN_COOC})")}
)
SELECT w1, w2, n1, n2, n12,
       floor(pmi_x * 10000 + 0.5) / 10000 AS pmi
FROM scored
ORDER BY pmi_x DESC, w1, w2
LIMIT {_PMI_TOP_PAIRS}
"""


@register("text_pmi_cooccurrence", oracle=_PMI_ORACLE, tags=("llm", "text"))
def text_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over document-level co-occurrence
    of the corpus's top {_PMI_TOP_WORDS} words: which word pairs appear
    together more than their independent frequencies predict — the
    collocation/keyphrase discovery primitive under every
    phrase-mining pipeline (`text_tfidf` scores words alone; PMI
    scores their ASSOCIATION). Per-doc word dedup happens MAP-SIDE
    (array_distinct before the explode), so the old global
    DISTINCT-shuffle of the full (doc, word) set is gone — the only
    full-width shuffle left is the document-frequency groupBy, and the
    tokenize pass is persisted so the top-K filter pass reuses it
    (r9 scale fix: the 2.76x 10x-tail was that distinct). The pair
    join is restricted to the broadcast top-K vocabulary, so each doc
    contributes at most C(K,2) pairs — K-bounded, never vocabulary- or
    corpus-bounded. All frequencies are exact integers; pmi is the
    libm-free det_ln of an integer ratio, and the top-pairs cut orders
    by that same exact expression with a word tiebreak."""
    docs = load_table(spark, sf_dir, "documents")
    dw = registry.track_persist(
        docs.select(
            "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w")
        )
    )
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
    scored = detmath.apply_stages(
        pairs.crossJoin(F.broadcast(ndocs)), _PMI_STAGES
    ).selectExpr("w1", "w2", "n1", "n2", "n12", f"{_PMI_EXACT} AS pmi_x")
    return (
        scored.select(
            "w1",
            "w2",
            "n1",
            "n2",
            "n12",
            (F.floor(F.col("pmi_x") * 10000 + F.lit(0.5)) / 10000).alias("pmi"),
            F.col("pmi_x").alias("_ord"),
        )
        .orderBy(F.col("_ord").desc(), "w1", "w2")
        .limit(_PMI_TOP_PAIRS)
        .drop("_ord")
    )
