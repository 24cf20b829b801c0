"""Round-7 LLM-data additions, part 17: leave-one-out kNN label
evaluation and word burstiness dispersion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Leave-one-out kNN label-consistency evaluation (sampled queries)
# --------------------------------------------------------------------------

_KNN_EVAL_K = 5
_KNN_EVAL_SAMPLE_MOD = 10  # vec_id % MOD == 0 -> query set

_KNN_EVAL_ORACLE = f"""
WITH q AS (
  SELECT vec_id, label,
         list_transform(embedding,
           v -> CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT)) AS qv
  FROM embeddings
),
queries AS (SELECT * FROM q WHERE vec_id % {_KNN_EVAL_SAMPLE_MOD} = 0
            AND vec_id < 500),
scored AS (
  SELECT a.vec_id AS qid, a.label AS q_label, b.vec_id AS nid, b.label AS n_label,
         CAST(list_sum(list_transform(generate_series(1, 64),
              d -> a.qv[d] * b.qv[d])) AS DOUBLE)
         / sqrt(CAST(list_sum(list_transform(generate_series(1, 64),
                d -> b.qv[d] * b.qv[d])) AS DOUBLE)) AS sim
  FROM queries a JOIN q b ON b.vec_id <> a.vec_id
),
topk AS (
  SELECT qid, q_label, n_label FROM (
    SELECT qid, q_label, n_label,
           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
    FROM scored) t
  WHERE rn <= {_KNN_EVAL_K}
),
votes AS (
  SELECT qid, q_label, n_label, CAST(count(*) AS BIGINT) AS votes
  FROM topk GROUP BY qid, q_label, n_label
),
winner AS (
  SELECT qid, q_label, n_label AS pred FROM (
    SELECT qid, q_label, n_label,
           row_number() OVER (PARTITION BY qid ORDER BY votes DESC, n_label) AS rn
    FROM votes) t
  WHERE rn = 1
)
SELECT CAST(q_label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(CASE WHEN pred = q_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       floor(CAST(sum(CASE WHEN pred = q_label THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) * 10000 + 0.5) / 10000 AS accuracy
FROM winner
GROUP BY q_label
ORDER BY label
"""


@register("knn_loo_label_eval", oracle=_KNN_EVAL_ORACLE, tags=("llm", "embedding", "eval"))
def knn_loo_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out kNN label consistency: for a deterministic
    fixed-size query sample (vec_id divisible by 10 below id 500 —
    50 queries at every scale factor), find the {_KNN_EVAL_K} nearest neighbors
    (cosine, self excluded), majority-vote their labels, and score
    per-label accuracy — the embedding-quality eval that answers "do
    nearby vectors share labels", which is what retrieval actually
    needs (`embedding_centroid_distance` checks means; this checks
    NEIGHBORHOODS). The query side is a broadcast hash-sample, so the
    corpus streams map-side exactly as in `knn_bruteforce_cosine`;
    dot products are exact quantized-int sums and the neighbor order
    (sim desc, vec_id) plus vote tiebreak (votes desc, label) are
    fully deterministic. At 100 TB the sample bound keeps this a
    fixed-cost eval however big the corpus grows."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = F.transform(
        "embedding", lambda v: F.round(v.cast("double") * 10000).cast("long")
    )
    q = emb.select("vec_id", "label", qv.alias("qv"))
    queries = q.filter(
        (F.col("vec_id") % _KNN_EVAL_SAMPLE_MOD == 0) & (F.col("vec_id") < 500)
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("q_label"),
        F.col("qv").alias("qa"),
    )
    dot = F.aggregate(
        F.zip_with("qa", "qv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    nb_norm2 = F.aggregate(
        F.zip_with("qv", "qv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = (
        F.broadcast(queries)
        .join(q, F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "q_label",
            F.col("vec_id").alias("nid"),
            F.col("label").alias("n_label"),
            (dot.cast("double") / F.sqrt(nb_norm2.cast("double"))).alias("sim"),
        )
    )
    topk = scored.select(
        "qid",
        "q_label",
        "n_label",
        F.row_number()
        .over(Window.partitionBy("qid").orderBy(F.col("sim").desc(), "nid"))
        .alias("rn"),
    ).filter(F.col("rn") <= _KNN_EVAL_K)
    votes = topk.groupBy("qid", "q_label", "n_label").agg(
        F.count(F.lit(1)).cast("long").alias("votes")
    )
    winner = votes.select(
        "qid",
        "q_label",
        F.col("n_label").alias("pred"),
        F.row_number()
        .over(Window.partitionBy("qid").orderBy(F.col("votes").desc(), "n_label"))
        .alias("rn"),
    ).filter(F.col("rn") == 1)
    return (
        winner.groupBy(F.col("q_label").cast("long").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            F.sum(F.when(F.col("pred") == F.col("q_label"), 1).otherwise(0))
            .cast("long")
            .alias("n_correct"),
            (
                F.floor(
                    F.sum(F.when(F.col("pred") == F.col("q_label"), 1).otherwise(0))
                    .cast("double")
                    / F.count(F.lit(1))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("accuracy"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# Word burstiness (variance-to-mean dispersion)
# --------------------------------------------------------------------------

_BURST_TOP = 50
_BURST_VMR = 2.0

_BURST_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
per_doc AS (
  SELECT w, doc_id, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w, doc_id
),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
agg AS (
  SELECT w,
         CAST(sum(c) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS docs_with,
         CAST(sum(c * c) AS BIGINT) AS sq
  FROM per_doc GROUP BY w
),
top AS (SELECT * FROM agg ORDER BY total DESC, w LIMIT {_BURST_TOP})
SELECT w, total, docs_with,
       floor((CAST(sq AS DOUBLE) - CAST(total AS DOUBLE) * total / nd.n)
             / (nd.n - 1)
             / (CAST(total AS DOUBLE) / nd.n) * 10000 + 0.5) / 10000 AS vmr,
       ((CAST(sq AS DOUBLE) - CAST(total AS DOUBLE) * total / nd.n) / (nd.n - 1)
        / (CAST(total AS DOUBLE) / nd.n) > {_BURST_VMR}) AS bursty
FROM top, nd
ORDER BY w
"""


@register("text_burstiness_dispersion", oracle=_BURST_ORACLE, tags=("llm", "text"))
def text_burstiness_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word burstiness via the variance-to-mean ratio of per-document
    counts (zeros included, computed algebraically from Sc and Sc^2
    over the docs that DO contain the word — no zero-filling join):
    VMR near 1 is Poisson scatter (function words), VMR >> 1 means
    the word clumps into few documents (topical words) — the
    dispersion signal keyword extractors and stopword inducers use
    (`text_tfidf` weighs rarity; burstiness weighs CLUMPING, and they
    disagree exactly on interesting words). All sums are exact
    integers from one (word, doc) groupBy; the top-{_BURST_TOP} cut
    orders by exact totals with a word tiebreak."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    nd = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    agg = per_doc.groupBy("w").agg(
        F.sum("c").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("docs_with"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sq"),
    )
    top = agg.orderBy(F.col("total").desc(), "w").limit(_BURST_TOP)
    n = F.col("n").cast("double")
    mean = F.col("total").cast("double") / n
    var = (F.col("sq").cast("double") - F.col("total").cast("double") * F.col("total") / n) / (
        n - 1
    )
    vmr = var / mean
    return (
        top.crossJoin(F.broadcast(nd))
        .select(
            "w",
            "total",
            "docs_with",
            (F.floor(vmr * 10000 + F.lit(0.5)) / 10000).alias("vmr"),
            (vmr > _BURST_VMR).alias("bursty"),
        )
        .orderBy("w")
    )
