"""Round-8 ML-evaluation operators: average precision (PR-AUC) and
NDCG@K grading quantized retrieval against exact retrieval.

Both metrics quantize their per-rank fractional terms to integer
parts-per-billion BEFORE summing, so the accumulation is exact BIGINT
math on both engines and no float-summation-order divergence is
possible — the same discipline as `ml_auc_roc`'s 2x-integer midranks.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.queries.ml_eval_ops import _SCORED_SQL, _scored
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Average precision (area under the precision-recall curve)
# --------------------------------------------------------------------------

_PPB = 1_000_000_000

_PR_AUC_ORACLE = f"""
WITH {_SCORED_SQL},
ranked AS (
  SELECT y,
         row_number() OVER (ORDER BY score_milli DESC, doc_id) AS rnk,
         sum(y) OVER (ORDER BY score_milli DESC, doc_id
                      ROWS UNBOUNDED PRECEDING) AS cum_pos
  FROM scored
),
terms AS (
  SELECT CAST(sum(CASE WHEN y = 1 THEN cum_pos * {_PPB} // rnk ELSE 0 END)
              AS BIGINT) AS ap_ppb,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(count(*) AS BIGINT) AS n_total
  FROM ranked
)
SELECT n_pos, n_total,
       floor(CAST(n_pos AS DOUBLE) / n_total * 1000000 + 0.5) / 1000000
         AS prevalence,
       floor(CAST(ap_ppb AS DOUBLE) / n_pos / {_PPB} * 1000000 + 0.5) / 1000000
         AS avg_precision
FROM terms
"""


@register("ml_pr_auc", oracle=_PR_AUC_ORACLE, tags=("ml", "eval"))
def ml_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (the exact area under the precision-recall
    curve) for the stopword-rate English classifier — the metric that,
    unlike `ml_auc_roc`, collapses toward the prevalence baseline when
    positives are rare, which is why retrieval and rare-event pipelines
    quote it. AP = mean over positives of precision@k at each positive's
    rank; ranks are a deterministic (score desc, doc_id) row_number so
    both engines agree on ties, and each precision term cum_pos/k is
    floor-quantized to integer parts-per-billion before summation —
    the sum is exact BIGINT, immune to float ordering, with one final
    division. Plan: one tokenize+groupBy pass for scores, one global
    rank (value-support compressed at 100 TB, as `ml_auc_roc`), one
    conditional sum."""
    scored = _scored(spark, sf_dir)
    w = Window.orderBy(F.col("score_milli").desc(), "doc_id")
    ranked = scored.select(
        "y",
        F.row_number().over(w).alias("rnk"),
        F.sum("y").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_pos"),
    )
    terms = ranked.agg(
        F.sum(
            F.when(
                F.col("y") == 1,
                F.expr(f"cum_pos * {_PPB} div rnk"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("ap_ppb"),
        F.sum("y").cast("long").alias("n_pos"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
    )
    return terms.select(
        "n_pos",
        "n_total",
        (
            F.floor(F.col("n_pos").cast("double") / F.col("n_total") * 1000000 + F.lit(0.5))
            / 1000000
        ).alias("prevalence"),
        (
            F.floor(
                F.col("ap_ppb").cast("double") / F.col("n_pos") / _PPB * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("avg_precision"),
    )


# --------------------------------------------------------------------------
# NDCG@K: quantized retrieval graded against exact retrieval
# --------------------------------------------------------------------------

_NDCG_K = 10
_NDCG_NQ = 10  # queries: vec_id < 10
_QSCALE = 200  # int8-range quantizer: round(x * 200), |x| < 0.6

_NDCG_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id < {_NDCG_NQ}
),
exact AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(
                      list_transform(q.qe, x -> CAST(x AS DOUBLE)),
                      list_transform(e.embedding, x -> CAST(x AS DOUBLE))) DESC,
                    e.vec_id) AS exact_rnk
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
),
rel AS (
  SELECT query_id, neighbor_id, CAST(4 - exact_rnk AS BIGINT) AS rel
  FROM exact WHERE exact_rnk <= 3
),
quant AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * {_QSCALE} + 0.5)
                                  AS BIGINT)) AS qv
  FROM embeddings
),
system AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(
                      list_transform(qq.qv, x -> CAST(x AS DOUBLE)),
                      list_transform(e.qv, x -> CAST(x AS DOUBLE))) DESC,
                    e.vec_id) AS sys_rnk
  FROM q
  JOIN quant qq ON qq.vec_id = q.query_id
  JOIN quant e ON e.vec_id <> q.query_id
),
topk AS (
  SELECT s.query_id, s.sys_rnk, coalesce(r.rel, 0) AS rel
  FROM system s
  LEFT JOIN rel r ON r.query_id = s.query_id AND r.neighbor_id = s.neighbor_id
  WHERE s.sys_rnk <= {_NDCG_K}
),
dcg AS (
  SELECT query_id,
         CAST(sum(CAST(floor(rel * {_PPB} / log2(sys_rnk + 1.0)) AS BIGINT))
              AS BIGINT) AS dcg_ppb,
         CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
  FROM topk GROUP BY query_id
),
ideal AS (
  SELECT CAST(floor(3.0 * {_PPB} / log2(2.0)) AS BIGINT)
       + CAST(floor(2.0 * {_PPB} / log2(3.0)) AS BIGINT)
       + CAST(floor(1.0 * {_PPB} / log2(4.0)) AS BIGINT) AS idcg_ppb
)
SELECT d.query_id, d.n_hits,
       floor(CAST(d.dcg_ppb AS DOUBLE) / i.idcg_ppb * 1000000 + 0.5) / 1000000
         AS ndcg
FROM dcg d CROSS JOIN ideal i
ORDER BY d.query_id
"""


@register("ml_ndcg_quantized", oracle=_NDCG_ORACLE, tags=("ml", "eval", "similarity"))
def ml_ndcg_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{_NDCG_K} grading int8-range-quantized retrieval against
    exact float retrieval — the ranking-quality lens on what
    `embedding_quantize_int8` measures as reconstruction error and
    `embedding_matryoshka_recall` measures as set recall: does the
    cheap index ORDER the right neighbors first, with graded credit
    (exact top-3 get relevance 3/2/1) and log-rank discounting. Both
    rankings are deterministic (cosine desc, vec_id tiebreak); each
    DCG term rel/log2(rank+1) is floor-quantized to integer ppb before
    summing so the accumulation is exact; IDCG is the closed-form
    constant for the fixed {{3,2,1}} relevance multiset. Plan shape is
    `knn_bruteforce_cosine` twice (queries broadcast, corpus never
    shuffles) plus a broadcast top-k join — at 100 TB the quantized
    pass would read the int8 column (4x less I/O), which is the point
    of the audit."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _NDCG_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def _norm(a):
        return F.sqrt(
            F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
        )

    cos_exact = _dot(F.col("qe"), F.col("embedding")) / (
        _norm(F.col("qe")) * _norm(F.col("embedding"))
    )
    exact = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    cos_exact.desc(), F.col("vec_id")
                )
            )
            .alias("exact_rnk"),
        )
    )
    rel = exact.filter(F.col("exact_rnk") <= 3).select(
        "query_id", "neighbor_id", (F.lit(4) - F.col("exact_rnk")).cast("long").alias("rel")
    )
    quant = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * _QSCALE + F.lit(0.5)).cast("long"),
        ).alias("qv"),
    )
    qq = quant.filter(F.col("vec_id") < _NDCG_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv")
    )
    cos_quant = _dot(F.col("qqv"), F.col("qv")) / (
        _norm(F.col("qqv")) * _norm(F.col("qv"))
    )
    system = (
        F.broadcast(qq)
        .join(quant, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    cos_quant.desc(), F.col("vec_id")
                )
            )
            .alias("sys_rnk"),
        )
        .filter(F.col("sys_rnk") <= _NDCG_K)
    )
    topk = system.join(F.broadcast(rel), ["query_id", "neighbor_id"], "left").select(
        "query_id",
        "sys_rnk",
        F.coalesce(F.col("rel"), F.lit(0)).alias("rel"),
    )
    idcg_ppb = (
        math.floor(3.0 * _PPB / math.log2(2.0))
        + math.floor(2.0 * _PPB / math.log2(3.0))
        + math.floor(1.0 * _PPB / math.log2(4.0))
    )
    dcg = topk.groupBy("query_id").agg(
        F.sum(
            F.floor(F.col("rel") * _PPB / F.log2(F.col("sys_rnk") + F.lit(1.0))).cast(
                "long"
            )
        )
        .cast("long")
        .alias("dcg_ppb"),
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).cast("long").alias("n_hits"),
    )
    return dcg.select(
        "query_id",
        "n_hits",
        (
            F.floor(F.col("dcg_ppb").cast("double") / F.lit(idcg_ppb) * 1000000 + F.lit(0.5))
            / 1000000
        ).alias("ndcg"),
    ).orderBy("query_id")
