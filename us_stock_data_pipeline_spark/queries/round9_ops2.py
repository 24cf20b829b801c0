"""Round-9 operators, part 2: transformer/training-loop primitives that
became exactly-verifiable once detmath landed — scaled-dot-product
attention softmax, a DoReMi domain-reweighting step, and a stable
log-sum-exp aggregate. Each hashed column is exact integer arithmetic
over libm-free doubles, so the oracles are value-exact on any host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.functions import detmath
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# ml: scaled dot-product attention weights (softmax over key scores)
# --------------------------------------------------------------------------

_ATTN_QUERY_ID = 0
_ATTN_TOPK = 20

# score = dot(q, k) / sqrt(d), computed as a strict LEFT FOLD over the
# zipped vectors so both engines add in the same order (IEEE-exact given
# the same order); softmax weights are max-shifted det_exp quantized to
# 1e12 integers BEFORE the normalizing sum, so shares are exact integer
# ratios.
_ATTN_STAGES = [
    ("at_x", "greatest(score - mx, -40.0)")
] + detmath.det_exp_stages("at_x", "at_w")
_ATTN_WQ = "CAST(floor(at_w * 1000000000000 + 0.5) AS BIGINT)"

_ATTN_ORACLE = f"""
WITH q AS (
  SELECT embedding AS qv FROM embeddings WHERE vec_id = {_ATTN_QUERY_ID}
),
scored AS (
  SELECT e.vec_id,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(list_zip(e.embedding, q.qv),
                            z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))),
           (acc, x) -> acc + x
         ) / sqrt(CAST(len(e.embedding) AS DOUBLE)) AS score
  FROM embeddings e, q
  WHERE e.vec_id <> {_ATTN_QUERY_ID}
),
shifted AS (
  SELECT vec_id, score, max(score) OVER () AS mx FROM scored
),
wq AS (
  SELECT vec_id, {_ATTN_WQ} AS w_q
  FROM {detmath.stages_to_select(_ATTN_STAGES, "shifted")}
),
shares AS (
  SELECT vec_id, w_q,
         CAST(w_q * 1000000 // sum(w_q) OVER () AS BIGINT) AS share_e6,
         row_number() OVER (ORDER BY w_q DESC, vec_id) AS rnk
  FROM wq
)
SELECT CAST(vec_id AS BIGINT) AS key_id, w_q, share_e6, CAST(rnk AS BIGINT) AS rnk
FROM shares
WHERE rnk <= {_ATTN_TOPK}
ORDER BY rnk
"""


@register("ml_attention_softmax", oracle=_ATTN_ORACLE, tags=("ml", "llm", "embedding"))
def ml_attention_softmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scaled dot-product ATTENTION weights — the transformer primitive
    itself: one query vector against every key vector, score =
    q.k/sqrt(d), softmax over the scores, top-{_ATTN_TOPK} keys by
    attention mass. Exactness (newly possible via detmath): the dot
    product is a strict left fold (same addition order both engines),
    softmax is max-shifted det_exp quantized to 1e12 integers BEFORE
    the normalizing sum, and shares are exact integer floor-divides —
    no libm anywhere in a hashed column. Scale: scoring is one
    broadcast of the query row + a map-side fold per key (linear, no
    shuffle); the global max/sum are scalar aggregates; only the
    top-k window orders. This is exactly how a reranker or
    cross-attention audit runs over a 100 TB key corpus: the softmax
    never materializes beyond (id, score)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == _ATTN_QUERY_ID).select(
        F.col("embedding").alias("qv")
    )
    scored = (
        emb.filter(F.col("vec_id") != _ATTN_QUERY_ID)
        .crossJoin(F.broadcast(q))
        .selectExpr(
            "vec_id",
            "aggregate(zip_with(embedding, qv, (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
            " / sqrt(CAST(size(embedding) AS DOUBLE)) AS score",
        )
    )
    from pyspark.sql import Window as W

    shifted = scored.withColumn("mx", F.max("score").over(W.partitionBy()))
    wq = detmath.apply_stages(shifted, _ATTN_STAGES).selectExpr(
        "vec_id", f"{_ATTN_WQ} AS w_q"
    )
    shares = wq.select(
        "vec_id",
        "w_q",
        F.expr("CAST(w_q * 1000000 div sum(w_q) OVER () AS BIGINT)").alias("share_e6"),
        F.row_number().over(W.orderBy(F.col("w_q").desc(), "vec_id")).alias("rnk"),
    )
    return (
        shares.filter(F.col("rnk") <= _ATTN_TOPK)
        .select(
            F.col("vec_id").cast("long").alias("key_id"),
            "w_q",
            "share_e6",
            F.col("rnk").cast("long").alias("rnk"),
        )
        .orderBy("rnk")
    )


# --------------------------------------------------------------------------
# corpus: one DoReMi domain-reweighting step
# --------------------------------------------------------------------------

_DOREMI_ETA = "0.5"  # multiplicative-weights learning rate (double literal)

# excess "loss" proxy per domain: relative deviation of the domain's
# mean doc length from the corpus mean, as a ratio of exact integer
# sums; the multiplicative-weights update w' ∝ w * exp(eta * excess)
# runs on det_exp and quantizes to 1e9 before normalizing.
_DOREMI_STAGES = [
    (
        "dr_excess",
        "(CAST(d_chars AS DOUBLE) / d_docs - CAST(g_chars AS DOUBLE) / g_docs)"
        " / (CAST(g_chars AS DOUBLE) / g_docs)",
    ),
    ("dr_x", f"greatest(least({_DOREMI_ETA} * dr_excess, 40.0), -40.0)"),
] + detmath.det_exp_stages("dr_x", "dr_m")

_DOREMI_ORACLE = f"""
WITH dom AS (
  SELECT source AS domain, CAST(count(*) AS BIGINT) AS d_docs,
         CAST(sum(n_chars) AS BIGINT) AS d_chars
  FROM documents GROUP BY source
),
gtot AS (
  SELECT CAST(count(*) AS BIGINT) AS g_docs, CAST(sum(n_chars) AS BIGINT) AS g_chars
  FROM documents
),
upd AS (
  SELECT domain, d_docs,
         CAST(floor(dr_excess * 1000000 + 0.5) AS BIGINT) AS excess_e6,
         CAST(floor(dr_m * 1000000000 + 0.5) AS BIGINT) AS mult_e9
  FROM {detmath.stages_to_select(_DOREMI_STAGES, "(SELECT d.*, g.* FROM dom d CROSS JOIN gtot g)")}
)
SELECT domain, d_docs AS n_docs, excess_e6, mult_e9,
       CAST(mult_e9 * 1000000 // sum(mult_e9) OVER () AS BIGINT) AS new_weight_e6
FROM upd
ORDER BY domain
"""


@register("corpus_doremi_reweight_step", oracle=_DOREMI_ORACLE, tags=("llm", "sampling"))
def corpus_doremi_reweight_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One DoReMi-style domain-reweighting step (Xie et al. 2023):
    multiplicative-weights update w' ∝ w * exp(eta * excess_loss) over
    the corpus's source domains, starting from uniform w — the
    principled answer to "how much of each source should the next
    training mix contain", which `corpus_temperature_mixing` only
    heuristically approximates with n^alpha. The excess-loss proxy here
    is each domain's relative mean-length deviation (a stand-in for the
    proxy-model excess loss; the UPDATE step — the distributed part —
    is identical). Exactness: excess is a ratio of exact integer sums,
    the exp runs on clamped det_exp, multipliers quantize to 1e9 before
    the normalizing sum, and shares are exact integer floor-divides.
    Plan: one groupBy(domain) + one scalar aggregate + a domains-sized
    window — free at any corpus size; at 100 TB the only data-touching
    pass is the domain rollup."""
    docs = load_table(spark, sf_dir, "documents")
    dom = docs.groupBy(F.col("source").alias("domain")).agg(
        F.count(F.lit(1)).cast("long").alias("d_docs"),
        F.sum("n_chars").cast("long").alias("d_chars"),
    )
    glob = docs.agg(
        F.count(F.lit(1)).cast("long").alias("g_docs"),
        F.sum("n_chars").cast("long").alias("g_chars"),
    )
    from pyspark.sql import Window as W

    upd = detmath.apply_stages(
        dom.crossJoin(F.broadcast(glob)), _DOREMI_STAGES
    ).selectExpr(
        "domain",
        "d_docs AS n_docs",
        "CAST(floor(dr_excess * 1000000 + 0.5) AS BIGINT) AS excess_e6",
        "CAST(floor(dr_m * 1000000000 + 0.5) AS BIGINT) AS mult_e9",
    )
    return upd.select(
        "domain",
        "n_docs",
        "excess_e6",
        "mult_e9",
        F.expr("CAST(mult_e9 * 1000000 div sum(mult_e9) OVER () AS BIGINT)").alias(
            "new_weight_e6"
        ),
    ).orderBy("domain")


# --------------------------------------------------------------------------
# agg: numerically-stable log-sum-exp per group
# --------------------------------------------------------------------------

_LSE_STAGES = [
    ("ls_x", "greatest(x - mx, -40.0)")
] + detmath.det_exp_stages("ls_x", "ls_w")
_LSE_WQ = "CAST(floor(ls_w * 1000000000000 + 0.5) AS BIGINT)"
_LSE_FINAL_STAGES = detmath.det_ln_int_stages("sum_wq", "ls_ln")

_LSE_ORACLE = f"""
WITH scores AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) / 10000.0 AS x
  FROM events
),
shifted AS (
  SELECT event_type, x, max(x) OVER (PARTITION BY event_type) AS mx FROM scores
),
terms AS (
  SELECT event_type, mx, {_LSE_WQ} AS w_q
  FROM {detmath.stages_to_select(_LSE_STAGES, "shifted")}
),
sums AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         max(mx) AS mx, CAST(sum(w_q) AS BIGINT) AS sum_wq
  FROM terms GROUP BY event_type
)
SELECT event_type, n,
       CAST(floor(mx * 1000000 + 0.5) AS BIGINT) AS max_e6,
       -- lse = mx + ln(sum_wq) - ln(1e12), all detmath doubles
       CAST(floor((mx + ls_ln - 27.631021115928547) * 1000000 + 0.5) AS BIGINT)
         AS lse_e6
FROM {detmath.stages_to_select(_LSE_FINAL_STAGES, "sums")}
ORDER BY event_type
"""


@register("agg_logsumexp", oracle=_LSE_ORACLE, tags=("agg", "stats", "ml"))
def agg_logsumexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numerically-stable LOG-SUM-EXP per group — the softmax
    normalizer / mixture log-likelihood primitive (lse = max +
    ln(sum(exp(x - max)))), the aggregate every probabilistic scoring
    pipeline ends in. The max shift bounds every exponent in [-40, 0]
    (anything smaller adds < 1e-17 relative mass — the same clamp
    argument as events_decay_engagement), each term quantizes to a
    1e12 integer BEFORE the group sum (order-free), and the final ln
    of the integer sum runs on det_ln — so the hashed lse is exact on
    any host. ln(1e12) enters as a Python double literal. Plan: one
    per-group max window sharing the group sum's shuffle key, then one
    groupBy — two passes, both map-side-combinable."""
    ev = load_table(spark, sf_dir, "events")
    scores = ev.select(
        "event_type",
        (F.round(F.col("value") * 100).cast("long") / 10000.0).alias("x"),
    )
    from pyspark.sql import Window as W

    shifted = scores.withColumn("mx", F.max("x").over(W.partitionBy("event_type")))
    terms = detmath.apply_stages(shifted, _LSE_STAGES).selectExpr(
        "event_type", "mx", f"{_LSE_WQ} AS w_q"
    )
    sums = terms.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("mx").alias("mx"),
        F.sum("w_q").cast("long").alias("sum_wq"),
    )
    return (
        detmath.apply_stages(sums, _LSE_FINAL_STAGES)
        .selectExpr(
            "event_type",
            "n",
            "CAST(floor(mx * 1000000 + 0.5) AS BIGINT) AS max_e6",
            "CAST(floor((mx + ls_ln - 27.631021115928547) * 1000000 + 0.5) AS BIGINT)"
            " AS lse_e6",
        )
        .orderBy("event_type")
    )
