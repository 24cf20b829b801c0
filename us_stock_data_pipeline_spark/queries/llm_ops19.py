"""Round-8 LLM-data additions, part 19: hard-negative mining for
contrastive training, a Johnson-Lindenstrauss random-projection
distortion audit, and Kneser-Ney smoothed bigram probabilities —
three training-data operators on the embeddings/documents fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Hard-negative mining: nearest neighbors with a DIFFERENT label
# --------------------------------------------------------------------------

_HN_NQ = 10  # queries: vec_id < 10
_HN_K = 5

_HARD_NEG_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS query_label, embedding AS qe
  FROM embeddings WHERE vec_id < {_HN_NQ}
),
scored AS (
  SELECT q.query_id, q.query_label, e.vec_id AS neighbor_id, e.label AS neighbor_label,
         list_cosine_similarity(
           list_transform(q.qe, x -> CAST(x AS DOUBLE)),
           list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS cos_sim
  FROM q JOIN embeddings e
    ON e.vec_id <> q.query_id AND e.label <> q.query_label
),
ranked AS (
  SELECT query_id, query_label, neighbor_id, neighbor_label, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, query_label, neighbor_id, neighbor_label,
       round(cos_sim, 4) AS cos_sim, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {_HN_K}
ORDER BY query_id, rnk
"""


@register("knn_hard_negatives", oracle=_HARD_NEG_ORACLE, tags=("llm", "similarity"))
def knn_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: for each anchor, the top-{_HN_K} most
    cosine-similar vectors whose LABEL DIFFERS — the near-miss
    negatives contrastive/embedding training (SimCSE, DPR, triplet
    loss) needs, because random negatives are too easy to teach
    anything. Identical plan contract to `knn_bruteforce_cosine`
    (anchors broadcast, corpus never shuffles, per-anchor top-k via
    rank window) with the cross-label predicate fused into the join —
    at 100 TB the label filter drops candidates before scoring, and
    the corpus-side scan stays shuffle-free. Deterministic
    (cosine desc, vec_id) ranking on both engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _HN_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("qe"),
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

    cos = _dot(F.col("qe"), F.col("embedding")) / (
        _norm(F.col("qe")) * _norm(F.col("embedding"))
    )
    scored = (
        F.broadcast(q)
        .join(
            emb,
            (F.col("vec_id") != F.col("query_id"))
            & (F.col("label") != F.col("query_label")),
        )
        .select(
            "query_id",
            "query_label",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            cos.alias("cos_sim"),
        )
    )
    ranked = scored.select(
        "*",
        F.row_number()
        .over(Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id"))
        .alias("rnk"),
    ).filter(F.col("rnk") <= _HN_K)
    return ranked.select(
        "query_id",
        "query_label",
        "neighbor_id",
        "neighbor_label",
        F.round("cos_sim", 4).alias("cos_sim"),
        F.col("rnk").cast("long").alias("rnk"),
    ).orderBy("query_id", "rnk")


# --------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection + distortion audit
# --------------------------------------------------------------------------

_JL_M = 16  # projected dimensions (from 64)
_JL_MIX = 2654435761  # Knuth multiplicative-hash constant
# sign bit comes from a HIGH bit of the mixed index (see SNIPPETS round-5
# find: % 2 of a linear expression collapses to parity)
_JL_SIGN_SQL = "(2 * ((({i} + 64 * {j}) * 2654435761) % 2097152 // 1048576) - 1)"

_JL_ORACLE = f"""
WITH xi AS (
  SELECT vec_id, u.pos - 1 AS i,
         CAST(floor(CAST(u.x AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xq
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS x,
                       unnest(range(1, len(embedding) + 1)) AS pos) u
),
proj AS (
  SELECT vec_id, j.j,
         CAST(sum((2 * (((i + 64 * j.j) * {_JL_MIX}) % 2097152 // 1048576) - 1)
                  * xq) AS BIGINT) AS p
  FROM xi CROSS JOIN (SELECT unnest(range(0, {_JL_M})) AS j) j
  GROUP BY vec_id, j.j
),
pairs AS (SELECT vec_id AS va, vec_id + 1 AS vb FROM embeddings
          WHERE vec_id % 2 = 0
            AND vec_id + 1 IN (SELECT vec_id FROM embeddings)),
orig_d AS (
  SELECT p.va, p.vb,
         CAST(sum((a.xq - b.xq) * (a.xq - b.xq)) AS BIGINT) AS d2
  FROM pairs p
  JOIN xi a ON a.vec_id = p.va
  JOIN xi b ON b.vec_id = p.vb AND b.i = a.i
  GROUP BY p.va, p.vb
),
proj_d AS (
  SELECT p.va, p.vb,
         CAST(sum((a.p - b.p) * (a.p - b.p)) AS BIGINT) AS d2
  FROM pairs p
  JOIN proj a ON a.vec_id = p.va
  JOIN proj b ON b.vec_id = p.vb AND b.j = a.j
  GROUP BY p.va, p.vb
),
ratios AS (
  SELECT o.va,
         CAST(floor(CAST(pd.d2 AS DOUBLE) / {_JL_M} / o.d2 * 1000000 + 0.5)
              AS BIGINT) AS ratio_ppm
  FROM orig_d o JOIN proj_d pd ON pd.va = o.va AND pd.vb = o.vb
  WHERE o.d2 > 0
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(min(ratio_ppm) AS BIGINT) AS min_ppm,
       CAST(max(ratio_ppm) AS BIGINT) AS max_ppm,
       CAST(sum(ratio_ppm) // count(*) AS BIGINT) AS mean_ppm,
       CAST(sum(CASE WHEN ratio_ppm BETWEEN 500000 AND 1500000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_within_50pct
FROM ratios
"""


@register("embedding_random_projection_jl", oracle=_JL_ORACLE, tags=("llm", "embedding"))
def embedding_random_projection_jl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign random projection 64 -> {_JL_M}
    dims, audited by pairwise-distance distortion — the cheapest
    dimensionality reduction there is (no training, unlike
    `embedding_pca_power_iteration`; no per-vector fitting, unlike
    `embedding_matryoshka_recall`), with JL's guarantee that squared
    distances survive in expectation. The +/-1 matrix is a
    deterministic hash of (in_dim, out_dim) — a HIGH bit of a
    Knuth-mixed index, never a parity bit — so no random state ships
    anywhere; inputs quantize to integer micro-units, making every
    projection an exact BIGINT signed sum and both distance matrices
    exact ints; per-pair distortion ratios quantize to integer ppm
    BEFORE aggregation so the summary is float-order-proof. Plan:
    projection is a map-only pass; distances for the audited pairs
    are two keyed joins on consecutive vec_ids — at 100 TB you audit
    a sampled pair set exactly like this."""
    emb = load_table(spark, sf_dir, "embeddings")
    xi = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000000 + F.lit(0.5)).cast("long"),
        ).alias("xq"),
    )
    # 16 exact signed sums, one expression per output dim
    proj_cols = [
        F.aggregate(
            F.zip_with(
                F.col("xq"),
                F.sequence(F.lit(0), F.lit(63)),
                lambda x, i: (
                    2 * (((i + 64 * j) * F.lit(_JL_MIX)) % 2097152 / 1048576).cast("long")
                    - 1
                )
                * x,
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias(f"p{j}")
        for j in range(_JL_M)
    ]
    proj = xi.select("vec_id", F.array(*proj_cols).alias("p"))
    pairs = (
        emb.filter(F.col("vec_id") % 2 == 0)
        .select(F.col("vec_id").alias("va"), (F.col("vec_id") + 1).alias("vb"))
        .join(emb.select(F.col("vec_id").alias("vb")), "vb", "left_semi")
    )
    xa = xi.select(F.col("vec_id").alias("va"), F.col("xq").alias("xa"))
    xb = xi.select(F.col("vec_id").alias("vb"), F.col("xq").alias("xb"))
    orig_d = (
        pairs.join(xa, "va")
        .join(xb, "vb")
        .select(
            "va",
            "vb",
            F.aggregate(
                F.zip_with(F.col("xa"), F.col("xb"), lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("d2"),
        )
    )
    pa = proj.select(F.col("vec_id").alias("va"), F.col("p").alias("pa"))
    pb = proj.select(F.col("vec_id").alias("vb"), F.col("p").alias("pb"))
    proj_d = (
        pairs.join(pa, "va")
        .join(pb, "vb")
        .select(
            "va",
            "vb",
            F.aggregate(
                F.zip_with(F.col("pa"), F.col("pb"), lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("pd2"),
        )
    )
    ratios = (
        orig_d.join(proj_d, ["va", "vb"])
        .filter(F.col("d2") > 0)
        .select(
            F.floor(
                F.col("pd2").cast("double") / _JL_M / F.col("d2") * 1000000 + F.lit(0.5)
            )
            .cast("long")
            .alias("ratio_ppm")
        )
    )
    return ratios.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.min("ratio_ppm").cast("long").alias("min_ppm"),
        F.max("ratio_ppm").cast("long").alias("max_ppm"),
        F.expr("CAST(sum(ratio_ppm) div count(*) AS BIGINT)").alias("mean_ppm"),
        F.sum(
            F.when(F.col("ratio_ppm").between(500000, 1500000), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_within_50pct"),
    )


# --------------------------------------------------------------------------
# Kneser-Ney smoothed bigram probabilities
# --------------------------------------------------------------------------

_KN_D = 0.75  # discount; dyadic, exact in binary
_KN_TOPN = 20

_KN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, u.w, u.pos
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       LATERAL (SELECT unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS pos) u
),
bigrams AS (
  SELECT a.w AS w1, b.w AS w2
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bigrams GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
              CAST(count(*) AS BIGINT) AS nfw
       FROM c2 GROUP BY w1),
bw AS (SELECT w2, CAST(count(*) AS BIGINT) AS nbw FROM c2 GROUP BY w2),
t AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM c2),
scored AS (
  SELECT c2.w1, c2.w2, c2.c12, c1.c1, c1.nfw, bw.nbw,
         (greatest(CAST(c2.c12 AS DOUBLE) - {_KN_D}, 0.0) / c1.c1)
           + ({_KN_D} * c1.nfw / c1.c1) * (CAST(bw.nbw AS DOUBLE) / t.n_types)
           AS p_kn
  FROM c2
  JOIN c1 ON c1.w1 = c2.w1
  JOIN bw ON bw.w2 = c2.w2
  CROSS JOIN t
)
SELECT w1, w2, c12, c1, nfw, nbw,
       floor(p_kn * 1000000 + 0.5) / 1000000 AS p_kn
FROM scored
ORDER BY p_kn DESC, w1, w2
LIMIT {_KN_TOPN}
"""


@register("text_kneser_ney_bigram", oracle=_KN_ORACLE, tags=("llm", "quality"))
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities — the smoothing
    that actually wins LM evaluations, upgrading `text_bigram_lm`'s
    add-one: mass is discounted from seen bigrams (D=0.75, dyadic so
    the product is exact binary) and redistributed by CONTINUATION
    counts — how many distinct contexts a word follows — not raw
    frequency, which is why KN stops predicting 'Francisco' after
    'the'. All four count tables (bigram, context-marginal,
    follower-diversity, continuation-diversity) are exact-integer
    groupBys of one tokenize pass; the smoothed probability is a
    single identical double expression, floor-quantized for the
    hash. Plan: explode once, three shuffles on word keys (all
    map-side combinable), broadcast type-count scalar; top-{_KN_TOPN}
    via TakeOrdered."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    a, b = toks.alias("a"), toks.alias("b")
    bigrams = a.join(
        b,
        (F.col("b.doc_id") == F.col("a.doc_id")) & (F.col("b.pos") == F.col("a.pos") + 1),
    ).select(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
    c2 = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c12"))
    c1 = c2.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("nfw"),
    )
    bw = c2.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("nbw"))
    t = c2.agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    p_kn = (
        F.greatest(F.col("c12").cast("double") - _KN_D, F.lit(0.0)) / F.col("c1")
    ) + (_KN_D * F.col("nfw") / F.col("c1")) * (
        F.col("nbw").cast("double") / F.col("n_types")
    )
    scored = (
        c2.join(c1, "w1")
        .join(bw, "w2")
        .crossJoin(F.broadcast(t))
        .select("w1", "w2", "c12", "c1", "nfw", "nbw", p_kn.alias("p_kn_raw"))
    )
    # order by the QUANTIZED probability (matching the oracle's output
    # alias) so a raw-vs-floored ordering flip can't change the top-N set
    return (
        scored.select(
            "w1",
            "w2",
            "c12",
            "c1",
            "nfw",
            "nbw",
            (F.floor(F.col("p_kn_raw") * 1000000 + F.lit(0.5)) / 1000000).alias("p_kn"),
        )
        .orderBy(F.col("p_kn").desc(), "w1", "w2")
        .limit(_KN_TOPN)
    )
