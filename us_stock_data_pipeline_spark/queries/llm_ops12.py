"""Round-6 LLM-pipeline additions: distributed k-means (Lloyd),
SemDeDup-style semantic dedup, DSIR importance weighting, and vision
tile planning.

Determinism architecture (these four run the same playbook): embedding
components quantize to EXACT integers (round(x*1e4), never exactly on a
.5 boundary because (2k+1)/20000 is not float32-representable), every
cross-row accumulation — centroid sums, squared distances, dot
products, log-ratio doc scores — happens in int64/DECIMAL(38)/HUGEINT
exact arithmetic, and doubles appear only in terminal single divisions
(dist = A/n^2, cos = dot/sqrt(na*nb)) where IEEE evaluation of
identical exact inputs is bit-equal on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

_DIMS = 64
_K = 8  # seed centroids = vec_id 0.._K-1


# --------------------------------------------------------------------------
# k-means (Lloyd's algorithm, 2 exact iterations)
# --------------------------------------------------------------------------

def _kmeans_assign_sql(cents: str) -> str:
    """One Lloyd assignment pass against centroid CTE ``cents`` carrying
    (j, d, s, n): squared distance to centroid s/n scaled by n^2 stays an
    exact integer, the /n^2 normalization is the only double."""
    return f"""
  SELECT vec_id, j, a, n FROM (
    SELECT p.vec_id, c.j,
           CAST(sum((c.n * p.x - c.s) * (c.n * p.x - c.s)) AS BIGINT) AS a,
           max(c.n) AS n,
           row_number() OVER (
             PARTITION BY p.vec_id
             ORDER BY CAST(sum((c.n * p.x - c.s) * (c.n * p.x - c.s)) AS DOUBLE)
                      / (max(c.n) * max(c.n)), c.j
           ) AS rn
    FROM pts p JOIN {cents} c USING (d)
    GROUP BY p.vec_id, c.j) t
  WHERE rn = 1
"""


_KMEANS_ORACLE = f"""
WITH pts AS (
  SELECT vec_id, dims.d,
         CAST(round(CAST(embedding[dims.d] AS DOUBLE) * 10000) AS BIGINT) AS x
  FROM embeddings, (SELECT unnest(range(1, {_DIMS + 1})) AS d) dims
),
c0 AS (
  SELECT vec_id AS j, d, x AS s, CAST(1 AS BIGINT) AS n
  FROM pts WHERE vec_id < {_K}
),
a1 AS ({_kmeans_assign_sql('c0')}),
c1 AS (
  SELECT a1.j, p.d, CAST(sum(p.x) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
  FROM a1 JOIN pts p USING (vec_id)
  GROUP BY a1.j, p.d
),
a2 AS ({_kmeans_assign_sql('c1')})
SELECT j AS cluster,
       CAST(count(*) AS BIGINT) AS n_vecs,
       floor(CAST(sum(a) AS DOUBLE) / (max(n) * max(n)) / 100000000 * 10000 + 0.5)
         / 10000 AS inertia
FROM a2
GROUP BY j
ORDER BY cluster
"""


@register("kmeans_lloyd_exact", oracle=_KMEANS_ORACLE, tags=("llm", "ml", "clustering"))
def kmeans_lloyd_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (Lloyd), two exact iterations from
    deterministic seeds (vec_id 0..7): assign -> recompute centroids ->
    reassign, reporting per-cluster size and inertia. The engine-side
    novelty is EXACT Lloyd: a centroid is carried as its integer
    (sum, count) pair instead of a float mean, distances compare as
    |n*x - s|^2 / n^2 with an exact-int numerator, so the argmin — the
    decision that steers the whole algorithm — can never diverge
    between engines by a ulp. 100 TB shape: points explode to
    (vec, dim) rows once; every assignment is a broadcast-sized join
    on the dim key (K*dims centroid rows) followed by a map-side-
    combinable groupBy — per iteration ONE shuffle of (vec, K) partial
    distances and nothing quadratic; iteration count is a fixed small
    constant (production k-means on embeddings converges in ~10
    passes, each this same plan). `ann_ivf_cosine` consumes exactly
    this centroid table shape as its coarse quantizer.

    Scale plan (round-7 rewrite; the r6 sweep measured 3.64x wall at
    10x data): the old shape exploded points to (vec, dim) rows and
    joined centroids on the 64-value dim key — a 64x row inflation
    before a x_K fan-out, then a groupBy AND a per-vec window, i.e.
    TWO shuffles of n*K rows. Now the points stay as quantized
    ARRAYS, the K*64 centroid table broadcasts as K rows of array
    columns, the whole distance evaluation is ONE map-side zip_with/
    aggregate fold, and the argmin is min(struct(dist, j, ...)) — a
    map-side-combinable aggregate whose shuffle carries <= n rows
    (not n*K) and sorts nothing. The only explode left feeds the
    centroid RECOMPUTE, whose map-side combine emits <= K*64 rows
    per task regardless of n."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id",
        # cast float -> double BEFORE the scale-up: float*int stays single
        # precision in one engine and promotes in the other (sf0.1 find)
        F.transform(
            "embedding", lambda v: F.round(v.cast("double") * 10000).cast("long")
        ).alias("q"),
    ).transform(registry.track_persist)
    c0 = corpus.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("j"),
        F.col("q").alias("s_arr"),
        F.lit(1).cast("long").alias("n"),
    )

    def assign(cents: DataFrame) -> DataFrame:
        # |n*x - s|^2 summed over dims: exact int64 fold, zero shuffles.
        a_num = F.aggregate(
            F.zip_with(F.col("q"), F.col("s_arr"), lambda x, s: F.col("n") * x - s),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v * v,
        )
        scored = (
            corpus.crossJoin(F.broadcast(cents))
            .withColumn("a", a_num)
            .withColumn(
                "dist", F.col("a").cast("double") / (F.col("n") * F.col("n"))
            )
        )
        # argmin as a plain aggregate: struct compares (dist, j) exactly
        # like the oracle's ORDER BY dist, j; map-side combine collapses
        # each task's K candidates per vec before the exchange.
        return (
            scored.groupBy("vec_id")
            .agg(F.min(F.struct("dist", "j", "a", "n")).alias("m"))
            .select("vec_id", "m.j", "m.a", "m.n")
        )

    a1 = assign(c0)
    c1 = (
        a1.select("vec_id", "j")
        .join(corpus, "vec_id")
        .select("j", F.posexplode("q").alias("d", "x"))
        .groupBy("j", "d")
        .agg(F.sum("x").cast("long").alias("s"), F.count(F.lit(1)).cast("long").alias("cnt"))
        .groupBy("j")
        .agg(
            F.array_sort(F.collect_list(F.struct("d", "s"))).alias("ds"),
            F.max("cnt").alias("n"),
        )
        .select("j", F.col("ds.s").alias("s_arr"), "n")
    )
    a2 = assign(c1)
    return (
        a2.groupBy("j")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            (
                F.floor(
                    F.sum(F.col("a").cast("decimal(38,0)")).cast("double")
                    / (F.max("n") * F.max("n"))
                    / F.lit(100000000)
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("inertia"),
        )
        .select(F.col("j").alias("cluster"), "n_vecs", "inertia")
        .orderBy("cluster")
    )


# --------------------------------------------------------------------------
# SemDeDup: semantic dedup within k-means cells
# --------------------------------------------------------------------------

_PLANT_STRIDE = 20
_PLANT_OFFSET = 1_000_000
_PLANT_SHIFT = 0.01
_SEM_TAU = 0.98
_CELL_TARGET = 256  # target cell width; K = max(_K, n // _CELL_TARGET)

_SEMDEDUP_ORACLE = f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb
  FROM embeddings
),
planted AS (
  SELECT vec_id + {_PLANT_OFFSET} AS vec_id,
         list_transform(emb, v -> v + {_PLANT_SHIFT}) AS emb
  FROM base WHERE vec_id % {_PLANT_STRIDE} = 0
),
corpus AS (
  SELECT vec_id,
         list_transform(emb, v -> CAST(round(v * 10000) AS BIGINT)) AS q
  FROM (SELECT * FROM base UNION ALL SELECT * FROM planted) u
),
withnorm AS (
  SELECT vec_id, q,
         CAST(list_sum(list_transform(range(1, {_DIMS + 1}), i -> q[i] * q[i])) AS BIGINT) AS n2
  FROM corpus
),
kk AS (
  -- K grows with the corpus so cells stay ~{_CELL_TARGET} wide: fixed K
  -- makes within-cell pairs quadratic in n (the 10x sweep measured
  -- 33x wall); K ~ n/{_CELL_TARGET} makes total pair count LINEAR.
  SELECT greatest({_K}, CAST(count(*) AS BIGINT) // {_CELL_TARGET}) AS k
  FROM embeddings
),
seeds AS (
  SELECT vec_id AS j, q AS qc FROM corpus, kk WHERE vec_id < kk.k
),
asg AS (
  SELECT vec_id, q, n2, j FROM (
    SELECT w.vec_id, w.q, w.n2, s.j,
           row_number() OVER (
             PARTITION BY w.vec_id
             ORDER BY CAST(list_sum(list_transform(range(1, {_DIMS + 1}),
                        i -> (w.q[i] - s.qc[i]) * (w.q[i] - s.qc[i]))) AS BIGINT), s.j
           ) AS rn
    FROM withnorm w CROSS JOIN seeds s) t
  WHERE rn = 1
),
pairs AS (
  SELECT a.j,
         b.vec_id AS vb,
         CAST(list_sum(list_transform(range(1, {_DIMS + 1}), i -> a.q[i] * b.q[i])) AS DOUBLE)
           / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) AS cos_sim
  FROM asg a JOIN asg b ON a.j = b.j AND a.vec_id < b.vec_id
),
dups AS (
  SELECT j, CAST(count(*) AS BIGINT) AS n_dup_pairs,
         CAST(count(DISTINCT vb) AS BIGINT) AS n_removed
  FROM pairs WHERE cos_sim >= {_SEM_TAU}
  GROUP BY j
)
SELECT asg.j AS cluster,
       CAST(count(*) AS BIGINT) AS n_members,
       coalesce(max(d.n_dup_pairs), 0) AS n_dup_pairs,
       coalesce(max(d.n_removed), 0) AS n_removed
FROM asg LEFT JOIN dups d ON asg.j = d.j
GROUP BY asg.j
ORDER BY cluster
"""


def _qdot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two quantized vectors (array-order fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda p, q: p * q),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


@register("dedup_semdedup", oracle=_SEMDEDUP_ORACLE, tags=("llm", "dedup", "clustering"))
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): assign embeddings to k-means cells,
    then mark near-duplicates ONLY within each cell — the cluster
    assignment is the blocking key that turns O(n^2) semantic dedup
    into per-cell work. Cells come from deterministic seed centroids
    whose count GROWS with the corpus (K = max(8, n/256), computed
    identically in the oracle), keeping cells ~256 wide so total pair
    count stays LINEAR in n — the fixed-K variant measured 33x wall
    for 10x data in the scale sweep. Planted
    near-duplicates (+0.01 shift, same plant as
    `dedup_embedding_cosine`) verify recall: a plant that lands in its
    original's cell scores cos >= 0.98 there (~92% do at fixture
    scale; the remainder cross a cell boundary — SemDeDup's documented
    recall gap, pinned at a >=80% floor in tests). Scale: the
    pairwise stage is bounded by the LARGEST CELL, the operator's real
    100 TB cost model — production raises K until cells fit a task
    (K ~ n/1000), exactly how the paper runs on LAION; the
    within-cell join shuffles once on the cell id. Quantized int
    dot/norms make the cosine — and therefore the keep/remove decision
    — engine-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", F.transform("embedding", lambda v: v.cast("double")).alias("emb")
    )
    planted = base.filter(F.col("vec_id") % _PLANT_STRIDE == 0).select(
        (F.col("vec_id") + F.lit(_PLANT_OFFSET)).alias("vec_id"),
        F.transform("emb", lambda v: v + F.lit(_PLANT_SHIFT)).alias("emb"),
    )
    corpus = base.unionByName(planted).select(
        "vec_id",
        F.transform("emb", lambda v: F.round(v * 10000).cast("long")).alias("q"),
    )
    withnorm = corpus.withColumn("n2", _qdot(F.col("q"), F.col("q")))
    kk = emb.agg(
        F.greatest(
            F.lit(_K).cast("long"),
            F.expr(f"CAST(count(*) AS BIGINT) div {_CELL_TARGET}"),
        ).alias("k")
    )
    seeds = (
        corpus.crossJoin(F.broadcast(kk))
        .filter(F.col("vec_id") < F.col("k"))
        .select(F.col("vec_id").alias("j"), F.col("q").alias("qc"))
    )
    d2 = _qdot(
        F.zip_with(F.col("q"), F.col("qc"), lambda p, c: p - c),
        F.zip_with(F.col("q"), F.col("qc"), lambda p, c: p - c),
    )
    # Argmin as min(struct(d2, j)) instead of a per-vec window: the
    # n*K candidate rows stay MAP-SIDE (combine collapses them to one
    # row per vec per task before the exchange), so the shuffle carries
    # <= n rows — the r6 sweep showed the old window shuffling all n*K
    # rows, and with K growing as n/256 that exchange was the 3.49x-at-
    # 10x tail. q/n2 are constant per vec_id, so any_value is exact.
    asg = (
        withnorm.crossJoin(F.broadcast(seeds))
        .withColumn("d2", d2)
        .groupBy("vec_id")
        .agg(
            F.min(F.struct("d2", "j")).alias("m"),
            F.any_value("q").alias("q"),
            F.any_value("n2").alias("n2"),
        )
        .select("vec_id", "q", "n2", F.col("m.j").alias("j"))
        .transform(registry.track_persist)
    )
    # Salt-tile the within-cell pair join: with only K cells, a plain
    # join on j gives at most K-way parallelism while the OUTPUT
    # explodes quadratically per cell (the 10x scale sweep measured
    # this as a near-single-threaded stage). Tiling the probe side by
    # vec_id % S and replicating the build side S times keeps the same
    # pair set but spreads it over K*S tasks — the standard skew-salt
    # applied to a self-join. The explicit repartition(K*S) is load-
    # bearing: the INPUT is megabytes, so AQE would otherwise coalesce
    # the shuffle back to one partition and re-serialize the exploding
    # output (explicit numPartitions is exempt from AQE coalescing).
    n_salts = 8
    a = (
        asg.withColumn("salt", (F.col("vec_id") % n_salts).cast("int"))
        .repartition(_K * n_salts, "j", "salt")
        .alias("a")
    )
    b = (
        asg.withColumn(
            "salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
        ).alias("b")
    )
    cos = _qdot(F.col("a.q"), F.col("b.q")).cast("double") / F.sqrt(
        F.col("a.n2").cast("double") * F.col("b.n2").cast("double")
    )
    dups = (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.j").alias("j"), F.col("b.vec_id").alias("vb"), cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= _SEM_TAU)
        .groupBy("j")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_pairs"),
            F.countDistinct("vb").cast("long").alias("n_removed"),
        )
    )
    return (
        asg.groupBy("j")
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .join(dups, "j", "left")
        .select(
            F.col("j").alias("cluster"),
            "n_members",
            F.coalesce("n_dup_pairs", F.lit(0)).alias("n_dup_pairs"),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        )
        .orderBy("cluster")
    )


# --------------------------------------------------------------------------
# DSIR: data selection by importance resampling (n-gram LM ratio)
# --------------------------------------------------------------------------

_DSIR_TOPN = 20

_DSIR_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
),
vocab_all AS (
  SELECT w, count(*) AS c_all FROM tok GROUP BY 1
),
vocab_tgt AS (
  SELECT w, count(*) AS c_t FROM tok WHERE lang = 'en' GROUP BY 1
),
totals AS (
  SELECT (SELECT sum(c_all) FROM vocab_all) AS n_all,
         (SELECT count(*) FROM vocab_all) AS v,
         (SELECT sum(c_t) FROM vocab_tgt) AS n_t
),
scores AS (
  -- per-WORD log ratio, quantized to exact milli-nats before any
  -- cross-row summation (the ulp-robustness choke point)
  SELECT va.w,
         CAST(round((ln(CAST(coalesce(vt.c_t, 0) + 1 AS DOUBLE) / (totals.n_t + totals.v))
                     - ln(CAST(va.c_all + 1 AS DOUBLE) / (totals.n_all + totals.v)))
                    * 1000) AS BIGINT) AS q
  FROM vocab_all va LEFT JOIN vocab_tgt vt USING (w), totals
),
docw AS (
  SELECT t.doc_id, max(t.lang) AS lang,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(s.q) AS BIGINT) AS wq
  FROM tok t JOIN scores s USING (w)
  GROUP BY t.doc_id
)
SELECT doc_id, lang, n_tokens, wq / 1000.0 AS dsir_logweight
FROM docw
ORDER BY wq DESC, doc_id
LIMIT {_DSIR_TOPN}
"""


@register("dsir_importance_weights", oracle=_DSIR_ORACLE, tags=("llm", "sampling", "quality"))
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) importance weights: score every document
    by the log-likelihood ratio of a target-domain unigram LM (here:
    the 'en' slice) against the raw-corpus LM, then keep the top
    scorers — the principled replacement for hand-tuned quality
    filters when assembling domain-targeted pretraining mixes. Both
    LMs are one vocabulary groupBy (Zipf-small, broadcastable at any
    corpus size); scoring is the same token->vocab join as
    `text_unigram_logprob`. Determinism: each WORD's log-ratio is
    computed once from exact counts and quantized to integer
    milli-nats BEFORE the per-doc summation, so document totals are
    exact integer sums — a last-ulp ln() difference between libm
    implementations cannot reorder the top-N (it would need a word's
    ratio to land within 1e-12 of a .0005 boundary AND that word to
    tip a doc across a rank boundary). Top-N is TakeOrdered, no global
    sort."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w"))
    vocab_all = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c_all"))
    vocab_tgt = (
        tok.filter(F.col("lang") == "en").groupBy("w").agg(F.count(F.lit(1)).alias("c_t"))
    )
    totals = vocab_all.agg(
        F.sum("c_all").alias("n_all"), F.count(F.lit(1)).alias("v")
    ).crossJoin(vocab_tgt.agg(F.sum("c_t").alias("n_t")))
    lw = F.log(
        (F.coalesce(F.col("c_t"), F.lit(0)) + 1).cast("double")
        / (F.col("n_t") + F.col("v"))
    ) - F.log((F.col("c_all") + 1).cast("double") / (F.col("n_all") + F.col("v")))
    scores = (
        vocab_all.join(vocab_tgt, "w", "left")
        .crossJoin(F.broadcast(totals))
        .select("w", F.round(lw * 1000).cast("long").alias("q"))
    )
    docw = (
        tok.join(scores, "w")
        .groupBy("doc_id")
        .agg(
            F.max("lang").alias("lang"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("q").cast("long").alias("wq"),
        )
    )
    return (
        docw.orderBy(F.col("wq").desc(), "doc_id")
        .limit(_DSIR_TOPN)
        .select("doc_id", "lang", "n_tokens", (F.col("wq") / 1000.0).alias("dsir_logweight"))
    )


# --------------------------------------------------------------------------
# Vision preprocessing: image tile/patch planning (metadata only)
# --------------------------------------------------------------------------

_TILE = 224

_TILE_ORACLE = f"""
WITH dims AS (
  SELECT doc_id,
         512 + (doc_id % 7) * 128 AS w,
         384 + (doc_id % 5) * 96 AS h
  FROM documents
),
plan AS (
  SELECT doc_id, w, h,
         (w + {_TILE - 1}) // {_TILE} AS grid_w,
         (h + {_TILE - 1}) // {_TILE} AS grid_h
  FROM dims
)
SELECT grid_w, grid_h,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(grid_w * grid_h) AS BIGINT) AS n_tiles,
       CAST(sum(grid_w * {_TILE} * grid_h * {_TILE} - w * h) AS BIGINT) AS pad_px_total
FROM plan
GROUP BY grid_w, grid_h
ORDER BY grid_w, grid_h
"""


@register("multimodal_image_tile_plan", oracle=_TILE_ORACLE, tags=("llm", "multimodal"))
def multimodal_image_tile_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vision-encoder tile planning: ceil-divide each image into 224px
    patches (the ViT/NaViT ingest grid) and aggregate the fleet-level
    tile budget and padding waste per grid shape — the scheduling
    readout a multimodal ingest uses to size encoder batches BEFORE
    touching a single pixel. Like `multimodal_audio_chunk_plan`, this
    is deliberately metadata-only: dimensions derive deterministically
    from doc_id (the container has no codecs — decode itself is the
    declared stub in functions/multimodal.py), while the planning
    arithmetic, grouping, and scale shape (pure map-side projection +
    one small groupBy; at 100 TB this plans from a parquet manifest
    without reading image bytes) are real and oracle-checked."""
    docs = load_table(spark, sf_dir, "documents")
    plan = docs.select(
        "doc_id",
        (F.lit(512) + (F.col("doc_id") % 7) * 128).alias("w"),
        (F.lit(384) + (F.col("doc_id") % 5) * 96).alias("h"),
    ).select(
        "doc_id",
        "w",
        "h",
        F.expr(f"(w + {_TILE - 1}) div {_TILE}").alias("grid_w"),
        F.expr(f"(h + {_TILE - 1}) div {_TILE}").alias("grid_h"),
    )
    return (
        plan.groupBy("grid_w", "grid_h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.sum(F.col("grid_w") * F.col("grid_h")).cast("long").alias("n_tiles"),
            F.sum(
                F.col("grid_w") * _TILE * F.col("grid_h") * _TILE - F.col("w") * F.col("h")
            )
            .cast("long")
            .alias("pad_px_total"),
        )
        .orderBy("grid_w", "grid_h")
    )
