"""Round-7 LLM-data additions, part 15: fingerprint survivor picking,
length histograms, Jensen-Shannon source drift, and LSH bucket
balance auditing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Prefix/suffix fingerprint clusters with survivor pick
# --------------------------------------------------------------------------

_SURVIVOR_ORACLE = """
WITH fp AS (
  SELECT doc_id, n_chars,
         lang || '|' || string_split(text, ' ')[1] || '|'
              || CAST(n_chars // 50 AS VARCHAR) AS fingerprint
  FROM documents
  WHERE len(string_split(text, ' ')) >= 1
),
ranked AS (
  SELECT fingerprint, doc_id, n_chars,
         row_number() OVER (PARTITION BY fingerprint
                            ORDER BY n_chars DESC, doc_id) AS rn,
         CAST(count(*) OVER (PARTITION BY fingerprint) AS BIGINT) AS cluster_size,
         CAST(sum(n_chars) OVER (PARTITION BY fingerprint) AS BIGINT) AS total_chars
  FROM fp
)
SELECT fingerprint, doc_id AS survivor_doc_id, cluster_size,
       total_chars, CAST(n_chars AS BIGINT) AS kept_chars
FROM ranked
WHERE rn = 1 AND cluster_size > 1
ORDER BY fingerprint
"""


@register("dedup_survivor_pick", oracle=_SURVIVOR_ORACLE, tags=("llm", "dedup"))
def dedup_survivor_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-survivor selection: cluster documents by a cheap
    blocking key (language | first token | 50-char length band — the
    O(1)-per-doc candidate blocking crawl dedup runs before any
    MinHash), then pick each multi-doc cluster's keeper: longest content,
    doc_id as the deterministic tiebreak. This is the half of dedup
    the similarity ops leave open — WHICH copy survives — and the
    rule here (max content, stable tiebreak) is the production norm.
    One window over the fingerprint partition serves rank, size, and
    char totals in a single shuffle; fingerprints are computed
    map-side with slice/concat (no UDF). At 100 TB the fingerprint
    key is far smaller than the text it stands for, so the shuffle
    moves ids + counters, not documents."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    fp = docs.filter(F.size(toks) >= 1).select(
        "doc_id",
        "n_chars",
        F.concat_ws(
            "|",
            "lang",
            F.element_at(toks, 1),
            F.expr("CAST(n_chars div 50 AS STRING)"),
        ).alias("fingerprint"),
    )
    wp = Window.partitionBy("fingerprint")
    ranked = fp.select(
        "fingerprint",
        "doc_id",
        "n_chars",
        F.row_number()
        .over(wp.orderBy(F.col("n_chars").desc(), "doc_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(wp).cast("long").alias("cluster_size"),
        F.sum("n_chars").over(wp).cast("long").alias("total_chars"),
    )
    return (
        ranked.filter((F.col("rn") == 1) & (F.col("cluster_size") > 1))
        .select(
            "fingerprint",
            F.col("doc_id").alias("survivor_doc_id"),
            "cluster_size",
            "total_chars",
            F.col("n_chars").cast("long").alias("kept_chars"),
        )
        .orderBy("fingerprint")
    )


# --------------------------------------------------------------------------
# Log-bucketed length histogram per language
# --------------------------------------------------------------------------

_LENHIST_ORACLE = """
WITH base AS (
  SELECT lang, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(length(bin(n_chars)) - 1 AS BIGINT) AS len_bucket
  FROM documents WHERE n_chars > 0
)
SELECT lang, len_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       floor(avg(CAST(n_tokens AS DOUBLE)) * 10000 + 0.5) / 10000 AS avg_tokens
FROM base
GROUP BY lang, len_bucket
ORDER BY lang, len_bucket
"""


@register("corpus_length_histogram", oracle=_LENHIST_ORACLE, tags=("llm", "profile"))
def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length histogram on log2 buckets with
    token-density sidecars — the first profiling chart on any corpus
    intake, because truncation bugs and boilerplate floods show up as
    bucket-mass anomalies before any quality model sees the data
    (`etl_profile_table` profiles columns generically; this is the
    corpus-shaped cut). The log2 bucket is computed as the integer
    BIT LENGTH (length(bin(n)) - 1) rather than floor(log2(n)) — at
    exact powers of two a libm whose log2 is a hair under flips the
    bucket, and bit-length is exact integer arithmetic in both engines
    (transcendental audit r9 tier-1 fix). Pure map-side bucket +
    groupBy; the histogram is langs x ~20 buckets regardless of
    corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("n_chars") > 0).select(
        "lang",
        "n_chars",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        (F.length(F.bin("n_chars")) - 1).cast("long").alias("len_bucket"),
    )
    return (
        base.groupBy("lang", "len_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
            (
                F.floor(F.avg(F.col("n_tokens").cast("double")) * 10000 + F.lit(0.5))
                / 10000
            ).alias("avg_tokens"),
        )
        .orderBy("lang", "len_bucket")
    )


# --------------------------------------------------------------------------
# Jensen-Shannon divergence: each source vs the global corpus
# --------------------------------------------------------------------------

# Algebraic decomposition that needs only INNER joins (no zero-filling):
#   JS(p, q) = 0.5*S_p + 0.5*S_q - S_m   with S_x = sum x*log2(x)
#   S_m over the union support splits into the source's own terms plus
#   the global-only remainder:  S_m = A + (B - C) where
#     A = sum_{t in src} m*log2(m),      m = (p+q)/2
#     B = sum_{all t}   (q/2)*log2(q/2)  (global scalar)
#     C = sum_{t in src}(q/2)*log2(q/2)
_JS_ORACLE = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
src_freq AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY source, w
),
src_tot AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS t FROM src_freq GROUP BY source
),
glob_freq AS (
  SELECT w, CAST(sum(c) AS BIGINT) AS cg FROM src_freq GROUP BY w
),
glob_tot AS (SELECT CAST(sum(cg) AS BIGINT) AS tg FROM glob_freq),
glob_scalars AS (
  SELECT sum(CAST(cg AS DOUBLE) / tg * log2(CAST(cg AS DOUBLE) / tg)) AS sq,
         sum(CAST(cg AS DOUBLE) / tg / 2 * log2(CAST(cg AS DOUBLE) / tg / 2)) AS sb
  FROM glob_freq, glob_tot
),
per_src AS (
  SELECT s.source,
         sum((CAST(s.c AS DOUBLE) / st.t) * log2(CAST(s.c AS DOUBLE) / st.t)) AS sp,
         sum(((CAST(s.c AS DOUBLE) / st.t + CAST(g.cg AS DOUBLE) / gt.tg) / 2)
             * log2((CAST(s.c AS DOUBLE) / st.t + CAST(g.cg AS DOUBLE) / gt.tg) / 2)
             - (CAST(g.cg AS DOUBLE) / gt.tg / 2)
               * log2(CAST(g.cg AS DOUBLE) / gt.tg / 2)) AS a_minus_c,
         CAST(count(*) AS BIGINT) AS vocab
  FROM src_freq s
  JOIN src_tot st ON st.source = s.source
  JOIN glob_freq g ON g.w = s.w
  CROSS JOIN glob_tot gt
  GROUP BY s.source
)
SELECT p.source, p.vocab,
       floor((0.5 * p.sp + 0.5 * gs.sq - (p.a_minus_c + gs.sb)) * 10000 + 0.5) / 10000
         AS js_divergence
FROM per_src p, glob_scalars gs
ORDER BY p.source
"""


@register("corpus_js_divergence", oracle=_JS_ORACLE, tags=("llm", "drift"))
def corpus_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's unigram distribution
    against the whole corpus — the bounded-[0,1] drift score data
    mixers monitor per ingest snapshot (`corpus_language_mix` tracks
    labels; this tracks CONTENT drift with no labels needed). The
    union-support mixture term is decomposed algebraically so only
    INNER joins run: per-source terms join the global table once, and
    the global-only remainder folds into two broadcast scalars — no
    20x vocabulary expansion, no zero-filled outer join. Work is two
    frequency groupBys (map-side combinable) plus one join keyed on
    the word; every aggregate after that is source-cardinality. At
    100 TB you'd cap the joined support to the global top-V terms —
    a single filter on glob_freq — without touching the algebra."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(F.split("text", " ")).alias("w"))
    src_freq = tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    src_tot = src_freq.groupBy("source").agg(F.sum("c").cast("long").alias("t"))
    glob_freq = src_freq.groupBy("w").agg(F.sum("c").cast("long").alias("cg"))
    glob_tot = glob_freq.agg(F.sum("cg").cast("long").alias("tg"))
    q = F.col("cg").cast("double") / F.col("tg")
    glob_scalars = glob_freq.crossJoin(F.broadcast(glob_tot)).agg(
        F.sum(q * F.log2(q)).alias("sq"),
        F.sum(q / 2 * F.log2(q / 2)).alias("sb"),
    )
    p = F.col("c").cast("double") / F.col("t")
    m = (p + q) / 2
    per_src = (
        src_freq.join(F.broadcast(src_tot), "source")
        .join(glob_freq, "w")
        .crossJoin(F.broadcast(glob_tot))
        .groupBy("source")
        .agg(
            F.sum(p * F.log2(p)).alias("sp"),
            F.sum(m * F.log2(m) - (q / 2) * F.log2(q / 2)).alias("a_minus_c"),
            F.count(F.lit(1)).cast("long").alias("vocab"),
        )
    )
    return (
        per_src.crossJoin(F.broadcast(glob_scalars))
        .select(
            "source",
            "vocab",
            (
                F.floor(
                    (
                        0.5 * F.col("sp")
                        + 0.5 * F.col("sq")
                        - (F.col("a_minus_c") + F.col("sb"))
                    )
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("js_divergence"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# LSH bucket-balance audit
# --------------------------------------------------------------------------

_BB_BITS = 8

_BUCKET_ORACLE = f"""
WITH bits AS (
  SELECT vec_id, b.b AS b,
         CASE WHEN list_sum(list_transform(generate_series(1, 64),
                d -> CAST(round(CAST(embedding[d] AS DOUBLE) * 10000) AS BIGINT)
                     * (CASE WHEN ((b.b * 1000003 + d * 7919) * 2654435761)
                               % 2097152 // 1048576 = 0
                             THEN 1 ELSE -1 END))) >= 0
              THEN CAST(power(2, b.b) AS BIGINT) ELSE 0 END AS bit
  FROM embeddings, (SELECT unnest(generate_series(0, {_BB_BITS - 1})) AS b) b
),
buckets AS (
  SELECT vec_id, CAST(sum(bit) AS BIGINT) AS bucket FROM bits GROUP BY vec_id
),
sizes AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS sz FROM buckets GROUP BY bucket
)
SELECT CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(sz) AS BIGINT) AS n_vecs,
       CAST(min(sz) AS BIGINT) AS min_bucket,
       CAST(max(sz) AS BIGINT) AS max_bucket,
       floor(avg(CAST(sz AS DOUBLE)) * 10000 + 0.5) / 10000 AS avg_bucket,
       floor(CAST(max(sz) AS DOUBLE) / (CAST(sum(sz) AS DOUBLE) / count(*))
             * 10000 + 0.5) / 10000 AS imbalance
FROM sizes
"""


@register("embedding_bucket_balance", oracle=_BUCKET_ORACLE, tags=("llm", "embedding"))
def embedding_bucket_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket-balance audit: hash every vector into a
    {_BB_BITS}-bit hyperplane bucket (the same sign-bit scheme
    `ann_lsh_cosine` queries with) and report the bucket-size
    distribution — count, min/max/avg, and max/avg imbalance. This is
    the capacity-planning number for ANN at scale: imbalance IS the
    straggler factor of the within-bucket verify stage, so this audit
    runs before committing to a plane count. Hyperplane coefficients
    are deterministic ±1 from integer hashing and dot products are
    exact integer sums (aggregate over a sequence, JVM-side), so both
    engines bucket identically. One map-side bucket computation, two
    tiny groupBys."""
    emb = load_table(spark, sf_dir, "embeddings")
    bits = emb.select(
        "vec_id",
        "embedding",
        F.explode(F.sequence(F.lit(0), F.lit(_BB_BITS - 1))).alias("b"),
    )
    dot = F.expr(
        "aggregate(sequence(1, 64), 0L, (acc, d) -> acc"
        " + CAST(round(CAST(embedding[d - 1] AS DOUBLE) * 10000) AS LONG)"
        " * (CASE WHEN ((b * 1000003 + d * 7919) * 2654435761)"
        " % 2097152 div 1048576 = 0 THEN 1 ELSE -1 END))"
    )
    per_bit = bits.select(
        "vec_id",
        F.when(dot >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)"))
        .otherwise(F.lit(0).cast("long"))
        .alias("bit"),
    )
    buckets = per_bit.groupBy("vec_id").agg(F.sum("bit").cast("long").alias("bucket"))
    sizes = buckets.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    return sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("sz").cast("long").alias("n_vecs"),
        F.min("sz").cast("long").alias("min_bucket"),
        F.max("sz").cast("long").alias("max_bucket"),
        (
            F.floor(F.avg(F.col("sz").cast("double")) * 10000 + F.lit(0.5)) / 10000
        ).alias("avg_bucket"),
        (
            F.floor(
                F.max("sz").cast("double")
                / (F.sum("sz").cast("double") / F.count(F.lit(1)))
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("imbalance"),
    )
